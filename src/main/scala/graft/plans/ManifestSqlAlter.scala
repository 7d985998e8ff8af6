package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.{AlterTableAddColumnsCommand,
  LeafRunnableCommand, TruncateTableCommand}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.operators.ManifestTable

/** `ALTER TABLE <manifest catalog table> ADD COLUMNS (…)` routed
  * through the schema ledger, with the catalog registration refreshed
  * IN PLACE — so a catalog user evolves the table and keeps reading,
  * instead of hitting the fail-loudly-until-re-register contract a
  * data-path schema commit (rightly) enforces.
  *
  * Spark resolves the statement to [[AlterTableAddColumnsCommand]]
  * for session-catalog V1 tables, whose `run` refuses any datasource
  * it doesn't know how to alter (`graft-manifest` included). This
  * rule replaces the command for manifest-provider tables with one
  * that (1) commits the added columns to the manifest's schema ledger
  * ([[ManifestTable.addColumns]] — metadata-only, zero data I/O,
  * existing files read NULL), (2) updates the catalog entry's stored
  * schema to match, and (3) drops the session's cached relation. A
  * sibling (or future) session then resolves the catalog entry
  * against the new recorded schema directly — no re-register. The
  * ledger commit comes FIRST: if the catalog update then fails, the
  * stale registration fails loudly with the standing re-register
  * instruction rather than serving a schema the table no longer has.
  *
  * Scope: ADD COLUMNS only. Renames and drops change what existing
  * bytes MEAN (coalesce chains, tombstones) — they stay on the Scala
  * API with an explicit re-register, and a rename-chained
  * registration's coalesce VIEW has a fixed SELECT list no ALTER can
  * extend (alter its `<name>_store` table instead). */
case class ManifestSqlAlter(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case AlterTableAddColumnsCommand(ident, cols)
          if isManifestTable(ident) =>
        ManifestSqlAlter.AddColumnsCommand(ident, cols)

      // Spark's V1 TRUNCATE deletes the files under the table
      // location — on a manifest root that would erase ledger + data
      // behind every reader's back. Rewrite it to the ledgered
      // equivalent: one atomic empty-overwrite commit (schema and
      // declarations carried, history time-travel-able, old files
      // ordinary vacuum orphans).
      case TruncateTableCommand(ident, partSpec)
          if isManifestTable(ident) =>
        require(partSpec.isEmpty,
          "manifest tables have no partitions to truncate")
        ManifestSqlAlter.TruncateCommand(ident)
    }

  private def isManifestTable(ident: TableIdentifier): Boolean = {
    val cat = spark.sessionState.catalog
    cat.tableExists(ident) && !cat.isTempView(ident) &&
      scala.util.Try(cat.getTableMetadata(ident).provider
        .exists(_.equalsIgnoreCase("graft-manifest"))).getOrElse(false)
  }
}

object ManifestSqlAlter {

  /** The ledgered ALTER: schema-ledger commit, catalog schema update,
    * relation-cache drop — in that order (see class doc). */
  case class AddColumnsCommand(ident: TableIdentifier,
                               colsToAdd: Seq[StructField])
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val cat = session.sessionState.catalog
      val meta = cat.getTableMetadata(ident)
      val root = meta.storage.properties.get("path")
        .orElse(meta.storage.locationUri.map(u =>
          new org.apache.hadoop.fs.Path(u).toString))
        .getOrElse(throw new IllegalStateException(
          s"manifest catalog table ${ident.quotedString} has no path"))
      val added = StructType(colsToAdd.map(_.copy(nullable = true)))
      // CACHE TABLE materializations carry the old schema — drop them
      // BEFORE the ledger moves (uncache re-resolves the table, which
      // must still see the pre-ALTER shape)
      val name = ident.quotedString
      if (session.catalog.isCached(name)) session.catalog.uncacheTable(name)
      ManifestTable.addColumns(session, root, added)
      cat.alterTableDataSchema(ident,
        StructType(meta.dataSchema.fields ++ added.fields))
      // drop the session's cached RELATION (not Catalog.refreshTable,
      // which would re-drive the OLD FileIndex's refresh and trip its
      // schema-drift guard): the next resolution rebuilds from the
      // updated catalog entry against the evolved recorded schema
      cat.refreshTable(ident)
      Seq.empty
    }
  }

  /** TRUNCATE as a versioned ledger commit: overwrite with zero rows
    * of the RECORDED schema — never a file deletion (see the rule's
    * doc). History stays time travel-readable; the superseded files
    * become ordinary vacuum orphans. */
  case class TruncateCommand(ident: TableIdentifier)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val meta = session.sessionState.catalog.getTableMetadata(ident)
      val root = meta.storage.properties.get("path")
        .orElse(meta.storage.locationUri.map(u =>
          new org.apache.hadoop.fs.Path(u).toString))
        .getOrElse(throw new IllegalStateException(
          s"manifest catalog table ${ident.quotedString} has no path"))
      val name = ident.quotedString
      if (session.catalog.isCached(name)) session.catalog.uncacheTable(name)
      val schema = StructType(meta.dataSchema.fields.map(
        _.copy(nullable = true)))
      ManifestTable.overwrite(session, root,
        session.createDataFrame(new java.util.ArrayList[Row](), schema))
      // drop the cached relation (its FileIndex pin predates the
      // truncate) and any cached plans over the root
      session.sessionState.catalog.refreshTable(ident)
      session.catalog.refreshByPath(root)
      Seq.empty
    }
  }
}
