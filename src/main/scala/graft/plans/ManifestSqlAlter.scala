package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.{AlterTableAddColumnsCommand,
  LeafRunnableCommand, TruncateTableCommand}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.operators.ManifestTable
import graft.sources.ManifestSql

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
  * RENAME COLUMN and DROP COLUMN(S) route through the same ledger
  * (coalesce chains, tombstones — `ManifestTable.renameColumn` /
  * `dropColumn`), but are REWRITTEN AT PARSE TIME by
  * [[GraftSqlParser]], not here: those statements are v2-only, so
  * `ResolveSessionCatalog` throws for a V1 target DURING resolution,
  * before any injected rule sees the plan. Their runnable commands
  * ([[ManifestSqlAlter.RenameColumnCommand]] /
  * [[ManifestSqlAlter.DropColumnsCommand]]) live in this object
  * beside the ADD COLUMNS one. Because a rename/drop changes the
  * PHYSICAL projection (not just appends nullable fields), their
  * epilogue re-registers the catalog entry the way
  * `registerPersistent` would register the table today: a
  * rename-chained table flips to `<name>_store` + coalesce VIEW
  * (read-only from SQL — the documented rename-chain contract), a
  * drop stays a bare insertable table. Top-level columns only, and a
  * coalesce VIEW's fixed SELECT list cannot itself be altered
  * (alter its `<name>_store` table instead). */
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

  private def rootOf(session: SparkSession,
                     ident: TableIdentifier): String = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(u =>
        new org.apache.hadoop.fs.Path(u).toString))
      .getOrElse(throw new IllegalStateException(
        s"manifest catalog table ${ident.quotedString} has no path"))
  }

  /** Shared epilogue of a schema-SHAPE change (rename/drop): the
    * physical projection changed, so rebuild the registration the
    * way [[ManifestSql.registerPersistent]] would register it today
    * — a rename-chained table flips to `<name>_store` + coalesce
    * VIEW, a drop stays (or returns to) a bare table. The ledger
    * commit comes FIRST; a failed rebuild leaves the stale entry
    * failing loudly with the standing re-register instruction. */
  private def reRegister(session: SparkSession,
                         ident: TableIdentifier): Unit = {
    val name = ident.unquotedString
    ManifestSql.registerPersistent(session, name,
      rootOf(session, ident))
  }

  /** Resolve a user-written column name against the recorded schema
    * under the session's case-sensitivity conf — the parse-time
    * rewrite bypasses the analyzer's field resolution, so the stock
    * case-insensitive (by default) semantics are re-applied here. */
  private def resolveCol(session: SparkSession, root: String,
                         name: String): Option[String] = {
    val resolver = session.sessionState.conf.resolver
    ManifestTable.latest(root)
      .flatMap(s => ManifestTable.recordedSchemaOf(session, root, s)
        .fieldNames.find(resolver(_, name)))
  }

  /** `ALTER TABLE … RENAME COLUMN a TO b` on a manifest catalog
    * table: ledger rename (old files read through the chain), then
    * the in-place registration rebuild. */
  case class RenameColumnCommand(ident: TableIdentifier,
                                 from: String, to: String)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val root = rootOf(session, ident)
      val resolved = resolveCol(session, root, from).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$from' to rename on ${ident.quotedString}"))
      // the target-name collision check must use the SAME resolver:
      // renaming a -> B on a table with column b would otherwise
      // pass the ledger's exact-match guard and leave every
      // unqualified reference ambiguous under the default
      // case-insensitive resolution (a case-only rename of the SAME
      // column stays allowed)
      resolveCol(session, root, to).filter(_ != resolved).foreach(c =>
        throw new IllegalArgumentException(
          s"cannot rename '$resolved' to '$to' on " +
            s"${ident.quotedString} — it collides with column '$c' " +
            "under the session's case-insensitive resolution"))
      val name = ident.quotedString
      if (session.catalog.isCached(name)) session.catalog.uncacheTable(name)
      ManifestTable.renameColumn(session, root, resolved, to)
      reRegister(session, ident)
      Seq.empty
    }
  }

  /** `ALTER TABLE … DROP COLUMN[S] [IF EXISTS] …` on a manifest
    * catalog table: ledger tombstone per column, then the
    * registration rebuild. Names resolve case-per-conf against the
    * CURRENT recorded schema (the analyzer never sees this plan);
    * with IF EXISTS, absent columns skip silently. The WHOLE list
    * validates up front — missing columns (without IF EXISTS)
    * and dropping every remaining column refuse BEFORE the first
    * ledger commit (duplicates after resolution collapse into one
    * drop), so a multi-column statement cannot half-apply on its
    * own validation; and if a drop still fails mid-list (a concurrent
    * schema race), the registration is rebuilt for whatever DID
    * commit, so the catalog never serves a schema the ledger no
    * longer has. */
  case class DropColumnsCommand(ident: TableIdentifier,
                                cols: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val root = rootOf(session, ident)
      val victims = cols.flatMap { c =>
        resolveCol(session, root, c) match {
          case Some(r) => Some(r)
          case None if ifExists => None
          case None => throw new IllegalArgumentException(
            s"no column '$c' to drop on ${ident.quotedString} " +
              "(use IF EXISTS to ignore missing columns)")
        }
      }.distinct
      if (victims.nonEmpty) {
        val width = ManifestTable.latest(root)
          .map(s => ManifestTable.recordedSchemaOf(session, root, s)
            .fieldNames.length).getOrElse(0)
        require(victims.size < width,
          s"cannot drop every column of ${ident.quotedString}")
        val name = ident.quotedString
        if (session.catalog.isCached(name)) session.catalog.uncacheTable(name)
        var dropped = 0
        try victims.foreach { c =>
          ManifestTable.dropColumn(session, root, c); dropped += 1
        } finally if (dropped > 0) reRegister(session, ident)
      }
      Seq.empty
    }
  }

  /** The ledgered ALTER: schema-ledger commit, catalog schema update,
    * relation-cache drop — in that order (see class doc). */
  case class AddColumnsCommand(ident: TableIdentifier,
                               colsToAdd: Seq[StructField])
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val cat = session.sessionState.catalog
      val root = rootOf(session, ident)
      val added = StructType(colsToAdd.map(_.copy(nullable = true)))
      // CACHE TABLE materializations carry the old schema — drop them
      // BEFORE the ledger moves (uncache re-resolves the table, which
      // must still see the pre-ALTER shape)
      val name = ident.quotedString
      if (session.catalog.isCached(name)) session.catalog.uncacheTable(name)
      ManifestTable.addColumns(session, root, added)
      // the catalog schema must be the manifest's own PHYSICAL read
      // shape — recorded schema plus rename-chain names, in ITS
      // order. Appending to the old catalog schema would drift on a
      // rename-chained STORE table (new recorded columns land before
      // the chain names, not after) and trip the provider's
      // schema-drift guard on the next resolution.
      val snap = ManifestTable.latest(root).getOrElse(
        throw new IllegalStateException(s"no manifest at $root"))
      val (physical, _) = ManifestTable.readShapeOf(
        ManifestTable.recordedSchemaOf(session, root, snap),
        ManifestTable.colmapOfSnap(snap))
      cat.alterTableDataSchema(ident, physical)
      // drop the session's cached RELATION (not Catalog.refreshTable,
      // which would re-drive the OLD FileIndex's refresh and trip its
      // schema-drift guard): the next resolution rebuilds from the
      // updated catalog entry against the evolved recorded schema
      cat.refreshTable(ident)
      Seq.empty
    }
  }

  /** `ALTER TABLE … ALTER COLUMN c TYPE <t>` on a manifest catalog
    * table: the ledger's in-family numeric widening
    * ([[ManifestTable.widenColumn]] — metadata-only, files narrower
    * than the new type upcast at read exactly as Spark's parquet
    * reader always does), then the in-place catalog-schema update of
    * the ADD COLUMNS epilogue (widening changes a column's TYPE, not
    * the projection shape — no re-register needed). Narrowing and
    * cross-family changes refuse loudly from the ledger. */
  case class WidenColumnCommand(ident: TableIdentifier,
                                col: String,
                                to: org.apache.spark.sql.types.DataType)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val cat = session.sessionState.catalog
      val root = rootOf(session, ident)
      val resolved = resolveCol(session, root, col).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$col' to widen on ${ident.quotedString}"))
      val name = ident.quotedString
      if (session.catalog.isCached(name)) session.catalog.uncacheTable(name)
      ManifestTable.widenColumn(session, root, resolved, to)
      val snap = ManifestTable.latest(root).getOrElse(
        throw new IllegalStateException(s"no manifest at $root"))
      val (physical, _) = ManifestTable.readShapeOf(
        ManifestTable.recordedSchemaOf(session, root, snap),
        ManifestTable.colmapOfSnap(snap))
      cat.alterTableDataSchema(ident, physical)
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
      val root = rootOf(session, ident)
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
