package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate,
  V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestSql

/** The DSv2 [[Table]] behind [[GraftCatalog]] — deliberately THIN:
  *
  *  - READS carry no scan machinery here. The table declares
  *    `BATCH_READ`, and the injected [[graft.plans.GraftDsv2Reads]]
  *    rule replaces its `DataSourceV2Relation` with the pruned
  *    snapshot-pinned V1 relation ([[ManifestSql.relation]]) during
  *    analysis — one shared scan path for every door (the public
  *    DeltaAnalysis pattern; a second DSv2 reader would duplicate the
  *    stats/Bloom pruning and lose the vectorized parquet exec).
  *  - WRITES go through the `V1_BATCH_WRITE` fallback: the
  *    [[WriteBuilder]] builds a [[V1Write]] whose
  *    [[InsertableRelation]] is the SAME ledgered append/overwrite
  *    the V1 SQL door commits through — `INSERT INTO graft.db.t` is
  *    one atomic manifest commit, `INSERT OVERWRITE` (truncate mode)
  *    an atomic snapshot replace. Time-travel pins refuse writes.
  *
  * `versionAsOf` pins a snapshot for the native v2 time-travel
  * overloads (`VERSION AS OF` / `TIMESTAMP AS OF`). The SCHEMA is
  * resolved lazily from the pinned snapshot's recorded schema —
  * exactly what the V1 relation will serve when the read rule swaps
  * it in. */
final case class GraftTable(spark: SparkSession, fullName: String,
                            root: String, versionAsOf: Option[Int],
                            readOnlyChain: Boolean = false,
                            v1Meta: Option[org.apache.spark.sql.catalyst
                              .catalog.CatalogTable] = None)
  extends Table with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.graftbridge.V1FallbackTable {

  override def name(): String = fullName

  /** NATIVE v2 DELETE ([[org.apache.spark.sql.connector.catalog
    * .SupportsDelete]]) — the API-contract door for `DELETE FROM
    * graft.db.t` with a filter-translatable condition: Spark's own
    * `OptimizeMetadataOnlyDeleteFromTable` plans it straight to this
    * call, with NO injected rule involved. Today the injected
    * rewrite chain (GraftDsv2Reads → ManifestSqlDml) serves v2 DML
    * first — this door is the structural backstop that keeps
    * v2-addressed DELETE working even if the analyzer's rule order
    * reshuffles (or in a session without the graft extensions), and
    * it honors the table's `#dvmode:` declaration (deletion vectors
    * vs copy-on-write) exactly like the SQL rewrite path. */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    versionAsOf.isEmpty && !readOnlyChain

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(versionAsOf.isEmpty,
      s"cannot DELETE from a time-travel pin of $fullName — " +
        "time travel is read-only; address the head to write")
    require(!readOnlyChain,
      s"$fullName is a rename-chained registration — read-only from " +
        "SQL; write through the ManifestTable Scala API")
    val session = SparkSession.active
    val cond = filters.map(GraftTable.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val mor = graft.operators.ManifestTable.latest(root)
      .exists(graft.operators.ManifestTable.morDeletes)
    if (mor)
      graft.operators.ManifestTable.deleteWhereMoR(session, root, cond)
    else graft.operators.ManifestTable.deleteWhere(session, root, cond)
    session.catalog.refreshByPath(root)
    v1Meta.map(_.identifier).foreach(id => scala.util.Try(
      session.sessionState.catalog.refreshTable(id)))
  }

  /** STREAMING fallback (r19): `spark.readStream.table("graft.db.t")`
    * / `writeStream.toTable(…)` resolve through the V1 provider this
    * CatalogTable names — `graft-manifest`'s StreamSourceProvider
    * (the insert-row feed; `readChangeFeed=true` for change rows) and
    * its exactly-once ledgered sink. Only the head streams: a
    * time-travel pin is a fixed snapshot, and a rename-chained VIEW
    * has no provider entry of its own. */
  override def v1Table: org.apache.spark.sql.catalyst.catalog
      .CatalogTable = {
    require(versionAsOf.isEmpty,
      s"cannot stream a time-travel pin of $fullName — a pinned " +
        "snapshot never changes; stream the head")
    require(!readOnlyChain,
      s"$fullName is a rename-chained registration — stream its " +
        "<name>_store table (physical names) or the change feed")
    v1Meta.getOrElse(throw new IllegalStateException(
      s"$fullName carries no catalog entry to stream through"))
  }

  /** The pinned relation — built once per analysis (the same pin the
    * rewrite rule serves, so schema and scan agree). Head pins stay
    * `versionAsOf = None` — the DML rewrites downstream must see a
    * HEAD registration (writable), not a frozen version. */
  lazy val relation: DataFrame =
    ManifestSql.relation(spark, root, versionAsOf)

  /** A FRESH relation with its own exprIds: the analyzer caches one
    * [[GraftTable]] per name per query, so a self-join sees this
    * instance twice — the second occurrence must not share the
    * first's output attributes (Spark's DeduplicateRelations has
    * already run by post-hoc time). A head pin re-resolves the head;
    * a commit racing mid-analysis between the two constructions is
    * the same exposure any two same-query file-source scans share. */
  def freshRelation: DataFrame =
    ManifestSql.relation(spark, root, versionAsOf)

  override def schema(): StructType = relation.schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER).asJava

  override def properties(): util.Map[String, String] =
    Map("path" -> root,
      "provider" -> ManifestSql.ManifestProvider).asJava

  /** `INSERT OVERWRITE` arrives as truncate() (= overwrite
    * AlwaysTrue); `INSERT INTO … REPLACE WHERE <cond>` arrives as
    * overwrite(filters) — the PREDICATE OVERWRITE shape, served by
    * [[graft.operators.ManifestTable.overwriteWhere]]: replace
    * exactly the matching rows with the query's in one ledgered
    * commit (pruned victim rewrite + append; new rows must satisfy
    * the predicate). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsOverwrite {
      private var replaceFilters
          : Option[Array[org.apache.spark.sql.sources.Filter]] = None
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : WriteBuilder = { replaceFilters = Some(filters); this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit = {
              require(versionAsOf.isEmpty,
                s"cannot INSERT into a time-travel pin of $fullName — " +
                  "time travel is read-only; address the head to write")
              require(!readOnlyChain,
                s"$fullName is a rename-chained registration — " +
                  "read-only from SQL (the documented rename-chain " +
                  "contract); write through the ManifestTable Scala API")
              val session = data.sparkSession
              val columns =
                ManifestSql.relation(session, root, None).columns.toSeq
              val truncating = replaceFilters.exists(_.forall(
                _ == org.apache.spark.sql.sources.AlwaysTrue))
              replaceFilters.filterNot(_ => truncating) match {
                case Some(filters) =>
                  val cond = filters.map(GraftTable.filterToColumn)
                    .reduceOption(_ && _)
                    .getOrElse(org.apache.spark.sql.functions.lit(true))
                  val aligned =
                    if (data.columns.toSeq == columns) data
                    else data.toDF(columns.toIndexedSeq: _*)
                  graft.operators.ManifestTable.overwriteWhere(
                    session, root, cond, aligned)
                  ()
                case None =>
                  // positional alignment + the BatchIdConf ledger
                  // contract + the commit, through the ONE V1 owner
                  ManifestSql.sqlInsertAt(session, root, data,
                    truncating, columns)
              }
              session.catalog.refreshByPath(root)
              // the V1 door's per-NAME relation cache pins the
              // snapshot it resolved — drop it so the session's next
              // V1-name read sees this v2-door write (one table, two
              // doors, one read-your-writes contract)
              v1Meta.map(_.identifier).foreach(id => scala.util.Try(
                session.sessionState.catalog.refreshTable(id)))
            }
          }
      }
    }
}

object GraftTable {

  /** The v2 `REPLACE WHERE` condition arrives as translated source
    * filters — re-expressed as a Column for the ledgered predicate
    * overwrite. Every translatable shape is covered; an unknown
    * filter class refuses loudly (never silently widen or narrow a
    * REPLACE region). */
  private[catalog] def filterToColumn(
      f: org.apache.spark.sql.sources.Filter)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.functions._
    f match {
      case AlwaysTrue() => lit(true)
      case AlwaysFalse() => lit(false)
      case EqualTo(a, v) => col(a) === lit(v)
      case EqualNullSafe(a, v) => col(a) <=> lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isInCollection(vs.toSeq)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case Not(c) => !filterToColumn(c)
      case StringStartsWith(a, v) => col(a).startsWith(v)
      case StringEndsWith(a, v) => col(a).endsWith(v)
      case StringContains(a, v) => col(a).contains(v)
      case other => throw new UnsupportedOperationException(
        s"REPLACE WHERE filter shape ${other.getClass.getSimpleName} " +
          "is not supported on manifest tables")
    }
  }
}
