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
  with org.apache.spark.sql.graftbridge.V1FallbackTable {

  override def name(): String = fullName

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
      TableCapability.TRUNCATE).asJava

  override def properties(): util.Map[String, String] =
    Map("path" -> root,
      "provider" -> ManifestSql.ManifestProvider).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
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
              // positional alignment + the BatchIdConf ledger contract
              // + the commit, all through the ONE V1-shared owner
              ManifestSql.sqlInsertAt(session, root, data, overwrite,
                ManifestSql.relation(session, root, None).columns.toSeq)
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
