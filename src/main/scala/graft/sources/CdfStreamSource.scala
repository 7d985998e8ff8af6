package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession,
  functions => F}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.operators.ManifestTable

/** `spark.readStream.format("graft-cdf")` — the manifest change feed
  * as a REAL Structured Streaming source: triggers, checkpointed
  * offsets, query management, `foreachBatch` sinks — everything the
  * drain-loop API ([[graft.streaming.ManifestChangeFeed]]) could not
  * give a downstream pipeline.
  *
  * OFFSET = the manifest VERSION (one long — the same watermark the
  * drain loop persists, here owned by the streaming checkpoint's
  * offset log). A micro-batch covering versions (a, b] is the union
  * of [[ManifestTable.changes]](v−1, v) for each v, every row tagged
  * `_commit_version` — so per-commit attribution survives Spark's
  * range batching and the stream's total content equals the batch
  * feed's, whatever the trigger cadence. Batch cost scales with each
  * version's changed files only.
  *
  * Options:
  *  - `path` (required): the manifest table root;
  *  - `fromVersion` (default 0): versions ≤ this are never delivered
  *    (0 = the whole feed since init).
  *
  * Delivery is the engine's exactly-once-offsets + at-least-once
  * side effects: a crashed micro-batch REPLAYS with the same batchId
  * — pair the sink with the manifest's own ledgered writers
  * (`appendBatch`/`upsertBatch` in `foreachBatch`) for exactly-once
  * end to end, the same contract the drain loop documents. Retention
  * bounds the lookback exactly like time travel: a restart whose
  * checkpointed offset predates [[ManifestTable.expireManifests]] /
  * [[ManifestTable.vacuum]] retention fails loudly on the changes()
  * pre-check. Like the drain loop, signature/IVF store roots are not
  * subscribable (their maintenance eagerly expires the lookback). */
final class CdfStreamSource extends StreamSourceProvider
  with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdf requires a 'path' option (the manifest table root)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(),
      CdfStreamSource.changeSchema(sqlContext.sparkSession,
        rootOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new CdfStreamSource.CdfSource(sqlContext.sparkSession,
      rootOf(parameters),
      parameters.get("fromVersion").map(_.trim.toInt).getOrElse(0))
}

object CdfStreamSource {

  /** The stream's row shape: the table's LOGICAL schema (rename
    * chains coalesced — identical to [[ManifestTable.changes]]'s
    * output) + `_change_type` + `_commit_version`. Pinned at stream
    * creation, like any source schema. */
  private[sources] def changeSchema(spark: SparkSession,
                                    root: String): StructType = {
    val snap = ManifestTable.latest(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    val logical = ManifestTable.recordedSchemaOf(spark, root, snap)
    StructType(logical.fields.map(_.copy(nullable = true)) ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }

  private final class CdfSource(spark: SparkSession, root: String,
                                fromVersion: Int) extends Source {

    private val pinnedSchema = changeSchema(spark, root)

    override def schema: StructType = pinnedSchema

    private def versionOf(o: OffsetV1): Int = o match {
      case l: LongOffset => l.offset.toInt
      case other => other.json.trim.toInt // SerializedOffset (WAL replay)
    }

    override def getOffset: Option[OffsetV1] = {
      val head = ManifestTable.latest(root).getOrElse(
        throw new IllegalStateException(s"no manifest at $root")).version
      if (head > fromVersion) Some(LongOffset(head.toLong)) else None
    }

    override def getBatch(start: Option[OffsetV1],
                          end: OffsetV1): DataFrame = {
      val lo = start.map(versionOf).getOrElse(fromVersion)
      val hi = versionOf(end)
      val parts = ((lo + 1) to hi).map(v =>
        ManifestTable.changes(spark, root, v - 1, v)
          .withColumn("_commit_version", F.lit(v.toLong)))
      val batch = parts.reduceLeftOption(_.unionByName(_)).getOrElse(
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          pinnedSchema))
      // the engine requires getBatch's frame to be streaming-marked;
      // execution stays lazy inside the micro-batch
      org.apache.spark.sql.graftbridge.asStreamingFrame(spark, batch)
    }

    override def stop(): Unit = ()
  }
}
