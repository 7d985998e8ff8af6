package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Stateful streaming operators beyond windowed aggregation.
  *
  * Scale notes: streaming `dropDuplicates` keeps one state entry per
  * key for the lifetime of the query (bound it with a watermark +
  * key-with-event-time in production); the fingerprint is 32 hex chars
  * — state is tiny and constant per document regardless of text size.
  */
object StreamingOps {

  /** Streaming exact dedup over the documents stream: emits the first
    * occurrence of each content fingerprint (md5 of normalized text).
    * Append-mode stateful dedup — the streaming twin of
    * [[graft.operators.Dedup.exactDedup]]. */
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
      .select(F.col("doc_id"), Text.fingerprint(F.col("text")).as("fp"))
      .dropDuplicates("fp")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
