package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Physical data layout for scale (north-star extension): the write
  * patterns that make a 100 TB corpus cheap to read back.
  *
  *  - [[writeDatePartitioned]]: hive-style `event_date=...` directory
  *    partitioning. A later date-range query prunes whole partitions
  *    at planning time (`PartitionFilters` in the scan, pinned by
  *    PlanShapeSpec) — at 30 days of data a one-week query lists and
  *    reads 7/30 of the files, and the ratio only improves as
  *    retention grows.
  *  - [[writeRangeClustered]]: `repartitionByRange` +
  *    `sortWithinPartitions` so every output file covers a disjoint
  *    key range. Parquet min/max footer stats then let ANY engine
  *    skip files on a key predicate (data-skipping readiness) —
  *    LayoutSpec asserts the per-file ranges really are disjoint.
  *
  * Both are pure writers around the standard parquet sink — the scale
  * property is the layout, not custom I/O.
  */
object Layout {

  /** Materialize `df` partitioned by the date of `tsCol` (named
    * `event_date`). Overwrite mode keeps re-runs idempotent. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, out: String): Unit = {
    require(!df.columns.contains("event_date"),
      "writeDatePartitioned derives a reserved `event_date` column; input already has one")
    df.withColumn("event_date", F.to_date(F.col(tsCol)))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
  }

  /** Read a date-partitioned layout back restricted to
    * [`from`, `to`] (inclusive, ISO dates). The filter lands in the
    * scan's `PartitionFilters`: non-matching partition directories
    * are never listed into the plan. */
  def readDateRange(spark: SparkSession, out: String,
                    from: String, to: String): DataFrame =
    spark.read.parquet(out)
      .filter(F.col("event_date")
        .between(F.lit(from).cast("date"), F.lit(to).cast("date")))

  /** Materialize `df` range-clustered on `keyCol`: rows are range-
    * partitioned (RangePartitioner samples the key distribution, so
    * skewed keys still yield balanced files) and sorted within each
    * partition, giving one parquet file per disjoint key range. */
  def writeRangeClustered(df: DataFrame, keyCol: String, partitions: Int,
                          out: String): Unit =
    df.repartitionByRange(partitions, F.col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(out)
}
