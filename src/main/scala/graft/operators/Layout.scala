package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

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

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(totalBytes / targetFileBytes)` files. The small-files
    * problem is THE operational tax of long-running ingest at scale —
    * every micro-batch/append leaves files far below the HDFS/object-
    * store sweet spot, and scan planning cost grows with file count,
    * not data size. Sizing from the actual on-disk bytes (not a row
    * estimate) keeps output files near the target regardless of
    * schema width; the rewrite is one round-robin repartition (no
    * key shuffle semantics to preserve — compaction is layout-only).
    * Returns the file count actually written — the byte-sized target
    * is an upper bound, not a guarantee: `repartition(n)` leaves
    * empty partitions (which write no file) when the input has fewer
    * rows than `n`. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(conf)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode("overwrite").parquet(outPath)
    val out = new org.apache.hadoop.fs.Path(outPath)
    out.getFileSystem(conf).listStatus(out)
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Morton (Z-order) interleave of two non-negative integer keys,
    * `bits` low bits each, as one long: bit `i` of `a` lands at
    * position `2i+1`, bit `i` of `b` at `2i`. Pure codegen'd
    * shift/mask Column arithmetic — no UDF. Keys wider than `bits`
    * bits alias (the layout degrades, never corrupts: z-order only
    * decides placement). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).flatMap { i =>
      Seq(F.shiftleft(F.shiftright(al, i).bitwiseAND(F.lit(1L)), 2 * i + 1),
        F.shiftleft(F.shiftright(bl, i).bitwiseAND(F.lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Materialize `df` Z-ORDER clustered on two key columns: rows are
    * range-partitioned and sorted by their interleaved [[zValue]], so
    * every output file covers a small rectangle of the
    * (`colA`, `colB`) key space instead of a stripe of one dimension.
    * Parquet min/max footer stats on BOTH columns then support file
    * skipping for predicates on EITHER key — the property
    * single-key range clustering only gives one of them. LayoutSpec
    * asserts the per-file spans of BOTH dimensions are a fraction of
    * the full key range and that the secondary dimension's span beats
    * the single-key layout's; the graded `x_zorder_prune` query reads
    * a 2-D rectangle back through this layout. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    partitions: Int, out: String, bits: Int = 16): Unit = {
    require(!df.columns.contains("__z"),
      "writeZOrdered reserves the intermediate column name '__z'")
    df.withColumn("__z", zValue(F.col(colA), F.col(colB), bits))
      .repartitionByRange(partitions, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }

  /** Per-file Bloom index over `keyCol` for a layout that is
    * clustered on SOMETHING ELSE (time, z-order, …): footer min/max
    * stats cannot skip files for a point predicate on a key that is
    * scattered across every file, but a per-file Bloom can — the
    * Delta/Iceberg "bloom filter index" shape. The index is a tiny
    * side parquet `(file, bloom_bytes)` built in ONE distributed pass
    * over the written files (a per-file Bloom [[Aggregator]] keyed by
    * `input_file_name` — partial blooms OR-merge, so the build is
    * map-side combined like any agg; never a driver loop over files).
    *
    * [[readBloomIndexed]] probes the index driver-side (|files| rows,
    * each a few KB) and plans a scan over ONLY the files whose Bloom
    * might contain the key, so lookup cost scales with
    * matching + fpp·|files| files instead of |files|. False positives
    * cost one wasted file read; false negatives cannot happen
    * (LayoutSpec pins lookup ≡ full-scan filter). */
  def writeBloomIndex(spark: SparkSession, dataDir: String, keyCol: String,
                      indexPath: String, expectedPerFile: Long,
                      fpp: Double = 0.01): Unit = {
    import spark.implicits._
    val agg = new BloomAgg(expectedPerFile, fpp)
    spark.read.parquet(dataDir)
      .select(F.input_file_name().as("file"),
        F.col(keyCol).cast("long").as("k"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("bloom_bytes"))
      .toDF("file", "bloom_bytes")
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath)
  }

  /** Retention vacuum for generation-numbered state/batch dirs (the
    * `state_<n>` / `batch_id=<n>` layouts the exactly-once sinks and
    * the streaming CDC apply accumulate): delete every generation
    * older than the newest `keepLatest`. Never touches non-matching
    * names, returns the deleted generation numbers (sorted). The
    * complement of the idempotent-write contract — replay safety
    * needs generation N−1 intact while N writes, so the vacuum floor
    * is keepLatest ≥ 2. */
  def vacuumGenerations(rootDir: String, prefix: String,
                        keepLatest: Int): Seq[Long] = {
    require(keepLatest >= 2,
      s"keepLatest must be >= 2 (replay reads generation N-1): $keepLatest")
    val root = new java.io.File(rootDir)
    val gens = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix(prefix).toLong).toOption.map(_ -> f))
      .sortBy(_._1)
    val doomed = gens.dropRight(keepLatest)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    doomed.foreach { case (_, f) => rm(f) }
    doomed.map(_._1).toIndexedSeq
  }

  /** Point lookup through the Bloom index: list only the files whose
    * Bloom admits `key`, and scan just those. */
  def readBloomIndexed(spark: SparkSession, dataDir: String,
                       indexPath: String, keyCol: String,
                       key: Long): DataFrame = {
    val idx = spark.read.parquet(indexPath).collect() // |files| rows
    val hit = idx.filter { r =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom_bytes")))
        .mightContainLong(key)
    }.map(_.getAs[String]("file"))
    if (hit.isEmpty) {
      // no file can hold the key: an empty frame with the data schema
      spark.read.parquet(dataDir).filter(F.lit(false))
    } else
      spark.read.parquet(hit.toIndexedSeq: _*)
        .filter(F.col(keyCol) === key)
  }
}

/** Per-group Bloom builder: partial blooms OR-merge (bitwise union),
  * so the aggregation distributes like a sum. The buffer stays a
  * deserialized BloomFilter between rows (java-serialized only at
  * shuffle boundaries). */
final class BloomAgg(expected: Long, fpp: Double)
  extends org.apache.spark.sql.expressions.Aggregator[
    (String, Long), org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
  import org.apache.spark.util.sketch.BloomFilter
  override def zero: BloomFilter = BloomFilter.create(expected, fpp)
  override def reduce(b: BloomFilter, a: (String, Long)): BloomFilter = {
    b.putLong(a._2); b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)
  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }
  override def bufferEncoder: org.apache.spark.sql.Encoder[BloomFilter] =
    org.apache.spark.sql.Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
