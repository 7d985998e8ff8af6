package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.types.LongType

/** Scalable global ordering primitives. Spark's own
  * `row_number() OVER (ORDER BY …)` (no PARTITION BY) collapses the
  * whole dataset into ONE task — the classic 100 TB bottleneck. This
  * is the distributed alternative: range-partition on the sort key,
  * sort within partitions, then number each partition against a
  * broadcast offset table computed from per-partition counts.
  */
object Ranking {

  /** Append a dense global ordinal `idName` (1-based, gapless, in
    * `sortCols` order) without a single-partition sort. Also returns
    * the total row count (a free by-product of the offset pass — no
    * extra action for callers that need it).
    *
    * Plan: one range exchange + in-partition sort (the same shuffle a
    * global sort pays, but numbered in parallel), a per-partition
    * count pass whose result (≤ nPartitions longs) is the ONLY
    * driver-side data, and a map-side numbering pass. Both passes run
    * off ONE RDD lineage — the physical plan (and the range
    * partitioner's sampled boundaries) is fixed the moment `.rdd` is
    * taken, so the count job and the numbering job see IDENTICAL
    * partition assignment (two separate DataFrame actions would
    * re-plan, re-sample, and mis-align the offsets; this determinism
    * constraint is why the operator drops to the RDD seam, the
    * documented per-partition-imperative exception). The lineage is
    * persisted across the two passes so the shuffle executes once.
    *
    * `sortCols` must be a TOTAL order (include a unique tiebreaker):
    * equal keys could otherwise straddle a range boundary and make
    * the numbering run-dependent. */
  def denseIdsWithCount(df: DataFrame, sortCols: Seq[Column],
                        nPartitions: Int,
                        idName: String = "rn"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(nPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator(pid -> it.size.toLong))
      .collect().toMap
    val nPart = rdd.getNumPartitions
    // offsets[p] = rows in partitions before p; +1 below → 1-based
    val offsets = new Array[Long](nPart)
    var acc = 0L
    for (p <- 0 until nPart) {
      offsets(p) = acc; acc += counts.getOrElse(p, 0L)
    }
    val total = acc
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = sorted.schema.add(idName, LongType, nullable = false)
    val numbered = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = bc.value(pid)
      it.map { r => i += 1L; Row.fromSeq(r.toSeq :+ i) }
    }
    // Materialize the numbered result eagerly (localCheckpoint stores
    // the computed partitions and truncates lineage), then release the
    // intermediate sorted lineage NOW — without this every call pinned
    // a full MEMORY_AND_DISK copy of the dataset for the session
    // lifetime (the hazard Writes.scala documents). The checkpointed
    // output itself is reclaimed by the ContextCleaner once the caller
    // drops the returned frame, unlike CacheManager-registered caches.
    val out = spark.createDataFrame(numbered, outSchema)
      .localCheckpoint(eager = true)
    rdd.unpersist(blocking = false)
    (out, total)
  }

  def denseIds(df: DataFrame, sortCols: Seq[Column],
               nPartitions: Int, idName: String = "rn"): DataFrame =
    denseIdsWithCount(df, sortCols, nPartitions, idName)._1

  /** Equi-depth binning on top of [[denseIdsWithCount]]: `nBins`
    * buckets of (near-)equal row count in `sortCols` order —
    * `bin = floor((rn - 1) * nBins / n)` — plus per-bin stats. The
    * rank formulation is exactly replayable by any engine's
    * row_number, unlike quantile-boundary assignment where boundary
    * ties are engine-dependent. */
  def equiDepthBins(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                    nBins: Int, nPartitions: Int): DataFrame = {
    val (ranked, n) = denseIdsWithCount(df, sortCols, nPartitions)
    ranked
      .withColumn("bin", F.floor((F.col("rn") - 1) * nBins / n))
      .groupBy("bin")
      .agg(F.count(F.lit(1)).as("n_rows"),
        F.min(valueCol).as("min_value"),
        F.max(valueCol).as("max_value"))
  }
}
