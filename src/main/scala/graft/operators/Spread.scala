package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for CPU-heavy per-row pipelines
  * (optimization guide §2.6 idle capacity, §6 input splits).
  *
  * Tokenize/shingle/hash passes inherit their task count from the
  * upstream FILE LAYOUT: a corpus packed into few (or one) parquet
  * files — or one unsplittable row group — runs its most expensive
  * map work on that many cores while the rest of the cluster idles.
  * AQE's post-shuffle coalescing compounds it: coalescing targets are
  * sized for I/O (tens of MB per task), so a byte-small but CPU-dense
  * frame (short text rows each expanding to hundreds of shingle
  * hashes) lands on ONE task no matter how many cores exist.
  * [[floor]] raises such a frame to at least the cluster's default
  * parallelism with one round-robin exchange of the (caller-
  * projected) input.
  *
  * Scale behavior: at 100 TB a corpus scan already yields thousands
  * of partitions >= defaultParallelism, so the branch is a NO-OP and
  * no shuffle is added; on a small or badly-packed layout the one
  * exchange of projected text unlocks N-way hashing — seconds of
  * shuffle buying minutes of parallel CPU. The floor derives from
  * cluster size (`sparkContext.defaultParallelism`), never a
  * constant, so the same code is right at local[4], local[32], and
  * a 1000-core cluster. Callers aggregate or equi-join downstream,
  * so results are partitioning-invariant.
  */
private[graft] object Spread {
  def floor(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans (never runs) the frame — callers pass
    // narrow scan projections, so this is file-split arithmetic
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
