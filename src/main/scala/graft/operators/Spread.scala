package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

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
  * SCAN-SHAPED INPUTS ONLY: the partition-count probe goes through
  * `Dataset.rdd`, and under AQE that FINALIZES the plan — for a frame
  * whose plan contains an exchange it would actually execute the
  * upstream shuffle stages at plan-construction time (real jobs,
  * then re-run by the caller's query — a silent double execution).
  * So the floor first whitelists the LOGICAL plan: only
  * project/filter chains over leaf relations (file scans, local
  * relations, checkpoint RDDs) are probed; anything else — joins,
  * aggregates, repartitions, unions, generators — returns unchanged
  * (such frames already inherit shuffle partitioning, or are not the
  * single-dominant-map-stage shape the floor exists for). For the
  * whitelisted shapes `.rdd` is file-split arithmetic, never a job.
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

  /** Is this logical plan a narrow chain over leaves — guaranteed
    * exchange-free, so planning its RDD can never run a job? */
  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case prj: Project => scanShaped(prj.child)
    case f: Filter => scanShaped(f.child)
    case a: SubqueryAlias => scanShaped(a.child)
    case _ => false
  }

  def floor(df: DataFrame): DataFrame = {
    if (!scanShaped(df.queryExecution.analyzed)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans (never runs) the frame — the whitelist
    // above guarantees an exchange-free scan, so this is file-split
    // arithmetic
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
