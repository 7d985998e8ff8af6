package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, functions => F}

/** Temporal joins Spark has no native operator for, composed from
  * primitives it optimizes well (SURVEY §2.3 note: the reference has
  * equi-joins only — these are north-star additions for event data).
  *
  * Scale design:
  *  - As-of join: union + one window pass partitioned by the key —
  *    a single shuffle, no per-row probe joins, no range explosion.
  *    This is the standard "merge the two streams and carry the last
  *    build row forward" formulation; it scales with Σ rows, not
  *    probe×build.
  *  - Range join: bucketed to the window width so each candidate pair
  *    meets in exactly one equi-join bucket triplet — never the
  *    quadratic theta-join Spark would otherwise plan (a
  *    BroadcastNestedLoopJoin at best). Pair volume is bounded by
  *    per-(key, bucket) density, tunable via the window width.
  */
object Temporal {

  /** As-of join: for every probe row, the most recent build row with
    * build.ts <= probe.ts for the same key (NULLs when none — left
    * semantics). Build rows are first reduced to one per (key, ts)
    * (max of `buildValCol`) so the result is deterministic under ties.
    *
    * Implementation: tag build (0) and probe (1) rows, union, and run
    * one `last(..., ignoreNulls)` window ordered by (ts, tag) — build
    * rows sort before probe rows at equal ts, which yields the
    * inclusive (>=) as-of match. Output = probe columns +
    * `{prefix}_ts`, `{prefix}_value`. */
  def asofJoin(probe: DataFrame, build: DataFrame, keyCol: String,
               tsCol: String, buildValCol: String,
               prefix: String = "asof"): DataFrame = {
    // internal tag/value/struct columns — a same-named input column
    // would be silently clobbered, so fail fast instead
    val reserved = Seq("__tag", "__bval", "__asof")
    require(!(probe.columns ++ build.columns).exists(reserved.contains),
      s"asofJoin reserves the column names ${reserved.mkString(", ")}")
    val extras = probe.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    val bvalType = build.schema(buildValCol).dataType
    val bSide = build.groupBy(keyCol, tsCol)
      .agg(F.max(buildValCol).as("__bval"))
      .select(F.col(keyCol) +: F.col(tsCol) +: F.lit(0).as("__tag") +:
        F.col("__bval") +:
        extras.map(c => F.lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val pSide = probe.select(F.col(keyCol) +: F.col(tsCol) +:
      F.lit(1).as("__tag") +: F.lit(null).cast(bvalType).as("__bval") +:
      extras.map(F.col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(F.col(tsCol).asc, F.col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ts and value are carried in ONE struct so they always come from
    // the SAME build row: with two independent last(_, ignoreNulls)
    // calls, a latest build row holding a NULL value would be skipped
    // by the value column but not the ts column, pairing a newer ts
    // with an older row's value. The when() leaves the whole struct
    // NULL on probe rows (skipped); a build row's struct is non-null
    // even when its value field is NULL.
    bSide.unionByName(pSide)
      .withColumn("__asof",
        F.last(F.when(F.col("__tag") === 0,
            F.struct(F.col(tsCol).as("ts"), F.col("__bval").as("v"))),
          ignoreNulls = true).over(w))
      .filter(F.col("__tag") === 1)
      .select(F.col(keyCol) +: F.col(tsCol) +: extras.map(F.col) :+
        F.col("__asof.ts").as(s"${prefix}_ts") :+
        F.col("__asof.v").as(s"${prefix}_value"): _*)
  }

  /** Range-count join: for every anchor row, the number of `other`
    * rows with the same key within ±`windowSec` of its timestamp
    * (inclusive both ends); anchors with no neighbors count 0.
    *
    * Implementation: both sides are bucketed at `windowSec` width;
    * anchors replicate into (bucket-1, bucket, bucket+1), so every
    * true neighbor meets its anchor in exactly one equi-join bucket —
    * each surviving pair is produced once, no dedup needed. The final
    * left join restores zero-count anchors. */
  def rangeCountJoin(anchors: DataFrame, other: DataFrame, idCol: String,
                     keyCol: String, tsCol: String,
                     windowSec: Long): DataFrame = {
    val usec = windowSec * 1000000L
    // unix_micros requires TIMESTAMP; ntz columns are cast through
    // the (UTC-pinned) session zone — consistent on both join sides,
    // and only bucket ALIGNMENT depends on it, never pair membership
    def micros(c: org.apache.spark.sql.Column) =
      F.unix_micros(c.cast("timestamp"))
    val aBucket = F.floor(micros(F.col(tsCol)) / usec)
    val lb = anchors
      .withColumn("__b",
        F.explode(F.array(aBucket - 1, aBucket, aBucket + 1)))
    val rb = other.select(F.col(keyCol),
        F.col(tsCol).as("__rts"))
      .withColumn("__b", F.floor(micros(F.col("__rts")) / usec))
    val cnt = lb.join(rb, Seq(keyCol, "__b"))
      .filter(F.abs(micros(F.col("__rts")) -
        micros(F.col(tsCol))) <= usec)
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("__n"))
    anchors.join(cnt, Seq(idCol), "left")
      .withColumn("n_nearby", F.coalesce(F.col("__n"), F.lit(0L)))
      .drop("__n")
  }

  /** Slowly-changing-dimension (type 2) versioning: each key's change
    * events become validity intervals — `valid_from` = the event's
    * timestamp, `valid_to` = the NEXT event's (NULL while current),
    * plus a dense `version` ordinal. One window pass per key (single
    * shuffle on the key); the tie-breaker column keeps interval edges
    * deterministic when two changes share a timestamp. At 100 TB this
    * is the dimension-history builder: partitioned by key, nothing
    * driver-side, output size = input size. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(tsCol, tieCol)
    changes
      .withColumn("valid_from", F.col(tsCol))
      .withColumn("valid_to", F.lead(tsCol, 1).over(w))
      .withColumn("version", F.row_number().over(w).cast("long"))
      .withColumn("is_current", F.col("valid_to").isNull)
  }

  /** Point-in-time lookup against an [[scd2]] dimension — the
    * consuming query SCD2 exists for: each fact row picks the
    * dimension version whose validity interval covers its timestamp.
    * Intervals are HALF-OPEN `[valid_from, valid_to)` (the current
    * version's NULL `valid_to` is an open end), so a fact landing
    * exactly on a version boundary matches exactly one version —
    * `BETWEEN`'s closed upper end would double-match it.
    *
    * Plan shape: equi-join on the key with the interval as a
    * residual filter — shuffles both sides once on the key (SMJ),
    * which is the right 100-TB plan for a keyed dimension lookup:
    * per-key version chains are short, so the residual scan per key
    * is O(versions), never a range cross product. */
  def scd2Lookup(facts: DataFrame, dim: DataFrame, keyCol: String,
                 tsCol: String): DataFrame = {
    val d = dim.columns.foldLeft(dim)((df, c) => df.withColumnRenamed(c, s"__d_$c"))
    facts.join(d,
      F.col(keyCol) === F.col(s"__d_$keyCol") &&
        F.col(tsCol) >= F.col("__d_valid_from") &&
        (F.col("__d_valid_to").isNull || F.col(tsCol) < F.col("__d_valid_to")))
      .drop(s"__d_$keyCol")
      .withColumnsRenamed(
        d.columns.filter(_ != s"__d_$keyCol").map(c => c -> c.stripPrefix("__d_")).toMap)
  }

  /** Interval-overlap join: every same-key (a, b) pair whose
    * half-open intervals `[a_start, a_end)` and `[b_start, b_end)`
    * overlap — BOTH sides are intervals of varying length, the member
    * of the temporal-join family [[rangeCountJoin]]'s fixed-window
    * bucketing cannot express.
    *
    * Plan shape: each interval replicates into every `bucketSec`-wide
    * grid cell it touches and candidates meet on an equi-join of
    * (key, cell) — never a theta-join pair space. A pair sharing
    * several cells would surface once per shared cell; instead of a
    * dedup shuffle, the join keeps a pair only in the ONE cell
    * containing `max(a_start, b_start)` (both intervals provably
    * cover that instant, and exactly one cell holds it) — duplicate
    * elimination is a map-side filter. Shuffle volume is
    * Σ span/bucketSec per side (linear, tunable via the grid width);
    * per-cell density bounds the pair fan-out the way LSH band size
    * bounds candidate pairs.
    *
    * Output: left columns + right columns (caller pre-aliases names)
    * plus `overlap_us`, the overlap length in microseconds. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String,
                   bucketSec: Long): DataFrame = {
    val usec = bucketSec * 1000000L
    def micros(c: org.apache.spark.sql.Column) =
      F.unix_micros(c.cast("timestamp"))
    def cells(start: String, end: String) =
      // half-open interval: the cell containing (end - 1us) is the
      // last touched; sequence() is inclusive on both ends
      F.explode(F.sequence(
        F.floor(micros(F.col(start)) / usec),
        F.floor((micros(F.col(end)) - 1) / usec)))
    // empty half-open intervals (end <= start) overlap nothing, but
    // sequence(lo, hi) with hi < lo yields a DESCENDING cell list, not
    // zero cells — an empty interval strictly inside another would
    // pass the strict-overlap filter and emit a spurious overlap_us=0
    // pair. Drop them before exploding.
    def nonEmpty(start: String, end: String) =
      micros(F.col(end)) > micros(F.col(start))
    val lb = left.filter(nonEmpty(lStart, lEnd))
      .withColumn("__cell", cells(lStart, lEnd))
    val rb = right.filter(nonEmpty(rStart, rEnd))
      .withColumn("__cell", cells(rStart, rEnd))
    lb.join(rb, Seq(keyCol, "__cell"))
      .filter(micros(F.col(lStart)) < micros(F.col(rEnd)) &&
        micros(F.col(rStart)) < micros(F.col(lEnd)))
      .filter(F.col("__cell") ===
        F.floor(F.greatest(micros(F.col(lStart)), micros(F.col(rStart))) / usec))
      .withColumn("overlap_us",
        F.least(micros(F.col(lEnd)), micros(F.col(rEnd))) -
          F.greatest(micros(F.col(lStart)), micros(F.col(rStart))))
      .drop("__cell")
  }
}
