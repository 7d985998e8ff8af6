package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, functions => F}

/** Event-analytics operators over the `events` fact: ordered-stage
  * funnels and robust (median/MAD) outlier detection — the
  * product-analytics surface next to the windowed aggregations in
  * [[graft.streaming.EventWindows]].
  */
object Analytics {

  /** Ordered-stage funnel: how many users reach each stage, where
    * stage i+1 only counts an event AT OR AFTER the user's stage-i
    * time (first-touch semantics: each stage binds to the EARLIEST
    * qualifying event). Output: one row per stage
    * `(stage, stage_idx, n_users)`.
    *
    * Scale shape: one chain of groupBy(user) → equi-join(user) →
    * groupBy(user) steps, all hash-partitioned on the SAME key — the
    * first aggregation pays the only real fact shuffle and every
    * later exchange reuses that partitioning; the ordering constraint
    * lives in a conditional `min`, never in a non-equi join
    * predicate, so no nested-loop pair space exists at any size. The
    * final count-per-stage reduces a user-grain frame to |stages|
    * rows.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             maxGapSec: Option[Long] = None): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val user = F.col(userCol)
    var cur = events.filter(F.col(typeCol) === stages.head)
      .groupBy(user.as("u")).agg(F.min(tsCol).as("t0"))
    for ((st, i) <- stages.tail.zipWithIndex) {
      val nxt = events.filter(F.col(typeCol) === st)
        .select(user.as("u"), F.col(tsCol).as("ev_ts"))
      val carried = (0 to i).map(j => F.min(s"t$j").as(s"t$j"))
      // optional conversion window: stage i+1 must land within
      // maxGapSec of stage i, not merely after it — "eventually
      // converted" and "converted within a day" are different product
      // questions and the bound changes which first-touch binds
      val inWindow = maxGapSec.fold(F.col("ev_ts") >= F.col(s"t$i")) { g =>
        F.col("ev_ts") >= F.col(s"t$i") &&
          F.unix_micros(F.col("ev_ts").cast("timestamp")) -
            F.unix_micros(F.col(s"t$i").cast("timestamp")) <= g * 1000000L
      }
      cur = cur.join(nxt, Seq("u"), "left")
        .groupBy("u")
        .agg(carried.head,
          carried.tail :+
            F.min(F.when(inWindow, F.col("ev_ts"))).as(s"t${i + 1}"): _*)
    }
    val one = cur.agg(
      F.count(F.col("t0")).as("n0"),
      stages.indices.tail.map(i => F.count(F.col(s"t$i")).as(s"n$i")): _*)
    val entries = F.explode(F.array(stages.zipWithIndex.map { case (st, i) =>
      F.struct(F.lit(st).as("stage"), F.lit(i.toLong).as("stage_idx"),
        F.col(s"n$i").as("n_users"))
    }: _*))
    one.select(entries.as("e"))
      .select(F.col("e.stage").as("stage"),
        F.col("e.stage_idx").as("stage_idx"),
        F.col("e.n_users").as("n_users"))
  }

  /** Top-n rows per key via the bounded-heap [[graft.plans.
    * TopKAggregator]] — the scale-preferred plan for "best n per
    * group": the window formulation (`row_number() OVER (PARTITION BY
    * key ORDER BY …)`) shuffles and SORTS every row of every group,
    * while the aggregator reduces each map-side partition to ≤ n
    * entries per key BEFORE the exchange, so the shuffle moves
    * O(keys × n) rows regardless of fact size. Identical output to
    * the window form (same (score desc, id asc) tie-break), which is
    * exactly what the oracle checks. */
  def topNPerKey(df: DataFrame, keyCol: String, idCol: String,
                 scoreCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(F.col(keyCol).cast("long"), F.col(idCol).cast("long"),
        F.col(scoreCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.plans.TopKAggregator(n).toColumn.name("top"))
      .flatMap { case (k, top) =>
        top.zipWithIndex.map { case ((id, sc), i) => (k, i + 1L, id, sc) }
      }
      .toDF(keyCol, "rnk", idCol, scoreCol)
  }

  /** Truncated EWMA smoothing per key: each row's smoothed value is
    * the weight-normalized sum of the last `depth` values in
    * (ts, id) order, with weights `alpha·(1−alpha)^j`. The truncation
    * is what makes the operator SCALE-SHAPED: true EWMA is a
    * sequential recurrence (row i needs row i−1's result — an
    * inherently serial scan per key), while the depth-`d` window is a
    * fixed fan of `lag` expressions the window engine evaluates in
    * ONE partitioned pass, at a bias of `(1−alpha)^d` (≈0.6% at
    * alpha 0.3, d 8) the normalization further shrinks. Sequence
    * heads average over the shorter available window rather than
    * decaying toward zero. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String, alpha: Double, depth: Int): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    require(depth >= 1, s"depth must be >= 1: $depth")
    val w = Window.partitionBy(keyCol).orderBy(F.col(tsCol), F.col(idCol))
    val terms = (0 until depth).map { j =>
      val wj = alpha * math.pow(1 - alpha, j)
      val l = if (j == 0) F.col(valueCol) else F.lag(F.col(valueCol), j).over(w)
      (F.when(l.isNotNull, F.lit(wj) * l).otherwise(F.lit(0.0)),
        F.when(l.isNotNull, F.lit(wj)).otherwise(F.lit(0.0)))
    }
    events.withColumn("ewma",
      terms.map(_._1).reduce(_ + _) / terms.map(_._2).reduce(_ + _))
  }

  /** Per-group mean imputation — [[standardize]]'s sibling in the ML
    * preprocessing pair: NULL values fill with their group's mean of
    * the NON-NULL values, computed from DECIMAL-exact sums so the
    * imputed constant is merge-order-stable (a group whose mean
    * drifts by a ULP between runs would poison every downstream
    * hash). An all-NULL group has no mean and stays NULL — imputation
    * invents no data. Broadcast group means, map-side coalesce. */
  def imputeMean(df: DataFrame, groupCol: String, valueCol: String,
                 idCols: Seq[String]): DataFrame = {
    val x = F.col(valueCol).cast("decimal(18,6)")
    val m = df.groupBy(F.col(groupCol).as("g"))
      .agg((F.sum(x).cast("double") /
        F.count(F.col(valueCol)).cast("double")).as("g_mean"))
    df.join(F.broadcast(m), F.col(groupCol) === F.col("g"))
      .select(idCols.map(F.col) ++ Seq(
        F.col(groupCol),
        F.coalesce(F.col(valueCol), F.col("g_mean")).as("value_imputed"),
        F.col(valueCol).isNull.as("was_null")): _*)
  }

  /** Event-grain sessionization (gaps-and-islands): label every event
    * with its user's session ordinal, where a gap > `gapSec` between
    * consecutive events opens a new session. The per-EVENT twin of
    * the `session_window` AGGREGATE in
    * [[graft.streaming.EventWindows.sessions]] — downstream operators
    * that need the raw events with a session key (per-session
    * funnels, session-scoped dedup) consume this grain, not the
    * aggregate.
    *
    * One shuffle on the user key; both window passes (the lag flag
    * and the running flag-sum) share that partitioning. Ordering
    * includes the id column so ties are impossible and the labels are
    * deterministic. */
  /** Sequence-pattern matching (MATCH_RECOGNIZE-lite): per key, count
    * non-overlapping occurrences of a STRICTLY CONSECUTIVE event-type
    * pattern — the adjacency-sensitive twin of the funnel (which
    * binds stages "eventually after", not "immediately after").
    *
    * Each key's events collapse to an ordered code string (one char
    * per event — the first letters of this fixture's types are
    * unique; ordering is (ts, id), a total order) and the pattern
    * count is pure string arithmetic:
    * `(len(s) − len(replace(s, pat, ''))) / len(pat)` — `replace`'s
    * left-to-right non-overlapping semantics ARE the standard match
    * semantics, identical in Spark and DuckDB (the same trick as the
    * BPE merge).
    *
    * Scale: one shuffle groups each key's events; the assembled
    * string is bounded by the per-key event count (the same per-key
    * bound sessionization carries) and never leaves its task. */
  def sequencePattern(events: DataFrame, userCol: String, tsCol: String,
                      idCol: String, typeCol: String,
                      pattern: Seq[String]): DataFrame = {
    require(pattern.nonEmpty && pattern == pattern.distinct,
      "pattern stages must be non-empty and distinct")
    // codes are assigned by FULL stage name, not a first-letter
    // abbreviation: two data types sharing a first letter (click /
    // checkout) would otherwise silently count as each other. Stage i
    // encodes as ('a'+i); every non-stage event becomes '.', which
    // breaks adjacency exactly like any other non-matching character.
    val code = pattern.zipWithIndex.foldLeft(F.lit(".")) {
      case (acc, (stage, i)) =>
        F.when(F.col(typeCol) === stage, ('a' + i).toChar.toString)
          .otherwise(acc)
    }
    val pat = pattern.indices.map(i => ('a' + i).toChar).mkString
    val seq = F.array_join(
      F.transform(
        F.sort_array(F.collect_list(F.struct(
          F.col(tsCol).as("ts"), F.col(idCol).as("id"),
          code.as("code")))),
        x => x.getField("code")), "")
    events.groupBy(F.col(userCol))
      .agg(seq.as("__seq"))
      .select(F.col(userCol),
        F.length(F.col("__seq")).cast("long").as("n_events"),
        ((F.length(F.col("__seq")) -
          F.length(F.replace(F.col("__seq"), F.lit(pat), F.lit("")))) / pat.length)
          .cast("long").as("n_matches"))
  }

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(F.col(tsCol), F.col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def us(c: org.apache.spark.sql.Column) = F.unix_micros(c.cast("timestamp"))
    val prev = F.lag(F.col(tsCol), 1).over(w)
    val opens = F.when(prev.isNull ||
      us(F.col(tsCol)) - us(prev) > gapSec * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_seq", F.sum(opens).over(run))
  }

  /** Per-group z-score standardization — the ML feature-scaling step
    * — with DECIMAL-exact sums: sum/sum-of-squares accumulate as
    * decimals (associative, merge-order-stable), and only the final
    * per-group scalars drop to double, so the emitted z-scores are
    * bit-identical regardless of partial-aggregation order (Spark's
    * native avg/stddev over doubles are merge-order-dependent — the
    * same trick `x_stats_corr` uses). Groups with zero variance (or a
    * single row) emit NULL rather than an engine-dependent Inf/NaN.
    *
    * One grouped pass builds the (groups-cardinality small) moment
    * frame; it broadcasts onto the fact scan for a map-side z — the
    * corpus itself is never shuffled. */
  def standardize(df: DataFrame, groupCol: String, valueCol: String,
                  idCols: Seq[String]): DataFrame = {
    val x = F.col(valueCol).cast("decimal(18,6)")
    // n counts NON-NULL values (matching what sx/sxx sum) — count(*)
    // here would skew mean/std whenever the value column holds NULLs.
    // NULL groups are excluded by the inner equi-join below, the
    // standard SQL grouping convention.
    val m = df.groupBy(F.col(groupCol).as("g"))
      .agg(F.count(x).as("n"),
        F.sum(x).as("sx"), F.sum(x * x).as("sxx"))
    val (n, sx, sxx) = (F.col("n").cast("double"),
      F.col("sx").cast("double"), F.col("sxx").cast("double"))
    val stats = m.select(F.col("g"),
      (sx / n).as("mean"),
      F.sqrt((sxx - sx * sx / n) / (n - 1)).as("std"))
    df.join(F.broadcast(stats), F.col(groupCol) === F.col("g"))
      .select(idCols.map(F.col) ++ Seq(
        F.col(groupCol), F.col(valueCol),
        F.when(F.col("std") === 0.0 || F.col("std").isNull,
            F.lit(null).cast("double"))
          .otherwise((F.col(valueCol) - F.col("mean")) / F.col("std"))
          .as("z")): _*)
  }

  /** Robust per-group outliers: rows where
    * `|value - median| > cut * MAD`, with median and MAD (median
    * absolute deviation) computed EXACTLY per group via the
    * sort-based `percentile` aggregate — the outlier gate that, unlike
    * mean/stddev z-scores, a few extreme values cannot drag.
    *
    * Two grouped passes (median needs to exist before deviations do),
    * both keyed on the group column so the second reuses the first's
    * partitioning; the per-group (median, MAD) frame is
    * groups-cardinality small and broadcasts onto the fact scan for a
    * map-side filter — the corpus is never shuffled to be filtered.
    * Groups with MAD = 0 (constant-valued) flag any deviation, which
    * is the standard convention and deterministic. */
  def madOutliers(events: DataFrame, groupCol: String, valueCol: String,
                  idCols: Seq[String], cut: Double = 3.0): DataFrame = {
    val g = F.col(groupCol)
    val v = F.col(valueCol)
    val med = events.groupBy(g.as("g"))
      .agg(F.percentile(v, F.lit(0.5)).as("med"))
    val stats = events.select(g.as("g"), v.as("v"))
      .join(med, Seq("g"))
      .groupBy("g")
      .agg(F.min("med").as("med"),
        F.percentile(F.abs(F.col("v") - F.col("med")), F.lit(0.5)).as("mad"))
    events.join(F.broadcast(stats), g === F.col("g"))
      .filter(F.abs(v - F.col("med")) > F.lit(cut) * F.col("mad"))
      .select(idCols.map(F.col) :+ g.as(groupCol) :+ v.as(valueCol): _*)
  }
}
