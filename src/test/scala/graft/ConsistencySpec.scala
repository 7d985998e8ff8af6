package graft

import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Cross-query conservation laws: aggregates that must reconcile with
  * the raw tables no matter how constants or fixtures drift. These
  * catch the silent failure mode oracle comparison can't — both
  * engines agreeing on a query that no longer measures what its name
  * claims (a filter constant gone stale, a spine that stopped
  * covering the data). */
class ConsistencySpec extends SparkSpec {

  private lazy val events = Tables.scan(spark, sf, "events")

  test("x_histogram buckets conserve the total event count and value mass") {
    val h = SparkEntry.queries("x_histogram")(spark, sf)
    val n = h.agg(F.sum("n")).head().getLong(0)
    assert(n == events.count(), "histogram drops or double-counts rows")
    // sum_value is double OUTPUT (driver-hash contract) over an exact
    // decimal internal sum — re-summing the per-bucket doubles can
    // wobble in the last ulps, so the mass check carries a relative
    // tolerance instead of decimal equality
    val mass = h.agg(F.sum("sum_value")).head().getDouble(0)
    val raw = events.agg(F.sum(F.col("value").cast("decimal(18,6)")))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(mass - raw) <= 1e-9 * math.max(1.0, math.abs(raw)),
      s"value mass drifted: $mass vs $raw")
  }

  test("x_gap_fill covers every (day, type) cell and conserves the event count") {
    val g = SparkEntry.queries("x_gap_fill")(spark, sf)
    val nTypes = events.select("event_type").distinct().count()
    // spine bounds are data-derived (min..max event date inclusive)
    val nDays = events
      .agg(F.datediff(F.max(F.to_date(F.col("ts"))),
        F.min(F.to_date(F.col("ts")))))
      .head().getInt(0) + 1
    assert(g.count() == nDays.toLong * nTypes,
      "spine no longer covers days x types")
    assert(g.agg(F.sum("n")).head().getLong(0) == events.count(),
      "gap-filled series loses events — the spine stopped covering the data range")
  }

  test("x_cohort_retention's offset-0 row set accounts for every user exactly once") {
    val r = SparkEntry.queries("x_cohort_retention")(spark, sf)
    val atZero = r.filter(F.col("week_offset") === 0)
      .agg(F.sum("n_users")).head().getLong(0)
    val users = events.select("user_id").distinct().count()
    assert(atZero == users,
      s"cohort triangle base $atZero != $users distinct users")
  }

  test("x_full_outer conserves both feeds' totals") {
    val f = SparkEntry.queries("x_full_outer")(spark, sf)
    val (c, p) = (f.agg(F.sum("n_clicks")).head().getLong(0),
      f.agg(F.sum("n_purchases")).head().getLong(0))
    assert(c == events.filter(F.col("event_type") === "click").count())
    assert(p == events.filter(F.col("event_type") === "purchase").count())
  }

  test("x_vocab_coverage is a valid occurrence ratio on every source") {
    val v = SparkEntry.queries("x_vocab_coverage")(spark, sf)
    val bad = v.filter(F.col("n_in_vocab") > F.col("n_tokens") ||
      F.col("coverage") < 0 || F.col("coverage") > 1).count()
    assert(bad == 0, "coverage outside [0,1] or in-vocab exceeds total")
  }

  test("x_scd2 and x_window_running agree on the purchase row universe") {
    val scd = SparkEntry.queries("x_scd2")(spark, sf).select("event_id")
    val run = SparkEntry.queries("x_window_running")(spark, sf).select("event_id")
    assert(scd.exceptAll(run).count() == 0 && run.exceptAll(scd).count() == 0,
      "the two purchase-derived queries disagree on which rows exist")
  }

  test("novelty conservation: each distinct shingle's first occurrence is counted exactly once") {
    // Σ n_novel over docs must equal the number of DISTINCT shingles
    // in the corpus — every shingle has exactly one first occurrence.
    // A min-id tie bug or a dropped join row breaks this equality.
    val out = SparkEntry.queries("x_novelty")(spark, sf)
    val sumNovel = out.agg(F.sum("n_novel")).collect().head.getLong(0)
    val docs = Tables.scan(spark, sf, "documents")
    val distinctShingles = docs.select(F.explode(
        graft.functions.Text.distinctShingles(F.col("text"), 3)).as("t"))
      .filter(F.col("t") =!= "").select("t").distinct().count()
    assert(sumNovel == distinctShingles,
      s"sum(n_novel)=$sumNovel != distinct shingles $distinctShingles")
  }

  test("source divergence: KL is non-negative (to rounding) and zero only near the mixture") {
    // Gibbs' inequality: KL(source ‖ corpus mixture) >= 0; the 6-dp
    // per-term rounding can push a near-zero KL slightly negative,
    // never more than n_tokens * 5e-7
    val rows = SparkEntry.queries("x_source_divergence")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kl, n) = (r.getAs[Double]("kl"), r.getAs[Long]("n_tokens"))
      assert(!kl.isNaN && !kl.isInfinite, s"${r.get(0)}: kl=$kl")
      assert(kl >= -5e-7 * n, s"${r.get(0)}: kl=$kl below the rounding floor")
    }
  }

  test("entropy bounds: 0 <= H <= ln(n_distinct) per source, to rounding") {
    // Shannon entropy over a distribution of n_distinct outcomes is
    // bounded by ln(n_distinct) (uniform) and 0 (degenerate); the
    // 6-dp per-term rounding moves each bound by at most
    // n_distinct * 5e-7
    val rows = SparkEntry.queries("x_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val nd = r.getAs[Long]("n_distinct")
      assert(!h.isNaN && !h.isInfinite, s"${r.get(0)}: H=$h")
      val slack = 5e-7 * nd
      assert(h >= -slack, s"${r.get(0)}: H=$h negative beyond rounding")
      assert(h <= math.log(nd.toDouble) + slack,
        s"${r.get(0)}: H=$h above ln($nd)")
    }
  }

  test("truncated EWMA equals the brute-force weighted mean of the trailing window") {
    import spark.implicits._
    val alpha = 0.3; val depth = 4
    val rows = Seq( // two users, deliberately interleaved arrival order
      (1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0),
      (4L, 1L, 40.0), (5L, 1L, 50.0), (6L, 1L, 60.0),
      (7L, 2L, 5.0), (8L, 2L, 15.0))
    val df = rows.map { case (id, u, v) => (id, u, id, v) }
      .toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Analytics
      .ewma(df, "user_id", "ts", "event_id", "value", alpha, depth)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma"))
      .toMap
    // Scala reference: same weights over the available trailing rows
    val byUser = rows.groupBy(_._2).view.mapValues(_.sortBy(_._1)).toMap
    for ((id, u, _) <- rows) {
      val seq = byUser(u)
      val i = seq.indexWhere(_._1 == id)
      val window = (0 until depth).flatMap { j =>
        if (i - j >= 0) Some(alpha * math.pow(1 - alpha, j) -> seq(i - j)._3)
        else None
      }
      val want = window.map { case (w, v) => w * v }.sum /
        window.map(_._1).sum
      assert(math.abs(got(id) - want) < 1e-9, s"event $id: ${got(id)} vs $want")
    }
  }

  test("every graded query has an oracle (or a documented rows-only exemption); no orphan oracles") {
    // A query silently missing its oracleSql entry degrades to the
    // weak rows-only check and no one notices — the alignment is a
    // grading-surface invariant, so pin it. Exemptions must be listed
    // HERE with their reason.
    val rowsOnly = Set(
      // DuckDB's HLL is a different implementation — estimates can't
      // hash-match; QualitySpec pins the ≤5% error bound instead
      "x_hll_cardinality")
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty,
      s"queries with no oracle and no exemption: ${missing.toSeq.sorted.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracles for queries that do not exist: ${orphans.toSeq.sorted.mkString(", ")}")
    val pointless = rowsOnly -- SparkEntry.queries.keySet
    assert(pointless.isEmpty, s"stale exemptions: $pointless")
  }
}
