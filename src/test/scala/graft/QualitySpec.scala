package graft

import graft.operators.{Analytics, Quality}
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Planted-fixture semantics for the data-quality and event-analytics
  * operators (the graded queries pin them against DuckDB on the real
  * fixture; these pin the EDGE semantics a synthetic corpus may never
  * hit: null/dup handling, MG's no-miss guarantee under adversarial
  * partitioning, funnel ordering constraints, the MAD=0 convention).
  */
class QualitySpec extends SparkSpec {

  test("profile counts nulls/distincts and renders min in native order") {
    import spark.implicits._
    val df = Seq(
      (Some(9L), Some("10")),
      (Some(10L), Some("9")),
      (Some(9L), None),
      (None, Some("9"))).toDF("n", "s")
    val rows = Quality.profile(df, Seq("n", "s")).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val n = rows("n")
    assert(n.getAs[Long]("n_rows") == 4 && n.getAs[Long]("n_nulls") == 1)
    assert(n.getAs[Long]("n_distinct") == 2)
    // min-then-cast: numeric 9 < 10 even though "10" < "9" lexically
    assert(n.getAs[String]("min_value") == "9")
    assert(n.getAs[String]("max_value") == "10")
    val s = rows("s")
    // string column: lexicographic IS the native order ("10" < "9")
    assert(s.getAs[String]("min_value") == "10")
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[Long]("n_distinct") == 2)
  }

  test("constraint suite counts each violation kind exactly") {
    import spark.implicits._
    val child = Seq(
      (Some(1L), Some("A"), 5.0),
      (Some(2L), Some("B"), -1.0),
      (Some(2L), Some("Z"), 0.0),
      (None, None, 3.0)).toDF("id", "status", "amount")
    val parent = Seq(1L).toDF("pk")
    val got = Quality.checkConstraints(child, Seq(
      Quality.NotNull("id"),
      Quality.Unique("id"),
      Quality.InSet("status", Seq("A", "B")),
      Quality.Check("amount_positive", F.col("amount") > 0),
      Quality.RefIntegrity("id", parent, "pk")))
      .collect().map(r =>
        r.getAs[String]("constraint") ->
          (r.getAs[Long]("violations"), r.getAs[Boolean]("passed"))).toMap
    assert(got("not_null(id)") == ((1L, false)))
    assert(got("unique(id)") == ((1L, false)), "one surplus duplicate row")
    assert(got("in_set(status)") == ((1L, false)), "NULL must not count")
    assert(got("check(amount_positive)") == ((2L, false)), "0 and -1 fail")
    assert(got("ref(id)") == ((2L, false)), "both id=2 rows are orphans")
    // a passing suite reports passed=true with zero violations
    val clean = Quality.checkConstraints(parent, Seq(Quality.NotNull("pk")))
      .collect().head
    assert(clean.getAs[Long]("violations") == 0L &&
      clean.getAs[Boolean]("passed"))
  }

  test("heavy hitters: exact set, no misses, partitioning-independent") {
    import spark.implicits._
    val items = Seq.fill(40)("a") ++ Seq.fill(30)("b") ++
      (0 until 30).map(i => s"tail$i") // n=100, k=5 → threshold 20
    def run(parts: Int) =
      Quality.heavyHitters(
        items.toDF("item").repartition(parts), "item", k = 5)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // adversarial partitioning (many tiny partitions dilute local
    // counts) must not lose a true heavy hitter — the pigeonhole
    // guarantee the operator documents
    for (parts <- Seq(1, 3, 16)) {
      val got = run(parts)
      assert(got == Map("a" -> 40L, "b" -> 30L),
        s"parts=$parts: got $got")
    }
  }

  test("funnel binds each stage at-or-after the previous stage's first touch") {
    import spark.implicits._
    val ev = Seq(
      // user 1: clean view→click→purchase
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // user 2: pre-view click ignored; purchase BEFORE the counted
      // click must not count (ordering, not mere presence)
      (2L, 1L, "click"), (2L, 2L, "view"), (2L, 5L, "click"),
      (2L, 4L, "purchase"),
      // user 3: purchase with no view — never enters the funnel
      (3L, 1L, "purchase"),
      // user 4: view only
      (4L, 1L, "view")).toDF("user_id", "ts", "event_type")
    val got = Analytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users"))
      .toMap
    assert(got == Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L), got)
  }

  test("windowed funnel: a conversion after the gap does not count, within it does") {
    import spark.implicits._
    val ev = Seq(
      // user 1 converts inside the 10s window at both hops
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 12L, "purchase"),
      // user 2's click lands AFTER the window — eventually-converted
      // but not windowed-converted; the unbounded funnel must count it
      (2L, 0L, "view"), (2L, 30L, "click")).toDF("user_id", "ts", "event_type")
    // the operator's window bound casts through unix_micros, so the
    // planted longs become real timestamps
    val tev = ev.withColumn("ts", F.timestamp_seconds(F.col("ts")))
    def tcounts(gap: Option[Long]) =
      Analytics.funnel(tev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSec = gap)
        .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users"))
        .toMap
    assert(tcounts(None) == Map("view" -> 2L, "click" -> 2L, "purchase" -> 1L))
    assert(tcounts(Some(10L)) == Map("view" -> 2L, "click" -> 1L, "purchase" -> 1L),
      "the 30s-late click must fall outside the 10s window")
  }

  test("MAD outliers: robust gate flags the planted extremes only; MAD=0 flags any deviation") {
    import spark.implicits._
    val rows =
      (1 to 9).map(i => (i.toLong, "b", i.toDouble)) ++
        Seq((10L, "b", 1000.0)) ++ // med 5.5, MAD 2.5 → only 1000 flagged
        (11 to 14).map(i => (i.toLong, "a", 7.0)) ++
        Seq((15L, "a", 7.5)) // med 7, MAD 0 → only the 7.5 deviates
    val got = Analytics.madOutliers(rows.toDF("event_id", "event_type", "value"),
      "event_type", "value", Seq("event_id"), cut = 3.0)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(got == Set(10L, 15L), got)
  }

  test("HLL sketch estimate stays within 5% of exact at real cardinality") {
    // high-cardinality stream: one md5 per event (sf fixture ~1k) —
    // unlike the 31-token vocab the graded query sees, this actually
    // exercises estimation
    val ids = Tables.scan(spark, sf, "events")
      .select(F.md5(F.col("event_id").cast("string")).as("k"))
    val exact = ids.distinct().count()
    val est = ids.agg(F.hll_sketch_agg(F.col("k"), 12).as("sk"))
      .select(F.hll_sketch_estimate(F.col("sk"))).collect().head.getLong(0)
    val relErr = math.abs(est - exact).toDouble / exact
    assert(relErr <= 0.05, s"est=$est exact=$exact relErr=$relErr")
  }

  test("x_hll_cardinality: union row merges the per-source sketches losslessly") {
    val out = SparkEntry.queries("x_hll_cardinality")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("est_distinct"))
      .toMap
    val nSources = Tables.scan(spark, sf, "documents")
      .select("source").distinct().count()
    assert(out.size == nSources + 1, s"expected $nSources sources + union row")
    val union = out("__all__")
    // the union estimates the UNION of the per-source token sets: at
    // least every per-source estimate, at most their sum
    assert(union >= out.filterKeys(_ != "__all__").values.max)
    assert(union <= out.filterKeys(_ != "__all__").values.sum)
  }

  test("Naive Bayes quality gate: perfect separation on disjoint vocabularies; scores partition-independent") {
    import spark.implicits._
    import graft.operators.Curation
    // seed extremes: repetitive docs (one word over and over, ratio
    // -> 0) vs fully diverse docs (ratio 1.0); held-out mid-ratio
    // docs (0.5 <= r < 0.8 — NOT seeds) mix one class's vocabulary
    // with enough repeats to stay out of both seed bands
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),            // neg seed
      (2L, "junk junk junk junk junk junk"),            // neg seed
      (3L, "alpha beta gamma delta epsilon zeta"),      // pos seed
      (4L, "iota kappa sigma tau phi omega"),           // pos seed
      (5L, "spam junk spam junk spam junk spam junk"),  // neg seed (r=0.25)
      (6L, "alpha beta gamma alpha beta gamma ok hm")   // held out (r=0.625)
    ).toDF("doc_id", "text")
    val got = Curation.naiveBayesQuality(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pred"), r.getAs[Double]("score_pos"),
          r.getAs[Double]("score_neg"))).toMap
    // seeds classify themselves
    assert(got(1L)._1 == 0L && got(2L)._1 == 0L, got)
    assert(got(3L)._1 == 1L && got(4L)._1 == 1L, got)
    // doc 5 (ratio 2/8 = 0.25 — a neg seed) and doc 6 (ratio 5/8 =
    // 0.625 — held out) generalize through vocabulary co-occurrence
    assert(got(5L)._1 == 0L, got)
    assert(got(6L)._1 == 1L, got)
    // scores are decimal-deterministic across partitionings
    val base = Curation.naiveBayesQuality(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    for (p <- Seq(1, 7)) {
      val rep = Curation.naiveBayesQuality(
        docs.repartition(p), "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(rep == base, s"partitions=$p changed NB scores")
    }
    // MERGEABLE model: training per split and merging the count
    // partials lands on the identical model — including an uneven
    // split where one side holds only one class's seeds
    for (m <- Seq(2L, 3L)) {
      val inc = Curation.naiveBayesQualityIncremental(
        Seq(docs.filter(F.col("doc_id") % m === 0),
          docs.filter(F.col("doc_id") % m =!= 0)),
        "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(inc == base, s"split mod $m: incremental model diverged")
    }
  }

  test("x_hll_cardinality estimates within 5% of the x_distinct_exact twin, row for row") {
    // the exact twin is oracle-graded; pinning the sketch against it
    // makes the HLL estimate the ONLY ungraded number on the board
    val est = SparkEntry.queries("x_hll_cardinality")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("est_distinct")).toMap
    val exact = SparkEntry.queries("x_distinct_exact")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_distinct")).toMap
    assert(est.keySet == exact.keySet)
    for ((src, ex) <- exact) {
      val relErr = math.abs(est(src) - ex).toDouble / ex
      assert(relErr <= 0.05, s"$src: est=${est(src)} exact=$ex relErr=$relErr")
    }
  }
}
