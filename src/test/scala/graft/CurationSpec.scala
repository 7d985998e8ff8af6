package graft

import graft.operators.{Curation, Temporal}
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}
import java.sql.Timestamp

/** Pins the curation + temporal-join operators on crafted fixtures
  * (the oracle pins them on the real tables; these pin the edge
  * semantics the fixtures can't reach). */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = Tables.scan(spark, sf, "documents")

  test("contaminated flags exactly the docs sharing an n-gram with the bench split") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon"), // bench (id % 2 == 0 for this test)
      (1L, "alpha beta gamma delta zeta"),    // shares 4-gram "alpha beta gamma delta"
      (3L, "one two three four five"),        // disjoint
      (5L, "gamma delta epsilon alpha beta")  // shares no 4-gram (different order)
    ).toDF("doc_id", "text")
    val out = Curation.contaminated(df, "doc_id", "text",
        F.col("doc_id") % 2 === 0, n = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L))
  }

  test("decontaminate keeps bench rows and drops contaminated ones") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta zeta"),
      (3L, "one two three four five")
    ).toDF("doc_id", "text")
    val kept = Curation.decontaminate(df, "doc_id", "text",
        F.col("doc_id") % 2 === 0, n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L))
  }

  test("contaminatedContainment flags a benchmark doc quoted inside a long doc that Jaccard misses") {
    // bench doc 0 (5 tokens → 3 trigram shingles) is quoted verbatim
    // inside training doc 1, which is 8× longer — containment of the
    // bench set is 1.0 while Jaccard is ~3/40: the leak shape the
    // MinHash pass structurally under-surfaces. Doc 3 shares nothing.
    val quote = "alpha beta gamma delta epsilon"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (0L, quote),                    // bench (id % 2 == 0)
      (1L, s"$filler $quote"),        // contains the full quote
      (3L, "one two three four five") // disjoint
    ).toDF("doc_id", "text")
    val out = Curation.contaminatedContainment(df, "doc_id", "text",
        F.col("doc_id") % 2 === 0, threshold = 0.9, dfCap = 20)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1L, 1.0)),
      s"expected doc 1 flagged with containment 1.0, got ${out.toSeq}")
    // and the Jaccard the fuzzy pass estimates really is tiny here:
    // 3 shared shingles over a ~41-shingle union
    val sh = graft.functions.Text.distinctShingles(F.col("text"), 3)
    val sets = df.select(F.col("doc_id"), sh.as("s")).as[(Long, Seq[String])]
      .collect().toMap
    val j = (sets(0L).toSet & sets(1L).toSet).size.toDouble /
      (sets(0L).toSet | sets(1L).toSet).size
    assert(j < 0.1, s"fixture no longer exhibits the low-Jaccard shape ($j)")
  }

  test("temperatureMix upsamples small sources toward uniform, clamps at whole-group") {
    import graft.functions.Text
    // source "big" has 9x the rows/tokens of "small"; with alpha = 0.5
    // the sqrt weighting pushes shares toward uniform, so at a budget
    // equal to ~half the corpus the SMALL source clamps to rate 1
    // (kept whole) while "big" is downsampled — and the kept set is
    // deterministic (same input → same rows, no RNG anywhere)
    val docs = ((1 to 90).map(i => (i.toLong, "big", "tok tok tok tok")) ++
      (101 to 110).map(i => (i.toLong, "small", "tok tok tok tok")))
      .toDF("doc_id", "source", "text")
    // tokens: big = 360, small = 40; w = 18.973666/6.324555;
    // budget 200: small rate = .25*200/40 = 1.25 → clamp 1.0
    val kept = Curation.temperatureMix(docs, "doc_id", "source",
        Text.tokenCount(F.col("text")), alpha = 0.5, budget = 200L)
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource("small") == 10, s"small source must be kept whole: $bySource")
    assert(bySource("big") < 90, s"big source must be downsampled: $bySource")
    val again = Curation.temperatureMix(docs, "doc_id", "source",
        Text.tokenCount(F.col("text")), alpha = 0.5, budget = 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet, "mix must be deterministic")
  }

  test("bigramLmScore ranks predictable text above token salad, excludes <2-token docs") {
    // doc 1 repeats one bigram (high P under the corpus model), doc 2
    // is all-unique tokens (every bigram at the smoothing floor), doc
    // 3 has a single token (no bigram — excluded from output)
    val df = Seq(
      (1L, "the cat sat the cat sat the cat sat the cat sat"),
      (2L, "qq ww ee rr tt yy uu ii oo pp"),
      (3L, "lonely")
    ).toDF("doc_id", "text")
    val out = Curation.bigramLmScore(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(3L), "a doc with no bigram must not be scored")
    assert(out(1L)._2 == 11L && out(2L)._2 == 9L) // n-1 bigrams each
    assert(out(1L)._3 > out(2L)._3,
      s"repetitive text must outscore token salad: ${out(1L)._3} vs ${out(2L)._3}")
  }

  test("repetitionMetrics measures top/dup bigram fractions") {
    val df = Seq(
      (1L, "a b a b a b"),  // bigrams: ab,ba,ab,ba,ab -> top 3/5, dup 1-2/5
      (2L, "w x y z")       // 3 distinct bigrams
    ).toDF("doc_id", "text")
    val m = Curation.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(m(1L) == ((5L, 3.0 / 5.0, 1.0 - 2.0 / 5.0, false)))
    assert(m(2L) == ((3L, 1.0 / 3.0, 0.0, false)))
  }

  test("repetition of a single-token text is the whole-text shingle") {
    val m = Curation.repetitionMetrics(Seq((1L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(m.length == 1 && m(0).getLong(1) == 1L)
  }

  test("hashSample is deterministic and map-only") {
    val a = Curation.hashSample(docs, "doc_id", 20).select("doc_id")
      .as[Long].collect().toSet
    val b = Curation.hashSample(docs, "doc_id", 20).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b && a.nonEmpty && a.size < docs.count())
    // no exchange in the plan: sampling must not shuffle
    val plan = Curation.hashSample(docs, "doc_id", 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("quotaPerGroup caps every group at the quota, deterministically") {
    val out = Curation.quotaPerGroup(docs, "doc_id", "source", 3)
    val sizes = out.groupBy("source").count().as[(String, Long)].collect()
    assert(sizes.nonEmpty && sizes.forall(_._2 <= 3))
    val a = out.select("doc_id").as[Long].collect().sorted
    val b = Curation.quotaPerGroup(docs, "doc_id", "source", 3)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("contaminatedBloom is result-identical to the exact operator") {
    // Bloom has no false negatives and the confirm join removes the
    // false positives — the contract the shared oracle relies on
    val pred = F.col("doc_id") % 41 === 0
    val exact = Curation.contaminated(docs, "doc_id", "text", pred, n = 4)
      .as[(Long, Long)].collect().toSet
    val bloom = Curation.contaminatedBloom(docs, "doc_id", "text", pred,
        n = 4, fpp = 0.01)
      .as[(Long, Long)].collect().toSet
    assert(bloom == exact && exact.nonEmpty)
  }

  test("assignSplit is map-only, exhaustive, and append-stable") {
    val out = Curation.assignSplit(docs, "doc_id", 80, 10)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "split assignment must not shuffle")
    val bySplit = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(bySplit("train") / n > 0.7 && bySplit("train") / n < 0.9)
    // append-stability: the split of a doc never depends on which
    // other rows are present (pure function of the id)
    val subset = Curation.assignSplit(docs.filter(F.col("doc_id") % 2 === 0),
        "doc_id", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = out.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(subset.forall { case (id, s) => full(id) == s })
  }

  test("chunkDocs covers every token with the documented chunk geometry") {
    val size = 32; val stride = 24
    val chunks = Curation.chunkDocs(docs, "doc_id", "text", size, stride)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2) }
    val nToks = docs.select(F.col("doc_id"),
        F.size(graft.functions.Text.tokens(F.col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.keySet == nToks.keySet)
    chunks.foreach { case (id, cs) =>
      val n = nToks(id)
      val expected = if (n <= size) 1L
        else math.ceil((n - size).toDouble / stride).toLong + 1L
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks, want $expected")
      assert(cs.map(_._2).toSeq == (0L until expected), s"doc $id: ordinals")
      // last chunk reaches the end of the document; earlier chunks full
      val last = cs.last
      assert(last._2 * stride + last._3 == n, s"doc $id: tail not covered")
      cs.dropRight(1).foreach(c => assert(c._3 == size, s"doc $id: short mid-chunk"))
    }
    // map-only: chunking must not shuffle
    val plan = Curation.chunkDocs(docs, "doc_id", "text", size, stride)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("weightedSample keeps proportionally to weight, map-only") {
    import graft.functions.Text
    val q = Text.qualityScore(F.col("text"))
    val out = Curation.weightedSample(docs, "doc_id", q, rate = 0.5)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val kept = out.count().toDouble / docs.count()
    // corpus mean quality ~0.5-0.7 → keep fraction must sit well
    // inside (rate·min_q, rate): proportionality, not plain Bernoulli
    assert(kept > 0.05 && kept < 0.5, s"keep fraction $kept out of range")
    // weight 1.0 degenerates to hashSample at the same rate
    val flat = Curation.weightedSample(docs, "doc_id", F.lit(1.0), rate = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val plain = Curation.hashSample(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    // same hash, same threshold scale — not necessarily equal sets
    // (different granularity), but weight-1 keep rate ≈ rate
    assert(math.abs(flat.size.toDouble / docs.count() - 0.2) < 0.05)
    assert(plain.nonEmpty)
  }

  test("vocabularyOverlap computes pairwise token-set Jaccard, overlapping pairs only") {
    val df = Seq(
      ("a", "x y z"), ("b", "y z w"), ("c", "q"),
      ("a", "x")  // second doc, same vocab — distinct must collapse it
    ).toDF("source", "text")
    val got = Curation.vocabularyOverlap(df, "source", "text")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // |a∩b| = {y,z} = 2, |a∪b| = {x,y,z,w} = 4; disjoint pairs absent
    assert(got == Map(("a", "b") -> (2L, 0.5)))
  }

  // ---- temporal ----

  private def ts(s: String) = Timestamp.valueOf(s)

  test("packSequences: contiguous fill, ≤1-doc overflow, assignment total") {
    val budget = 10L
    val df = Seq(
      // source a: tokens 4,4,4 → cum-starts 0,4,8 → bins 0,0,0 (8 < 10)
      (1L, "a", "w w w w"), (2L, "a", "w w w w"), (3L, "a", "w w w w"),
      // next doc starts at 12 → bin 1
      (4L, "a", "w w"),
      // source b: a 25-token doc spans bins; next doc starts at 25 → bin 2
      (10L, "b", Seq.fill(25)("w").mkString(" ")), (11L, "b", "w")
    ).toDF("doc_id", "source", "text")
    val got = Curation.packSequences(df, "doc_id", "source", "text", budget)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "a", 4L, 0L), (2L, "a", 4L, 0L), (3L, "a", 4L, 0L),
      (4L, "a", 2L, 1L),
      (10L, "b", 25L, 0L), (11L, "b", 1L, 2L)))

    // real-table invariant: within each (source, bin), every doc but
    // the last starts inside the budget — overflow is at most the
    // final document (the contiguous-fill contract)
    val packed = Curation.packSequences(docs, "doc_id", "source", "text", 2048L)
      .as[(Long, String, Long, Long)].collect()
    assert(packed.length == docs.count())
    packed.groupBy(r => (r._2, r._4)).foreach { case ((src, bin), rs) =>
      val toks = rs.sortBy(_._1).map(_._3)
      assert(toks.dropRight(1).sum < 2048L,
        s"bin ($src,$bin) admitted a doc starting past the budget")
    }
  }

  test("asofJoin carries the latest at-or-before build row, NULL when none") {
    val probe = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")), // after both purchases
      (11L, 1L, ts("2024-01-01 08:30:00")), // between
      (12L, 1L, ts("2024-01-01 07:00:00")), // before any -> NULL
      (13L, 2L, ts("2024-01-01 09:00:00"))  // equal ts -> inclusive match
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (1L, ts("2024-01-01 08:00:00"), 5.0),
      (1L, ts("2024-01-01 09:00:00"), 7.0),
      (2L, ts("2024-01-01 09:00:00"), 9.0)
    ).toDF("user_id", "ts", "value")
    val out = Temporal.asofJoin(probe, build, "user_id", "ts", "value",
        prefix = "p")
      .select("event_id", "p_ts", "p_value")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.get(2)))).toMap
    assert(out(10L) == ((Some(ts("2024-01-01 09:00:00")), Some(7.0))))
    assert(out(11L) == ((Some(ts("2024-01-01 08:00:00")), Some(5.0))))
    assert(out(12L) == ((None, None)))
    assert(out(13L) == ((Some(ts("2024-01-01 09:00:00")), Some(9.0))))
  }

  test("asofJoin pairs ts and value from the SAME build row when the value is NULL") {
    // regression: two independent last(_, ignoreNulls) calls skipped a
    // NULL-valued latest build row on the value column only, pairing
    // the newer ts with an older row's value
    val probe = Seq((20L, 1L, ts("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 10:00:00"), None: Option[Double])
    ).toDF("user_id", "ts", "value")
    val r = Temporal.asofJoin(probe, build, "user_id", "ts", "value",
        prefix = "p")
      .select("p_ts", "p_value").collect()(0)
    assert(r.getTimestamp(0) == ts("2024-01-01 10:00:00"))
    assert(r.isNullAt(1), "value must come from the 10:00 row (NULL)")
  }

  test("asofJoin deduplicates equal-ts build rows to the max value") {
    val probe = Seq((1L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), 3.0),
      (1L, ts("2024-01-01 09:00:00"), 8.0)
    ).toDF("user_id", "ts", "value")
    val out = Temporal.asofJoin(probe, build, "user_id", "ts", "value")
      .select("asof_value").as[Double].collect()
    assert(out.toSeq == Seq(8.0))
  }

  test("rangeCountJoin counts inclusive-window neighbors, zero included") {
    val anchors = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 12:00:00")), // isolated -> 0
      (3L, 2L, ts("2024-01-01 10:00:00"))  // other key -> 0
    ).toDF("event_id", "user_id", "ts")
    val other = Seq(
      (1L, ts("2024-01-01 09:55:01")), // inside -5min
      (1L, ts("2024-01-01 10:05:00")), // exactly +5min -> inclusive
      (1L, ts("2024-01-01 10:05:01"))  // outside
    ).toDF("user_id", "ts")
    val out = Temporal.rangeCountJoin(anchors, other, "event_id",
        "user_id", "ts", 300L)
      .select("event_id", "n_nearby")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("streaming interval join drains to the batch join result") {
    val ev = Tables.scan(spark, sf, "events")
    val batch = ev.filter(F.col("event_type") === "click").alias("c")
      .join(ev.filter(F.col("event_type") === "purchase").alias("p"),
        F.col("p.user_id") === F.col("c.user_id") &&
        F.col("p.ts") >= F.col("c.ts") - F.expr("INTERVAL 2 HOURS") &&
        F.col("p.ts") <= F.col("c.ts"))
      .select(F.col("c.event_id").as("click_id"),
        F.col("p.event_id").as("purchase_id"))
      .as[(Long, Long)].collect().toSet
    val streamed = graft.streaming.EventWindows
      .streamingIntervalJoin(spark, sf, "stream_join_spec")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("left-outer streaming interval join: matches exact, null rows sound and eventually complete") {
    val ev = Tables.scan(spark, sf, "events")
    val batchMatched = ev.filter(F.col("event_type") === "click").alias("c")
      .join(ev.filter(F.col("event_type") === "purchase").alias("p"),
        F.col("p.user_id") === F.col("c.user_id") &&
        F.col("p.ts") >= F.col("c.ts") - F.expr("INTERVAL 2 HOURS") &&
        F.col("p.ts") <= F.col("c.ts"))
      .select(F.col("c.event_id").as("click_id"),
        F.col("p.event_id").as("purchase_id"))
      .as[(Long, Long)].collect().toSet
    val streamed = graft.streaming.EventWindows
      .streamingIntervalJoin(spark, sf, "stream_join_outer_spec",
        joinType = "left_outer")
      .select("click_id", "purchase_id", "click_ts").collect()
    val streamedMatched = streamed.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1) the matched subset is exactly the batch inner join
    assert(streamedMatched == batchMatched && batchMatched.nonEmpty)
    // 2) soundness: every null-purchase row is a click the batch join
    //    really can't match
    val batchMatchedClicks = batchMatched.map(_._1)
    val nullRows = streamed.filter(_.isNullAt(1))
    assert(nullRows.nonEmpty, "fixture should contain matchless clicks")
    assert(nullRows.forall(r => !batchMatchedClicks.contains(r.getLong(0))))
    // 3) eventual completeness: matchless clicks comfortably older than
    //    the final watermark (max event ts - delay, wide margin here)
    //    MUST have been emitted — this is the outer join's liveness
    val maxTs = ev.agg(F.max("ts")).collect()(0)
      .getAs[java.time.LocalDateTime](0)
    val cutoff = maxTs.minusDays(1)
    val oldUnmatched = ev.filter(F.col("event_type") === "click")
      .filter(F.col("ts") < F.lit(cutoff))
      .select("event_id").as[Long].collect().toSet -- batchMatchedClicks
    val emittedNullClicks = nullRows.map(_.getLong(0)).toSet
    assert(oldUnmatched.subsetOf(emittedNullClicks))
  }

  test("rangeCountJoin plans a bucketed equi-join, not a nested loop") {
    val ev = Tables.scan(spark, sf, "events")
    val plan = Temporal.rangeCountJoin(
      ev.filter(F.col("event_type") === "error")
        .select("event_id", "user_id", "ts"),
      ev.filter(F.col("event_type") === "click").select("user_id", "ts"),
      "event_id", "user_id", "ts", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
