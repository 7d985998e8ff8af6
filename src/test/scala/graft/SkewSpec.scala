package graft

import graft.operators.{Curation, Joins, Similarity, Skew}
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Pins the skew-mitigation twins (salted plans must be
  * result-identical to the plain ones), the long-form centroids, and
  * tf-idf ranking semantics. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedAgg equals the plain groupBy on every aggregate") {
    val ev = Tables.scan(spark, sf, "events")
    val plain = ev.groupBy("user_id")
      .agg(F.count(F.lit(1)).as("n_rows"), F.sum("value").as("sum_value"),
        F.min("value").as("min_value"), F.max("value").as("max_value"))
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, math.rint(r._3 * 1e6), r._4, r._5))).toMap
    val salted = Skew.saltedAgg(ev, "user_id", F.col("event_id"), "value")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, math.rint(r._3 * 1e6), r._4, r._5))).toMap
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin equals the plain equi-join row-for-row") {
    val clicks = Tables.scan(spark, sf, "events")
      .filter(F.col("event_type") === "click")
      .select("event_id", "user_id", "value")
    val dim = Tables.scan(spark, sf, "customer")
      .select(F.col("c_custkey").as("user_id"), F.col("c_name"))
    val plain = clicks.join(dim, Seq("user_id"))
      .select("event_id", "c_name").as[(Long, String)].collect().toSet
    val salted = Joins.saltedJoin(clicks, dim, Seq("user_id"),
        saltFrom = F.col("event_id"))
      .select("event_id", "c_name").as[(Long, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin replicates a multi-bucket key across salt values before the join") {
    // one key, 64 fact rows spread over all 16 salt buckets: the
    // salted plan only stays correct if the dim row exists for every
    // bucket — this is the replication the operator promises
    val fact = (0L until 64L).map(i => (i, 7L, 1.0))
      .toDF("event_id", "user_id", "value")
    val dim = Seq((7L, "only")).toDF("user_id", "name")
    val out = Joins.saltedJoin(fact, dim, Seq("user_id"),
      saltFrom = F.col("event_id"))
    assert(out.count() == 64)
  }

  test("groupCentroids matches a hand-computed mean per (group, dim)") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)),
      (1, Seq(3.0f, 6.0f)),
      (2, Seq(10.0f, -10.0f))
    ).toDF("label", "embedding")
    val out = Similarity.groupCentroids(df, "label", "embedding")
      .as[(Int, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      (1, 0L) -> ((2.0, 2L)), (1, 1L) -> ((4.0, 2L)),
      (2, 0L) -> ((10.0, 1L)), (2, 1L) -> ((-10.0, 1L))))
  }

  test("pmi ranks a planted collocation above independent pairs") {
    // two recurring pairs: "neural network" (tight collocation — both
    // words ONLY occur together) and "the neural" ("the" is spread
    // across three positions per doc, diluting its association) —
    // PMI must rank the tight pair first
    val docs = (0 until 10).map { i =>
      (i.toLong, s"the a$i the neural network b$i the c$i")
    }.toDF("doc_id", "text")
    val out = Curation.pmiTopPairs(docs, "text", minCount = 5, topK = 3)
      .select("term_a", "term_b").as[(String, String)].collect()
    assert(out.toSeq == Seq(("neural", "network"), ("the", "neural")))
  }

  test("tfidf ranks rarer terms above common ones and caps at topK") {
    val df = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple dates")
    ).toDF("doc_id", "text")
    // 'apple' is in every doc → idf ln(4/4)=0 → never outranks others
    val out = Curation.tfidfTopTerms(df, "doc_id", "text", topK = 2)
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    assert(out(1L).head == "banana")
    assert(out(2L).head == "cherry" && out(3L).head == "dates")
    assert(out.values.forall(_.size <= 2))
    // apple's tfidf is exactly 0 → ranked below any positive score
    assert(out(1L) == List("banana", "apple"))
  }
}
