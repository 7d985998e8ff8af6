package graft

import org.apache.spark.sql.{functions => F}

import graft.functions.Text
import graft.operators.{Dedup, Retrieval}
import graft.sources.Tables

/** Retrieval-family semantics: BM25 ordering, posting-list caps, and
  * PageRank conservation/determinism. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: more matched terms outrank fewer at equal length; non-matching docs are absent") {
    val docs = Seq(
      (1L, "join scan filter pad pad pad"),
      (2L, "join pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "doc_id", "text",
        Seq("join", "scan", "filter"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms_hit"), r.getAs[Double]("score"))).toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    assert(out(1L)._2 > out(2L)._2)
  }

  test("bm25TopK: rare terms generate candidates, over-cap terms only score; all-over-cap query is empty") {
    // 'pad' appears in every doc (df 4 — over a cap of 2); 'rare' in
    // two docs (under cap). Doc 4 matches ONLY the stopword.
    val docs = Seq(
      (1L, "rare pad pad pad pad pad"),
      (2L, "rare rare pad pad pad pad"),
      (3L, "pad nope pad pad pad pad"),
      (4L, "pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("rare", "pad"), dfCap = 2L, topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms_hit"), r.getAs[Long]("rank"))).toMap
    // candidates = posting members of 'rare' only; docs 3/4 hit only
    // the over-cap term and are NOT generated...
    assert(out.keySet == Set(1L, 2L), out)
    // ...but the over-cap term still SCORES the generated candidates
    assert(out(1L)._1 == 2L && out(2L)._1 == 2L, out)
    assert(out(2L)._2 == 1L, "higher rare-tf doc should rank first")
    // a query of only over-cap terms cannot be served by the index
    assert(Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("pad"), dfCap = 2L, topK = 10).count() == 0L)
    // with every term under the cap, topK = brute-force bm25 head
    val brute = Retrieval.bm25(docs, "doc_id", "text", Seq("rare", "pad"))
      .orderBy(F.col("score").desc, F.col("doc_id").asc)
      .select("doc_id").as[Long].collect().toSeq.take(3)
    val served = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("rare", "pad"), dfCap = 10L, topK = 3)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(served == brute, s"$served vs $brute")
  }

  test("inverted index: rare tokens carry exact ascending postings, head tokens only df") {
    val docs = Seq(
      (10L, "alpha beta"), (2L, "alpha beta"), (7L, "alpha"))
      .toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(docs, "doc_id", "text", dfCap = 2)
      .collect().map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("df"), r.getAs[String]("postings"))).toMap
    assert(out("alpha") == ((3L, null))) // over the cap: df only
    assert(out("beta") == ((2L, "2,10"))) // numeric order, not "10,2"
  }

  test("personalized pagerank: mass stays ~1, seedless components decay geometrically, partition-independent") {
    import graft.operators.Retrieval
    // two components: {0,2,4} (contains both seeds) and {1,3} (no
    // even id... 4 is even; use {1,3} odd-only as the seedless one)
    val edges = Seq((0L, 2L), (2L, 4L), (1L, 3L))
      .toDF("id_a", "id_b")
    val iters = 6
    val out = Retrieval.personalizedPageRank(edges, iters,
        isSeed = _ % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // restart lands only on seeds: total mass telescopes to 1
    assert(math.abs(out.values.sum - 1.0) < 1e-6, out)
    // the seedless {1,3} component only LOSES mass: d^iters of its
    // initial 0 restart — exactly 0 every round
    assert(out(1L) == 0.0 && out(3L) == 0.0, out)
    // seeds' neighborhood holds everything
    assert(Seq(0L, 2L, 4L).map(out).sum > 0.999, out)
    // partition-independence (decimal-sum discipline)
    val rep = Retrieval.personalizedPageRank(edges.repartition(7), iters,
        isSeed = _ % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep == out)
  }

  test("pagerank: mass conserved, uniform on a symmetric graph, partition-independent") {
    // triangle: symmetric → uniform ranks
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val r = Retrieval.pageRank(tri, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 3)
    assert(r.values.toSet.size == 1, s"symmetric graph not uniform: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass leaked: $r")

    // real near-dup graph: identical ranks across edge partitionings
    val edges = Dedup.jaccardPairsLsh(Tables.scan(spark, sf, "documents"),
      "doc_id", "text", threshold = 0.8, k = 16, bands = 4,
      terms = Text.distinctShingles(_, 2))
    def run(parts: Int) =
      Retrieval.pageRank(edges.repartition(parts), iters = 5).collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val (a, b) = (run(1), run(7))
    assert(a == b, "pagerank is partition-dependent")
    // star center outranks leaves
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("id_a", "id_b")
    val sr = Retrieval.pageRank(star, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(sr(0L) > sr(1L), s"star center does not dominate: $sr")
  }

  test("graph operators: reliable-checkpoint path matches the local path exactly") {
    // the degree pin takes a different seam per mode (fused Pin.count
    // locally, Dataset.checkpoint + a count over the pinned frame on
    // the reliable path) — both must produce identical output. The
    // checkpoint root is SparkContext-global: reuse one another suite
    // already set rather than fail the redirect guard.
    val edges = Seq((0L, 2L), (2L, 4L), (0L, 4L), (1L, 3L), (4L, 6L))
      .toDF("id_a", "id_b")
    val dir = spark.sparkContext.getCheckpointDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ckpt-pr-").toString)
    def ranks(d: Option[String]) =
      Retrieval.pageRank(edges, iters = 4, reliableCheckpointDir = d)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(Some(dir)) == ranks(None))
    def seeded(d: Option[String]) =
      Retrieval.personalizedPageRank(edges, iters = 4,
          isSeed = _ % 2 === 0, reliableCheckpointDir = d)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(seeded(Some(dir)) == seeded(None))
    def coef(d: Option[String]) =
      Retrieval.clusteringCoefficient(edges, reliableCheckpointDir = d)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(coef(Some(dir)) == coef(None))
    // the triangle {0,2,4} must survive the shared-pin refactor
    assert(coef(None)(0L) == ((2L, 1L, 1.0)))
  }
}
