package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

import graft.functions.Text

/** Retrieval-side operators over the document corpus: BM25 scoring,
  * inverted-index construction, and PageRank over a document graph —
  * the search/link-analysis companions to the dedup and curation
  * stacks.
  *
  * Determinism: every floating-point SUM whose merge order Spark does
  * not fix is replaced by a decimal sum of 6/9-dp-rounded terms (the
  * x_source_divergence pattern), so scores replay bit-identically in
  * any engine.
  */
object Retrieval {

  /** BM25 scores for a FIXED query-term set, one row per document
    * matching at least one term: (id, dl, n_terms_hit, score).
    *
    * One corpus scan: a single token explode feeds one grouped pass
    * computing the document length AND each term's tf (a `sum(when)`
    * branch per query term — queries are small by contract, they are
    * literals in the plan). Corpus stats (N, total length, per-term
    * df) aggregate from that grouped frame and broadcast back as a
    * 1-row cross join — the corpus itself shuffles once, for the
    * per-document group. Per-term contributions are rounded to 6 dp
    * and summed as decimals. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val core = bm25Core(docs, idCol, textCol, queryTerms, k1, b)
    core.g
      .withColumn("n_terms_hit", core.hits)
      .filter(F.col("n_terms_hit") > 0)
      .withColumn("score", core.score)
      .select(F.col(idCol), F.col("dl"), F.col("n_terms_hit"),
        F.col("score"))
  }

  /** INDEX-SERVED BM25 top-k — the retrieval shape that matters at
    * 100 TB: candidates come from the posting lists of the UNDER-CAP
    * query terms (exactly the terms [[invertedIndex]] materializes
    * postings for, same df ≤ cap rule), never from a corpus-wide
    * match scan; scoring then uses EVERY query term's tf over that
    * candidate-bounded set (the WAND-style split: rare terms
    * generate, all terms score — a stopword narrows no candidate set
    * and generates none). A query of only over-cap terms returns
    * empty: the index cannot serve it, by design, and the caller
    * falls back to the scan-based [[bm25]].
    *
    * Plan shape: the per-doc grouped frame is computed once (one
    * corpus scan — in a standing deployment this frame and the stats
    * are maintained state); the candidate filter bounds everything
    * downstream to ≤ Σ under-cap dfs ≤ |terms|·cap rows; the global
    * top-k runs as TakeOrderedAndProject (distributed heap, no full
    * sort) with the rank window applied AFTER the limit, over ≤
    * `topK` rows. Total order = (score desc, id asc) — rounded
    * scores + id tie-break make the cut deterministic on any engine. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], dfCap: Long, topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topK > 0, "topK must be positive")
    val core = bm25Core(docs, idCol, textCol, queryTerms, k1, b)
    val candTerms = queryTerms.indices.filter(i => core.dfs(i) <= dfCap)
    val scored = core.g
      .withColumn("n_terms_hit", core.hits)
      .withColumn("score", core.score)
      .select(F.col(idCol), F.col("n_terms_hit"), F.col("score"))
    if (candTerms.isEmpty) return scored.limit(0)
      .withColumn("rank", F.lit(0L))
    val isCandidate = candTerms
      .map(i => F.col(s"tf$i") > 0).reduce(_ || _)
    val top = core.g
      .filter(isCandidate)
      .withColumn("n_terms_hit", core.hits)
      .withColumn("score", core.score)
      .select(F.col(idCol), F.col("n_terms_hit"), F.col("score"))
      .orderBy(F.col("score").desc, F.col(idCol).asc)
      .limit(topK)
    // rank over the already-limited frame: ≤ topK rows in one task.
    // The constant partition key makes the single partition EXPLICIT
    // (it is inherent — a global rank of ≤ topK rows), so the plan
    // doesn't trip the partition-less-WindowExec warning in every run
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(F.lit(0))
      .orderBy(F.col("score").desc, F.col(idCol).asc)
    top.withColumn("rank", F.row_number().over(w).cast("long"))
  }

  private final case class Bm25Core(g: DataFrame, n: Long,
                                    avgdl: Double, dfs: Seq[Long],
                                    hits: Column, score: Column)

  private def bm25Core(docs: DataFrame, idCol: String, textCol: String,
                       queryTerms: Seq[String], k1: Double,
                       b: Double): Bm25Core = {
    require(queryTerms.nonEmpty && queryTerms == queryTerms.distinct,
      "queryTerms must be non-empty and distinct")
    val toks = docs.select(F.col(idCol),
      F.explode(Text.tokens(F.col(textCol))).as("tok"))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      F.sum(F.when(F.col("tok") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    // pin the grouped frame: it feeds the (one-row) stats aggregate
    // AND the scoring pass — without the pin the token explode runs
    // twice. The frame is one narrow row per document.
    val g = toks.groupBy(idCol)
      .agg(F.count(F.lit(1)).as("dl"), tfCols: _*)
      .localCheckpoint(eager = true)
    val statCols =
      F.count(F.lit(1)).as("n") +: F.sum("dl").as("sl") +:
        queryTerms.indices.map(i =>
          F.sum(F.when(F.col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    // corpus stats are ONE row — inline them as plan literals (the
    // driver-scalar pattern) instead of a broadcast cross join, which
    // plans as a nested-loop join the cross-plan lint (rightly) bans.
    // Arithmetic is unchanged: Math.log here IS Spark's log.
    val st = g.agg(statCols.head, statCols.tail: _*).collect()(0)
    val n = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / n.toDouble
    val dfs = queryTerms.indices.map(i => st.getLong(2 + i))
    def idf(i: Int): Double =
      math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
    def term(i: Int): Column = {
      val tf = F.col(s"tf$i").cast("double")
      val lenNorm = F.lit(1.0 - b) +
        F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
      F.when(F.col(s"tf$i") > 0,
        F.round(F.lit(idf(i)) * tf * F.lit(k1 + 1.0) /
          (tf + F.lit(k1) * lenNorm), 6))
        .otherwise(F.lit(0.0)).cast("decimal(18,6)")
    }
    val hits = queryTerms.indices
      .map(i => F.when(F.col(s"tf$i") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    Bm25Core(g, n, avgdl, dfs, hits,
      queryTerms.indices.map(term).reduce(_ + _).cast("double"))
  }

  /** Inverted index: one row per distinct token with its document
    * frequency and — for tokens with df ≤ `dfCap` — the full posting
    * list as a comma-joined ascending id string. The cap is the scale
    * guard: head-term posting lists are corpus-sized (a skew and
    * row-width hazard no consumer should shuffle); hot terms emit a
    * NULL posting and keep only the df, the same df-cap bound the
    * substring-dedup index uses. The string form (not an array) is
    * deliberate: fixed collation, engine-portable compare. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    dfCap: Int): DataFrame = {
    val base = docs.select(F.col(idCol),
        F.explode(Text.distinctTokens(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
    val dfs = base.groupBy("tok").agg(F.count(F.lit(1)).as("df"))
    // TWO passes so head-term posting lists are never materialized:
    // collect_list under a cap-after-aggregation would still build
    // and shuffle the corpus-sized array for a stopword before the
    // projection nulls it — the exact reducer-OOM the cap exists to
    // prevent. Pass 1 is df only; pass 2 collects postings for the
    // under-cap tokens alone (the semi-join kills hot tokens before
    // any list exists).
    val postings = base
      .join(dfs.filter(F.col("df") <= dfCap).select("tok"),
        Seq("tok"), "left_semi")
      .groupBy("tok")
      .agg(F.sort_array(F.collect_list(F.col(idCol))).as("ids"))
      // sort NUMERICALLY first, stringify after — a string sort
      // would order "10" before "2" and break oracle parity
      .select(F.col("tok"),
        F.array_join(F.transform(F.col("ids"), _.cast("string")), ",")
          .as("postings"))
    dfs.join(postings, Seq("tok"), "left")
      .select("tok", "df", "postings")
  }

  /** Per-node triangle counts over an undirected edge list with
    * canonical `id_a < id_b` rows (the LSH pair shape) — the local
    * cluster-density signal: a near-dup pair inside a triangle sits
    * in a tight clique (template spam), one outside is a lone edit.
    *
    * Classic two-join formulation on canonicalized edges: a triangle
    * (a<b<c) surfaces exactly once as (a,b)⋈(b,c)⋈(a,c), so no
    * dedup pass is needed; per-node counts explode each triangle's
    * three corners into one grouped count. Join volume is
    * Σ deg(v)² over the (pair-bounded) edge list, the standard bound. */
  def triangleCounts(pairs: DataFrame,
                     reliableCheckpointDir: Option[String] = None): DataFrame = {
    // pin the edge list: three join branches reference it, and the
    // upstream pair generator (a whole LSH pipeline) would otherwise
    // execute once per branch; the frame is pair-bounded. The pin
    // follows Dedup's escape hatch (reliable checkpoint on a real
    // cluster, executor-memory localCheckpoint locally).
    val pin = Dedup.checkpointPinner(pairs.sparkSession, reliableCheckpointDir)
    triangleCountsPinned(pin(pairs.select("id_a", "id_b").distinct()))
  }

  /** [[triangleCounts]] body over an edge frame the caller has ALREADY
    * deduplicated and pinned — [[clusteringCoefficient]] shares its
    * pinned frame instead of paying a second distinct exchange and a
    * second checkpoint materialization over identical rows. */
  private def triangleCountsPinned(e: DataFrame): DataFrame = {
    val ab = e.select(F.col("id_a").as("a"), F.col("id_b").as("b"))
    val bc = e.select(F.col("id_a").as("b"), F.col("id_b").as("c"))
    val ac = e.select(F.col("id_a").as("a"), F.col("id_b").as("c"))
    val tri = ab.join(bc, "b").join(ac, Seq("a", "c"))
    tri.select(F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).as("id"))
      .groupBy("id")
      .agg(F.count(F.lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node over the canonical edge
    * list: `2·triangles(v) / (deg(v)·(deg(v)−1))` — how close each
    * node's neighborhood is to a clique. On the near-dup graph this
    * separates template floods (coefficient → 1: every copy pairs
    * with every copy) from chain-shaped drift (→ 0: A matches B
    * matches C, but A never matches C). Degree-1 nodes report 0.
    *
    * One pinned edge frame feeds degree AND the triangle joins (the
    * LSH pair generator upstream executes once); the coefficient is
    * a 6-dp-rounded division of identical operands on any engine. */
  def clusteringCoefficient(pairs: DataFrame,
                            reliableCheckpointDir: Option[String] = None): DataFrame = {
    val pin = Dedup.checkpointPinner(pairs.sparkSession, reliableCheckpointDir)
    val e = pin(pairs.select("id_a", "id_b").distinct())
    val deg = e.select(F.col("id_a").as("id"))
      .unionByName(e.select(F.col("id_b").as("id")))
      .groupBy("id").agg(F.count(F.lit(1)).as("degree"))
    // e is already distinct + pinned — share it with the triangle
    // joins directly rather than re-distinct + re-pin identical rows
    val tri = triangleCountsPinned(e)
    deg.join(tri, Seq("id"), "left")
      .select(F.col("id"), F.col("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0L)).as("n_triangles"),
        F.when(F.col("degree") >= 2,
          F.round(F.lit(2.0) *
            F.coalesce(F.col("n_triangles"), F.lit(0L)).cast("double") /
            (F.col("degree") * (F.col("degree") - 1)).cast("double"), 6))
          .otherwise(F.lit(0.0)).as("coef"))
  }

  /** PERSONALIZED PageRank: rank mass restarts onto a SEED set
    * instead of uniformly — "what is related to these documents",
    * the retrieval/expansion signal over the near-dup (or citation)
    * graph that global PageRank's "what is central" cannot give.
    * `isSeed` is a deterministic predicate over the node id (an
    * engine-replayable seed definition, e.g. an id-set membership);
    * restart mass is 1/|seeds| on seeds, 0 elsewhere, so non-seed
    * rank decays with graph distance from the seed set.
    *
    * Same scale/determinism shape as [[pageRank]]: fixed-trip
    * synchronous rounds, one equi-join + one grouped 9-dp decimal
    * sum per round, per-round lineage pins, zero driver traffic in
    * the loop (the single seed COUNT collects one scalar before it
    * starts). */
  def personalizedPageRank(edges: DataFrame, iters: Int,
                           isSeed: Column => Column,
                           damping: Double = 0.85,
                           reliableCheckpointDir: Option[String] = None): DataFrame = {
    val pin = Dedup.checkpointPinner(edges.sparkSession, reliableCheckpointDir)
    val e = pin(edges.select("id_a", "id_b"))
    val dir = e.select(F.col("id_a").as("src"), F.col("id_b").as("dst"))
      .unionByName(
        e.select(F.col("id_b").as("src"), F.col("id_a").as("dst")))
    // same degree pin as [[pageRank]] (never changes across rounds;
    // node-bounded); locally the seed count rides the pin's
    // materializing job via a projected-away boolean
    val rawDeg = dir.groupBy("src").agg(F.count(F.lit(1)).as("deg"))
    val (deg, nSeeds) =
      if (reliableCheckpointDir.isDefined) {
        val d = pin(rawDeg)
        (d, d.filter(isSeed(F.col("src"))).count())
      } else {
        val (d, s) = Pin.countWhere(
          rawDeg.withColumn("__seed", isSeed(F.col("src"))), "__seed")
        (d.drop("__seed"), s)
      }
    require(nSeeds > 0, "personalizedPageRank needs at least one seed in the graph")
    // restart term mirrors the oracle's text exactly: (1-d)/|seeds|
    // for seeds, 0 elsewhere; r0 carries the raw restart vector
    var ranks = pin(deg.select(F.col("src").as("id"),
      F.round(F.when(isSeed(F.col("src")),
          F.lit(1.0) / F.lit(nSeeds.toDouble))
        .otherwise(F.lit(0.0)), 9).as("rank")))
    for (_ <- 0 until iters) {
      val contrib = dir
        .join(deg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(F.col("dst"),
          F.round(F.col("rank") / F.col("deg").cast("double"), 9)
            .cast("decimal(28,9)").as("c"))
      ranks = pin(contrib.groupBy("dst")
        .agg(F.round(
          F.when(isSeed(F.col("dst")),
              F.lit(1.0 - damping) / F.lit(nSeeds.toDouble))
            .otherwise(F.lit(0.0)) +
          F.lit(damping) * F.sum("c").cast("double"), 9).as("rank"))
        .select(F.col("dst").as("id"), F.col("rank")))
    }
    ranks
  }

  /** PageRank over an UNDIRECTED edge list (id_a, id_b): each edge
    * contributes in both directions, so every node has out-degree ≥ 1
    * and the dangling-mass term vanishes. `iters` synchronous rounds
    * of r' = (1-d)/N + d·Σ_in r/deg.
    *
    * Scale shape: ranks live in a (node, rank) frame; each round is
    * one equi-join onto the edge list + one grouped decimal sum —
    * both partitioned by node id, no driver traffic at all (the loop
    * is fixed-trip-count, unlike the convergence loops that collect a
    * delta). Lineage is pinned per round (localCheckpoint, the
    * dupComponents pattern). Per-edge contributions are rounded to
    * 9 dp and decimal-summed; ranks are rounded to 9 dp per round —
    * bit-stable across partitionings and engines. */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85,
               reliableCheckpointDir: Option[String] = None): DataFrame = {
    val pin = Dedup.checkpointPinner(edges.sparkSession, reliableCheckpointDir)
    // pin the raw edges (this is where an upstream LSH pair generator
    // executes — once); the symmetric union stays a cheap projection
    // over the pinned frame, re-derived per consumer
    val e = pin(edges.select("id_a", "id_b"))
    val dir = e.select(F.col("id_a").as("src"), F.col("id_b").as("dst"))
      .unionByName(
        e.select(F.col("id_b").as("src"), F.col("id_a").as("dst")))
    // pin the degree frame too: it never changes across rounds, and
    // unpinned every round's contrib join re-ran the dir scan + the
    // groupBy exchange that derives it (guide §2.4 — remove repeated
    // shuffles outright); the frame is node-bounded. Local pins fuse
    // the node count into the pin's own materializing job (Pin.count);
    // the reliable seam keeps Dataset.checkpoint + a count over the
    // pinned frame (fault tolerance is that seam's point).
    val rawDeg = dir.groupBy("src").agg(F.count(F.lit(1)).as("deg"))
    val (deg, n) =
      if (reliableCheckpointDir.isDefined) { val d = pin(rawDeg); (d, d.count()) }
      else Pin.count(rawDeg)
    require(n > 0, "pageRank needs at least one edge")
    val base = (1.0 - damping) / n.toDouble
    var ranks = pin(deg.select(F.col("src").as("id"),
      F.round(F.lit(1.0 / n.toDouble), 9).as("rank")))
    for (_ <- 0 until iters) {
      val contrib = dir
        .join(deg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(F.col("dst"),
          F.round(F.col("rank") / F.col("deg").cast("double"), 9)
            .cast("decimal(28,9)").as("c"))
      ranks = pin(contrib.groupBy(F.col("dst").as("id"))
        .agg(F.round(F.lit(base) +
          F.lit(damping) * F.sum("c").cast("double"), 9).as("rank")))
    }
    ranks
  }
}
