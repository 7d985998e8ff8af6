package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Similarity search over embedding columns (north-star extension):
  * brute-force cosine top-k as the exact baseline, and an IVF-style
  * bucketed variant as the scale path.
  *
  * Scale design:
  *  - The query set is always broadcast; the corpus is scanned once,
  *    never collected.
  *  - Dot products are `zip_with`/`aggregate` Column expressions over
  *    the array — evaluated inside codegen, no UDF, no per-row JVM
  *    boxing of the vectors.
  *  - Brute force is O(|corpus|·|queries|) but embarrassingly
  *    parallel — correct baseline at any scale, wall-clock bounded by
  *    queries count. IVF reduces scanned candidates to the probed
  *    cells only; recall < 1 by construction.
  */
object Similarity {

  /** Allocation-free codegen'd dot product (graft.plans.DotProduct);
    * double accumulation in element order, bit-compatible with the
    * `zip_with`/`aggregate` composition and the DuckDB oracle. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k.
    *
    * `queries` must be small (it is broadcast). Result: one row per
    * (query, rank) with the matched id and the cosine similarity
    * rounded to 6 dp (rounding makes rank ties deterministic and
    * engine-portable). Self-matches are excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are precomputed per side — each pair then costs exactly
    // one dot product instead of three
    val q = F.broadcast(queries.select(
      F.col(idCol).as("query_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm")))
    val scored = corpus.select(F.col(idCol).as("match_id"), F.col(vecCol).as("c_vec"),
        norm(F.col(vecCol)).as("c_nrm"))
      .join(q, F.col("match_id") =!= F.col("query_id"))
      .withColumn("sim", F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    scored
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select("query_id", "match_id", "sim", "rank")
  }

  /** Aggregator-based top-k (scale path): same result as
    * [[bruteForceTopK]], but candidates are reduced map-side to ≤ k
    * rows per query by [[graft.plans.TopKAggregator]] BEFORE the
    * shuffle — the exchange moves O(queries × k) rows instead of the
    * full |corpus| × |queries| candidate set that the window
    * formulation sorts. */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = F.broadcast(queries.select(
      F.col(idCol).as("query_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm")))
    val scored = corpus.select(F.col(idCol).as("match_id"), F.col(vecCol).as("c_vec"),
        norm(F.col(vecCol)).as("c_nrm"))
      .join(q, F.col("match_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("match_id"),
        F.round(dot(F.col("q_vec"), F.col("c_vec")) /
          (F.col("q_nrm") * F.col("c_nrm")), 6).as("sim"))
      .as[(Long, Long, Double)]
    val agg = new graft.plans.TopKAggregator(k)
    scored.groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (qid, items) =>
        items.iterator.zipWithIndex.map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
      }
      .toDF("query_id", "match_id", "sim", "rank")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold over all
    * pairs of the given frame (callers bound the frame or pre-bucket;
    * the pair space is quadratic). `a < b` canonical orientation. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    // the pair join broadcasts the right side and streams the left;
    // a small corpus often arrives as ONE input split, which would
    // serialize the whole O(n²) pair loop on a single task — spread
    // the streamed side first (only when it is under-partitioned; a
    // large pre-split corpus keeps its layout)
    val para = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (df.rdd.getNumPartitions < para) df.repartition(para) else df
    val l = spread
      .select(F.col(idCol).as("id_a"), F.col(vecCol).as("v_a"),
        norm(F.col(vecCol)).as("n_a"))
    val r = df.select(F.col(idCol).as("id_b"), F.col(vecCol).as("v_b"),
      norm(F.col(vecCol)).as("n_b"))
    // pin BuildRight so AQE can't flip the broadcast onto the side we
    // just spread out
    l.join(F.broadcast(r), F.col("id_a") < F.col("id_b"))
      .withColumn("sim", F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6))
      .filter(F.col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** IVF-style ANN (scale path).
    *
    * Coarse quantization: `centroids` (small, broadcast) partition the
    * corpus into cells by nearest-centroid; each query probes its
    * `nprobe` nearest cells and ranks only those candidates. Recall
    * trades off with nprobe; the corpus-side assignment is one
    * broadcast-join pass, the search shuffles only probed cells.
    *
    * Centroid selection is the caller's policy (k-means upstream, or
    * a deterministic sample); this operator only does the assignment
    * + probed search. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val cents = F.broadcast(centroids.select(
      F.col(idCol).as("cent_id"), F.col(vecCol).as("cent_vec")))

    def nearestCells(df: DataFrame, id: String, vec: String, n: Int,
                     outId: String): DataFrame = {
      val w = Window.partitionBy(id)
        .orderBy(F.col("csim").desc, F.col("cent_id").asc)
      df.select(F.col(id), F.col(vec))
        .join(cents, F.lit(true))
        .withColumn("csim", F.round(cosine(F.col(vec), F.col("cent_vec")), 6))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n)
        .select(F.col(id).as(outId), F.col("cent_id").as("cell"), F.col(vec))
    }

    val corpusCells = nearestCells(corpus, idCol, vecCol, 1, "match_id")
      .withColumnRenamed(vecCol, "c_vec")
    val queryCells = nearestCells(queries, idCol, vecCol, nprobe, "query_id")
      .withColumnRenamed(vecCol, "q_vec")

    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    corpusCells.join(F.broadcast(queryCells), Seq("cell"))
      .filter(F.col("match_id") =!= F.col("query_id"))
      .withColumn("sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select("query_id", "match_id", "sim", "rank")
  }
}
