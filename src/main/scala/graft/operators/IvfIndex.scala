package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Standing (incremental) IVF index — the maintenance story the
  * per-query ANN operators ([[Similarity.ivfTopK]] and friends) leave
  * to the caller: instead of retraining centroids on every run, the
  * index holds (centroids, assigned vectors) as a pair of frames;
  * new batches APPEND by assigning each vector to its nearest
  * existing centroid (one map-side argmax over the batch — O(batch),
  * never O(corpus)), and centroids retrain only when the cell-balance
  * audit degrades past a threshold.
  *
  * Why imbalance is the retrain trigger: IVF recall/latency rests on
  * cells staying near n/k — a drifting ingest distribution funnels
  * new vectors into few cells, so probing nprobe cells covers an
  * ever-smaller corpus fraction (recall decays) while the hot cell's
  * candidate list grows (latency decays). Cell-population skew is
  * exactly the observable for both, and it is computable from the
  * assignment frame alone at aggregation cost — no pairwise anything.
  *
  * The assignment frame is the materialization seam: callers persist
  * `assigned` (e.g. parquet generations, as
  * [[SignatureStore]] does for LSH signatures) and rebuild the Index
  * from it without touching raw vectors' source.
  */
object IvfIndex {

  /** centroids: (vec_id, embedding) float vectors;
    * assigned: (id, vec, nrm, cell) — every indexed vector with its
    * cell, the [[Similarity.assignCellsWith]] shape. */
  final case class Index(centroids: DataFrame, assigned: DataFrame,
                         idCol: String, vecCol: String)

  /** Train kmeans centroids on `corpus` and assign it. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): Index = {
    val cents = Similarity.kmeansCentroids(corpus, idCol, vecCol, k, iters)
    Index(cents,
      Similarity.assignCells(corpus, cents, idCol, vecCol), idCol, vecCol)
  }

  /** Append a batch WITHOUT retraining: each new vector goes to its
    * cosine-nearest existing centroid. One argmax over the batch —
    * the whole point of a standing index. */
  def append(index: Index, batch: DataFrame): Index =
    index.copy(assigned = index.assigned.unionByName(
      Similarity.assignCells(batch, index.centroids,
        index.idCol, index.vecCol)))

  /** Cell-balance audit: max cell population over the ideal n/k.
    * 1.0 = perfectly balanced; rises as ingest drift funnels vectors
    * into few cells. Aggregation-cost on the assignment frame. */
  def imbalance(index: Index): Double = {
    val k = index.centroids.count()
    val row = index.assigned.groupBy("cell")
      .agg(F.count(F.lit(1)).as("n"))
      .agg(F.max("n").as("mx"), F.sum("n").as("tot"))
      .collect()(0)
    // an EMPTY assignment frame aggregates zero groups into one
    // all-NULL row — getLong would NPE before any tot==0 check
    if (row.isNullAt(0) || row.isNullAt(1)) 1.0
    else row.getLong(0).toDouble * k / row.getLong(1).toDouble
  }

  /** Append, then retrain ONLY if the audit degrades past
    * `maxImbalance`. Retraining runs kmeans over the index's own
    * assignment frame (id + vector — the raw source is not needed)
    * and re-assigns everything. Returns the new index and whether a
    * retrain fired. */
  def appendAndMaybeRetrain(index: Index, batch: DataFrame,
                            k: Int, iters: Int,
                            maxImbalance: Double): (Index, Boolean) = {
    val appended = append(index, batch)
    if (imbalance(appended) <= maxImbalance) (appended, false)
    else {
      val all = appended.assigned
        .select(F.col("id").as(index.idCol), F.col("vec").as(index.vecCol))
      (build(all, index.idCol, index.vecCol, k, iters), true)
    }
  }

  /** Top-k search over the STANDING assignment (no per-query
    * re-assignment — the other half of the index's point): queries
    * probe their nprobe nearest cells, candidates rank per query.
    * Same arithmetic/tie-breaks as [[Similarity.ivfTopK]], so results
    * are identical to a fresh ivfTopK over the same centroids. */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int,
           maxDriverQueryRows: Int = 10000): DataFrame = {
    val corpusCells = index.assigned.select(
      F.col("id").as("match_id"), F.col("vec").as("c_vec"),
      F.col("nrm").as("c_nrm"), F.col("cell"))
    val cents = Similarity.collectCentroids(index.centroids,
      index.idCol, index.vecCol)
    // same guard as the per-query ivfTopK path: an empty/corrupt
    // centroids frame should fail HERE with a clear message, not as
    // an opaque empty-probe error downstream
    require(cents.nonEmpty, "topK needs at least one centroid")
    val queryCells = Similarity.probeQueryCells(
      index.assigned.sparkSession, queries, cents,
      index.idCol, index.vecCol, nprobe, maxDriverQueryRows)
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    corpusCells.join(F.broadcast(queryCells), Seq("cell"))
      .filter(F.col("match_id") =!= F.col("query_id"))
      .withColumn("sim", F.round(
        Similarity.dot(F.col("q_vec"), F.col("c_vec")) /
          (F.col("q_nrm") * F.col("c_nrm")), 6))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select("query_id", "match_id", "sim", "rank")
  }
}
