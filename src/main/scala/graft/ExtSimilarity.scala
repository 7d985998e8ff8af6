package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, IvfIndex, IvfStore, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Embedding similarity: brute-force / IVF / IVF-SQ8 / IVF-PQ
  * top-k retrieval ladder, SemDeDup, quantization, centroids.
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtSimilarity {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- similarity search ----
    "x_embed_topk" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(F.col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
    }),


    // sign-LSH banded near-dup: hyperplane sign buckets prefilter the
    // pair space (equi-join on (band_idx, bucket)); exact cosine
    // verifies candidates only — no all-pairs nested loop
    "x_embed_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(Tables.scan(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.45,
        planes = SIGNLSH_PLANES, bands = SIGNLSH_BANDS)),


    // IVF ANN — scale path. Centroids: every 61st vector (stride
    // sampling: deterministic, spread across the corpus, oracle-
    // expressible); assignment is a map-side argmax over centroid
    // literals; the oracle replays the identical cells + probing.
    "x_ann_ivf" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        emb.filter(F.col("vec_id") % ANN_CENT_STRIDE === 0),
        "vec_id", "embedding", k = 10, nprobe = ANN_NPROBE)
    }),


    // IVF-PQ with exact rerank: the last rung of the quantization
    // ladder (8 B/vector codes shortlist candidates, then only
    // queries × 32 rows are re-scored at full precision — the
    // production two-stage retrieval)
    "x_ann_pq" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        emb.filter(F.col("vec_id") % ANN_CENT_STRIDE === 0),
        "vec_id", "embedding", k = 10, nprobe = ANN_NPROBE,
        m = PQ_M, codesPerSub = PQ_CODES, rerank = PQ_RERANK)
    }),


    // IVF with TRAINED centroids: the deterministic Lloyd trainer
    // feeds the same probe; the oracle replays the training itself as
    // unrolled SQL rounds, so centroid parity is checked, not assumed.
    // Recall is pinned in ExtensionsSpec (see ANN_KMEANS_NPROBE note).
    "x_ann_kmeans" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = ANN_KMEANS_K, iters = ANN_KMEANS_ITERS)
      Similarity.ivfTopK(emb, emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        cents, "vec_id", "embedding", k = 10, nprobe = ANN_KMEANS_NPROBE)
    }),

    // standing IVF index maintenance: centroids trained on the EVEN
    // half only, the odd half APPENDED by nearest-centroid assignment
    // (no retrain — O(batch) work), search over the standing
    // assignment. The oracle trains on the same even subset and then
    // assigns/probes ALL vectors — bit-identical arithmetic, so index
    // maintenance is graded, not just spec'd (IvfIndexSpec adds the
    // recall and conditional-retrain gates).
    "x_ann_incremental" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val idx0 = IvfIndex.build(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", ANN_KMEANS_K, ANN_KMEANS_ITERS)
      val idx = IvfIndex.append(idx0, emb.filter(F.col("vec_id") % 2 =!= 0))
      IvfIndex.topK(idx, emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        k = 10, nprobe = ANN_KMEANS_NPROBE)
    }),


    // the PERSISTED form of the standing index: centroids + gen=N
    // assignment generations on parquet; batch 2 searches an index
    // LOADED from disk (float vectors, norms, and cells round-trip
    // bit-exactly) — same math as x_ann_incremental, so the two share
    // an oracle, and IvfIndexSpec proves ingest+search run with the
    // raw vector source deleted
    "x_ann_store" -> ((s, dir) => {
      val root = layoutDir(dir, "ivfstore")
      deleteRec(new java.io.File(root))
      val emb = Tables.scan(s, dir, "embeddings")
      IvfStore.init(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", ANN_KMEANS_K, ANN_KMEANS_ITERS, root)
      IvfStore.ingest(s, root, emb.filter(F.col("vec_id") % 2 =!= 0),
        "vec_id", "embedding")
      IvfIndex.topK(IvfStore.load(s, root, "vec_id", "embedding"),
        emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        k = 10, nprobe = ANN_KMEANS_NPROBE)
    }),


    // the SQL surface of the standing index: the graft_ann_topk TVF
    // loads the SAME persisted store (centroids + generation
    // assignments) and serves top-k from pure SQL — column names
    // inferred from the stored centroids, queries supplied as a
    // view. It IS IvfIndex.topK underneath, so this arm shares
    // x_ann_store's oracle; a drifting SQL path, a mis-inferred
    // column, or a dropped nprobe each fails the hash.
    "x_ann_sql" -> ((s, dir) => {
      val root = layoutDir(dir, "ivfstore_sql")
      deleteRec(new java.io.File(root))
      val emb = Tables.scan(s, dir, "embeddings")
      IvfStore.init(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", ANN_KMEANS_K, ANN_KMEANS_ITERS, root)
      IvfStore.ingest(s, root, emb.filter(F.col("vec_id") % 2 =!= 0),
        "vec_id", "embedding")
      graft.plans.GraftFunctions.register(s)
      emb.filter(F.col("vec_id") < ANN_N_QUERIES)
        .createOrReplaceTempView("ann_sql_queries")
      s.sql("SELECT query_id, match_id, sim, rank FROM graft_ann_topk(" +
        s"'$root', 'ann_sql_queries', 10, $ANN_KMEANS_NPROBE)")
    }),

    // the streaming twin: the SAME odd half arrives as two
    // mtime-ordered micro-batches through the idempotent
    // generation-commit sink (gen = baseGen + batchId; a replayed
    // batch recomputes nothing). Assignment against fixed centroids
    // is batch-order-independent, so the final index — and this
    // search — must equal the batch ingest's, which is the shared
    // oracle
    "x_stream_ann_store" -> ((s, dir) => {
      val root = layoutDir(dir, "ivfstore_stream")
      val batches = layoutDir(dir, "ivfstore_stream_in")
      deleteRec(new java.io.File(root))
      deleteRec(new java.io.File(batches))
      new java.io.File(batches).mkdirs()
      val emb = Tables.scan(s, dir, "embeddings")
      IvfStore.init(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", ANN_KMEANS_K, ANN_KMEANS_ITERS, root)
      for (i <- 0 until 2)
        writeSingleFile(emb.filter(F.col("vec_id") % 4 === 2 * i + 1),
          s"$batches/ingest_$i.parquet", 1000000000000L + i * 60000L)
      val idx = graft.streaming.StreamingOps.streamingIvfIngest(
        s, batches, root, baseGen = 1L, "vec_id", "embedding")
      IvfIndex.topK(idx,
        emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        k = 10, nprobe = ANN_KMEANS_NPROBE)
    }),

    // SemDeDup-shaped embedding dedup: kmeans cells bound the pair
    // space (corpus²/k, never all-pairs), within-cell cosine >= tau
    // drops every vector with a lower-id duplicate. The oracle
    // replays the TRAINING too (same unrolled Lloyd rounds as
    // x_ann_kmeans), so cell parity is checked, not assumed.
    "x_semdedup" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = ANN_KMEANS_K, iters = ANN_KMEANS_ITERS)
      Similarity.semDedup(emb, cents, "vec_id", "embedding", SEMDEDUP_TAU)
    }),


    // capped-cell SemDeDup: the hot-cell guard exercised for real —
    // the cap (32) is below every kmeans cell size at every SF, so
    // ALL members take the hash-block + representative path, and the
    // oracle replays the exact split (portable md5 blocks, min-id
    // rep) on top of the replayed Lloyd training. The uncapped twin
    // above pins the default path; together they grade both branches.
    "x_semdedup_capped" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = ANN_KMEANS_K, iters = ANN_KMEANS_ITERS)
      Similarity.semDedup(emb, cents, "vec_id", "embedding", SEMDEDUP_TAU,
        maxCellSize = SEMDEDUP_CAP)
    }),


    // incremental SemDeDup: the mod-3 "incoming batch" of embeddings
    // cleaned against the rest of the corpus (cell-bucketed cosine vs
    // any corpus member, plus in-batch keep-min-id) — the embedding
    // twin of x_neardup_incremental, completing the incremental
    // family across all three dedup modalities. Stride centroids so
    // the oracle replays assignment without the Lloyd unroll.
    "x_semdedup_incremental" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val cents = emb.filter(F.col("vec_id") % ANN_CENT_STRIDE === 0)
      Similarity.semDedupIncremental(
          emb.filter(F.col("vec_id") % INCR_MOD =!= 0),
          emb.filter(F.col("vec_id") % INCR_MOD === 0),
          cents, "vec_id", "embedding", SEMDEDUP_TAU)
        .select("vec_id", "label")
    }),


    // IVF with int8-quantized RESIDUALS (IVF-SQ8): the bounded-memory
    // index layout — corpus rows stored as (cell, scale, int8
    // residual), reconstructed against full-precision queries. Same
    // trained centroids + probing as x_ann_kmeans; the oracle replays
    // training, assignment, quantization, and reconstruction.
    "x_ann_residual" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = ANN_KMEANS_K, iters = ANN_KMEANS_ITERS)
      Similarity.ivfResidualTopK(emb, emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        cents, "vec_id", "embedding", k = 10, nprobe = ANN_KMEANS_NPROBE)
    }),


    // cell-balance audit for the embedding index: the kmeans-cell
    // population distribution (mirror of x_dedup_sizes for vectors) —
    // the dashboard that spots the hot-cell condition the semdedup
    // cap defends against and that sizes nprobe for the IVF queries.
    // Cheap by design: one map-side argmax + two rollups.
    "x_ann_cell_sizes" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = ANN_KMEANS_K, iters = ANN_KMEANS_ITERS)
      Similarity.cellSizes(emb, cents, "vec_id", "embedding")
    }),


    // Aggregator-based top-k: identical output to x_embed_topk via a
    // typed TopKAggregator (map-side bounded heaps) instead of a
    // window sort — same oracle validates both implementations
    "x_topk_agg" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      Similarity.bruteForceTopKAgg(emb, emb.filter(F.col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
    }),


    // ---- embedding analytics ----
    // per-label mean embedding in long (label, dim, centroid, n) form
    // — class prototypes / IVF seeding, no vectors ever collected
    "x_embed_centroid" -> ((s, dir) =>
      Similarity.groupCentroids(Tables.scan(s, dir, "embeddings"),
        "label", "embedding")),


    // int8-quantized cosine top-k: 4× fewer bytes per vector on the
    // wire than float32; integer dot/norms make the scores exact on
    // any engine; recall@10 vs the float baseline pinned ≥ 0.9 in
    // ExtensionsSpec
    "x_embed_quantized" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      Similarity.quantizedTopK(emb,
        emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        "vec_id", "embedding", k = QUANT_TOPK)
    }),


    // metadata-FILTERED similarity search: exact top-k over only the
    // English-language corpus vectors (predicate applied BEFORE any
    // scoring, so k always fills from the allowed set — never the
    // post-filter-and-under-fill mistake)
    "x_embed_filtered" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      val allowed = Tables.scan(s, dir, "documents")
        .filter(F.col("lang") === "en")
        .select(F.col("doc_id").as("vec_id"))
      Similarity.filteredTopK(emb, allowed,
        emb.filter(F.col("vec_id") < ANN_N_QUERIES),
        "vec_id", "embedding", k = 10)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x_embed_topk" ->
      ("SELECT query_id, match_id, sim, rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC, " +
        "c.vec_id ASC) AS rank " +
        "FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id " +
        "WHERE q.vec_id < 5) WHERE rank <= 10"),

    "x_embed_filtered" ->
      ("WITH allowed AS (SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'), " +
        "c AS (SELECT e.vec_id, e.embedding FROM embeddings e " +
        "JOIN allowed a ON e.vec_id = a.vec_id) " +
        "SELECT query_id, match_id, sim, rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC, " +
        "c.vec_id ASC) AS rank " +
        "FROM embeddings q JOIN c ON q.vec_id <> c.vec_id " +
        s"WHERE q.vec_id < $ANN_N_QUERIES) WHERE rank <= 10"),

    "x_embed_neardup" -> nearDupLshSql(SIGNLSH_PLANES, SIGNLSH_BANDS, 0.45),

    "x_ann_ivf" -> ivfSql(ANN_CENT_STRIDE, ANN_NPROBE, 10, ANN_N_QUERIES),

    "x_ann_pq" -> annPqSql(ANN_CENT_STRIDE, ANN_NPROBE, 10, ANN_N_QUERIES,
      PQ_M, PQ_CODES, EMB_DIM, PQ_RERANK),

    "x_ann_kmeans" -> annKmeansSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
      ANN_KMEANS_NPROBE, 10, ANN_N_QUERIES),

    // the store twin shares the incremental oracle — identical math,
    // the only difference is the parquet round-trip
    "x_ann_store" -> annKmeansSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
      ANN_KMEANS_NPROBE, 10, ANN_N_QUERIES,
      "(SELECT * FROM embeddings WHERE vec_id % 2 = 0)"),

    // the streaming twin lands the same vectors in the same cells —
    // the oracle is the batch pipeline's, unchanged
    "x_stream_ann_store" -> annKmeansSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
      ANN_KMEANS_NPROBE, 10, ANN_N_QUERIES,
      "(SELECT * FROM embeddings WHERE vec_id % 2 = 0)"),

    // the TVF arm searches the same store through the same math —
    // x_ann_store's oracle, unchanged
    "x_ann_sql" -> annKmeansSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
      ANN_KMEANS_NPROBE, 10, ANN_N_QUERIES,
      "(SELECT * FROM embeddings WHERE vec_id % 2 = 0)"),

    // same pipeline trained on the even half only — the append path
    // assigns every vector to those centroids, which is exactly what
    // ivfBodySql already does
    "x_ann_incremental" -> annKmeansSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
      ANN_KMEANS_NPROBE, 10, ANN_N_QUERIES,
      "(SELECT * FROM embeddings WHERE vec_id % 2 = 0)"),

    "x_ann_residual" -> annResidualSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
      ANN_KMEANS_NPROBE, 10, ANN_N_QUERIES),

    "x_semdedup" -> semDedupSql(ANN_KMEANS_K, ANN_KMEANS_ITERS, SEMDEDUP_TAU),

    // stride-centroid assignment (same argmax/tie-break as the IVF
    // oracle), then the two incremental drop rules
    "x_semdedup_incremental" ->
      (s"WITH cents AS (SELECT vec_id AS cent_id, " +
        "CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings " +
        s"WHERE vec_id % $ANN_CENT_STRIDE = 0), " +
        "asgn AS (SELECT e.vec_id, e.embedding, c.cent_id, " +
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
        "c.cvec), 6) DESC, c.cent_id ASC) AS rn " +
        "FROM embeddings e CROSS JOIN cents c), " +
        "cells AS (SELECT vec_id, embedding, cent_id AS cell " +
        "FROM asgn WHERE rn = 1), " +
        s"b AS (SELECT * FROM cells WHERE vec_id % $INCR_MOD = 0), " +
        s"o AS (SELECT * FROM cells WHERE vec_id % $INCR_MOD <> 0), " +
        "dropped AS (" +
        "SELECT DISTINCT b.vec_id FROM b JOIN o USING (cell) " +
        "WHERE round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), " +
        s"CAST(o.embedding AS DOUBLE[])), 6) >= $SEMDEDUP_TAU " +
        "UNION " +
        "SELECT DISTINCT b.vec_id FROM b JOIN b b2 USING (cell) " +
        "WHERE b2.vec_id < b.vec_id AND " +
        "round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), " +
        s"CAST(b2.embedding AS DOUBLE[])), 6) >= $SEMDEDUP_TAU) " +
        "SELECT e.vec_id, e.label FROM embeddings e " +
        s"WHERE e.vec_id % $INCR_MOD = 0 " +
        "AND e.vec_id NOT IN (SELECT vec_id FROM dropped)"),

    "x_semdedup_capped" -> semDedupCappedSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
      SEMDEDUP_TAU, SEMDEDUP_CAP),

    // replayed Lloyd training + argmax assignment, rolled up twice
    "x_ann_cell_sizes" ->
      (kmeansCentsSql(ANN_KMEANS_K, ANN_KMEANS_ITERS) +
        "asgn AS (SELECT e.vec_id, c.cent_id, " +
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
        "CAST(c.cvec AS DOUBLE[])), 6) DESC, c.cent_id ASC) AS rn " +
        "FROM embeddings e CROSS JOIN cents c), " +
        "cs AS (SELECT cent_id, count(*) AS cell_size " +
        "FROM asgn WHERE rn = 1 GROUP BY 1) " +
        "SELECT cell_size, count(*) AS n_cells FROM cs GROUP BY 1"),

    "x_topk_agg" ->
      ("SELECT query_id, match_id, sim, rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC, " +
        "c.vec_id ASC) AS rank " +
        "FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id " +
        "WHERE q.vec_id < 5) WHERE rank <= 10"),

    "x_embed_centroid" ->
      ("SELECT label, i - 1 AS dim, " +
        "round(avg(embedding[i]::DOUBLE), 6) AS centroid, count(*) AS n " +
        "FROM embeddings CROSS JOIN " +
        s"(SELECT unnest(range(1, ${EMB_DIM + 1})) AS i) d " +
        "GROUP BY label, dim"),

    "x_embed_quantized" -> {
      val qdot = "CAST(list_sum(list_transform(range(1, len(q.q) + 1), " +
        "i -> q.q[i] * c.q[i])) AS DOUBLE) / greatest(q.nrm * c.nrm, 1e-30)"
      "WITH v AS (SELECT vec_id, embedding, 127.0 / greatest(" +
        "list_aggregate(list_transform(embedding, y -> abs(y::DOUBLE)), 'max'), " +
        "1e-30) AS scale FROM embeddings), " +
        "qv AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(floor(x::DOUBLE * scale + 0.5) AS BIGINT)) AS q FROM v), " +
        "n AS (SELECT vec_id, q, " +
        "sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm FROM qv) " +
        "SELECT query_id, match_id, sim, rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        s"round($qdot, 6) AS sim, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        s"round($qdot, 6) DESC, c.vec_id ASC) AS rank " +
        s"FROM n q JOIN n c ON q.vec_id <> c.vec_id WHERE q.vec_id < $ANN_N_QUERIES) " +
        s"WHERE rank <= $QUANT_TOPK"
    }
  )
}
