package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** North-star extension queries (BASELINE.json): dedup, similarity
  * search, text analysis, windowed events, streaming, multimodal —
  * each with a DuckDB oracle where ANSI SQL can express it.
  *
  * Everything hash-portable is md5-based (`Text.hash60`), so MinHash
  * and SimHash oracles reproduce bit-identical signatures in DuckDB.
  */
object Extensions {

  // shared SQL fragments for the oracle side
  private val toksSql =
    "SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok FROM documents"
  private def h60(expr: String) =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  private val MINHASH_K = 16
  private val MINHASH_BANDS = 4
  private val NGRAM_BANDS = 8 // 8 bands × 2 rows — recall for the 0.5 threshold
  // containment (subsumption) detection: trigram shingles, a doc
  // counts as contained at 80%, and only shingles appearing in ≤ 20
  // docs may block candidate pairs (the linear-volume cap)
  private val CONTAIN_THRESHOLD = 0.8
  private val CONTAIN_DFCAP = 20
  // containment decontamination: flag a training doc when it holds
  // half of an eval doc's shingle set (mod-5 split — same eval split
  // as the fuzzy pass, so both leak shapes are audited on one split)
  private val CONTAIN_DECON_THRESHOLD = 0.5
  // substring-level dedup: 8-token consecutive windows; a pair needs
  // ≥ 2 distinct shared windows (≈ a shared run of ≥ 9 tokens, or two
  // separate 8-token spans); same df-cap linear-volume bound as
  // containment
  private val SUBSTR_WINDOW = 8
  private val SUBSTR_MINSPANS = 2
  private val SUBSTR_DFCAP = 20
  // temperature mixing: sqrt weighting against a budget just under
  // the sf0.01 corpus's ~26.6k total tokens, so small sources clamp
  // at rate 1 (kept whole) while large ones downsample — both
  // branches of the rate formula are exercised by the graded query
  private val MIX_ALPHA = 0.5
  private val MIX_BUDGET = 26000L
  private val SIGNLSH_PLANES = 16
  private val SIGNLSH_BANDS = 4
  private val ANN_CENT_STRIDE = 61 // every 61st vector is a centroid
  private val ANN_NPROBE = 2
  private val ANN_N_QUERIES = 5 // query set = vec_id < this, BOTH engines
  // kmeans-trained IVF (x_ann_kmeans). nprobe 8 of 10 cells: the
  // fixture's embeddings are ISOTROPIC (same-label mean cosine ~0.002
  // — no cluster structure for ANY partitioner to exploit), so
  // recall@10 is structurally ~nprobe/k; 8/10 measures 0.96-0.98
  // across sf0.001/0.01/0.1 (ExtensionsSpec pins >= 0.9). On real
  // clustered embeddings the same machinery reaches that recall at
  // nprobe 1-2; the fixture makes the trade steep, not the operator.
  private val ANN_KMEANS_K = 10
  private val ANN_KMEANS_ITERS = 3
  // SemDeDup threshold: the fixture's embeddings are isotropic (see
  // the kmeans note above), so genuine high-cosine pairs are the few
  // planted near-dups — 0.4 keeps the dropped set non-empty at every
  // SF while staying far above the isotropic background (~0.0)
  private val SEMDEDUP_TAU = 0.4
  // x_semdedup_capped cell cap: below every kmeans cell size at every
  // SF (cells are ~n/k = 50-200 members), so the capped path always
  // engages in the graded query
  private val SEMDEDUP_CAP = 32
  private val ANN_KMEANS_NPROBE = 8
  private val DECON_N = 4 // decontamination n-gram width
  private val DECON_MOD = 41 // benchmark split: doc_id % DECON_MOD == 0
  // fuzzy decontamination: a wider benchmark split (bigger cross
  // surface) and a recall-leaning estimated-Jaccard gate
  private val FUZZY_DECON_MOD = 5
  private val FUZZY_DECON_EST = 0.5
  private val SAMPLE_PCT = 20 // hash-sample keep rate (of 100 buckets)
  private val QUOTA_PER_SOURCE = 15 // per-source cap (truncates at all SFs)
  private val RANGE_WINDOW_SEC = 300L // range-join half-window
  private val SALT_BUCKETS = 16 // skew-mitigation salt fan-out
  // incremental dedup: doc_id % this == 0 is the incoming batch. 3, not
  // a rounder number, because the fixture's duplicate groups must
  // actually INTERSECT the split for the graded query to exercise both
  // drop paths (at sf0.1, mod 3 puts one dup pair fully in-batch and
  // splits another across batch/corpus; mod 10 touched none — the
  // query graded a pass-through)
  private val INCR_MOD = 3
  // partition-pruned layout: the queried week (7 of the fixture's 30
  // event_date partitions — the other 23 are never listed into the plan)
  private val PRUNE_FROM = "2024-01-08"
  private val PRUNE_TO = "2024-01-14"
  // z-order pruned layout: a 2-D (user band × day band) rectangle —
  // 10 of the fixture's users over the same queried week. Nonzero at
  // every SF (user_id starts at 0 everywhere); day_idx 7..13 =
  // 2024-01-08..14 relative to the fixture's 2024-01-01 epoch
  private val ZORDER_USER_LO = 0L
  private val ZORDER_USER_HI = 9L
  private val ZORDER_DAY_LO = 7
  private val ZORDER_DAY_HI = 13
  // 11 interleave bits per key: covers user_id ≤ 2047 (sf0.1 max is
  // 1499) and day_idx ≤ 29 without aliasing
  private val ZORDER_BITS = 11
  // blocked fuzzy dedup: 24-char blocking prefix (fixture: 5k docs →
  // 4.75k blocks, max block 4), Levenshtein over the first 80 chars
  private val FUZZY_BLOCK = 24
  private val FUZZY_PREFIX = 80
  private val FUZZY_MAXDIST = 8
  private val SETOPS_CUTOFF = 300000.0 // hi-spend segment floor
  private val PACK_BUDGET = 2048L // tokens per packed training sequence
  private val TFIDF_TOPK = 3 // tf-idf terms kept per document
  private val PMI_MIN_COUNT = 5 // bigram support floor for PMI
  private val PMI_TOPK = 20 // collocation pairs kept
  private val VOCAB_K = 500 // fixed vocab size for coverage report
  private val MM_FEAT_DIMS = 8 // md5-derived stub feature width (max 8)
  private val MM_FRAME_BYTES = 256 // frame-sampling window (bytes)
  private val MM_DECODE_DOCS = 40 // docs in the mixed real+opaque decode frame
  // perceptual-hash image dedup: 40 docs render 16x16 PNGs from 13
  // seeds (doc_id % 13), so duplicate groups are a pure function of
  // the key an oracle can replay without decoding; Hamming gate 6
  // stays under the 8-band pigeonhole recall bound
  private val MM_PHASH_DOCS = 40
  private val MM_PHASH_SEEDS = 13
  private val MM_PHASH_MAXDIST = 6
  private val HIST_WIDTH = 50 // histogram bucket width (value units)
  private val EMB_DIM = 64 // fixture embedding width (oracle range)
  private val SPLIT_TRAIN = 80 // stratified split: first 80 hash buckets
  private val SPLIT_VAL = 10 // next 10 buckets → val; remainder → test
  private val BLOOM_FPP = 0.01 // decontamination Bloom false-positive rate
  private val CHUNK_SIZE = 32 // tokens per chunk window
  private val CHUNK_STRIDE = 24 // chunk start step (8-token overlap)
  private val QUANT_TOPK = 10 // neighbors kept by the quantized top-k
  private val WEIGHTED_RATE = 0.5 // top-quality keep rate for weighted sampling
  private val WEIGHTED_GRAN = 10000 // weighted-sample hash granularity
  private val QUALITY_GATE = 0.5 // per-source report quality floor
  private val HH_K = 64 // heavy hitters: keep tokens with freq > n/64
  private val MAD_CUT = 3.0 // robust-outlier gate: |v - med| > 3*MAD
  private val FUNNEL_STAGES = Seq("view", "click", "purchase")
  private val FUNNEL_GAP_SEC = 86400L // windowed funnel: convert within 24h
  private val HLL_LGK = 12 // HLL sketch precision (2^12 registers)
  // interval-overlap join: purchase windows × error windows per user;
  // the 10-minute grid keeps per-interval replication at 2-3 cells
  private val IVAL_A_MIN = 15 // purchase interval length (minutes)
  private val IVAL_B_MIN = 10 // error interval length (minutes)
  private val IVAL_BUCKET_SEC = 600L
  private val RANK_PARTS = 8 // range partitions for the dense-id sort
  // IVF-PQ: 8 subspaces × 16 sampled codes over 64-dim residuals —
  // 8 B per indexed vector (vs 64 B SQ8, 256 B float)
  private val PQ_M = 8
  private val PQ_CODES = 16
  private val PQ_RERANK = 64 // exact-rerank shortlist per query
  private val NOVELTY_N = 3 // novelty shingle width
  private val EWMA_ALPHA = 0.3
  private val EWMA_DEPTH = 8 // truncation bias (1-alpha)^8 ≈ 0.6%
  // bloom file index: point-lookup a HIGH-CARDINALITY key (event_id)
  // over a layout clustered on user_id — every file's event_id
  // min/max spans the whole range, so only the bloom can skip
  private val BLOOM_IDX_FPP = 0.01
  private val BLOOM_IDX_EVENT = 123L
  private val BLOOM_IDX_FILES = 16
  private val BIN_COUNT = 10 // equi-depth bins (deciles)

  private val stopSql = Text.stopwords.map { case (l, ws) =>
    l -> ws.mkString("['", "', '", "']")
  }

  private def hitsSql(lang: String) =
    s"len(list_intersect(list_distinct(string_split_regex(lower(text), '\\s+')), ${stopSql(lang)}))"

  /** DuckDB twin of [[Text.qualityScore]] — shared by the pipeline
    * oracles (`x_pipeline_clean`, `x_pipeline_pack`). */
  private lazy val qualitySql: String =
    "(least(length(text) * 1.0 / 200.0, 1.0) * 0.3) + " +
    "((1.0 - least((len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / " +
    "greatest(length(text) * 1.0, 1.0)) * 5.0, 1.0)) * 0.2) + " +
    s"(least((${hitsSql("en")} * 1.0 / " +
    "greatest(len(list_distinct(string_split_regex(lower(text), '\\s+'))) * 1.0, 1.0)) * 4.0, 1.0) * 0.3) + " +
    "(CASE WHEN (length(regexp_replace(lower(text), '\\s+', '', 'g')) * 1.0 / " +
    "greatest(len(string_split_regex(lower(text), '\\s+')) * 1.0, 1.0)) >= 3.0 " +
    "AND (length(regexp_replace(lower(text), '\\s+', '', 'g')) * 1.0 / " +
    "greatest(len(string_split_regex(lower(text), '\\s+')) * 1.0, 1.0)) <= 10.0 " +
    "THEN 1.0 ELSE 0.5 END * 0.2)"

  /** Hot-key derivation for the skew twins: every user not divisible
    * by 5 collapses onto user 1 (~80% of rows on one key). Pure
    * arithmetic — the oracle replays it verbatim. */
  private def skewKey: org.apache.spark.sql.Column =
    F.when(F.col("user_id") % 5 === 0, F.col("user_id")).otherwise(F.lit(1L))
  private val skewKeySql =
    "CASE WHEN user_id % 5 = 0 THEN user_id ELSE 1 END"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- grouped aggregation (driver-example shape; TPC-H Q1 style) ----
    "a3_group_agg" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          F.sum("l_quantity").as("sum_qty"),
          F.sum("l_extendedprice").as("sum_base_price"),
          F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .as("sum_disc_price"),
          F.avg("l_quantity").as("avg_qty"),
          F.count(F.lit(1)).as("count_order"))),

    // distinct aggregates: exact count(DISTINCT) per group — Spark
    // plans this as a two-phase expand+aggregate, still one logical op
    "a4_distinct_agg" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").as("n_parts"),
          F.countDistinct("l_suppkey").as("n_supps"),
          F.count(F.lit(1)).as("n_rows"))),

    // hierarchical totals: ROLLUP produces (flag,status), (flag), ()
    // grand-total levels in one pass — no key NULLs in the data, so
    // the level-indicator NULLs are unambiguous
    "a5_rollup" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").as("sum_qty"),
          F.count(F.lit(1)).as("n_rows"))),

    // pivot: one column per l_linestatus value — fixed value list so
    // the plan is a single pass (no distinct-values pre-query)
    "a6_pivot" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")),

    // post-aggregation filter (HAVING)
    "a7_having" -> ((s, dir) =>
      Tables.scan(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).as("n_orders"),
          F.sum("o_totalprice").as("spend"))
        .filter(F.col("n_orders") >= 12)),

    // full cube: all four grouping levels of (flag, status) in one
    // pass, with GROUPING_ID disambiguating level NULLs from data
    // NULLs — the standard OLAP cube contract (cast to BIGINT on both
    // engines: Spark's grouping_id and DuckDB's GROUPING differ in
    // native width)
    "a8_cube" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("long").as("gid"),
          F.sum("l_quantity").as("sum_qty"),
          F.count(F.lit(1)).as("n_rows"))),

    // exact Pearson correlation via decimal co-moments: the RAW
    // columns are cast to decimal first (value is exactly 2-dp, hour
    // is a small integer — both recover bit-identically from the
    // binary double in either engine), every product then runs in
    // exact decimal arithmetic, the SUMs (where accumulation order
    // would diverge — Spark's native corr() merges streaming
    // co-moments in partition order, so its value is not even
    // run-stable) are DECIMAL-exact, and the final formula runs in
    // double over identical operands → the result is bit-identical
    // across engines. Never cast a double PRODUCT to decimal: Spark
    // rounds the exact BigDecimal of the binary double HALF_UP while
    // DuckDB scales in float arithmetic, so the low digits diverge
    // (the x_window_running / sum_charge hazard class). The shape is
    // one map-side-combinable grouped pass; nothing is collected
    "x_stats_corr" -> ((s, dir) => {
      val x = F.col("value").cast("decimal(18,6)")
      val y = F.hour(F.col("ts")).cast("decimal(18,6)")
      val m = Tables.scan(s, dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(x).as("sx"), F.sum(y).as("sy"),
          F.sum(x * y).as("sxy"),
          F.sum(x * x).as("sxx"), F.sum(y * y).as("syy"))
      val (n, sx, sy, sxy, sxx, syy) = (F.col("n").cast("double"),
        F.col("sx").cast("double"), F.col("sy").cast("double"),
        F.col("sxy").cast("double"), F.col("sxx").cast("double"),
        F.col("syy").cast("double"))
      // zero-variance guard: Spark's non-ANSI x/0 yields NULL but
      // DuckDB's IEEE division yields Inf/NaN — an explicit NULL on a
      // zero denominator keeps a constant-value (or constant-hour)
      // group identical on both engines. The denominator is a double
      // computed from identical exact operands, so the guard fires
      // identically too.
      val den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
      m.select(F.col("event_type"), F.col("n"),
        F.when(den === 0.0, F.lit(null).cast("double"))
          .otherwise((n * sxy - sx * sy) / den)
          .as("corr_value_hour"))
    }),

    // end-to-end cleaning pipeline: quality-gate -> exact dedup ->
    // per-language counts — the composed shape of a training-data
    // preparation job, verified as one plan
    "x_pipeline_clean" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val scored = docs.withColumn("q", Text.qualityScore(F.col("text")))
        .filter(F.col("q") >= 0.55)
      val deduped = Dedup.exactDedup(scored, "doc_id", "text")
      deduped.groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.avg("q").as("avg_quality"))
    }),

    // the SAME gate + dedup continued to the finished artifact:
    // quota-cap per source, then pack into token-budget training
    // sequences — corpus in, sequence assignment out, one plan
    "x_pipeline_pack" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val gated = docs.withColumn("q", Text.qualityScore(F.col("text")))
        .filter(F.col("q") >= 0.55)
      val deduped = Dedup.exactDedup(gated, "doc_id", "text")
      val capped = Curation.quotaPerGroup(deduped, "doc_id", "source",
        QUOTA_PER_SOURCE)
      Curation.packSequences(capped.drop("rk"), "doc_id", "source", "text",
        PACK_BUDGET)
    }),

    // ---- window functions: top-N per group ----
    "x_window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").asc)
      Tables.scan(s, dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // ---- text analysis ----
    // staged select: each regex/split runs ONCE and downstream metrics
    // reference the materialized attribute — identical formulas to the
    // Text.* one-shot forms (same oracle), but ~3x less regex work
    "x_text_stats" -> ((s, dir) =>
      Tables.scan(s, dir, "documents")
        .select(F.col("doc_id"), F.col("text"),
          Text.tokenCount(F.col("text")).cast("double").as("__nt"),
          F.size(F.regexp_extract_all(F.col("text"),
            F.lit("[^A-Za-z0-9\\s]"), F.lit(0))).cast("double").as("__np"),
          Text.stopwordHits(F.col("text"), "en").cast("double").as("__nh"),
          F.size(Text.distinctTokens(F.col("text"))).cast("double").as("__nd"),
          F.length(F.regexp_replace(F.lower(F.col("text")), "\\s+", ""))
            .cast("double").as("__nc"))
        .select(F.col("doc_id"),
          F.col("__nt").cast("long").as("n_tokens"),
          Text.subTokenCount(F.col("text")).cast("long").as("n_subtokens"),
          Text.charCount(F.col("text")).cast("long").as("n_chars_calc"),
          (F.col("__nc") / F.greatest(F.col("__nt"), F.lit(1.0))).as("avg_token_len"),
          (F.col("__np") / F.greatest(F.length(F.col("text")).cast("double"), F.lit(1.0)))
            .as("punct_ratio"),
          (F.col("__nh") / F.greatest(F.col("__nd"), F.lit(1.0))).as("stopword_ratio"),
          ((F.least(F.length(F.col("text")).cast("double") / 200.0, F.lit(1.0)) * 0.3) +
            ((F.lit(1.0) - F.least((F.col("__np") /
              F.greatest(F.length(F.col("text")).cast("double"), F.lit(1.0))) * 5.0,
              F.lit(1.0))) * 0.2) +
            (F.least((F.col("__nh") / F.greatest(F.col("__nd"), F.lit(1.0))) * 4.0,
              F.lit(1.0)) * 0.3) +
            (F.when((F.col("__nc") / F.greatest(F.col("__nt"), F.lit(1.0))) >= 3.0 &&
              (F.col("__nc") / F.greatest(F.col("__nt"), F.lit(1.0))) <= 10.0, 1.0)
              .otherwise(0.5) * 0.2)).as("quality"))),

    "x_lang_id" -> ((s, dir) =>
      Tables.scan(s, dir, "documents").select(
        F.col("doc_id"), F.col("lang").as("labeled_lang"),
        Text.langId(F.col("text")).as("pred_lang"))),

    "x_fingerprint" -> ((s, dir) =>
      Tables.scan(s, dir, "documents").select(
        F.col("doc_id"),
        Text.fingerprint(F.col("text")).as("fp"),
        Text.bagFingerprint(F.col("text")).as("bag_fp"),
        graft.plans.RollingHash.rollingHash(
          F.regexp_replace(F.trim(F.lower(F.col("text"))), "\\s+", " "))
          .as("roll_fp"))),

    // PII-style masking: URL → email → phone chained regex passes,
    // plus a flag for rows the pass changed (audit selectivity)
    "x_redact" -> ((s, dir) =>
      Tables.scan(s, dir, "documents")
        .select(F.col("doc_id"), F.col("text"),
          Text.redact(F.col("text")).as("clean_text"))
        .select(F.col("doc_id"), F.col("clean_text"),
          (F.col("clean_text") =!= F.col("text")).as("was_redacted"))),

    // exact length quantiles per language: percentile() is Spark's
    // exact interpolated quantile — the distributed twin of DuckDB's
    // quantile_cont (one shuffle, no sampling)
    // one percentile aggregate with an array of percentages — the
    // exact-percentile buffer (full per-group value list) is built
    // once and shared by all three quantiles, then the array is
    // projected into scalar columns (array OUTPUTS fail the arrow
    // compare on element name/nullability, scalars don't)
    "x_length_quantiles" -> ((s, dir) =>
      Tables.scan(s, dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.percentile(F.col("n_chars"),
            F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).as("__ps"))
        .select(F.col("lang"), F.col("n_docs"),
          F.col("__ps").getItem(0).as("p50_chars"),
          F.col("__ps").getItem(1).as("p90_chars"),
          F.col("__ps").getItem(2).as("p99_chars"))),

    // ---- dedup ----
    "x_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.scan(s, dir, "documents"), "doc_id", "text",
        minCount = 1)),

    // exact Jaccard verified on MinHash-LSH candidates — runs uncapped
    // over the FULL corpus (the banding bounds the candidate space;
    // the exact intersection touches gate-surviving candidates only).
    // Terms are word BIGRAMS, not unigrams: this corpus's documents
    // share nearly their whole unigram vocabulary by construction
    // (unigram Jaccard ~1 for a third of ALL pairs), so a bag-of-words
    // near-dup query degenerates to the quadratic pair space on any
    // engine — order-sensitive shingles measure true duplication.
    "x_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
        "doc_id", "text", threshold = 0.8,
        k = MINHASH_K, bands = MINHASH_BANDS,
        terms = Text.distinctShingles(_, 2))),

    // duplication PROVENANCE: the near-dup pairs rolled up to a
    // (source_a, source_b) matrix — which feeds are re-crawling whom.
    // The pair frame is LSH-bounded (tiny vs the corpus), so the two
    // source-lookup joins broadcast the pairs onto the dim projection
    "x_dup_matrix" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val pairs = Dedup.jaccardPairsLsh(docs, "doc_id", "text",
        threshold = 0.8, k = MINHASH_K, bands = MINHASH_BANDS,
        terms = Text.distinctShingles(_, 2))
      val src = docs.select(F.col("doc_id"), F.col("source"))
      pairs
        .join(src.select(F.col("doc_id").as("id_a"),
          F.col("source").as("source_a")), Seq("id_a"))
        .join(src.select(F.col("doc_id").as("id_b"),
          F.col("source").as("source_b")), Seq("id_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).as("n_pairs"))
    }),

    // dup GROUPS: connected components over the bigram-jaccard pairs
    // (transitive near-dup closure, min-id component labels) — the
    // keep-one-per-cluster step of a dedup pipeline
    "x_dedup_components" -> ((s, dir) =>
      Dedup.dupComponents(
        Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8,
          k = MINHASH_K, bands = MINHASH_BANDS,
          terms = Text.distinctShingles(_, 2)))),

    // the materialized OUTPUT of transitive dedup: every doc that is
    // not a non-representative member of a near-dup component (i.e.
    // keep component minima and all unpaired docs) — what a cleaning
    // pipeline actually writes back out
    "x_dedup_keep" -> ((s, dir) => {
      val comps = Dedup.dupComponents(
        Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8,
          k = MINHASH_K, bands = MINHASH_BANDS,
          terms = Text.distinctShingles(_, 2)))
      val drop = comps.filter(F.col("id") =!= F.col("component"))
        .select(F.col("id").as("doc_id"))
      Tables.scan(s, dir, "documents")
        .join(drop, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // incremental-ingest dedup: the mod-10 "incoming batch" cleaned
    // against the rest of the corpus (in-batch dedup + anti-join on
    // the existing fingerprint set) — the production shape of exact
    // dedup for a continuously ingesting pipeline
    "x_dedup_incremental" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      Dedup.incrementalDedup(
          docs.filter(F.col("doc_id") % INCR_MOD =!= 0),
          docs.filter(F.col("doc_id") % INCR_MOD === 0),
          "doc_id", "text")
        .select("doc_id", "lang", "source")
    }),

    // incremental-ingest NEAR-dup: the same mod-3 batch cleaned
    // against the corpus by LSH band collision + estimated Jaccard —
    // the near-dup twin of x_dedup_incremental. Trigram shingles and
    // the 0.5 threshold match x_dedup_ngram, so the fixture's known
    // near-dup pairs exercise both drop paths across the split.
    "x_neardup_incremental" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      Dedup.incrementalNearDedup(
          docs.filter(F.col("doc_id") % INCR_MOD =!= 0),
          docs.filter(F.col("doc_id") % INCR_MOD === 0),
          "doc_id", "text", k = MINHASH_K, bands = NGRAM_BANDS,
          threshold = 0.5, terms = Text.distinctShingles(_, 3))
        .select("doc_id", "lang", "source")
    }),

    // word-trigram shingle Jaccard: order-sensitive near-dup — the
    // shingle unit separates true edits/reorders from shared
    // vocabulary. More, narrower bands (8×2) than the word-level query:
    // the 0.5 threshold needs the higher capture probability.
    "x_dedup_ngram" -> ((s, dir) =>
      Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
        "doc_id", "text", threshold = 0.5,
        k = MINHASH_K, bands = NGRAM_BANDS,
        terms = Text.distinctShingles(_, 3))),

    // asymmetric containment |A∩B| / min(|A|,|B|): the doc-in-doc /
    // boilerplate-expansion shape symmetric Jaccard structurally
    // misses (a paragraph quoted inside a long doc has containment
    // ~1 but tiny Jaccard). Candidates via the df-capped inverted
    // index — pair volume linear in corpus × cap, never Σ df².
    "x_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.scan(s, dir, "documents"),
        "doc_id", "text", threshold = CONTAIN_THRESHOLD,
        dfCap = CONTAIN_DFCAP, terms = Text.distinctShingles(_, 3))),

    // substring-level exact dedup: cross-document repeated token SPANS
    // (licence blocks, boilerplate) — the shape doc-level fingerprints
    // and token-set Jaccard both miss. Fixed 8-token windows hashed
    // once; pairs via the same df-capped inverted index as
    // x_containment (pair volume linear in corpus × cap, never Σ df²)
    "x_substring_dedup" -> ((s, dir) =>
      Dedup.substringSpanPairs(Tables.scan(s, dir, "documents"),
        "doc_id", "text", windowLen = SUBSTR_WINDOW,
        minSpans = SUBSTR_MINSPANS, dfCap = SUBSTR_DFCAP)),

    "x_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(Tables.scan(s, dir, "documents"),
        "doc_id", "text", k = MINHASH_K)),

    // signature-only near-dup (no exact verification pass) — trigram
    // shingle terms for the same reason as x_dedup_jaccard: unigram
    // signatures are near-identical across this corpus
    "x_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.scan(s, dir, "documents"),
        "doc_id", "text", k = MINHASH_K, bands = MINHASH_BANDS,
        threshold = 0.75, terms = Text.distinctShingles(_, 3))),

    "x_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.scan(s, dir, "documents"), "doc_id", "text",
        bits = 32)),

    // hamming-banded simhash pairs over trigram shingles (unigram
    // simhashes collide corpus-wide here — see x_dedup_jaccard)
    "x_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.scan(s, dir, "documents"),
        "doc_id", "text", bits = 32, maxHamming = 3,
        terms = Text.distinctShingles(_, 3))),

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

    // raw-corpus ingest format: documents round-trip through a
    // JSON-lines sink + explicit-schema source (the shape a training
    // corpus actually arrives in), then aggregate per source. The
    // oracle replays the aggregation on the parquet table, so
    // equality proves the JSONL round-trip is lossless — including
    // sum(length(text)), which any broken string escaping would move.
    "x_source_jsonl" -> ((s, dir) => {
      val scan = Tables.scan(s, dir, "documents")
      val out = Workspace.dir(s"jsonl_${new java.io.File(dir).getName}")
      scan.write.mode("overwrite").json(out)
      s.read.schema(scan.schema).json(out)
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars").cast("long")).as("sum_chars"),
          F.sum(F.length(F.col("text")).cast("long")).as("sum_text_chars"))
    }),

    // gzip-compressed JSONL round-trip: the format a web crawl
    // actually arrives in (.jsonl.gz). gzip is NOT splittable — one
    // task per file — so a real 100 TB ingest's parallelism is set by
    // the FILE COUNT, which the writer's repartition pins; everything
    // downstream of the codec is the jsonl twin, and the oracle
    // proves decompress→parse losslessness
    "x_source_gzip" -> ((s, dir) => {
      val scan = Tables.scan(s, dir, "documents")
      val out = Workspace.dir(s"jsonlgz_${new java.io.File(dir).getName}")
      scan.repartition(8)
        .write.mode("overwrite").option("compression", "gzip").json(out)
      s.read.schema(scan.schema).json(out)
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars").cast("long")).as("sum_chars"),
          F.sum(F.length(F.col("text")).cast("long")).as("sum_text_chars"))
    }),

    // CSV twin of the ingest round-trip — the format where quoting
    // and embedded delimiters actually bite. RFC4180-style escape
    // (quote doubled as "") on BOTH sides, multiLine read so embedded
    // newlines would survive too; the same parquet-side oracle proves
    // losslessness through sum(length(text)).
    "x_source_csv" -> ((s, dir) => {
      val scan = Tables.scan(s, dir, "documents")
      val out = Workspace.dir(s"csv_${new java.io.File(dir).getName}")
      scan.write.mode("overwrite")
        .option("header", "true").option("escape", "\"").csv(out)
      s.read.schema(scan.schema)
        .option("header", "true").option("escape", "\"")
        .option("multiLine", "true").csv(out)
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars").cast("long")).as("sum_chars"),
          F.sum(F.length(F.col("text")).cast("long")).as("sum_text_chars"))
    }),

    // ORC twin — the third interchange format (columnar like the
    // parquet native path, so this also covers the ORC reader/writer
    // codepath end-to-end); same lossless-round-trip oracle
    "x_source_orc" -> ((s, dir) => {
      val scan = Tables.scan(s, dir, "documents")
      val out = Workspace.dir(s"orc_${new java.io.File(dir).getName}")
      scan.write.mode("overwrite").orc(out)
      s.read.schema(scan.schema).orc(out)
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars").cast("long")).as("sum_chars"),
          F.sum(F.length(F.col("text")).cast("long")).as("sum_text_chars"))
    }),

    // Avro twin — the row-oriented interchange format raw corpora
    // commonly arrive in. No spark-avro module on this classpath, so
    // the round-trip runs through graft's own Hadoop-connector IO
    // (AvroKeyInput/OutputFormat); same lossless parquet-side oracle.
    "x_source_avro" -> ((s, dir) => {
      val scan = Tables.scan(s, dir, "documents")
      val out = Workspace.dir(s"avro_${new java.io.File(dir).getName}")
      graft.sources.AvroIO.write(scan, out)
      graft.sources.AvroIO.read(s, out, scan.schema)
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars").cast("long")).as("sum_chars"),
          F.sum(F.length(F.col("text")).cast("long")).as("sum_text_chars"))
    }),

    // schema-evolution ingest: a long-lived crawl corpus arrives in
    // batches whose schema GROWS over time — batch 2 here adds a
    // tok_count column batch 1 never had. Write the two batches as
    // separate parquet directories, read the root back with
    // mergeSchema (the union-schema read every evolving corpus
    // needs), and aggregate per source: row/char sums prove the read
    // is lossless across the schema seam, count(tok_count) proves the
    // missing column NULL-fills (only batch-2 rows counted), and its
    // sum proves batch-2 values survive. Scale note: mergeSchema
    // footer reconciliation is a driver-side listing cost — on a
    // 100-TB corpus pin the merged schema in a catalog table instead
    // of re-inferring per read; the READ path (per-file projection
    // with NULL-fill) is identical either way.
    "x_source_evolved" -> ((s, dir) => {
      val scan = Tables.scan(s, dir, "documents")
      val out = Workspace.dir(s"evolved_${new java.io.File(dir).getName}")
      scan.filter(F.col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$out/batch1")
      scan.filter(F.col("doc_id") % 2 =!= 0)
        .withColumn("tok_count",
          graft.functions.Text.tokenCount(F.col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$out/batch2")
      s.read.option("mergeSchema", "true").parquet(s"$out/batch1", s"$out/batch2")
        .groupBy("source")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars").cast("long")).as("sum_chars"),
          F.count(F.col("tok_count")).as("n_evolved"),
          F.sum(F.col("tok_count")).as("sum_toks"))
    }),

    // graded small-file compaction: fragment documents into 64 tiny
    // files (the long-running-ingest shape), byte-size compact them,
    // and aggregate the compacted copy — the oracle aggregates the
    // original table, so equality proves compaction is row-lossless
    // while LayoutSpec separately pins the file-count contract.
    "x_compaction" -> ((s, dir) => {
      val base = Workspace.dir(s"compact_${new java.io.File(dir).getName}")
      Tables.scan(s, dir, "documents").repartition(64)
        .write.mode("overwrite").parquet(s"$base/frag")
      Layout.compact(s, s"$base/frag", s"$base/out",
        targetFileBytes = 512L * 1024)
      s.read.parquet(s"$base/out")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(F.col("n_chars").cast("long")).as("sum_chars"))
    }),

    // ---- events: windowed aggregation (batch) + streaming twin ----
    "x_window_tumbling" -> ((s, dir) =>
      EventWindows.tumblingHourly(Tables.scan(s, dir, "events"))),
    "x_window_sliding" -> ((s, dir) =>
      EventWindows.slidingHourly(Tables.scan(s, dir, "events"))),
    "x_window_session" -> ((s, dir) =>
      EventWindows.sessions(Tables.scan(s, dir, "events"), "10 minutes")),
    "x_stream_tumbling" -> ((s, dir) =>
      EventWindows.streamingTumblingHourly(s, dir)),
    "x_stream_sliding" -> ((s, dir) =>
      EventWindows.streamingSlidingHourly(s, dir)),
    "x_stream_session" -> ((s, dir) =>
      EventWindows.streamingSessions(s, dir, "10 minutes")),
    // stream-static enrichment join: stream side vs a STATIC dim —
    // no join state on either side (the missing member of the
    // streaming-join matrix next to the stream-stream interval join)
    "x_stream_enrich" -> ((s, dir) =>
      EventWindows.streamingEnrich(s, dir)),
    // production-emission twin: append mode, sessions emitted once
    // when the watermark closes them; stream-tail sessions stay open
    // by design and the oracle excludes exactly those
    "x_stream_session_append" -> ((s, dir) =>
      EventWindows.streamingSessionsAppend(s, dir, "10 minutes")),
    // append-mode tumbling twin: hourly windows emitted once when the
    // watermark closes them; the stream-tail windows stay open
    "x_stream_tumbling_append" -> ((s, dir) =>
      EventWindows.streamingTumblingAppend(s, dir)),
    "x_stream_dedup" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamingDedup(s, dir)),
    // bounded-state variant: state entries expire behind the
    // watermark horizon. The correctness fixture's synthetic ingest
    // span (1 s per doc) fits inside the 1-hour horizon, so the
    // output is provably identical to global first-occurrence dedup —
    // which is exactly what the oracle checks; past the horizon the
    // re-emit trade is documented on the operator.
    "x_stream_dedup_bounded" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamingDedupBounded(s, dir)),
    "x_stream_state" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamingUserTotals(s, dir)),
    // exactly-once parquet sink graded END-TO-END: the deduplicated
    // document stream lands on disk via foreachBatch (one overwritten
    // batch_id dir per micro-batch — a replayed batch overwrites its
    // own output instead of appending duplicates; replay idempotence
    // is pinned by StreamingSpec), and the graded result is the
    // parquet READ BACK from the sink, so the whole write path sits
    // under the oracle. The output dir is wiped first: the checkpoint
    // pins file-listing state that must not leak across grading runs.
    "x_stream_sink" -> ((s, dir) => {
      val out = layoutDir(dir, "stream_sink")
      deleteRec(new java.io.File(out))
      graft.streaming.StreamingOps.streamingDedupToParquet(s, dir, out)
        .select("doc_id", "fp")
    }),
    // stream-stream interval join (append mode, watermark-bounded
    // join state): clicks ⋈ same-user purchases ≤ 2 h before
    "x_stream_join" -> ((s, dir) =>
      EventWindows.streamingIntervalJoin(s, dir)),
    // LEFT OUTER twin — the "no match within the window" production
    // shape (abandoned-cart / missing-ack detection): a matchless
    // click is emitted with NULL purchase columns once the watermark
    // proves no future purchase can still join it. Clicks too close
    // to the end of the finite fixture (ts at/after the final
    // watermark) never get that proof and are excluded — the oracle
    // applies the same watermark-closed discipline as the _append
    // window twins.
    "x_stream_join_outer" -> ((s, dir) =>
      EventWindows.streamingIntervalJoin(s, dir,
        queryName = "stream_join_outer", joinType = "left_outer")),

    // Aggregator-based top-k: identical output to x_embed_topk via a
    // typed TopKAggregator (map-side bounded heaps) instead of a
    // window sort — same oracle validates both implementations
    "x_topk_agg" -> ((s, dir) => {
      val emb = Tables.scan(s, dir, "embeddings")
      Similarity.bruteForceTopKAgg(emb, emb.filter(F.col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
    }),

    // ---- multimodal plumbing (column twin of the decode stage) ----
    "x_multimodal_meta" -> ((s, dir) =>
      Multimodal.metaColumns(Tables.scan(s, dir, "documents"), "doc_id", "text")),

    // feature extraction through the REAL mapPartitions decode seam
    // (per-partition model init, streamed rows, typed output) — the
    // oracle replays the md5-derived stub math, so the graded check
    // covers the distributed plumbing end-to-end, not a Column twin
    "x_multimodal_features" -> ((s, dir) =>
      Multimodal.featurize(s,
        Multimodal.attachPayload(Tables.scan(s, dir, "documents"),
          "doc_id", "text"), "doc_id", MM_FEAT_DIMS).toDF()),

    // fixed-stride frame sampling (the video-keyframe shape): payload
    // cut into byte windows, each fingerprinted, streamed out of a
    // flatMap without materializing a per-doc frame list
    "x_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(s,
        Multimodal.attachPayload(Tables.scan(s, dir, "documents"),
          "doc_id", "text"), "doc_id", MM_FRAME_BYTES).toDF()),

    // REAL image decode, graded: every 5th doc's payload is replaced
    // executor-side with a genuine PNG whose dimensions are pure
    // functions of doc_id (8+id%7 x 5+id%11), the rest stay opaque
    // text bytes. decodeImageIO must actually parse the PNGs to
    // report those dims (the stub would emit md5-derived dims and
    // hash-mismatch), while opaque rows must fall through to the
    // stub — one mixed-corpus pass, the realistic 100 TB shape. Only
    // dims are projected: PNG encoder BYTES are JVM-specific, so
    // byte_len/checksum aren't oracle-portable for real rows.
    "x_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val mixed = Tables.scan(s, dir, "documents")
        .filter(F.col("doc_id") < MM_DECODE_DOCS)
        .select(F.col("doc_id").cast("long"), F.col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val payload =
            if (id % 5 == 0)
              Multimodal.syntheticPng((8 + id % 7).toInt, (5 + id % 11).toInt)
            else Option(text).getOrElse("") // NULL text → empty payload (stub path), not NPE
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (id, payload)
        })
        .toDF("doc_id", "payload")
      Multimodal.decodeImageIO(s, mixed, "doc_id").toDF()
        .select(F.col("doc_id"), F.col("width"), F.col("height"))
    }),

    // ---- corpus curation ----
    // benchmark decontamination: training docs sharing a distinct
    // word 4-gram with the mod-41 "eval split" — the audit list a
    // pre-training pipeline drops before tokenization
    "x_decontaminate" -> ((s, dir) =>
      Curation.contaminated(Tables.scan(s, dir, "documents"),
        "doc_id", "text", F.col("doc_id") % DECON_MOD === 0, n = DECON_N)),

    // FUZZY decontamination: training docs whose MinHash-estimated
    // Jaccard against any mod-5 "eval split" doc reaches 0.5 —
    // catches the paraphrased/edited benchmark leakage the exact
    // 4-gram join (x_decontaminate) misses. Trigram shingles for the
    // same reason as the near-dup family; candidates from the banded
    // cross equi-join, never a training × benchmark cross product
    "x_decontaminate_fuzzy" -> ((s, dir) =>
      Curation.contaminatedFuzzy(Tables.scan(s, dir, "documents"),
        "doc_id", "text", F.col("doc_id") % FUZZY_DECON_MOD === 0,
        k = MINHASH_K, bands = MINHASH_BANDS, threshold = FUZZY_DECON_EST,
        terms = Text.distinctShingles(_, 3))),

    // CONTAINMENT decontamination: training docs that contain ≥ half
    // of a mod-5 eval doc's trigram-shingle set — the benchmark-
    // quoted-inside-a-long-doc leak both the exact n-gram count and
    // Jaccard-estimating MinHash under-surface (the long doc's union
    // dwarfs the quote). df-capped rare-shingle candidates + rarity-
    // split intersection, same 100-TB discipline as x_containment.
    "x_decontaminate_contain" -> ((s, dir) =>
      Curation.contaminatedContainment(Tables.scan(s, dir, "documents"),
        "doc_id", "text", F.col("doc_id") % FUZZY_DECON_MOD === 0,
        threshold = CONTAIN_DECON_THRESHOLD, dfCap = CONTAIN_DFCAP,
        terms = Text.distinctShingles(_, 3))),

    // dup-cluster SIZE distribution: how large are the near-dup
    // families? The audit that sizes dedup policy and catches a
    // pathological "one giant cluster" LSH failure at a glance —
    // same components as x_dedup_components, rolled up twice
    "x_dedup_sizes" -> ((s, dir) =>
      Dedup.dupComponents(
        Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8,
          k = MINHASH_K, bands = MINHASH_BANDS,
          terms = Text.distinctShingles(_, 2)))
        .groupBy("component")
        .agg(F.count(F.lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).as("n_clusters"))),

    // Gopher-style repetition metrics + keep verdict per doc
    "x_repetition" -> ((s, dir) =>
      Curation.repetitionMetrics(Tables.scan(s, dir, "documents"),
        "doc_id", "text")),

    // deterministic, shuffle-free Bernoulli-by-hash sample
    "x_sample_hash" -> ((s, dir) =>
      Curation.hashSample(Tables.scan(s, dir, "documents"), "doc_id",
          SAMPLE_PCT)
        .select("doc_id", "lang", "source")),

    // temperature-mixed source rebalance: per-source keep rates ∝
    // sqrt(source tokens) against a fixed token budget (alpha = 0.5 ≈
    // T = 2 upsampling of small sources), rows kept by the
    // deterministic hash gate — the data-recipe mixing step between
    // quality gating and packing
    "x_mix_temperature" -> ((s, dir) =>
      Curation.temperatureMix(Tables.scan(s, dir, "documents"),
          "doc_id", "source",
          graft.functions.Text.tokenCount(F.col("text")),
          alpha = MIX_ALPHA, budget = MIX_BUDGET)
        .select("doc_id", "lang", "source")),

    // per-source quota cap in deterministic hash order
    "x_sample_quota" -> ((s, dir) =>
      Curation.quotaPerGroup(Tables.scan(s, dir, "documents"),
          "doc_id", "source", QUOTA_PER_SOURCE)
        .select("doc_id", "source", "lang", "rk")),

    // ---- temporal joins over events ----
    // as-of join: each click carries the most recent purchase (ts,
    // value) by the same user at-or-before its timestamp
    "x_asof_join" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      Temporal.asofJoin(
        ev.filter(F.col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") === "purchase")
          .select("user_id", "ts", "value"),
        "user_id", "ts", "value", prefix = "purchase")
    }),

    // SCD2 dimension versioning: each user's purchases become validity
    // intervals (valid_from/valid_to/version/is_current) — the
    // dimension-history builder; one keyed window pass, size-preserving
    "x_scd2" -> ((s, dir) =>
      Temporal.scd2(
        Tables.scan(s, dir, "events")
          .filter(F.col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id")),

    // the consuming query SCD2 exists for: clicks joined to the
    // purchase-history dimension on ts ∈ [valid_from, valid_to) —
    // "which version of the user's state was current when this event
    // happened". Half-open intervals so boundary facts match exactly
    // one version; inner join (clicks before a user's first purchase
    // have no covering version and drop out on both engines).
    "x_scd2_lookup" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      val dim = Temporal.scd2(
        ev.filter(F.col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id")
        .select(F.col("user_id"), F.col("valid_from"), F.col("valid_to"),
          F.col("version"), F.col("value").as("dim_value"))
      Temporal.scd2Lookup(
        ev.filter(F.col("event_type") === "click")
          .select(F.col("event_id").as("click_id"), F.col("user_id"),
            F.col("ts").as("click_ts")),
        dim, "user_id", "click_ts")
        .select("click_id", "user_id", "click_ts", "version", "dim_value",
          "valid_from")
    }),

    // incremental aggregate refresh: a new ingest batch's partial
    // aggregate MERGES into the standing daily aggregate instead of
    // recomputing over the corpus — at 100 TB this is the difference
    // between touching one batch and re-scanning history (counts and
    // decimal sums are associative partials, so merged == full
    // recompute EXACTLY; the oracle computes the full aggregate)
    "x_incremental_agg" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      def agg(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(F.to_date(F.col("ts")).as("day"), F.col("event_type"))
          .agg(F.count(F.lit(1)).as("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).as("sum_value"))
      val standing = agg(ev.filter(F.col("event_id") % INCR_MOD =!= 0))
      val batch = agg(ev.filter(F.col("event_id") % INCR_MOD === 0))
      standing.unionByName(batch)
        .groupBy("day", "event_type")
        .agg(F.sum("n").as("n"),
          // output widens decimal→double: the driver hash renders
          // decimals float-style, so trailing-zero values fail
          // hash_match (SURVEY §5 — graded outputs are never decimal)
          F.sum("sum_value").cast("double").as("sum_value"))
    }),

    // snapshot diff: two corpus versions reconciled by key +
    // content fingerprint in ONE full-outer pass — the dataset-
    // versioning audit (what was added / removed / kept between
    // ingest rounds); only ids and 16-byte fingerprints shuffle
    "x_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
        .select(F.col("doc_id"), F.md5(F.col("text")).as("fp"))
      val v1 = docs.filter(F.col("doc_id") % 7 =!= 0)
        .withColumnRenamed("fp", "fp1")
      val v2 = docs.filter(F.col("doc_id") % 5 =!= 0)
        .withColumnRenamed("fp", "fp2")
      v1.join(v2, Seq("doc_id"), "full_outer")
        .withColumn("status",
          F.when(F.col("fp1").isNull, "added")
            .when(F.col("fp2").isNull, "removed")
            .when(F.col("fp1") =!= F.col("fp2"), "changed")
            .otherwise("kept"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).as("n_docs"))
    }),

    // bag-semantics set algebra: EXCEPT ALL / INTERSECT ALL preserve
    // multiplicity (a customer with 3 hi-spend orders and 1 finished
    // order keeps 2 in the difference) — the multiset complement of
    // o7's distinct set ops. Output canonicalized to per-key
    // multiplicities so the rows are deterministic
    "o10_bag_ops" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      val hi = o.filter(F.col("o_totalprice") > SETOPS_CUTOFF)
        .select("o_custkey")
      val fin = o.filter(F.col("o_orderstatus") === "F")
        .select("o_custkey")
      val ex = hi.exceptAll(fin).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).as("except_mult"))
      val in = hi.intersectAll(fin).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).as("intersect_mult"))
      ex.join(in, Seq("o_custkey"), "full_outer")
        .select(F.col("o_custkey"),
          F.coalesce(F.col("except_mult"), F.lit(0L)).as("except_mult"),
          F.coalesce(F.col("intersect_mult"), F.lit(0L)).as("intersect_mult"))
    }),

    // full-outer reconciliation: daily click vs purchase series
    // joined FULL OUTER so days with only one side survive with
    // explicit zeros — the two-feed consistency audit (the only join
    // type the surface didn't yet grade)
    "x_full_outer" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      def daily(t: String, out: String) =
        ev.filter(F.col("event_type") === t)
          .groupBy(F.to_date(F.col("ts")).as("day"))
          .agg(F.count(F.lit(1)).as(out))
      daily("click", "n_clicks")
        .join(daily("purchase", "n_purchases"), Seq("day"), "full_outer")
        .select(F.col("day"),
          F.coalesce(F.col("n_clicks"), F.lit(0L)).as("n_clicks"),
          F.coalesce(F.col("n_purchases"), F.lit(0L)).as("n_purchases"))
    }),

    // value-based (RANGE) window frame: per-user trailing one-hour
    // purchase total — the frame is defined by the ORDER-BY VALUE
    // (event time), not a row count, so irregular event spacing is
    // handled exactly. Ordered on epoch micros (integers) so both
    // engines build identical frames; sums in decimal
    "x_window_trailing" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.scan(s, dir, "events")
        .filter(F.col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("trailing_1h",
          // decimal sum (order-exact), double output (driver-hash
          // contract — see SURVEY §5)
          F.sum(F.col("value").cast("decimal(18,6)")).over(w)
            .cast("double"))
    }),

    // first/last/nth_value over the full partition frame — the
    // "entry/exit/second-touch" profile per user. Ordering is the µs
    // instant (matching the oracle's epoch_us truncation of the ns
    // fixture) tie-broken by event_id, so both engines see one total
    // order; one row per user via rn = 1 on the same ordering.
    "x_window_firstlast" -> ((s, dir) => {
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id"))
      val full = ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.scan(s, dir, "events")
        .select(
          F.col("user_id"),
          F.row_number().over(ord).as("rn"),
          F.first(F.col("event_type")).over(full).as("first_type"),
          F.last(F.col("event_type")).over(full).as("last_type"),
          F.nth_value(F.col("event_type"), 2).over(full).as("second_type"),
          F.count(F.lit(1)).over(full).cast("long").as("n_events"))
        .filter(F.col("rn") === 1)
        .drop("rn")
    }),

    // calendar-spine gap fill: a generated date spine × the observed
    // event types, left-joined to daily counts so silent days appear
    // as explicit zeros — the "no data IS data" contract every
    // monitoring/training-freshness pipeline needs. The spine bounds
    // come from min/max(to_date(ts)) — not a hardcoded range, so
    // events outside a fixed window can never be silently dropped and
    // the query conserves the event count at every SF. The spine is
    // sequence+explode over the 1-row bounds aggregate (no driver
    // loop; the cross joins are 1-row and dims-only); counts
    // aggregate before the join so the spine join is rows =
    // days × types, not events
    "x_gap_fill" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      val daily = ev.groupBy(F.to_date(F.col("ts")).as("day"),
          F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n_raw"))
      val spine = ev
        .agg(F.min(F.to_date(F.col("ts"))).as("lo"),
          F.max(F.to_date(F.col("ts"))).as("hi"))
        .select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).as("day"))
        .crossJoin(ev.select("event_type").distinct())
      spine.join(daily, Seq("day", "event_type"), "left")
        .select(F.col("day"), F.col("event_type"),
          F.coalesce(F.col("n_raw"), F.lit(0L)).as("n"))
    }),

    // cohort retention: users bucketed by first-activity week, then
    // counted per (cohort, week-offset) — the standard retention
    // triangle. Two grouped passes (first-touch, distinct activity)
    // and one join; every output is an integer count, so the result
    // is engine-exact by construction
    "x_cohort_retention" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
        .select(F.col("user_id"),
          F.floor(F.datediff(F.to_date(F.col("ts")),
            F.lit("2024-01-01").cast("date")) / 7).cast("long").as("week"))
      val cohorts = ev.groupBy("user_id")
        .agg(F.min("week").as("cohort_week"))
      val active = ev.distinct()
      active.join(cohorts, "user_id")
        .groupBy(F.col("cohort_week"),
          (F.col("week") - F.col("cohort_week")).as("week_offset"))
        .agg(F.countDistinct("user_id").as("n_users"))
    }),

    // unpivot/melt — the inverse reshaping of a6's pivot: the wide
    // per-status quantity columns fold back into (status, value)
    // rows. Pure metadata reshaping (an Expand node): no shuffle
    // beyond the pivot's own aggregation
    "o9_unpivot" -> ((s, dir) => {
      val wide = Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
      wide.unpivot(Array(F.col("l_returnflag")),
        Array(F.col("qty_f"), F.col("qty_o")), "status_col", "sum_qty")
    }),

    // semi-structured extraction: the events' JSON props payload is
    // parsed in-plan (get_json_object is codegen'd — no UDF, no
    // driver round-trip) and aggregated like any typed column; the
    // events-pipeline table-stakes for schema-on-read payloads
    "x_json_extract" -> ((s, dir) =>
      Tables.scan(s, dir, "events")
        .withColumn("k",
          F.get_json_object(F.col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"),
          F.count(F.col("k")).as("n_k"),
          F.sum("k").as("sum_k"),
          F.min("k").as("min_k"), F.max("k").as("max_k"),
          F.countDistinct("k").as("distinct_k"))),

    // fixed-width value histogram per event type — the distribution
    // dashboard. Bucketing is floor(value/width): one exact IEEE
    // division of the same 2-dp double on both engines, so boundary
    // values land identically; map-side-combinable single pass
    "x_histogram" -> ((s, dir) =>
      Tables.scan(s, dir, "events")
        .withColumn("bucket", F.floor(F.col("value") / HIST_WIDTH).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").as("sum_value"))
        .withColumn("bucket_lo", (F.col("bucket") * HIST_WIDTH).cast("double"))),

    // bucketed range join: clicks within ±5 min of each error event,
    // per user (zero-neighbor errors included)
    "x_range_join" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      Temporal.rangeCountJoin(
        ev.filter(F.col("event_type") === "error")
          .select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") === "click")
          .select("user_id", "ts"),
        "event_id", "user_id", "ts", RANGE_WINDOW_SEC)
    }),

    // ---- skew mitigation (identical results, hot-key-proof plans) ----
    // GENUINE skew, not a balanced fixture: ~80% of events collapse
    // onto one hot key (every user_id not divisible by 5 becomes
    // user 1) — the celebrity-key distribution the salted plans
    // exist for. The derivation is pure arithmetic, so the oracle
    // replays it and checks result-identity with the PLAIN agg/join;
    // SkewSpec separately pins that the salted partial stage bounds
    // the hottest reducer group to ~1/SALT_BUCKETS of the hot key.
    "x_skew_agg" -> ((s, dir) =>
      Skew.saltedAgg(
        Tables.scan(s, dir, "events").withColumn("skew_user", skewKey),
        "skew_user", F.col("event_id"), "value", SALT_BUCKETS)),

    // hot-keyed click events ⋈ customer dim with the dim replicated
    // per salt bucket — the hot user's clicks spread over
    // SALT_BUCKETS reducers instead of stalling one task
    "x_skew_join" -> ((s, dir) => {
      val clicks = Tables.scan(s, dir, "events")
        .filter(F.col("event_type") === "click")
        .select(F.col("event_id"), skewKey.as("user_id"), F.col("value"))
      val dim = Tables.scan(s, dir, "customer")
        .select(F.col("c_custkey").as("user_id"), F.col("c_name"))
      Joins.saltedJoin(clicks, dim, Seq("user_id"), SALT_BUCKETS,
          saltFrom = F.col("event_id"))
        .select("event_id", "user_id", "c_name", "value")
    }),

    // ---- embedding analytics ----
    // per-label mean embedding in long (label, dim, centroid, n) form
    // — class prototypes / IVF seeding, no vectors ever collected
    "x_embed_centroid" -> ((s, dir) =>
      Similarity.groupCentroids(Tables.scan(s, dir, "embeddings"),
        "label", "embedding")),

    // top-3 tf-idf terms per document (keyword extraction), ranked on
    // the 6-dp-rounded score so the ranking is engine-stable
    "x_tfidf" -> ((s, dir) =>
      Curation.tfidfTopTerms(Tables.scan(s, dir, "documents"),
        "doc_id", "text", TFIDF_TOPK)),

    // corpus collocations: top adjacent word pairs by PMI with a
    // support floor — the phrase-mining signal for tokenizer/vocab
    // decisions; ranked on the rounded score (engine-stable)
    "x_pmi" -> ((s, dir) =>
      Curation.pmiTopPairs(Tables.scan(s, dir, "documents"),
        "text", PMI_MIN_COUNT, PMI_TOPK)),

    // per-doc bigram-LM quality score (mean smoothed log-prob of the
    // doc's bigrams under corpus statistics) — the perplexity-gate
    // filtering signal, model-free and fully oracle-replayable
    "x_lm_score" -> ((s, dir) =>
      Curation.bigramLmScore(Tables.scan(s, dir, "documents"),
        "doc_id", "text")),

    // per-source coverage of a fixed top-k corpus vocabulary — the
    // tokenizer-sizing dashboard (what fraction of each source's
    // token stream a k-entry vocab captures)
    "x_vocab_coverage" -> ((s, dir) =>
      Curation.vocabCoverage(Tables.scan(s, dir, "documents"),
        "source", "text", VOCAB_K)),

    // ---- physical layout (scale path) ----
    // date-partitioned materialization + partition-pruned read-back:
    // only the 7/30 event_date directories inside the queried week
    // are listed into the scan (PartitionFilters, pinned by
    // PlanShapeSpec); the aggregation runs on the pruned subset only
    "x_partition_prune" -> ((s, dir) => {
      val out = layoutDir(dir, "events_by_date")
      Layout.writeDatePartitioned(Tables.scan(s, dir, "events"), "ts", out)
      Layout.readDateRange(s, out, PRUNE_FROM, PRUNE_TO)
        .groupBy("event_date", "event_type")
        .agg(F.count(F.lit(1)).as("n"), F.sum("value").as("sum_value"))
    }),

    // Z-order clustered materialization + 2-D pruned read-back: the
    // Morton layout bounds every file's (user_id, day_idx) rectangle,
    // so parquet min/max footer stats skip files for predicates on
    // EITHER dimension — the property single-key clustering gives only
    // one of (LayoutSpec pins the per-file span bounds). The graded
    // read applies both band predicates and aggregates the rectangle;
    // sums in DECIMAL so values are accumulation-order-exact
    "x_zorder_prune" -> ((s, dir) => {
      val out = layoutDir(dir, "events_zorder")
      Layout.writeZOrdered(
        Tables.scan(s, dir, "events").withColumn("day_idx",
          F.datediff(F.to_date(F.col("ts")),
            F.lit("2024-01-01").cast("date"))),
        "user_id", "day_idx", 16, out, bits = ZORDER_BITS)
      s.read.parquet(out)
        .filter(F.col("user_id").between(ZORDER_USER_LO, ZORDER_USER_HI)
          && F.col("day_idx").between(ZORDER_DAY_LO, ZORDER_DAY_HI))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").as("sum_value"))
    }),

    // co-located (bucketed) join: both sides materialized bucketed +
    // sorted on the join key with the same bucket count, so the
    // sort-merge join runs WITHOUT a shuffle on either side — at
    // 100 TB this is the layout that turns every repeated fact↔fact
    // join on the declared key into a local merge (PlanShapeSpec pins
    // the no-Exchange-under-the-join property for this exact query);
    // spend accumulates in DECIMAL so values are order-exact
    "x_bucketed_join" -> ((s, dir) => {
      Tables.writeBucketed(
        Tables.scan(s, dir, "orders").select("o_custkey", "o_totalprice"),
        "graft_bkt_orders", "o_custkey", 8)
      Tables.writeBucketed(
        Tables.scan(s, dir, "customer")
          .select(F.col("c_custkey").as("o_custkey"), F.col("c_mktsegment")),
        "graft_bkt_customer", "o_custkey", 8)
      s.table("graft_bkt_orders")
        .join(s.table("graft_bkt_customer"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).as("n_orders"),
          F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double").as("total_spend"))
    }),

    // contiguous sequence packing: per-source token-budget bins —
    // the document→fixed-context-training-sequence assignment step
    "x_pack_sequences" -> ((s, dir) =>
      Curation.packSequences(Tables.scan(s, dir, "documents"),
        "doc_id", "source", "text", PACK_BUDGET)),

    // blocked fuzzy dedup: prefix-blocked candidates verified by
    // Levenshtein — catches the character-level (typo/OCR)
    // duplicates the token-set families under-weigh
    "x_dedup_fuzzy" -> ((s, dir) =>
      Dedup.fuzzyPairs(Tables.scan(s, dir, "documents"), "doc_id", "text",
        FUZZY_BLOCK, FUZZY_PREFIX, FUZZY_MAXDIST)),

    // set operations (absent from the reference — SURVEY §2.5 — but
    // table stakes for an analytics engine): symmetric difference of
    // two order-derived customer segments via UNION/INTERSECT/EXCEPT
    "o7_set_ops" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      val hi = o.filter(F.col("o_totalprice") > SETOPS_CUTOFF)
        .select("o_custkey")
      val fin = o.filter(F.col("o_orderstatus") === "F")
        .select("o_custkey")
      hi.union(fin).distinct().except(hi.intersect(fin))
    }),

    // deterministic stratified train/val/test split: the assignment
    // is a pure function of the id hash (map-only, no RNG), so splits
    // are append-stable — new ingest never reshuffles held-out docs
    "x_split_stratified" -> ((s, dir) =>
      Curation.assignSplit(Tables.scan(s, dir, "documents"), "doc_id",
          SPLIT_TRAIN, SPLIT_VAL)
        .select("doc_id", "source", "split")),

    // decontamination behind a broadcast Bloom pre-filter: grams that
    // can't be contaminated die map-side before any shuffle; the
    // exact confirm join makes it result-identical to
    // x_decontaminate (one oracle validates both)
    "x_decontaminate_bloom" -> ((s, dir) =>
      Curation.contaminatedBloom(Tables.scan(s, dir, "documents"),
        "doc_id", "text", F.col("doc_id") % DECON_MOD === 0,
        n = DECON_N, fpp = BLOOM_FPP)),

    // fixed-size overlapping token-window chunking (RAG indexing /
    // long-doc segmentation); chunk bodies leave the plan as md5
    // fingerprints, not text
    "x_chunk_docs" -> ((s, dir) =>
      Curation.chunkDocs(Tables.scan(s, dir, "documents"),
        "doc_id", "text", CHUNK_SIZE, CHUNK_STRIDE)),

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
    }),

    // cross-source vocabulary overlap: token-set Jaccard between
    // every source pair — the mirrored-source audit before dedup
    "x_source_overlap" -> ((s, dir) =>
      Curation.vocabularyOverlap(Tables.scan(s, dir, "documents"),
        "source", "text")),

    // quality-PROPORTIONAL deterministic sampling: keep probability
    // scales with the doc's quality score (map-only, RNG-free — the
    // weighted twin of x_sample_hash)
    "x_sample_weighted" -> ((s, dir) =>
      Curation.weightedSample(Tables.scan(s, dir, "documents"), "doc_id",
          graft.functions.Text.qualityScore(F.col("text")), WEIGHTED_RATE)
        .select("doc_id", "lang", "source")),

    // per-source corpus health report: doc counts, mean tokens, mean
    // quality, docs above the quality gate — the dashboard that
    // drives quota/weighting decisions
    "x_source_quality" -> ((s, dir) =>
      Curation.sourceQualityReport(Tables.scan(s, dir, "documents"),
        "source", "text", QUALITY_GATE)),

    // per-user running total + step delta over purchase events — the
    // cumulative/lag analytic-window family. BOTH derived columns are
    // done in DECIMAL so they are EXACT: a double running sum's value
    // would depend on accumulation order (Spark folds sequentially,
    // DuckDB uses segment trees), and round(double - double, 6)
    // diverges on half-way/representation cases (Spark rounds the
    // exact BigDecimal of the binary double HALF_UP, DuckDB rounds in
    // float arithmetic) — decimal subtraction has neither hazard
    "x_window_running" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val dec = F.col("value").cast("decimal(18,6)")
      Tables.scan(s, dir, "events")
        .filter(F.col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("running_total",
          F.sum(dec).over(wRun).cast("double"))
        .withColumn("delta",
          (dec - F.lag(dec, 1).over(w)).cast("double"))
    }),

    // distribution-rank window family over recent orders: rank,
    // quartile (ntile), percent_rank, cume_dist per status partition.
    // Ordering includes o_orderkey so ties are impossible → every
    // rank value is deterministic; rank-derived fractions are exact
    // IEEE divisions of identical integers on both engines. Ranking
    // ints are cast to BIGINT (Spark's ntile/rank are int32, DuckDB's
    // are int64 — driver compares arrow types)
    "x_window_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").asc)
      Tables.scan(s, dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        .select(F.col("o_orderkey"), F.col("o_orderstatus"), F.col("o_totalprice"),
          F.rank().over(w).cast("long").as("rnk"),
          F.ntile(4).over(w).cast("long").as("quartile"),
          F.percent_rank().over(w).as("pct_rank"),
          F.cume_dist().over(w).as("cume"))
    }),

    // ---- data-quality gates (operators/Quality.scala) ----
    // column profiling: nulls/distinct/min/max for four
    // heterogeneous-typed columns as one aggregation branch per column
    // (deliberately NOT a single multi-distinct aggregation — that
    // plans an Expand multiplying the scan by the column count; see
    // Quality.profile's scaladoc for the measurements)
    "x_profile_columns" -> ((s, dir) =>
      graft.operators.Quality.profile(
        Tables.scan(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))),
    // declarative constraint suite over orders: the single-table
    // checks fold into one scan; the referential rule anti-joins
    // against the broadcast distinct customer key set
    "x_constraint_check" -> ((s, dir) =>
      graft.operators.Quality.checkConstraints(
        Tables.scan(s, dir, "orders"), Seq(
          graft.operators.Quality.NotNull("o_custkey"),
          graft.operators.Quality.Unique("o_orderkey"),
          graft.operators.Quality.InSet("o_orderstatus", Seq("O", "F", "P")),
          graft.operators.Quality.Check("totalprice_positive",
            F.col("o_totalprice") > 0),
          graft.operators.Quality.RefIntegrity("o_custkey",
            Tables.scan(s, dir, "customer"), "c_custkey")))),
    // sketch-bounds-exact heavy hitters over the corpus token stream:
    // per-partition Misra-Gries candidates, broadcast semi-join,
    // exact HAVING-style trim — output is exact, so the oracle is a
    // plain GROUP BY/HAVING
    "x_heavy_hitters" -> ((s, dir) =>
      graft.operators.Quality.heavyHitters(
        Tables.scan(s, dir, "documents")
          .select(F.explode(Text.tokens(F.col("text"))).as("item")),
        "item", HH_K)),

    // ---- event analytics (operators/Analytics.scala) ----
    // ordered-stage funnel: first-touch per stage, stage i+1 counts
    // only at-or-after the user's stage-i time
    "x_funnel" -> ((s, dir) =>
      graft.operators.Analytics.funnel(
        Tables.scan(s, dir, "events"),
        "user_id", "ts", "event_type", FUNNEL_STAGES)),
    // per-source distribution drift: KL(source ‖ corpus) over token
    // frequencies — the domain-weighting signal next to
    // x_mix_temperature; decimal-summed 6-dp terms replay exactly
    "x_source_divergence" -> ((s, dir) =>
      Curation.sourceDivergence(Tables.scan(s, dir, "documents"),
        "source", "text")),
    // per-doc novelty: fraction of a doc's trigram shingles whose
    // first corpus occurrence is this doc — the "new material" signal
    // dup-detection misses
    "x_novelty" -> ((s, dir) =>
      Curation.noveltyScore(Tables.scan(s, dir, "documents"),
        "doc_id", "text", NOVELTY_N)),
    // windowed-conversion twin: each stage must land within 24h of
    // the previous one — "converted within a day", not "eventually"
    "x_funnel_window" -> ((s, dir) =>
      graft.operators.Analytics.funnel(
        Tables.scan(s, dir, "events"),
        "user_id", "ts", "event_type", FUNNEL_STAGES,
        maxGapSec = Some(FUNNEL_GAP_SEC))),
    // best-3 purchases per user through the bounded-heap aggregator —
    // map-side partials move O(users × 3) rows, no per-group sort
    // (the window twin's plan); output identical to row_number ≤ 3
    "x_topn_group_agg" -> ((s, dir) =>
      graft.operators.Analytics.topNPerKey(
        Tables.scan(s, dir, "events")
          .filter(F.col("event_type") === "purchase"),
        "user_id", "event_id", "value", n = 3)),
    // truncated EWMA trend per user over purchase values — the
    // parallel-window formulation of the sequential recurrence
    "x_ewma" -> ((s, dir) =>
      graft.operators.Analytics.ewma(
        Tables.scan(s, dir, "events")
          .filter(F.col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id", "value", EWMA_ALPHA, EWMA_DEPTH)),
    // group-mean imputation over a planted-null corpus (every 23rd
    // event's value nulled): NULLs fill with their type's decimal-
    // exact mean of the surviving values
    "x_impute" -> ((s, dir) =>
      graft.operators.Analytics.imputeMean(
        Tables.scan(s, dir, "events")
          .select(F.col("event_id"), F.col("event_type"),
            F.when(F.col("event_id") % 23 === 0, F.lit(null))
              .otherwise(F.col("value")).as("value")),
        "event_type", "value", Seq("event_id"))),
    // robust outliers: |value - median| > 3 * MAD per event_type,
    // exact sort-based percentiles on both engines
    "x_anomaly_mad" -> ((s, dir) =>
      graft.operators.Analytics.madOutliers(
        Tables.scan(s, dir, "events"),
        "event_type", "value", Seq("event_id"), MAD_CUT)),

    // bloom file index: the layout is clustered on user_id, so every
    // file's event_id min/max spans the whole id range and footer
    // stats can never skip a file for an EVENT point lookup — the
    // per-file Bloom side index can (1 + fpp·files listed; false
    // negatives impossible, both pinned in LayoutSpec)
    "x_bloom_prune" -> ((s, dir) => {
      val out = layoutDir(dir, "events_bloomidx")
      Layout.writeRangeClustered(Tables.scan(s, dir, "events"),
        "user_id", BLOOM_IDX_FILES, s"$out/data")
      Layout.writeBloomIndex(s, s"$out/data", "event_id", s"$out/idx",
        expectedPerFile = 100000L, fpp = BLOOM_IDX_FPP)
      Layout.readBloomIndexed(s, s"$out/data", s"$out/idx",
          "event_id", BLOOM_IDX_EVENT)
        .select("event_id", "user_id", "event_type", "value")
    }),

    // image near-dup dedup: real PNG decode → 64-bit average-hash →
    // banded equi-join candidates → exact Hamming gate. The graded
    // corpus plants duplicate groups via seeded pixel content
    // (doc_id % 13), so the oracle predicts the pairs from key
    // arithmetic without seeing any bytes
    "x_multimodal_phash" -> ((s, dir) => {
      import s.implicits._
      val imgs = Tables.scan(s, dir, "documents")
        .filter(F.col("doc_id") < MM_PHASH_DOCS)
        .select(F.col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map(id => (id,
          Multimodal.syntheticPngSeeded(16, 16, (id % MM_PHASH_SEEDS).toInt))))
        .toDF("doc_id", "payload")
      Multimodal.phashPairs(
        Multimodal.perceptualHash(s, imgs, "doc_id").toDF(),
        "doc_id", "phash", MM_PHASH_MAXDIST)
    }),

    // event-grain sessionization: every event labeled with its user's
    // session ordinal (10-minute gap) — the raw-event twin of the
    // session_window aggregate
    "x_sessionize" -> ((s, dir) =>
      graft.operators.Analytics.sessionize(
        Tables.scan(s, dir, "events")
          .select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", gapSec = 600L)),

    // scalable dense ids: global 1-based ordinals WITHOUT the
    // single-partition row_number() window — range partitions
    // numbered in parallel against broadcast partition offsets
    "x_assign_ids" -> ((s, dir) =>
      graft.operators.Ranking.denseIds(
        Tables.scan(s, dir, "documents").select("doc_id", "source"),
        Seq(F.col("doc_id")), RANK_PARTS)),
    // equi-depth decile binning on the same primitive: bins defined
    // by RANK (exactly replayable), never by quantile boundaries
    // whose tie handling is engine-dependent
    "x_quantile_bins" -> ((s, dir) =>
      graft.operators.Ranking.equiDepthBins(
        Tables.scan(s, dir, "events").select("event_id", "value"),
        Seq(F.col("value"), F.col("event_id")), "value",
        BIN_COUNT, RANK_PARTS)),
    // feature scaling: per-type z-scores from DECIMAL-exact moments
    // (merge-order-stable), broadcast stats, map-side z
    "x_feature_scale" -> ((s, dir) =>
      graft.operators.Analytics.standardize(
        Tables.scan(s, dir, "events")
          .select("event_id", "event_type", "value"),
        "event_type", "value", Seq("event_id"))),

    // CDC apply: fold a synthetic change feed (deletes, updates,
    // inserts, and per-key CONFLICTING changes resolved
    // last-writer-wins by version) into the orders snapshot — the
    // log-structured MERGE shape; the snapshot's only work is one
    // broadcast anti-join
    "x_cdc_apply" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      graft.operators.Writes.cdcApply(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        cdcChangeFeed(o), Seq("o_orderkey"), "op", "ver")
    }),

    // streaming twin: the SAME change feed arrives as micro-batches
    // (one file per trigger, conflicts split arbitrarily across
    // batches) and folds into versioned parquet state — final state
    // must equal the batch apply, which is the shared oracle
    "x_stream_cdc" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      val root = layoutDir(dir, "cdc_stream")
      cdcChangeFeed(o).repartition(4)
        .write.mode("overwrite").parquet(s"$root/changes")
      graft.streaming.StreamingOps.streamingCdcApply(s,
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        s"$root/changes", Seq("o_orderkey"), "op", "ver",
        s"$root/state")
    }),

    // interval-overlap join: both sides are variable-length intervals
    // (purchase vs error windows per user) — grid-bucketed equi-join
    // with first-shared-cell dedup, never a theta pair space
    "x_interval_join" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      val a = ev.filter(F.col("event_type") === "purchase")
        .select(F.col("event_id").as("a_id"), F.col("user_id"),
          F.col("ts").as("a_start"),
          F.expr(s"ts + INTERVAL $IVAL_A_MIN MINUTES").as("a_end"))
      val b = ev.filter(F.col("event_type") === "error")
        .select(F.col("event_id").as("b_id"), F.col("user_id"),
          F.col("ts").as("b_start"),
          F.expr(s"ts + INTERVAL $IVAL_B_MIN MINUTES").as("b_end"))
      Temporal.intervalJoin(a, b, "user_id",
          "a_start", "a_end", "b_start", "b_end", IVAL_BUCKET_SEC)
        .select("a_id", "b_id", "user_id", "overlap_us")
    }),

    // mergeable-sketch cardinality rollup: per-source HLL sketches of
    // the token stream, estimated per source AND hll_union'd into a
    // corpus row WITHOUT rescanning — the re-aggregatable-rollup
    // pattern that replaces exact DISTINCT at 100 TB. DuckDB's HLL is
    // a different implementation, so there is no SQL oracle (driver
    // records the rows-only check); ApproxSpec pins the estimates
    // within 5% of exact on every row
    "x_hll_cardinality" -> ((s, dir) => {
      val sk = Tables.scan(s, dir, "documents")
        .select(F.col("source"), F.explode(Text.tokens(F.col("text"))).as("tok"))
        .groupBy("source")
        .agg(F.hll_sketch_agg(F.col("tok"), HLL_LGK).as("sk"))
      val per = sk.select(F.col("source"),
        F.hll_sketch_estimate(F.col("sk")).as("est_distinct"))
      val all = sk.agg(F.hll_union_agg(F.col("sk")).as("sk"))
        .select(F.lit("__all__").as("source"),
          F.hll_sketch_estimate(F.col("sk")).as("est_distinct"))
      per.unionByName(all)
    }),

    // exact twin of the sketch rollup: same per-source + __all__ rows
    // with exact count(DISTINCT tok) — grades the GROUP-BY/rollup half
    // of x_hll_cardinality against the oracle, so the only ungraded
    // number on the board is the HLL estimate itself (QualitySpec pins
    // that within 5% of these exact counts). Two aggregation branches
    // over one logical scan; the global branch reduces to distinct
    // tokens before counting, so neither branch shuffles document text
    "x_distinct_exact" -> ((s, dir) => {
      val toks = Tables.scan(s, dir, "documents")
        .select(F.col("source"), F.explode(Text.tokens(F.col("text"))).as("tok"))
      val per = toks.groupBy("source")
        .agg(F.countDistinct("tok").as("n_distinct"))
      val all = toks.select("tok").distinct()
        .agg(F.count(F.lit(1)).as("n_distinct"))
        .select(F.lit("__all__").as("source"), F.col("n_distinct"))
      per.unionByName(all)
    })
  )

  /** The synthetic CDC feed over orders, shared by the batch and
    * streaming apply twins: plain delete/update/insert plus per-key
    * CONFLICTING changes whose resolution exercises
    * last-writer-wins by version in both engines. */
  private def cdcChangeFeed(o: DataFrame): DataFrame = {
    def part(m: Int, op: String, ver: Long, key: org.apache.spark.sql.Column,
             status: org.apache.spark.sql.Column,
             price: org.apache.spark.sql.Column) =
      o.filter(F.col("o_orderkey") % 10 === m)
        .select(key.cast("long").as("o_orderkey"),
          status.cast("string").as("o_orderstatus"),
          price.cast("double").as("o_totalprice"),
          F.lit(op).as("op"), F.lit(ver).as("ver"))
    val k = F.col("o_orderkey")
    val st = F.col("o_orderstatus")
    val pr = F.col("o_totalprice")
    val nil = F.lit(null)
    Seq(
      part(0, "D", 1L, k, nil, nil), // plain delete
      part(1, "U", 1L, k, st, pr * 1.1), // plain update
      part(2, "I", 1L, k + 1000000L, F.lit("N"), F.lit(100.0)), // insert
      part(3, "D", 1L, k, nil, nil), // superseded by...
      part(3, "U", 2L, k, st, pr + 5.0), // ...this later update
      part(4, "U", 1L, k, st, pr), // superseded by...
      part(4, "D", 2L, k, nil, nil) // ...this later delete
    ).reduce(_.unionByName(_))
  }

  /** Scratch dir for layout materializations — per-process root (no
    * cross-JVM collisions, see [[Workspace]]), suffixed by the SF-dir
    * basename so one process grading multiple scales keeps outputs
    * apart; the writers' overwrite mode keeps re-runs idempotent. */
  private def layoutDir(sfDir: String, name: String): String =
    Workspace.dir(s"${name}_${new java.io.File(sfDir).getName}")

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  /** k min-hash aggregate expressions (same universal-hash literals
    * as [[Dedup.minhashA]]/[[Dedup.minhashB]] — bit-identical sigs). */
  private def mhMinsSql: String = {
    val P = Dedup.MINHASH_P
    (0 until MINHASH_K)
      .map(i => s"min((${Dedup.minhashA(i)} * (${h60("tok")} % $P) + " +
        s"${Dedup.minhashB(i)}) % $P) AS mh$i").mkString(", ")
  }

  /** One UNION ALL branch per band over a `sig` CTE — mirrors
    * [[Dedup]]'s banding (md5 over ','-joined band hashes). */
  private def bandRowsSql(bands: Int): String = {
    val rowsPerBand = MINHASH_K / bands
    (0 until bands).map { b =>
      val cat = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => s"mh$i::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_hash, " +
        (0 until MINHASH_K).map(i => s"mh$i").mkString(", ") + " FROM sig"
    }.mkString(" UNION ALL ")
  }

  /** Matching-minhash-fraction (estimated Jaccard) between aliases l
    * and r — the SQL twin of [[Dedup]]'s flat codegen'd sum. */
  private def estSql: String =
    "(" + (0 until MINHASH_K)
      .map(i => s"CASE WHEN l.mh$i = r.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ") + s") * 1.0 / $MINHASH_K"

  /** Oracle for both decontamination variants (exact and
    * Bloom-pre-filtered — the latter is result-identical by
    * construction). */
  /** Shared tail of the funnel oracles: stage-count rollup. */
  private val funnelTailSql: String =
    "c AS (SELECT CAST(count(t0) AS BIGINT) AS n0, " +
      "CAST(count(t1) AS BIGINT) AS n1, " +
      "CAST(count(t2) AS BIGINT) AS n2 FROM s2) " +
      "SELECT 'view' AS stage, CAST(0 AS BIGINT) AS stage_idx, n0 AS n_users FROM c " +
      "UNION ALL SELECT 'click', CAST(1 AS BIGINT), n1 FROM c " +
      "UNION ALL SELECT 'purchase', CAST(2 AS BIGINT), n2 FROM c"

  private lazy val cdcApplySql: String =
    "WITH ch AS (" +
          "SELECT o_orderkey AS k, 'D' AS op, 1 AS ver, " +
          "CAST(NULL AS VARCHAR) AS o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice " +
          "FROM orders WHERE o_orderkey % 10 = 0 " +
          "UNION ALL SELECT o_orderkey, 'U', 1, o_orderstatus, o_totalprice * 1.1 " +
          "FROM orders WHERE o_orderkey % 10 = 1 " +
          "UNION ALL SELECT o_orderkey + 1000000, 'I', 1, 'N', 100.0 " +
          "FROM orders WHERE o_orderkey % 10 = 2 " +
          "UNION ALL SELECT o_orderkey, 'D', 1, NULL, NULL " +
          "FROM orders WHERE o_orderkey % 10 = 3 " +
          "UNION ALL SELECT o_orderkey, 'U', 2, o_orderstatus, o_totalprice + 5.0 " +
          "FROM orders WHERE o_orderkey % 10 = 3 " +
          "UNION ALL SELECT o_orderkey, 'U', 1, o_orderstatus, o_totalprice " +
          "FROM orders WHERE o_orderkey % 10 = 4 " +
          "UNION ALL SELECT o_orderkey, 'D', 2, NULL, NULL " +
          "FROM orders WHERE o_orderkey % 10 = 4), " +
          "latest AS (SELECT * FROM (SELECT ch.*, row_number() OVER (" +
          "PARTITION BY k ORDER BY ver DESC, op DESC) AS rn FROM ch) WHERE rn = 1) " +
          "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o " +
          "WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = o.o_orderkey) " +
          "UNION ALL SELECT k, o_orderstatus, o_totalprice FROM latest WHERE op <> 'D'"

  private lazy val deconSql: String =
    s"WITH ${shingleToksCte(DECON_N)}, " +
      s"bench AS (SELECT DISTINCT tok FROM toks WHERE doc_id % $DECON_MOD = 0) " +
      "SELECT t.doc_id, count(*) AS n_shared FROM toks t " +
      s"JOIN bench b USING (tok) WHERE t.doc_id % $DECON_MOD <> 0 " +
      "GROUP BY t.doc_id"

  /** CTE chain ending in `toks(doc_id, tok)` of distinct word
    * n-gram shingles — the twin of `Text.distinctShingles(_, n)`
    * (short texts yield one whole-text shingle). */
  private def shingleToksCte(n: Int): String = {
    val grams = (0 until n).map(o => if (o == 0) "t[i]" else s"t[i+$o]")
      .mkString(" || ' ' || ")
    val hi = if (n == 2) "len(t)" else s"len(t) - ${n - 2}"
    "sh AS (SELECT doc_id, unnest(list_distinct(" +
      s"CASE WHEN len(t) >= $n THEN list_transform(range(1, $hi), " +
      s"i -> $grams) " +
      "ELSE [array_to_string(t, ' ')] END)) AS tok FROM " +
      "(SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t " +
      "FROM documents)), " +
      "toks AS (SELECT doc_id, tok FROM sh WHERE tok <> '')"
  }

  /** Full LSH-candidate exact-Jaccard pipeline (the DuckDB twin of
    * [[Dedup.jaccardPairsLsh]]): `toksCte` must define a CTE chain
    * ending in `toks(doc_id, tok)`. Candidates are gated at
    * `threshold - estSlack` on the signature-estimated Jaccard,
    * exactly as the Spark side is. */
  private def jaccardLshSql(toksCte: String, bands: Int,
                            threshold: Double,
                            estSlack: Double = 0.25): String =
    s"WITH $toksCte, " +
      s"sig AS (SELECT doc_id, $mhMinsSql FROM toks GROUP BY doc_id), " +
      s"bands AS (${bandRowsSql(bands)}), " +
      "cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
      "FROM bands l JOIN bands r ON l.band_idx = r.band_idx " +
      "AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id " +
      s"WHERE $estSql >= ${math.max(0.0, threshold - estSlack)}), " +
      "sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id), " +
      // the exact intersection joins on the 60-bit term hash, the
      // same value the Spark side shuffles (Dedup.jaccardPairsLsh
      // hashes each term once and joins on the long)
      s"th AS (SELECT doc_id, ${h60("tok")} AS h FROM toks), " +
      "inter AS (SELECT c.id_a, c.id_b, count(*) AS i FROM cand c " +
      "JOIN th a ON a.doc_id = c.id_a " +
      "JOIN th b ON b.doc_id = c.id_b AND b.h = a.h GROUP BY 1, 2) " +
      "SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard FROM inter " +
      "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b " +
      s"WHERE i * 1.0 / (sa.sz + sb.sz - i) >= $threshold"

  /** DuckDB twin of [[Dedup.containmentPairs]]: identical hash
    * (md5-derived 60-bit term longs), identical df cap, identical
    * arithmetic (`i / least(sz_a, sz_b)` over distinct-hash set
    * sizes). `toksCte` must end in `toks(doc_id, tok)`. */
  private def containmentSql(toksCte: String, threshold: Double,
                             dfCap: Int): String =
    s"WITH $toksCte, " +
      // distinct (doc, hash) set — the same defensive dedupe the
      // Spark side applies after hashing
      s"th AS (SELECT DISTINCT doc_id, ${h60("tok")} AS h FROM toks), " +
      "sizes AS (SELECT doc_id, count(*) AS sz FROM th GROUP BY doc_id), " +
      s"rareh AS (SELECT h FROM th GROUP BY h HAVING count(*) <= $dfCap), " +
      "rare AS (SELECT t.doc_id, t.h FROM th t JOIN rareh USING (h)), " +
      "cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b " +
      "FROM rare l JOIN rare r ON l.h = r.h AND l.doc_id < r.doc_id), " +
      "inter AS (SELECT c.id_a, c.id_b, count(*) AS i FROM cand c " +
      "JOIN th a ON a.doc_id = c.id_a " +
      "JOIN th b ON b.doc_id = c.id_b AND b.h = a.h GROUP BY 1, 2) " +
      "SELECT id_a, id_b, i * 1.0 / least(sa.sz, sb.sz) AS containment " +
      "FROM inter " +
      "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b " +
      s"WHERE i * 1.0 / least(sa.sz, sb.sz) >= $threshold"

  /** DuckDB twin of [[Curation.contaminatedContainment]]: same
    * mod-split, same rare-candidate gating (df over the TRAINING side
    * ≤ cap), same `inter / |bench set|` arithmetic; the full
    * intersection here and the Spark side's rarity-split count are
    * equal by construction. */
  private def containDeconSql(toksCte: String, benchMod: Int,
                              threshold: Double, dfCap: Int): String =
    s"WITH $toksCte, " +
      s"th AS (SELECT DISTINCT doc_id, ${h60("tok")} AS h FROM toks), " +
      s"tr AS (SELECT doc_id, h FROM th WHERE doc_id % $benchMod <> 0), " +
      s"be AS (SELECT doc_id AS bench_id, h FROM th WHERE doc_id % $benchMod = 0), " +
      "bsz AS (SELECT bench_id, count(*) AS bsz FROM be GROUP BY 1), " +
      s"rh AS (SELECT h FROM tr GROUP BY h HAVING count(*) <= $dfCap), " +
      "cand AS (SELECT DISTINCT t.doc_id, b.bench_id FROM tr t " +
      "JOIN rh USING (h) JOIN be b ON b.h = t.h), " +
      "inter AS (SELECT c.doc_id, c.bench_id, count(*) AS shared FROM cand c " +
      "JOIN tr t ON t.doc_id = c.doc_id " +
      "JOIN be b ON b.bench_id = c.bench_id AND b.h = t.h GROUP BY 1, 2), " +
      "pairs AS (SELECT i.doc_id, i.bench_id, " +
      "shared * 1.0 / bsz AS c FROM inter i JOIN bsz USING (bench_id) " +
      s"WHERE shared * 1.0 / bsz >= $threshold) " +
      "SELECT doc_id, count(*) AS n_bench_contained, " +
      "max(c) AS max_containment FROM pairs GROUP BY doc_id"

  /** DuckDB twin of [[Similarity.hyperplane]]: ±1 weight list for
    * sign-LSH plane p, seeded by the same md5 keys. */
  private def hyperplaneSql(p: Int): String =
    "list_transform(range(0, len(embedding)), j -> CASE WHEN " +
      s"(CAST('0x' || substr(md5('hp' || $p || '_' || j), 1, 15) AS BIGINT) & 1) = 0 " +
      "THEN 1.0 ELSE -1.0 END)"

  /** Sign-LSH banded near-dup pipeline (DuckDB twin of
    * [[Similarity.nearDupPairs]]). */
  private def nearDupLshSql(planes: Int, bands: Int,
                            threshold: Double): String = {
    val bitsPerBand = planes / bands
    val bitCols = (0 until planes).map { p =>
      "CASE WHEN round(list_dot_product(CAST(embedding AS DOUBLE[]), " +
        s"${hyperplaneSql(p)}), 6) >= 0 THEN 1 ELSE 0 END AS bit$p"
    }.mkString(", ")
    val bandRows = (0 until bands).map { b =>
      val bucket = (0 until bitsPerBand)
        .map(i => s"bit${b * bitsPerBand + i} * ${1 << i}").mkString(" + ")
      s"SELECT vec_id, $b AS band_idx, $bucket AS bucket FROM sb"
    }.mkString(" UNION ALL ")
    val sim = "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
      "CAST(b.embedding AS DOUBLE[])), 6)"
    s"WITH sb AS (SELECT vec_id, embedding, $bitCols FROM embeddings), " +
      s"banded AS ($bandRows), " +
      "cand AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b " +
      "FROM banded l JOIN banded r ON l.band_idx = r.band_idx " +
      "AND l.bucket = r.bucket AND l.vec_id < r.vec_id) " +
      s"SELECT c.id_a, c.id_b, $sim AS sim FROM cand c " +
      "JOIN embeddings a ON a.vec_id = c.id_a " +
      "JOIN embeddings b ON b.vec_id = c.id_b " +
      s"WHERE $sim >= $threshold"
  }

  /** The IVF probe stage shared by both ANN oracles: assignment,
    * query-cell probing, candidate ranking. Expects a preceding CTE
    * `cents(cent_id, cvec)`. */
  private def ivfBodySql(nprobe: Int, k: Int, nQueries: Int): String = {
    val csim = "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
      "CAST(c.cvec AS DOUBLE[])), 6)"
    "asgn AS (SELECT e.vec_id, e.embedding, c.cent_id, " +
      s"row_number() OVER (PARTITION BY e.vec_id ORDER BY $csim DESC, c.cent_id ASC) AS rn " +
      "FROM embeddings e CROSS JOIN cents c), " +
      "ccells AS (SELECT vec_id AS match_id, embedding AS c_vec, cent_id AS cell " +
      "FROM asgn WHERE rn = 1), " +
      "qcells AS (SELECT vec_id AS query_id, embedding AS q_vec, cent_id AS cell " +
      s"FROM asgn WHERE vec_id < $nQueries AND rn <= $nprobe), " +
      "cand AS (SELECT q.query_id, cc.match_id, " +
      "round(list_cosine_similarity(CAST(q.q_vec AS DOUBLE[]), " +
      "CAST(cc.c_vec AS DOUBLE[])), 6) AS sim " +
      "FROM qcells q JOIN ccells cc USING (cell) WHERE cc.match_id <> q.query_id) " +
      "SELECT query_id, match_id, sim, rank FROM (" +
      "SELECT query_id, match_id, sim, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS rank FROM cand) " +
      s"WHERE rank <= $k"
  }

  /** IVF ANN pipeline (DuckDB twin of [[Similarity.ivfTopK]] with
    * stride-sampled centroids): identical cells, probing, and
    * tie-breaks. */
  /** DuckDB twin of [[Similarity.ivfPqTopK]] with stride centroids:
    * replays cell assignment, residuals, the sampled sub-codebooks
    * (first `codes` rows by id), the per-subspace argmin encode
    * (correlated ORDER BY dist, j — the same first-min tie-break as
    * Spark's array_position), reconstruction via m codebook joins,
    * and the 6-dp-rounded ADC scoring. */
  private def annPqSql(stride: Int, nprobe: Int, k: Int, nQueries: Int,
                       m: Int, codes: Int, dim: Int, rerank: Int): String = {
    val sub = dim / m
    val csim = "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
      "CAST(c.cvec AS DOUBLE[])), 6)"
    // lambdas may only reference columns of their OWN select (DuckDB
    // binds no correlated tables inside a lambda), so the encode is a
    // res × cb cross join with per-subspace distance columns, then a
    // windowed argmin per subspace — same first-min (dist, j) order
    // as Spark's array_position
    def dist(s: Int) =
      s"list_sum(list_transform(range(1, $sub + 1), i -> " +
        s"(rr.r[$s * $sub + i] - b.r[$s * $sub + i]) * " +
        s"(rr.r[$s * $sub + i] - b.r[$s * $sub + i]))) AS d$s"
    val dCols = (0 until m).map(dist).mkString(", ")
    val rCols = (0 until m).map(s =>
      s"row_number() OVER (PARTITION BY match_id ORDER BY d$s ASC, j ASC) AS r$s")
      .mkString(", ")
    val cCols = (0 until m).map(s =>
      s"max(CASE WHEN r$s = 1 THEN j END) AS c$s").mkString(", ")
    val joins = (0 until m).map(s => s"JOIN cb b$s ON b$s.j = e.c$s")
      .mkString(" ")
    val caseExpr = (0 until m).map(s => s"WHEN $s THEN b$s.r[i]").mkString(" ")
    s"WITH cents AS (SELECT vec_id AS cent_id, embedding AS cvec " +
      s"FROM embeddings WHERE vec_id % $stride = 0), " +
      "asgn AS (SELECT e.vec_id, e.embedding, c.cent_id, " +
      s"row_number() OVER (PARTITION BY e.vec_id ORDER BY $csim DESC, c.cent_id ASC) AS rn " +
      "FROM embeddings e CROSS JOIN cents c), " +
      "ccells AS (SELECT a.vec_id AS match_id, CAST(a.embedding AS DOUBLE[]) AS v, " +
      "a.cent_id AS cell, CAST(c.cvec AS DOUBLE[]) AS cent FROM asgn a " +
      "JOIN cents c ON c.cent_id = a.cent_id WHERE a.rn = 1), " +
      "res AS (SELECT match_id, cell, cent, " +
      "list_transform(range(1, len(v) + 1), i -> v[i] - cent[i]) AS r FROM ccells), " +
      "cb AS (SELECT row_number() OVER (ORDER BY match_id) AS j, r FROM " +
      s"(SELECT match_id, r FROM res ORDER BY match_id LIMIT $codes)), " +
      s"crossed AS (SELECT rr.match_id, b.j, $dCols FROM res rr CROSS JOIN cb b), " +
      s"rnk AS (SELECT match_id, j, $rCols FROM crossed), " +
      s"enc AS (SELECT match_id, $cCols FROM rnk GROUP BY match_id), " +
      s"recon AS (SELECT e.match_id, rr.cell, list_transform(range(1, $dim + 1), i -> " +
      s"rr.cent[i] + CASE CAST((i - 1) // $sub AS INT) $caseExpr END) AS a " +
      s"FROM enc e JOIN res rr USING (match_id) $joins), " +
      "qcells AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec, " +
      s"cent_id AS cell FROM asgn WHERE vec_id < $nQueries AND rn <= $nprobe), " +
      "cand AS (SELECT qc.query_id, rc.match_id, qc.q_vec, " +
      "round(list_cosine_similarity(qc.q_vec, rc.a), 6) AS sim " +
      "FROM qcells qc JOIN recon rc USING (cell) WHERE rc.match_id <> qc.query_id), " +
      // two-stage: PQ sims shortlist `rerank` per query, then only
      // those re-score against the full-precision vector
      "shortl AS (SELECT query_id, match_id, q_vec FROM (" +
      "SELECT query_id, match_id, q_vec, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS prank FROM cand) " +
      s"WHERE prank <= $rerank), " +
      "rr2 AS (SELECT s.query_id, s.match_id, " +
      "round(list_cosine_similarity(s.q_vec, cc.v), 6) AS sim " +
      "FROM shortl s JOIN ccells cc ON cc.match_id = s.match_id) " +
      "SELECT query_id, match_id, sim, rank FROM (" +
      "SELECT query_id, match_id, sim, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS rank FROM rr2) " +
      s"WHERE rank <= $k"
  }

  private def ivfSql(stride: Int, nprobe: Int, k: Int,
                     nQueries: Int): String =
    s"WITH cents AS (SELECT vec_id AS cent_id, embedding AS cvec " +
      s"FROM embeddings WHERE vec_id % $stride = 0), " +
      ivfBodySql(nprobe, k, nQueries)

  /** DuckDB twin of `kmeansCentroids` + `ivfTopK`: replays the
    * deterministic Lloyd training — stride init, argmax assignment on
    * the 6-dp-rounded cosine (ties to the lower centroid id),
    * 9-dp-rounded cell means, empty cells keep their previous
    * centroid — as `iters` unrolled CTE rounds, then runs the same
    * IVF probe as [[ivfBodySql]]. Rounding at 6/9 dp is what makes
    * the replay engine-exact: it absorbs summation-order ulp wobble
    * on both sides, and both engines round half away from zero. */
  /** The unrolled deterministic Lloyd training as a `WITH` prefix
    * ending in `cents(cent_id, cvec)` — shared by the kmeans-ANN and
    * SemDeDup oracles so both replay the Scala trainer exactly. */
  private def kmeansCentsSql(kc: Int, iters: Int): String = {
    val init =
      s"st AS (SELECT greatest(1, count(*) // $kc) AS s FROM embeddings), " +
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, " +
        "CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings " +
        s"WHERE vec_id % (SELECT s FROM st) = 0 ORDER BY vec_id LIMIT $kc), "
    val rounds = (1 to iters).map { i =>
      val prev = s"c${i - 1}"
      s"a$i AS (SELECT e.vec_id, e.embedding, c.cent_id, " +
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) DESC, " +
        s"c.cent_id ASC) AS rn FROM embeddings e CROSS JOIN $prev c), " +
        // parallel unnests zip: (pos, element) rows, DuckDB's posexplode
        s"x$i AS (SELECT cent_id, unnest(generate_series(1, len(embedding))) AS pos, " +
        s"unnest(CAST(embedding AS DOUBLE[])) AS x FROM a$i WHERE rn = 1), " +
        s"m$i AS (SELECT cent_id, list(m ORDER BY pos) AS v FROM " +
        s"(SELECT cent_id, pos, round(avg(x), 9) AS m FROM x$i GROUP BY cent_id, pos) " +
        "GROUP BY cent_id), " +
        s"c$i AS (SELECT c.cent_id, coalesce(m.v, c.cvec) AS cvec " +
        s"FROM $prev c LEFT JOIN m$i m USING (cent_id))"
    }.mkString(", ")
    // the Scala trainer emits FLOAT centroids — replicate the narrowing
    "WITH " + init + rounds +
      s", cents AS (SELECT cent_id, CAST(cvec AS FLOAT[]) AS cvec FROM c$iters), "
  }

  private def annKmeansSql(kc: Int, iters: Int, nprobe: Int, k: Int,
                           nQueries: Int): String =
    kmeansCentsSql(kc, iters) + ivfBodySql(nprobe, k, nQueries)

  /** DuckDB twin of [[Similarity.ivfResidualTopK]] over kmeans cells:
    * replays training, the argmax assignment, the residual against
    * the assigned centroid, the symmetric int8 quantization
    * (127/max|r|, half-up), the `centroid + q/scale` reconstruction,
    * and the probe/rank — identical arithmetic end to end. */
  private def annResidualSql(kc: Int, iters: Int, nprobe: Int, k: Int,
                             nQueries: Int): String = {
    val csim = "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
      "CAST(c.cvec AS DOUBLE[])), 6)"
    kmeansCentsSql(kc, iters) +
      "asgn AS (SELECT e.vec_id, e.embedding, c.cent_id, " +
      s"row_number() OVER (PARTITION BY e.vec_id ORDER BY $csim DESC, c.cent_id ASC) AS rn " +
      "FROM embeddings e CROSS JOIN cents c), " +
      "ccells AS (SELECT a.vec_id AS match_id, CAST(a.embedding AS DOUBLE[]) AS v, " +
      "a.cent_id AS cell, CAST(c.cvec AS DOUBLE[]) AS cent FROM asgn a " +
      "JOIN cents c ON c.cent_id = a.cent_id WHERE a.rn = 1), " +
      "res AS (SELECT match_id, cell, cent, " +
      "list_transform(range(1, len(v) + 1), i -> v[i] - cent[i]) AS r FROM ccells), " +
      "sc AS (SELECT match_id, cell, cent, r, 127.0 / greatest(" +
      "list_aggregate(list_transform(r, y -> abs(y)), 'max'), 1e-30) AS scale FROM res), " +
      "qz AS (SELECT match_id, cell, cent, scale, " +
      "list_transform(r, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q FROM sc), " +
      "rec AS (SELECT match_id, cell, " +
      "list_transform(range(1, len(q) + 1), i -> cent[i] + q[i] / scale) AS a FROM qz), " +
      "qcells AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec, " +
      s"cent_id AS cell FROM asgn WHERE vec_id < $nQueries AND rn <= $nprobe), " +
      "cand AS (SELECT qc.query_id, rc.match_id, " +
      "round(list_cosine_similarity(qc.q_vec, rc.a), 6) AS sim " +
      "FROM qcells qc JOIN rec rc USING (cell) WHERE rc.match_id <> qc.query_id) " +
      "SELECT query_id, match_id, sim, rank FROM (" +
      "SELECT query_id, match_id, sim, row_number() OVER " +
      "(PARTITION BY query_id ORDER BY sim DESC, match_id ASC) AS rank FROM cand) " +
      s"WHERE rank <= $k"
  }

  /** DuckDB twin of [[Similarity.semDedup]] over kmeans cells: same
    * trained centroids, same argmax assignment expression as
    * [[ivfBodySql]], within-cell pairs, keep-min-id. */
  private def semDedupSql(kc: Int, iters: Int, tau: Double): String =
    kmeansCentsSql(kc, iters) +
      "asgn AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cent_id, " +
      "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
      "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
      "CAST(c.cvec AS DOUBLE[])), 6) DESC, c.cent_id ASC) AS rn " +
      "FROM embeddings e CROSS JOIN cents c), " +
      "cells AS (SELECT vec_id, v, cent_id FROM asgn WHERE rn = 1), " +
      "prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "round(list_cosine_similarity(a.v, b.v), 6) AS sim " +
      "FROM cells a JOIN cells b ON a.cent_id = b.cent_id " +
      "AND a.vec_id < b.vec_id) " +
      "SELECT id_b AS vec_id, min(id_a) AS dup_of, arg_min(sim, id_a) AS sim " +
      s"FROM prs WHERE sim >= $tau GROUP BY 1"

  /** DuckDB twin of [[Similarity.semDedup]] WITH the hot-cell cap:
    * replays the deterministic md5 id-split into ~cap blocks and the
    * min-id representative pass exactly (duplicate pairs across the
    * two branches are harmless under min/arg_min, same as Spark). */
  private def semDedupCappedSql(kc: Int, iters: Int, tau: Double,
                                cap: Int): String =
    kmeansCentsSql(kc, iters) +
      "asgn AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cent_id, " +
      "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
      "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
      "CAST(c.cvec AS DOUBLE[])), 6) DESC, c.cent_id ASC) AS rn " +
      "FROM embeddings e CROSS JOIN cents c), " +
      "cells0 AS (SELECT vec_id, v, cent_id FROM asgn WHERE rn = 1), " +
      "cn AS (SELECT cent_id, count(*) AS cell_n FROM cells0 GROUP BY 1), " +
      "cl AS (SELECT c.vec_id, c.v, c.cent_id, n.cell_n, " +
      s"CASE WHEN n.cell_n > $cap THEN " +
      "CAST('0x' || substr(md5(CAST(c.vec_id AS VARCHAR)), 1, 15) AS BIGINT) " +
      s"% CAST(ceil(n.cell_n / CAST($cap AS DOUBLE)) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END AS blk " +
      "FROM cells0 c JOIN cn n USING (cent_id)), " +
      "sp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "round(list_cosine_similarity(a.v, b.v), 6) AS sim " +
      "FROM cl a JOIN cl b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id " +
      s"WHERE a.cell_n <= $cap), " +
      "bp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "round(list_cosine_similarity(a.v, b.v), 6) AS sim " +
      "FROM cl a JOIN cl b ON a.cent_id = b.cent_id AND a.blk = b.blk " +
      s"AND a.vec_id < b.vec_id WHERE a.cell_n > $cap), " +
      s"rp0 AS (SELECT cent_id, min(vec_id) AS rep FROM cl WHERE cell_n > $cap GROUP BY 1), " +
      "rp AS (SELECT r.rep AS id_a, m.vec_id AS id_b, " +
      "round(list_cosine_similarity(rv.v, m.v), 6) AS sim " +
      "FROM rp0 r JOIN cl rv ON rv.cent_id = r.cent_id AND rv.vec_id = r.rep " +
      "JOIN cl m ON m.cent_id = r.cent_id AND m.vec_id > r.rep), " +
      "prs AS (SELECT * FROM sp UNION ALL SELECT * FROM bp UNION ALL SELECT * FROM rp) " +
      "SELECT id_b AS vec_id, min(id_a) AS dup_of, arg_min(sim, id_a) AS sim " +
      s"FROM prs WHERE sim >= $tau GROUP BY 1"

  def oracleSql: Map[String, String] = {
    val mhMins = mhMinsSql
    val bandRows = bandRowsSql(MINHASH_BANDS)
    val simhashBitSums = (0 until 32)
      .map(b => s"sum(CASE WHEN (h & ${1L << b}) <> 0 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val simhashAssemble = (0 until 32)
      .map(b => s"CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    // gaps-and-islands sessionization — oracle for BOTH the batch
    // session_window query and its streaming twin (same merged result)
    val sessionGaiSql =
      "WITH e AS (SELECT user_id, ts, value, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), " +
        "m AS (SELECT user_id, ts, value, CASE WHEN prev IS NULL OR " +
        "ts - prev >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s FROM e), " +
        "s AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT user_id, CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start, " +
        "count(*) AS n_events, sum(value) AS sum_value FROM s GROUP BY user_id, sid"

    // append-mode twin: only sessions the FINAL watermark (max ts −
    // 10 min delay) can close — session end (last event + 10 min gap)
    // at-or-before the watermark. No fixture session sits exactly on
    // the boundary at any SF (checked 0.001/0.01/0.1), so <= vs <
    // cannot flip the result.
    val sessionAppendSql =
      "WITH e AS (SELECT user_id, ts, value, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), " +
        "m AS (SELECT user_id, ts, value, CASE WHEN prev IS NULL OR " +
        "ts - prev >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s FROM e), " +
        "s AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m), " +
        "sess AS (SELECT user_id, " +
        "CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start, " +
        "count(*) AS n_events, sum(value) AS sum_value, max(ts) AS last_ts " +
        "FROM s GROUP BY user_id, sid), " +
        "wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events) " +
        "SELECT user_id, session_start, n_events, sum_value FROM sess, wm " +
        "WHERE last_ts + INTERVAL 10 MINUTE <= w"

    Map(
      "a3_group_agg" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          "sum(l_extendedprice) AS sum_base_price, " +
          "sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price, " +
          "avg(l_quantity) AS avg_qty, count(*) AS count_order " +
          "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
      "a4_distinct_agg" ->
        ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
          "count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows " +
          "FROM lineitem GROUP BY l_returnflag"),
      "a5_rollup" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          "count(*) AS n_rows FROM lineitem " +
          "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
      "a6_pivot" ->
        ("SELECT l_returnflag, " +
          "sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f, " +
          "sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o " +
          "FROM lineitem GROUP BY l_returnflag"),
      "a7_having" ->
        ("SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend " +
          "FROM orders GROUP BY o_custkey HAVING count(*) >= 12"),
      "a8_cube" ->
        ("SELECT l_returnflag, l_linestatus, " +
          "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
          "sum(l_quantity) AS sum_qty, count(*) AS n_rows " +
          "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),
      // decimal co-moments + double formula over identical operands —
      // mirrors the Spark side exactly (see queries map)
      "x_stats_corr" ->
        ("WITH m AS (SELECT event_type, count(*) AS n, " +
          "sum(CAST(value AS DECIMAL(18,6))) AS sx, " +
          "sum(CAST(hour(ts) AS DECIMAL(18,6))) AS sy, " +
          "sum(CAST(value AS DECIMAL(18,6)) * CAST(hour(ts) AS DECIMAL(18,6))) AS sxy, " +
          "sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sxx, " +
          "sum(CAST(hour(ts) AS DECIMAL(18,6)) * CAST(hour(ts) AS DECIMAL(18,6))) AS syy " +
          "FROM events GROUP BY 1), " +
          // zero-variance guard mirrors the Spark side: explicit NULL
          // on a zero denominator (DuckDB would emit Inf/NaN)
          "f AS (SELECT event_type, n, " +
          "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num, " +
          "sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
          "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den " +
          "FROM m) " +
          "SELECT event_type, n, " +
          "CASE WHEN den = 0 THEN NULL ELSE num / den END " +
          "AS corr_value_hour FROM f"),
      // ranks are tie-free (o_orderkey in the ordering), so every
      // column is a deterministic function of the sorted sequence
      "x_window_rank" ->
        ("SELECT o_orderkey, o_orderstatus, o_totalprice, " +
          "CAST(rank() OVER w AS BIGINT) AS rnk, " +
          "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
          "percent_rank() OVER w AS pct_rank, " +
          "cume_dist() OVER w AS cume " +
          "FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' " +
          "WINDOW w AS (PARTITION BY o_orderstatus " +
          "ORDER BY o_totalprice DESC, o_orderkey ASC)"),
      // the oracle joins the raw tables — the bucketed layout is a
      // physical re-materialization, not a transformation
      "x_bucketed_join" ->
        ("SELECT c_mktsegment, count(*) AS n_orders, " +
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_mktsegment"),
      "x_pipeline_clean" ->
        ("WITH gated AS (SELECT doc_id, text, lang, " + qualitySql + " AS q " +
          "FROM documents WHERE (" + qualitySql + ") >= 0.55), " +
          "keep AS (SELECT min(doc_id) AS doc_id FROM (SELECT doc_id, " +
          "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM gated) " +
          "GROUP BY fp) " +
          "SELECT lang, count(*) AS n_docs, avg(q) AS avg_quality " +
          "FROM gated JOIN keep USING (doc_id) GROUP BY lang"),
      // same gate + dedup as x_pipeline_clean, then quota-cap and
      // pack — the full corpus→training-sequences chain in one plan
      "x_pipeline_pack" ->
        ("WITH gated AS (SELECT doc_id, text, source, " + qualitySql + " AS q " +
          "FROM documents WHERE (" + qualitySql + ") >= 0.55), " +
          "keep AS (SELECT min(doc_id) AS doc_id FROM (SELECT doc_id, " +
          "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM gated) " +
          "GROUP BY fp), " +
          "capped AS (SELECT doc_id, source, text FROM (" +
          "SELECT g.doc_id, g.source, g.text, row_number() OVER (" +
          s"PARTITION BY g.source ORDER BY ${h60("g.doc_id::VARCHAR")} ASC, " +
          "g.doc_id ASC) AS rk FROM gated g JOIN keep USING (doc_id)) " +
          s"WHERE rk <= $QUOTA_PER_SOURCE), " +
          "t AS (SELECT doc_id, source, " +
          "CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens " +
          "FROM capped) " +
          "SELECT doc_id, source, n_tokens, " +
          "CAST(floor(coalesce(sum(n_tokens) OVER (" +
          "PARTITION BY source ORDER BY doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
          s"/ $PACK_BUDGET.0) AS BIGINT) AS bin FROM t"),
      "x_window_topn" ->
        ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
          "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
          "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
          "FROM orders) WHERE rn <= 3"),
      "x_text_stats" ->
        ("SELECT doc_id, " +
          "len(string_split_regex(lower(text), '\\s+')) AS n_tokens, " +
          "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subtokens, " +
          "length(text) AS n_chars_calc, " +
          "length(regexp_replace(lower(text), '\\s+', '', 'g')) * 1.0 / " +
          "greatest(len(string_split_regex(lower(text), '\\s+')) * 1.0, 1.0) AS avg_token_len, " +
          "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / " +
          "greatest(length(text) * 1.0, 1.0) AS punct_ratio, " +
          s"${hitsSql("en")} * 1.0 / " +
          "greatest(len(list_distinct(string_split_regex(lower(text), '\\s+'))) * 1.0, 1.0) AS stopword_ratio, " +
          "(least(length(text) * 1.0 / 200.0, 1.0) * 0.3) + " +
          "((1.0 - least((len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / " +
          "greatest(length(text) * 1.0, 1.0)) * 5.0, 1.0)) * 0.2) + " +
          s"(least((${hitsSql("en")} * 1.0 / " +
          "greatest(len(list_distinct(string_split_regex(lower(text), '\\s+'))) * 1.0, 1.0)) * 4.0, 1.0) * 0.3) + " +
          "(CASE WHEN (length(regexp_replace(lower(text), '\\s+', '', 'g')) * 1.0 / " +
          "greatest(len(string_split_regex(lower(text), '\\s+')) * 1.0, 1.0)) >= 3.0 " +
          "AND (length(regexp_replace(lower(text), '\\s+', '', 'g')) * 1.0 / " +
          "greatest(len(string_split_regex(lower(text), '\\s+')) * 1.0, 1.0)) <= 10.0 " +
          "THEN 1.0 ELSE 0.5 END * 0.2) AS quality " +
          "FROM documents"),
      "x_lang_id" ->
        ("SELECT doc_id, labeled_lang, CASE " +
          "WHEN en = 0 AND es = 0 AND de = 0 AND fr = 0 THEN 'und' " +
          "WHEN en >= es AND en >= de AND en >= fr THEN 'en' " +
          "WHEN es >= de AND es >= fr THEN 'es' " +
          "WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred_lang FROM (" +
          s"SELECT doc_id, lang AS labeled_lang, ${hitsSql("en")} AS en, " +
          s"${hitsSql("es")} AS es, ${hitsSql("de")} AS de, ${hitsSql("fr")} AS fr " +
          "FROM documents)"),
      "x_fingerprint" ->
        ("SELECT doc_id, md5(norm) AS fp, " +
          "md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\\s+'))), ' ')) AS bag_fp, " +
          "CASE WHEN length(norm) = 0 THEN 0 ELSE list_reduce(" +
          "list_transform(range(1, length(norm) + 1), i -> ord(substr(norm, i, 1))::BIGINT), " +
          "(a, b) -> (a * 1000003 + b) % 2147483647) END AS roll_fp FROM " +
          "(SELECT doc_id, text, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm " +
          "FROM documents)"),
      "x_redact" -> {
        val clean = "regexp_replace(regexp_replace(regexp_replace(text, " +
          s"'${Text.urlRe}', '[URL]', 'g'), " +
          s"'${Text.emailRe}', '[EMAIL]', 'g'), " +
          s"'${Text.phoneRe}', '[PHONE]', 'g')"
        s"SELECT doc_id, $clean AS clean_text, $clean <> text AS was_redacted " +
          "FROM documents"
      },
      "x_length_quantiles" ->
        ("SELECT lang, count(*) AS n_docs, " +
          "quantile_cont(n_chars, 0.5) AS p50_chars, " +
          "quantile_cont(n_chars, 0.9) AS p90_chars, " +
          "quantile_cont(n_chars, 0.99) AS p99_chars " +
          "FROM documents GROUP BY lang"),
      "x_dedup_exact" ->
        ("SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp, " +
          "min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY fp"),
      "x_dedup_incremental" ->
        ("WITH f AS (SELECT doc_id, lang, source, " +
          "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp " +
          "FROM documents), " +
          s"inc AS (SELECT * FROM f WHERE doc_id % $INCR_MOD = 0), " +
          s"seen AS (SELECT DISTINCT fp FROM f WHERE doc_id % $INCR_MOD <> 0), " +
          "kept AS (SELECT fp, min(doc_id) AS doc_id FROM inc GROUP BY fp) " +
          "SELECT i.doc_id, i.lang, i.source FROM inc i " +
          "JOIN kept k ON i.doc_id = k.doc_id " +
          // NOT EXISTS, not NOT IN: a NULL fingerprint (NULL text)
          // must behave like Spark's left_anti (NULL keys never
          // match), where NOT IN would nuke the whole result
          "WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fp = i.fp)"),
      "x_neardup_incremental" ->
        (s"WITH ${shingleToksCte(3)}, " +
          s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
          s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
          s"bb AS (SELECT * FROM bands WHERE doc_id % $INCR_MOD = 0), " +
          s"bc AS (SELECT * FROM bands WHERE doc_id % $INCR_MOD <> 0), " +
          // in-batch greedy keep-lowest-id, then the corpus probe —
          // the two drop paths of Dedup.incrementalNearDedup
          "dropin AS (SELECT DISTINCT r.doc_id FROM bb l JOIN bb r " +
          "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
          s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
          "dropx AS (SELECT DISTINCT l.doc_id FROM bb l JOIN bc r " +
          "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
          s"WHERE $estSql >= 0.5) " +
          "SELECT doc_id, lang, source FROM documents " +
          s"WHERE doc_id % $INCR_MOD = 0 " +
          "AND doc_id NOT IN (SELECT doc_id FROM dropin) " +
          "AND doc_id NOT IN (SELECT doc_id FROM dropx)"),
      "x_dedup_jaccard" -> jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8),
      // the same pair set as x_dedup_jaccard, rolled up to sources
      "x_dup_matrix" ->
        ("WITH prs AS (" + jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + ") " +
          "SELECT a.source AS source_a, b.source AS source_b, " +
          "CAST(count(*) AS BIGINT) AS n_pairs " +
          "FROM prs JOIN documents a ON a.doc_id = prs.id_a " +
          "JOIN documents b ON b.doc_id = prs.id_b " +
          "GROUP BY 1, 2"),
      "x_dedup_keep" ->
        ("WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (" +
          jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + ")), " +
          "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
          "UNION ALL SELECT id_b, id_a FROM pairs), " +
          "reach AS (SELECT src AS id, src AS r FROM edges " +
          "UNION SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id), " +
          "drops AS (SELECT id FROM (SELECT id, min(r) AS component " +
          "FROM reach GROUP BY id) WHERE id <> component) " +
          "SELECT doc_id, lang, source, n_chars FROM documents " +
          "WHERE doc_id NOT IN (SELECT id FROM drops)"),
      // transitive closure over the same pairs via a recursive CTE
      "x_dedup_components" ->
        ("WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (" +
          jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + ")), " +
          "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
          "UNION ALL SELECT id_b, id_a FROM pairs), " +
          "reach AS (SELECT src AS id, src AS r FROM edges " +
          "UNION SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id) " +
          "SELECT id, min(r) AS component FROM reach GROUP BY id"),
      // the same transitive closure rolled up twice: component →
      // cluster size → size histogram
      "x_dedup_sizes" ->
        ("WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (" +
          jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + ")), " +
          "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
          "UNION ALL SELECT id_b, id_a FROM pairs), " +
          "reach AS (SELECT src AS id, src AS r FROM edges " +
          "UNION SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id), " +
          "comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id), " +
          "cs AS (SELECT component, count(*) AS cluster_size FROM comp " +
          "GROUP BY 1) " +
          "SELECT cluster_size, count(*) AS n_clusters FROM cs GROUP BY 1"),
      // banded cross matches between the training and mod-5 bench
      // splits, rolled up per training doc — signatures replayed with
      // the same universal-hash literals as the near-dup family
      "x_decontaminate_fuzzy" ->
        (s"WITH ${shingleToksCte(3)}, " +
          s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
          s"bands AS ($bandRows), " +
          "cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, " +
          s"$estSql AS est FROM bands l " +
          "JOIN bands r ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
          s"WHERE l.doc_id % $FUZZY_DECON_MOD <> 0 " +
          s"AND r.doc_id % $FUZZY_DECON_MOD = 0 AND $estSql >= $FUZZY_DECON_EST) " +
          "SELECT id_a AS doc_id, count(*) AS n_bench_matches, " +
          "max(est) AS max_est_jaccard FROM cand GROUP BY 1"),
      "x_dedup_ngram" -> jaccardLshSql(shingleToksCte(3), NGRAM_BANDS, 0.5),
      // identical windowing (8-token shingles), 60-bit hash, df cap,
      // and distinct-per-doc set semantics as Dedup.substringSpanPairs
      "x_substring_dedup" ->
        (s"WITH ${shingleToksCte(SUBSTR_WINDOW)}, " +
          s"wh AS (SELECT DISTINCT doc_id, ${h60("tok")} AS h FROM toks), " +
          s"dfh AS (SELECT h FROM wh GROUP BY h HAVING count(*) <= $SUBSTR_DFCAP), " +
          "rare AS (SELECT w.doc_id, w.h FROM wh w JOIN dfh USING (h)) " +
          "SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS span_count " +
          "FROM rare l JOIN rare r ON l.h = r.h AND l.doc_id < r.doc_id " +
          s"GROUP BY 1, 2 HAVING count(*) >= $SUBSTR_MINSPANS"),
      "x_containment" -> containmentSql(shingleToksCte(3),
        CONTAIN_THRESHOLD, CONTAIN_DFCAP),
      "x_decontaminate_contain" -> containDeconSql(shingleToksCte(3),
        FUZZY_DECON_MOD, CONTAIN_DECON_THRESHOLD, CONTAIN_DFCAP),
      "x_minhash_sig" ->
        ("WITH toks AS (SELECT doc_id, tok FROM (" + toksSql + ") WHERE tok <> '') " +
          s"SELECT doc_id, $mhMins FROM toks GROUP BY doc_id"),
      "x_minhash_pairs" ->
        (s"WITH ${shingleToksCte(3)}, " +
          s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
          s"bands AS ($bandRows) " +
          "SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, " +
          s"$estSql AS est_jaccard " +
          "FROM bands l JOIN bands r ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
          s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.75"),
      "x_simhash" ->
        ("WITH toks AS (SELECT doc_id, tok FROM (" + toksSql + ") WHERE tok <> ''), " +
          s"h AS (SELECT doc_id, ${h60("tok")} AS h FROM toks), " +
          s"bitsums AS (SELECT doc_id, $simhashBitSums FROM h GROUP BY doc_id) " +
          s"SELECT doc_id, $simhashAssemble AS simhash FROM bitsums"),
      "x_simhash_pairs" ->
        (s"WITH ${shingleToksCte(3)}, " +
          s"h AS (SELECT doc_id, ${h60("tok")} AS h FROM toks), " +
          s"bitsums AS (SELECT doc_id, $simhashBitSums FROM h GROUP BY doc_id), " +
          s"sig AS (SELECT doc_id, $simhashAssemble AS simhash FROM bitsums) " +
          "SELECT l.doc_id AS id_a, r.doc_id AS id_b, " +
          "bit_count(xor(l.simhash, r.simhash))::INTEGER AS hamming FROM sig l JOIN sig r " +
          "ON l.doc_id < r.doc_id WHERE bit_count(xor(l.simhash, r.simhash)) <= 3"),
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
      "x_source_overlap" ->
        ("WITH gt AS (SELECT DISTINCT source AS g, tok FROM (" +
          "SELECT source, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok " +
          "FROM documents) WHERE tok <> ''), " +
          "sizes AS (SELECT g, count(*) AS n FROM gt GROUP BY g), " +
          "inter AS (SELECT a.g AS group_a, b.g AS group_b, count(*) AS n_common " +
          "FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g GROUP BY 1, 2) " +
          "SELECT group_a, group_b, n_common, " +
          "round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard " +
          "FROM inter " +
          "JOIN sizes sa ON sa.g = group_a " +
          "JOIN sizes sb ON sb.g = group_b"),
      "x_embed_neardup" -> nearDupLshSql(SIGNLSH_PLANES, SIGNLSH_BANDS, 0.45),
      "x_ann_ivf" -> ivfSql(ANN_CENT_STRIDE, ANN_NPROBE, 10, ANN_N_QUERIES),
      "x_ann_pq" -> annPqSql(ANN_CENT_STRIDE, ANN_NPROBE, 10, ANN_N_QUERIES,
        PQ_M, PQ_CODES, EMB_DIM, PQ_RERANK),
      "x_ann_kmeans" -> annKmeansSql(ANN_KMEANS_K, ANN_KMEANS_ITERS,
        ANN_KMEANS_NPROBE, 10, ANN_N_QUERIES),
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
      // the oracle aggregates the PARQUET table; the Spark side
      // aggregates the JSONL round-trip of it — equality proves the
      // sink+source pair is lossless (sums cast: DuckDB sum(BIGINT)
      // widens to HUGEINT)
      "x_source_jsonl" ->
        ("SELECT source, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(sum(length(text)) AS BIGINT) AS sum_text_chars " +
          "FROM documents GROUP BY 1"),
      // same oracle as the JSONL twin — every interchange format must
      // reproduce the parquet original exactly
      "x_source_gzip" ->
        ("SELECT source, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(sum(length(text)) AS BIGINT) AS sum_text_chars " +
          "FROM documents GROUP BY 1"),
      "x_source_avro" ->
        ("SELECT source, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(sum(length(text)) AS BIGINT) AS sum_text_chars " +
          "FROM documents GROUP BY 1"),
      "x_source_csv" ->
        ("SELECT source, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(sum(length(text)) AS BIGINT) AS sum_text_chars " +
          "FROM documents GROUP BY 1"),
      "x_source_orc" ->
        ("SELECT source, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "CAST(sum(length(text)) AS BIGINT) AS sum_text_chars " +
          "FROM documents GROUP BY 1"),
      "x_compaction" ->
        ("SELECT lang, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
          "FROM documents GROUP BY 1"),
      // replays the batch split: rows/chars over ALL docs (lossless
      // across the schema seam), the evolved-column count/sum over
      // batch 2 only (batch-1 rows must read as NULL, so they fall
      // out of count(col) exactly like the CASE here)
      "x_source_evolved" ->
        ("SELECT source, count(*) AS n_docs, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
          "count(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS n_evolved, " +
          "CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN " +
          "len(string_split_regex(lower(text), '\\s+')) END) AS BIGINT) AS sum_toks " +
          "FROM documents GROUP BY 1"),
      "x_window_tumbling" ->
        ("SELECT make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) AS w_start, " +
          "event_type, count(*) AS n, sum(value) AS sum_value FROM events " +
          "GROUP BY 1, 2"),
      "x_window_sliding" ->
        ("WITH expanded AS (" +
          "SELECT make_timestamp((epoch_ns(ts) // 1800000000000) * 1800000000) AS w_start, " +
          "event_type, value FROM events UNION ALL " +
          "SELECT make_timestamp(((epoch_ns(ts) // 1800000000000) - 1) * 1800000000) AS w_start, " +
          "event_type, value FROM events) " +
          "SELECT w_start, event_type, count(*) AS n, sum(value) AS sum_value " +
          "FROM expanded GROUP BY 1, 2"),
      "x_window_session" -> sessionGaiSql,
      // the streaming twin drains to the identical merged sessions
      "x_stream_session" -> sessionGaiSql,
      "x_stream_session_append" -> sessionAppendSql,
      // batch tumbling restricted to watermark-closeable windows
      // (window end <= max(ts) - watermark delay)
      "x_stream_tumbling_append" ->
        ("WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events) " +
          "SELECT make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) AS w_start, " +
          "event_type, count(*) AS n, sum(value) AS sum_value FROM events, wm " +
          "WHERE make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) " +
          "+ INTERVAL 1 HOUR <= wm.w " +
          "GROUP BY 1, 2"),
      // the oracle is the equivalent batch join — stream-static joins
      // are exactly-once over a finite fixture
      "x_stream_enrich" ->
        ("SELECT c_mktsegment, count(*) AS n_purchases, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
          "FROM events JOIN customer ON user_id = c_custkey " +
          "WHERE event_type = 'purchase' GROUP BY 1"),
      "x_stream_tumbling" ->
        ("SELECT make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) AS w_start, " +
          "event_type, count(*) AS n, sum(value) AS sum_value FROM events " +
          "GROUP BY 1, 2"),
      "x_stream_state" ->
        ("SELECT user_id, count(*) AS n_events, sum(value) AS sum_value " +
          "FROM events GROUP BY user_id"),
      "x_stream_sliding" ->
        ("WITH expanded AS (" +
          "SELECT make_timestamp((epoch_ns(ts) // 1800000000000) * 1800000000) AS w_start, " +
          "event_type, value FROM events UNION ALL " +
          "SELECT make_timestamp(((epoch_ns(ts) // 1800000000000) - 1) * 1800000000) AS w_start, " +
          "event_type, value FROM events) " +
          "SELECT w_start, event_type, count(*) AS n, sum(value) AS sum_value " +
          "FROM expanded GROUP BY 1, 2"),
      "x_stream_dedup" ->
        ("SELECT min(doc_id) AS doc_id, fp FROM (SELECT doc_id, " +
          "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp " +
          "FROM documents) GROUP BY fp"),
      // the sink's read-back must equal the batch dedup — the same
      // contract as x_stream_dedup, now proven THROUGH the parquet
      // files the foreachBatch sink wrote
      "x_stream_sink" ->
        ("SELECT min(doc_id) AS doc_id, fp FROM (SELECT doc_id, " +
          "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp " +
          "FROM documents) GROUP BY fp"),
      // same first-occurrence semantics within the horizon (the
      // fixture's ingest span fits inside it — see the query comment)
      "x_stream_dedup_bounded" ->
        ("SELECT min(doc_id) AS doc_id, fp FROM (SELECT doc_id, " +
          "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp " +
          "FROM documents) GROUP BY fp"),
      "x_topk_agg" ->
        ("SELECT query_id, match_id, sim, rank FROM (" +
          "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
          "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim, " +
          "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
          "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC, " +
          "c.vec_id ASC) AS rank " +
          "FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id " +
          "WHERE q.vec_id < 5) WHERE rank <= 10"),
      "x_multimodal_meta" ->
        ("SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS checksum, " +
          // coalesce mirrors the Spark side's NULL-text → empty-payload guard
          "CAST(64 + CAST('0x' || substr(md5(coalesce(text, '')), 1, 4) AS BIGINT) % 960 AS INTEGER) AS width, " +
          "CAST(64 + CAST('0x' || substr(md5(coalesce(text, '')), 5, 4) AS BIGINT) % 960 AS INTEGER) AS height " +
          "FROM documents"),
      // replays the md5-derived stub feature math (4 hex chars per
      // dim → [-1,1) on an exact 1e-3 grid); dim cast to INTEGER to
      // match Spark's int
      "x_multimodal_features" ->
        ("WITH h AS (SELECT doc_id, md5(text) AS hex FROM documents) " +
          "SELECT doc_id, CAST(d AS INTEGER) AS dim, " +
          "(CAST('0x' || substr(hex, CAST(4*d+1 AS BIGINT), 4) AS BIGINT) % 2000 - 1000) / 1000.0 AS feat " +
          s"FROM h, unnest(range(0, $MM_FEAT_DIMS)) AS u(d)"),
      // VARCHAR slicing here equals the Spark side's byte slicing
      // because the fixture text is pure ASCII (octet_length = length
      // on every row at every SF — asserted in ExtensionsSpec); empty
      // payloads still emit one zero-length frame on both sides
      "x_multimodal_frames" ->
        ("WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents) " +
          "SELECT doc_id, CAST(f AS INTEGER) AS frame_idx, " +
          s"CAST(least($MM_FRAME_BYTES, n - f*$MM_FRAME_BYTES) AS INTEGER) AS frame_len, " +
          s"md5(substring(text, CAST(f*$MM_FRAME_BYTES+1 AS BIGINT), $MM_FRAME_BYTES)) AS frame_md5 " +
          "FROM d, unnest(range(0, greatest(1, " +
          s"CAST(ceil(n/$MM_FRAME_BYTES.0) AS BIGINT)))) AS u(f)"),
      // real-PNG rows (doc_id % 5 = 0): true pixel dims are pure
      // functions of doc_id — the oracle predicts them WITHOUT seeing
      // the payload, so only a genuine ImageIO parse matches; opaque
      // rows replay the md5 stub math
      "x_multimodal_decode" ->
        (s"SELECT doc_id, CAST(8 + doc_id % 7 AS INTEGER) AS width, " +
          "CAST(5 + doc_id % 11 AS INTEGER) AS height " +
          s"FROM documents WHERE doc_id < $MM_DECODE_DOCS AND doc_id % 5 = 0 " +
          "UNION ALL " +
          "SELECT doc_id, " +
          // coalesce mirrors the Spark side's NULL-text → empty-payload guard
          "CAST(64 + CAST('0x' || substr(md5(coalesce(text, '')), 1, 4) AS BIGINT) % 960 AS INTEGER) AS width, " +
          "CAST(64 + CAST('0x' || substr(md5(coalesce(text, '')), 5, 4) AS BIGINT) % 960 AS INTEGER) AS height " +
          s"FROM documents WHERE doc_id < $MM_DECODE_DOCS AND doc_id % 5 <> 0"),
      "x_decontaminate" -> deconSql,
      // the Bloom variant is result-identical by construction (no
      // false negatives + exact confirm join) — same oracle
      "x_decontaminate_bloom" -> deconSql,
      "x_repetition" ->
        ("WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t " +
          "FROM documents), " +
          "sh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN " +
          "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) " +
          "ELSE [array_to_string(t, ' ')] END) AS g FROM t), " +
          "cnts AS (SELECT doc_id, g, count(*) AS c FROM sh WHERE g <> '' " +
          "GROUP BY doc_id, g) " +
          "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, " +
          "max(c) * 1.0 / sum(c) AS top_bigram_frac, " +
          "1.0 - count(*) * 1.0 / sum(c) AS dup_bigram_frac, " +
          "max(c) * 1.0 / sum(c) <= 0.08 AS keep " +
          "FROM cnts GROUP BY doc_id"),
      "x_sample_hash" ->
        ("SELECT doc_id, lang, source FROM documents " +
          s"WHERE ${h60("doc_id::VARCHAR")} % 100 < $SAMPLE_PCT"),
      // replays the exact weight rounding (6 dp), DECIMAL-exact
      // weight total, IEEE rate arithmetic, and md5 keep gate
      "x_mix_temperature" ->
        ("WITH t AS (SELECT doc_id, lang, source, " +
          "CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS nt " +
          "FROM documents), " +
          "g AS (SELECT source, sum(nt) AS n_g FROM t GROUP BY source), " +
          s"w AS (SELECT source, n_g, round(pow(CAST(n_g AS DOUBLE), $MIX_ALPHA), 6) AS w FROM g), " +
          "s AS (SELECT CAST(sum(CAST(w AS DECIMAL(24,6))) AS DOUBLE) AS wsum FROM w), " +
          "r AS (SELECT source, " +
          s"least(1.0, w / wsum * $MIX_BUDGET / n_g) AS keep_rate FROM w, s) " +
          "SELECT t.doc_id, t.lang, t.source FROM t JOIN r USING (source) " +
          s"WHERE ${h60("doc_id::VARCHAR")} % 10000 < floor(keep_rate * 10000)"),
      // keep-threshold replays the Spark arithmetic exactly:
      // floor(clamped-quality * (rate * granularity))
      "x_sample_weighted" ->
        ("SELECT doc_id, lang, source FROM documents " +
          s"WHERE ${h60("doc_id::VARCHAR")} % $WEIGHTED_GRAN < " +
          s"floor(least(greatest(($qualitySql), 0.0), 1.0) * " +
          s"${WEIGHTED_RATE * WEIGHTED_GRAN})"),
      "x_source_quality" ->
        ("SELECT source, count(*) AS n_docs, " +
          "avg(len(string_split_regex(lower(text), '\\s+')) * 1.0) AS avg_tokens, " +
          s"avg($qualitySql) AS avg_quality, " +
          s"CAST(sum(CASE WHEN ($qualitySql) >= $QUALITY_GATE THEN 1 ELSE 0 END) AS BIGINT) AS n_quality " +
          "FROM documents GROUP BY source"),
      "x_sample_quota" ->
        ("SELECT doc_id, source, lang, rk FROM (" +
          "SELECT doc_id, source, lang, row_number() OVER (" +
          s"PARTITION BY source ORDER BY ${h60("doc_id::VARCHAR")} ASC, " +
          "doc_id ASC) AS rk FROM documents) " +
          s"WHERE rk <= $QUOTA_PER_SOURCE"),
      "x_stream_join" ->
        ("SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts, " +
          "p.event_id AS purchase_id, p.ts AS purchase_ts, " +
          "p.value AS p_value " +
          "FROM events c JOIN events p ON c.event_type = 'click' " +
          "AND p.event_type = 'purchase' AND p.user_id = c.user_id " +
          "AND p.ts BETWEEN c.ts - INTERVAL 2 HOUR AND c.ts"),
      // LEFT OUTER twin: matched rows are the inner result verbatim;
      // a matchless click appears (NULL purchase columns) only when
      // the final watermark passed its ts — the no-match proof
      // Structured Streaming needs before a null emission, since a
      // purchase may join at-or-before the click's own timestamp.
      // The watermark replay is exact: Catalyst pushes the
      // event-type filter BELOW each side's watermark node, so each
      // side tracks only its own substream's max event time
      // (millisecond-floored, the engine's watermark unit) and the
      // global watermark is the MIN of the two sides minus the
      // 10-minute delay. Matchless clicks at/after that point never
      // get their proof on a finite stream and are excluded on both
      // engines (boundary verified empirically against the running query).
      "x_stream_join_outer" ->
        ("WITH wmc AS (SELECT make_timestamp(((epoch_ns(max(ts)) // 1000000) - 600000) * 1000) AS w " +
          "FROM events WHERE event_type = 'click'), " +
          "wmp AS (SELECT make_timestamp(((epoch_ns(max(ts)) // 1000000) - 600000) * 1000) AS w " +
          "FROM events WHERE event_type = 'purchase'), " +
          "wm AS (SELECT least((SELECT w FROM wmc), (SELECT w FROM wmp)) AS w) " +
          "SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts, " +
          "p.event_id AS purchase_id, p.ts AS purchase_ts, " +
          "p.value AS p_value " +
          "FROM events c LEFT JOIN events p ON " +
          "p.event_type = 'purchase' AND p.user_id = c.user_id " +
          "AND p.ts BETWEEN c.ts - INTERVAL 2 HOUR AND c.ts " +
          "WHERE c.event_type = 'click' AND (p.event_id IS NOT NULL " +
          "OR c.ts < (SELECT w FROM wm))"),
      "x_scd2" ->
        ("SELECT event_id, user_id, ts, value, ts AS valid_from, " +
          "lead(ts) OVER w AS valid_to, " +
          "CAST(row_number() OVER w AS BIGINT) AS version, " +
          "(lead(ts) OVER w IS NULL) AS is_current " +
          "FROM events WHERE event_type = 'purchase' " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"),
      // same versioned dim as a CTE, consumed by the point-in-time
      // interval predicate (half-open, NULL valid_to = current)
      "x_scd2_lookup" ->
        ("WITH dim AS (SELECT user_id, ts AS valid_from, " +
          "lead(ts) OVER w AS valid_to, " +
          "CAST(row_number() OVER w AS BIGINT) AS version, " +
          "value AS dim_value " +
          "FROM events WHERE event_type = 'purchase' " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
          "SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts, " +
          "d.version, d.dim_value, d.valid_from " +
          "FROM events c JOIN dim d ON c.event_type = 'click' " +
          "AND d.user_id = c.user_id AND c.ts >= d.valid_from " +
          "AND (d.valid_to IS NULL OR c.ts < d.valid_to)"),
      // the merged incremental aggregate must equal the FULL
      // recompute — so the oracle just aggregates everything
      "x_incremental_agg" ->
        ("SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
          "FROM events GROUP BY 1, 2"),
      // the 'changed' branch is structurally present on both sides
      // (fp inequality); the fixture's two snapshot views share text,
      // so it is empty here by construction
      "x_snapshot_diff" ->
        ("WITH v1 AS (SELECT doc_id, md5(text) AS fp1 FROM documents WHERE doc_id % 7 <> 0), " +
          "v2 AS (SELECT doc_id, md5(text) AS fp2 FROM documents WHERE doc_id % 5 <> 0) " +
          "SELECT CASE WHEN fp1 IS NULL THEN 'added' " +
          "WHEN fp2 IS NULL THEN 'removed' " +
          "WHEN fp1 <> fp2 THEN 'changed' ELSE 'kept' END AS status, " +
          "count(*) AS n_docs " +
          "FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id GROUP BY 1"),
      "o10_bag_ops" ->
        ("WITH hi AS (SELECT o_custkey FROM orders " +
          s"WHERE o_totalprice > $SETOPS_CUTOFF), " +
          "fin AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'), " +
          "ex AS (SELECT o_custkey, count(*) AS except_mult FROM " +
          "(SELECT * FROM hi EXCEPT ALL SELECT * FROM fin) GROUP BY 1), " +
          "ia AS (SELECT o_custkey, count(*) AS intersect_mult FROM " +
          "(SELECT * FROM hi INTERSECT ALL SELECT * FROM fin) GROUP BY 1) " +
          "SELECT coalesce(ex.o_custkey, ia.o_custkey) AS o_custkey, " +
          "CAST(coalesce(except_mult, 0) AS BIGINT) AS except_mult, " +
          "CAST(coalesce(intersect_mult, 0) AS BIGINT) AS intersect_mult " +
          "FROM ex FULL JOIN ia ON ex.o_custkey = ia.o_custkey"),
      "x_full_outer" ->
        ("WITH c AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks " +
          "FROM events WHERE event_type = 'click' GROUP BY 1), " +
          "p AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases " +
          "FROM events WHERE event_type = 'purchase' GROUP BY 1) " +
          "SELECT coalesce(c.day, p.day) AS day, " +
          "CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks, " +
          "CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases " +
          "FROM c FULL JOIN p ON c.day = p.day"),
      // epoch-micros ORDER BY gives both engines identical integer
      // frame bounds; RANGE peers (equal timestamps) are included on
      // both sides per the SQL standard
      "x_window_trailing" ->
        ("SELECT event_id, user_id, ts, value, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (" +
          "PARTITION BY user_id ORDER BY epoch_us(ts) " +
          "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
          "AS DOUBLE) AS trailing_1h " +
          "FROM events WHERE event_type = 'purchase'"),
      "x_window_firstlast" ->
        ("SELECT user_id, first_type, last_type, second_type, n_events FROM (" +
          "SELECT user_id, row_number() OVER w AS rn, " +
          "first_value(event_type) OVER wf AS first_type, " +
          "last_value(event_type) OVER wf AS last_type, " +
          "nth_value(event_type, 2) OVER wf AS second_type, " +
          "CAST(count(*) OVER wf AS BIGINT) AS n_events FROM events " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), " +
          "wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)" +
          ") WHERE rn = 1"),
      // generate_series is DuckDB's spine; the left join + coalesce 0
      // mirrors the Spark side exactly
      "x_gap_fill" ->
        ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, " +
          "count(*) AS n_raw FROM events GROUP BY 1, 2), " +
          // spine bounds derived from the data, mirroring the Spark side
          "b AS (SELECT min(CAST(ts AS DATE)) AS lo, " +
          "max(CAST(ts AS DATE)) AS hi FROM events), " +
          "spine AS (SELECT unnest(generate_series(lo, hi, " +
          "INTERVAL 1 DAY))::DATE AS day FROM b), " +
          "types AS (SELECT DISTINCT event_type FROM events) " +
          "SELECT s.day, t.event_type, " +
          "CAST(coalesce(d.n_raw, 0) AS BIGINT) AS n " +
          "FROM spine s CROSS JOIN types t " +
          "LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type"),
      "x_cohort_retention" ->
        ("WITH w AS (SELECT DISTINCT user_id, " +
          "CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS week " +
          "FROM events), " +
          "c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1) " +
          "SELECT c.cohort_week, w.week - c.cohort_week AS week_offset, " +
          "count(DISTINCT w.user_id) AS n_users " +
          "FROM w JOIN c USING (user_id) GROUP BY 1, 2"),
      // UNION ALL is the dialect-portable melt (Spark's unpivot KEEPS
      // null cells, so no null filter on either side)
      "o9_unpivot" ->
        ("WITH w AS (SELECT l_returnflag, " +
          "sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f, " +
          "sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o " +
          "FROM lineitem GROUP BY 1) " +
          "SELECT l_returnflag, 'qty_f' AS status_col, qty_f AS sum_qty FROM w " +
          "UNION ALL " +
          "SELECT l_returnflag, 'qty_o' AS status_col, qty_o AS sum_qty FROM w"),
      // ->> extracts the raw string, cast mirrors Spark's long cast;
      // sums cast back to BIGINT (DuckDB sum(BIGINT) is HUGEINT)
      // TRY_CAST mirrors Spark's null-on-invalid cast('long'): a plain
      // CAST would ABORT the oracle on a non-integer $.k instead of
      // mismatching gracefully
      "x_json_extract" ->
        ("SELECT event_type, count(*) AS n, " +
          "count(TRY_CAST(props->>'k' AS BIGINT)) AS n_k, " +
          "CAST(sum(TRY_CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k, " +
          "min(TRY_CAST(props->>'k' AS BIGINT)) AS min_k, " +
          "max(TRY_CAST(props->>'k' AS BIGINT)) AS max_k, " +
          "count(DISTINCT TRY_CAST(props->>'k' AS BIGINT)) AS distinct_k " +
          "FROM events GROUP BY 1"),
      "x_histogram" ->
        ("SELECT event_type, bucket, count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value, " +
          s"CAST(bucket * $HIST_WIDTH AS DOUBLE) AS bucket_lo " +
          "FROM (SELECT event_type, value, " +
          s"CAST(floor(value / $HIST_WIDTH) AS BIGINT) AS bucket FROM events) " +
          "GROUP BY event_type, bucket"),
      "x_asof_join" ->
        ("WITH p AS (SELECT user_id, ts, max(value) AS pv FROM events " +
          "WHERE event_type = 'purchase' GROUP BY user_id, ts), " +
          "c AS (SELECT event_id, user_id, ts FROM events " +
          "WHERE event_type = 'click') " +
          "SELECT c.user_id, c.ts, c.event_id, p.ts AS purchase_ts, " +
          "p.pv AS purchase_value " +
          "FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts"),
      "x_range_join" ->
        ("WITH e AS (SELECT event_id, user_id, ts FROM events " +
          "WHERE event_type = 'error'), " +
          "c AS (SELECT user_id, ts AS cts FROM events " +
          "WHERE event_type = 'click') " +
          "SELECT e.event_id, e.user_id, e.ts, count(c.cts) AS n_nearby " +
          s"FROM e LEFT JOIN c ON c.user_id = e.user_id AND c.cts BETWEEN " +
          s"e.ts - INTERVAL $RANGE_WINDOW_SEC SECOND AND " +
          s"e.ts + INTERVAL $RANGE_WINDOW_SEC SECOND " +
          "GROUP BY e.event_id, e.user_id, e.ts"),
      // the skew twins' oracles are the PLAIN aggregation/join — the
      // salted plans must be result-identical to the unsalted ones
      "x_skew_agg" ->
        (s"SELECT $skewKeySql AS skew_user, count(*) AS n_rows, " +
          "sum(value) AS sum_value, " +
          "min(value) AS min_value, max(value) AS max_value " +
          "FROM events GROUP BY 1"),
      "x_skew_join" ->
        (s"WITH e AS (SELECT event_id, $skewKeySql AS user_id, value " +
          "FROM events WHERE event_type = 'click') " +
          "SELECT e.event_id, e.user_id, c.c_name, e.value FROM e " +
          "JOIN customer c ON c.c_custkey = e.user_id"),
      "x_embed_centroid" ->
        ("SELECT label, i - 1 AS dim, " +
          "round(avg(embedding[i]::DOUBLE), 6) AS centroid, count(*) AS n " +
          "FROM embeddings CROSS JOIN " +
          s"(SELECT unnest(range(1, ${EMB_DIM + 1})) AS i) d " +
          "GROUP BY label, dim"),
      "x_tfidf" ->
        ("WITH toks AS (SELECT doc_id, " +
          "unnest(string_split_regex(lower(text), '\\s+')) AS term " +
          "FROM documents), " +
          "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks " +
          "WHERE term <> '' GROUP BY 1, 2), " +
          "d AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
          "n AS (SELECT count(DISTINCT doc_id) AS n FROM documents) " +
          "SELECT doc_id, rk, term, tfidf FROM (" +
          "SELECT tf.doc_id, tf.term, " +
          "round(tf.tf * ln((n.n + 1.0) / (d.df + 1.0)), 6) AS tfidf, " +
          "row_number() OVER (PARTITION BY tf.doc_id ORDER BY " +
          "round(tf.tf * ln((n.n + 1.0) / (d.df + 1.0)), 6) DESC, " +
          "tf.term ASC) AS rk " +
          s"FROM tf JOIN d USING (term), n) WHERE rk <= $TFIDF_TOPK"),
      // same tokenization as the Spark side; the vocab CTE replays the
      // deterministic top-k (count DESC, token ASC) so the boundary
      // ties resolve identically
      "x_vocab_coverage" ->
        ("WITH t AS (SELECT source, " +
          "unnest(string_split_regex(lower(text), '\\s+')) AS tok " +
          "FROM documents), " +
          "nz AS (SELECT source, tok FROM t WHERE tok <> ''), " +
          "v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM nz " +
          s"GROUP BY 1) ORDER BY c DESC, tok ASC LIMIT $VOCAB_K) " +
          "SELECT source, count(*) AS n_tokens, " +
          // BIGINT cast: DuckDB's sum(INTEGER) is HUGEINT, Spark's is long
          "CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab, " +
          "CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE) AS coverage " +
          "FROM nz LEFT JOIN v ON nz.tok = v.tok GROUP BY source"),
      "x_pmi" ->
        ("WITH t AS (SELECT string_split_regex(lower(text), '\\s+') AS t " +
          "FROM documents), " +
          "toks AS (SELECT unnest(t) AS tok FROM t), " +
          "u AS (SELECT tok, count(*) AS cu FROM toks WHERE tok <> '' " +
          "GROUP BY tok), " +
          "big AS (SELECT unnest(CASE WHEN len(t) >= 2 THEN " +
          "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) " +
          "ELSE [] END) AS g FROM t), " +
          "bc AS (SELECT g, count(*) AS pair_count FROM big GROUP BY g " +
          s"HAVING count(*) >= $PMI_MIN_COUNT), " +
          "nu AS (SELECT count(*) AS nu FROM toks WHERE tok <> ''), " +
          "nb AS (SELECT count(*) AS nb FROM big) " +
          "SELECT string_split(g, ' ')[1] AS term_a, " +
          "string_split(g, ' ')[2] AS term_b, pair_count, " +
          "round(ln((pair_count::DOUBLE * nu.nu * nu.nu) / " +
          "(nb.nb::DOUBLE * a.cu * b.cu)), 6) AS pmi " +
          "FROM bc, nu, nb " +
          "JOIN u a ON a.tok = string_split(g, ' ')[1] " +
          "JOIN u b ON b.tok = string_split(g, ' ')[2] " +
          "ORDER BY pmi DESC, term_a ASC, term_b ASC " +
          s"LIMIT $PMI_TOPK"),
      // bigram-LM score: same smoothing, same per-bigram 6-dp ln
      // rounding, same DECIMAL-exact mean as the Spark side
      "x_lm_score" ->
        ("WITH t AS (SELECT doc_id, " +
          "string_split_regex(lower(text), '\\s+') AS t FROM documents), " +
          "bgc AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM " +
          "(SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN " +
          "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) " +
          "ELSE [] END) AS g FROM t)), " +
          "cb AS (SELECT g, count(*) AS cb FROM bgc GROUP BY g), " +
          "cu AS (SELECT w1, count(*) AS cu FROM bgc GROUP BY w1), " +
          "v AS (SELECT count(DISTINCT tok) AS v FROM " +
          "(SELECT unnest(t) AS tok FROM t) WHERE tok <> '') " +
          "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
          "round(CAST(sum(CAST(round(ln((cb + 1.0) / (cu + v.v)), 6) " +
          "AS DECIMAL(12,6))) AS DOUBLE) / count(*), 6) AS lm_score " +
          "FROM bgc JOIN cb USING (g) JOIN cu USING (w1), v " +
          "GROUP BY doc_id"),
      // the oracle aggregates the raw events under the same date
      // restriction the pruned layout read applies
      "x_partition_prune" ->
        ("SELECT CAST(ts AS DATE) AS event_date, event_type, " +
          "count(*) AS n, sum(value) AS sum_value FROM events " +
          s"WHERE CAST(ts AS DATE) BETWEEN DATE '$PRUNE_FROM' AND DATE '$PRUNE_TO' " +
          "GROUP BY 1, 2"),
      // the oracle aggregates the raw events under the same 2-D
      // rectangle predicate the z-ordered layout read applies
      // (day_idx d = date 2024-01-01 + d days)
      "x_zorder_prune" ->
        ("SELECT event_type, count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
          "FROM events " +
          s"WHERE user_id BETWEEN $ZORDER_USER_LO AND $ZORDER_USER_HI " +
          s"AND CAST(ts AS DATE) BETWEEN DATE '2024-01-01' + $ZORDER_DAY_LO " +
          s"AND DATE '2024-01-01' + $ZORDER_DAY_HI " +
          "GROUP BY 1"),
      "x_pack_sequences" ->
        ("WITH t AS (SELECT doc_id, source, " +
          "CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens " +
          "FROM documents) " +
          "SELECT doc_id, source, n_tokens, " +
          "CAST(floor(coalesce(sum(n_tokens) OVER (" +
          "PARTITION BY source ORDER BY doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
          s"/ $PACK_BUDGET.0) AS BIGINT) AS bin FROM t"),
      "x_dedup_fuzzy" ->
        ("WITH n AS (SELECT doc_id, " +
          "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm " +
          "FROM documents) " +
          "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
          s"levenshtein(substr(a.norm, 1, $FUZZY_PREFIX), substr(b.norm, 1, $FUZZY_PREFIX)) AS dist " +
          s"FROM n a JOIN n b ON substr(a.norm, 1, $FUZZY_BLOCK) = substr(b.norm, 1, $FUZZY_BLOCK) " +
          "AND a.doc_id < b.doc_id " +
          s"WHERE levenshtein(substr(a.norm, 1, $FUZZY_PREFIX), substr(b.norm, 1, $FUZZY_PREFIX)) <= $FUZZY_MAXDIST"),
      "o7_set_ops" ->
        (s"(SELECT o_custkey FROM orders WHERE o_totalprice > $SETOPS_CUTOFF " +
          "UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') " +
          s"EXCEPT (SELECT o_custkey FROM orders WHERE o_totalprice > $SETOPS_CUTOFF " +
          "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"),
      "x_split_stratified" ->
        ("SELECT doc_id, source, CASE " +
          s"WHEN ${h60("doc_id::VARCHAR")} % 100 < $SPLIT_TRAIN THEN 'train' " +
          s"WHEN ${h60("doc_id::VARCHAR")} % 100 < ${SPLIT_TRAIN + SPLIT_VAL} THEN 'val' " +
          "ELSE 'test' END AS split FROM documents"),
      "x_chunk_docs" ->
        ("WITH t AS (SELECT doc_id, " +
          "string_split_regex(lower(text), '\\s+') AS t FROM documents), " +
          s"c AS (SELECT doc_id, t, CASE WHEN len(t) <= $CHUNK_SIZE THEN 1 " +
          s"ELSE CAST(ceil((len(t) - $CHUNK_SIZE) * 1.0 / $CHUNK_STRIDE) AS BIGINT) + 1 END AS nc FROM t), " +
          "e AS (SELECT doc_id, t, unnest(range(0, nc)) AS chunk_id FROM c), " +
          s"sl AS (SELECT doc_id, chunk_id, list_slice(t, chunk_id * $CHUNK_STRIDE + 1, " +
          s"chunk_id * $CHUNK_STRIDE + $CHUNK_SIZE) AS ch FROM e) " +
          "SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_chunk_tokens, " +
          "md5(array_to_string(ch, ' ')) AS chunk_fp FROM sl"),
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
      },
      "x_window_running" ->
        ("SELECT event_id, user_id, ts, value, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (" +
          "PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total, " +
          "CAST(CAST(value AS DECIMAL(18,6)) - lag(CAST(value AS DECIMAL(18,6))) OVER (" +
          "PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS delta " +
          "FROM events WHERE event_type = 'purchase'"),
      // profile: min-then-cast (never cast-then-min), timestamps
      // through an explicit second-precision format on both engines
      "x_profile_columns" -> {
        def block(c: String, mn: String, mx: String) =
          s"SELECT '$c' AS \"column\", n_rows, " +
            s"n_rows - nn_$c AS n_nulls, nd_$c AS n_distinct, " +
            s"$mn AS min_value, $mx AS max_value FROM s"
        "WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate").map { c =>
            s"CAST(count($c) AS BIGINT) AS nn_$c, " +
              s"CAST(count(DISTINCT $c) AS BIGINT) AS nd_$c, " +
              (if (c == "l_shipdate")
                s"strftime(min($c), '%Y-%m-%d %H:%M:%S') AS mn_$c, " +
                  s"strftime(max($c), '%Y-%m-%d %H:%M:%S') AS mx_$c"
              else s"CAST(min($c) AS VARCHAR) AS mn_$c, " +
                s"CAST(max($c) AS VARCHAR) AS mx_$c")
          }.mkString(", ") + " FROM lineitem) " +
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
            .map(c => block(c, s"mn_$c", s"mx_$c"))
            .mkString(" UNION ALL ")
      },
      "x_constraint_check" -> {
        val union = "SELECT 'not_null(o_custkey)' AS \"constraint\", " +
          "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS violations FROM orders " +
          "UNION ALL SELECT 'unique(o_orderkey)', " +
          "CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders " +
          "UNION ALL SELECT 'in_set(o_orderstatus)', " +
          "CAST(sum(CASE WHEN o_orderstatus IS NOT NULL " +
          "AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
          "UNION ALL SELECT 'check(totalprice_positive)', " +
          "CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) FROM orders " +
          "UNION ALL SELECT 'ref(o_custkey)', " +
          "CAST((SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL " +
          "AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)"
        s"SELECT \"constraint\", violations, violations = 0 AS passed FROM ($union)"
      },
      // the sketch phase only bounds the exact phase's work — the
      // graded output is the exact set, a plain GROUP BY/HAVING
      "x_heavy_hitters" ->
        ("WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) " +
          "AS item FROM documents) " +
          s"SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY item " +
          s"HAVING count(*) * $HH_K > (SELECT count(*) FROM t)"),
      "x_funnel" ->
        ("WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events " +
          "WHERE event_type = 'view' GROUP BY 1), " +
          "s1 AS (SELECT s0.user_id, min(t0) AS t0, " +
          "min(CASE WHEN e.ts >= t0 THEN e.ts END) AS t1 " +
          "FROM s0 LEFT JOIN events e ON e.user_id = s0.user_id " +
          "AND e.event_type = 'click' GROUP BY 1), " +
          "s2 AS (SELECT s1.user_id, min(t0) AS t0, min(t1) AS t1, " +
          "min(CASE WHEN e.ts >= t1 THEN e.ts END) AS t2 " +
          "FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
          "AND e.event_type = 'purchase' GROUP BY 1), " +
          funnelTailSql),
      // same chain with the 24h conversion window on each hop — the
      // CASE window mirrors the Spark side's unix_micros bound
      "x_funnel_window" ->
        ("WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events " +
          "WHERE event_type = 'view' GROUP BY 1), " +
          "s1 AS (SELECT s0.user_id, min(t0) AS t0, " +
          s"min(CASE WHEN e.ts >= t0 AND date_diff('microseconds', t0, e.ts) <= CAST($FUNNEL_GAP_SEC AS BIGINT) * 1000000 THEN e.ts END) AS t1 " +
          "FROM s0 LEFT JOIN events e ON e.user_id = s0.user_id " +
          "AND e.event_type = 'click' GROUP BY 1), " +
          "s2 AS (SELECT s1.user_id, min(t0) AS t0, min(t1) AS t1, " +
          s"min(CASE WHEN e.ts >= t1 AND date_diff('microseconds', t1, e.ts) <= CAST($FUNNEL_GAP_SEC AS BIGINT) * 1000000 THEN e.ts END) AS t2 " +
          "FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
          "AND e.event_type = 'purchase' GROUP BY 1), " +
          funnelTailSql),
      // the bloom-indexed layout is a physical re-materialization —
      // the oracle filters the raw table
      "x_bloom_prune" ->
        ("SELECT event_id, user_id, event_type, value " +
          s"FROM events WHERE event_id = $BLOOM_IDX_EVENT"),
      // same seed ⇒ byte-identical PNG ⇒ identical aHash ⇒ dist 0;
      // different seeds sit ~32 bits apart, far above the gate — the
      // pair set is pure doc_id arithmetic
      "x_multimodal_phash" ->
        (s"WITH d AS (SELECT doc_id FROM documents WHERE doc_id < $MM_PHASH_DOCS) " +
          "SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(0 AS BIGINT) AS dist " +
          "FROM d a JOIN d b ON a.doc_id < b.doc_id " +
          s"AND a.doc_id % $MM_PHASH_SEEDS = b.doc_id % $MM_PHASH_SEEDS"),
      "x_sessionize" ->
        ("WITH e AS (SELECT event_id, user_id, ts, " +
          "CASE WHEN lag(ts) OVER w IS NULL " +
          "OR date_diff('microseconds', lag(ts) OVER w, ts) > 600 * 1000000 " +
          "THEN 1 ELSE 0 END AS f FROM events " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
          "SELECT event_id, user_id, ts, " +
          "CAST(sum(f) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          "AS session_seq FROM e"),
      // the oracle's windowed row_number IS the single-partition
      // formulation denseIds exists to avoid
      "x_assign_ids" ->
        ("SELECT doc_id, source, " +
          "CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn " +
          "FROM documents"),
      "x_quantile_bins" ->
        ("WITH r AS (SELECT event_id, value, " +
          "row_number() OVER (ORDER BY value, event_id) AS rn, " +
          "count(*) OVER () AS n FROM events) " +
          s"SELECT CAST(floor((rn - 1) * $BIN_COUNT / n) AS BIGINT) AS bin, " +
          "CAST(count(*) AS BIGINT) AS n_rows, " +
          "min(value) AS min_value, max(value) AS max_value " +
          "FROM r GROUP BY 1"),
      // decimal-exact moments, double arithmetic in the SAME shape as
      // the Spark side (x_stats_corr's merge-order-stability trick)
      "x_feature_scale" ->
        ("WITH m AS (SELECT event_type AS g, count(*) AS n, " +
          "sum(CAST(value AS DECIMAL(18,6))) AS sx, " +
          "sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sxx " +
          "FROM events GROUP BY 1), " +
          "st AS (SELECT g, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean, " +
          "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "/ (CAST(n AS DOUBLE) - 1)) AS std FROM m) " +
          "SELECT event_id, event_type, value, " +
          "CASE WHEN std = 0 OR std IS NULL THEN NULL " +
          "ELSE (value - mean) / std END AS z " +
          "FROM events e JOIN st ON e.event_type = st.g"),
      // replays the change-feed construction, the last-writer-wins
      // window, and the apply in plain SQL. The streaming twin must
      // converge to the identical state (versioned merge is
      // batch-split-invariant), so it shares this oracle verbatim.
      "x_cdc_apply" -> cdcApplySql,
      "x_stream_cdc" -> cdcApplySql,
      // the oracle's theta-join IS the O(n²) formulation the grid
      // bucketing exists to avoid — correctness twin, not a plan twin
      "x_interval_join" ->
        (s"WITH a AS (SELECT event_id AS a_id, user_id, ts AS a_start, " +
          s"ts + INTERVAL $IVAL_A_MIN MINUTE AS a_end FROM events " +
          "WHERE event_type = 'purchase'), " +
          s"b AS (SELECT event_id AS b_id, user_id, ts AS b_start, " +
          s"ts + INTERVAL $IVAL_B_MIN MINUTE AS b_end FROM events " +
          "WHERE event_type = 'error') " +
          "SELECT a_id, b_id, a.user_id AS user_id, " +
          "date_diff('microseconds', greatest(a_start, b_start), " +
          "least(a_end, b_end)) AS overlap_us " +
          "FROM a JOIN b ON a.user_id = b.user_id " +
          "AND a_start < b_end AND b_start < a_end"),
      "x_source_divergence" ->
        ("WITH tk AS (SELECT source AS g, " +
          "unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents), " +
          "tk2 AS (SELECT g, tok FROM tk WHERE tok <> ''), " +
          "st AS (SELECT g, tok, count(*) AS c_st FROM tk2 GROUP BY 1, 2), " +
          "sg AS (SELECT g, sum(c_st) AS n_s FROM st GROUP BY 1), " +
          "tt AS (SELECT tok, sum(c_st) AS c_t FROM st GROUP BY 1), " +
          "tot AS (SELECT sum(c_st) AS n FROM st) " +
          "SELECT g AS source, CAST(count(*) AS BIGINT) AS n_tokens, " +
          "CAST(sum(CAST(round((c_st / n_s) * ln((c_st / n_s) / (c_t / n)), 6) " +
          "AS DECIMAL(18,6))) AS DOUBLE) AS kl " +
          "FROM st JOIN sg USING (g) JOIN tt USING (tok) CROSS JOIN tot " +
          "GROUP BY 1"),
      "x_novelty" ->
        (s"WITH ${shingleToksCte(NOVELTY_N)}, " +
          "fst AS (SELECT tok, min(doc_id) AS first_id FROM toks GROUP BY 1) " +
          "SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
          "CAST(sum(CASE WHEN f.first_id = t.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
          "CAST(sum(CASE WHEN f.first_id = t.doc_id THEN 1 ELSE 0 END) AS DOUBLE) " +
          "/ count(*) AS novelty " +
          "FROM toks t JOIN fst f USING (tok) GROUP BY 1"),
      // the window formulation IS the oracle — identical output, the
      // aggregator only changes the PLAN
      "x_topn_group_agg" ->
        ("SELECT user_id, rnk, event_id, value FROM (" +
          "SELECT user_id, CAST(row_number() OVER (PARTITION BY user_id " +
          "ORDER BY value DESC, event_id ASC) AS BIGINT) AS rnk, " +
          "event_id, value FROM events WHERE event_type = 'purchase') " +
          "WHERE rnk <= 3"),
      "x_ewma" -> {
        // weights inlined at full double round-trip precision; the
        // numerator/denominator chains are LEFT-associated on both
        // engines, so the doubles match bit-for-bit
        val terms = (0 until EWMA_DEPTH).map { j =>
          val wj = (EWMA_ALPHA * math.pow(1 - EWMA_ALPHA, j)).toString
          val l = if (j == 0) "value" else s"lag(value, $j) OVER w"
          (s"CASE WHEN $l IS NOT NULL THEN $wj * $l ELSE 0.0 END",
            s"CASE WHEN $l IS NOT NULL THEN $wj ELSE 0.0 END")
        }
        "SELECT event_id, user_id, ts, value, " +
          s"(${terms.map(_._1).mkString(" + ")}) / " +
          s"(${terms.map(_._2).mkString(" + ")}) AS ewma " +
          "FROM events WHERE event_type = 'purchase' " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
      },
      "x_impute" ->
        ("WITH e AS (SELECT event_id, event_type, " +
          "CASE WHEN event_id % 23 = 0 THEN NULL ELSE value END AS value " +
          "FROM events), " +
          "m AS (SELECT event_type AS g, " +
          "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / " +
          "CAST(count(value) AS DOUBLE) AS g_mean FROM e GROUP BY 1) " +
          "SELECT event_id, event_type, " +
          "coalesce(value, g_mean) AS value_imputed, " +
          "value IS NULL AS was_null " +
          "FROM e JOIN m ON e.event_type = m.g"),
      // exact interpolated percentiles on both engines (Spark
      // `percentile`, DuckDB `quantile_cont`) — same (n-1)*q rank
      // convention, so the gate computes on identical doubles
      "x_anomaly_mad" ->
        ("WITH med AS (SELECT event_type AS g, quantile_cont(value, 0.5) AS med " +
          "FROM events GROUP BY 1), " +
          "stats AS (SELECT g, min(med) AS med, " +
          "quantile_cont(abs(value - med), 0.5) AS mad " +
          "FROM events e JOIN med ON e.event_type = med.g GROUP BY g) " +
          "SELECT e.event_id, e.event_type, e.value FROM events e " +
          "JOIN stats s ON e.event_type = s.g " +
          s"WHERE abs(e.value - s.med) > $MAD_CUT * s.mad"),
      // exact twin of the sketch rollup (same tokenizer as the Spark
      // side: split on whitespace, duplicates irrelevant under
      // DISTINCT)
      "x_distinct_exact" ->
        ("WITH t AS (SELECT source, " +
          "unnest(string_split_regex(lower(text), '\\s+')) AS tok " +
          "FROM documents) " +
          "SELECT source, count(DISTINCT tok) AS n_distinct FROM t GROUP BY source " +
          "UNION ALL " +
          "SELECT '__all__' AS source, count(DISTINCT tok) AS n_distinct FROM t")
    )
  }
}
