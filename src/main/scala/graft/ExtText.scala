package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Text analysis: stats, language id, fingerprints, redaction,
  * tf-idf, PMI, LM scoring, vocabulary/token cardinality.
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtText {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // Gopher-style repetition metrics + keep verdict per doc
    "x_repetition" -> ((s, dir) =>
      Curation.repetitionMetrics(Tables.scan(s, dir, "documents"),
        "doc_id", "text")),


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


    // learned quality gate: multinomial Naive Bayes trained on the
    // corpus's own token-diversity extremes (weak supervision), then
    // scoring every doc — count-based, so the whole train+score
    // cycle replays as SQL aggregates with the lm-score decimal
    // discipline; completes heuristic → statistical → learned gating
    "x_quality_nb" -> ((s, dir) =>
      Curation.naiveBayesQuality(Tables.scan(s, dir, "documents"),
        "doc_id", "text")),


    // the MERGEABLE-model path: the NB sufficient statistics are
    // doc-additive (seed labels depend only on the doc itself), so
    // two splits train partial count frames that merge by grouped sum
    // — and the merged model must equal full retraining, which is why
    // this shares x_quality_nb's oracle verbatim
    "x_quality_nb_incremental" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      Curation.naiveBayesQualityIncremental(
        Seq(docs.filter(F.col("doc_id") % 2 === 0),
          docs.filter(F.col("doc_id") % 2 =!= 0)),
        "doc_id", "text")
    }),


    // per-source coverage of a fixed top-k corpus vocabulary — the
    // tokenizer-sizing dashboard (what fraction of each source's
    // token stream a k-entry vocab captures)
    "x_vocab_coverage" -> ((s, dir) =>
      Curation.vocabCoverage(Tables.scan(s, dir, "documents"),
        "source", "text", VOCAB_K)),


    // cross-source vocabulary overlap: token-set Jaccard between
    // every source pair — the mirrored-source audit before dedup
    "x_source_overlap" -> ((s, dir) =>
      Curation.vocabularyOverlap(Tables.scan(s, dir, "documents"),
        "source", "text")),

    // sketch-bounds-exact heavy hitters over the corpus token stream:
    // per-partition Misra-Gries candidates, broadcast semi-join,
    // exact HAVING-style trim — output is exact, so the oracle is a
    // plain GROUP BY/HAVING
    "x_heavy_hitters" -> ((s, dir) =>
      graft.operators.Quality.heavyHitters(
        Tables.scan(s, dir, "documents")
          .select(F.explode(Text.tokens(F.col("text"))).as("item")),
        "item", HH_K)),

    // per-source distribution drift: KL(source ‖ corpus) over token
    // frequencies — the domain-weighting signal next to
    // x_mix_temperature; decimal-summed 6-dp terms replay exactly
    // per-source token-distribution Shannon entropy: the diversity
    // dial next to the KL drift dial — a source whose entropy
    // collapses is repeating itself even when its KL looks stable;
    // 6-dp decimal-summed p*ln(p) terms, exact final negation
    "x_entropy" -> ((s, dir) =>
      Curation.sourceEntropy(Tables.scan(s, dir, "documents"),
        "source", "text")),

    "x_source_divergence" -> ((s, dir) =>
      Curation.sourceDivergence(Tables.scan(s, dir, "documents"),
        "source", "text")),

    // BM25 scoring for a fixed query-term set: one corpus scan (a
    // single explode feeds doc length + every term's tf in one
    // grouped pass), stats broadcast back, per-term contributions
    // 6-dp-rounded and decimal-summed — bit-stable scores
    "x_bm25" -> ((s, dir) =>
      graft.operators.Retrieval.bm25(Tables.scan(s, dir, "documents"),
        "doc_id", "text", BM25_TERMS, BM25_K1, BM25_B)),

    // index-served BM25 top-k: candidates from the posting lists of
    // the UNDER-CAP query terms (same relative df cap as
    // x_inverted_index), every term scores, global top-k as
    // TakeOrderedAndProject with the deterministic (score, id) order
    "x_bm25_topk" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val cap = docs.count() * INVIDX_DFCAP_PCT / 100L
      graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text",
        BM25_TERMS, cap, BM25_TOPK, BM25_K1, BM25_B)
    }),

    // inverted index with a RELATIVE df cap: rare-enough tokens carry
    // their full ascending posting list (comma-joined — portable
    // collation); head terms emit NULL postings + df only, the skew
    // guard a consumer's bloom/bitmap path takes over from
    "x_inverted_index" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val cap = docs.count() * INVIDX_DFCAP_PCT / 100L
      graft.operators.Retrieval.invertedIndex(docs, "doc_id", "text",
        cap.toInt)
    }),

    // the ENCODE half of BPE: train the merge list, then segment
    // every distinct word through it (12 codegen'd string replaces)
    // and roll subword counts up per document — the sequence-length
    // accounting a packing/budgeting stage consumes. The corpus
    // re-segments nothing: words join their per-word subword count.
    "x_bpe_encode" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", BPE_MERGES)._1
      graft.operators.Bpe.encodeCounts(docs, "doc_id", "text", merges)
    }),

    // distributed BPE tokenizer training: 12 most-frequent-pair merge
    // rounds over the distinct-word table (corpus scanned once), plus
    // the final subword vocabulary. Deterministic tie-breaks (count
    // desc, pair asc) and string-replace merge semantics let DuckDB
    // replay the rounds as 12 chained CTEs — see operators/Bpe.scala
    "x_bpe_train" -> ((s, dir) =>
      graft.operators.Bpe.trainReport(
        Tables.scan(s, dir, "documents"), "text", BPE_MERGES)),


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

  /** N chained BPE merge-round CTEs mirroring [[graft.operators.Bpe]]
    * exactly: same double-space symbol encoding, same greedy
    * left-to-right `replace` merge, same (count desc, pair asc)
    * tie-break. Round i picks its pair from w{i-1} and rewrites it
    * into w{i}; the final SELECT unions the merge rows with the
    * end-state vocabulary. */
  /** Byte-level base alphabet, mirroring [[graft.operators.Bpe
    * .byteSymstr]]: lowercase hex pairs of each token's UTF-8 bytes —
    * `hex(encode(...))` and the `(..)` pair-split behave identically
    * in both engines (hex strings have no multi-byte edge cases). */
  private def byteSymstrSql(col: String): String =
    s"' ' || trim(regexp_replace(lower(hex(encode($col))), " +
      "'(..)', '\\1  ', 'g')) || ' '"

  private def bpeSql(n: Int): String = {
    val base = s"w0 AS MATERIALIZED (SELECT ${byteSymstrSql("w")} AS symstr, " +
      "freq FROM (SELECT tok AS w, count(*) AS freq FROM " +
      "(SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok " +
      "FROM documents) WHERE tok <> '' GROUP BY tok))"
    // every w/m CTE is MATERIALIZED: DuckDB inlines CTEs by default,
    // and each w{i} is referenced twice (p{i+1} and w{i+1}) — inlined,
    // the 12-round chain expands 2^12 copies of w0 and never finishes
    val rounds = (1 to n).map { i =>
      s"p$i AS (SELECT u.pr[1] AS l, u.pr[2] AS r, " +
        "CAST(sum(u.freq) AS BIGINT) AS cnt FROM (" +
        "SELECT unnest(list_zip(syms[:len(syms)-1], syms[2:])) AS pr, freq " +
        s"FROM (SELECT string_split(trim(symstr), '  ') AS syms, freq " +
        s"FROM w${i - 1}) t) u GROUP BY 1, 2), " +
        s"m$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i " +
        "ORDER BY cnt DESC, l, r LIMIT 1), " +
        // LEFT JOIN ON TRUE: if the corpus ran out of pairs before
        // round i, m$i is empty and the round must be a NO-OP (the
        // Spark trainer stops early); a plain cross join would empty
        // the whole word table instead
        s"w$i AS MATERIALIZED (SELECT CASE WHEN l IS NULL THEN symstr " +
        "ELSE replace(symstr, ' ' || l || '  ' || r || ' ', " +
        s"' ' || l || r || ' ') END AS symstr, freq " +
        s"FROM w${i - 1} LEFT JOIN m$i ON true)"
    }.mkString(", ")
    val mergeRows = (1 to n).map(i =>
      s"SELECT 'merge' AS kind, CAST($i AS BIGINT) AS seq, l AS a, " +
        s"r AS b, cnt AS n FROM m$i").mkString(" UNION ALL ")
    s"WITH $base, $rounds $mergeRows UNION ALL " +
      "SELECT 'vocab' AS kind, CAST(0 AS BIGINT) AS seq, sym AS a, " +
      "CAST(NULL AS VARCHAR) AS b, CAST(sum(freq) AS BIGINT) AS n FROM " +
      s"(SELECT unnest(string_split(trim(symstr), '  ')) AS sym, freq " +
      s"FROM w$n) GROUP BY sym"
  }

  /** Encode twin: replays the same training rounds, then segments
    * each DISTINCT word through the merge list (one replace per
    * round, mirroring [[graft.operators.Bpe.encodeWords]]) and rolls
    * subword counts up per document. */
  private def bpeEncodeSql(n: Int): String = {
    val base = s"w0 AS MATERIALIZED (SELECT ${byteSymstrSql("w")} AS symstr, " +
      "freq FROM (SELECT tok AS w, count(*) AS freq FROM " +
      "(SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok " +
      "FROM documents) WHERE tok <> '' GROUP BY tok))"
    val rounds = (1 to n).map { i =>
      s"p$i AS (SELECT u.pr[1] AS l, u.pr[2] AS r, " +
        "CAST(sum(u.freq) AS BIGINT) AS cnt FROM (" +
        "SELECT unnest(list_zip(syms[:len(syms)-1], syms[2:])) AS pr, freq " +
        s"FROM (SELECT string_split(trim(symstr), '  ') AS syms, freq " +
        s"FROM w${i - 1}) t) u GROUP BY 1, 2), " +
        s"m$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i " +
        "ORDER BY cnt DESC, l, r LIMIT 1), " +
        // LEFT JOIN ON TRUE: if the corpus ran out of pairs before
        // round i, m$i is empty and the round must be a NO-OP (the
        // Spark trainer stops early); a plain cross join would empty
        // the whole word table instead
        s"w$i AS MATERIALIZED (SELECT CASE WHEN l IS NULL THEN symstr " +
        "ELSE replace(symstr, ' ' || l || '  ' || r || ' ', " +
        s"' ' || l || r || ' ') END AS symstr, freq " +
        s"FROM w${i - 1} LEFT JOIN m$i ON true)"
    }.mkString(", ")
    val segs = (1 to n).map { i =>
      s"seg$i AS MATERIALIZED (SELECT w, CASE WHEN l IS NULL THEN symstr " +
        "ELSE replace(symstr, ' ' || l || '  ' || r || ' ', " +
        s"' ' || l || r || ' ') END AS symstr " +
        s"FROM seg${i - 1} LEFT JOIN m$i ON true)"
    }.mkString(", ")
    s"WITH $base, $rounds, " +
      "words AS MATERIALIZED (SELECT doc_id, tok AS w FROM " +
      "(SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok " +
      "FROM documents) WHERE tok <> ''), " +
      "seg0 AS MATERIALIZED (SELECT DISTINCT w, " +
      s"${byteSymstrSql("w")} AS symstr " +
      s"FROM words), $segs, " +
      "cnt AS (SELECT w, CAST(len(string_split(trim(symstr), '  ')) " +
      s"AS BIGINT) AS ns FROM seg$n) " +
      "SELECT doc_id, count(*) AS n_words, " +
      "CAST(sum(ns) AS BIGINT) AS n_subwords " +
      "FROM words JOIN cnt USING (w) GROUP BY doc_id"
  }

  /** BM25 oracle mirroring [[graft.operators.Retrieval.bm25]] term by
    * term: every Scala-computed double constant (k1+1, 1−b) is
    * inlined at full round-trip precision, association order matches
    * the Column expression exactly, and the per-term 6-dp rounding +
    * decimal sum replays bit-for-bit. */
  /** Naive Bayes quality-gate oracle, shared by the full-retrain and
    * incremental-merge queries (the merged model must be identical):
    * replays seeding (token-diversity extremes), training (per-class
    * token counts + smoothed likelihoods, 6-dp ln, DECIMAL sums),
    * priors, and scoring. Spark inlines the one-row class stats as
    * literals; the oracle carries them in the cls CTE — identical
    * arithmetic either way. */
  private def nbOracleSql: String =
    "WITH wc AS (SELECT doc_id, tok, count(*) AS n FROM " +
      "(SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok " +
      "FROM documents) WHERE tok <> '' GROUP BY doc_id, tok), " +
      "g AS (SELECT doc_id, sum(n) AS nt, count(*) AS nd FROM wc " +
      "GROUP BY doc_id), " +
      "seeds AS (SELECT doc_id, CASE WHEN nd*1.0/nt >= 0.8 THEN 1 " +
      "ELSE 0 END AS label FROM g " +
      "WHERE nd*1.0/nt >= 0.8 OR nd*1.0/nt < 0.5), " +
      "stok AS (SELECT wc.doc_id, tok, n, label FROM wc " +
      "JOIN seeds USING (doc_id)), " +
      "cls AS (SELECT " +
      "CAST(sum(CASE WHEN label = 1 THEN n ELSE 0 END) AS BIGINT) AS tot1, " +
      "CAST(sum(CASE WHEN label = 0 THEN n ELSE 0 END) AS BIGINT) AS tot0, " +
      "count(DISTINCT tok) AS v, " +
      "count(DISTINCT CASE WHEN label = 1 THEN doc_id END) AS nd1, " +
      "count(DISTINCT doc_id) AS ndall FROM stok), " +
      "lik AS (SELECT tok, " +
      "CAST(round(ln((c1 + 1.0) / (tot1 + v)), 6) AS DECIMAL(12,6)) AS lp1, " +
      "CAST(round(ln((c0 + 1.0) / (tot0 + v)), 6) AS DECIMAL(12,6)) AS lp0 " +
      "FROM (SELECT tok, " +
      "sum(CASE WHEN label = 1 THEN n ELSE 0 END) AS c1, " +
      "sum(CASE WHEN label = 0 THEN n ELSE 0 END) AS c0 " +
      "FROM stok GROUP BY tok), cls), " +
      "pri AS (SELECT round(ln((nd1 + 1.0) / (ndall + 2.0)), 6) AS p1, " +
      "round(ln((ndall - nd1 + 1.0) / (ndall + 2.0)), 6) AS p0 FROM cls), " +
      "sc AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_toks_scored, " +
      "CAST(sum(n * lp1) AS DOUBLE) AS s1, " +
      "CAST(sum(n * lp0) AS DOUBLE) AS s0 " +
      "FROM wc JOIN lik USING (tok) GROUP BY doc_id) " +
      "SELECT doc_id, n_toks_scored, score_pos, score_neg, " +
      "CAST(CASE WHEN score_pos > score_neg THEN 1 ELSE 0 END AS BIGINT) " +
      "AS pred FROM (SELECT doc_id, n_toks_scored, " +
      "round(p1 + s1, 6) AS score_pos, round(p0 + s0, 6) AS score_neg " +
      "FROM sc, pri) t"

  /** Index-served BM25 top-k oracle: same per-term math as
    * [[bm25Sql]], candidates restricted to docs hitting an under-cap
    * term (the inverted index's own df rule), deterministic
    * (score desc, doc_id asc) rank cut at k. */
  private def bm25TopKSql(terms: Seq[String], k1: Double, b: Double,
                          pct: Long, k: Int): String = {
    val k1p1 = (k1 + 1.0).toString
    val oneMinusB = (1.0 - b).toString
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(", ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    def term(i: Int) =
      s"CAST(CASE WHEN tf$i > 0 THEN round(" +
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * " +
        s"CAST(tf$i AS DOUBLE) * $k1p1 / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * ($oneMinusB + " +
        s"$b * CAST(dl AS DOUBLE) / (CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)))), 6) " +
        s"ELSE 0.0 END AS DECIMAL(18,6))"
    val hits = terms.indices
      .map(i => s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    val cand = terms.indices
      .map(i => s"(tf$i > 0 AND df$i <= cap)").mkString(" OR ")
    "WITH t AS (SELECT doc_id, " +
      "unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents), " +
      s"g AS (SELECT doc_id, count(*) AS dl, $tfs FROM t GROUP BY doc_id), " +
      s"st AS (SELECT count(*) AS n, sum(dl) AS sl, $dfs, " +
      s"(SELECT count(*) * $pct // 100 FROM documents) AS cap FROM g), " +
      s"scored AS (SELECT doc_id, CAST($hits AS BIGINT) AS n_terms_hit, " +
      s"CAST(${terms.indices.map(term).mkString(" + ")} AS DOUBLE) AS score " +
      s"FROM g, st WHERE $cand) " +
      "SELECT doc_id, n_terms_hit, score, rank FROM " +
      "(SELECT doc_id, n_terms_hit, score, " +
      "CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) " +
      s"AS rank FROM scored) WHERE rank <= $k"
  }

  private def bm25Sql(terms: Seq[String], k1: Double, b: Double): String = {
    val k1p1 = (k1 + 1.0).toString
    val oneMinusB = (1.0 - b).toString
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf$i"
    }.mkString(", ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    def term(i: Int) =
      s"CAST(CASE WHEN tf$i > 0 THEN round(" +
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * " +
        s"CAST(tf$i AS DOUBLE) * $k1p1 / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * ($oneMinusB + " +
        s"$b * CAST(dl AS DOUBLE) / (CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)))), 6) " +
        s"ELSE 0.0 END AS DECIMAL(18,6))"
    val hits = terms.indices
      .map(i => s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    "WITH t AS (SELECT doc_id, " +
      "unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents), " +
      s"g AS (SELECT doc_id, count(*) AS dl, $tfs FROM t GROUP BY doc_id), " +
      s"st AS (SELECT count(*) AS n, sum(dl) AS sl, $dfs FROM g) " +
      s"SELECT doc_id, dl, CAST($hits AS BIGINT) AS n_terms_hit, " +
      s"CAST(${terms.indices.map(term).mkString(" + ")} AS DOUBLE) AS score " +
      s"FROM g, st WHERE $hits > 0"
  }

  def oracleSql: Map[String, String] = Map(
    "x_bpe_train" -> bpeSql(BPE_MERGES),

    "x_bm25" -> bm25Sql(BM25_TERMS, BM25_K1, BM25_B),

    "x_bm25_topk" -> bm25TopKSql(BM25_TERMS, BM25_K1, BM25_B,
      INVIDX_DFCAP_PCT, BM25_TOPK),

    "x_entropy" ->
      ("WITH t AS (SELECT source AS g, " +
        "unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents), " +
        "st AS (SELECT g, tok, count(*) AS c_st FROM t WHERE tok <> '' " +
        "GROUP BY g, tok), " +
        "sg AS (SELECT g, sum(c_st) AS n_s FROM st GROUP BY g) " +
        "SELECT st.g AS source, count(*) AS n_distinct, " +
        "CAST(max(n_s) AS BIGINT) AS n_tokens, " +
        "-CAST(sum(CAST(round((c_st / n_s) * ln(c_st / n_s), 6) " +
        "AS DECIMAL(18,6))) AS DOUBLE) AS entropy " +
        "FROM st JOIN sg USING (g) GROUP BY st.g"),

    "x_bpe_encode" -> bpeEncodeSql(BPE_MERGES),

    // distinct tokens per doc; the relative df cap uses integer
    // division on both engines (Scala Long /, DuckDB //)
    "x_inverted_index" ->
      (s"WITH t AS ($toksSql) " +
        "SELECT tok, count(*) AS df, " +
        s"CASE WHEN count(*) <= (SELECT count(*) * $INVIDX_DFCAP_PCT // 100 " +
        "FROM documents) THEN " +
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) END AS postings " +
        "FROM t WHERE tok <> '' GROUP BY tok"),
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

    // the incremental trainer must land on the identical model —
    // same oracle as the full retrain
    "x_quality_nb_incremental" -> nbOracleSql,

    // Naive Bayes quality gate: replays seeding (token-diversity
    // extremes), training (per-class token counts + smoothed
    // likelihoods, 6-dp ln, DECIMAL sums), priors, and scoring —
    // Spark inlines the one-row class stats as literals, the oracle
    // carries them in the cls CTE; identical arithmetic either way
    "x_quality_nb" -> nbOracleSql,

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

    // the sketch phase only bounds the exact phase's work — the
    // graded output is the exact set, a plain GROUP BY/HAVING
    "x_heavy_hitters" ->
      ("WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) " +
        "AS item FROM documents) " +
        s"SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY item " +
        s"HAVING count(*) * $HH_K > (SELECT count(*) FROM t)"),

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
