package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Corpus curation: decontamination, sampling, temperature
  * mixing, stratified splits, chunking, sequence packing, pipelines.
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtCuration {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // the INCREMENTAL twin of x_pipeline_pack — the standing-pipeline
    // north star: the corpus manifest + signature store hold the
    // even-id split (gated) as standing state, then ONE new batch
    // (the gated odd ids) flows gate → store-backed near-dedup
    // (batch-sized probes against the store, corpus text never
    // re-read) → manifest append → token packing of the admitted
    // docs. Output = the new batch's pack assignment with `source`
    // taken from the POST-APPEND manifest read, so a dropped or
    // double-counted append, a wrong dedup probe, or a wrong bin each
    // fails the hash. The oracle replays the whole chain.
    "x_pipeline_standing" -> ((s, dir) => {
      val corpusRoot = layoutDir(dir, "standing_corpus")
      val sigRoot = layoutDir(dir, "standing_sigs")
      deleteRec(new java.io.File(corpusRoot))
      deleteRec(new java.io.File(sigRoot))
      val docs = Tables.scan(s, dir, "documents")
      val gate = (df: DataFrame) =>
        df.withColumn("q", Text.qualityScore(F.col("text")))
          .filter(F.col("q") >= 0.55)
      val shingles3 = (c: org.apache.spark.sql.Column) =>
        Text.distinctShingles(c, 3)
      val g0 = gate(docs.filter(F.col("doc_id") % 2 === 0))
      val g1 = gate(docs.filter(F.col("doc_id") % 2 === 1))
      // standing state: manifest corpus + signature store of split 0
      graft.operators.ManifestTable.init(corpusRoot, Seq("doc_id"))
      graft.operators.ManifestTable.append(s, corpusRoot,
        g0.select("doc_id", "source"))
      graft.operators.SignatureStore.init(g0, "doc_id", "text",
        sigRoot, MINHASH_K, NGRAM_BANDS, shingles3)
      // the increment: gate -> store-backed near-dedup -> append -> pack.
      // kept1 feeds THREE siblings (corpus append, packing, the final
      // join) — unpinned, each re-runs the regex quality gate over the
      // split (guide: N sibling branches re-execute the lineage N
      // times); one localCheckpoint runs it once
      val kept1 = graft.operators.SignatureStore.ingest(s, sigRoot, g1,
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
        .localCheckpoint(true)
      graft.operators.ManifestTable.append(s, corpusRoot,
        kept1.select("doc_id", "source"))
      val packed = Curation.packSequences(kept1, "doc_id", "source",
        "text", PACK_BUDGET)
      graft.operators.ManifestTable.read(s, corpusRoot)
        .join(packed.drop("source"), Seq("doc_id"))
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


    // contiguous sequence packing: per-source token-budget bins —
    // the document→fixed-context-training-sequence assignment step
    "x_pack_sequences" -> ((s, dir) =>
      Curation.packSequences(Tables.scan(s, dir, "documents"),
        "doc_id", "source", "text", PACK_BUDGET)),


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
        "source", "text", QUALITY_GATE))
  )

  def oracleSql: Map[String, String] = Map(
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

    // incremental-chain replay: gated splits, the store's
    // incremental-drop rules (in-batch + cross-store, the x_retract
    // band algebra), then the pack window over ONLY the admitted
    // batch
    "x_pipeline_standing" ->
      (s"WITH ${shingleToksCte(3)}, " +
        s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
        s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
        "gq AS (SELECT doc_id FROM documents " +
        s"WHERE ($qualitySql) >= 0.55), " +
        "b0 AS (SELECT b.* FROM bands b JOIN gq USING (doc_id) " +
        "WHERE doc_id % 2 = 0), " +
        "b1 AS (SELECT b.* FROM bands b JOIN gq USING (doc_id) " +
        "WHERE doc_id % 2 = 1), " +
        "drop1in AS (SELECT DISTINCT r.doc_id FROM b1 l JOIN b1 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop1x AS (SELECT DISTINCT l.doc_id FROM b1 l JOIN b0 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept1 AS (SELECT DISTINCT doc_id FROM b1 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop1in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop1x)), " +
        "t AS (SELECT d.doc_id, d.source, " +
        "CAST(len(string_split_regex(lower(d.text), '\\s+')) AS BIGINT) AS n_tokens " +
        "FROM documents d JOIN kept1 USING (doc_id)) " +
        "SELECT doc_id, source, n_tokens, " +
        "CAST(floor(coalesce(sum(n_tokens) OVER (" +
        "PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        s"/ $PACK_BUDGET.0) AS BIGINT) AS bin FROM t"),

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

    "x_decontaminate_contain" -> containDeconSql(shingleToksCte(3),
      FUZZY_DECON_MOD, CONTAIN_DECON_THRESHOLD, CONTAIN_DFCAP),

    "x_decontaminate" -> deconSql,

    // the Bloom variant is result-identical by construction (no
    // false negatives + exact confirm join) — same oracle
    "x_decontaminate_bloom" -> deconSql,

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

    "x_pack_sequences" ->
      ("WITH t AS (SELECT doc_id, source, " +
        "CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT) AS n_tokens " +
        "FROM documents) " +
        "SELECT doc_id, source, n_tokens, " +
        "CAST(floor(coalesce(sum(n_tokens) OVER (" +
        "PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        s"/ $PACK_BUDGET.0) AS BIGINT) AS bin FROM t"),

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
        "md5(array_to_string(ch, ' ')) AS chunk_fp FROM sl")
  )
}
