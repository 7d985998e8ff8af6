package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Constants and helper builders shared across the Ext* wiring
  * families — fixture parameters (thresholds, mods, widths) that the
  * Spark query AND its DuckDB oracle must agree on, plus the SQL
  * fragment builders that mirror operator hash math bit-for-bit.
  */
private[graft] object ExtShared {

  // shared SQL fragments for the oracle side
  private[graft] val toksSql =
    "SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok FROM documents"
  private[graft] def h60(expr: String) =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  private[graft] val MINHASH_K = 16
  private[graft] val MINHASH_BANDS = 4
  private[graft] val NGRAM_BANDS = 8 // 8 bands × 2 rows — recall for the 0.5 threshold
  // containment (subsumption) detection: trigram shingles, a doc
  // counts as contained at 80%, and only shingles appearing in ≤ 20
  // docs may block candidate pairs (the linear-volume cap)
  private[graft] val CONTAIN_THRESHOLD = 0.8
  private[graft] val CONTAIN_DFCAP = 20
  // containment decontamination: flag a training doc when it holds
  // half of an eval doc's shingle set (mod-5 split — same eval split
  // as the fuzzy pass, so both leak shapes are audited on one split)
  private[graft] val CONTAIN_DECON_THRESHOLD = 0.5
  // substring-level dedup: 8-token consecutive windows; a pair needs
  // ≥ 2 distinct shared windows (≈ a shared run of ≥ 9 tokens, or two
  // separate 8-token spans); same df-cap linear-volume bound as
  // containment
  private[graft] val SUBSTR_WINDOW = 8
  private[graft] val SUBSTR_MINSPANS = 2
  private[graft] val SUBSTR_DFCAP = 20
  // temperature mixing: sqrt weighting against a budget just under
  // the sf0.01 corpus's ~26.6k total tokens, so small sources clamp
  // at rate 1 (kept whole) while large ones downsample — both
  // branches of the rate formula are exercised by the graded query
  private[graft] val MIX_ALPHA = 0.5
  private[graft] val MIX_BUDGET = 26000L
  private[graft] val SIGNLSH_PLANES = 16
  private[graft] val SIGNLSH_BANDS = 4
  private[graft] val ANN_CENT_STRIDE = 61 // every 61st vector is a centroid
  private[graft] val ANN_NPROBE = 2
  private[graft] val ANN_N_QUERIES = 5 // query set = vec_id < this, BOTH engines
  // kmeans-trained IVF (x_ann_kmeans). nprobe 8 of 10 cells: the
  // fixture's embeddings are ISOTROPIC (same-label mean cosine ~0.002
  // — no cluster structure for ANY partitioner to exploit), so
  // recall@10 is structurally ~nprobe/k; 8/10 measures 0.96-0.98
  // across sf0.001/0.01/0.1 (ExtensionsSpec pins >= 0.9). On real
  // clustered embeddings the same machinery reaches that recall at
  // nprobe 1-2; the fixture makes the trade steep, not the operator.
  private[graft] val ANN_KMEANS_K = 10
  private[graft] val ANN_KMEANS_ITERS = 3
  // SemDeDup threshold: the fixture's embeddings are isotropic (see
  // the kmeans note above), so genuine high-cosine pairs are the few
  // planted near-dups — 0.4 keeps the dropped set non-empty at every
  // SF while staying far above the isotropic background (~0.0)
  private[graft] val SEMDEDUP_TAU = 0.4
  // x_semdedup_capped cell cap: below every kmeans cell size at every
  // SF (cells are ~n/k = 50-200 members), so the capped path always
  // engages in the graded query
  private[graft] val SEMDEDUP_CAP = 32
  private[graft] val ANN_KMEANS_NPROBE = 8
  private[graft] val DECON_N = 4 // decontamination n-gram width
  private[graft] val DECON_MOD = 41 // benchmark split: doc_id % DECON_MOD == 0
  // fuzzy decontamination: a wider benchmark split (bigger cross
  // surface) and a recall-leaning estimated-Jaccard gate
  private[graft] val FUZZY_DECON_MOD = 5
  private[graft] val FUZZY_DECON_EST = 0.5
  private[graft] val SAMPLE_PCT = 20 // hash-sample keep rate (of 100 buckets)
  private[graft] val QUOTA_PER_SOURCE = 15 // per-source cap (truncates at all SFs)
  private[graft] val RANGE_WINDOW_SEC = 300L // range-join half-window
  private[graft] val SALT_BUCKETS = 16 // skew-mitigation salt fan-out
  // incremental dedup: doc_id % this == 0 is the incoming batch. 3, not
  // a rounder number, because the fixture's duplicate groups must
  // actually INTERSECT the split for the graded query to exercise both
  // drop paths (at sf0.1, mod 3 puts one dup pair fully in-batch and
  // splits another across batch/corpus; mod 10 touched none — the
  // query graded a pass-through)
  private[graft] val INCR_MOD = 3
  // partition-pruned layout: the queried week (7 of the fixture's 30
  // event_date partitions — the other 23 are never listed into the plan)
  private[graft] val PRUNE_FROM = "2024-01-08"
  private[graft] val PRUNE_TO = "2024-01-14"
  // z-order pruned layout: a 2-D (user band × day band) rectangle —
  // 10 of the fixture's users over the same queried week. Nonzero at
  // every SF (user_id starts at 0 everywhere); day_idx 7..13 =
  // 2024-01-08..14 relative to the fixture's 2024-01-01 epoch
  private[graft] val ZORDER_USER_LO = 0L
  private[graft] val ZORDER_USER_HI = 9L
  private[graft] val ZORDER_DAY_LO = 7
  private[graft] val ZORDER_DAY_HI = 13
  // 11 interleave bits per key: covers user_id ≤ 2047 (sf0.1 max is
  // 1499) and day_idx ≤ 29 without aliasing
  private[graft] val ZORDER_BITS = 11
  // blocked fuzzy dedup: 24-char blocking prefix (fixture: 5k docs →
  // 4.75k blocks, max block 4), Levenshtein over the first 80 chars
  private[graft] val FUZZY_BLOCK = 24
  private[graft] val FUZZY_PREFIX = 80
  private[graft] val FUZZY_MAXDIST = 8
  private[graft] val SETOPS_CUTOFF = 300000.0 // hi-spend segment floor
  private[graft] val PACK_BUDGET = 2048L // tokens per packed training sequence
  private[graft] val TFIDF_TOPK = 3 // tf-idf terms kept per document
  private[graft] val PMI_MIN_COUNT = 5 // bigram support floor for PMI
  private[graft] val PMI_TOPK = 20 // collocation pairs kept
  private[graft] val VOCAB_K = 500 // fixed vocab size for coverage report
  private[graft] val MM_FEAT_DIMS = 8 // md5-derived stub feature width (max 8)
  private[graft] val MM_FRAME_BYTES = 256 // frame-sampling window (bytes)
  private[graft] val MM_DECODE_DOCS = 40 // docs in the mixed real+opaque decode frame
  // perceptual-hash image dedup: 40 docs render 16x16 PNGs from 13
  // seeds (doc_id % 13), so duplicate groups are a pure function of
  // the key an oracle can replay without decoding; Hamming gate 6
  // stays under the 8-band pigeonhole recall bound
  private[graft] val MM_PHASH_DOCS = 40
  private[graft] val MM_PHASH_SEEDS = 13
  private[graft] val MM_PHASH_MAXDIST = 6
  private[graft] val HIST_WIDTH = 50 // histogram bucket width (value units)
  private[graft] val EMB_DIM = 64 // fixture embedding width (oracle range)
  private[graft] val SPLIT_TRAIN = 80 // stratified split: first 80 hash buckets
  private[graft] val SPLIT_VAL = 10 // next 10 buckets → val; remainder → test
  private[graft] val BLOOM_FPP = 0.01 // decontamination Bloom false-positive rate
  private[graft] val CHUNK_SIZE = 32 // tokens per chunk window
  private[graft] val CHUNK_STRIDE = 24 // chunk start step (8-token overlap)
  private[graft] val QUANT_TOPK = 10 // neighbors kept by the quantized top-k
  private[graft] val WEIGHTED_RATE = 0.5 // top-quality keep rate for weighted sampling
  private[graft] val WEIGHTED_GRAN = 10000 // weighted-sample hash granularity
  private[graft] val QUALITY_GATE = 0.5 // per-source report quality floor
  private[graft] val HH_K = 64 // heavy hitters: keep tokens with freq > n/64
  private[graft] val MAD_CUT = 3.0 // robust-outlier gate: |v - med| > 3*MAD
  private[graft] val FUNNEL_STAGES = Seq("view", "click", "purchase")
  private[graft] val FUNNEL_GAP_SEC = 86400L // windowed funnel: convert within 24h
  private[graft] val HLL_LGK = 12 // HLL sketch precision (2^12 registers)
  // interval-overlap join: purchase windows × error windows per user;
  // the 10-minute grid keeps per-interval replication at 2-3 cells
  private[graft] val IVAL_A_MIN = 15 // purchase interval length (minutes)
  private[graft] val IVAL_B_MIN = 10 // error interval length (minutes)
  private[graft] val IVAL_BUCKET_SEC = 600L
  private[graft] val RANK_PARTS = 8 // range partitions for the dense-id sort
  // IVF-PQ: 8 subspaces × 16 sampled codes over 64-dim residuals —
  // 8 B per indexed vector (vs 64 B SQ8, 256 B float)
  private[graft] val PQ_M = 8
  private[graft] val PQ_CODES = 16
  private[graft] val PQ_RERANK = 64 // exact-rerank shortlist per query
  private[graft] val NOVELTY_N = 3 // novelty shingle width
  private[graft] val EWMA_ALPHA = 0.3
  private[graft] val EWMA_DEPTH = 8 // truncation bias (1-alpha)^8 ≈ 0.6%
  // bloom file index: point-lookup a HIGH-CARDINALITY key (event_id)
  // over a layout clustered on user_id — every file's event_id
  // min/max spans the whole range, so only the bloom can skip
  private[graft] val BLOOM_IDX_FPP = 0.01
  private[graft] val BLOOM_IDX_EVENT = 123L
  private[graft] val BLOOM_IDX_FILES = 16
  private[graft] val BIN_COUNT = 10 // equi-depth bins (deciles)
  // BPE training: merge rounds emitted by x_bpe_train — enough to
  // grow multi-char subwords from the fixture vocabulary while the
  // oracle stays a readable 12-round CTE chain
  private[graft] val BPE_MERGES = 12
  // BM25: a fixed 3-term query over the fixture vocabulary (all
  // present at every SF); standard Robertson parameters
  private[graft] val BM25_TERMS = Seq("join", "scan", "filter")
  private[graft] val BM25_K1 = 1.2
  private[graft] val BM25_B = 0.75
  // inverted index: postings materialize only for tokens whose df is
  // ≤ 80% of the corpus (a RELATIVE cap — the fixture's df fractions
  // are SF-stable, so both the postings and the capped branch grade
  // at every scale)
  private[graft] val INVIDX_DFCAP_PCT = 80L
  private[graft] val BM25_TOPK = 25
  // PageRank over the near-dup pair graph: fixed-trip synchronous
  // rounds, standard damping
  private[graft] val PR_ITERS = 5
  private[graft] val PR_DAMPING = 0.85

  private[graft] val stopSql = Text.stopwords.map { case (l, ws) =>
    l -> ws.mkString("['", "', '", "']")
  }

  private[graft] def hitsSql(lang: String) =
    s"len(list_intersect(list_distinct(string_split_regex(lower(text), '\\s+')), ${stopSql(lang)}))"

  /** DuckDB twin of [[Text.qualityScore]] — shared by the pipeline
    * oracles (`x_pipeline_clean`, `x_pipeline_pack`). */
  private[graft] lazy val qualitySql: String =
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
  private[graft] def skewKey: org.apache.spark.sql.Column =
    F.when(F.col("user_id") % 5 === 0, F.col("user_id")).otherwise(F.lit(1L))
  private[graft] val skewKeySql =
    "CASE WHEN user_id % 5 = 0 THEN user_id ELSE 1 END"


  /** The synthetic CDC feed over orders, shared by the batch and
    * streaming apply twins: plain delete/update/insert plus per-key
    * CONFLICTING changes whose resolution exercises
    * last-writer-wins by version in both engines. */
  private[graft] def cdcChangeFeed(o: DataFrame): DataFrame = {
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
  private[graft] def layoutDir(sfDir: String, name: String): String =
    Workspace.dir(s"${name}_${new java.io.File(sfDir).getName}")

  private[graft] def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  /** Write `df` as ONE parquet file at `destFile` with an explicit
    * mtime — order-sensitive multi-batch file-stream fixtures need
    * single files whose arrival order (FileStreamSource sorts by
    * modification time) is pinned, not left to write-timing. */
  private[graft] def writeSingleFile(df: org.apache.spark.sql.DataFrame,
                                     destFile: String, mtime: Long): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = destFile + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath)
      .find(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    val dest = new org.apache.hadoop.fs.Path(destFile)
    fs.delete(dest, false)
    require(fs.rename(part, dest), s"rename to $destFile failed")
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    fs.setTimes(dest, mtime, -1)
  }

  /** k min-hash aggregate expressions (same universal-hash literals
    * as [[Dedup.minhashA]]/[[Dedup.minhashB]] — bit-identical sigs). */
  private[graft] def mhMinsSql: String = {
    val P = Dedup.MINHASH_P
    (0 until MINHASH_K)
      .map(i => s"min((${Dedup.minhashA(i)} * (${h60("tok")} % $P) + " +
        s"${Dedup.minhashB(i)}) % $P) AS mh$i").mkString(", ")
  }

  /** One UNION ALL branch per band over a `sig` CTE — mirrors
    * [[Dedup]]'s banding (md5 over ','-joined band hashes). */
  private[graft] def bandRowsSql(bands: Int): String = {
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
  private[graft] def estSql: String =
    "(" + (0 until MINHASH_K)
      .map(i => s"CASE WHEN l.mh$i = r.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ") + s") * 1.0 / $MINHASH_K"

  /** Oracle for both decontamination variants (exact and
    * Bloom-pre-filtered — the latter is result-identical by
    * construction). */
  /** Shared tail of the funnel oracles: stage-count rollup. */
  private[graft] val funnelTailSql: String =
    "c AS (SELECT CAST(count(t0) AS BIGINT) AS n0, " +
      "CAST(count(t1) AS BIGINT) AS n1, " +
      "CAST(count(t2) AS BIGINT) AS n2 FROM s2) " +
      "SELECT 'view' AS stage, CAST(0 AS BIGINT) AS stage_idx, n0 AS n_users FROM c " +
      "UNION ALL SELECT 'click', CAST(1 AS BIGINT), n1 FROM c " +
      "UNION ALL SELECT 'purchase', CAST(2 AS BIGINT), n2 FROM c"

  private[graft] lazy val cdcApplySql: String =
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

  private[graft] lazy val deconSql: String =
    s"WITH ${shingleToksCte(DECON_N)}, " +
      s"bench AS (SELECT DISTINCT tok FROM toks WHERE doc_id % $DECON_MOD = 0) " +
      "SELECT t.doc_id, count(*) AS n_shared FROM toks t " +
      s"JOIN bench b USING (tok) WHERE t.doc_id % $DECON_MOD <> 0 " +
      "GROUP BY t.doc_id"

  /** CTE chain ending in `toks(doc_id, tok)` of distinct word
    * n-gram shingles — the twin of `Text.distinctShingles(_, n)`
    * (short texts yield one whole-text shingle). */
  private[graft] def shingleToksCte(n: Int): String = {
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
  private[graft] def jaccardLshSql(toksCte: String, bands: Int,
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
  private[graft] def containmentSql(toksCte: String, threshold: Double,
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
  private[graft] def containDeconSql(toksCte: String, benchMod: Int,
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
  private[graft] def hyperplaneSql(p: Int): String =
    "list_transform(range(0, len(embedding)), j -> CASE WHEN " +
      s"(CAST('0x' || substr(md5('hp' || $p || '_' || j), 1, 15) AS BIGINT) & 1) = 0 " +
      "THEN 1.0 ELSE -1.0 END)"

  /** Sign-LSH banded near-dup pipeline (DuckDB twin of
    * [[Similarity.nearDupPairs]]). */
  private[graft] def nearDupLshSql(planes: Int, bands: Int,
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
  private[graft] def ivfBodySql(nprobe: Int, k: Int, nQueries: Int): String = {
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
  private[graft] def annPqSql(stride: Int, nprobe: Int, k: Int, nQueries: Int,
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

  private[graft] def ivfSql(stride: Int, nprobe: Int, k: Int,
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
  private[graft] def kmeansCentsSql(kc: Int, iters: Int,
                                    trainSrc: String = "embeddings"): String = {
    val init =
      s"tr AS MATERIALIZED (SELECT * FROM $trainSrc), " +
        s"st AS (SELECT greatest(1, count(*) // $kc) AS s FROM tr), " +
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, " +
        "CAST(embedding AS DOUBLE[]) AS cvec FROM tr " +
        s"WHERE vec_id % (SELECT s FROM st) = 0 ORDER BY vec_id LIMIT $kc), "
    val rounds = (1 to iters).map { i =>
      val prev = s"c${i - 1}"
      s"a$i AS (SELECT e.vec_id, e.embedding, c.cent_id, " +
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) DESC, " +
        s"c.cent_id ASC) AS rn FROM tr e CROSS JOIN $prev c), " +
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

  private[graft] def annKmeansSql(kc: Int, iters: Int, nprobe: Int, k: Int,
                           nQueries: Int,
                           trainSrc: String = "embeddings"): String =
    kmeansCentsSql(kc, iters, trainSrc) + ivfBodySql(nprobe, k, nQueries)

  /** DuckDB twin of [[Similarity.ivfResidualTopK]] over kmeans cells:
    * replays training, the argmax assignment, the residual against
    * the assigned centroid, the symmetric int8 quantization
    * (127/max|r|, half-up), the `centroid + q/scale` reconstruction,
    * and the probe/rank — identical arithmetic end to end. */
  private[graft] def annResidualSql(kc: Int, iters: Int, nprobe: Int, k: Int,
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
  private[graft] def semDedupSql(kc: Int, iters: Int, tau: Double): String =
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
  private[graft] def semDedupCappedSql(kc: Int, iters: Int, tau: Double,
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

  private[graft] lazy val mhMins = mhMinsSql
  private[graft] lazy val bandRows = bandRowsSql(MINHASH_BANDS)
  private[graft] lazy val simhashBitSums = (0 until 32)
    .map(b => s"sum(CASE WHEN (h & ${1L << b}) <> 0 THEN 1 ELSE -1 END) AS s$b")
    .mkString(", ")
  private[graft] lazy val simhashAssemble = (0 until 32)
    .map(b => s"CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
    .mkString(" + ")
  // gaps-and-islands sessionization — oracle for BOTH the batch
  // session_window query and its streaming twin (same merged result)
  private[graft] lazy val sessionGaiSql =
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
  private[graft] lazy val sessionAppendSql =
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
}
