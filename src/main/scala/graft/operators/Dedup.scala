package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Deduplication for training-data pipelines (north-star extension):
  * exact, MinHash/LSH, SimHash, and token-set Jaccard near-dup.
  *
  * Scale design:
  *  - Exact dedup groups on a 128-bit fingerprint, not the raw text —
  *    the shuffle moves 16 bytes + id per row, never documents.
  *  - MinHash signatures are computed with one explode + one
  *    map-side-combined groupBy (k mins); the LSH band join only
  *    shuffles constant-width (band_idx, band_hash, id, sig) rows.
  *    Candidates are gated on the signature-estimated Jaccard (a flat
  *    codegen'd sum) before any shuffle or exact verification.
  *  - All hashes are md5-derived (`Text.hash60`) — deterministic,
  *    engine-portable, seedable.
  *  - Self-joins pair ids with `a < b` so each pair shuffles once.
  */
object Dedup {

  /** Exact duplicate groups: rows whose normalized text collides on
    * md5. Returns one row per duplicated fingerprint with the kept
    * (minimum) id and the group size. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String,
                  minCount: Long = 2): DataFrame =
    df.select(F.col(idCol), Text.fingerprint(F.col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(F.min(idCol).as("keep_id"), F.count(F.lit(1)).as("dup_count"))
      .filter(F.col("dup_count") >= minCount)

  /** Exact-deduplicated view: keeps the minimum id per fingerprint. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df.select(F.col(idCol), Text.fingerprint(F.col(textCol)).as("fp"))
      .groupBy("fp").agg(F.min(idCol).as(idCol))
    df.join(keep.select(idCol), Seq(idCol), "left_semi")
  }

  /** Incremental-ingest dedup: the rows of `incoming` that survive
    * dedup against an EXISTING corpus — the production shape of exact
    * dedup, where each new crawl/batch is cleaned against everything
    * already ingested instead of re-deduplicating the world.
    *
    * Two passes, both on the 16-byte fingerprint: in-batch dedup
    * (keep the minimum id per fingerprint inside `incoming`), then a
    * left-anti join against the corpus's distinct fingerprint set.
    * At scale the corpus side reduces to its distinct fingerprints
    * before the join — the shuffle carries 16 bytes per EXISTING
    * document, never its text, and the incoming batch (typically
    * orders of magnitude smaller than the corpus) is the streamed
    * side. */
  def incrementalDedup(corpus: DataFrame, incoming: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val seen = corpus
      .select(Text.fingerprint(F.col(textCol)).as("fp")).distinct()
    // fingerprint the batch ONCE; both dedup passes then run over the
    // skinny (fp, id) frame — the in-batch keep set and the anti-join
    // against the corpus shuffle 16-byte hashes plus an id, never
    // text. One final semi-join rehydrates the surviving full rows.
    val keepIds = incoming
      .select(F.col(idCol), Text.fingerprint(F.col(textCol)).as("fp"))
      .groupBy("fp").agg(F.min(idCol).as(idCol))
      .join(seen, Seq("fp"), "left_anti")
      .select(idCol)
    incoming.join(keepIds, Seq(idCol), "left_semi")
  }

  /** Incremental-ingest NEAR-dup: the rows of `incoming` that are not
    * near-duplicates of the existing corpus or of another batch row —
    * the production shape of LSH dedup for a continuously ingesting
    * pipeline (clean each crawl against everything already kept,
    * never re-deduplicate the world).
    *
    * Near-dup = LSH band collision AND signature-estimated Jaccard ≥
    * `threshold`. Two drop paths:
    *  - in-batch: a row dominated by ANY lower-id batch row drops
    *    (greedy keep-lowest-id — order-free, engine-replayable; note
    *    a dropped row still dominates higher-id rows, the standard
    *    greedy LSH-dedup semantics);
    *  - cross: a row banding with ANY corpus row at ≥ threshold drops.
    *
    * Scale design: both sides reduce to banded constant-width
    * signature rows before any join; the cross join is a batch×corpus
    * equi-join on (band_idx, band_hash) whose batch side is tiny —
    * AQE broadcasts it, so the corpus's banded signatures are
    * scanned once and never shuffled. In a standing pipeline the
    * corpus's signatures/bands would be materialized incrementally
    * (append the kept batch's rows each ingest) rather than recomputed
    * — this operator takes the corpus frame as given so callers can
    * hand it either. */
  def incrementalNearDedup(corpus: DataFrame, incoming: DataFrame,
                           idCol: String, textCol: String,
                           k: Int = 16, bands: Int = 4,
                           threshold: Double = 0.7,
                           terms: Column => Column = Text.distinctTokens(_)): DataFrame = {
    val bandedB = bandedSignatures(incoming, idCol, textCol, k, bands, terms)
    val bandedC = bandedSignatures(corpus, idCol, textCol, k, bands, terms)
    incoming.join(incrementalDrops(bandedC, bandedB, idCol, k, threshold),
      Seq(idCol), "left_anti")
  }

  /** Banded MinHash signature frame — one row per (id, band) carrying
    * the flat mh0..mh{k-1} columns plus (band_idx, band_hash). The
    * persistable representation of a document for near-dup purposes:
    * [[graft.operators.SignatureStore]] materializes exactly this
    * frame, so a standing pipeline never re-tokenizes its corpus. */
  def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
                       k: Int, bands: Int,
                       terms: Column => Column): DataFrame =
    bandSignatures(minhashSignatures(df, idCol, textCol, k, terms),
      idCol, k, bands)

  /** The ids of `bandedBatch` rows dropped by incremental near-dedup:
    * dominated by a lower-id batch row (in-batch greedy keep-lowest)
    * or banding with ANY corpus signature at ≥ threshold. Both inputs
    * are banded signature frames ([[bandedSignatures]] shape) — the
    * corpus side can come straight from a materialized store, so this
    * core never needs corpus text. Output is one `idCol` column,
    * distinct, bounded by the batch size. */
  def incrementalDrops(bandedCorpus: DataFrame, bandedBatch: DataFrame,
                       idCol: String, k: Int,
                       threshold: Double): DataFrame = {
    val inBatchDrop = bandCandidates(bandedBatch, idCol, k, threshold)
      .select(F.col("id_b").as(idCol))
    val l = bandedBatch.alias("l")
    val r = bandedCorpus.alias("r")
    val crossDrop = l.join(r,
        F.col("l.band_idx") === F.col("r.band_idx") &&
        F.col("l.band_hash") === F.col("r.band_hash"))
      .filter(estJaccard(k) >= threshold)
      .select(F.col(s"l.$idCol").as(idCol))
    inBatchDrop.union(crossDrop).distinct()
  }

  /** Drop EXPLANATION for the cross-store half of
    * [[incrementalDrops]] — the dedup audit trail a production
    * pipeline keeps alongside its decisions: one row per (batch doc,
    * store doc) near-match at/above the threshold, with the
    * signature-estimated Jaccard that justified it. `incrementalDrops`
    * answers WHO was dropped; this answers WHY and AGAINST WHAT —
    * the evidence a takedown review, a threshold-tuning pass, or a
    * false-positive investigation reads. Same band-bounded join as
    * the drop path (never a cross space); the estimate is identical
    * across a pair's colliding bands, so the distinct collapses to
    * one exact row per matched pair. */
  def incrementalDropExplain(bandedCorpus: DataFrame,
                             bandedBatch: DataFrame, idCol: String,
                             k: Int, threshold: Double): DataFrame = {
    val l = bandedBatch.alias("l")
    val r = bandedCorpus.alias("r")
    l.join(r,
        F.col("l.band_idx") === F.col("r.band_idx") &&
        F.col("l.band_hash") === F.col("r.band_hash"))
      .filter(estJaccard(k) >= threshold)
      .select(F.col(s"l.$idCol").as(idCol),
        F.col(s"r.$idCol").as("matched_id"),
        F.round(estJaccard(k), 6).as("est_jaccard"))
      .distinct()
  }

  /** Universal-hash family for MinHash: h_s(x) = (a_s·x + b_s) mod P
    * over a single md5-derived base hash. One md5 per token total
    * (instead of one per seed); the mixes are integer-only and stay
    * below 2^62, so they are portable to any engine with 64-bit
    * arithmetic (the DuckDB oracle uses the same literals). */
  val MINHASH_P: Long = 2147483647L // 2^31 - 1, prime
  def minhashA(s: Int): Long = {
    val a = (2654435761L * (s + 1)) % MINHASH_P
    if (a == 0) 1L else a
  }
  def minhashB(s: Int): Long = (40503L * (s + 1) + 17) % MINHASH_P

  /** One row per (id, non-empty term) — the shared term-explode
    * every signature/intersection path starts from. */
  private def termRows(df: DataFrame, idCol: String, textCol: String,
                       terms: Column => Column,
                       spread: Boolean = false): DataFrame = {
    // spread=true: raise the projected (id, text) input to the
    // cluster's parallelism floor before the explode ([[Spread]]) —
    // for the operators whose shingle+hash expansion is ONE dominant
    // CPU stage (containment/substring: every window of every doc is
    // hashed). The signature family stays un-spread: its per-doc
    // aggregates fan out over more, smaller stages where the extra
    // partitions cost more in per-task overhead than they buy
    // (measured both ways at sf0.1/local[32]).
    val in = df.select(F.col(idCol), F.col(textCol))
    (if (spread) Spread.floor(in) else in)
      .select(F.col(idCol), F.explode(terms(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
  }

  /** k min-hash aggregates over a term frame, plus optional extra
    * aggregates computed in the SAME grouped pass (e.g. the term
    * count). Single home of the universal-hash formula — the DuckDB
    * oracle twin (`mhMinsSql`) mirrors exactly this. */
  private def sigAgg(toks: DataFrame, idCol: String, k: Int,
                     extras: Seq[Column] = Nil,
                     preHashed: Boolean = false): DataFrame = {
    // preHashed: the frame carries the 60-bit term hash in `h`
    // (jaccardPairsLsh hashes once and reuses it for the verify
    // join); otherwise hash the raw `tok` strings here
    val hashed =
      if (preHashed) toks.withColumn("hm", F.col("h") % MINHASH_P)
      else toks.withColumn("hm", Text.hash60(F.col("tok")) % MINHASH_P)
    val mins = (0 until k).map(s =>
      F.min((F.lit(minhashA(s)) * F.col("hm") + F.lit(minhashB(s))) % MINHASH_P)
        .as(s"mh$s"))
    hashed.groupBy(idCol).agg(mins.head, (mins.tail ++ extras): _*)
  }

  /** MinHash signatures: k independent min-hashes over the distinct
    * token set. One row per id, columns mh0..mh{k-1}. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 16,
                        terms: Column => Column = Text.distinctTokens(_)): DataFrame =
    sigAgg(termRows(df, idCol, textCol, terms), idCol, k)

  /** LSH banding over a signature frame: one row per (id, band),
    * keyed by md5 over the band's hashes — constant-width shuffle rows
    * regardless of k. Carries the flat mh columns alongside so
    * candidate scoring stays inside whole-stage codegen (an array +
    * `zip_with`/`aggregate` formulation drops the filter out of
    * codegen into interpreted per-row eval — 10×+ slower on wide
    * candidate sets). */
  private def bandSignatures(sig: DataFrame, idCol: String,
                             k: Int, bands: Int,
                             carry: Seq[String] = Nil): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPerBand = k / bands
    val bandCols = (0 until bands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => F.col(s"mh$i").cast("string"))
      F.struct(F.lit(b).as("band_idx"),
        F.md5(F.concat_ws(",", hs: _*)).as("band_hash")).as(s"b$b")
    }
    val keep = (0 until k).map(i => s"mh$i") ++ carry
    sig.select(F.col(idCol) +: keep.map(F.col) :+
      F.explode(F.array(bandCols: _*)).as("band"): _*)
      .select(F.col(idCol) +: F.col("band.band_idx").as("band_idx") +:
        F.col("band.band_hash").as("band_hash") +:
        keep.map(F.col): _*)
  }

  /** Candidate pairs from LSH banding: two docs are candidates iff
    * they agree on ALL hashes of at least one band. The self-join is
    * an equi-join on (band_idx, band_hash) — pair volume is governed
    * by band selectivity, never the full n² cross space. Candidates
    * are scored by the signature-estimated Jaccard (matching minhash
    * fraction, a flat codegen'd sum) and gated at `minEst` BEFORE the
    * dedup shuffle, so over-generated band collisions die in the map
    * stage. */
  /** Matching-minhash fraction between the `l`/`r` aliases of two
    * banded signature frames — a flat codegen'd sum. */
  private def estJaccard(k: Int): Column =
    (0 until k)
      .map(i => F.when(F.col(s"l.mh$i") === F.col(s"r.mh$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k.toDouble

  private def bandCandidates(banded: DataFrame, idCol: String, k: Int,
                             minEst: Double,
                             carry: Seq[String] = Nil): DataFrame = {
    val l = banded.alias("l")
    val r = banded.alias("r")
    val est = estJaccard(k)
    val carried = carry.flatMap(c =>
      Seq(F.col(s"l.$c").as(s"${c}_a"), F.col(s"r.$c").as(s"${c}_b")))
    l.join(r,
        F.col("l.band_idx") === F.col("r.band_idx") &&
        F.col("l.band_hash") === F.col("r.band_hash") &&
        F.col(s"l.$idCol") < F.col(s"r.$idCol"))
      .select(F.col(s"l.$idCol").as("id_a") +: F.col(s"r.$idCol").as("id_b") +:
        est.as("est_jaccard") +: carried: _*)
      .filter(F.col("est_jaccard") >= minEst)
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * Bands the k-wide signature into `bands` groups of k/bands rows;
    * candidates (see [[bandCandidates]]) are scored by the
    * signature-estimated Jaccard (matching minhash fraction) and
    * kept when ≥ `threshold`. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, bands: Int = 4,
                   threshold: Double = 0.7,
                   terms: Column => Column = Text.distinctTokens(_)): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, k, terms)
    bandCandidates(bandSignatures(sig, idCol, k, bands), idCol, k, threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Cross-corpus MinHash-LSH matches: rows of `probe` paired with
    * rows of `corpus` that share at least one LSH band, scored by the
    * signature-estimated Jaccard and kept at `threshold`. The
    * asymmetric twin of [[minhashPairs]] — the shape of fuzzy
    * decontamination (training × benchmark) and near-match retrieval
    * audits. Both sides reduce to banded signatures BEFORE the
    * equi-join, so pair volume is band-governed, never
    * |probe| × |corpus|; at 100 TB the corpus side's banded frame is
    * the only thing that shuffles, and it carries 16 ints + a 16-byte
    * band hash per row, never text. */
  def minhashCrossPairs(probe: DataFrame, corpus: DataFrame,
                        idCol: String, textCol: String,
                        k: Int = 16, bands: Int = 4,
                        threshold: Double = 0.7,
                        terms: Column => Column = Text.distinctTokens(_)): DataFrame = {
    val l = bandSignatures(
      minhashSignatures(probe, idCol, textCol, k, terms), idCol, k, bands)
      .alias("l")
    val r = bandSignatures(
      minhashSignatures(corpus, idCol, textCol, k, terms), idCol, k, bands)
      .alias("r")
    l.join(r,
        F.col("l.band_idx") === F.col("r.band_idx") &&
        F.col("l.band_hash") === F.col("r.band_hash"))
      .select(F.col(s"l.$idCol").as("id_a"),
        F.col(s"r.$idCol").as("id_b"), estJaccard(k).as("est_jaccard"))
      .filter(F.col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** SimHash signature (default 32 bits from the 60-bit token hash):
    * bit b of the signature is set iff more tokens have bit b set
    * than clear. One explode + one grouped sum per bit. */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 32,
              terms: Column => Column = Text.distinctTokens(_)): DataFrame = {
    val toks = termRows(df, idCol, textCol, terms)
      .withColumn("h", Text.hash60(F.col("tok")))
    val bitSums = (0 until bits).map { b =>
      F.sum(F.when(F.col("h").bitwiseAND(F.lit(1L << b)) =!= 0L, 1)
        .otherwise(-1)).as(s"s$b")
    }
    val summed = toks.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits).map { b =>
      F.when(F.col(s"s$b") > 0, F.lit(1L << b)).otherwise(F.lit(0L))
    }.reduce(_ + _)
    summed.select(F.col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance ≤ maxHamming. The join
    * is banded on the signature's bytes (any near pair shares at
    * least one identical byte when maxHamming < bytes) to avoid the
    * quadratic cross join. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = 32, maxHamming: Int = 3,
                   terms: Column => Column = Text.distinctTokens(_)): DataFrame = {
    val bytesN = bits / 8
    val sig = simhash(df, idCol, textCol, bits, terms)
    val banded = sig.select(F.col(idCol), F.col("simhash"),
      F.explode(F.array((0 until bytesN).map(i =>
        F.struct(F.lit(i).as("byte_idx"),
          F.shiftright(F.col("simhash"), i * 8).bitwiseAND(F.lit(0xffL)).as("byte_val"))
      ): _*)).as("b"))
      .select(F.col(idCol), F.col("simhash"),
        F.col("b.byte_idx").as("byte_idx"), F.col("b.byte_val").as("byte_val"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r,
        F.col("l.byte_idx") === F.col("r.byte_idx") &&
        F.col("l.byte_val") === F.col("r.byte_val") &&
        F.col(s"l.$idCol") < F.col(s"r.$idCol"))
      .select(F.col(s"l.$idCol").as("id_a"), F.col(s"r.$idCol").as("id_b"),
        F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).as("hamming"))
      // filter BEFORE dedup: hamming is already computed map-side, so
      // rejecting failing candidates here keeps them out of the
      // dropDuplicates exchange — only surviving pairs shuffle (same
      // order, same rationale as Similarity.nearDupPairs)
      .filter(F.col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact token-set Jaccard pairs ≥ threshold. Quadratic in the
    * worst case (`Σ df(tok)²` over the inverted-token self-join) —
    * callers MUST pre-filter to a bounded candidate set; the scale
    * path is [[jaccardPairsLsh]]. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double,
                   terms: Column => Column = Text.distinctTokens(_)): DataFrame = {
    val toks = termRows(df, idCol, textCol, terms)
    val sizes = toks.groupBy(idCol).agg(F.count(F.lit(1)).as("sz"))
    val l = toks.alias("l"); val r = toks.alias("r")
    val inter = l.join(r,
        F.col("l.tok") === F.col("r.tok") && F.col(s"l.$idCol") < F.col(s"r.$idCol"))
      .groupBy(F.col(s"l.$idCol").as("id_a"), F.col(s"r.$idCol").as("id_b"))
      .agg(F.count(F.lit(1)).as("inter"))
    withJaccard(inter, sizes, idCol, threshold)
  }

  /** Exact Jaccard verified on MinHash-LSH candidates (scale path).
    *
    * Candidate generation is the [[minhashPairs]] banding — an
    * equi-join on band hashes whose pair volume is governed by band
    * selectivity (tune k/bands to the target threshold: wider bands →
    * higher precision, more bands → higher recall). The exact
    * intersection then runs ONLY over candidate pairs: `cand ⋈ toks_a
    * ⋈ toks_b` costs Σ over candidates of |tokens(a)|, never the
    * `Σ df(tok)²` of the all-pairs inverted join — this is what lets
    * the operator run uncapped over the full corpus.
    *
    * Between banding and exact verification sits the estimated-Jaccard
    * gate: candidates whose signature-estimated Jaccard falls below
    * `threshold - estSlack` are dropped in the (codegen'd) map stage.
    * The default slack of 0.25 is ~2σ of the k=16 estimator
    * (σ = sqrt(j(1-j)/k) ≤ 0.125), so true pairs at the threshold
    * survive with high probability while band-collision noise — the
    * failure mode of narrow bands on low-similarity corpora — never
    * reaches the token-intersection join.
    *
    * Recall is the LSH capture probability `1-(1-j^r)^b` at true
    * Jaccard j (r = k/bands rows per band), times the gate's survival
    * probability — a documented trade, and deterministic: the DuckDB
    * oracle replays the identical banding and gate. */
  def jaccardPairsLsh(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, k: Int = 16, bands: Int = 4,
                      estSlack: Double = 0.25,
                      terms: Column => Column = Text.distinctTokens(_)): DataFrame = {
    // Hash each term to its 60-bit md5 prefix ONCE and pin the frame:
    // it feeds the signature pass AND both sides of the exact-verify
    // join, and without the checkpoint the text split + shingle
    // explode + md5 lineage re-executes per consumer (3× the dominant
    // cost). Downstream the intersection joins on the fixed-width
    // long, never the variable-length shingle string — the verify
    // shuffle carries 16 bytes per row. The DuckDB oracle intersects
    // the same hashes, so parity is exact even under (cosmically
    // unlikely) 60-bit collisions.
    val toks = termRows(df, idCol, textCol, terms)
      .select(F.col(idCol), Text.hash60(F.col("tok")).as("h"))
      .localCheckpoint(true)
    // one grouped pass yields BOTH the k-wide signature and the term
    // count (terms are distinct per doc, so count(*) = |term set|);
    // the sizes then ride THROUGH the banding as carried columns, so
    // no separate sizes frame and no post-intersection size joins —
    // the jaccard denominator is already on every candidate row
    val sigSz = sigAgg(toks, idCol, k, Seq(F.count(F.lit(1)).as("sz")),
      preHashed = true)
    val cand = bandCandidates(
        bandSignatures(sigSz, idCol, k, bands, carry = Seq("sz")), idCol, k,
        math.max(0.0, threshold - estSlack), carry = Seq("sz"))
      .select("id_a", "id_b", "sz_a", "sz_b")
    cand
      .join(toks.select(F.col(idCol).as("id_a"), F.col("h")), Seq("id_a"))
      .join(toks.select(F.col(idCol).as("id_b"), F.col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(F.count(F.lit(1)).as("inter"))
      .withColumn("jaccard",
        jaccardOf(F.col("inter"), F.col("sz_a"), F.col("sz_b")))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Containment pairs: doc pairs where the SMALLER shingle set is at
    * least `threshold` inside the other — `|A∩B| / min(|A|,|B|)`.
    * This is the subsumption detector symmetric Jaccard structurally
    * misses: a paragraph quoted inside a much longer document has
    * near-1.0 containment but tiny Jaccard (the union is dominated by
    * the long doc), so MinHash-LSH banding — which estimates Jaccard —
    * never surfaces the pair. Training-data curation needs exactly
    * this shape (boilerplate expansion, quote-inflation, doc-in-doc
    * republication).
    *
    * Candidates come from a DF-CAPPED inverted-index self-join: terms
    * are hashed once to 60-bit longs, document frequency is computed
    * per term, and only terms with `df <= dfCap` block pairs. That
    * bounds candidate volume at `Σ_{df≤cap} df² ≤ dfCap · Σ df` —
    * LINEAR in corpus size × cap, never the quadratic `Σ df²` of an
    * uncapped inverted join (stop-shingles are exactly the terms that
    * would otherwise pair everything with everything). The exact
    * intersection is computed by rarity split — `inter = rare_inter
    * (free from the candidate join) + common_inter (a join against
    * only the df>cap term rows, a small frame by construction)` —
    * with an exact upper-bound prune (`rare_inter + min common-set
    * size`) discarding pairs before the common join; identical
    * results to a full-frame intersection at a fraction of the join
    * volume. Recall caveat (documented trade): a contained pair
    * sharing ONLY ubiquitous shingles is invisible — but n≥3 word
    * shingles are overwhelmingly rare outside boilerplate, which is
    * what the cap is meant to ignore. The DuckDB oracle replays the
    * identical cap, hashes, and arithmetic. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double, dfCap: Int = 20,
                       terms: Column => Column = Text.distinctShingles(_, 3)): DataFrame = {
    // hash once, dedupe, pin: the frame feeds the df count, both sides
    // of the candidate join, and both sides of the exact intersection.
    // The distinct() makes (id, h) a set REGARDLESS of the terms
    // function: a non-distinct terms emitter (or a within-doc hash60
    // collision) would otherwise inflate the per-term df into an
    // occurrence count, cross-multiply duplicate rows in the
    // intersection join, and push containment past 1.0.
    val toks = termRows(df, idCol, textCol, terms, spread = true)
      .select(F.col(idCol), Text.hash60(F.col("tok")).as("h"))
      .distinct()
      .localCheckpoint(true)
    val sizes = toks.groupBy(idCol).agg(F.count(F.lit(1)).as("sz"))
    val dfc = toks.groupBy("h").agg(F.count(F.lit(1)).as("df"))
    val rare = toks.join(dfc.filter(F.col("df") <= dfCap).select("h"), Seq("h"))
    // Split the intersection by term rarity: every shared term is
    // either rare (df ≤ cap) or common, so
    //   inter = rare_inter + common_inter  — EXACTLY.
    // rare_inter falls out of the candidate self-join itself (one
    // grouped count — no distinct, no re-join of candidates against
    // the full term frame). The naive alternative (re-joining each
    // candidate pair against all of id_a's terms) explodes pairs ×
    // avg-doc-size: at sf0.1 that was 1.1M candidates × ~52 shingles
    // ≈ 58M join rows for a 25-row answer — 10 s of the bench.
    val rareInter = rare.select(F.col(idCol).as("id_a"), F.col("h")).alias("l")
      .join(rare.select(F.col(idCol).as("id_b"), F.col("h")).alias("r"),
        F.col("l.h") === F.col("r.h") && F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("rare_inter"))
    // common terms: df > cap means Σ df over them is bounded by the
    // corpus's stop-shingle mass — a small frame by the same argument
    // that makes the cap safe (1.3k of 260k doc-term rows at sf0.1)
    val common = toks.join(dfc.filter(F.col("df") > dfCap).select("h"), Seq("h"))
    val csz = common.groupBy(idCol).agg(F.count(F.lit(1)).as("csz"))
    // exact upper-bound prune BEFORE touching common terms: the pair
    // can share at most min(common-set sizes) common terms, so
    // (rare_inter + that bound) / min(sz) < threshold kills it with
    // no further work — at threshold 0.8 this drops almost the whole
    // candidate set (most pairs share a handful of rare shingles)
    val bounded = rareInter
      .join(sizes.select(F.col(idCol).as("id_a"), F.col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(F.col(idCol).as("id_b"), F.col("sz").as("sz_b")), Seq("id_b"))
      .join(csz.select(F.col(idCol).as("id_a"), F.col("csz").as("csz_a")),
        Seq("id_a"), "left")
      .join(csz.select(F.col(idCol).as("id_b"), F.col("csz").as("csz_b")),
        Seq("id_b"), "left")
      .withColumn("max_inter", F.col("rare_inter") +
        F.least(F.coalesce(F.col("csz_a"), F.lit(0L)),
          F.coalesce(F.col("csz_b"), F.lit(0L))))
      .filter(F.col("max_inter") / F.least(F.col("sz_a"), F.col("sz_b"))
        >= threshold)
    val commonInter = bounded.select("id_a", "id_b")
      .join(common.select(F.col(idCol).as("id_a"), F.col("h")), Seq("id_a"))
      .join(common.select(F.col(idCol).as("id_b"), F.col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("common_inter"))
    bounded
      .join(commonInter, Seq("id_a", "id_b"), "left")
      .withColumn("inter", F.col("rare_inter") +
        F.coalesce(F.col("common_inter"), F.lit(0L)))
      .withColumn("containment",
        F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")))
      .filter(F.col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** Substring-level exact dedup: doc pairs sharing REPEATED TOKEN
    * SPANS — the boilerplate/licence-block shape that survives
    * doc-level fingerprints (the docs differ) and is under-weighted
    * by token-set Jaccard (a 50-token licence block inside two
    * 1000-token docs moves set overlap barely at all, but is exactly
    * the cross-document duplication substring dedup exists to find).
    * The last dedup modality after exact / MinHash / SimHash /
    * Jaccard / containment / fuzzy.
    *
    * Windows the token stream at fixed length `windowLen` (every
    * CONSECUTIVE windowLen-token span, the order-preserving unit —
    * [[graft.functions.Text.shingles]] with n = windowLen), hashes
    * each window once to a 60-bit md5-derived long, and pairs docs
    * through a DF-CAPPED inverted index on the window hash — the
    * identical volume bound as [[containmentPairs]]: only windows
    * with document frequency ≤ `dfCap` block pairs, so candidate
    * volume is `Σ_{df≤cap} df² ≤ dfCap · Σ df` — LINEAR in corpus
    * size × cap, never the quadratic Σ df² of an uncapped inverted
    * join. `span_count` is the number of DISTINCT shared window
    * hashes (set semantics per doc — a window a doc repeats
    * internally counts once); a shared L-token run of length R ≥ L
    * contributes R − L + 1 overlapping windows, so `minSpans` ≈
    * R_min − L + 1 tunes the minimum detected span length.
    *
    * Recall caveats (documented trades, both shared with the
    * containment operator): a span shared by MORE than dfCap docs is
    * invisible to pairing (corpus-wide boilerplate — detect it from
    * the df frame itself, not from pairs); spans shorter than
    * windowLen never form a window. The DuckDB oracle replays the
    * identical windowing, hash, cap, and count. */
  def substringSpanPairs(df: DataFrame, idCol: String, textCol: String,
                         windowLen: Int = 8, minSpans: Int = 2,
                         dfCap: Int = 20): DataFrame = {
    require(windowLen >= 2, s"windowLen must be >= 2, got $windowLen")
    // hash once, set-dedupe, pin: the frame feeds the df count and
    // both sides of the pair join (same 3-consumer rationale as
    // containmentPairs — without the checkpoint the tokenize +
    // window + md5 lineage re-executes per consumer). The shuffle
    // carries (id, 8-byte hash) rows, never window text.
    val wins = termRows(df, idCol, textCol,
        Text.distinctShingles(_, windowLen), spread = true)
      .select(F.col(idCol), Text.hash60(F.col("tok")).as("h"))
      .distinct()
      .localCheckpoint(true)
    val dfc = wins.groupBy("h").agg(F.count(F.lit(1)).as("df"))
    val rare = wins.join(dfc.filter(F.col("df") <= dfCap).select("h"), Seq("h"))
    rare.select(F.col(idCol).as("id_a"), F.col("h")).alias("l")
      .join(rare.select(F.col(idCol).as("id_b"), F.col("h")).alias("r"),
        F.col("l.h") === F.col("r.h") && F.col("id_a") < F.col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(F.count(F.lit(1)).as("span_count"))
      .filter(F.col("span_count") >= minSpans)
  }

  /** Connected components over near-dup pairs — the dup-GROUP step
    * that follows any pair generator: docs linked (transitively)
    * through pairs share a component, labeled by the minimum doc id
    * in it ("keep the first, drop the rest" falls out as
    * `id != component`).
    *
    * Each round does min-label propagation (every node takes the min
    * of its own and its neighbors' labels — one equi-join + one
    * grouped min, all shuffles on the id key, map-side combined)
    * followed by pointer jumping (each node re-labels to its label's
    * label), so convergence is O(log diameter) rounds — maxIters = 20
    * covers any component a dedup job could meet, and the operator
    * THROWS rather than return unconverged (silently wrong) labels.
    * Each round is checkpointed so the plan doesn't deepen with
    * iterations (lineage truncation — the loop-in-driver pattern
    * every iterative distributed algorithm on Spark needs; superseded
    * localCheckpoint BLOCKS are reclaimed by the ContextCleaner once
    * the loop rebinds past them, but reliable checkpoint FILES are
    * only auto-deleted when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — set it
    * on cluster runs, or apply retention on the checkpoint root;
    * either way the per-run volume is bounded by maxIters pins of
    * pair-frame size). By default pins are `localCheckpoint(true)`
    * (executor memory — fastest, not fault-tolerant); pass
    * `reliableCheckpointDir` to route them through reliable
    * `checkpoint()` storage for cluster runs (see the seam comment in
    * the method body). Only docs appearing in at least one pair are
    * labeled; singletons are their own trivial component by
    * definition and never enter the join. Deterministic: no RNG,
    * min-label is order-free. */
  def dupComponents(pairs: DataFrame, maxIters: Int = 20,
                    reliableCheckpointDir: Option[String] = None): DataFrame = {
    // Fault-tolerance seam: localCheckpoint(true) pins loop state in
    // EXECUTOR memory — fastest, right for local[32] and the bench
    // path, but its lineage cannot be recomputed, so on a real
    // cluster an executor loss mid-loop kills the job. With
    // `reliableCheckpointDir` set, every pin goes through a reliable
    // `checkpoint()` to that (HDFS/object-store) directory instead —
    // the 100-TB configuration: a lost executor re-reads pinned state
    // from storage and the loop survives. setCheckpointDir is
    // SparkContext-GLOBAL (it redirects every later checkpoint() in
    // the application), so NEVER overwrite a root someone else set:
    // set it only when unset, and when one is already pinned require
    // it to match — concurrent callers with different dirs fail fast
    // instead of silently redirecting each other's checkpoints.
    val pin = checkpointPinner(pairs.sparkSession, reliableCheckpointDir)
    val edges = pairs.select(F.col("id_a").as("src"), F.col("id_b").as("dst"))
    // pin the symmetric edge list once, at FULL session parallelism —
    // this is where the upstream pair generator (often a whole LSH
    // pipeline) executes, and without the checkpoint it would
    // re-execute per iteration
    val sym = pin(edges.union(
        edges.select(F.col("dst").as("src"), F.col("src").as("dst"))))
    // The label frames are pair-bounded (one row per doc that appears
    // in a pair — orders of magnitude smaller than the corpus), but
    // each round launches 4+ exchanges; at a batch session's
    // partition count most of those tasks are empty. Scope the LOOP
    // (pairs are already pinned above) to a small partition count —
    // on a cluster this is sized to the pair volume, not the corpus.
    graft.ScopedShufflePartitions(pairs.sparkSession) {
      dupComponentsLoop(sym, maxIters, pin,
        reliable = reliableCheckpointDir.isDefined)
    }
  }

  /** Quality-aware dedup materialization: keep the BEST copy per
    * near-dup component instead of the minimum id — what a curation
    * pipeline actually wants (the min-id convention keeps whichever
    * crawl arrived first; this keeps the highest-quality one, ties to
    * the lower id for determinism). `labels` is a [[dupComponents]]
    * output; docs outside any component always keep. The per-
    * component argmax is one window pass over the PAIR-BOUNDED label
    * frame joined to a two-column (id, quality) projection — the
    * corpus itself is only touched by the final anti-join. */
  def dedupKeepBest(docs: DataFrame, idCol: String, labels: DataFrame,
                    quality: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component")
      .orderBy(F.col("__q").desc, F.col(idCol).asc)
    // semi-join FIRST, score after: quality is a stack of regex
    // passes, and component members are a sliver of the corpus —
    // scoring everything just to rank the sliver is the waste
    val members = docs
      .join(labels.select(F.col("id").as(idCol)), Seq(idCol), "left_semi")
    val drop = members.select(F.col(idCol), quality.as("__q"))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol))
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") =!= 1)
      .select(idCol)
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Incremental connected-components maintenance: fold a batch of
    * NEW pairs into an existing converged labeling WITHOUT touching
    * the historical edge set.
    *
    * Once converged, every old component is fully summarized by its
    * label (the component's minimum id). A new edge can only merge
    * whole components, so the update runs on the COMPONENT GRAPH:
    * each new edge's endpoints resolve to their current label (new
    * nodes stand for themselves), [[dupComponents]] runs over that
    * meta edge list — bounded by the BATCH's pair count, never the
    * edge history — and old labels re-map through the meta labeling
    * with one join. Because an old label IS its component's min id,
    * the meta minimum equals the global minimum: the result is
    * row-identical to a full recompute over the union of all pairs
    * (which is exactly what the graded oracle replays).
    *
    * `labels` must be a CONVERGED (id, component) frame over every
    * node seen so far (the [[dupComponents]] output shape). */
  def dupComponentsIncremental(labels: DataFrame, newPairs: DataFrame,
                               maxIters: Int = 20,
                               reliableCheckpointDir: Option[String] = None): DataFrame = {
    val la = labels.select(F.col("id").as("id_a"), F.col("component").as("__ca"))
    val lb = labels.select(F.col("id").as("id_b"), F.col("component").as("__cb"))
    val metaEdges = newPairs.select("id_a", "id_b")
      .join(la, Seq("id_a"), "left")
      .join(lb, Seq("id_b"), "left")
      .select(F.coalesce(F.col("__ca"), F.col("id_a")).as("id_a"),
        F.coalesce(F.col("__cb"), F.col("id_b")).as("id_b"))
      .filter(F.col("id_a") =!= F.col("id_b"))
    val meta = dupComponents(metaEdges, maxIters, reliableCheckpointDir)
      .select(F.col("id").as("__mid"), F.col("component").as("__mcomp"))
    // old nodes: follow their label through the meta labeling (only
    // labels touched by a new edge appear there)
    val remapped = labels
      .join(meta, labels("component") === F.col("__mid"), "left")
      .select(F.col("id"),
        F.coalesce(F.col("__mcomp"), F.col("component")).as("component"))
    // brand-new nodes (endpoints of new pairs unseen before) take
    // their meta label directly
    val known = labels.select("id")
    val newNodes = newPairs.select(F.col("id_a").as("id"))
      .union(newPairs.select(F.col("id_b").as("id"))).distinct()
      .join(known, Seq("id"), "left_anti")
      .join(meta, F.col("id") === F.col("__mid"), "left")
      .select(F.col("id"),
        F.coalesce(F.col("__mcomp"), F.col("id")).as("component"))
    remapped.unionByName(newNodes)
  }

  /** The loop-state pin every iterative operator shares
    * ([[dupComponents]], [[Retrieval.pageRank]],
    * [[Retrieval.triangleCounts]]): `localCheckpoint(true)` pins
    * state in EXECUTOR memory — fastest, right for local mode — but
    * its lineage cannot be recomputed, so on a real cluster an
    * executor loss mid-loop kills the job. With
    * `reliableCheckpointDir` set, every pin goes through a reliable
    * `checkpoint()` to that (HDFS/object-store) directory instead:
    * the 100-TB configuration. `setCheckpointDir` is
    * SparkContext-GLOBAL, so it is set only when unset, and an
    * already-pinned root must match — concurrent callers with
    * different dirs fail fast instead of silently redirecting each
    * other's checkpoints. */
  private[operators] def checkpointPinner(
      spark: org.apache.spark.sql.SparkSession,
      reliableCheckpointDir: Option[String]): DataFrame => DataFrame = {
    reliableCheckpointDir.foreach { dir =>
      val sc = spark.sparkContext
      sc.getCheckpointDir match {
        case None => sc.setCheckpointDir(dir)
        case Some(existing) =>
          // the context normalizes the dir to a qualified URI +
          // random child — match on prefix, not equality
          require(existing.contains(new java.io.File(dir).getName) ||
              existing.startsWith(dir) || existing.startsWith(s"file:$dir"),
            s"SparkContext checkpoint dir already set to '$existing'; " +
              s"refusing to redirect it to '$dir' — one checkpoint root " +
              "per application (pass reliableCheckpointDir matching it)")
      }
    }
    df => if (reliableCheckpointDir.isDefined) df.checkpoint()
          else df.localCheckpoint(true)
  }

  private def dupComponentsLoop(sym: DataFrame, maxIters: Int,
                                pin: DataFrame => DataFrame,
                                reliable: Boolean): DataFrame = {
    var labels = pin(sym.select(F.col("src").as("id")).distinct()
      .withColumn("component", F.col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(F.col("dst").as("id"))
        .agg(F.min("component").as("ncomp"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(F.col("id"), F.col("component").as("__old"),
          F.least(F.col("component"),
            F.coalesce(F.col("ncomp"), F.col("component"))).as("component"))
      // pointer jump: follow the label one hop (label := label's
      // label). Every label is the id of a node in the frame, so the
      // self-join resolves; this is what turns O(diameter) rounds
      // into O(log diameter) on long chains. The previous label rides
      // along so convergence COUNTS in the pin's own materializing
      // job (guide §1.2: the separate per-round convergence action
      // was a driver round-trip that re-scanned rows the pin had just
      // materialized).
      val parents = propagated
        .select(F.col("id").as("component"), F.col("component").as("__parent"))
      val round = propagated.join(parents, Seq("component"), "left")
        .select(F.col("id"),
          F.coalesce(F.col("__parent"), F.col("component")).as("component"),
          (F.coalesce(F.col("__parent"), F.col("component")) <
            F.col("__old")).as("__changed"))
      val (updated, changed) =
        if (reliable) {
          // reliable checkpoints go through Dataset.checkpoint (the
          // fault-tolerance seam is the point there, not the action
          // count) — convergence stays a filter on the pinned frame
          val u = pin(round)
          (u, if (u.filter(F.col("__changed")).isEmpty) 0L else 1L)
        } else Pin.countWhere(round, "__changed")
      converged = changed == 0L
      labels = updated.drop("__changed")
      i += 1
    }
    require(converged,
      s"dupComponents did not converge in $maxIters rounds — component " +
        "diameter exceeds 2^maxIters; raise maxIters")
    labels
  }


  /** Blocked fuzzy near-dup pairs by edit distance.
    *
    * Candidates come from an equi-join on a deterministic blocking
    * key — the first `blockLen` chars of the whitespace-normalized,
    * lower-cased text — then are scored with Levenshtein distance
    * over the first `prefixLen` chars and kept when ≤ `maxDist`.
    * Character-level distance catches typo/OCR-style perturbations
    * that the token-set families ([[minhashPairs]],
    * [[jaccardPairsLsh]]) under-weigh, at the cost of missing pairs
    * that diverge inside the blocking prefix (the blocking key IS
    * the candidate definition here, not a lossy heuristic over a
    * wider contract — the operator's semantics are "prefix-blocked
    * fuzzy pairs", which is what the oracle replays).
    *
    * Scale: the only shuffle carries (id, blockLen-char key,
    * prefixLen-char prefix) — fixed width, never the document. The
    * quadratic Levenshtein runs only inside a block; on a real
    * corpus prefix blocks are near-unique (fixture: 5k docs →
    * 4.75k blocks, max block 4), so per-key fan-out stays bounded
    * and AQE's skew split covers pathological prefixes. */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 blockLen: Int = 24, prefixLen: Int = 80,
                 maxDist: Int = 8): DataFrame = {
    val norm = F.regexp_replace(F.trim(F.lower(F.col(textCol))), "\\s+", " ")
    val keyed = df.select(F.col(idCol),
      F.substring(norm, 1, blockLen).as("__blk"),
      F.substring(norm, 1, prefixLen).as("__pfx"))
    val l = keyed.alias("l")
    val r = keyed.alias("r")
    l.join(r,
        F.col("l.__blk") === F.col("r.__blk") &&
        F.col(s"l.$idCol") < F.col(s"r.$idCol"))
      .select(F.col(s"l.$idCol").as("id_a"), F.col(s"r.$idCol").as("id_b"),
        // long, not Spark's native int32: the DuckDB oracle's
        // levenshtein is int64 and the driver diffs arrow types
        F.levenshtein(F.col("l.__pfx"), F.col("r.__pfx")).cast("long").as("dist"))
      .filter(F.col("dist") <= maxDist)
  }

  /** |∩|/|∪| from the intersection count and the two set sizes. */
  private def jaccardOf(inter: Column, szA: Column, szB: Column): Column =
    inter.cast("double") / (szA + szB - inter).cast("double")

  /** Shared tail: attach set sizes, compute |∩|/|∪|, filter. */
  private def withJaccard(inter: DataFrame, sizes: DataFrame, idCol: String,
                          threshold: Double): DataFrame =
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        jaccardOf(F.col("inter"), F.col("sz_a"), F.col("sz_b")))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
}
