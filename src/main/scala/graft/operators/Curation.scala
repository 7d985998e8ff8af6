package graft.operators

import graft.functions.Text
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Corpus-curation operators for training-data pipelines (north-star
  * extension): benchmark decontamination, repetition-based quality
  * filtering, and deterministic sampling/quota capping.
  *
  * Scale design:
  *  - Decontamination is an equi-join on the shared n-gram — pair
  *    volume is Σ over grams of df_train(g)·df_bench(g), never the
  *    train×bench cross space; the benchmark gram set is tiny in
  *    practice and AQE broadcasts it.
  *  - Repetition metrics are two map-side-combinable grouped passes
  *    over the exploded n-gram frame (no per-row quadratic scans).
  *  - Hash sampling is a map-only filter (no shuffle, no RNG — the
  *    md5-derived hash makes the sample reproducible on any engine).
  *  - Quota capping is a per-group top-k; the hash order makes the
  *    kept subset deterministic and uniformly spread.
  */
object Curation {

  /** Training docs contaminated by a benchmark/eval split: docs
    * outside `benchPred` sharing at least one distinct word `n`-gram
    * with any doc inside it, with the count of shared distinct grams.
    *
    * This is the standard n-gram-overlap decontamination pass run
    * before pre-training (drop or audit the returned ids). The join
    * key is the gram string itself — exact, no hash false-positives;
    * the benchmark side is `distinct` gram values only, so its
    * footprint is the eval corpus's vocabulary, not its row count. */
  def contaminated(df: DataFrame, idCol: String, textCol: String,
                   benchPred: Column, n: Int = 4): DataFrame = {
    def grams(d: DataFrame): DataFrame =
      d.select(F.col(idCol),
          F.explode(Text.distinctShingles(F.col(textCol), n)).as("g"))
        .filter(F.col("g") =!= "")
    val benchGrams = grams(df.filter(benchPred)).select("g").distinct()
    grams(df.filter(!benchPred))
      .join(benchGrams, Seq("g"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_shared"))
  }

  /** The decontaminated corpus: `df` minus [[contaminated]] docs (the
    * benchmark rows themselves are kept — they are the eval set). */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
                    benchPred: Column, n: Int = 4): DataFrame =
    df.join(contaminated(df, idCol, textCol, benchPred, n).select(idCol),
      Seq(idCol), "left_anti")

  /** Near-duplicate decontamination — the fuzzy complement of
    * [[contaminated]]: flags training docs whose MinHash-estimated
    * Jaccard against ANY benchmark doc reaches `threshold`, catching
    * the paraphrased / lightly-edited eval leakage an exact n-gram
    * equi-join can never see. One audit row per contaminated doc
    * with its benchmark-match count and strongest match score.
    * Candidates come from [[Dedup.minhashCrossPairs]]' banded
    * equi-join — never a training × benchmark cross join. */
  def contaminatedFuzzy(df: DataFrame, idCol: String, textCol: String,
                        benchPred: Column, k: Int = 16, bands: Int = 4,
                        threshold: Double = 0.5,
                        terms: Column => Column = Text.distinctTokens(_)): DataFrame =
    graft.operators.Dedup
      .minhashCrossPairs(df.filter(!benchPred), df.filter(benchPred),
        idCol, textCol, k, bands, threshold, terms)
      .withColumnRenamed("id_a", idCol)
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_bench_matches"),
        // est values are multiples of 1/k — exact doubles, so max is
        // engine-deterministic
        F.max("est_jaccard").as("max_est_jaccard"))

  /** [[contaminated]] with a Bloom pre-filter (the 100 TB shape):
    * the benchmark gram set is folded into a Bloom filter, shipped
    * once per executor as an explicit broadcast variable, and applied
    * MAP-SIDE over the training grams — the overwhelming majority of
    * the corpus's grams (the
    * ones appearing in no benchmark doc) die before the shuffle, so
    * the exchange carries only probable hits instead of every gram
    * occurrence in the training corpus. Candidates that survive are
    * confirmed by the same exact equi-join as [[contaminated]];
    * Bloom filters have no false negatives, so the result is
    * RESULT-IDENTICAL to the exact operator (same oracle validates
    * both) — `fpp` only tunes how much dead traffic leaks through.
    *
    * At 1000 executors this is the difference between shuffling the
    * full corpus gram stream (~tokens-per-corpus rows) and shuffling
    * ~df_bench-weighted hits; the filter itself is a few MB for
    * millions of benchmark grams at fpp 0.01. */
  def contaminatedBloom(df: DataFrame, idCol: String, textCol: String,
                        benchPred: Column, n: Int = 4,
                        fpp: Double = 0.01): DataFrame = {
    def grams(d: DataFrame): DataFrame =
      d.select(F.col(idCol),
          F.explode(Text.distinctShingles(F.col(textCol), n)).as("g"))
        .filter(F.col("g") =!= "")
    // cached across the two EAGER consumers (sizing count, Bloom
    // build) — without the persist each action would re-tokenize the
    // benchmark side from scratch; released below once both have run
    val benchGrams = grams(df.filter(benchPred)).select("g").distinct().cache()
    // expectedNumItems: one pass over the (small) benchmark side to
    // size the filter; the count is cheap relative to mis-sizing it
    val nBench = math.max(benchGrams.count(), 1L)
    // explicit broadcast variable: shipped to each executor ONCE and
    // referenced from the UDF, instead of being serialized into every
    // task's closure (at fpp 0.01 over millions of grams the filter is
    // MBs — per-task shipping would dominate at 1000 executors)
    val bloomBc = df.sparkSession.sparkContext
      .broadcast(benchGrams.stat.bloomFilter("g", nBench, fpp))
    // both eager actions are done — release the cached blocks rather
    // than leaking them for the session's lifetime. The exact-confirm
    // join below recomputes the (small) benchmark gram set once,
    // lazily, at execution time; the Bloom broadcast itself is
    // released by Spark's ContextCleaner once the returned plan is
    // garbage-collected
    benchGrams.unpersist(false)
    grams(df.filter(!benchPred))
      // map-side kill, no shuffle yet — native codegen'd probe (a
      // Scala UDF would box every gram and break the codegen span)
      .filter(graft.plans.BloomMightContain.probe(F.col("g"), bloomBc))
      .join(benchGrams, Seq("g")) // exact confirm: no false positives
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_shared"))
  }

  /** Containment decontamination — the subsumption complement of
    * [[contaminated]] and [[contaminatedFuzzy]]: flags training docs
    * that CONTAIN a benchmark doc's shingle set at `threshold`
    * (`|train∩bench| / |bench|`). A benchmark passage quoted verbatim
    * inside a much longer training doc has near-1.0 containment but
    * tiny Jaccard (the union is dominated by the long doc), so
    * neither the exact n-gram count nor MinHash — which estimates
    * Jaccard — surfaces it reliably; this is the leak shape that most
    * directly inflates eval scores.
    *
    * Same scale discipline as [[graft.operators.Dedup.containmentPairs]]:
    * candidates from rare training shingles only (document frequency
    * over the TRAINING corpus ≤ `dfCap` — linear volume, stop-shingle
    * mass never pairs), intersection split by rarity (`inter =
    * rare_inter + common_inter`, the common side a small frame by
    * construction), and an exact upper-bound prune before the common
    * join. Documented recall caveat: a benchmark doc sharing ONLY
    * corpus-common shingles with its containing doc is invisible —
    * the same trade the cap buys in containmentPairs.
    *
    * One audit row per contaminated training doc: benchmark-hit
    * count and the strongest containment. */
  def contaminatedContainment(df: DataFrame, idCol: String, textCol: String,
                              benchPred: Column, threshold: Double = 0.5,
                              dfCap: Int = 20,
                              terms: Column => Column = Text.distinctShingles(_, 3)): DataFrame = {
    // parallelism floor before the explode: same one-dominant-CPU-
    // stage rationale as containmentPairs' term frame ([[Spread]])
    def termSet(d: DataFrame): DataFrame =
      Spread.floor(d.select(F.col(idCol), F.col(textCol)))
        .select(F.col(idCol),
          F.explode(terms(F.col(textCol))).as("tok"))
        .filter(F.col("tok") =!= "")
        .select(F.col(idCol), Text.hash60(F.col("tok")).as("h"))
        .distinct()
    // hash once, pin: each side feeds multiple subtrees below
    val train = termSet(df.filter(!benchPred)).localCheckpoint(true)
    val bench = termSet(df.filter(benchPred))
      .withColumnRenamed(idCol, "bench_id").localCheckpoint(true)
    val bsz = bench.groupBy("bench_id").agg(F.count(F.lit(1)).as("bsz"))
    val dfc = train.groupBy("h").agg(F.count(F.lit(1)).as("df"))
    val rareTrain = train.join(dfc.filter(F.col("df") <= dfCap).select("h"), Seq("h"))
    val commonTrain = train.join(dfc.filter(F.col("df") > dfCap).select("h"), Seq("h"))
    // candidate (train, bench) pairs + their rare-term intersection in
    // one grouped count — never a train × bench cross join
    val rareInter = rareTrain.join(bench, Seq("h"))
      .groupBy(idCol, "bench_id")
      .agg(F.count(F.lit(1)).as("rare_inter"))
    // per-benchmark-doc count of its shingles that are corpus-common:
    // the exact upper bound on what the common join can still add
    val bcz = bench.join(commonTrain.select("h").distinct(), Seq("h"))
      .groupBy("bench_id").agg(F.count(F.lit(1)).as("bcsz"))
    val bounded = rareInter
      .join(bsz, Seq("bench_id"))
      .join(bcz, Seq("bench_id"), "left")
      .withColumn("max_inter", F.col("rare_inter") +
        F.coalesce(F.col("bcsz"), F.lit(0L)))
      .filter(F.col("max_inter") / F.col("bsz") >= threshold)
    val commonInter = bounded.select(F.col(idCol), F.col("bench_id"))
      .join(commonTrain, Seq(idCol))
      .join(bench, Seq("bench_id", "h"))
      .groupBy(idCol, "bench_id")
      .agg(F.count(F.lit(1)).as("common_inter"))
    bounded
      .join(commonInter, Seq(idCol, "bench_id"), "left")
      .withColumn("containment",
        (F.col("rare_inter") + F.coalesce(F.col("common_inter"), F.lit(0L)))
          / F.col("bsz"))
      .filter(F.col("containment") >= threshold)
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_bench_contained"),
        F.max("containment").as("max_containment"))
  }

  /** Per-source vocabulary coverage against the corpus's top-`k`
    * tokens — the tokenizer-sizing signal: how much of each source's
    * token stream a fixed-size vocab would cover. The corpus is
    * tokenized ONCE: a single map-side-combinable groupBy reduces
    * the token stream to per-(source, token) counts, and everything
    * downstream — the global top-k vocab (ties broken on the token
    * text so the boundary is deterministic) and the per-source
    * rollup — runs over those counts, never re-reading the corpus.
    * The two count branches share the same exchange (ReuseExchange),
    * and the k-row vocab broadcasts into the rollup. Coverage is an
    * exact-integer ratio: both engines divide the same two BIGINTs,
    * so the double is bit-identical. */
  def vocabCoverage(df: DataFrame, sourceCol: String, textCol: String,
                    k: Int): DataFrame = {
    val counts = df.select(F.col(sourceCol),
        F.explode(Text.tokens(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
      .groupBy(sourceCol, "tok").agg(F.count(F.lit(1)).as("c"))
    val vocab = counts.groupBy("tok").agg(F.sum("c").as("ct"))
      .orderBy(F.col("ct").desc, F.col("tok").asc).limit(k)
      .select("tok").withColumn("in_vocab", F.lit(1L))
    counts.join(F.broadcast(vocab), Seq("tok"), "left")
      .groupBy(sourceCol)
      .agg(F.coalesce(F.sum("c"), F.lit(0L)).as("n_tokens"),
        F.coalesce(F.sum(F.coalesce(F.col("in_vocab"), F.lit(0L)) * F.col("c")),
          F.lit(0L)).as("n_in_vocab"))
      .withColumn("coverage",
        F.col("n_in_vocab").cast("double") / F.col("n_tokens").cast("double"))
  }

  /** Deterministic stratified train/val/test assignment: each row's
    * split is a pure function of its id hash (`hash60(id) % 100` —
    * first `trainPct` buckets → train, next `valPct` → val, rest →
    * test). Map-only, no RNG, no shuffle: the same document lands in
    * the same split on every engine, run, and cluster size, and new
    * data appended later NEVER reshuffles existing assignments — the
    * property that keeps a 100 TB corpus's held-out split stable
    * across ingest rounds. Adds the column `split`. */
  def assignSplit(df: DataFrame, idCol: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    require(!df.columns.contains("split"),
      "assignSplit reserves the output column name 'split'; rename it on the input")
    val bucket = Text.hash60(F.col(idCol)) % 100
    df.withColumn("split",
      F.when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Fixed-size overlapping token-window chunking — the document →
    * model-context segmentation step (RAG indexing, long-doc
    * training). Each document yields `max(1, ceil((n-size)/stride)+1)`
    * chunks of `size` tokens starting every `stride` tokens; the last
    * chunk may be shorter. Output: one row per chunk with its ordinal,
    * token count, and an md5 fingerprint of the joined chunk text
    * (the dedup/index key — the chunk BODY stays out of downstream
    * shuffles unless explicitly selected).
    *
    * Map-only: the chunk index is generated per row with `sequence` +
    * `explode` and sliced from one tokenization — no shuffle, no
    * re-tokenization per chunk, linear in corpus size. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    require(!df.columns.exists(Seq("chunk_id", "n_chunk_tokens", "chunk_fp").contains),
      "chunkDocs reserves output column names 'chunk_id', 'n_chunk_tokens', 'chunk_fp'")
    val toks = Text.tokens(F.col(textCol))
    val n = F.size(toks)
    // chunks fully covering the doc: one when n <= size, else one per
    // stride start until the window reaches the end
    val nChunks = F.when(n <= size, F.lit(1L))
      .otherwise(F.ceil((n - size).cast("double") / stride) + 1L)
    df.select(F.col(idCol), toks.as("__toks"),
        F.explode(F.sequence(F.lit(0L), nChunks - 1L)).as("chunk_id"))
      .select(F.col(idCol), F.col("chunk_id"),
        F.slice(F.col("__toks"), (F.col("chunk_id") * stride + 1L).cast("int"),
          F.lit(size)).as("__chunk"))
      .select(F.col(idCol), F.col("chunk_id"),
        F.size(F.col("__chunk")).cast("long").as("n_chunk_tokens"),
        F.md5(F.array_join(F.col("__chunk"), " ")).as("chunk_fp"))
  }

  /** Per-doc repetition metrics (Gopher-style quality filters):
    * bigram count, most-frequent-bigram fraction, duplicated-bigram
    * fraction, and the keep/drop verdict at `maxTopFrac`.
    *
    * Both fractions come from one exploded-bigram frame aggregated
    * twice ((id, gram) counts, then per-id max/sum/distinct) — every
    * shuffle is map-side combined and carries (id, gram-count) rows
    * only, never text. */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
                        maxTopFrac: Double = 0.08): DataFrame = {
    val counts = df
      .select(F.col(idCol), F.explode(Text.shingles(F.col(textCol), 2)).as("g"))
      .filter(F.col("g") =!= "")
      .groupBy(idCol, "g")
      .agg(F.count(F.lit(1)).as("c"))
    counts.groupBy(idCol)
      .agg(F.sum("c").as("n_bigrams"),
        F.max("c").as("__maxc"),
        F.count(F.lit(1)).as("__ndistinct"))
      .select(F.col(idCol),
        F.col("n_bigrams"),
        (F.col("__maxc").cast("double") / F.col("n_bigrams").cast("double"))
          .as("top_bigram_frac"),
        (F.lit(1.0) - F.col("__ndistinct").cast("double") /
          F.col("n_bigrams").cast("double")).as("dup_bigram_frac"),
        (F.col("__maxc").cast("double") / F.col("n_bigrams").cast("double")
          <= maxTopFrac).as("keep"))
  }

  /** Deterministic Bernoulli-by-hash sample: keeps rows whose
    * md5-derived id hash lands under `pct` of 100 buckets. Map-only
    * (no shuffle, no seed state); the same row is kept on every
    * engine, every run, every cluster size — which is what makes
    * held-out splits of a 100 TB corpus reproducible. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(Text.hash60(F.col(idCol)) % 100 < pct)

  /** Deterministic WEIGHTED sampling: row kept iff
    * `hash60(id) % granularity < floor(weight · rate · granularity)`
    * — keep probability proportional to a per-row weight column
    * (quality score, source priority), with the same map-only,
    * RNG-free, engine-portable properties as [[hashSample]]. The
    * standard quality-proportional downsample of a web corpus: high
    * quality survives at `rate`, junk at `quality·rate`. Weights are
    * clamped to [0, 1]. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     rate: Double, granularity: Int = 10000): DataFrame = {
    require(rate > 0.0 && rate <= 1.0, s"rate must be in (0,1], got $rate")
    val w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    df.filter(Text.hash60(F.col(idCol)) % granularity <
      F.floor(w * (rate * granularity)))
  }

  /** Temperature-based source mixing — the multilingual/multi-source
    * rebalancing step of a pre-training data recipe: each group's
    * share of a token `budget` is proportional to `n_g^alpha` (alpha
    * = 1 keeps natural proportions, alpha → 0 approaches uniform —
    * the classic `p^(1/T)` upsampling of low-resource sources), and
    * rows are then kept by the same deterministic md5-hash gate as
    * [[hashSample]] at each group's derived rate (clamped at 1: a
    * group can't be upsampled past its actual size without
    * duplication, which is a training-recipe decision, not a
    * sampling one).
    *
    * Engine-exact by construction: group weights `round(n_g^alpha,
    * 6)` absorb the 1-ulp `pow` differences between runtimes, their
    * total sums as DECIMAL (merge-order-free), and everything
    * downstream is deterministic IEEE arithmetic on identical
    * inputs — the keep decision replays bit-for-bit in the oracle.
    *
    * Scale: one map-side-combined count per group, a group-count-
    * sized rate frame broadcast back, and a map-only filter — no
    * shuffle touches the corpus beyond the count. */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
                     weight: Column, alpha: Double, budget: Long,
                     granularity: Int = 10000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    // Guard the weight column, not just the scalars (round-11 advice):
    // a group whose summed weight is 0 or NULL (all-NULL weights, or a
    // weight expression that can go non-positive) would make keep_rate
    // NaN/NULL and the hash-gate filter would then silently DROP the
    // whole group — fail loudly naming the group instead. Lazy (a
    // per-row conditional on the |groups|-sized frame), so the
    // operator still builds a pure plan. Unreachable with
    // Text.tokenCount weights (always ≥ 1); latent for custom ones.
    val counts = df.groupBy(groupCol)
      .agg(F.sum(weight.cast("long")).as("n_g"))
      .withColumn("n_g",
        F.when(F.col("n_g").isNull || F.col("n_g") <= 0,
          F.raise_error(F.concat(
            F.lit("temperatureMix: group "), F.col(groupCol).cast("string"),
            F.lit(" has non-positive/NULL total weight — its keep_rate " +
              "would be NaN and the group silently dropped")))
            .cast("long"))
          .otherwise(F.col("n_g")))
    val weighted = counts.withColumn("w",
      F.round(F.pow(F.col("n_g").cast("double"), alpha), 6))
    val tot = weighted.agg(
      F.sum(F.col("w").cast("decimal(24,6)")).cast("double").as("__wsum"))
    val rates = weighted.crossJoin(F.broadcast(tot))
      .withColumn("keep_rate", F.least(F.lit(1.0),
        F.col("w") / F.col("__wsum") * budget / F.col("n_g")))
      .select(F.col(groupCol), F.col("keep_rate"))
    df.join(F.broadcast(rates), Seq(groupCol))
      .filter(Text.hash60(F.col(idCol)) % granularity <
        F.floor(F.col("keep_rate") * granularity))
      .drop("keep_rate")
  }

  /** Per-group quota cap (RefinedWeb-style source/domain capping):
    * keeps at most `quota` rows per `groupCol` value, chosen by the
    * deterministic md5-hash order of ids (a reproducible uniform
    * subsample of each group, not "whatever sorted first").
    *
    * One shuffle on the group key. Groups far exceeding the quota
    * still sort fully within their partition (rank-then-filter); for
    * heavily skewed group sizes, pre-filter with [[hashSample]] at a
    * rate that bounds the expected group size near the quota, then
    * cap exactly. */
  def quotaPerGroup(df: DataFrame, idCol: String, groupCol: String,
                    quota: Int): DataFrame = {
    // `rk` is this operator's output rank column; a same-named input
    // column would be silently overwritten by withColumn — fail fast
    require(!df.columns.contains("rk"),
      "quotaPerGroup reserves the output column name 'rk'; rename it on the input")
    val w = Window.partitionBy(groupCol)
      .orderBy(Text.hash60(F.col(idCol)).asc, F.col(idCol).asc)
    df.withColumn("rk", F.row_number().over(w).cast("long"))
      .filter(F.col("rk") <= quota)
  }

  /** Greedy contiguous sequence packing: assign each document to a
    * token-budget bin within its group (source/shard) — the batch
    * twin of packing documents into fixed-context training sequences.
    * Documents fill bins in deterministic `idCol` order; a document
    * lands in the bin where its FIRST token falls
    * (`bin = floor(preceding-group-tokens / budget)`), so a bin may
    * overflow by at most one document — the standard contiguous-fill
    * trade, chosen because it keeps the assignment a pure prefix-sum
    * (exact bin-capacity packing is inherently sequential).
    *
    * Scale: one shuffle on `groupCol` + one window sort per group —
    * the same cost profile as [[quotaPerGroup]]. Packing is
    * per-shard by construction in a real pipeline (each output shard
    * packs its own documents), so the group is the parallelism unit;
    * a single giant group should be pre-split into hash shards first
    * (e.g. add `pmod(hash60(id), shards)` to the group key — bin
    * numbering stays deterministic per shard). */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
                    textCol: String, budget: Long): DataFrame = {
    require(!df.columns.exists(Seq("n_tokens", "bin").contains),
      "packSequences reserves output column names 'n_tokens' and 'bin'")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(F.col(idCol), F.col(groupCol),
        Text.tokenCount(F.col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bin",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0L)) / budget))
  }

  /** Per-group corpus quality dashboard: document count, mean token
    * count, mean quality score, and the count of docs at-or-above
    * `minQuality` — the per-source health report that drives quota
    * and weighting decisions. One map-side-combinable grouped pass;
    * output is |groups| rows. */
  def sourceQualityReport(df: DataFrame, groupCol: String, textCol: String,
                          minQuality: Double = 0.5): DataFrame = {
    val t = F.col(textCol)
    df.groupBy(groupCol).agg(
      F.count(F.lit(1)).as("n_docs"),
      F.avg(Text.tokenCount(t).cast("double")).as("avg_tokens"),
      F.avg(Text.qualityScore(t)).as("avg_quality"),
      F.sum(F.when(Text.qualityScore(t) >= minQuality, 1L).otherwise(0L))
        .as("n_quality"))
  }

  /** Cross-group vocabulary overlap: token-set Jaccard between every
    * pair of `groupCol` values (source/domain/shard) — the corpus
    * audit that flags mirrored or near-mirrored sources before dedup
    * even runs, and informs per-source quota decisions.
    *
    * Scale: the corpus collapses to distinct (group, token) rows
    * (per-group vocabulary, not token stream) before any join; the
    * token self-join fans out per token only to the number of groups
    * containing it (≤ |groups|, usually far fewer), and the output is
    * |groups|² at most — tiny. Nothing here scales with document
    * count except the initial distinct, which is one map-side-combined
    * shuffle of (group, token) pairs. */
  def vocabularyOverlap(df: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val gt = df.select(F.col(groupCol).as("g"),
        F.explode(Text.distinctTokens(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
      .distinct()
    val sizes = gt.groupBy("g").agg(F.count(F.lit(1)).as("n"))
    val inter = gt.as("a")
      .join(gt.as("b"),
        F.col("a.tok") === F.col("b.tok") && F.col("a.g") < F.col("b.g"))
      .groupBy(F.col("a.g").as("group_a"), F.col("b.g").as("group_b"))
      .agg(F.count(F.lit(1)).as("n_common"))
    inter
      .join(sizes.select(F.col("g").as("group_a"), F.col("n").as("__na")),
        Seq("group_a"))
      .join(sizes.select(F.col("g").as("group_b"), F.col("n").as("__nb")),
        Seq("group_b"))
      .select(F.col("group_a"), F.col("group_b"), F.col("n_common"),
        F.round(F.col("n_common") /
          (F.col("__na") + F.col("__nb") - F.col("n_common")), 6).as("jaccard"))
  }

  /** Corpus-wide collocations: the `topK` adjacent word pairs by
    * pointwise mutual information, `pmi = ln(p(a,b) / (p(a)·p(b)))`
    * with bigram/unigram probabilities over the whole corpus and a
    * `minCount` support floor (PMI is noise without one). The classic
    * phrase-mining signal ("new york"-style units for tokenizer and
    * n-gram vocabulary decisions).
    *
    * Three grouped passes (unigram counts, bigram counts, totals as a
    * broadcast one-row frame), all map-side combinable; the pair
    * frame after the support floor is vocabulary-sized, so the final
    * global top-k sort is trivial. The ratio is computed in double
    * with identical association on both engines, scores are rounded
    * to 6 dp, and the top-k selection orders by the ROUNDED score
    * with (term_a, term_b) tie-breaks — deterministic across engines
    * whose `ln` differs in the last ulp. */
  def pmiTopPairs(df: DataFrame, textCol: String, minCount: Long = 5,
                  topK: Int = 20): DataFrame = {
    val toks = df.select(F.explode(Text.tokens(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
    val uni = toks.groupBy("tok").agg(F.count(F.lit(1)).as("cu"))
    // adjacent pairs only: the <2-token whole-text fallback shingle
    // has no space and is excluded
    val bigrams = df
      .select(F.explode(Text.shingles(F.col(textCol), 2)).as("g"))
      .filter(F.col("g").contains(" "))
    val pairs = bigrams.groupBy("g").agg(F.count(F.lit(1)).as("pair_count"))
      .filter(F.col("pair_count") >= minCount)
      .withColumn("term_a", F.split(F.col("g"), " ").getItem(0))
      .withColumn("term_b", F.split(F.col("g"), " ").getItem(1))
    val totals = toks.agg(F.count(F.lit(1)).as("__nu"))
      .crossJoin(bigrams.agg(F.count(F.lit(1)).as("__nb")))
    pairs
      .join(uni.select(F.col("tok").as("term_a"), F.col("cu").as("__ca")),
        Seq("term_a"))
      .join(uni.select(F.col("tok").as("term_b"), F.col("cu").as("__cb")),
        Seq("term_b"))
      .crossJoin(F.broadcast(totals))
      .withColumn("pmi", F.round(F.log(
        (F.col("pair_count").cast("double") * F.col("__nu") * F.col("__nu")) /
          (F.col("__nb").cast("double") * F.col("__ca") * F.col("__cb"))), 6))
      .orderBy(F.col("pmi").desc, F.col("term_a").asc, F.col("term_b").asc)
      .limit(topK)
      .select("term_a", "term_b", "pair_count", "pmi")
  }

  /** Top-`topK` terms per document by tf-idf (keyword extraction /
    * corpus topicality audit). tf is the raw in-doc term count, idf is
    * the smoothed `ln((N+1)/(df+1))`; scores are rounded to 6 dp and
    * ranked (score desc, term asc) BY THE ROUNDED VALUE, so the
    * ranking — not just the printed score — is stable across engines
    * whose `ln` differ in the last ulp.
    *
    * Three map-side-combinable grouped passes over one exploded token
    * frame: (doc, term) counts; document frequencies from the distinct
    * side of that SAME frame (never a re-explode); N as a broadcast
    * one-row frame (kept lazy — no driver-side count()). The final
    * per-doc top-k is a window over ~unique-terms-per-doc rows.
    * Common terms (high df) have high-fanout join rows, but the join
    * key carries only (term, df) — at 100 TB the df frame is
    * vocabulary-sized and AQE broadcasts it.
    *
    * Output reserves the column name `rk` (the per-doc rank). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topK: Int = 3): DataFrame = {
    val tf = df.select(F.col(idCol),
        F.explode(Text.tokens(F.col(textCol))).as("term"))
      .filter(F.col("term") =!= "")
      .groupBy(idCol, "term")
      .agg(F.count(F.lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val ndocs = df.select(F.countDistinct(F.col(idCol)).as("__n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(F.broadcast(ndocs))
      .withColumn("tfidf", F.round(F.col("tf") *
        F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)), 6))
    val w = Window.partitionBy(idCol)
      .orderBy(F.col("tfidf").desc, F.col("term").asc)
    scored.withColumn("rk", F.row_number().over(w).cast("long"))
      .filter(F.col("rk") <= topK)
      .select(F.col(idCol), F.col("rk"), F.col("term"), F.col("tfidf"))
  }

  /** Corpus-statistics bigram language-model score per document — the
    * CCNet-style quality/fluency proxy: the mean log-probability of a
    * doc's bigrams under an add-one-smoothed bigram model trained on
    * the corpus itself. Repetitive/templated text scores high,
    * token-salad scores low; filtering tails of this score is the
    * classic perplexity gate run before pre-training, without
    * needing any external model artifact.
    *
    * `P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)` with V the distinct
    * corpus vocabulary; `lm_score = mean(ln P)` over the doc's
    * adjacent bigrams (docs with < 2 tokens have no bigram and are
    * excluded). Per-bigram log-probs are rounded to 6 dp (the same
    * cross-engine `ln` discipline as tf-idf/PMI) and summed as
    * DECIMAL so the per-doc mean is merge-order-exact — a raw double
    * sum would wobble with shuffle fetch order and flake the oracle
    * hash (the x_stats_corr lesson).
    *
    * Scale: one exploded bigram stream feeds both count tables
    * (map-side combined, vocabulary-sized results); V is a broadcast
    * one-row frame; the scoring join keys on the bigram/context
    * strings — stop-bigram fan-out is AQE-skew territory, never a
    * cross join. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // adjacent pairs only (the <2-token whole-text fallback shingle
    // has no space and is excluded), same convention as pmiTopPairs
    val bg = df.select(F.col(idCol),
        F.explode(Text.shingles(F.col(textCol), 2)).as("g"))
      .filter(F.col("g").contains(" "))
      .withColumn("w1", F.split(F.col("g"), " ").getItem(0))
    val cb = bg.groupBy("g").agg(F.count(F.lit(1)).as("cb"))
    val cu = bg.groupBy("w1").agg(F.count(F.lit(1)).as("cu"))
    val vocab = df.select(F.explode(Text.tokens(F.col(textCol))).as("w"))
      .filter(F.col("w") =!= "")
      .agg(F.countDistinct("w").as("__v"))
    bg.join(cb, Seq("g"))
      .join(cu, Seq("w1"))
      .crossJoin(F.broadcast(vocab))
      .withColumn("lp", F.round(F.log(
          (F.col("cb") + 1.0) / (F.col("cu") + F.col("__v"))), 6)
        .cast("decimal(12,6)"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_bigrams"),
        // decimal sum → double BEFORE the division: exact same value
        // on both engines, and the graded projection stays double
        F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6)
          .as("lm_score"))
  }

  /** Learned quality gate: an add-one-smoothed multinomial Naive
    * Bayes token classifier, self-supervised from the corpus's own
    * extremes — the third rung of the quality ladder after the
    * heuristic (Gopher repetition) and statistical (bigram-LM score)
    * gates. Seed labels come from token diversity (distinct/total
    * tokens per doc): docs at or above `posMin` are high-quality
    * seeds (label 1), below `negMax` low-quality seeds (label 0) —
    * the weak-supervision bootstrap real pipelines use when no human
    * labels exist. The trained model then scores EVERY doc, seeds
    * included, generalizing the seed signal through token
    * co-occurrence (a mid-ratio doc full of low-quality-class tokens
    * gates out even though no heuristic fired on it).
    *
    * Determinism/oracle discipline: per-token log-likelihoods
    * `ln((c_class + 1) / (tot_class + V))` are rounded to 6 dp and
    * summed as DECIMAL weighted by exact occurrence counts (the
    * lm-score rule), priors are 6-dp-rounded smoothed log
    * frequencies, and scoring uses only the seed vocabulary (OOV
    * tokens are skipped on both engines). Boundary ratios compare as
    * exact IEEE doubles (`distinct*1.0/total`) in both engines.
    *
    * Scale shape: ONE corpus tokenize feeds seeds, vocabulary, and
    * scoring (the pinned per-doc token-count frame); training state
    * is vocabulary-sized (per-token class counts, map-side combined);
    * the class totals/prior stats are a contract-bounded one-row
    * collect inlined as plan literals (the bm25 pattern — a one-row
    * cross join would plan as the nested-loop the lint bans); scoring
    * is one join on the token key + one doc-grain aggregation. */
  def naiveBayesQuality(df: DataFrame, idCol: String, textCol: String,
                        posMin: Double = 0.8,
                        negMax: Double = 0.5): DataFrame = {
    val part = nbPartial(df, idCol, textCol, posMin, negMax)
    nbScore(part.wc, Seq(part), idCol)
  }

  /** INCREMENTAL [[naiveBayesQuality]]: the model's sufficient
    * statistics — per-(token, class) occurrence counts and seed-doc
    * tallies — are DOC-ADDITIVE, because a doc's seed label depends
    * only on its own token-diversity ratio. So the model is a
    * mergeable aggregate: each split contributes a partial-count
    * frame + four scalars, partials merge by union + grouped sum, and
    * the merged model is IDENTICAL to retraining on the concatenated
    * corpus (the graded query shares x_quality_nb's oracle to prove
    * exactly that). This is the maintenance path of a standing
    * quality gate at 100 TB: each ingest batch ships vocabulary-sized
    * count partials; nothing ever rescans old splits. */
  def naiveBayesQualityIncremental(splits: Seq[DataFrame], idCol: String,
                                   textCol: String,
                                   posMin: Double = 0.8,
                                   negMax: Double = 0.5): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val parts = splits.map(nbPartial(_, idCol, textCol, posMin, negMax))
    nbScore(parts.map(_.wc).reduce(_.unionByName(_)), parts, idCol)
  }

  /** One split's model contribution: the pinned per-doc token counts
    * (reused for scoring), per-(token,class) seed counts, and the
    * seed-doc tallies. */
  private final case class NbPartial(wc: DataFrame, tokCounts: DataFrame,
                                     nd1: Long, ndAll: Long)

  private def nbPartial(df: DataFrame, idCol: String, textCol: String,
                        posMin: Double, negMax: Double): NbPartial = {
    val wc = df.select(F.col(idCol),
        F.explode(Text.tokens(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
      .groupBy(idCol, "tok").agg(F.count(F.lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val seeds = wc.groupBy(idCol)
      .agg(F.sum("n").as("nt"), F.count(F.lit(1)).as("nd"))
      .withColumn("r", F.col("nd") * 1.0 / F.col("nt"))
      .withColumn("label",
        F.when(F.col("r") >= posMin, 1L)
          .when(F.col("r") < negMax, 0L))
      .filter(F.col("label").isNotNull)
      .select(F.col(idCol), F.col("label"))
    val seedTokens = wc.join(seeds, Seq(idCol))
    val tokCounts = seedTokens.groupBy("tok")
      .agg(
        F.sum(F.when(F.col("label") === 1L, F.col("n")).otherwise(0L))
          .as("c1"),
        F.sum(F.when(F.col("label") === 0L, F.col("n")).otherwise(0L))
          .as("c0"))
      .localCheckpoint(eager = true)
    val docs = seeds.agg(
      F.countDistinct(F.when(F.col("label") === 1L, F.col(idCol)))
        .as("nd1"),
      F.countDistinct(F.col(idCol)).as("ndAll")).collect()(0)
    NbPartial(wc, tokCounts, docs.getLong(0), docs.getLong(1))
  }

  /** Score `wc` (per-doc token counts) under the model merged from
    * `parts` — union + grouped sum of the additive count frames,
    * scalar tallies added; likelihood/prior arithmetic identical to
    * the single-pass trainer. */
  private def nbScore(wc: DataFrame, parts: Seq[NbPartial],
                      idCol: String): DataFrame = {
    val counts = parts.map(_.tokCounts).reduce(_.unionByName(_))
      .groupBy("tok")
      .agg(F.sum("c1").as("c1"), F.sum("c0").as("c0"))
    val nd1 = parts.map(_.nd1).sum
    val ndAll = parts.map(_.ndAll).sum
    require(nd1 > 0 && nd1 < ndAll,
      s"need seeds of both classes (got $nd1 positive of $ndAll)")
    val stats = counts.agg(
      F.sum("c1").as("tot1"), F.sum("c0").as("tot0"),
      F.count(F.lit(1)).as("v")).collect()(0)
    val (tot1, tot0, v) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val prior1 = BigDecimal(math.log((nd1 + 1.0) / (ndAll + 2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val prior0 = BigDecimal(math.log((ndAll - nd1 + 1.0) / (ndAll + 2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lik = counts.select(F.col("tok"),
      F.round(F.log((F.col("c1") + 1.0) / F.lit((tot1 + v).toDouble)), 6)
        .cast("decimal(12,6)").as("lp1"),
      F.round(F.log((F.col("c0") + 1.0) / F.lit((tot0 + v).toDouble)), 6)
        .cast("decimal(12,6)").as("lp0"))
    wc.join(lik, Seq("tok"))
      .groupBy(idCol)
      .agg(F.sum("n").as("n_toks_scored"),
        F.round(F.lit(prior1) +
          F.sum(F.col("n") * F.col("lp1")).cast("double"), 6).as("score_pos"),
        F.round(F.lit(prior0) +
          F.sum(F.col("n") * F.col("lp0")).cast("double"), 6).as("score_neg"))
      .withColumn("pred",
        F.when(F.col("score_pos") > F.col("score_neg"), 1L).otherwise(0L))
  }

  /** Per-document novelty: the fraction of a doc's distinct n-gram
    * shingles whose FIRST corpus occurrence (minimum doc id) is this
    * doc — the "how much of this is new material" curation signal
    * that complements decontamination (overlap vs an EVAL set) and
    * near-dup (overlap vs a SIMILAR doc): a doc can be dup-free yet
    * still 90% previously-seen boilerplate n-grams.
    *
    * Scale shape: one inverted-index shuffle on the shingle (min-id
    * per shingle is map-side combined), one join back on the same
    * key (exchange reuse), one doc-grain aggregation. Shingle volume
    * is Σ doc tokens — linear, the same bound every LSH operator here
    * rides. */
  def noveltyScore(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val toks = df.select(F.col(idCol),
        F.explode(Text.distinctShingles(F.col(textCol), n)).as("tok"))
      .filter(F.col("tok") =!= "")
    val first = toks.groupBy("tok").agg(F.min(F.col(idCol)).as("first_id"))
    toks.join(first, Seq("tok"))
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("n_shingles"),
        F.sum(F.when(F.col("first_id") === F.col(idCol), 1L)
          .otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        F.col("n_novel").cast("double") / F.col("n_shingles"))
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over token
    * frequencies — the domain-weighting / "which source looks least
    * like the mixture" signal a data recipe consumes alongside
    * [[temperatureMix]]. Every source token exists in the corpus
    * distribution by construction, so q > 0 and the sum is finite.
    *
    * Determinism: each term `p·ln(p/q)` is rounded at 6 dp and summed
    * as DECIMAL (merge-order-free — the [[graft.functions.Text]]
    * lm-score trick), so the emitted KL replays bit-for-bit on any
    * engine; the 6-dp round also absorbs libm ln() ulp differences.
    * Scale shape: one (source, token) count aggregation (map-side
    * combined), two group-count reductions off it, a broadcast-scalar
    * corpus total, and a map-side term computation — the corpus text
    * is scanned once. */
  /** Per-source Shannon entropy of the token distribution — the
    * diversity dial next to [[sourceDivergence]]'s drift dial: a
    * source whose entropy collapses is repeating itself (template
    * spam, boilerplate floods) even when its KL against the corpus
    * looks stable. Same decimal discipline: each p·ln(p) term rounds
    * to 6 dp BEFORE the decimal sum (absorbing libm ulps and
    * merge-order), and the final negation is exact — the emitted
    * entropy replays bit-for-bit. One (source, token) aggregation off
    * one corpus scan; everything after is group-cardinality small. */
  def sourceEntropy(df: DataFrame, groupCol: String,
                    textCol: String): DataFrame = {
    val toks = df.select(F.col(groupCol).as("g"),
        F.explode(Text.tokens(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
    val st = toks.groupBy("g", "tok").agg(F.count(F.lit(1)).as("c_st"))
    val sg = st.groupBy("g").agg(F.sum("c_st").as("n_s"))
    val p = F.col("c_st") / F.col("n_s")
    st.join(sg, Seq("g"))
      .withColumn("term", F.round(p * F.log(p), 6).cast("decimal(18,6)"))
      .groupBy(F.col("g").as(groupCol))
      .agg(F.count(F.lit(1)).as("n_distinct"),
        F.max("n_s").as("n_tokens"),
        (-F.sum("term").cast("double")).as("entropy"))
  }

  def sourceDivergence(df: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val toks = df.select(F.col(groupCol).as("g"),
        F.explode(Text.tokens(F.col(textCol))).as("tok"))
      .filter(F.col("tok") =!= "")
    val st = toks.groupBy("g", "tok").agg(F.count(F.lit(1)).as("c_st"))
    val sg = st.groupBy("g").agg(F.sum("c_st").as("n_s"))
    val tt = st.groupBy("tok").agg(F.sum("c_st").as("c_t"))
    val tot = st.agg(F.sum("c_st").as("n"))
    val p = F.col("c_st") / F.col("n_s")
    val q = F.col("c_t") / F.col("n")
    st.join(sg, Seq("g")).join(tt, Seq("tok"))
      .crossJoin(F.broadcast(tot))
      .withColumn("term",
        F.round(p * F.log(p / q), 6).cast("decimal(18,6)"))
      .groupBy(F.col("g").as(groupCol))
      .agg(F.count(F.lit(1)).as("n_tokens"),
        F.sum("term").cast("double").as("kl"))
  }
}
