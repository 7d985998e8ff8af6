package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, SignatureStore, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Deduplication: exact/incremental/substring, MinHash-LSH,
  * SimHash, n-gram Jaccard, connected components, containment,
  * novelty, snapshot diff, duplication-provenance matrix.
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtDedup {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // PageRank over the near-dup graph (the verified-Jaccard pairs of
    // x_dedup_jaccard, both directions): 5 synchronous rounds of
    // decimal-summed rank flow — link analysis over duplication
    // structure, surfacing the documents at the center of re-crawl
    // clusters. Fixed trip count + 9-dp rounding per round = the
    // oracle replays training as 5 materialized CTEs.
    "x_pagerank" -> ((s, dir) =>
      graft.operators.Retrieval.pageRank(
        Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8, k = MINHASH_K,
          bands = MINHASH_BANDS, terms = Text.distinctShingles(_, 2)),
        PR_ITERS, PR_DAMPING)),


    // PERSONALIZED pagerank: restart mass pinned to the even-id seed
    // set — "what is related to these docs" over the near-dup graph
    // (expansion/retrieval), vs x_pagerank's global centrality. Same
    // decimal round discipline; the oracle swaps the uniform restart
    // for the seed-conditional one and replays the rounds
    "x_pagerank_seeded" -> ((s, dir) =>
      graft.operators.Retrieval.personalizedPageRank(
        Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8, k = MINHASH_K,
          bands = MINHASH_BANDS, terms = Text.distinctShingles(_, 2)),
        PR_ITERS, isSeed = _ % 2 === 0, PR_DAMPING)),


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


    // per-node triangle counts over the near-dup graph: local
    // cluster density — a pair inside a triangle sits in a tight
    // clique (template spam), one outside is a lone edit. Canonical
    // a<b edges surface each triangle exactly once via two joins.
    "x_triangles" -> ((s, dir) =>
      graft.operators.Retrieval.triangleCounts(
        Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8,
          k = MINHASH_K, bands = MINHASH_BANDS,
          terms = Text.distinctShingles(_, 2)))),

    // local clustering coefficient over the same graph: template
    // floods score ~1 (every copy pairs with every copy), chain-
    // shaped drift ~0 — the per-node audit that tells the two
    // duplication shapes apart
    "x_clustering_coef" -> ((s, dir) =>
      graft.operators.Retrieval.clusteringCoefficient(
        Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8,
          k = MINHASH_K, bands = MINHASH_BANDS,
          terms = Text.distinctShingles(_, 2)))),

    // quality-aware dedup: keep the BEST copy per near-dup component
    // (argmax quality, ties to the lower id) instead of the min-id
    // convention — what a curation pipeline actually writes out
    "x_dedup_best" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val labels = Dedup.dupComponents(
        Dedup.jaccardPairsLsh(docs, "doc_id", "text", threshold = 0.8,
          k = MINHASH_K, bands = MINHASH_BANDS,
          terms = Text.distinctShingles(_, 2)))
      Dedup.dedupKeepBest(docs, "doc_id", labels,
        Text.qualityScore(F.col("text")))
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // INCREMENTAL component maintenance: the converged labeling over
    // the old pairs folds in the batch's pairs (any pair touching a
    // mod-3 doc) via the COMPONENT graph — meta-CC work is bounded by
    // the batch's pair count, never the edge history, and because an
    // old label IS its component's min id the result is row-identical
    // to a full recompute over ALL pairs, which is exactly what the
    // oracle (the same recursive CTE as x_dedup_components) replays.
    "x_components_incremental" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsLsh(Tables.scan(s, dir, "documents"),
          "doc_id", "text", threshold = 0.8,
          k = MINHASH_K, bands = MINHASH_BANDS,
          terms = Text.distinctShingles(_, 2))
        .localCheckpoint(true) // the LSH pipeline runs once, not per split
      val isNew = F.col("id_a") % INCR_MOD === 0 ||
        F.col("id_b") % INCR_MOD === 0
      val labels0 = Dedup.dupComponents(pairs.filter(!isNew))
      Dedup.dupComponentsIncremental(labels0, pairs.filter(isNew))
    }),


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

    // materialized signature store, two-batch sequence: gen=0 holds
    // the mod-3=1 corpus's banded signatures; batch 1 (mod-3=2) is
    // deduped against the STORE and its survivors' signatures are
    // appended as gen=1; batch 2 (mod-3=0) is then deduped against
    // corpus + surviving batch-1 rows with every signature read from
    // parquet — corpus text is tokenized exactly once, at init
    // (SignatureStoreSpec proves ingest runs with the corpus file
    // deleted). Same shingles/threshold as x_neardup_incremental so
    // the fixture's near-dup groups cross the splits.
    "x_neardup_store" -> ((s, dir) => {
      val root = layoutDir(dir, "sigstore")
      deleteRec(new java.io.File(root))
      val docs = Tables.scan(s, dir, "documents")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
        "doc_id", "text", root, MINHASH_K, NGRAM_BANDS, shingles3)
      val kept1 = SignatureStore.ingest(s, root,
        docs.filter(F.col("doc_id") % 3 === 2),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      val kept2 = SignatureStore.ingest(s, root,
        docs.filter(F.col("doc_id") % 3 === 0),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      kept1.select(F.col("doc_id"), F.lit(1L).as("batch"),
          F.col("lang"), F.col("source"))
        .unionByName(kept2.select(F.col("doc_id"), F.lit(2L).as("batch"),
          F.col("lang"), F.col("source")))
    }),


    // generation compaction mid-lifecycle: init + first ingest, FOLD
    // both generations into the base (provenance preserved as a data
    // column), then a second ingest probes the compacted store. The
    // output is the full membership with the admitting generation —
    // a row lost/duplicated in the fold, a wrong carried gen, or a
    // probe that misses the base each fails the hash. The oracle is
    // the UNCOMPACTED replay: compaction must be invisible.
    "x_sigstore_compact" -> ((s, dir) => {
      val root = layoutDir(dir, "sigstore_compact")
      deleteRec(new java.io.File(root))
      val docs = Tables.scan(s, dir, "documents")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
        "doc_id", "text", root, MINHASH_K, NGRAM_BANDS, shingles3)
      // the survivors frame is deliberately DISCARDED UNEVALUATED:
      // ingest's store commit is eager inside (appendBatch), so
      // forcing the returned anti-join with a count() would be one
      // wasted action per ingest
      SignatureStore.ingest(s, root,
        docs.filter(F.col("doc_id") % 3 === 2),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      SignatureStore.compactGenerations(s, root, upTo = 1)
      SignatureStore.ingest(s, root,
        docs.filter(F.col("doc_id") % 3 === 0),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      SignatureStore.signaturesWithGen(s, root)
        .select(F.col("doc_id"), F.col("gen").cast("long").as("batch"))
        .distinct()
        .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
    }),


    // provenance replay: the store AS OF each generation, across a
    // compaction — asOf(0) must read exactly the init split and
    // asOf(1) the init + batch-1 survivors even AFTER both
    // generations folded into the base (the gen data column carries
    // the provenance the partition dirs used to)
    "x_sigstore_asof" -> ((s, dir) => {
      val root = layoutDir(dir, "sigstore_asof")
      deleteRec(new java.io.File(root))
      val docs = Tables.scan(s, dir, "documents")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
        "doc_id", "text", root, MINHASH_K, NGRAM_BANDS, shingles3)
      // discarded unevaluated — see x_sigstore_compact's ingest note
      SignatureStore.ingest(s, root,
        docs.filter(F.col("doc_id") % 3 === 2),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      SignatureStore.compactGenerations(s, root, upTo = 1)
      def members(g: Int) = SignatureStore.signaturesAsOf(s, root, g)
        .select("doc_id").distinct()
        .withColumn("asof", F.lit(g.toLong))
      members(0).unionByName(members(1))
        .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
    }),


    // dedup drop EXPLANATION: one row per (batch doc, store doc)
    // near-match with the signature-estimated Jaccard that justified
    // the drop — the audit trail behind incrementalDrops' bare id
    // set (threshold tuning, takedown review, false-positive
    // forensics). Band-bounded join, never a cross space.
    "x_dedup_explain" -> ((s, dir) => {
      val docs = Tables.scan(s, dir, "documents")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      Dedup.incrementalDropExplain(
        Dedup.bandedSignatures(docs.filter(F.col("doc_id") % 3 === 1),
          "doc_id", "text", MINHASH_K, NGRAM_BANDS, shingles3),
        Dedup.bandedSignatures(docs.filter(F.col("doc_id") % 3 === 2),
          "doc_id", "text", MINHASH_K, NGRAM_BANDS, shingles3),
        "doc_id", MINHASH_K, 0.5)
    }),


    // SOURCE-level retraction: recall an entire contaminated source —
    // the victim population is a corpus predicate, not a driver list,
    // so the stores purge through frame joins (purgeIds) rather than
    // isin literals. Same lifecycle as x_retract (two ingests, purge,
    // third ingest against the purged store); recall is
    // point-in-time: batch-3 docs of the recalled source are admitted
    "x_retract_source" -> ((s, dir) => {
      val corpusRoot = layoutDir(dir, "retractsrc_corpus")
      val sigRoot = layoutDir(dir, "retractsrc_sigs")
      deleteRec(new java.io.File(corpusRoot))
      deleteRec(new java.io.File(sigRoot))
      val docs = Tables.scan(s, dir, "documents")
      val slim = (df: org.apache.spark.sql.DataFrame) =>
        df.select("doc_id", "lang", "source")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      graft.operators.ManifestTable.init(corpusRoot, Seq("doc_id"))
      graft.operators.ManifestTable.append(s, corpusRoot,
        slim(docs.filter(F.col("doc_id") % 3 === 1)))
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
        "doc_id", "text", sigRoot, MINHASH_K, NGRAM_BANDS, shingles3)
      val kept1 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 2),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept1))
      graft.operators.Retraction.purgeWhere(s,
        F.col("source") === "src3", "doc_id", corpusRoot,
        signatureRoot = Some(sigRoot))
      val kept2 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 0),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept2))
      graft.operators.ManifestTable.read(s, corpusRoot)
    }),


    // streaming ingest into the standing signature store: the corpus
    // arrives as THREE single-file micro-batches (mtime-pinned
    // arrival order, one file per trigger) through a foreachBatch
    // sink whose generation commit is idempotent (gen dir = commit
    // record — StreamingSpec replays a batch and proves the store
    // bytes don't move). Output = final store membership with the
    // admitting batch, so a lost batch, a double-committed replay,
    // or a wrong probe order each fails the hash.
    "x_stream_neardup_store" -> ((s, dir) => {
      val root = layoutDir(dir, "stream_sigstore")
      val batches = layoutDir(dir, "stream_sigstore_in")
      deleteRec(new java.io.File(root))
      deleteRec(new java.io.File(batches))
      new java.io.File(batches).mkdirs()
      val docs = Tables.scan(s, dir, "documents")
      for (i <- 0 until 3)
        writeSingleFile(docs.filter(F.col("doc_id") % 3 === i),
          s"$batches/ingest_$i.parquet", 1000000000000L + i * 60000L)
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      graft.streaming.StreamingOps.streamingNeardupStore(s, batches, root,
          baseGen = 0L, "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
        .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
    }),


    // retraction/takedown propagation: the standing corpus (manifest
    // table) + signature store ingest two splits, then every stored
    // id divisible by 5 is PURGED from both (copy-on-write manifest
    // delete + per-generation signature rewrite + vacuum), and a
    // third split ingests against the purged store. The output is the
    // corpus AFTER the whole lifecycle — it grades three semantics at
    // once: victims vanish, survivors keep their rows, and batch-3
    // docs whose only near-dups were purged are RE-ADMITTED (dedup
    // against the purged store must behave as if the victims never
    // existed — rebuilt-from-scratch equivalence, pinned row-exactly
    // by the oracle's replay and structurally by RetractionSpec).
    "x_retract" -> ((s, dir) => {
      val corpusRoot = layoutDir(dir, "retract_corpus")
      val sigRoot = layoutDir(dir, "retract_sigs")
      deleteRec(new java.io.File(corpusRoot))
      deleteRec(new java.io.File(sigRoot))
      val docs = Tables.scan(s, dir, "documents")
      val slim = (df: org.apache.spark.sql.DataFrame) =>
        df.select("doc_id", "lang", "source")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      graft.operators.ManifestTable.init(corpusRoot, Seq("doc_id"))
      graft.operators.ManifestTable.append(s, corpusRoot,
        slim(docs.filter(F.col("doc_id") % 3 === 1)))
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
        "doc_id", "text", sigRoot, MINHASH_K, NGRAM_BANDS, shingles3)
      val kept1 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 2),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept1))
      import s.implicits._
      val victims = SignatureStore.signatures(s, sigRoot)
        .select("doc_id").distinct().filter(F.col("doc_id") % 5 === 0)
        .as[Long].collect().toSeq.sorted
      // a fixture scale with no stored id divisible by 5 simply has
      // nothing to retract — the oracle's %5<>0 filter is then a
      // no-op on both sides
      if (victims.nonEmpty)
        graft.operators.Retraction.purge(s, victims, "doc_id",
          corpusRoot = Some(corpusRoot), signatureRoot = Some(sigRoot))
      val kept2 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 0),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept2))
      graft.operators.ManifestTable.read(s, corpusRoot)
    }),


    // MERGE-ON-READ retraction (r20): the same lifecycle as
    // x_retract, but the corpus purge runs DV-first — the
    // deletion-vector commit recalls the victims instantly
    // (metadata-sized; the compliance clock stops there), then
    // foldDeletes rewrites only the DV'd files and vacuum erases the
    // bytes. The final state must be row-identical to the
    // copy-on-write takedown (the shared replay oracle), and the
    // post-purge third ingest must re-admit exactly as before —
    // recall-vs-erase decoupling is not allowed to change WHAT is
    // taken down.
    "x_retract_mor" -> ((s, dir) => {
      val corpusRoot = layoutDir(dir, "retractmor_corpus")
      val sigRoot = layoutDir(dir, "retractmor_sigs")
      deleteRec(new java.io.File(corpusRoot))
      deleteRec(new java.io.File(sigRoot))
      val docs = Tables.scan(s, dir, "documents")
      val slim = (df: org.apache.spark.sql.DataFrame) =>
        df.select("doc_id", "lang", "source")
      val shingles3 = (c: org.apache.spark.sql.Column) =>
        Text.distinctShingles(c, 3)
      graft.operators.ManifestTable.init(corpusRoot, Seq("doc_id"))
      graft.operators.ManifestTable.append(s, corpusRoot,
        slim(docs.filter(F.col("doc_id") % 3 === 1)))
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
        "doc_id", "text", sigRoot, MINHASH_K, NGRAM_BANDS, shingles3)
      val kept1 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 2),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept1))
      import s.implicits._
      val victims = SignatureStore.signatures(s, sigRoot)
        .select("doc_id").distinct().filter(F.col("doc_id") % 5 === 0)
        .as[Long].collect().toSeq.sorted
      if (victims.nonEmpty)
        graft.operators.Retraction.purge(s, victims, "doc_id",
          corpusRoot = Some(corpusRoot), signatureRoot = Some(sigRoot),
          morDeletes = true)
      val kept2 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 0),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept2))
      graft.operators.ManifestTable.read(s, corpusRoot)
    }),


    // RESUMED retraction: the same lifecycle as x_retract, but the
    // purge runs through the takedown ledger and is KILLED between
    // the corpus and signature steps — the ledger entry (intent +
    // the corpus step's confirmation marker) is all that survives the
    // crash, and resume() finishes the signature purge from it. The
    // oracle is x_retract's replay VERBATIM: a resumed takedown must
    // be row-identical to one that never crashed, including the
    // re-admission behavior of the post-resume third ingest.
    "x_retract_resume" -> ((s, dir) => {
      val corpusRoot = layoutDir(dir, "retractres_corpus")
      val sigRoot = layoutDir(dir, "retractres_sigs")
      val ledger = layoutDir(dir, "retractres_ledger")
      deleteRec(new java.io.File(corpusRoot))
      deleteRec(new java.io.File(sigRoot))
      deleteRec(new java.io.File(ledger))
      val docs = Tables.scan(s, dir, "documents")
      val slim = (df: org.apache.spark.sql.DataFrame) =>
        df.select("doc_id", "lang", "source")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      graft.operators.ManifestTable.init(corpusRoot, Seq("doc_id"))
      graft.operators.ManifestTable.append(s, corpusRoot,
        slim(docs.filter(F.col("doc_id") % 3 === 1)))
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
        "doc_id", "text", sigRoot, MINHASH_K, NGRAM_BANDS, shingles3)
      val kept1 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 2),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept1))
      import s.implicits._
      val victims = SignatureStore.signatures(s, sigRoot)
        .select("doc_id").distinct().filter(F.col("doc_id") % 5 === 0)
        .as[Long].collect().toSeq.sorted
      if (victims.nonEmpty) {
        try graft.operators.Retraction.purge(s, victims, "doc_id",
          corpusRoot = Some(corpusRoot), signatureRoot = Some(sigRoot),
          ledgerRoot = Some(ledger),
          afterStep = n => if (n == "corpus")
            throw new RuntimeException("injected takedown crash"))
        catch {
          case e: RuntimeException
            if e.getMessage == "injected takedown crash" => ()
        }
        graft.operators.Retraction.resume(s, ledger)
      }
      val kept2 = SignatureStore.ingest(s, sigRoot,
        docs.filter(F.col("doc_id") % 3 === 0),
        "doc_id", "text", MINHASH_K, NGRAM_BANDS, 0.5, shingles3)
      graft.operators.ManifestTable.append(s, corpusRoot, slim(kept2))
      graft.operators.ManifestTable.read(s, corpusRoot)
    }),


    // cross-store membership audit: the corpus manifest holds the
    // %3∈{1,2} split, the signature store the %3∈{0,1} split —
    // deliberately inconsistent standing state (the shape a crashed
    // un-ledgered purge or a half-applied ingest leaves). The audit
    // reports exactly the ids whose membership disagrees, flagged per
    // store; a missed drift row or a false positive fails the hash.
    "x_store_audit" -> ((s, dir) => {
      val corpusRoot = layoutDir(dir, "audit_corpus")
      val sigRoot = layoutDir(dir, "audit_sigs")
      deleteRec(new java.io.File(corpusRoot))
      deleteRec(new java.io.File(sigRoot))
      val docs = Tables.scan(s, dir, "documents")
      val shingles3 = (c: org.apache.spark.sql.Column) => Text.distinctShingles(c, 3)
      graft.operators.ManifestTable.init(corpusRoot, Seq("doc_id"))
      graft.operators.ManifestTable.append(s, corpusRoot,
        docs.filter(F.col("doc_id") % 3 >= 1)
          .select("doc_id", "lang", "source"))
      SignatureStore.init(docs.filter(F.col("doc_id") % 3 <= 1),
        "doc_id", "text", sigRoot, MINHASH_K, NGRAM_BANDS, shingles3)
      graft.operators.Retraction.auditStores(s, "doc_id",
        corpusRoot = Some(corpusRoot), signatureRoot = Some(sigRoot))
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


    // blocked fuzzy dedup: prefix-blocked candidates verified by
    // Levenshtein — catches the character-level (typo/OCR)
    // duplicates the token-set families under-weigh
    "x_dedup_fuzzy" -> ((s, dir) =>
      Dedup.fuzzyPairs(Tables.scan(s, dir, "documents"), "doc_id", "text",
        FUZZY_BLOCK, FUZZY_PREFIX, FUZZY_MAXDIST)),

    // per-doc novelty: fraction of a doc's trigram shingles whose
    // first corpus occurrence is this doc — the "new material" signal
    // dup-detection misses
    "x_novelty" -> ((s, dir) =>
      Curation.noveltyScore(Tables.scan(s, dir, "documents"),
        "doc_id", "text", NOVELTY_N))
  )

  def oracleSql: Map[String, String] = Map(
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

    // two-batch store sequence: the store after ingest 1 is corpus
    // signatures + SURVIVING batch-1 signatures — the second stage's
    // cross probe runs against exactly that union, replaying the
    // parquet generations the Spark side reads
    "x_neardup_store" ->
      (s"WITH ${shingleToksCte(3)}, " +
        s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
        s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
        "b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 1), " +
        "b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 2), " +
        "b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 0), " +
        "drop1in AS (SELECT DISTINCT r.doc_id FROM b1 l JOIN b1 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop1x AS (SELECT DISTINCT l.doc_id FROM b1 l JOIN b0 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept1 AS (SELECT DISTINCT doc_id FROM b1 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop1in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop1x)), " +
        "store2 AS (SELECT * FROM b0 UNION ALL " +
        "SELECT * FROM b1 WHERE doc_id IN (SELECT doc_id FROM kept1)), " +
        "drop2in AS (SELECT DISTINCT r.doc_id FROM b2 l JOIN b2 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop2x AS (SELECT DISTINCT l.doc_id FROM b2 l JOIN store2 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept2 AS (SELECT DISTINCT doc_id FROM b2 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop2in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop2x)) " +
        "SELECT d.doc_id, CAST(1 AS BIGINT) AS batch, d.lang, d.source " +
        "FROM documents d JOIN kept1 k ON d.doc_id = k.doc_id " +
        "UNION ALL " +
        "SELECT d.doc_id, CAST(2 AS BIGINT) AS batch, d.lang, d.source " +
        "FROM documents d JOIN kept2 k ON d.doc_id = k.doc_id"),

    // compaction replay = the UNCOMPACTED store lifecycle: gen 0 is
    // all of split 1, gen 1 the split-2 survivors, gen 2 the split-0
    // survivors probed against both
    "x_sigstore_compact" ->
      (s"WITH ${shingleToksCte(3)}, " +
        s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
        s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
        "b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 1), " +
        "b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 2), " +
        "b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 0), " +
        "drop1in AS (SELECT DISTINCT r.doc_id FROM b1 l JOIN b1 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop1x AS (SELECT DISTINCT l.doc_id FROM b1 l JOIN b0 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept1 AS (SELECT DISTINCT doc_id FROM b1 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop1in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop1x)), " +
        "store2 AS (SELECT * FROM b0 UNION ALL " +
        "SELECT * FROM b1 WHERE doc_id IN (SELECT doc_id FROM kept1)), " +
        "drop2in AS (SELECT DISTINCT r.doc_id FROM b2 l JOIN b2 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop2x AS (SELECT DISTINCT l.doc_id FROM b2 l JOIN store2 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept2 AS (SELECT DISTINCT doc_id FROM b2 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop2in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop2x)), " +
        "final AS (SELECT DISTINCT doc_id, 0 AS batch FROM b0 " +
        "UNION ALL SELECT doc_id, 1 AS batch FROM kept1 " +
        "UNION ALL SELECT doc_id, 2 AS batch FROM kept2) " +
        "SELECT d.doc_id, CAST(f.batch AS BIGINT) AS batch, " +
        "d.lang, d.source " +
        "FROM documents d JOIN final f ON d.doc_id = f.doc_id"),

    // streaming store replay: three sequential micro-batches from an
    // EMPTY store — batch b dedups in-batch, then against the union
    // of all prior batches' SURVIVOR signatures
    "x_stream_neardup_store" ->
      (s"WITH ${shingleToksCte(3)}, " +
        s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
        s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
        "b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 0), " +
        "b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 1), " +
        "b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 2), " +
        "drop0in AS (SELECT DISTINCT r.doc_id FROM b0 l JOIN b0 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "kept0 AS (SELECT DISTINCT doc_id FROM b0 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop0in)), " +
        "store1 AS (SELECT * FROM b0 " +
        "WHERE doc_id IN (SELECT doc_id FROM kept0)), " +
        "drop1in AS (SELECT DISTINCT r.doc_id FROM b1 l JOIN b1 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop1x AS (SELECT DISTINCT l.doc_id FROM b1 l JOIN store1 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept1 AS (SELECT DISTINCT doc_id FROM b1 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop1in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop1x)), " +
        "store2 AS (SELECT * FROM store1 UNION ALL " +
        "SELECT * FROM b1 WHERE doc_id IN (SELECT doc_id FROM kept1)), " +
        "drop2in AS (SELECT DISTINCT r.doc_id FROM b2 l JOIN b2 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop2x AS (SELECT DISTINCT l.doc_id FROM b2 l JOIN store2 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept2 AS (SELECT DISTINCT doc_id FROM b2 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop2in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop2x)), " +
        "final AS (SELECT doc_id, 0 AS batch FROM kept0 " +
        "UNION ALL SELECT doc_id, 1 AS batch FROM kept1 " +
        "UNION ALL SELECT doc_id, 2 AS batch FROM kept2) " +
        "SELECT d.doc_id, CAST(f.batch AS BIGINT) AS batch, " +
        "d.lang, d.source " +
        "FROM documents d JOIN final f ON d.doc_id = f.doc_id"),

    // as-of replay: gen 0 = the init split's ids; gen 1 adds the
    // batch-1 survivors (kept1 from the incremental-drop rules)
    "x_sigstore_asof" ->
      (s"WITH ${shingleToksCte(3)}, " +
        s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
        s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
        "b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 1), " +
        "b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 2), " +
        "drop1in AS (SELECT DISTINCT r.doc_id FROM b1 l JOIN b1 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop1x AS (SELECT DISTINCT l.doc_id FROM b1 l JOIN b0 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept1 AS (SELECT DISTINCT doc_id FROM b1 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop1in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop1x)), " +
        "final AS (SELECT DISTINCT doc_id, 0 AS asof FROM b0 " +
        "UNION ALL SELECT DISTINCT doc_id, 1 AS asof FROM b0 " +
        "UNION ALL SELECT doc_id, 1 AS asof FROM kept1) " +
        "SELECT d.doc_id, CAST(f.asof AS BIGINT) AS asof, " +
        "d.lang, d.source " +
        "FROM documents d JOIN final f ON d.doc_id = f.doc_id"),

    // drop-explain replay: the cross-probe band join with the exact
    // estimated Jaccard per matched pair
    "x_dedup_explain" ->
      (s"WITH ${shingleToksCte(3)}, " +
        s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
        s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
        "b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 1), " +
        "b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 2) " +
        "SELECT DISTINCT l.doc_id AS doc_id, r.doc_id AS matched_id, " +
        s"round($estSql, 6) AS est_jaccard " +
        "FROM b1 l JOIN b0 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5"),

    // source-recall replay: identical to x_retract's chain except the
    // purge condition is source membership instead of id arithmetic
    "x_retract_source" ->
      (s"WITH ${shingleToksCte(3)}, " +
        s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
        s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
        "b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 1), " +
        "b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 2), " +
        "b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 0), " +
        "drop1in AS (SELECT DISTINCT r.doc_id FROM b1 l JOIN b1 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop1x AS (SELECT DISTINCT l.doc_id FROM b1 l JOIN b0 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept1 AS (SELECT DISTINCT doc_id FROM b1 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop1in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop1x)), " +
        "store2 AS (SELECT * FROM b0 UNION ALL " +
        "SELECT * FROM b1 WHERE doc_id IN (SELECT doc_id FROM kept1)), " +
        "purged AS (SELECT * FROM store2 WHERE doc_id NOT IN " +
        "(SELECT doc_id FROM documents WHERE source = 'src3')), " +
        "drop2in AS (SELECT DISTINCT r.doc_id FROM b2 l JOIN b2 r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
        "drop2x AS (SELECT DISTINCT l.doc_id FROM b2 l JOIN purged r " +
        "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
        s"WHERE $estSql >= 0.5), " +
        "kept2 AS (SELECT DISTINCT doc_id FROM b2 " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drop2in) " +
        "AND doc_id NOT IN (SELECT doc_id FROM drop2x)), " +
        "final AS (SELECT DISTINCT doc_id FROM purged " +
        "UNION SELECT doc_id FROM kept2) " +
        "SELECT d.doc_id, d.lang, d.source " +
        "FROM documents d JOIN final f ON d.doc_id = f.doc_id"),

    // retraction replay: store after ingest 1 = split-1 signatures +
    // surviving split-2 signatures; the purge drops every stored id
    // divisible by 5; split 0 then probes the PURGED store. Final
    // corpus = purged survivors ∪ batch-3 keeps.
    "x_retract" -> retractReplaySql,

    // the SAME oracle grades the merge-on-read takedown: DV-recall +
    // fold + vacuum must end row-identical to the copy-on-write purge
    "x_retract_mor" -> retractReplaySql,

    // the SAME oracle grades the resumed takedown: a purge that
    // crashed between stores and finished through the ledger must be
    // row-identical to one that never crashed
    "x_retract_resume" -> retractReplaySql,

    // membership drift = exactly the ids where the two split
    // predicates disagree, with the per-store flags
    "x_store_audit" ->
      ("SELECT doc_id, (doc_id % 3 >= 1) AS in_corpus, " +
        "(doc_id % 3 <= 1) AS in_signatures FROM documents " +
        "WHERE (doc_id % 3 >= 1) <> (doc_id % 3 <= 1)"),

    "x_dedup_jaccard" -> jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8),

    "x_pagerank" -> {
      val rounds = (1 to PR_ITERS).map { i =>
        s"r$i AS MATERIALIZED (SELECT e.dst AS id, " +
          s"round((1.0 - $PR_DAMPING) / nn.n + $PR_DAMPING * " +
          "CAST(sum(CAST(round(r.rank / CAST(deg.deg AS DOUBLE), 9) " +
          "AS DECIMAL(28,9))) AS DOUBLE), 9) AS rank " +
          s"FROM e JOIN deg ON e.src = deg.src " +
          s"JOIN r${i - 1} r ON r.id = e.src, nn " +
          "GROUP BY e.dst, nn.n)"
      }.mkString(", ")
      "WITH prs AS MATERIALIZED (" +
        jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + "), " +
        "e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM prs " +
        "UNION ALL SELECT id_b, id_a FROM prs), " +
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src), " +
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM deg), " +
        "r0 AS MATERIALIZED (SELECT src AS id, round(1.0 / n, 9) AS rank " +
        "FROM deg, nn), " +
        rounds + s" SELECT id, rank FROM r$PR_ITERS"
    },

    "x_pagerank_seeded" -> {
      val rounds = (1 to PR_ITERS).map { i =>
        s"r$i AS MATERIALIZED (SELECT e.dst AS id, " +
          s"round(CASE WHEN e.dst % 2 = 0 THEN (1.0 - $PR_DAMPING) / ns.n " +
          s"ELSE 0.0 END + $PR_DAMPING * " +
          "CAST(sum(CAST(round(r.rank / CAST(deg.deg AS DOUBLE), 9) " +
          "AS DECIMAL(28,9))) AS DOUBLE), 9) AS rank " +
          s"FROM e JOIN deg ON e.src = deg.src " +
          s"JOIN r${i - 1} r ON r.id = e.src, ns " +
          "GROUP BY e.dst, ns.n)"
      }.mkString(", ")
      "WITH prs AS MATERIALIZED (" +
        jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + "), " +
        "e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM prs " +
        "UNION ALL SELECT id_b, id_a FROM prs), " +
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src), " +
        "ns AS MATERIALIZED (SELECT count(*) AS n FROM deg WHERE src % 2 = 0), " +
        "r0 AS MATERIALIZED (SELECT src AS id, " +
        "round(CASE WHEN src % 2 = 0 THEN 1.0 / ns.n ELSE 0.0 END, 9) AS rank " +
        "FROM deg, ns), " +
        rounds + s" SELECT id, rank FROM r$PR_ITERS"
    },

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

    "x_triangles" ->
      ("WITH prs AS MATERIALIZED (" +
        jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + "), " +
        "e AS MATERIALIZED (SELECT DISTINCT id_a, id_b FROM prs), " +
        "tri AS (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c " +
        "FROM e e1 JOIN e e2 ON e2.id_a = e1.id_b " +
        "JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b) " +
        "SELECT id, count(*) AS n_triangles FROM (" +
        "SELECT a AS id FROM tri UNION ALL SELECT b FROM tri " +
        "UNION ALL SELECT c FROM tri) GROUP BY id"),

    "x_clustering_coef" ->
      ("WITH prs AS MATERIALIZED (" +
        jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + "), " +
        "e AS MATERIALIZED (SELECT DISTINCT id_a, id_b FROM prs), " +
        "deg AS (SELECT id, count(*) AS degree FROM (" +
        "SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e) GROUP BY id), " +
        "tri AS (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c " +
        "FROM e e1 JOIN e e2 ON e2.id_a = e1.id_b " +
        "JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b), " +
        "tc AS (SELECT id, count(*) AS n_triangles FROM (" +
        "SELECT a AS id FROM tri UNION ALL SELECT b FROM tri " +
        "UNION ALL SELECT c FROM tri) GROUP BY id) " +
        "SELECT d.id, d.degree, " +
        "coalesce(tc.n_triangles, 0) AS n_triangles, " +
        "CASE WHEN d.degree >= 2 THEN round(" +
        "2.0 * CAST(coalesce(tc.n_triangles, 0) AS DOUBLE) / " +
        "CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) ELSE 0.0 END AS coef " +
        "FROM deg d LEFT JOIN tc ON tc.id = d.id"),

    // component argmax on the SAME quality formula the pipeline
    // oracles share (qualitySql = Text.qualityScore's DuckDB twin)
    "x_dedup_best" ->
      ("WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (" +
        jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + ")), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach AS (SELECT src AS id, src AS r FROM edges " +
        "UNION SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id), " +
        "comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id), " +
        s"q AS (SELECT doc_id, $qualitySql AS q FROM documents), " +
        "drops AS (SELECT doc_id FROM (SELECT c.id AS doc_id, " +
        "row_number() OVER (PARTITION BY c.component " +
        "ORDER BY q.q DESC, c.id ASC) AS rn " +
        "FROM comp c JOIN q ON q.doc_id = c.id) WHERE rn <> 1) " +
        "SELECT doc_id, lang, source, n_chars FROM documents " +
        "WHERE doc_id NOT IN (SELECT doc_id FROM drops)"),

    // the incremental fold must equal the full recompute — same CTE
    "x_components_incremental" ->
      ("WITH RECURSIVE pairs AS (SELECT id_a, id_b FROM (" +
        jaccardLshSql(shingleToksCte(2), MINHASH_BANDS, 0.8) + ")), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
        "UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach AS (SELECT src AS id, src AS r FROM edges " +
        "UNION SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id) " +
        "SELECT id, min(r) AS component FROM reach GROUP BY id"),

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

    "x_dedup_fuzzy" ->
      ("WITH n AS (SELECT doc_id, " +
        "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm " +
        "FROM documents) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        s"levenshtein(substr(a.norm, 1, $FUZZY_PREFIX), substr(b.norm, 1, $FUZZY_PREFIX)) AS dist " +
        s"FROM n a JOIN n b ON substr(a.norm, 1, $FUZZY_BLOCK) = substr(b.norm, 1, $FUZZY_BLOCK) " +
        "AND a.doc_id < b.doc_id " +
        s"WHERE levenshtein(substr(a.norm, 1, $FUZZY_PREFIX), substr(b.norm, 1, $FUZZY_PREFIX)) <= $FUZZY_MAXDIST"),

    "x_novelty" ->
      (s"WITH ${shingleToksCte(NOVELTY_N)}, " +
        "fst AS (SELECT tok, min(doc_id) AS first_id FROM toks GROUP BY 1) " +
        "SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
        "CAST(sum(CASE WHEN f.first_id = t.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
        "CAST(sum(CASE WHEN f.first_id = t.doc_id THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ count(*) AS novelty " +
        "FROM toks t JOIN fst f USING (tok) GROUP BY 1")
  )

  /** Retraction replay, shared by `x_retract` and `x_retract_resume`
    * (a purge resumed through the takedown ledger must be
    * row-identical to one that never crashed): store after ingest 1 =
    * split-1 signatures + surviving split-2 signatures; the purge
    * drops every stored id divisible by 5; split 0 then probes the
    * PURGED store. Final corpus = purged survivors ∪ batch-3 keeps. */
  private lazy val retractReplaySql: String =
    s"WITH ${shingleToksCte(3)}, " +
      s"sig AS (SELECT doc_id, $mhMins FROM toks GROUP BY doc_id), " +
      s"bands AS (${bandRowsSql(NGRAM_BANDS)}), " +
      "b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 1), " +
      "b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 2), " +
      "b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 0), " +
      "drop1in AS (SELECT DISTINCT r.doc_id FROM b1 l JOIN b1 r " +
      "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
      s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
      "drop1x AS (SELECT DISTINCT l.doc_id FROM b1 l JOIN b0 r " +
      "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
      s"WHERE $estSql >= 0.5), " +
      "kept1 AS (SELECT DISTINCT doc_id FROM b1 " +
      "WHERE doc_id NOT IN (SELECT doc_id FROM drop1in) " +
      "AND doc_id NOT IN (SELECT doc_id FROM drop1x)), " +
      "store2 AS (SELECT * FROM b0 UNION ALL " +
      "SELECT * FROM b1 WHERE doc_id IN (SELECT doc_id FROM kept1)), " +
      "purged AS (SELECT * FROM store2 WHERE doc_id % 5 <> 0), " +
      "drop2in AS (SELECT DISTINCT r.doc_id FROM b2 l JOIN b2 r " +
      "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
      s"AND l.doc_id < r.doc_id WHERE $estSql >= 0.5), " +
      "drop2x AS (SELECT DISTINCT l.doc_id FROM b2 l JOIN purged r " +
      "ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash " +
      s"WHERE $estSql >= 0.5), " +
      "kept2 AS (SELECT DISTINCT doc_id FROM b2 " +
      "WHERE doc_id NOT IN (SELECT doc_id FROM drop2in) " +
      "AND doc_id NOT IN (SELECT doc_id FROM drop2x)), " +
      "final AS (SELECT DISTINCT doc_id FROM purged " +
      "UNION SELECT doc_id FROM kept2) " +
      "SELECT d.doc_id, d.lang, d.source " +
      "FROM documents d JOIN final f ON d.doc_id = f.doc_id"
}
