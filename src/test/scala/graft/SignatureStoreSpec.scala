package graft

import org.apache.spark.sql.{functions => F}

import graft.functions.Text
import graft.operators.{Dedup, SignatureStore}
import graft.sources.Tables

/** The materialized LSH signature store: result-identical to the
  * recompute path, and physically incapable of touching corpus text
  * after init. */
class SignatureStoreSpec extends SparkSpec {

  private val K = 16
  private val BANDS = 8
  private val TAU = 0.5
  private def sh3(c: org.apache.spark.sql.Column) = Text.distinctShingles(c, 3)

  private def tmp(name: String): String =
    Workspace.dir(s"sigstore_spec_$name")

  test("ingest reads only the store: corpus text deleted after init, result unchanged") {
    val docs = Tables.scan(spark, sf, "documents")
    val corpus = docs.filter(F.col("doc_id") % 3 =!= 0)
    val batch = docs.filter(F.col("doc_id") % 3 === 0)
    // the recompute path's answer, materialized BEFORE the corpus
    // disappears
    val expected = Dedup
      .incrementalNearDedup(corpus, batch, "doc_id", "text", K, BANDS, TAU, sh3)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // re-home the corpus in a scratch parquet file, init the store
    // from it, then DELETE the file — any plan that still wants
    // corpus text now throws FileNotFound
    val corpusPath = tmp("corpus")
    corpus.write.mode("overwrite").parquet(corpusPath)
    val doomed = spark.read.parquet(corpusPath)
    val root = tmp("store")
    ExtShared.deleteRec(new java.io.File(root))
    SignatureStore.init(doomed, "doc_id", "text", root, K, BANDS, sh3)
    ExtShared.deleteRec(new java.io.File(corpusPath))

    val got = SignatureStore
      .ingest(spark, root, batch, "doc_id", "text", K, BANDS, TAU, sh3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("two-batch store sequence is result-identical to full recompute") {
    val docs = Tables.scan(spark, sf, "documents")
    val c = docs.filter(F.col("doc_id") % 3 === 1)
    val b1 = docs.filter(F.col("doc_id") % 3 === 2)
    val b2 = docs.filter(F.col("doc_id") % 3 === 0)

    val root = tmp("twobatch")
    ExtShared.deleteRec(new java.io.File(root))
    SignatureStore.init(c, "doc_id", "text", root, K, BANDS, sh3)
    val kept1 = SignatureStore
      .ingest(spark, root, b1, "doc_id", "text", K, BANDS, TAU, sh3)
    val got1 = kept1.select("doc_id").collect().map(_.getLong(0)).toSet
    val got2 = SignatureStore
      .ingest(spark, root, b2, "doc_id", "text", K, BANDS, TAU, sh3)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // recompute path: batch 1 vs corpus, then batch 2 vs the union of
    // corpus and batch-1 SURVIVORS
    val want1df = Dedup
      .incrementalNearDedup(c, b1, "doc_id", "text", K, BANDS, TAU, sh3)
    val want1 = want1df.select("doc_id").collect().map(_.getLong(0)).toSet
    val want2 = Dedup
      .incrementalNearDedup(c.unionByName(want1df), b2,
        "doc_id", "text", K, BANDS, TAU, sh3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got1 == want1)
    assert(got2 == want2)
    // and at least one batch actually dropped rows — the fixture's
    // near-dup groups must cross the mod-3 splits for the sequence to
    // grade anything
    val nb1 = b1.count(); val nb2 = b2.count()
    assert(got1.size + got2.size < nb1 + nb2,
      s"no drops: kept ${got1.size}+${got2.size} of ${nb1}+${nb2}")
  }

  test("generation ledger: one generation per ingest, provenance column prunes") {
    val docs = Tables.scan(spark, sf, "documents")
    val root = tmp("gens")
    ExtShared.deleteRec(new java.io.File(root))
    SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 1),
      "doc_id", "text", root, K, BANDS, sh3)
    assert(SignatureStore.latestGeneration(spark, root) == 0)
    SignatureStore.ingest(spark, root, docs.filter(F.col("doc_id") % 3 === 2),
      "doc_id", "text", K, BANDS, TAU, sh3).count()
    assert(SignatureStore.latestGeneration(spark, root) == 1)
    // the gen provenance column replays the store as of any ingest
    // (a LONG column since r17 — same domain as the ledger id)
    val byGen = SignatureStore.signaturesWithGen(spark, root)
      .groupBy("gen").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byGen.keySet == Set(0L, 1L))
    // banded store: BANDS rows per admitted document
    val nCorpus = docs.filter(F.col("doc_id") % 3 === 1).count()
    assert(byGen(0) == nCorpus * BANDS)
    assert(byGen(1) % BANDS == 0)
  }

  test("generation compaction folds directories, preserves provenance, and is invisible to ingest/dedup") {
    val docs = Tables.scan(spark, sf, "documents")
    val root = tmp("compactgens")
    ExtShared.deleteRec(new java.io.File(root))
    SignatureStore.init(docs.filter(F.col("doc_id") % 4 === 0),
      "doc_id", "text", root, K, BANDS, sh3)
    for (i <- 1 to 2)
      SignatureStore.ingest(spark, root,
        docs.filter(F.col("doc_id") % 4 === i),
        "doc_id", "text", K, BANDS, TAU, sh3).count()
    def rows() = SignatureStore.signaturesWithGen(spark, root)
      .collect().map(_.toSeq).toSet
    val before = rows()
    def liveFiles() = graft.operators.ManifestTable.latest(root).get.files

    val preFold = liveFiles().size
    assert(SignatureStore.compactGenerations(spark, root, upTo = 1)
      == preFold.toLong)
    // provenance-preserving: every (row, gen) pair survives the fold
    assert(rows() == before, "compaction changed the store's rows")
    assert(liveFiles().size < preFold, "compaction did not fold files")
    assert(SignatureStore.latestGeneration(spark, root) == 2)
    // a batch whose generation was folded reads as already committed
    // (the ledger markers carry through the rewrite)
    assert(!SignatureStore.ingestBatch(spark, root, 1,
      docs.filter(F.col("doc_id") % 4 === 1),
      "doc_id", "text", K, BANDS, TAU, sh3),
      "folded generation re-committed under replay")

    // ingest continues on top of the fold; a second compaction folds
    // the mixed (compacted + fresh) file set again
    SignatureStore.ingest(spark, root,
      docs.filter(F.col("doc_id") % 4 === 3),
      "doc_id", "text", K, BANDS, TAU, sh3).count()
    assert(SignatureStore.latestGeneration(spark, root) == 3)
    val full = rows()
    assert(SignatureStore.compactGenerations(spark, root, upTo = 3) >= 1L)
    assert(rows() == full)
    // dedup over the fully-compacted store = dedup over the rebuilt
    // flat store (compaction is semantically invisible)
    val probe = docs.filter(F.col("doc_id") % 4 === 2).limit(20)
    val banded = graft.operators.Dedup.bandedSignatures(
      probe, "doc_id", "text", K, BANDS, sh3)
    val gotDrops = graft.operators.Dedup.incrementalDrops(
        SignatureStore.signatures(spark, root), banded, "doc_id", K, TAU)
      .collect().map(_.getLong(0)).toSet
    assert(gotDrops.nonEmpty, "probe produced no drops — fixture too weak")

    // purge reaches into the compacted files: victims vanish from
    // DISK immediately (expire + zero-grace vacuum), not just from
    // the live snapshot — walk every data parquet under the root
    import spark.implicits._
    val victim = SignatureStore.signatures(spark, root)
      .select("doc_id").as[Long].head()
    SignatureStore.purge(spark, root, "doc_id", Seq(victim))
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    val files =
      try s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq
      finally s.close()
    val onDisk = spark.read.parquet(files: _*)
      .select("doc_id").as[Long].collect().toSet
    assert(!onDisk.contains(victim), "purged id survives in store files")
  }
}
