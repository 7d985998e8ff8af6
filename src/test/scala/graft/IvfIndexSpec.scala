package graft

import org.apache.spark.sql.{DataFrame, functions => F}

import graft.operators.{IvfIndex, Similarity}
import graft.sources.Tables

/** Standing IVF index maintenance: append preserves search quality,
  * the cell-balance audit triggers retraining only when it should,
  * and a retrain restores both balance and recall. */
class IvfIndexSpec extends SparkSpec {

  private def emb = Tables.scan(spark, sf, "embeddings")
  private val K = 10
  private val ITERS = 3
  private val NPROBE = 8

  /** recall@10 of `got` against brute force over `corpus`. */
  private def recallOf(got: DataFrame, corpus: DataFrame,
                       queries: DataFrame): Double = {
    val exact = Similarity
      .bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = got.select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact intersect approx).size.toDouble / exact.size
  }

  test("append keeps recall@10 >= 0.9 and equals a fresh search over the same centroids") {
    val queries = emb.filter(F.col("vec_id") < 5)
    val idx0 = IvfIndex.build(emb.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", K, ITERS)
    val idx = IvfIndex.append(idx0, emb.filter(F.col("vec_id") % 2 =!= 0))
    val got = IvfIndex.topK(idx, queries, k = 10, nprobe = NPROBE)
    val r = recallOf(got, emb, queries)
    info(f"incremental-index recall@10 = $r%.2f (nprobe $NPROBE of $K cells)")
    assert(r >= 0.9, f"recall@10 $r%.2f after append")
    // the standing assignment searches identically to re-running
    // ivfTopK over the same centroids on the full corpus
    val fresh = Similarity.ivfTopK(emb, queries, idx.centroids,
        "vec_id", "embedding", k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet == fresh)
  }

  test("persisted store: ingest+search read only the store — raw vectors deleted after init") {
    import graft.operators.{IvfIndex, IvfStore}
    val even = emb.filter(F.col("vec_id") % 2 === 0)
    val odd = emb.filter(F.col("vec_id") % 2 =!= 0)
    val queries = emb.filter(F.col("vec_id") < 5)
    // expected: the in-memory incremental index over the same halves
    val expected = IvfIndex.topK(
        IvfIndex.append(
          IvfIndex.build(even, "vec_id", "embedding", K, ITERS), odd),
        queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    // re-home the TRAINING corpus in a scratch parquet, init the
    // store from it, delete the scratch — the store must be
    // self-sufficient from here on
    val srcPath = Workspace.dir("ivfstore_spec_src")
    even.write.mode("overwrite").parquet(srcPath)
    val root = Workspace.dir("ivfstore_spec_store")
    ExtShared.deleteRec(new java.io.File(root))
    IvfStore.init(spark.read.parquet(srcPath), "vec_id", "embedding",
      K, ITERS, root)
    ExtShared.deleteRec(new java.io.File(srcPath))
    IvfStore.ingest(spark, root, odd, "vec_id", "embedding")
    val got = IvfIndex.topK(
        IvfStore.load(spark, root, "vec_id", "embedding"),
        queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    assert(got == expected, "store round-trip changed the search result")
  }

  test("assignment-generation compaction is invisible to load/search; ingest continues on the base") {
    import graft.operators.{IvfIndex, IvfStore}
    val root = Workspace.dir("ivfstore_spec_compact")
    ExtShared.deleteRec(new java.io.File(root))
    val third = (m: Int) => emb.filter(F.col("vec_id") % 3 === m)
    IvfStore.init(third(0), "vec_id", "embedding", K, ITERS, root)
    IvfStore.ingest(spark, root, third(1), "vec_id", "embedding")
    val queries = emb.filter(F.col("vec_id") < 5)
    val before = IvfIndex.topK(
        IvfStore.load(spark, root, "vec_id", "embedding"),
        queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    val preFold = graft.operators.ManifestTable
      .latest(s"$root/assigned").get.files.size
    assert(IvfStore.compactGenerations(spark, root, upTo = 1)
      == preFold.toLong)
    // files folded; search result bit-identical
    assert(graft.operators.ManifestTable
      .latest(s"$root/assigned").get.files.size < preFold)
    val after = IvfIndex.topK(
        IvfStore.load(spark, root, "vec_id", "embedding"),
        queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    assert(after == before, "compaction changed search results")
    // further ingest lands as gen=2 on top of the fold
    IvfStore.ingest(spark, root, third(2), "vec_id", "embedding")
    val full = IvfIndex.topK(
        IvfStore.load(spark, root, "vec_id", "embedding"),
        queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    val want = IvfIndex.topK(
        IvfIndex.append(
          IvfIndex.append(
            IvfIndex.build(third(0), "vec_id", "embedding", K, ITERS),
            third(1)), third(2)),
        queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    assert(full == want,
      "post-compaction ingest diverged from the in-memory index")
  }

  test("streaming IVF ingest equals batch ingest; a replayed batch leaves the store byte-identical") {
    import graft.operators.{IvfIndex, IvfStore}
    val root = Workspace.dir("ivfstore_spec_stream")
    val batches = Workspace.dir("ivfstore_spec_stream_in")
    Seq(root, batches).foreach(r => ExtShared.deleteRec(new java.io.File(r)))
    new java.io.File(batches).mkdirs()
    IvfStore.init(emb.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", K, ITERS, root)
    for (i <- 0 until 2)
      ExtShared.writeSingleFile(emb.filter(F.col("vec_id") % 4 === 2 * i + 1),
        s"$batches/ingest_$i.parquet", 1000000000000L + i * 60000L)
    val queries = emb.filter(F.col("vec_id") < 5)
    val idx = graft.streaming.StreamingOps.streamingIvfIngest(
      spark, batches, root, baseGen = 1L, "vec_id", "embedding")
    val got = IvfIndex.topK(idx, queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    // batch twin over the same halves
    val twin = Workspace.dir("ivfstore_spec_stream_twin")
    ExtShared.deleteRec(new java.io.File(twin))
    IvfStore.init(emb.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", K, ITERS, twin)
    IvfStore.ingest(spark, twin, emb.filter(F.col("vec_id") % 2 =!= 0),
      "vec_id", "embedding")
    val want = IvfIndex.topK(
        IvfStore.load(spark, twin, "vec_id", "embedding"),
        queries, k = 10, nprobe = NPROBE)
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming IVF ingest diverged from batch ingest")
    // replay batch 0: no recompute, no byte moves
    def fileState(r: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(r))
      try s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
      finally s.close()
    }
    val before = fileState(root)
    assert(!IvfStore.ingestBatch(spark, root, 1L,
      emb.filter(F.col("vec_id") % 4 === 1), "vec_id", "embedding"))
    assert(fileState(root) == before, "replay moved store bytes")
  }

  test("balance audit: uniform append stays under the trigger, skewed append fires a retrain that restores balance and recall") {
    import spark.implicits._
    val queries = emb.filter(F.col("vec_id") < 5)
    val idx0 = IvfIndex.build(emb.filter(F.col("vec_id") % 2 === 0),
      "vec_id", "embedding", K, ITERS)
    val base = IvfIndex.imbalance(idx0)
    info(f"post-build imbalance = $base%.2f")

    // the fixture's isotropic odd half spreads across cells — the
    // audit must NOT fire
    val (idxU, retrainedU) = IvfIndex.appendAndMaybeRetrain(idx0,
      emb.filter(F.col("vec_id") % 2 =!= 0), K, ITERS,
      maxImbalance = base * 2.0 + 1.0)
    assert(!retrainedU, "uniform append should not trigger a retrain")

    // a DRIFTED batch: 400 near-copies of one existing vector (tiny
    // deterministic perturbations keep vectors distinct but funnel
    // every row into that vector's cell)
    val seed = emb.filter(F.col("vec_id") === 0)
      .select(F.col("embedding")).collect()(0).getSeq[Float](0)
    val n = emb.count()
    val hot = (0 until 400).map { i =>
      (n + i, seed.zipWithIndex.map { case (x, d) =>
        x + (if (d == i % seed.size) 1e-4f * ((i % 7) + 1) else 0f) })
    }.toDF("vec_id", "embedding")
    val noRetrain = IvfIndex.append(idxU, hot)
    val (idxS, retrainedS) =
      IvfIndex.appendAndMaybeRetrain(idxU, hot, K, ITERS, maxImbalance = 2.0)
    assert(retrainedS, "skewed append must trigger a retrain " +
      f"(imbalance was ${IvfIndex.imbalance(noRetrain)}%.2f)")
    // retrain restores balance (the clone cluster becomes its own
    // cell(s) instead of overloading one) and search quality holds
    // against brute force over the grown corpus
    assert(IvfIndex.imbalance(idxS) < IvfIndex.imbalance(noRetrain),
      "retrain did not improve balance")
    val grown = emb.select("vec_id", "embedding").unionByName(hot
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding")))
    val r = recallOf(IvfIndex.topK(idxS, queries, k = 10, nprobe = NPROBE),
      grown, queries)
    info(f"post-retrain recall@10 = $r%.2f")
    assert(r >= 0.9, f"recall@10 $r%.2f after retrain")
  }

  test("post-purge audit: purging a victim-heavy cluster fires the store retrain and restores recall@10 >= 0.9") {
    import spark.implicits._
    import graft.operators.IvfStore
    val root = Workspace.dir("ivf_purge_retrain")
    ExtShared.deleteRec(new java.io.File(root))
    // a victim-heavy region: 8 dense clumps around orthogonal
    // directions absent from the real data, outnumbering it — kmeans
    // devotes most centroids to them, so the purge strands those
    // centroids and funnels the isotropic survivors into the few left
    val dims = emb.filter(F.col("vec_id") === 0)
      .select(F.col("embedding")).collect()(0).getSeq[Float](0).size
    val n = emb.count()
    val hot = (0 until 800).map { i =>
      (n + i, Seq.tabulate(dims)(d =>
        (if (d == i % 8) 10f else 0f) +
          (if (d == 8 + (i / 8) % (dims - 8)) 0.01f * ((i % 5) + 1) else 0f)))
    }.toDF("vec_id", "embedding")
    val corpus = emb.select("vec_id", "embedding").unionByName(hot
      .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding")))
    IvfStore.init(corpus, "vec_id", "embedding", K, ITERS, root)

    // take down all the clumps: the surviving isotropic corpus
    // funnels into the few centroids that were not trained onto them
    val victims = (n until n + 800).toSeq
    val removed = IvfStore.purge(spark, root, victims)
    val degraded = IvfIndex.imbalance(
      IvfStore.load(spark, root, "vec_id", "embedding"))
    info(f"post-purge imbalance = $degraded%.2f")
    // the audited purge on the already-purged store: the re-purge is
    // an idempotent no-op, but the audit sees the degraded balance
    // and fires the retrain
    val (removedAgain, retrained) = IvfStore.purgeAndMaybeRetrain(spark,
      root, victims, "vec_id", "embedding", K, ITERS, maxImbalance = 1.5)
    assert(removed == 800L, s"removed $removed assignment rows")
    assert(removedAgain == 0L, "re-purge removed rows twice")
    assert(retrained, "victim-heavy purge did not fire the retrain")
    val idx = IvfStore.load(spark, root, "vec_id", "embedding")
    val bal = IvfIndex.imbalance(idx)
    info(f"post-retrain imbalance = $bal%.2f")
    assert(bal <= 1.5, f"retrain left imbalance at $bal%.2f")
    // no victim survives anywhere in the rewritten store
    assert(idx.assigned.select("id").as[Long].collect()
      .forall(_ < n), "a purged vector survived the retrain rewrite")
    val queries = emb.filter(F.col("vec_id") < 5)
    val r = recallOf(IvfIndex.topK(idx, queries, k = 10, nprobe = NPROBE),
      emb, queries)
    info(f"post-purge-retrain recall@10 = $r%.2f")
    assert(r >= 0.9, f"recall@10 $r%.2f after purge retrain")
    // a small, balanced purge on the healthy store does NOT retrain
    val (removed2, retrained2) = IvfStore.purgeAndMaybeRetrain(spark, root,
      Seq(7L, 11L), "vec_id", "embedding", K, ITERS, maxImbalance = 1.5)
    assert(removed2 == 2L)
    assert(!retrained2, "a balanced purge fired a spurious retrain")
  }
}
