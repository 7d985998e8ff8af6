package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, functions => F}

/** Streaming contracts that need multi-run choreography: sink replay
  * idempotence and dim updates across micro-batches — the failure/
  * retry and reference-data-refresh shapes a production pipeline
  * actually exercises. */
class StreamingSpec extends SparkSpec {

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }

  test("foreachBatch sink replay overwrites its own batches instead of appending") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_sink_replay").toString
    val first = graft.streaming.StreamingOps
      .streamingDedupToParquet(spark, sf, out)
      .select("doc_id").as[Long].collect().toSet
    assert(first.nonEmpty)
    // simulate a failure/retry REPLAY: wipe the checkpoint (so the
    // engine forgets what it processed) but keep the sink output —
    // the re-run reprocesses the same input under the same batch ids
    // and must OVERWRITE the existing batch dirs, not append to them
    deleteRec(new java.io.File(s"$out/_checkpoint"))
    val replayed = graft.streaming.StreamingOps
      .streamingDedupToParquet(spark, sf, out)
      .select("doc_id").as[Long].collect().toSet
    assert(replayed == first, "replay changed the result set")
    val total = spark.read.parquet(s"$out/batch_id=*").count()
    assert(total == first.size.toLong,
      s"replay appended duplicates: $total rows for ${first.size} docs")
  }

  test("streaming signature store equals the batch ingest sequence; a replayed batch leaves the store byte-identical") {
    import spark.implicits._
    import graft.operators.SignatureStore
    import graft.functions.Text
    val K = 16; val BANDS = 8; val TAU = 0.5
    def sh3(c: org.apache.spark.sql.Column) = Text.distinctShingles(c, 3)
    val docs = graft.sources.Tables.scan(spark, sf, "documents")

    // three mtime-ordered single-file micro-batches
    val batches = Workspace.dir("stream_sigstore_spec_in")
    val root = Workspace.dir("stream_sigstore_spec_store")
    Seq(batches, root).foreach(r => deleteRec(new java.io.File(r)))
    new java.io.File(batches).mkdirs()
    for (i <- 0 until 3)
      ExtShared.writeSingleFile(docs.filter(F.col("doc_id") % 3 === i),
        s"$batches/ingest_$i.parquet", 1000000000000L + i * 60000L)
    val got = graft.streaming.StreamingOps
      .streamingNeardupStore(spark, batches, root, baseGen = 0L,
        "doc_id", "text", K, BANDS, TAU, sh3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch-mode twin: the same three ingests through ingestBatch
    val twinRoot = Workspace.dir("stream_sigstore_spec_twin")
    deleteRec(new java.io.File(twinRoot))
    for (i <- 0 until 3)
      assert(SignatureStore.ingestBatch(spark, twinRoot, i,
        docs.filter(F.col("doc_id") % 3 === i),
        "doc_id", "text", K, BANDS, TAU, sh3), s"batch $i did not commit")
    val want = SignatureStore.signaturesWithGen(spark, twinRoot)
      .select(F.col("doc_id"), F.col("gen").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "streaming store differs from the batch ingest sequence")

    // REPLAY: re-run batch 1 with the same id and data — the commit
    // must be a no-op and every store byte must stay where it was
    def fileState(r: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(r))
      try s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
      finally s.close()
    }
    val before = fileState(twinRoot)
    val committed = SignatureStore.ingestBatch(spark, twinRoot, 1,
      docs.filter(F.col("doc_id") % 3 === 1),
      "doc_id", "text", K, BANDS, TAU, sh3)
    assert(!committed, "replayed batch committed a second generation")
    assert(fileState(twinRoot) == before,
      "replay moved store bytes (size/mtime changed or files appeared)")
  }

  test("streaming into a pre-seeded store: baseGen offsets past committed generations so batch 0 is not swallowed") {
    import spark.implicits._
    import graft.operators.SignatureStore
    import graft.functions.Text
    val K = 16; val BANDS = 8; val TAU = 0.5
    def sh3(c: org.apache.spark.sql.Column) = Text.distinctShingles(c, 3)
    val docs = graft.sources.Tables.scan(spark, sf, "documents")
    val batches = Workspace.dir("stream_seeded_in")
    val root = Workspace.dir("stream_seeded_store")
    Seq(batches, root).foreach(r => deleteRec(new java.io.File(r)))
    new java.io.File(batches).mkdirs()
    // the store already holds generation 0 BEFORE the stream starts —
    // a raw batchId-0 commit would collide with it and the idempotent
    // protocol would silently treat micro-batch 0 as a replay
    SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 0),
      "doc_id", "text", root, K, BANDS, sh3)
    for (i <- 1 to 2)
      ExtShared.writeSingleFile(docs.filter(F.col("doc_id") % 3 === i),
        s"$batches/ingest_$i.parquet", 1000000000000L + i * 60000L)
    val base = SignatureStore.latestGeneration(spark, root) + 1
    val got = graft.streaming.StreamingOps
      .streamingNeardupStore(spark, batches, root, baseGen = base.toLong,
        "doc_id", "text", K, BANDS, TAU, sh3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every micro-batch landed as its own post-seed generation
    assert(got.map(_._2) == Set(0L, 1L, 2L),
      s"generations present: ${got.map(_._2)}")
    // batch-mode twin over the same sequence
    val twin = Workspace.dir("stream_seeded_twin")
    deleteRec(new java.io.File(twin))
    SignatureStore.init(docs.filter(F.col("doc_id") % 3 === 0),
      "doc_id", "text", twin, K, BANDS, sh3)
    for (i <- 1 to 2)
      assert(SignatureStore.ingestBatch(spark, twin, i.toLong,
        docs.filter(F.col("doc_id") % 3 === i),
        "doc_id", "text", K, BANDS, TAU, sh3))
    val want = SignatureStore.signaturesWithGen(spark, twin)
      .select(F.col("doc_id"), F.col("gen").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      "pre-seeded streaming store differs from the batch ingest sequence")
  }

  test("observability: watermark drop accounting reports the exact planted late-row count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_obs").toString
    // file order IS batch order for the file source (mod-time order),
    // so each write pins an explicit, increasing mtime
    def writeBatch(rows: Seq[(Long, String, Long)], mtime: Long): Unit = {
      val before = new java.io.File(dir).listFiles()
        .map(_.getName).toSet
      rows.toDF("doc_id", "fp", "sec")
        .select($"doc_id", $"fp", F.timestamp_seconds($"sec").as("ingest_ts"))
        .coalesce(1).write.mode("append").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && !before(f.getName))
        .foreach(_.setLastModified(mtime))
    }
    // batch 0: 10 on-time rows (ts 10000..10009s); with the 60s
    // horizon the watermark after it is 9949s. Batch 1 exists because
    // late-event filtering uses the PREVIOUS batch's watermark
    // (Spark's two-version watermark: late-events = previous eviction
    // value), so drops planted directly in batch 1 would still see
    // the initial epoch watermark — batch 2 is the first whose late
    // filter runs at 9949s.
    writeBatch((0 until 10).map(i => (i.toLong, s"doc$i", 10000L + i)),
      1000000000000L)
    writeBatch(Seq((50L, "mid0", 10100L), (51L, "mid1", 10101L)),
      1000000100000L)
    // batch 2: 3 LATE rows (ts 9000s < 9949s; fresh fingerprints, so
    // only the watermark — not dedup — can account for them) + 1
    // on-time row
    writeBatch(Seq((100L, "late0", 9000L), (101L, "late1", 9001L),
      (102L, "late2", 9002L), (200L, "ok0", 10200L)),
      1000000200000L)

    val schema = spark.read.parquet(dir).schema
    val (outs, obs) = graft.streaming.StreamingOps.observeStreams(spark) {
      graft.ScopedShufflePartitions(spark) {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .withWatermark("ingest_ts", "60 seconds")
          .dropDuplicatesWithinWatermark("fp")
          .writeStream.outputMode("append")
          .format("memory").queryName("obs_dedup").start()
        try q.processAllAvailable() finally q.stop()
        spark.table("obs_dedup").select("doc_id").as[Long].collect().toSet
      }
    }
    val o = obs("obs_dedup")
    // the EXACT planted count, and nothing else, was dropped — and
    // the dropped rows are absent from the output
    assert(o.numRowsDroppedByWatermark == 3L, o)
    assert(outs == ((0 until 10).map(_.toLong) ++ Seq(50L, 51L, 200L)).toSet)
    assert(o.numInputRows == 16L, o)
    assert(o.stateRows > 0L && o.stateMemoryBytes > 0L, o)
    assert(o.batches >= 3L, o)
  }

  test("stateful totals are identical under the RocksDB state-store provider") {
    // the 100-TB configuration: streaming state on local disk
    // (RocksDB) instead of executor heap. State storage is an
    // executor-local concern — flatMapGroupsWithState results must be
    // IDENTICAL under either provider; this runs the x_stream_state
    // transform under the RocksDB seam and diffs against the batch
    // ground truth (the same oracle the graded query uses).
    val rocks = graft.streaming.StreamingOps.withRocksDbStateStore(spark) {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
      graft.streaming.StreamingOps
        .streamingUserTotals(spark, sf, "rocksdb_user_totals")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    }
    // seam restored after the scope
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")), "provider conf leaked out of the seam")
    val batch = graft.sources.Tables.scan(spark, sf, "events")
      .groupBy("user_id")
      .agg(F.count(F.lit(1)).as("n"), F.sum("value").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(rocks.keySet == batch.keySet,
      s"user sets differ: ${rocks.keySet.size} vs ${batch.keySet.size}")
    for ((u, (n, s)) <- batch) {
      val (rn, rs) = rocks(u)
      // sums: the stream accumulates in arrival order, the batch agg
      // in partition-merge order — same values, different IEEE
      // association; compare at 1e-6 relative, not bit-exact
      assert(rn == n && math.abs(rs - s) <= 1e-6 * math.max(1.0, math.abs(s)),
        s"user $u: rocksdb ($rn, $rs) != batch ($n, $s)")
    }
  }

  test("an event older than the watermark is dropped; the unbounded twin keeps it") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    // bounded twin: watermarked dedup — this is x_stream_dedup_bounded's
    // operator (dropDuplicatesWithinWatermark)
    val bounded = MemoryStream[(Long, String, java.sql.Timestamp)]
    val bq = bounded.toDF().toDF("doc_id", "fp", "ingest_ts")
      .withWatermark("ingest_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_bounded").start()
    // unbounded twin: x_stream_dedup's operator — no watermark, no
    // late-data concept, every first occurrence is kept forever
    val global = MemoryStream[(Long, String, java.sql.Timestamp)]
    val gq = global.toDF().toDF("doc_id", "fp", "ingest_ts")
      .dropDuplicates("fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_global").start()
    try {
      // batch 1 advances the bounded twin's watermark to 11:50
      bounded.addData((1L, "A", ts("12:00:00")))
      global.addData((1L, "A", ts("12:00:00")))
      bq.processAllAvailable(); gq.processAllAvailable()
      // batch 2: fp=B is LATE (11:30 < watermark 11:50) → the bounded
      // twin must drop it even though its fingerprint was never seen;
      // fp=C is fresh and flows through both
      val batch2 = Seq((2L, "B", ts("11:30:00")), (3L, "C", ts("12:01:00")))
      bounded.addData(batch2: _*); global.addData(batch2: _*)
      bq.processAllAvailable(); gq.processAllAvailable()
      val bRows = spark.table("late_bounded").select("doc_id")
        .as[Long].collect().toSet
      val gRows = spark.table("late_global").select("doc_id")
        .as[Long].collect().toSet
      assert(bRows == Set(1L, 3L), s"bounded emitted $bRows")
      assert(gRows == Set(1L, 2L, 3L), s"global emitted $gRows")
      // the twins diverge EXACTLY on the late event — the documented
      // trade of bounded state (README streaming matrix)
      assert(gRows -- bRows == Set(2L))
    } finally { bq.stop(); gq.stop() }
  }

  test("stream-static enrich holds no join state and serves the updated dim on re-plan") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_enrich_dim").toString
    val (evDir, dimDir, outDir, ckpt) =
      (s"$base/events", s"$base/dim", s"$base/out", s"$base/ckpt")
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType)))

    def enrichOnce(): Unit = {
      // dim read FRESH per run — the production pattern for a plain
      // parquet dim: zero join state, every (re)plan serves the
      // current reference data
      val dim = spark.read.parquet(dimDir)
      val enriched = spark.readStream.schema(evSchema).parquet(evDir)
        .join(dim, Seq("user_id"))
      val q = enriched.writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
          (): Unit
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    Seq((1L, "SEG_A")).toDF("user_id", "seg").write.parquet(dimDir)
    Seq((10L, 1L)).toDF("event_id", "user_id").write.parquet(evDir)
    enrichOnce() // batch 1 joins dim v1

    // the dim row CHANGES (user 1 re-segmented) and a new event lands
    Seq((1L, "SEG_B")).toDF("user_id", "seg")
      .write.mode("overwrite").parquet(dimDir)
    Seq((11L, 1L)).toDF("event_id", "user_id")
      .write.mode("append").parquet(evDir)
    enrichOnce() // checkpoint resume: ONLY the new event, against dim v2

    val rows = spark.read.parquet(s"$outDir/batch_id=*")
      .select("event_id", "seg").as[(Long, String)].collect().toMap
    // batch-1 output keeps the dim it was enriched with; batch-2
    // output reflects the update — and nothing was re-emitted for the
    // old event (total 2 rows), proving the static side carried no
    // streaming state across batches
    assert(rows == Map(10L -> "SEG_A", 11L -> "SEG_B"), s"got $rows")
  }

  test("streaming CDC converges to the batch apply across real micro-batch splits") {
    import spark.implicits._
    val root = graft.Workspace.dir("stream_cdc_spec")
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    // conflicting changes deliberately SPLIT so each file lands in
    // its own micro-batch and the cross-batch winner is decided by
    // VERSION, not arrival: key 2's delete (ver 2) arrives BEFORE its
    // stale update (ver 1) — order-dependent state would resurrect it
    val f1 = Seq((2L, null.asInstanceOf[String], "D", 2L),
      (4L, "d", "I", 1L)).toDF("id", "v", "op", "ver")
    val f2 = Seq((2L, "stale", "U", 1L),
      (3L, "c2", "U", 1L)).toDF("id", "v", "op", "ver")
    val f3 = Seq((3L, "c3", "U", 2L)).toDF("id", "v", "op", "ver")
    // one parquet file per change batch, copied into a flat feed dir
    // so maxFilesPerTrigger=1 yields exactly three micro-batches
    val dirs = Seq(f1, f2, f3).zipWithIndex.map { case (df, i) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$root/feed_tmp_$i")
      s"$root/feed_tmp_$i"
    }
    val feed = s"$root/feed"
    new java.io.File(feed).mkdirs()
    dirs.zipWithIndex.foreach { case (d, i) =>
      val part = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(s"$feed/c$i.parquet").toPath)
    }
    val got = graft.streaming.StreamingOps.streamingCdcApply(spark, base,
        feed, Seq("id"), "op", "ver", s"$root/state")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = graft.operators.Writes.cdcApply(base,
        f1.unionByName(f2).unionByName(f3), Seq("id"), "op", "ver")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want, s"stream $got != batch $want")
    assert(got == Map(1L -> "a", 3L -> "c3", 4L -> "d"),
      "version order lost across micro-batches")
    // the run really executed MULTIPLE micro-batches (one per file)
    val stateDirs = new java.io.File(s"$root/state").listFiles()
      .map(_.getName).filter(_.startsWith("state_")).toSet
    assert(Set("state_-1", "state_0", "state_1", "state_2").subsetOf(stateDirs),
      s"expected one state per micro-batch, got $stateDirs")
  }

  test("graft-cdf streaming source: offsets checkpoint across restarts; a wiped checkpoint replays ledger-safe") {
    import graft.operators.ManifestTable
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdfsrc").toString
    val src = s"$dir/src"; val sink = s"$dir/sink"; val ckpt = s"$dir/ckpt"
    def mk(lo: Long, hi: Long) = (lo until hi).toDF("id")
      .withColumn("payload", F.concat(F.lit("row"), F.col("id")))
    ManifestTable.init(src)
    ManifestTable.append(spark, src, mk(0, 100))    // v1
    ManifestTable.append(spark, src, mk(100, 150))  // v2
    ManifestTable.deleteWhere(spark, src, F.col("id") % 10 === 0) // v3
    ManifestTable.init(sink)
    var batches = 0
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdf").option("path", src)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          batches += 1
          ManifestTable.appendBatch(spark, sink, id, b)
          (): Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val want = (1 to 3).flatMap(v =>
      ManifestTable.changes(spark, src, v - 1, v)
        .withColumn("_commit_version", F.lit(v.toLong))
        .select("id", "_change_type", "_commit_version")
        .as[(Long, String, Long)].collect()).toSet
    def got(): Set[(Long, String, Long)] =
      ManifestTable.read(spark, sink)
        .select("id", "_change_type", "_commit_version")
        .as[(Long, String, Long)].collect().toSet
    assert(got() == want, "streamed feed must equal the batch feed")
    // restart on the SAME checkpoint: the offset log is the watermark
    run()
    assert(got() == want, "a restart re-delivered data")
    // a NEW commit streams incrementally on the next trigger
    ManifestTable.append(spark, src, mk(500, 510)) // v4
    run()
    assert(got().count(_._3 == 4L) == 10,
      "the incremental commit must arrive as version 4 rows")
    // wiped checkpoint: the full feed replays under the same
    // deterministic batch ids — the sink's ledger must no-op them
    val before = got()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(ckpt))
    run()
    assert(got() == before, "ledgered sink double-counted a replay")
    assert(batches >= 3, "the source never delivered a micro-batch")

    // ADDITIVE mid-stream schema evolution must not wedge the query:
    // a commit with a brand-new column, landing while the query is
    // RUNNING (so the source's pinned schema predates it), streams
    // with the new column DROPPED (the subscription serves its pinned
    // schema) instead of failing the union on every retry. Fresh
    // sink+checkpoint: a wiped-then-continued checkpoint would reuse
    // batch ids the old sink ledger already holds.
    def feedSet(hi: Int): Set[(Long, String, Long)] =
      (1 to hi).flatMap(v =>
        ManifestTable.changes(spark, src, v - 1, v)
          .withColumn("_commit_version", F.lit(v.toLong))
          .select("id", "_change_type", "_commit_version")
          .as[(Long, String, Long)].collect()).toSet
    val sink3 = s"$dir/sink3"
    ManifestTable.init(sink3)
    locally {
      val q = spark.readStream.format("graft-cdf").option("path", src)
        .load()
        .writeStream.option("checkpointLocation", s"$dir/ckpt3")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          ManifestTable.appendBatch(spark, sink3, id, b)
          (): Unit
        }
        .start()
      try {
        q.processAllAvailable() // drains v1..v4, pinned pre-evolution
        ManifestTable.append(spark, src, mk(600, 605)
          .withColumn("extra", F.lit(9L))) // v5, evolves the table
        q.processAllAvailable()
      } finally q.stop()
    }
    val sink3Got = ManifestTable.read(spark, sink3)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(sink3Got == feedSet(5),
      "the schema-evolving commit must still stream (pinned columns)")
    assert(!ManifestTable.read(spark, sink3).columns.contains("extra"),
      "a mid-stream column must be dropped, not smuggled in")

    // maxVersionsPerTrigger PAGES a cold subscriber through history
    // one version per micro-batch instead of one union over them all,
    // and the capped frontier must never rewind across restarts
    // (this subscriber pins the POST-evolution schema, so the pre-
    // evolution versions null-fill the late column)
    val ckpt2 = s"$dir/ckpt2"
    val sink2 = s"$dir/sink2"
    ManifestTable.init(sink2)
    var ids2 = Vector.empty[Long]
    def runCapped(): Unit = {
      val q = spark.readStream.format("graft-cdf").option("path", src)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.option("checkpointLocation", ckpt2)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          ids2 :+= id
          ManifestTable.appendBatch(spark, sink2, id, b)
          (): Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runCapped()
    // head is v5 → five paged batches, one per version
    assert(ids2 == Vector(0L, 1L, 2L, 3L, 4L),
      s"expected one batch per version, got $ids2")
    assert(ManifestTable.read(spark, sink2)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet == feedSet(5),
      "paged delivery must equal the batch feed's content")
    runCapped() // restart: the persisted frontier offers nothing new
    assert(ids2.size == 5, "capped restart re-offered an old version")
  }

  test("graft-cdf offered-offset log: append-only markers, legacy recovery, and the crash-window re-offer") {
    import graft.operators.ManifestTable
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdfoff").toString
    val src = s"$dir/src"; val meta = s"$dir/meta"
    ManifestTable.init(src)
    ManifestTable.append(spark, src, (0L until 10L).toDF("id")) // v1
    ManifestTable.append(spark, src, (10L until 20L).toDF("id")) // v2
    def mkSource() = new graft.sources.CdfStreamSource()
      .createSource(spark.sqlContext, meta, None, "graft-cdf",
        Map("path" -> src))
    def offsetOf(o: org.apache.spark.sql.execution.streaming.Offset): Long =
      o.json.trim.toLong
    val s1 = mkSource()
    assert(s1.getOffset.map(offsetOf).contains(2L))
    // the frontier persisted as an append-only marker whose NAME is
    // the value — no mutable file to lose in a crash window
    val markers = new java.io.File(meta).listFiles()
      .map(_.getName).filter(_.startsWith("max_offered.")).toSeq
    assert(markers == Seq("max_offered.2"), s"got $markers")
    // CRASH-WINDOW RE-OFFER: offered (2) == head (2), but the engine
    // may have crashed before durably logging the offer — getOffset
    // must keep re-offering the persisted frontier (the engine no-ops
    // when caught up, builds the gap batch when behind), never None,
    // which would strand (committed, offered] until an unrelated
    // future commit
    assert(s1.getOffset.map(offsetOf).contains(2L),
      "quiescent table with a persisted offer must re-offer, not None")
    // ... and the gap batch is buildable from a behind-committed start
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val gap = s1.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    assert(gap.schema.fieldNames.contains("_commit_version"))
    // a fresh source on the same metadata dir recovers the frontier
    // from the marker listing
    assert(mkSource().getOffset.map(offsetOf).contains(2L))
    // LEGACY recovery: a pre-r18 checkpoint stored the value inside a
    // single max_offered_version file — read it, take the max, and
    // never rewind below it even when it is AHEAD of the markers
    val meta2 = s"$dir/meta2"
    new java.io.File(meta2).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(meta2, "max_offered_version"),
      "2".getBytes("UTF-8"))
    val s2 = new graft.sources.CdfStreamSource()
      .createSource(spark.sqlContext, meta2, None, "graft-cdf",
        Map("path" -> src))
    assert(s2.getOffset.map(offsetOf).contains(2L),
      "legacy offered file must be honored (re-offered, not rewound)")
    // a new commit advances past the recovered frontier and prunes
    // superseded markers
    ManifestTable.append(spark, src, (20L until 30L).toDF("id")) // v3
    assert(s1.getOffset.map(offsetOf).contains(3L))
    val after = new java.io.File(meta).listFiles()
      .map(_.getName).filter(_.startsWith("max_offered.")).toSeq
    assert(after == Seq("max_offered.3"), s"got $after")
  }

  test("graft-manifest streaming sink: every mode is exactly-once through the batch ledger") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.ManifestTable
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_snk").toString

    // ---- append mode: two batches, restart, wiped-checkpoint replay
    val aRoot = s"$dir/a"; val aCkpt = s"$dir/ackpt"
    val aIn = MemoryStream[Long]
    def runAppend(): Unit = {
      val q = aIn.toDF().toDF("id").writeStream
        .format("graft-manifest").option("path", aRoot)
        .option("statCols", "id")
        .option("checkpointLocation", aCkpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    aIn.addData(0L until 10L: _*)
    runAppend()
    aIn.addData(10L until 20L: _*)
    runAppend()
    def aIds(): Seq[Long] = ManifestTable.read(spark, aRoot)
      .select("id").as[Long].collect().toSeq.sorted
    assert(aIds() == (0L until 20L))
    // the sink created the table WITH its declared stat column
    assert(ManifestTable.statBounds(spark, aRoot, "id").isDefined,
      "statCols option must reach the created table")
    // restart on the same checkpoint: nothing re-delivered
    runAppend()
    assert(aIds() == (0L until 20L), "restart re-appended a batch")
    // WIPED checkpoint at the same path: a fresh query id — the claim
    // WARNs and adopts (the graded recovery contract), deterministic
    // replays of committed batches no-op via the id watermark, and
    // the recorded claim moves to the new query id
    deleteRec(new java.io.File(aCkpt))
    val aIn2 = MemoryStream[Long]
    aIn2.addData(0L until 10L: _*)
    val qr = aIn2.toDF().toDF("id").writeStream
      .format("graft-manifest").option("path", aRoot)
      .option("checkpointLocation", aCkpt)
      .outputMode("append").start()
    try qr.processAllAvailable() finally qr.stop()
    assert(aIds() == (0L until 20L),
      "ledgered sink double-counted a wiped-checkpoint replay")

    // ---- update mode: replace-or-insert by the mergeKey option
    val uRoot = s"$dir/u"; val uCkpt = s"$dir/uckpt"
    ManifestTable.init(uRoot, Seq("id"), Seq("id"))
    ManifestTable.append(spark, uRoot,
      (0L until 10L).toDF("id").withColumn("v", F.lit("old")))
    val uIn = MemoryStream[(Long, String)]
    val uq = uIn.toDF().toDF("id", "v").writeStream
      .format("graft-manifest").option("path", uRoot)
      .option("mergeKey", "id")
      .option("checkpointLocation", uCkpt)
      .outputMode("update").start()
    try {
      uIn.addData((5L, "new5"), (12L, "new12"))
      uq.processAllAvailable()
    } finally uq.stop()
    val uGot = ManifestTable.read(spark, uRoot)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(uGot.size == 11 && uGot(5L) == "new5" &&
      uGot(12L) == "new12" && uGot(4L) == "old")

    // ---- complete mode: each batch atomically replaces the table
    val cRoot = s"$dir/c"; val cCkpt = s"$dir/cckpt"
    val cIn = MemoryStream[Long]
    val cq = cIn.toDF().toDF("id")
      .groupBy(F.col("id") % 2 === 0 as "even").count()
      .writeStream
      .format("graft-manifest").option("path", cRoot)
      .option("checkpointLocation", cCkpt)
      .outputMode("complete").start()
    try {
      cIn.addData(0L until 4L: _*)
      cq.processAllAvailable()
      cIn.addData(4L until 10L: _*)
      cq.processAllAvailable()
    } finally cq.stop()
    val cGot = ManifestTable.read(spark, cRoot)
      .select("even", "count").as[(Boolean, Long)].collect().toMap
    assert(cGot == Map(true -> 5L, false -> 5L),
      s"complete mode must serve ONLY the final aggregation state, got $cGot")
    // every batch is a time-travel-readable version with its marker
    assert(ManifestTable.isBatchCommitted(cRoot, 0L) &&
      ManifestTable.isBatchCommitted(cRoot, 1L))

    // ---- the refusal surface
    val rIn = MemoryStream[Long]
    val e1 = intercept[Exception](rIn.toDF().toDF("id").writeStream
      .format("graft-manifest").option("path", s"$dir/x")
      .option("checkpointLocation", s"$dir/xckpt")
      .outputMode("update").start())
    assert(e1.getMessage.contains("mergeKey"))
    // a MATCHING re-declaration is idempotent (restarts re-pass it —
    // runAppend above already proved it); a CONFLICTING one refuses
    val e2 = intercept[Exception](rIn.toDF().toDF("id").writeStream
      .format("graft-manifest").option("path", aRoot)
      .option("statCols", "id,other")
      .option("checkpointLocation", s"$dir/yckpt")
      .outputMode("append").start())
    assert(e2.getMessage.contains("creation-time"))
    // replay-identity: a SECOND query (a DIFFERENT checkpoint) at the
    // same table would restart micro-batch ids at 0 and the ledger
    // would silently no-op them as replays — it must refuse loudly at
    // its first batch instead (the restart and wiped-checkpoint paths
    // above already proved the SAME checkpoint keeps no-opping)
    val zIn = MemoryStream[Long]
    zIn.addData(100L until 105L: _*)
    val zq = zIn.toDF().toDF("id").writeStream
      .format("graft-manifest").option("path", aRoot)
      .option("statCols", "id")
      .option("checkpointLocation", s"$dir/zckpt")
      .outputMode("append").start()
    val e3 = intercept[Exception](
      try zq.processAllAvailable() finally zq.stop())
    def causeChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(causeChain(e3).exists(_.contains("one standing query")),
      s"expected the checkpoint-identity refusal, got: ${causeChain(e3)}")
    assert(aIds() == (0L until 20L),
      "the refused second query must not have written anything")
  }
}
