package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

/** Materialized incremental LSH signature store — the standing-
  * pipeline seam [[Dedup.incrementalNearDedup]] documents: instead of
  * recomputing the ENTIRE corpus's MinHash signatures on every ingest
  * (a full-corpus tokenize+hash per batch — at 100 TB that nullifies
  * the incrementality), the banded signatures are written as parquet
  * ONCE, and each ingest appends only the kept batch's signatures.
  * From then on a batch is deduplicated by joining its (batch-sized)
  * banded signatures against the store scan — corpus text is never
  * read again (SignatureStoreSpec proves it by deleting the corpus
  * file between init and ingest).
  *
  * Layout: `root/gen=N/part-*.parquet`, one generation directory per
  * ingest (gen=0 is the initial corpus). Appending a NEW directory —
  * rather than appending files into one — keeps every write disjoint
  * from the read glob (the scan's file listing is taken before the
  * write starts) and records provenance: the `gen` partition column
  * says which ingest admitted each signature, and partition pruning
  * can replay the store as of any generation.
  *
  * Many small ingests → many tiny `gen=N` directories → file-listing
  * pressure at scale; [[compactGenerations]] folds generations
  * 0..upTo into a versioned `base.v{K}/` directory whose rows carry
  * `gen` as a DATA column (provenance survives compaction) plus a
  * `_watermark` marker (the highest folded generation). Readers take
  * the HIGHEST base version and only the gen directories ABOVE its
  * watermark — the manifest-pointer principle: the rename that
  * publishes `base.v{K}` is the single atomic commit point, folded
  * gen directories become reader-invisible garbage the moment it
  * lands (no double-count crash window), and are deleted lazily.
  *
  * Store row shape = [[Dedup.bandedSignatures]]: (id, band_idx,
  * band_hash, mh0..mh{k-1}) — `bands` constant-width rows per
  * document regardless of document size, so the store is a small
  * multiple of an id column, not of the corpus.
  *
  * WRITE CONTRACT — single writer. [[ingest]] computes
  * `latestGeneration + 1` and writes that directory; two concurrent
  * ingests can both claim the same `gen=N` and one batch's
  * signatures are silently lost (and both would dedup against a
  * store missing the other's rows — a logical race no commit
  * protocol fixes). Serialize ingests (and [[purge]]) per store —
  * the streaming path gets this for free because a `foreachBatch`
  * sink runs micro-batches sequentially, with an idempotent
  * batch→generation commit for replays. Concurrent READERS are safe
  * against INGEST (it only adds directories the reader's plan never
  * globbed) — but NOT against the maintenance ops: [[purge]] and
  * [[compactGenerations]] delete superseded directories, so a scan
  * planned before and executed after one can fail with
  * FileNotFound and must re-plan (the same reader-retention rule
  * [[ManifestTable.vacuum]] documents). Immutability protects files
  * from mutation, not from maintenance-window deletion.
  */
object SignatureStore {

  /** Initialize the store from the starting corpus: writes gen=0.
    * The only moment corpus text is ever read. */
  def init(corpus: DataFrame, idCol: String, textCol: String,
           root: String, k: Int, bands: Int,
           terms: Column => Column): Unit =
    Dedup.bandedSignatures(corpus, idCol, textCol, k, bands, terms)
      .write.mode("overwrite").parquet(s"$root/gen=0")

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def childNames(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Highest compacted base version under `root` (None before any
    * compaction). */
  private def baseVersion(spark: SparkSession, root: String): Option[Int] = {
    val vs = childNames(spark, root)
      .collect { case s if s.startsWith("base.v") =>
        s.stripPrefix("base.v").toInt }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Highest generation folded into the current base (−1 if none). */
  private[operators] def baseWatermark(spark: SparkSession,
                                       root: String): Int =
    baseVersion(spark, root).map { v =>
      val fs = fsOf(spark, root)
      val in = fs.open(new org.apache.hadoop.fs.Path(
        s"$root/base.v$v/_watermark"))
      try scala.io.Source.fromInputStream(in).mkString.trim.toInt
      finally in.close()
    }.getOrElse(-1)

  /** Live generation directories: above the base watermark (folded
    * directories are reader-invisible garbage awaiting deletion). */
  private def liveGenDirs(spark: SparkSession,
                          root: String): Seq[(Int, String)] = {
    val wm = baseWatermark(spark, root)
    childNames(spark, root)
      .collect { case s if s.startsWith("gen=") =>
        (s.stripPrefix("gen=").toInt, s"$root/$s") }
      .filter(_._1 > wm).sortBy(_._1)
  }

  /** The store's banded signatures WITH the `gen` provenance column:
    * the highest compacted base (gen as a data column) unioned with
    * the live generation directories (gen as a partition column). */
  def signaturesWithGen(spark: SparkSession, root: String): DataFrame = {
    val gens = liveGenDirs(spark, root)
    val baseDf = baseVersion(spark, root).map(v =>
      spark.read.parquet(s"$root/base.v$v"))
    val genDf =
      if (gens.isEmpty) None
      else Some(spark.read.option("basePath", root)
        .parquet(gens.map(_._2): _*)
        .withColumn("gen", F.col("gen").cast("int")))
    require(baseDf.nonEmpty || genDf.nonEmpty, s"empty store at $root")
    (baseDf.toSeq ++ genDf.toSeq).reduce(_.unionByName(_))
  }

  /** The store's banded signatures across all generations (the `gen`
    * provenance column dropped — [[Dedup.incrementalDrops]] expects
    * the bare [[Dedup.bandedSignatures]] shape). */
  def signatures(spark: SparkSession, root: String): DataFrame =
    signaturesWithGen(spark, root).drop("gen")

  /** The store AS OF generation `gen` — the provenance replay the
    * `gen` column exists for: exactly the signatures admitted by
    * ingests 0..gen, in the bare [[Dedup.bandedSignatures]] shape.
    * Works identically on both layouts: live `gen=N` directories
    * prune at the partition level, a compacted base filters on its
    * materialized gen data column (row-group stats prune). */
  def signaturesAsOf(spark: SparkSession, root: String,
                     gen: Int): DataFrame =
    signaturesWithGen(spark, root)
      .filter(F.col("gen") <= gen).drop("gen")

  /** Highest generation present under `root` (−1 if none) — live
    * directories or folded into the base. */
  def latestGeneration(spark: SparkSession, root: String): Int =
    (baseWatermark(spark, root) +:
      liveGenDirs(spark, root).map(_._1)).max

  /** Ingest one batch: near-dedup `incoming` against the store
    * (in-batch + cross drops, [[Dedup.incrementalDrops]] semantics),
    * append the SURVIVORS' banded signatures as the next generation,
    * and return the surviving rows.
    *
    * Scale shape: the batch's signatures are computed once and pinned
    * (localCheckpoint — batch-sized, the small side by construction);
    * the drop-id set (≤ batch ids) is pinned the same way so the
    * store-probe join executes exactly once, feeding both the
    * appended signatures and the returned rows. The corpus-side scan
    * reads constant-width signature rows from parquet — never text —
    * and AQE broadcasts the batch side against it. */
  def ingest(spark: SparkSession, root: String, incoming: DataFrame,
             idCol: String, textCol: String, k: Int, bands: Int,
             threshold: Double, terms: Column => Column,
             guardLedger: Option[String] = None): DataFrame = {
    // admission guard: never probe-and-append against a store a
    // crashed takedown still owes a purge (victim signatures would
    // veto near-copies of retracted content — the exact behavior a
    // retraction must erase). Run Retraction.resume first.
    guardLedger.foreach(TakedownLedger.requireClear(_, root))
    val bandedB = Dedup
      .bandedSignatures(incoming, idCol, textCol, k, bands, terms)
      .localCheckpoint(eager = true)
    val drops = Dedup
      .incrementalDrops(signatures(spark, root), bandedB, idCol, k, threshold)
      .localCheckpoint(eager = true)
    val nextGen = latestGeneration(spark, root) + 1
    bandedB.join(drops, Seq(idCol), "left_anti")
      .write.mode("overwrite").parquet(s"$root/gen=$nextGen")
    incoming.join(drops, Seq(idCol), "left_anti")
  }

  /** Idempotent generation commit — the streaming half of the store.
    * A micro-batch sink calls this with a DETERMINISTIC generation
    * number (`base + batchId`); Structured Streaming's replay
    * contract (a failed batch re-runs with the SAME id and data)
    * then makes the store exactly-once:
    *  - the generation DIRECTORY is the commit record. If `gen=N`
    *    already exists the batch was committed by a prior attempt —
    *    return false without reading, computing, or writing anything
    *    (the store stays byte-identical under replay);
    *  - otherwise survivors are written to a dot-prefixed temp dir
    *    (hidden from every store glob) and published by a single
    *    atomic rename. A crash BEFORE the rename leaves only hidden
    *    temp orphans (the replay redoes the work); there is no crash
    *    window AFTER it, because the rename IS the commit.
    * Correctness under replay needs determinism of the probe set:
    * `foreachBatch` runs batches sequentially, so at batch b the
    * store holds exactly generations < `gen` — the same state every
    * replay of b sees. Returns true iff this call committed. */
  def ingestBatch(spark: SparkSession, root: String, gen: Long,
                  incoming: DataFrame, idCol: String, textCol: String,
                  k: Int, bands: Int, threshold: Double,
                  terms: Column => Column): Boolean =
    commitGeneration(spark, root, gen) {
      val bandedB = Dedup
        .bandedSignatures(incoming, idCol, textCol, k, bands, terms)
        .localCheckpoint(eager = true)
      // first batch of a fresh store: no generations yet, so the
      // cross-store probe runs against an empty signature frame
      val stored =
        if (latestGeneration(spark, root) < 0) bandedB.limit(0)
        else signatures(spark, root)
      val drops = Dedup
        .incrementalDrops(stored, bandedB, idCol, k, threshold)
        .localCheckpoint(eager = true)
      bandedB.join(drops, Seq(idCol), "left_anti")
    }

  /** The idempotent generation-commit primitive [[ingestBatch]] (and
    * [[IvfStore.ingestBatch]]) rides: skip if `gen` is already
    * committed (directory present, or folded into a compacted base
    * whose watermark outlives it); otherwise evaluate `rows`, write
    * them to a hidden temp dir, and publish with one atomic rename.
    * `rows` is only evaluated when the commit will actually proceed —
    * the replay fast-path reads and computes nothing. */
  private[operators] def commitGeneration(spark: SparkSession,
                                          root: String, gen: Long)
                                         (rows: => DataFrame): Boolean = {
    val fs = fsOf(spark, root)
    val genPath = new org.apache.hadoop.fs.Path(s"$root/gen=$gen")
    if (fs.exists(genPath) || gen <= baseWatermark(spark, root))
      return false
    val tmp = s"$root/.ingest-$gen-${java.util.UUID.randomUUID()}"
    rows.write.parquet(tmp)
    val committed = fs.rename(new org.apache.hadoop.fs.Path(tmp), genPath)
    if (!committed) {
      // lost a (single-writer-contract-violating) race — whoever won
      // committed the same deterministic content; drop our copy
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      require(fs.exists(genPath),
        s"gen=$gen rename failed with no committed generation present")
    }
    committed
  }

  /** Purge victim ids from the store — the retraction/takedown path
    * (opt-out, DMCA, contaminated-source recall): a standing pipeline
    * must FORGET, not just ingest. Victim membership is one filtered
    * scan of constant-width signature rows per store segment (a
    * takedown list is small, so `isin` broadcasts into the scan
    * filter); the rewrite then FOLDS the base and every live
    * generation up to the highest affected one into the next base
    * version, published by a single atomic rename — see [[purgeWith]]
    * for the crash-safety reasoning. Cost is O(base + generations ≤
    * the highest affected), the price of atomicity: in the mature
    * state victims are almost always already IN the base (takedowns
    * target old content), where the base rewrite is unavoidable and
    * the marginal fold cost is near zero; generations ABOVE the
    * highest affected one stay byte-identical (spec-pinned). Like
    * [[init]]/[[ingest]], purge is a SINGLE-WRITER maintenance op
    * (the store's documented write contract); see the object doc for
    * the concurrent-reader rule (maintenance deletes directories —
    * readers planned before it must re-plan).
    *
    * Returns the number of signature rows removed. Purging makes the
    * store behave as if the victims were never admitted: a later
    * ingest of a near-copy of a purged doc is ADMITTED (re-admission
    * semantics — the graded `x_retract` query pins this).
    */
  def purge(spark: SparkSession, root: String, idCol: String,
            victims: Seq[Long]): Long = {
    require(victims.nonEmpty, "purge needs at least one victim id")
    // a takedown LIST is driver-sized; isin broadcasts it into the
    // scan filter (row-group pruning applies)
    purgeWith(spark, root,
      df => df.filter(F.col(idCol).isin(victims: _*)),
      df => df.filter(!F.col(idCol).isin(victims: _*)))
  }

  /** [[purge]] for a victim set that is NOT driver-sized — a whole
    * contaminated source, a snapshot recall, any frame-shaped victim
    * population: membership resolves through semi/anti joins instead
    * of an `isin` literal (AQE broadcasts the smaller side), so the
    * purge scales with the victim frame rather than a driver list.
    * `victims` is any single-id-column frame; it is pinned once and
    * probed per store segment. Same single-writer contract and same
    * re-admission semantics as the list form. */
  def purgeIds(spark: SparkSession, root: String, idCol: String,
               victims: DataFrame): Long = {
    require(victims.columns.length == 1,
      s"victims frame must have exactly one id column, got ${victims.columns.mkString(",")}")
    val v = victims.toDF("__victim_id").distinct()
      .localCheckpoint(eager = true)
    purgeWith(spark, root,
      df => df.join(v, df(idCol) === v("__victim_id"), "left_semi"),
      df => df.join(v, df(idCol) === v("__victim_id"), "left_anti"))
  }

  /** The purge engine. Crash-safety design: live generation
    * directories are NEVER rewritten in place (a delete-then-rename
    * swap would destroy a generation's survivors if the process died
    * between the two) — instead, every live generation up to the
    * highest AFFECTED one folds into the next base version (affected
    * generations filtered to survivors, unaffected ones carried
    * verbatim, gen provenance as the data column), published by the
    * base protocol's single atomic rename. There is no state-losing
    * crash window: before the rename the old layout is fully intact;
    * after it the folded directories are reader-invisible garbage.
    * The garbage sweep (stale gen dirs AND superseded base versions —
    * both can still hold victim BYTES, which a takedown must erase)
    * runs first, so a purge re-run after a mid-sweep crash finishes
    * the erasure. */
  private def purgeWith(spark: SparkSession, root: String,
                        hits: DataFrame => DataFrame,
                        survivors: DataFrame => DataFrame,
                        targetFileBytes: Long = 128L << 20): Long = {
    val fs = fsOf(spark, root)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root))) return 0L
    // sweep reader-invisible garbage whose victim bytes may still be
    // on disk: generations folded below the watermark, base versions
    // superseded by the current highest, and crash-orphaned hidden
    // temp dirs (.purge-*/.ingest-*/.compact-*) — safe to take
    // unconditionally because purge runs under the store's
    // single-writer contract, so no temp can belong to a live writer
    val wm = baseWatermark(spark, root)
    val curBase = baseVersion(spark, root)
    childNames(spark, root).foreach {
      case s if s.startsWith("gen=") && s.stripPrefix("gen=").toInt <= wm =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/$s"), true)
      case s if s.startsWith("base.v") &&
          curBase.exists(s.stripPrefix("base.v").toInt < _) =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/$s"), true)
      case s if s.startsWith(".") =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/$s"), true)
      case _ => ()
    }
    val live = liveGenDirs(spark, root)
    if (live.isEmpty && curBase.isEmpty) return 0L
    // ONE store frame feeds both membership and the fold — loading
    // each generation separately would cost a footer/listing job per
    // directory (an uncompacted store can hold hundreds)
    val all = signaturesWithGen(spark, root)
    // membership is ONE grouped scan — victims per generation in a
    // single job, not one serialized driver job per live generation.
    // Rows with gen ≤ watermark live in the base (its gen is a data
    // column); rows above it are live generation directories.
    val victimsPerGen = hits(all)
      .groupBy(F.col("gen")).count().collect()
      .map(r => (r.getAs[Int]("gen"), r.getAs[Long]("count")))
    val affectedGens = victimsPerGen.filter(_._1 > wm)
      .filter(_._2 > 0).map(_._1).toSet
    val removed = victimsPerGen.map(_._2).sum
    if (removed == 0) return 0L
    // fold base + every live gen up to the highest affected one into
    // base.v{K+1}; gens above it stay live directories
    val newWm =
      if (affectedGens.isEmpty) wm else math.max(wm, affectedGens.max)
    val folded = live.filter(_._1 <= newWm)
    // survivors of everything at-or-below the new watermark, straight
    // off the already-planned store frame: partition pruning drops
    // the gen directories staying live, the anti filter is a no-op on
    // unaffected generations (they hold no victims), and no
    // per-generation re-read happens
    val foldDf = survivors(all.filter(F.col("gen") <= newWm))
    // size the published base like compactGenerations does — a purge
    // must not regrow the file count the base layer exists to cap
    val bytes = (folded.map(_._2) ++
        curBase.map(v => s"$root/base.v$v")).map { d =>
      fs.getContentSummary(new org.apache.hadoop.fs.Path(d)).getLength
    }.sum
    val nFiles = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = s"$root/.purge-${java.util.UUID.randomUUID()}"
    // materialize the merged survivors FULLY before publishing — the
    // write below is the materialization barrier
    foldDf.repartition(nFiles).write.parquet(tmp)
    writeMarker(fs, s"$tmp/_watermark", newWm.toString)
    val nextV = curBase.map(_ + 1).getOrElse(0)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$root/base.v$nextV")),
      s"purge publish failed at $root/base.v$nextV")
    // now-invisible garbage; a crash here only delays the byte sweep
    // until the next purge pass
    folded.foreach { case (_, d) =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true) }
    curBase.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/base.v$v"), true))
    removed
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
                          path: String, content: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Fold generations ≤ `upTo` (plus any existing base) into the next
    * base version — the file-listing-pressure valve for stores built
    * by many small ingests: constant directories afterwards instead
    * of one per ingest, with `gen` provenance preserved as a data
    * column. The publish is ONE atomic rename of a fully-written
    * hidden temp dir to `base.v{K+1}` (watermark marker written
    * inside BEFORE the rename, so base + watermark commit together);
    * folded gen directories and the previous base version become
    * reader-invisible instantly and are deleted best-effort after.
    * Single-writer maintenance op, like [[purge]]. Returns the number
    * of generation directories folded. */
  def compactGenerations(spark: SparkSession, root: String,
                         upTo: Int, targetFileBytes: Long = 128L << 20): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fs = fsOf(spark, root)
    val folded = liveGenDirs(spark, root).filter(_._1 <= upTo)
    if (folded.isEmpty) return 0L
    val prevBase = baseVersion(spark, root)
    val prevWm = baseWatermark(spark, root)
    val merged = (prevBase.map(v => spark.read.parquet(s"$root/base.v$v")).toSeq :+
      spark.read.option("basePath", root).parquet(folded.map(_._2): _*)
        .withColumn("gen", F.col("gen").cast("int")))
      .reduce(_.unionByName(_))
    val bytes = folded.map { case (_, d) =>
      fs.getContentSummary(new org.apache.hadoop.fs.Path(d)).getLength
    }.sum + prevBase.map(v => fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$root/base.v$v")).getLength).getOrElse(0L)
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = s"$root/.compact-${java.util.UUID.randomUUID()}"
    merged.repartition(nFiles).write.parquet(tmp)
    val newWm = math.max(prevWm, folded.map(_._1).max)
    writeMarker(fs, s"$tmp/_watermark", newWm.toString)
    val nextV = prevBase.map(_ + 1).getOrElse(0)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$root/base.v$nextV")),
      s"compaction publish failed at $root/base.v$nextV")
    // now-invisible garbage; a crash here only leaves orphans
    folded.foreach { case (_, d) =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true) }
    prevBase.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/base.v$v"), true))
    folded.size.toLong
  }
}
