package graft.operators

import org.apache.spark.sql.SparkSession

/** Parquet-materialized [[IvfIndex]] — the embedding twin of
  * [[SignatureStore]], completing the standing-pipeline trio
  * (LSH signature store, manifest table, IVF store): the trained
  * centroids and the assignment frame persist on disk, each ingest
  * appends ONLY the batch's assignments as a new generation, and
  * search loads the standing index without ever touching the raw
  * vector source again (IvfIndexSpec proves it by deleting the
  * source between init and ingest).
  *
  * Layout: `root/centroids/` (k float vectors) and
  * `root/assigned/` — a [[ManifestTable]] of rows in the
  * [[Similarity.assignCellsWith]] shape (id, vec, nrm, cell) plus
  * the `gen` provenance column — norms and cells are computed once,
  * at ingest, and never recomputed at query time. Generation
  * numbering, exactly-once streaming replay, compaction, and purge
  * all ride the manifest's batch ledger, exactly as in
  * [[SignatureStore]] (one commit protocol for the engine).
  */
object IvfStore {

  private def assignedRoot(root: String) = s"$root/assigned"

  /** Train on `corpus` and persist centroids + gen-0 assignments.
    * CLEARS any existing store under `root` first: overwriting only
    * the centroids would leave stale assignments behind — computed
    * against the OLD centroids, silently corrupting every later
    * load/search. */
  def init(corpus: org.apache.spark.sql.DataFrame, idCol: String,
           vecCol: String, k: Int, iters: Int, root: String): Unit = {
    val spark = corpus.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val idx = IvfIndex.build(corpus, idCol, vecCol, k, iters)
    idx.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    ManifestTable.init(assignedRoot(root), Seq("gen", "id"), Seq("id"))
    ManifestTable.appendBatch(spark, assignedRoot(root), 0L,
      idx.assigned.withColumn("gen",
        org.apache.spark.sql.functions.lit(0L)))
    ()
  }

  /** The standing index, read back from parquet. The assignment half
    * reads through [[SignatureStore.signatures]] — one owner for the
    * generation-store read convention. */
  def load(spark: SparkSession, root: String, idCol: String,
           vecCol: String): IvfIndex.Index =
    IvfIndex.Index(
      spark.read.parquet(s"$root/centroids"),
      SignatureStore.signatures(spark, assignedRoot(root)),
      idCol, vecCol)

  /** Assign one batch against the STORED centroids and append its
    * assignments as the next generation — O(batch) work, no retrain,
    * no corpus re-read. Returns the updated in-memory index. */
  def ingest(spark: SparkSession, root: String,
             batch: org.apache.spark.sql.DataFrame, idCol: String,
             vecCol: String,
             guardLedger: Option[String] = None): IvfIndex.Index = {
    // admission guard — see [[TakedownLedger.requireClear]]
    guardLedger.foreach(TakedownLedger.requireClear(_, root))
    val idx = load(spark, root, idCol, vecCol)
    val appended = Similarity
      .assignCells(batch, idx.centroids, idCol, vecCol)
      .localCheckpoint(eager = true)
    // one manifest read serves the generation number AND the append's
    // replay check + first commit attempt (same seam as
    // [[SignatureStore.ingest]])
    val head = ManifestTable.latest(assignedRoot(root))
    val nextGen = head.map(ManifestTable.ledgerHigh).getOrElse(-1L) + 1
    ManifestTable.appendBatchWith(spark, assignedRoot(root), nextGen,
      appended.withColumn("gen",
        org.apache.spark.sql.functions.lit(nextGen)), head)
    idx.copy(assigned = idx.assigned.unionByName(appended))
  }

  /** Idempotent micro-batch ingest — the vector twin of
    * [[SignatureStore.ingestBatch]]: assign `batch` against the
    * STORED centroids and commit it as generation `gen` through the
    * manifest's exactly-once batch ledger (a replayed batch finds
    * its marker and computes nothing, so the store is byte-identical
    * under Structured Streaming's replay contract). `gen` must be
    * deterministic across replays: a streaming sink uses
    * `baseGen + batchId`, with `baseGen` fixed for the sink's
    * lifetime (e.g. latestGeneration+1 at the moment the STREAM is
    * created, paired with its checkpoint). Unlike the signature
    * store's dedup ingest, assignment is order-independent across
    * batches — only the id/generation bookkeeping needs the
    * sequencing. Returns true iff this call committed. */
  def ingestBatch(spark: SparkSession, root: String, gen: Long,
                  batch: org.apache.spark.sql.DataFrame,
                  idCol: String, vecCol: String): Boolean = {
    val assigned = assignedRoot(root)
    if (ManifestTable.isBatchCommitted(assigned, gen)) return false
    ManifestTable.init(assigned, Seq("gen", "id"), Seq("id"))
    // gen rides as a LONG data column, same domain as the ledger id —
    // see [[SignatureStore.ingestBatch]]'s wrap note
    ManifestTable.appendBatch(spark, assigned, gen,
      Similarity.assignCells(batch,
          spark.read.parquet(s"$root/centroids"), idCol, vecCol)
        .withColumn("gen",
          org.apache.spark.sql.functions.lit(gen)))
    true
  }

  /** Fold assignment generations ≤ `upTo` into a compacted base —
    * [[SignatureStore.compactGenerations]] on the assignment store
    * (same layout, same versioned-base + watermark protocol, same
    * single-writer contract); centroids are untouched. Caps the
    * directory count for indexes built by many small ingests. */
  def compactGenerations(spark: SparkSession, root: String,
                         upTo: Int,
                         targetFileBytes: Long = 128L << 20): Long =
    SignatureStore.compactGenerations(spark, assignedRoot(root), upTo,
      targetFileBytes)

  /** Purge victim ids from the standing index's assignment
    * generations — the retraction path ([[SignatureStore.purge]]
    * semantics and machinery; same single-writer contract). Centroids
    * are untouched: they are aggregates, not per-document state, and
    * carry no retrievable victim content — a purge only has to make
    * the victims unfindable (no assignment row → never a search
    * candidate → absent from every top-k). If mass removal skews the
    * cell balance, the standing [[IvfIndex.imbalance]] audit catches
    * it and triggers the usual retrain. Returns removed row count. */
  def purge(spark: SparkSession, root: String,
            victims: Seq[Long]): Long =
    SignatureStore.purge(spark, assignedRoot(root), "id", victims)

  /** Frame-shaped victim purge — [[SignatureStore.purgeIds]] over the
    * assignment generations, for victim sets that are not
    * driver-sized (a whole recalled source). */
  def purgeIds(spark: SparkSession, root: String,
               victims: org.apache.spark.sql.DataFrame): Long =
    SignatureStore.purgeIds(spark, assignedRoot(root), "id", victims)

  /** The ids of every indexed vector — the membership column the
    * cross-store audit ([[Retraction.auditStores]]) joins on. One
    * id-only scan of the assignment generations. */
  def memberIds(spark: SparkSession, root: String)
      : org.apache.spark.sql.DataFrame =
    SignatureStore.signatures(spark, assignedRoot(root))
      .select(org.apache.spark.sql.functions.col("id"))

  /** Purge, then consult the cell-balance audit — the post-takedown
    * health check [[purge]]'s doc promises: a mass removal can strand
    * centroids trained on victim-heavy regions (their cells empty
    * out, the survivors funnel into the few centroids left near real
    * data), which decays recall exactly like ingest drift does.
    * [[IvfIndex.imbalance]] is the same observable in both directions
    * — max cell population over ideal n/k rises whether the
    * DENOMINATOR shrank (purge) or the numerator grew (drift) — so
    * the same threshold gates the same repair: retrain kmeans over
    * the store's own surviving assignment frame (pinned eagerly
    * BEFORE the store is overwritten — the raw vector source is
    * never touched) and rewrite centroids + gen=0. Single-writer
    * maintenance op, like everything else here. Returns (rows
    * removed, whether the retrain fired). */
  def purgeAndMaybeRetrain(spark: SparkSession, root: String,
                           victims: Seq[Long], idCol: String,
                           vecCol: String, k: Int, iters: Int,
                           maxImbalance: Double): (Long, Boolean) = {
    val removed = purge(spark, root, victims)
    val idx = load(spark, root, idCol, vecCol)
    if (IvfIndex.imbalance(idx) <= maxImbalance) (removed, false)
    else {
      val survivors = idx.assigned
        .select(org.apache.spark.sql.functions.col("id").as(idCol),
          org.apache.spark.sql.functions.col("vec").as(vecCol))
        .localCheckpoint(eager = true)
      init(survivors, idCol, vecCol, k, iters, root)
      (removed, true)
    }
  }
}
