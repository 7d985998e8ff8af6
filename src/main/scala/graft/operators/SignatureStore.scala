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
}
