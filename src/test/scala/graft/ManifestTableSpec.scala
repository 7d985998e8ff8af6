package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.ManifestTable

/** Manifest-pointer table: every published version is a complete
  * snapshot, compaction never loses a concurrent append, and old
  * snapshots survive until vacuum. */
class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  private def ids(root: String): Set[Long] =
    ManifestTable.read(spark, root).select("id").as[Long].collect().toSet

  private def idsOf(root: String, files: Seq[String]): Seq[Long] =
    spark.read.parquet(files.map(f => s"$root/$f"): _*)
      .select("id").as[Long].collect().toSeq

  private def batch(lo: Long, hi: Long) =
    (lo until hi).toDF("id").withColumn("payload",
      F.concat(F.lit("row"), F.col("id")))

  test("every published version is a complete, consistent snapshot") {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest1").toString
    ManifestTable.init(root)
    ManifestTable.append(spark, root, batch(0, 100))
    ManifestTable.append(spark, root, batch(100, 250))
    ManifestTable.append(spark, root, batch(250, 300))
    assert(ids(root) == (0L until 300L).toSet)
    // replay EVERY version: each must be exactly a prefix of the
    // append history — complete batches, no dupes, no partials
    val prefixes = Seq(Set.empty[Long], (0L until 100L).toSet,
      (0L until 250L).toSet, (0L until 300L).toSet)
    for (v <- 1 to 3) {
      val snap = io.readManifest(root, v)
      assert(idsOf(root, snap).toSet == prefixes(v), s"v$v")
      assert(idsOf(root, snap).size == prefixes(v).size, s"v$v has dupes")
    }
  }

  private object io {
    def readManifest(root: String, v: Int): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(root, "manifest", s"v$v"))
        .asScala.toSeq.filter(_.nonEmpty)
    }
  }

  test("compaction merges a concurrent append instead of losing it") {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest2").toString
    ManifestTable.init(root)
    for (i <- 0 until 6)
      ManifestTable.append(spark, root, batch(i * 50L, i * 50L + 50L))
    val preFiles = ManifestTable.latest(root).get.files.size
    // inject an append BETWEEN the compaction's rewrite and its
    // commit — the exact race an overwrite-in-place compactor loses
    val snap = ManifestTable.compact(spark, root, targetFileBytes = 1L << 20,
      beforeCommit = () =>
        { ManifestTable.append(spark, root, batch(300, 333)); () })
    assert(ids(root) == (0L until 333L).toSet,
      "concurrent append lost by compaction")
    assert(snap.files.size < preFiles,
      s"compaction did not reduce files: ${snap.files.size} vs $preFiles")
    // the concurrent append's files were carried forward verbatim
    assert(ManifestTable.latest(root).get.version == snap.version)
  }

  test("racing compactions: the loser aborts instead of committing the base rows twice") {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest4").toString
    ManifestTable.init(root)
    for (i <- 0 until 4)
      ManifestTable.append(spark, root, batch(i * 25L, i * 25L + 25L))
    // compaction B commits first (injected between A's rewrite and
    // commit); A must detect that its base files are gone and return
    // B's snapshot rather than merging two rewrites of the same rows
    val snap = ManifestTable.compact(spark, root, targetFileBytes = 1L << 20,
      beforeCommit = () =>
        { ManifestTable.compact(spark, root, targetFileBytes = 1L << 20); () })
    val rows = ManifestTable.read(spark, root).select("id").as[Long].collect()
    assert(rows.length == 100, s"row count ${rows.length}: base rows duplicated")
    assert(rows.toSet == (0L until 100L).toSet)
    assert(ManifestTable.latest(root).get.version == snap.version)
  }

  test("a reader pinned to an old snapshot survives compaction until vacuum; vacuum keeps only live files") {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest3").toString
    ManifestTable.init(root)
    ManifestTable.append(spark, root, batch(0, 120))
    ManifestTable.append(spark, root, batch(120, 200))
    val pinned = ManifestTable.latest(root).get // a live reader's view
    ManifestTable.compact(spark, root, targetFileBytes = 1L << 20)
    // data files are immutable and still referenced-on-disk: the
    // pinned snapshot reads completely even though the pointer moved
    assert(idsOf(root, pinned.files).toSet == (0L until 200L).toSet)
    // default orphan grace spares everything this young — unreferenced
    // files could belong to an in-flight writer
    assert(ManifestTable.vacuum(root).isEmpty,
      "orphan grace did not spare fresh unreferenced files")
    val deleted = ManifestTable.vacuum(root, orphanGraceMillis = 0)
    assert(deleted.nonEmpty, "vacuum found nothing to delete")
    // the latest snapshot is untouched...
    assert(ids(root) == (0L until 200L).toSet)
    // ...and exactly the non-live files went away
    val live = ManifestTable.latest(root).get.files.toSet
    assert(deleted.forall(d => !live(d)))
    assert(pinned.files.exists(f =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(root, f))),
      "vacuum left the superseded snapshot fully intact")
  }
}
