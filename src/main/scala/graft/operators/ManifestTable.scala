package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer parquet table — compaction (and any rewrite)
  * safe under concurrent appends and live readers, without a table
  * format dependency.
  *
  * The problem with [[Layout.compact]]'s overwrite-in-place: a reader
  * listing the directory mid-rewrite sees half-deleted input or
  * half-written output. Here readers NEVER list data directories;
  * they read a MANIFEST (one file-path per line) and only the
  * manifest pointer moves:
  *
  *  - data files are immutable once written, under `data/<uuid>/` —
  *    invisible until some manifest references them;
  *  - a commit publishes `manifest/v{N}` via an atomic hard link of a
  *    fully-written temp file (`link(2)` fails with EEXIST on
  *    conflict), so every published version is complete-or-absent —
  *    a reader picking the highest `v{N}` always sees a full,
  *    consistent snapshot;
  *  - writers OPTIMISTICALLY retry: re-read the latest version, merge
  *    their change, attempt `v{N+1}`. Appends merge trivially (add
  *    files). [[compact]] merges by carrying forward any file that
  *    appeared AFTER its base snapshot — an append landing mid-
  *    compaction is never lost (append-only tables make the merge
  *    conflict-free);
  *  - [[vacuum]] deletes data files unreferenced by the LATEST
  *    manifest — run it after readers of older versions have drained
  *    (retention is the caller's policy, as in any snapshot store).
  *
  * The hard-link commit primitive is the local-filesystem instance of
  * the pattern; an object-store deployment swaps in a conditional PUT
  * (If-None-Match) and nothing else changes.
  */
object ManifestTable {

  final case class Snapshot(version: Int, files: Seq[String])

  private def manifestDir(root: String): Path = Paths.get(root, "manifest")

  def init(root: String): Unit = {
    Files.createDirectories(manifestDir(root))
    Files.createDirectories(Paths.get(root, "data"))
    if (latest(root).isEmpty) {
      val ok = tryCommit(root, 0, Seq.empty)
      require(ok || latest(root).nonEmpty, s"init race lost at $root")
    }
  }

  /** Highest published snapshot (None before [[init]]). */
  def latest(root: String): Option[Snapshot] = {
    val dir = manifestDir(root)
    if (!Files.isDirectory(dir)) return None
    val versions = {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") => n.stripPrefix("v").toInt }
        .toSeq
      finally s.close()
    }
    if (versions.isEmpty) None
    else {
      val v = versions.max
      val lines = Files.readAllLines(dir.resolve(s"v$v"),
        StandardCharsets.UTF_8)
      Some(Snapshot(v, lines.asScala.toSeq.filter(_.nonEmpty)))
    }
  }

  /** Atomic publish of version `n`: write a temp manifest, hard-link
    * it to `v{n}` (complete-or-absent; fails if `v{n}` exists). */
  private[operators] def tryCommit(root: String, n: Int,
                                   files: Seq[String]): Boolean = {
    val dir = manifestDir(root)
    val tmp = Files.createTempFile(dir, ".tmp-", ".manifest")
    try {
      Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
      try { Files.createLink(dir.resolve(s"v$n"), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  /** Write `df` as immutable data files; returns their root-relative
    * paths. Not yet visible — a commit must reference them. */
  private def writeData(spark: SparkSession, root: String,
                        df: DataFrame): Seq[String] = {
    val token = java.util.UUID.randomUUID().toString
    val dir = s"data/$token"
    df.write.parquet(s"$root/$dir")
    val d = Paths.get(root, dir)
    val s = Files.list(d)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$dir/$n").toSeq.sorted
    finally s.close()
  }

  /** Append `df` as a new snapshot; returns the committed version. */
  def append(spark: SparkSession, root: String, df: DataFrame): Snapshot = {
    val newFiles = writeData(spark, root, df)
    commitLoop(root) { cur => cur.files ++ newFiles }
  }

  /** The latest snapshot's rows. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val snap = latest(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    require(snap.files.nonEmpty, s"empty table at $root (v${snap.version})")
    spark.read.parquet(snap.files.map(f => s"$root/$f"): _*)
  }

  /** Rewrite the CURRENT snapshot into ~`targetFileBytes` files and
    * commit the compacted state, carrying forward any files appended
    * after the base snapshot was taken. If a CONFLICTING REWRITE wins
    * the race (the latest manifest no longer contains the full base
    * set — some other compaction already replaced those files), this
    * one ABORTS and returns the winner's snapshot: merging two
    * rewrites of the same base would commit every base row twice.
    * The abandoned compacted files become orphans for [[vacuum]].
    * `beforeCommit` is a test seam for injecting a concurrent
    * append/compaction between the rewrite and the commit race. */
  def compact(spark: SparkSession, root: String, targetFileBytes: Long,
              beforeCommit: () => Unit = () => ()): Snapshot = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val base = latest(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    if (base.files.isEmpty) return base
    val bytes = base.files
      .map(f => Files.size(Paths.get(root, f))).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val compacted = writeData(spark, root,
      spark.read.parquet(base.files.map(f => s"$root/$f"): _*).repartition(n))
    beforeCommit()
    val baseSet = base.files.toSet
    var result: Option[Snapshot] = None
    while (result.isEmpty) {
      val cur = latest(root).getOrElse(Snapshot(-1, Seq.empty))
      if (!baseSet.subsetOf(cur.files.toSet)) {
        // a conflicting rewrite committed first — our rewrite is
        // stale; the files it wrote are unreferenced and will be
        // vacuumed once the orphan grace passes
        result = Some(cur)
      } else {
        // conflict-free merge: files that appeared since the base
        // snapshot are appends — keep them alongside the compacted set
        val files = compacted ++ cur.files.filterNot(baseSet)
        if (tryCommit(root, cur.version + 1, files))
          result = Some(Snapshot(cur.version + 1, files))
      }
    }
    result.get
  }

  /** Optimistic commit: recompute the file list against the latest
    * snapshot until the version link wins. */
  private def commitLoop(root: String)
                        (merge: Snapshot => Seq[String]): Snapshot = {
    var committed: Option[Snapshot] = None
    while (committed.isEmpty) {
      val cur = latest(root).getOrElse(Snapshot(-1, Seq.empty))
      val files = merge(cur)
      if (tryCommit(root, cur.version + 1, files))
        committed = Some(Snapshot(cur.version + 1, files))
    }
    committed.get
  }

  /** Delete data files unreferenced by the LATEST manifest. Two
    * retention gates the caller owns:
    *  - reader retention: run only after readers pinned to older
    *    versions have drained;
    *  - `orphanGraceMillis`: files YOUNGER than this are spared even
    *    when unreferenced — an in-flight append/compaction has
    *    already written its data files but not yet committed its
    *    manifest, and deleting them would let the writer publish a
    *    manifest of dead paths (the orphan-retention rule every
    *    snapshot store carries). Pass 0 only when no writer can be
    *    in flight.
    * Returns deleted paths. */
  def vacuum(root: String,
             orphanGraceMillis: Long = 24L * 3600 * 1000): Seq[String] = {
    val live = latest(root).map(_.files.toSet).getOrElse(Set.empty)
    val dataDir = Paths.get(root, "data")
    if (!Files.isDirectory(dataDir)) return Seq.empty
    val cutoff = System.currentTimeMillis() - orphanGraceMillis
    val all = Files.walk(dataDir)
    val victims =
      try all.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          Files.getLastModifiedTime(p).toMillis < cutoff)
        .map(p => Paths.get(root).relativize(p).toString)
        .filterNot(live)
        .toSeq
      finally all.close()
    victims.foreach(v => Files.deleteIfExists(Paths.get(root, v)))
    victims.sorted
  }
}
