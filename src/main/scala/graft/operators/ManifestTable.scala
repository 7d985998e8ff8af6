package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

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

  /** One published manifest: the version's data-file list plus
    * metadata lines (`#`-prefixed in the file — currently
    * `#batch:<id>` markers recording which streaming micro-batches
    * are already folded in, the exactly-once ledger [[appendBatch]]
    * rides). Metadata commits ATOMICALLY with the file list because
    * it lives in the same hard-linked manifest file. */
  final case class Snapshot(version: Int, files: Seq[String],
                            meta: Seq[String] = Seq.empty)

  private def parseLines(lines: Seq[String]): (Seq[String], Seq[String]) =
    lines.filter(_.nonEmpty).partition(!_.startsWith("#"))

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
      val (files, meta) = parseLines(lines.asScala.toSeq)
      Some(Snapshot(v, files, meta))
    }
  }

  /** Atomic publish of version `n`: write a temp manifest, hard-link
    * it to `v{n}` (complete-or-absent; fails if `v{n}` exists). */
  private[operators] def tryCommit(root: String, n: Int,
                                   files: Seq[String],
                                   meta: Seq[String] = Seq.empty): Boolean = {
    require(meta.forall(_.startsWith("#")),
      "metadata lines must be #-prefixed")
    val dir = manifestDir(root)
    val tmp = Files.createTempFile(dir, ".tmp-", ".manifest")
    try {
      Files.write(tmp, (meta ++ files).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      try { Files.createLink(dir.resolve(s"v$n"), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  private def intentDir(root: String): Path =
    Paths.get(root, "manifest", "intents")

  /** Write-intent entries: one marker per in-flight `data/<token>/`
    * write. [[vacuum]] spares any file under a token with a live
    * intent REGARDLESS of mtime/grace, so a writer stalled between
    * [[writeData]] and its commit can never have its files vacuumed
    * out from under it and then publish a manifest of dead paths.
    * The intent is cleared once the writer's commit loop resolves
    * (committed OR aborted — aborted files become plain orphans and
    * age out under the grace). */
  private def registerIntent(root: String, token: String): Unit = {
    Files.createDirectories(intentDir(root))
    try Files.createFile(intentDir(root).resolve(token))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  private def clearIntent(root: String, token: String): Unit =
    Files.deleteIfExists(intentDir(root).resolve(token))

  private def liveIntents(root: String): Set[String] = {
    val dir = intentDir(root)
    if (!Files.isDirectory(dir)) return Set.empty
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toSet
    finally s.close()
  }

  /** The `data/<token>/` segment of a root-relative file path. */
  private def tokenOf(relPath: String): Option[String] = {
    val parts = relPath.split('/')
    if (parts.length >= 2 && parts(0) == "data") Some(parts(1)) else None
  }

  /** Write `df` as immutable data files; returns their root-relative
    * paths and the write token (whose intent the CALLER must clear
    * once its commit loop resolves). Not yet visible — a commit must
    * reference them. */
  private def writeData(spark: SparkSession, root: String,
                        df: DataFrame): (Seq[String], String) = {
    val token = java.util.UUID.randomUUID().toString
    registerIntent(root, token)
    val dir = s"data/$token"
    df.write.parquet(s"$root/$dir")
    val d = Paths.get(root, dir)
    val s = Files.list(d)
    try (s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$dir/$n").toSeq.sorted, token)
    finally s.close()
  }

  /** Append `df` as a new snapshot; returns the committed version.
    * `beforeCommit` is a test seam for injecting a concurrent
    * vacuum/writer between the data write and the commit. */
  def append(spark: SparkSession, root: String, df: DataFrame,
             beforeCommit: () => Unit = () => ()): Snapshot = {
    val (newFiles, token) = writeData(spark, root, df)
    try {
      beforeCommit()
      commitLoop(root) { cur => (cur.files ++ newFiles, cur.meta) }
    } finally clearIntent(root, token)
  }

  /** A specific published snapshot (None if that version was never
    * published or has been expired by [[expireManifests]]). */
  def snapshot(root: String, version: Int): Option[Snapshot] = {
    val p = manifestDir(root).resolve(s"v$version")
    if (!Files.isRegularFile(p)) None
    else {
      val (files, meta) = parseLines(
        Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq)
      Some(Snapshot(version, files, meta))
    }
  }

  /** EXACTLY-ONCE streaming append: commit `df` as micro-batch
    * `batchId`, recording a `#batch:<id>` marker IN the manifest —
    * marker and file list publish through the same atomic hard link,
    * so there is no window where the data is visible but the batch
    * unrecorded (or vice versa). A replayed batch (same id — the
    * Structured Streaming contract) finds its marker and returns the
    * current snapshot without writing anything; a replay racing a
    * concurrent commit re-reads and re-checks inside the optimistic
    * loop. The ledger grows one line per batch — compaction carries
    * it forward verbatim; a production deployment would fold markers
    * below the checkpoint's watermark. */
  def appendBatch(spark: SparkSession, root: String, batchId: Long,
                  df: DataFrame): Snapshot = {
    val marker = s"#batch:$batchId"
    latest(root).filter(_.meta.contains(marker)) match {
      case Some(cur) => cur // replayed: nothing to read, write, or commit
      case None =>
        val (newFiles, token) = writeData(spark, root, df)
        try {
          var result: Option[Snapshot] = None
          while (result.isEmpty) {
            val cur = latest(root).getOrElse(Snapshot(-1, Seq.empty))
            if (cur.meta.contains(marker)) {
              // a racing duplicate committed first — return ITS state
              // without committing anything; our data files become
              // vacuumable orphans
              result = Some(cur)
            } else {
              val files = cur.files ++ newFiles
              val meta = cur.meta :+ marker
              if (tryCommit(root, cur.version + 1, files, meta))
                result = Some(Snapshot(cur.version + 1, files, meta))
            }
          }
          result.get
        } finally clearIntent(root, token)
    }
  }

  /** The latest snapshot's rows. */
  def read(spark: SparkSession, root: String): DataFrame =
    readSnapshot(spark, root, latest(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root")))

  /** TIME TRAVEL: the table as of `version`. Readable as long as (a)
    * the manifest file survives ([[expireManifests]] retention) and
    * (b) the version's data files survive ([[vacuum]] retention —
    * vacuum keeps only the LATEST version's files once the grace
    * passes, so pin retention to the travel horizon you need). */
  def readVersion(spark: SparkSession, root: String,
                  version: Int): DataFrame =
    readSnapshot(spark, root, snapshot(root, version).getOrElse(
      throw new IllegalStateException(
        s"no manifest v$version at $root (never published or expired)")))

  private def readSnapshot(spark: SparkSession, root: String,
                           snap: Snapshot): DataFrame = {
    require(snap.files.nonEmpty, s"empty table at $root (v${snap.version})")
    spark.read.parquet(snap.files.map(f => s"$root/$f"): _*)
  }

  /** Drop manifest files older than the newest `keepLast` versions —
    * the manifest-count valve for long-lived tables (one tiny file
    * per commit adds up over millions of commits). Time travel below
    * the horizon is gone afterwards; the latest version is always
    * kept (`keepLast` ≥ 1). Safe against concurrent committers: they
    * only ever create strictly NEWER versions, and [[latest]] takes
    * the max of what remains. Returns expired versions. */
  def expireManifests(root: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val dir = manifestDir(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    val versions = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") => n.stripPrefix("v").toInt }
        .toSeq.sorted
      finally s.close()
    }
    val victims = versions.dropRight(keepLast)
    victims.foreach(v => Files.deleteIfExists(dir.resolve(s"v$v")))
    victims
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
    val (compacted, token) = writeData(spark, root,
      spark.read.parquet(base.files.map(f => s"$root/$f"): _*).repartition(n))
    try {
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
          if (tryCommit(root, cur.version + 1, files, cur.meta))
            result = Some(Snapshot(cur.version + 1, files, cur.meta))
        }
      }
      result.get
    } finally clearIntent(root, token)
  }

  /** Row-level DELETE — copy-on-write rewrite of ONLY the files that
    * contain victim rows, committed through the same optimistic loop.
    * The scale-store counterpart of the reference's own S7 delete
    * (`classes/hive/model.php:831-853`) and the primitive a
    * takedown/retraction pass needs: at 100 TB a purge touches the
    * handful of files holding the victim ids, never the table.
    *
    *  - locating victims reads the base snapshot WITH the predicate
    *    pushed to the parquet scan (only matching row-groups
    *    decode) and collects one file path per AFFECTED file — a
    *    metadata-scale collect, bounded by the file count;
    *  - untouched files are carried into the new snapshot by
    *    reference — their bytes are never read or rewritten;
    *  - commit semantics differ from [[compact]] on conflict: a
    *    compaction abort is safe (the data is unchanged, only its
    *    layout), but a delete MUST apply — if a concurrent rewrite
    *    replaced an affected file, the whole pass RESTARTS against
    *    the new snapshot instead of aborting. Concurrent appends
    *    merge conflict-free exactly as in compact (their files are
    *    outside the affected set) — note an append racing in rows
    *    matching `predicate` lands AFTER this delete's victim scan
    *    and survives it, the standard snapshot-isolation reading of
    *    a concurrent DELETE + INSERT.
    * `beforeCommit` is the usual race-injection test seam. */
  def deleteWhere(spark: SparkSession, root: String, predicate: Column,
                  beforeCommit: () => Unit = () => ()): Snapshot = {
    var result: Option[Snapshot] = None
    while (result.isEmpty) {
      val base = latest(root).getOrElse(
        throw new IllegalStateException(s"no manifest at $root"))
      if (base.files.isEmpty) result = Some(base)
      else {
        val scan = spark.read.parquet(base.files.map(f => s"$root/$f"): _*)
        val affectedAbs = scan.filter(predicate)
          .select(F.input_file_name().as("__file")).distinct()
          .collect().map(_.getString(0))
        val affected = base.files.filter(f =>
          affectedAbs.exists(_.endsWith(s"/$f")))
        if (affected.isEmpty) result = Some(base)
        else {
          // survivors of ONLY the affected files; null predicate
          // results keep the row (DELETE semantics: NULL is not TRUE)
          val survivors = spark.read
            .parquet(affected.map(f => s"$root/$f"): _*)
            .filter(!F.coalesce(predicate, F.lit(false)))
          val (newFiles, token) = writeData(spark, root, survivors)
          try {
            beforeCommit()
            val affectedSet = affected.toSet
            var retryScan = false
            while (result.isEmpty && !retryScan) {
              val cur = latest(root).getOrElse(Snapshot(-1, Seq.empty))
              if (!affectedSet.subsetOf(cur.files.toSet)) {
                // a rewrite replaced our victims' files — the delete
                // must still apply, so re-scan against the new
                // snapshot; our rewritten files become orphans
                retryScan = true
              } else {
                val files = cur.files.filterNot(affectedSet) ++ newFiles
                if (tryCommit(root, cur.version + 1, files, cur.meta))
                  result = Some(Snapshot(cur.version + 1, files, cur.meta))
              }
            }
          } finally clearIntent(root, token)
        }
      }
    }
    result.get
  }

  /** Optimistic commit: recompute the file list against the latest
    * snapshot until the version link wins. */
  private def commitLoop(root: String)
                        (merge: Snapshot => (Seq[String], Seq[String])): Snapshot = {
    var committed: Option[Snapshot] = None
    while (committed.isEmpty) {
      val cur = latest(root).getOrElse(Snapshot(-1, Seq.empty))
      val (files, meta) = merge(cur)
      if (tryCommit(root, cur.version + 1, files, meta))
        committed = Some(Snapshot(cur.version + 1, files, meta))
    }
    committed.get
  }

  /** Delete data files unreferenced by the LATEST manifest. Three
    * retention gates:
    *  - reader retention (caller's): run only after readers pinned to
    *    older versions have drained;
    *  - WRITE INTENTS (structural): a file whose `data/<token>/`
    *    write is still in flight — intent registered at
    *    [[writeData]], cleared when the writer's commit loop
    *    resolves — is spared unconditionally, however old. This
    *    closes the stalled-writer hole mtime grace alone leaves: a
    *    writer paused longer than the grace between writeData and
    *    commit can no longer have its files vacuumed and then
    *    publish a manifest of dead paths;
    *  - `orphanGraceMillis` (caller's): intent-LESS files younger
    *    than this are still spared — belt-and-braces for externally
    *    written data. With the intent guard, 0 is safe for files
    *    written through this object's own writers.
    * Returns deleted paths. */
  def vacuum(root: String,
             orphanGraceMillis: Long = 24L * 3600 * 1000): Seq[String] = {
    val live = latest(root).map(_.files.toSet).getOrElse(Set.empty)
    val intents = liveIntents(root)
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
        .filterNot(v => tokenOf(v).exists(intents))
        .toSeq
      finally all.close()
    victims.foreach(v => Files.deleteIfExists(Paths.get(root, v)))
    victims.sorted
  }
}
