package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable intent ledger for multi-store retraction — what makes a
  * takedown ATOMIC-OR-RESUMABLE across [[ManifestTable]],
  * [[SignatureStore]] and [[IvfStore]]: [[Retraction.purge]] commits
  * the three stores sequentially, and a crash between them would
  * otherwise leave victim content readable in the untouched stores
  * with nothing recording that a purge was in flight.
  *
  * Protocol (each store's purge is idempotent, so re-running a step
  * is always safe):
  *  1. BEFORE any store is touched, the full purge intent — victim
  *     ids (inline for driver-sized lists, a pinned parquet frame for
  *     predicate-shaped sets) plus every target store root — is
  *     written to a hidden temp dir and published as
  *     `ledger/<entry>` by one atomic rename: the entry is
  *     complete-or-absent, never partial;
  *  2. as each store confirms, a `done.<store>` marker (carrying the
  *     store's removed-row count, so a resumed report is exact) lands
  *     in the entry;
  *  3. when every target store has its marker, the entry is deleted —
  *     the takedown is complete and leaves no ledger residue.
  * A crash at ANY point leaves either no entry (nothing ran — the
  * caller re-issues), or an entry whose missing markers say exactly
  * which stores still hold victim bytes; [[Retraction.resume]] scans
  * the ledger and finishes every pending entry.
  *
  * Storage goes through the Hadoop FS API like the stores it guards;
  * the single-rename publish needs only directory-rename atomicity
  * (the [[SignatureStore.commitGeneration]] primitive). Single
  * writer per entry by construction — the entry id is unique to the
  * purge call that records it; [[Retraction.resume]] is a
  * maintenance op under the same single-writer contract as the store
  * purges it re-runs.
  */
object TakedownLedger {

  /** One recorded takedown: which stores to purge, how victims are
    * identified (`ids` inline, or the pinned frame at
    * [[victimsPath]] when `ids` is None). */
  final case class Entry(ledgerRoot: String, id: String, idCol: String,
                         corpusRoot: Option[String],
                         signatureRoot: Option[String],
                         ivfRoot: Option[String],
                         vacuumGraceMillis: Long,
                         ids: Option[Seq[Long]])

  private def conf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf)

  /** Canonical form of a store root for ledger matching: qualified
    * URI rebuilt from its components — scheme, authority (null and
    * empty unify: Hadoop renders a local path as `file:///x` but a
    * `file:/x` input keeps no authority), absolute path without a
    * trailing slash — so `corpus`, `./corpus/` and `file:///…/corpus`
    * all name the same store. */
  private def qualifiedRoot(root: String): String = {
    val p = new HPath(root)
    val u = fsOf(p).makeQualified(p).toUri
    val auth = Option(u.getAuthority).filter(_.nonEmpty).getOrElse("")
    val path = Option(u.getPath).getOrElse("")
    val trimmed =
      if (path.length > 1 && path.endsWith("/")) path.dropRight(1) else path
    s"${u.getScheme}://$auth$trimmed"
  }

  private def entryDir(e: Entry): HPath =
    new HPath(e.ledgerRoot, e.id)

  /** Pinned victim frame of a predicate-shaped takedown. */
  def victimsPath(e: Entry): String =
    s"${e.ledgerRoot}/${e.id}/victims.parquet"

  private def writeFile(fs: FileSystem, p: HPath, body: String): Unit = {
    val out = fs.create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readFile(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Record a takedown intent: everything a resume needs, published
    * complete-or-absent by one atomic rename of a fully-written
    * hidden temp dir. For a frame-shaped victim set the frame is
    * written INTO the entry — the rename that publishes the intent
    * publishes the pin with it. */
  def record(spark: SparkSession, ledgerRoot: String, idCol: String,
             corpusRoot: Option[String], signatureRoot: Option[String],
             ivfRoot: Option[String], vacuumGraceMillis: Long,
             victims: Either[Seq[Long], DataFrame]): Entry = {
    val id = s"takedown-${java.util.UUID.randomUUID()}"
    val root = new HPath(ledgerRoot)
    val fs = fsOf(root)
    fs.mkdirs(root)
    val tmp = new HPath(ledgerRoot, s".tmp-$id")
    fs.mkdirs(tmp)
    val e = Entry(ledgerRoot, id, idCol, corpusRoot, signatureRoot,
      ivfRoot, vacuumGraceMillis,
      victims.left.toOption)
    victims match {
      case Left(_) => ()
      case Right(df) =>
        df.write.parquet(s"$ledgerRoot/.tmp-$id/victims.parquet")
    }
    val lines = Seq(s"idCol=$idCol", s"grace=$vacuumGraceMillis") ++
      corpusRoot.map(r => s"corpus=$r") ++
      signatureRoot.map(r => s"signatures=$r") ++
      ivfRoot.map(r => s"ivf=$r") ++
      victims.left.toOption.map(ids => s"ids=${ids.mkString(",")}")
    writeFile(fs, new HPath(tmp, "intent"), lines.mkString("\n"))
    require(fs.rename(tmp, entryDir(e)),
      s"takedown ledger publish failed at ${entryDir(e)}")
    e
  }

  /** The removed-row count a completed store step recorded, or None
    * if the step has not confirmed yet. */
  def doneCount(e: Entry, store: String): Option[Long] = {
    val p = new HPath(entryDir(e), s"done.$store")
    val fs = fsOf(p)
    if (!fs.exists(p)) None
    else Some(readFile(fs, p).trim.toLong)
  }

  /** Confirm a store step, recording its removed-row count. */
  def markDone(e: Entry, store: String, removedRows: Long): Unit = {
    val p = new HPath(entryDir(e), s"done.$store")
    writeFile(fsOf(p), p, removedRows.toString)
  }

  /** Drop a fully-confirmed entry. */
  def clear(e: Entry): Unit = {
    val d = entryDir(e)
    fsOf(d).delete(d, true)
    ()
  }

  /** Age grace before [[pending]] sweeps a hidden `.tmp-*` dir: a
    * LIVE [[record]] on the same ledger may still be populating its
    * temp dir — sweeping it mid-populate would fail that purge's
    * publish rename before any intent is durable (the same
    * stalled-writer window the manifest vacuum's grace closes).
    * 15 minutes dwarfs any realistic record() duration; a crashed
    * record's orphan just waits one grace period to be swept. */
  val TmpSweepGraceMillis: Long = 15L * 60 * 1000

  /** Every recorded-but-unfinished takedown (hidden temp dirs — a
    * crash DURING record — are not entries: their rename never ran,
    * so no store was touched and there is nothing to resume; they are
    * swept here once older than `tmpSweepGraceMillis`). */
  def pending(ledgerRoot: String,
              tmpSweepGraceMillis: Long = TmpSweepGraceMillis): Seq[Entry] = {
    val root = new HPath(ledgerRoot)
    val fs = fsOf(root)
    if (!fs.exists(root)) return Seq.empty
    val cutoff = System.currentTimeMillis() - tmpSweepGraceMillis
    fs.listStatus(root).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith(".")) { // unpublished record attempt
        if (st.getModificationTime < cutoff) fs.delete(st.getPath, true)
        None
      } else if (!st.isDirectory) None
      else {
        val kv = readFile(fs, new HPath(st.getPath, "intent"))
          .linesIterator.filter(_.contains("="))
          .map { l =>
            val i = l.indexOf('=')
            l.substring(0, i) -> l.substring(i + 1)
          }.toMap
        Some(Entry(ledgerRoot, name, kv("idCol"),
          kv.get("corpus"), kv.get("signatures"), kv.get("ivf"),
          kv("grace").toLong,
          kv.get("ids").map(_.split(',').toSeq
            .filter(_.nonEmpty).map(_.toLong))))
      }
    }
  }

  /** ADMISSION GUARD — "recovery runs before admission", enforced
    * instead of documented: throws when any pending takedown targets
    * `storeRoot`, so an ingest wired with a ledger root can never add
    * rows to a store that still holds victim bytes from a crashed
    * purge. Callers pass it to the stores' ingest entry points
    * ([[ManifestTable.append]], [[SignatureStore.ingest]],
    * [[IvfStore.ingest]] `guardLedger`); the fix is
    * [[Retraction.resume]]. */
  def requireClear(ledgerRoot: String, storeRoot: String): Unit = {
    // compare FULLY-QUALIFIED roots: a caller spelling the same store
    // differently (trailing slash, file: URI vs bare path, relative vs
    // absolute) must still be blocked — exact string equality here
    // would silently bypass the guard. Qualifying at compare time also
    // covers entries recorded before this normalization existed.
    val target = qualifiedRoot(storeRoot)
    def hits(r: Option[String]) = r.exists(qualifiedRoot(_) == target)
    val blocking = pending(ledgerRoot).filter(e =>
      hits(e.corpusRoot) || hits(e.signatureRoot) || hits(e.ivfRoot))
    if (blocking.nonEmpty)
      throw new IllegalStateException(
        s"${blocking.size} pending takedown(s) in $ledgerRoot target " +
          s"$storeRoot (e.g. ${blocking.head.id}) — run " +
          "Retraction.resume on the ledger before ingesting")
  }
}
