package graft

/** Per-process scratch root for queries that materialize side outputs
  * (ingest round-trips, compaction, layout rewrites, streaming sinks).
  *
  * One `Files.createTempDirectory("graft_")` per JVM, best-effort
  * deleted at exit. Deriving every sink path under it (instead of the
  * former fixed `/tmp/graft_*` names) means two concurrent JVMs on
  * the same fixture — e.g. an overlapping Verify and Bench run at one
  * SF — can never race on each other's `mode("overwrite")` writes or
  * read a half-written sink, and side outputs stop accumulating
  * across rounds.
  */
object Workspace {

  lazy val root: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      scala.util.Try(rm(dir.toFile))
    }
    dir
  }

  /** A named scratch path under the process root. Callers append the
    * SF-dir basename so one process grading multiple scales keeps the
    * outputs apart; within-process re-runs stay idempotent via the
    * writers' overwrite mode. */
  def dir(name: String): String = root.resolve(name).toString
}
