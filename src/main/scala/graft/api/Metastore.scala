package graft.api

import org.apache.spark.sql.SparkSession

/** Embedded Hive-metastore wiring for the persistent-catalog mode.
  *
  * `Graft.enableSql(persistent = true)` registers external tables and
  * model views through whatever catalog the session was built with.
  * This helper switches that catalog to a REAL Hive metastore
  * (`enableHiveSupport()` + an embedded Derby database), so the
  * catalog objects live in HMS exactly as they would on a production
  * warehouse — table locations, view SQL text, and the bucketing
  * metadata written by `Tables.writeBucketed` all round-trip through
  * the metastore instead of the in-memory session catalog.
  *
  * Flag contract:
  *  - `SPARK_GRAFT_HMS=0` (or `false`) opts out — sessions fall back
  *    to the in-memory catalog (the pre-round-8 behavior).
  *  - `SPARK_GRAFT_HMS_DIR=<dir>` pins the metastore root so catalog
  *    entries SURVIVE the JVM — the shared-warehouse shape. Default is
  *    a fresh temp root per JVM: embedded Derby is single-process, so
  *    two concurrent JVMs sharing one default root would deadlock on
  *    the db lock, and correctness runs must never depend on catalog
  *    state a previous process left behind.
  *
  * Must be applied BEFORE the first `getOrCreate()` in the JVM:
  * `spark.sql.catalogImplementation` is a static conf, so a session
  * built without it can never be upgraded to HMS.
  */
object Metastore {

  /** Opt-out accepts the common falsy spellings case-insensitively —
    * "FALSE" or "off" silently enabling the metastore would be the
    * opposite of user intent. */
  def enabled: Boolean =
    sys.env.get("SPARK_GRAFT_HMS").forall { v =>
      !Set("0", "false", "no", "off").contains(v.trim.toLowerCase)
    }

  /** Metastore root (Derby db + warehouse + derby.log live under it).
    * A default (un-pinned) root is temp-per-JVM and best-effort
    * deleted at exit — repeated Bench/Verify/test runs must not
    * accumulate one Derby tree per process in /tmp. A pinned root is
    * the caller's to manage (that is the point of pinning it). */
  lazy val root: String = sys.env.get("SPARK_GRAFT_HMS_DIR").getOrElse {
    val dir = java.nio.file.Files.createTempDirectory("graft-hms")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      scala.util.Try(rm(dir.toFile))
    }
    dir.toString
  }

  /** Apply the HMS catalog to a session builder (no-op when opted
    * out). Hive 2.3's embedded-mode defaults need schema auto-create
    * on and version verification off — there is no pre-provisioned
    * Derby schema on a fresh root. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    if (!enabled) b
    else {
      // Derby writes its log relative to CWD unless told otherwise —
      // keep the repo clean
      System.setProperty("derby.stream.error.file", s"$root/derby.log")
      b.enableHiveSupport()
        .config("spark.hadoop.javax.jdo.option.ConnectionURL",
          s"jdbc:derby:;databaseName=$root/metastore_db;create=true")
        .config("spark.hadoop.hive.metastore.schema.verification", "false")
        .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
        .config("spark.sql.warehouse.dir", s"$root/warehouse")
    }
}
