package graft

import org.apache.spark.sql.{functions => F}

/** The GRAFT maintenance DDL ([[graft.plans.GraftSqlParser]]):
  * compact/vacuum/expire/maintain from pure SQL, with the wrapper
  * proven transparent for everything else. */
class GraftSqlParserSpec extends SparkSpec {
  import graft.operators.ManifestTable
  import spark.implicits._

  test("GRAFT COMPACT / VACUUM / EXPIRE / MAINTAIN run the ledger ops and report as rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    val root = s"$dir/t"
    ManifestTable.init(root, Seq("id"))
    for (i <- 0 until 6)
      ManifestTable.append(spark, root,
        (0L until 300L).filter(_ % 6 == i).toDF("id")
          .withColumn("payload", F.concat(F.lit("row"), F.col("id")))
          .coalesce(1))
    val before = ManifestTable.latest(root).get
    assert(before.files.size == 6)
    // COMPACT with clustering: fewer files, identical data
    val compacted = spark.sql(
      s"GRAFT COMPACT '$root' TARGET 4194304 CLUSTER BY id").head()
    assert(compacted.getInt(0) == before.version + 1)
    assert(compacted.getLong(1) < 6L)
    assert(ManifestTable.read(spark, root).count() == 300L)
    // EXPIRE keeps the newest manifests only
    val expired = spark.sql(s"GRAFT EXPIRE '$root' KEEP 2").head().getLong(0)
    assert(expired > 0L)
    // VACUUM RETAIN 0 HOURS sweeps the compacted-away originals
    val swept = spark.sql(s"GRAFT VACUUM '$root' RETAIN 0 HOURS")
      .head().getLong(0)
    assert(swept >= 6L, s"expected the 6 pre-compaction files swept, got $swept")
    assert(ManifestTable.read(spark, root).count() == 300L,
      "vacuum must never touch live data")
    // MAINTAIN on the now-tight table: no compaction, full report row
    val m = spark.sql(s"GRAFT MAINTAIN '$root'").head()
    assert(!m.getBoolean(2), "a tight table must not re-compact")
    assert(ManifestTable.read(spark, root).count() == 300L)
    // registered relations see maintenance through the path refresh
    graft.sources.ManifestSql.register(spark, "ddl_t", root)
    assert(spark.sql("SELECT count(*) FROM ddl_t").as[Long].head() == 300L)
  }

  test("GRAFT maintenance by TABLE name resolves through the catalog for all four statements") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddln").toString
    val root = s"$dir/t"
    ManifestTable.init(root, Seq("id"))
    for (i <- 0 until 4)
      ManifestTable.append(spark, root,
        (0L until 200L).filter(_ % 4 == i).toDF("id")
          .withColumn("payload", F.concat(F.lit("p"), F.col("id")))
          .coalesce(1))
    graft.api.Graft(spark, sf)
      .registerManifest("ddl_named", root, persistent = true)
    try {
      val before = ManifestTable.latest(root).get
      val c = spark.sql(
        "GRAFT COMPACT TABLE ddl_named TARGET 4194304 CLUSTER BY id")
        .head()
      assert(c.getInt(0) == before.version + 1 && c.getLong(1) < 4L)
      assert(spark.sql("GRAFT EXPIRE TABLE ddl_named KEEP 2")
        .head().getLong(0) > 0L)
      assert(spark.sql("GRAFT VACUUM TABLE ddl_named RETAIN 0 HOURS")
        .head().getLong(0) >= 4L)
      val m = spark.sql("GRAFT MAINTAIN TABLE ddl_named").head()
      assert(!m.getBoolean(2), "a tight table must not re-compact")
      assert(spark.sql("SELECT count(*) FROM ddl_named")
        .head().getLong(0) == 200L,
        "maintenance by name must never touch live data")
      // a non-manifest name refuses with the path form suggested
      (0L until 3L).toDF("id").createOrReplaceTempView("ddl_plain")
      val e = intercept[Exception](
        spark.sql("GRAFT COMPACT TABLE ddl_plain"))
      assert(e.getMessage.contains("USING graft-manifest"),
        s"got: ${e.getMessage}")
      // the manifest TVFs accept the registered NAME too (r19):
      // slash = path, otherwise the session catalog resolves it
      assert(spark.sql("SELECT count(*) FROM graft_manifest('ddl_named')")
        .head().getLong(0) == 200L)
      assert(spark.sql("SELECT max(version) FROM graft_history('ddl_named')")
        .head().getInt(0) >= 1)
      val e2 = intercept[Exception](
        spark.sql("SELECT * FROM graft_history('no_such_name')"))
      assert(e2.getMessage.contains("names no"), s"got: ${e2.getMessage}")
    } finally spark.sql("DROP TABLE IF EXISTS ddl_named")
  }

  test("the wrapper is transparent: ANSI SQL, parameterized queries, and malformed GRAFT statements") {
    // plain SQL parses through the delegate untouched
    assert(spark.sql("SELECT 1 + 1 AS v").head().getInt(0) == 2)
    // parameterized entry point keeps its binding (the wrapper must
    // delegate parsePlanWithParameters, not just parsePlan)
    assert(spark.sql("SELECT ? + 1", Array(41)).head().getInt(0) == 42)
    // a GRAFT-prefixed statement that matches no rule fails with the
    // usage line, never a confusing ANSI error
    val e = intercept[Exception](spark.sql("GRAFT FROBNICATE 'x'"))
    assert(e.getMessage.contains("usage"), s"got: ${e.getMessage}")
    // quoted-path escape: '' decodes to a literal quote, and a
    // well-formed statement on a missing table fails in the OP (with
    // the decoded path), never the parser
    val e2 = intercept[Exception](
      spark.sql("GRAFT COMPACT '/no/such''path'"))
    assert(e2.getMessage.contains("no manifest at /no/such'path"),
      s"got: ${e2.getMessage}")
    // GRAFT VACUUM on a missing root is the documented no-op sweep
    assert(spark.sql("GRAFT VACUUM '/no/such''path'").head().getLong(0) == 0L)
  }

  test("GRAFT MOR declares merge-on-read deletes; GRAFT FOLD erases standing deletion vectors") {
    import spark.implicits._
    import graft.operators.ManifestTable
    val dir = java.nio.file.Files.createTempDirectory("graft_pfold").toString
    val root = s"$dir/t"
    ManifestTable.init(root, Seq("id"))
    ManifestTable.append(spark, root, (0L until 100L).toDF("id")
      .withColumn("v", F.col("id") * 2))
    // declare MoR by path, delete through the Scala MoR API, then
    // FOLD: only DV'd files rewrite, the DV refs disappear, rows hold
    spark.sql(s"GRAFT MOR '$root' ON")
    assert(ManifestTable.morDeletes(ManifestTable.latest(root).get))
    ManifestTable.deleteWhereMoR(spark, root, F.col("id") % 4 === 0)
    def dvCount(): Int = {
      val s = ManifestTable.latest(root).get
      s.files.count(f => s.stats.get(f).exists(p =>
        graft.operators.ManifestStats.decodeCached(p).dvRef.isDefined))
    }
    assert(dvCount() > 0, "fixture: expected standing DVs")
    val v = spark.sql(s"GRAFT FOLD '$root'").head().getLong(0)
    assert(v == ManifestTable.latest(root).get.version.toLong)
    assert(dvCount() == 0, "GRAFT FOLD left a standing DV")
    assert(ManifestTable.read(spark, root).count() == 75L)
    // idempotent: a DV-free fold commits nothing
    val v2 = spark.sql(s"GRAFT FOLD '$root'").head().getLong(0)
    assert(v2 == v, "a DV-free GRAFT FOLD must be a no-op")
    spark.sql(s"GRAFT MOR '$root' OFF")
    assert(!ManifestTable.morDeletes(ManifestTable.latest(root).get))
  }
}
