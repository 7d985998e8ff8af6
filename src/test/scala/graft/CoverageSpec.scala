package graft

import graft.operators.{Joins, Read, Similarity, Writes}
import graft.plans.GraftFunctions
import graft.schema.{Catalog, Field, FStr, TableDef}
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Coverage for the remaining SURVEY §2 surface: has_one (J1),
  * relation conditions (P5), keyed dictionary (O5), typed hydration
  * (S9), on_change hooks (P7), and the custom-expression SQL surface. */
class CoverageSpec extends SparkSpec {

  test("has_one returns exactly one child per parent (first by child pk)") {
    val df = Joins.related(spark, sf, "nation", "first_customer")
    val perParent = df.groupBy("n_nationkey").count().collect()
    assert(perParent.forall(_.getLong(1) == 1))
    // the chosen child is the minimum custkey of that nation
    val row = df.filter(F.col("n_nationkey") === 3).collect()
    if (row.nonEmpty) {
      val minCk = Tables.scan(spark, sf, "customer")
        .filter(F.col("c_nationkey") === 3)
        .agg(F.min("c_custkey")).collect()(0).getLong(0)
      assert(row(0).getAs[Long]("c_custkey") == minCk)
    }
  }

  test("relation constant conditions filter the remote side") {
    val df = Joins.related(spark, sf, "customer", "open_orders",
      Map("c_custkey" -> 7L))
    val statuses = df.select("o_orderstatus").distinct().collect().map(_.getString(0))
    assert(statuses.forall(_ == "O"))
  }

  test("selectMap materializes the keyed dictionary (O5)") {
    val m = Read.selectMap(spark, sf, "region", "r_regionkey", "r_name")
    assert(m.size == 5 && m.contains("0"))
  }

  test("selectMap enforces the driver-collect bound (O5 guard)") {
    // oversized result → fail fast with the contract message, never a
    // silent full collect (mirrors ivfTopK's query-frame guard)
    val e = intercept[IllegalArgumentException] {
      Read.selectMap(spark, sf, "orders", "o_orderkey", "o_orderstatus",
        maxDriverRows = 10)
    }
    assert(e.getMessage.contains("maxDriverRows"))
    // at the bound, the dictionary still materializes
    val m = Read.selectMap(spark, sf, "region", "r_regionkey", "r_name",
      maxDriverRows = 5)
    assert(m.size == 5)
  }

  test("typed Dataset hydration (S9): case-class encoder over scan") {
    import spark.implicits._
    val ds = Tables.scan(spark, sf, "region").as[RegionRow]
    val rows = ds.collect()
    assert(rows.length == 5 && rows.forall(_.r_name.nonEmpty))
  }

  test("on_change hook transforms values in the write path (P7)") {
    import spark.implicits._
    val t = TableDef("t", Seq(
      Field("id", graft.schema.FAuto, primary = true),
      Field("name", FStr, onChange = Some(c => F.upper(F.trim(c))))))
    val rows = Seq((1L, "  alice "), (2L, "bob")).toDF("id", "name")
    val out = Writes.applyOnChange(t, rows).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "ALICE" && out(2L) == "BOB")
  }

  test("aggregator top-k equals window top-k") {
    val emb = Tables.scan(spark, sf, "embeddings")
    val q = emb.filter(F.col("vec_id") < 3)
    val win = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val agg = Similarity.bruteForceTopKAgg(emb, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(win == agg)
  }

  test("dot_product is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(got == 11.0)
  }

  test("physical->logical column mapping (meta.php:150-177)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_phys").toString
    Seq((1L, "a"), (2L, "b")).toDF("user_id_raw", "user_name_col")
      .write.mode("overwrite").parquet(s"$tmp/usr.parquet")
    Catalog.register(TableDef("usr", Seq(
      Field("id", graft.schema.FAuto, primary = true, column = Some("user_id_raw")),
      Field("name", FStr, column = Some("user_name_col")))))
    val df = Tables.scan(spark, tmp, "usr")
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.filter(F.col("id") === 2L).collect()(0).getString(1) == "b")
  }

  test("per-context validation rules (meta.php:43-61)") {
    import spark.implicits._
    val t = TableDef("ctx", Seq(
      Field("id", graft.schema.FAuto, primary = true),
      Field("pw", FStr, rules = Seq(graft.schema.NotEmpty),
        createRules = Seq(graft.schema.MinLength(5)))))
    val rows = Seq((1L, "abc")).toDF("id", "pw")
    val base = graft.operators.Validate.report(rows, t).collect()(0)
    val create = graft.operators.Validate.report(rows, t, Some("create")).collect()(0)
    assert(base.getAs[Int]("n_errors") == 0)    // shared rules only
    assert(create.getAs[Int]("n_errors") == 1)  // min_length kicks in on create
  }

  test("QBE null value becomes IS NULL") {
    import spark.implicits._
    val t = TableDef("nl", Seq(
      Field("id", graft.schema.FAuto, primary = true),
      Field("name", FStr)))
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "name")
    val hit = df.filter(graft.operators.Read.qbe(t, Map("name" -> null))).collect()
    assert(hit.length == 1 && hit(0).getLong(0) == 2L)
  }

  test("relative date math (F5: strtotime('-1 year') equivalents)") {
    import spark.implicits._
    val anchor = Seq("2001-03-10 12:00:00").toDF("s")
      .select(F.col("s").cast("timestamp").as("ts"))
    def shifted(off: String): String =
      anchor.select(graft.functions.Dates.relative(off, F.col("ts")).cast("string"))
        .collect()(0).getString(0)
    // time-of-day survives every unit, as strtotime's does — interval
    // arithmetic, not add_months/date_add (those would return DATE)
    assert(shifted("-1 year") == "2000-03-10 12:00:00")
    assert(shifted("2 months") == "2001-05-10 12:00:00")
    assert(shifted("-1 week") == "2001-03-03 12:00:00")
    assert(shifted("36 hours") == "2001-03-12 00:00:00")
    intercept[IllegalArgumentException] {
      graft.functions.Dates.relative("next fortnight", F.col("ts"))
    }
  }

  test("rolling_hash golden + SQL registration") {
    GraftFunctions.register(spark)
    // polynomial: fold 'hello' codes with acc*1000003 + c mod 2^31-1
    val expected = "hello".foldLeft(0L)((a, c) =>
      if (a == 0 && c == 'h') c.toLong else (a * 1000003L + c.toLong) % 2147483647L)
    val got = spark.sql("SELECT rolling_hash('hello') AS h").collect()(0).getLong(0)
    assert(got == expected && got == 1806177846L) // cross-checked vs DuckDB list_reduce
    assert(spark.sql("SELECT rolling_hash('') AS h").collect()(0).getLong(0) == 0L)
  }

  test("streaming dedup emits one row per fingerprint") {
    val out = graft.streaming.StreamingOps.streamingDedup(spark, sf, "cov_dedup")
    val docs = Tables.scan(spark, sf, "documents")
    assert(out.count() == docs.count()) // all fixture texts are unique
    assert(out.columns.toSeq == Seq("doc_id", "fp"))
  }

  test("foreachBatch parquet sink lands the dedup stream exactly once") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val sunk = graft.streaming.StreamingOps
      .streamingDedupToParquet(spark, sf, out)
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.operators.Dedup
      .exactDedup(Tables.scan(spark, sf, "documents"), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(sunk == batch && batch.nonEmpty)
    // idempotency contract: a batch directory overwritten with the
    // same content stays identical — re-read matches the first read
    val again = spark.read.parquet(s"$out/batch_id=*")
      .select("doc_id").as[Long].collect().toSet
    assert(again == sunk)
  }

  test("bounded streaming dedup does not drop the epoch-adjacent first row") {
    // regression guard: doc_id=0's synthetic ingest time must not
    // coincide with Spark's initial (epoch) watermark and be dropped
    // as late — the +1s offset keeps every row inside the horizon
    val out = graft.streaming.StreamingOps.streamingDedupBounded(
      spark, sf, queryName = "cov_dedup_bounded")
    val docs = Tables.scan(spark, sf, "documents")
    assert(out.count() == docs.count())
    assert(out.filter(F.col("doc_id") === 0L).count() == 1)
  }

  test("user-totals state evicts idle keys via processing-time timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, Double)]
    val out = graft.streaming.StreamingOps.userTotalsTransform(
      src.toDS(), idleTimeout = "1 second")
    // default trigger: with ProcessingTimeTimeout the engine keeps
    // running no-data batches, which is exactly what fires the
    // timeout without a second addData
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("cov_evict").start()
    def rowsFor(n: Long): Seq[(Long, Long, Double)] =
      spark.table("cov_evict").as[(Long, Long, Double)].collect().toSeq
        .filter(_._1 == n)
    def awaitRow(pred: Seq[(Long, Long, Double)] => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!pred(rowsFor(7L)) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(pred(rowsFor(7L)), s"timed out; rows=${rowsFor(7L)}")
    }
    try {
      src.addData((7L, 1.0))
      awaitRow(_.contains((7L, 1L, 1.0)))
      Thread.sleep(1500) // let the 1s idle timeout expire → eviction batch
      src.addData((7L, 2.0))
      // count restarts at 1: the state was removed, not continued
      // (an un-evicted state would emit (7, 2, 3.0))
      awaitRow(_.contains((7L, 1L, 2.0)))
      assert(!rowsFor(7L).contains((7L, 2L, 3.0)))
    } finally q.stop()
  }

  test("stamp auto-now sets create/update timestamp fields") {
    import spark.implicits._
    val now = F.lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    val t = Catalog("orders")
    val rows = Tables.scan(spark, sf, "orders").limit(2)
    val stamped = Writes.stampAutoNow(t, rows, now, creating = true)
    val vals = stamped.select("o_orderdate").as[java.sql.Timestamp].collect()
    assert(vals.forall(_.toString.startsWith("2020-01-01")))
  }
}

case class RegionRow(r_regionkey: Int, r_name: String)
