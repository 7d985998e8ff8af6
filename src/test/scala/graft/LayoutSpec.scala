package graft

import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Physical-layout guarantees: the properties that make the written
  * files cheap to read back at scale. */
class LayoutSpec extends SparkSpec {

  private def scratch(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_layoutspec_$name"

  test("range-clustered write yields disjoint per-file key ranges") {
    val out = scratch("orders_by_key")
    val orders = Tables.scan(spark, sf, "orders")
    Layout.writeRangeClustered(orders, "o_orderkey", 8, out)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 2, s"expected multiple files, got ${files.length}")

    // every file covers a key range disjoint from every other file's —
    // the property parquet min/max footer stats turn into file skipping
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(F.min("o_orderkey"), F.max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: max $hi >= next min $lo2")
      case _ =>
    }

    // clustering is a re-layout, not a transformation
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("date-partitioned write round-trips and the pruned read restricts rows") {
    val out = scratch("events_by_date")
    val events = Tables.scan(spark, sf, "events")
    Layout.writeDatePartitioned(events, "ts", out)

    val all = spark.read.parquet(out)
    assert(all.count() == events.count())
    val week = Layout.readDateRange(spark, out, "2024-01-08", "2024-01-14")
    val expected = events
      .filter(F.to_date(F.col("ts")).between("2024-01-08", "2024-01-14"))
      .count()
    assert(week.count() == expected)
    assert(week.count() > 0 && week.count() < all.count())
  }

  test("date-partitioned layout gets dynamic partition pruning from a dim join") {
    // the runtime half of the pruning story: when the date restriction
    // arrives via a JOIN instead of a literal predicate, Spark's DPP
    // turns the dim's broadcast into a partition filter subquery — the
    // fact side still never lists the excluded directories
    val out = scratch("events_dpp")
    Layout.writeDatePartitioned(Tables.scan(spark, sf, "events"), "ts", out)
    val facts = spark.read.parquet(out)
    val dim = spark.range(31)
      .select(F.date_add(F.lit("2024-01-01").cast("date"),
          F.col("id").cast("int")).as("event_date"),
        (F.col("id") % 7 === 0).as("keep"))
    val joined = facts.join(dim.filter(F.col("keep")), "event_date")
      .groupBy("event_type").agg(F.count(F.lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DPP subquery in the fact scan:\n${plan.take(800)}")
  }

  test("z-ordered write bounds per-file spans of BOTH dimensions") {
    // sf0.001 fixture: user_id 0..14, day_idx 0..29
    val events = Tables.scan(spark, sf, "events")
      .withColumn("day_idx", F.datediff(F.to_date(F.col("ts")),
        F.lit("2024-01-01").cast("date")))
    val zOut = scratch("events_zorder")
    val kOut = scratch("events_userkey")
    Layout.writeZOrdered(events, "user_id", "day_idx", 8, zOut, bits = 5)
    Layout.writeRangeClustered(events, "user_id", 8, kOut)

    def meanSpan(dir: String, col: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length >= 2, s"expected multiple files in $dir")
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(F.min(F.col(col).cast("long")), F.max(F.col(col).cast("long")))
          .head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }.sum / files.length
    }

    val (fullUser, fullDay) = {
      val r = events.agg(
        F.max("user_id") - F.min("user_id"),
        F.max(F.col("day_idx").cast("long")) - F.min(F.col("day_idx").cast("long"))).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }

    // the single-key layout nails user_id spans but leaves each file
    // covering (nearly) the full day range; the z-order layout trades
    // a bounded rectangle in BOTH dimensions
    val zUser = meanSpan(zOut, "user_id")
    val zDay = meanSpan(zOut, "day_idx")
    val kDay = meanSpan(kOut, "day_idx")
    assert(zUser <= 0.8 * fullUser,
      s"z-layout mean user_id span $zUser not a fraction of full range $fullUser")
    assert(zDay <= 0.8 * fullDay,
      s"z-layout mean day_idx span $zDay not a fraction of full range $fullDay")
    assert(zDay < kDay,
      s"z-layout mean day_idx span $zDay not below single-key layout's $kDay")

    // clustering is a re-layout, not a transformation
    assert(spark.read.parquet(zOut).count() == events.count())
  }

  test("compaction rewrites a many-small-files layout to the sized file count") {
    val fragmented = scratch("events_fragmented")
    val compacted = scratch("events_compacted")
    val events = Tables.scan(spark, sf, "events")
    // simulate micro-batch debris: 32 files for a tiny table
    events.repartition(32).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented).length == 32)

    val target = 256L * 1024
    val n = Layout.compact(spark, fragmented, compacted, target)
    val outFiles = parquetFiles(compacted)
    // sized from real bytes: file count matches the returned plan and
    // is far below the fragment count; nothing lost in the rewrite
    assert(outFiles.length == n, s"wrote ${outFiles.length} files, planned $n")
    assert(n < 32 / 2, s"compaction barely helped: $n files")
    assert(spark.read.parquet(compacted).count() == events.count())
  }

  test("bloom index: lookup reads a strict file subset, equals the full-scan filter, misses read nothing") {
    val out = scratch("events_bloom")
    val ev = Tables.scan(spark, sf, "events")
    // clustered on user_id → every file's event_id min/max spans the
    // whole id range; only the bloom can skip files for an event_id
    // point lookup
    Layout.writeRangeClustered(ev, "user_id", 8, s"$out/data")
    Layout.writeBloomIndex(spark, s"$out/data", "event_id", s"$out/idx",
      expectedPerFile = 10000L, fpp = 0.01)
    // present key: exactly the full-scan rows (no false negatives);
    // every event_id key in a sample must round-trip
    for (key <- Seq(0L, 123L, 777L)) {
      val got = Layout.readBloomIndexed(spark, s"$out/data", s"$out/idx",
          "event_id", key)
        .select("user_id").collect().map(_.getLong(0)).sorted
      val want = ev.filter(F.col("event_id") === key)
        .select("user_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want), s"bloom lookup broke key $key")
    }
    // the lookup's scan lists only the files whose bloom admits the
    // key: 1 true file + fpp slack, far below the full 8
    val nFiles = new java.io.File(s"$out/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 8, s"layout produced only $nFiles files")
    val lookedUp = Layout.readBloomIndexed(spark, s"$out/data", s"$out/idx",
      "event_id", 123L)
    val listed = lookedUp.queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length }.sum
    assert(listed <= 2,
      s"bloom index barely skipped: $listed of $nFiles files listed")
    // absent key: zero files admit it → empty frame, data schema kept
    val miss = Layout.readBloomIndexed(spark, s"$out/data", s"$out/idx",
      "event_id", -424242L)
    assert(miss.isEmpty && miss.columns.contains("event_type"))
  }

  test("vacuum deletes only superseded generations and keeps the replay floor") {
    val root = scratch("vacuum")
    val dir = new java.io.File(root)
    dir.mkdirs()
    for (i <- -1 to 4) {
      val d = new java.io.File(s"$root/state_$i"); d.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(d, "part").toPath, Array[Byte](1))
    }
    new java.io.File(s"$root/unrelated").mkdirs()
    val deleted = Layout.vacuumGenerations(root, "state_", keepLatest = 2)
    assert(deleted == Seq(-1L, 0L, 1L, 2L), deleted)
    val left = dir.listFiles().map(_.getName).toSet
    assert(left == Set("state_3", "state_4", "unrelated"), left)
    // the replay floor is enforced, not advisory
    intercept[IllegalArgumentException] {
      Layout.vacuumGenerations(root, "state_", keepLatest = 1)
    }
  }

  test("writeDatePartitioned rejects an input that already has event_date") {
    val events = Tables.scan(spark, sf, "events")
      .withColumn("event_date", F.lit("x"))
    intercept[IllegalArgumentException] {
      Layout.writeDatePartitioned(events, "ts", scratch("reject"))
    }
  }
}
