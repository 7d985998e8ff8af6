package graft

import graft.operators.{Joins, Validate, Writes}
import graft.schema.Catalog
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

class JoinsWritesSpec extends SparkSpec {

  test("belongs_to join carries both sides' columns") {
    val df = Joins.related(spark, sf, "orders", "customer")
    assert(df.columns.contains("o_orderkey") && df.columns.contains("c_name"))
    assert(df.count() == Tables.scan(spark, sf, "orders").count()) // FK always resolves
  }

  test("has_many returns only the parent's children") {
    val df = Joins.related(spark, sf, "customer", "orders", Map("c_custkey" -> 7L))
    val custs = df.select("o_custkey").distinct().collect()
    assert(custs.length == 1 && custs(0).getLong(0) == 7L)
  }

  test("many_to_many multiplicity equals pivot row count") {
    val viaPivot = Tables.scan(spark, sf, "lineitem")
      .filter(F.col("l_partkey") === 1L).count()
    val joined = Joins.related(spark, sf, "part", "orders", Map("p_partkey" -> 1L)).count()
    assert(joined == viaPivot)
  }

  test("undeclared relation throws") {
    intercept[IllegalArgumentException] {
      Joins.related(spark, sf, "orders", "nope")
    }
  }

  test("insert assigns contiguous ids above max") {
    val base = Tables.scan(spark, sf, "orders")
    val batch = base.filter(F.col("o_orderkey") <= 2L)
    val k = batch.count()
    val out = Writes.insert(base, batch, "o_orderkey", Seq(F.col("o_orderkey")))
    val maxBefore = base.agg(F.max("o_orderkey")).collect()(0).getLong(0)
    val newIds = out.filter(F.col("o_orderkey") > maxBefore)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(newIds.toSeq == (1L to k).map(maxBefore + _))
    assert(out.count() == base.count() + k)
  }

  test("update merges only changed columns and elides no-op") {
    val base = Tables.scan(spark, sf, "orders")
    // no-op elision: delta with only pk returns base reference
    val noop = Writes.update(base, base.select("o_orderkey"), Seq("o_orderkey"))
    assert(noop eq base)
    val delta = base.filter(F.col("o_orderkey") === 1L)
      .select(F.col("o_orderkey"), F.lit("X-TEST").as("o_orderpriority"))
    val out = Writes.update(base, delta, Seq("o_orderkey"))
    val changed = out.filter(F.col("o_orderkey") === 1L).collect()(0)
    assert(changed.getAs[String]("o_orderpriority") == "X-TEST")
    // untouched row keeps its value and count is stable
    assert(out.count() == base.count())
    assert(out.filter(F.col("o_orderpriority") === "X-TEST").count() == 1)
  }

  test("delete removes exactly the victims") {
    val base = Tables.scan(spark, sf, "orders")
    val victims = base.filter(F.col("o_custkey") === 7L)
    val out = Writes.delete(base, victims, Seq("o_orderkey"))
    assert(out.count() == base.count() - victims.count())
    assert(out.filter(F.col("o_custkey") === 7L).count() == 0)
  }

  test("upsert = replace existing + append new") {
    val base = Tables.scan(spark, sf, "orders")
    val updates = base.filter(F.col("o_orderkey") <= 3L)
      .withColumn("o_orderpriority", F.lit("UP"))
    val nUp = updates.count()
    val inserts = base.filter(F.col("o_orderkey") === 1L)
      .withColumn("o_orderkey", F.lit(99999999L))
    val out = Writes.upsert(base, updates.unionByName(inserts), Seq("o_orderkey"))
    assert(out.count() == base.count() + 1)
    assert(out.filter(F.col("o_orderpriority") === "UP").count() == nUp)
  }

  test("cdc apply: last-writer-wins per key, untouched keys pass through") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      // key 2: update then delete — net delete
      (2L, "b2", "U", 1L), (2L, null.asInstanceOf[String], "D", 2L),
      // key 3: delete then update — net update (version order, not
      // feed order, decides)
      (3L, null.asInstanceOf[String], "D", 1L), (3L, "c2", "U", 2L),
      // key 4: fresh insert
      (4L, "d", "I", 1L)).toDF("id", "v", "op", "ver")
    val got = Writes.cdcApply(base, changes, Seq("id"), "op", "ver")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 3L -> "c2", 4L -> "d"), got)
  }

  test("validation report flags synthetic bad rows") {
    import spark.implicits._
    val bad = Seq(
      (1L, "ok name here", 3, 100.0, "BUILDING"),   // clean
      (2L, "abc", 3, 100.0, "BUILDING"),            // too short
      (3L, null.asInstanceOf[String], 3, 99999.0, "NOPE") // empty + range + enum
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val rep = Validate.report(bad, Catalog("customer")).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Int]("n_errors")).toMap
    assert(rep(1L) == 0 && rep(2L) == 1 && rep(3L) == 3)
  }

  test("format_number golden (FFloat verbose)") {
    import spark.implicits._
    val df = Seq(1234567.891, 0.5, -1234.5).toDF("x")
    val got = df.select(graft.schema.FFloat(2).verbose(F.col("x"))).collect().map(_.getString(0))
    assert(got.sameElements(Array("1,234,567.89", "0.50", "-1,234.50")))
  }

  test("timestamp lenient parse golden") {
    import spark.implicits._
    val df = Seq("2001-03-10", "03/10/2001", "2001-03-10 12:34:56", "984182096", "garbage")
      .toDF("s")
    val got = df.select(graft.schema.FTimestamp.lenientParse(F.col("s")).cast("string"))
      .collect().map(_.getString(0))
    assert(got(0) == "2001-03-10 00:00:00")
    assert(got(1) == "2001-03-10 00:00:00")
    assert(got(2) == "2001-03-10 12:34:56")
    assert(got(3) == "2001-03-09 23:54:56") // epoch 984182096 UTC
    assert(got(4) == null)
  }
}
