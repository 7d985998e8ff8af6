package graft

import graft.operators.Read
import graft.schema.Catalog
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

class ReadSpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("scan projects exactly the declared fields") {
    val df = Tables.scan(spark, sf, "customer")
    assert(df.columns.toSeq ==
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
  }

  test("qbe point lookup finds one row by unique key") {
    val df = Read.read(spark, sf, "customer",
      example = Map("c_custkey" -> 42L), limit = Some(1), sorted = false)
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("c_custkey") == 42L)
  }

  test("undeclared field in QBE throws (model.php:219-225 semantics)") {
    intercept[IllegalArgumentException] {
      Read.qbe(Catalog("customer"), Map("no_such_col" -> 1))
    }
  }

  test("declared sort applies o_orderdate desc") {
    val top = Read.read(spark, sf, "orders", limit = Some(5)).collect()
    val dates = top.map(_.getAs[java.time.LocalDateTime]("o_orderdate")
      .toEpochSecond(java.time.ZoneOffset.UTC))
    assert(dates.sameElements(dates.sorted(Ordering[Long].reverse)))
  }

  test("select_list distinct pairs") {
    val n = Read.selectList(spark, sf, "nation", "n_nationkey", "n_name").count()
    assert(n == 25)
  }

  test("total equals manual count") {
    val t = Read.total(spark, sf, "lineitem",
      extra = Some(F.col("l_quantity") > 25.0)).collect()(0).getLong(0)
    val manual = Tables.scan(spark, sf, "lineitem")
      .filter(F.col("l_quantity") > 25.0).count()
    assert(t == manual)
  }

  test("isUnique probe") {
    assert(!Read.isUnique(spark, sf, "customer", "c_custkey", 42L))
    assert(Read.isUnique(spark, sf, "customer", "c_custkey", 999999L))
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
