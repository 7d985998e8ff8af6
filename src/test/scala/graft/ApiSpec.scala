package graft

import graft.api.Graft
import graft.functions.Text
import org.apache.spark.sql.{functions => F}

/** README-scenario tests (SURVEY §5.2): each reference usage example
  * re-expressed through the fluent façade against the fixtures. */
class ApiSpec extends SparkSpec {

  lazy val g = Graft(spark, sf)

  test("factory + QBE + read (README.md:89-113)") {
    val row = g.model("customer").where("c_custkey", 42L).readOne()
    assert(row.exists(_.getAs[Long]("c_custkey") == 42L))
    assert(g.model("orders").where("o_custkey", 7L).read().count() > 0)
  }

  test("total over conditions (README count example)") {
    val n = g.model("orders").where("o_orderstatus", "F").total()
    val manual = g.model("orders").read()
      .filter(F.col("o_orderstatus") === "F").count()
    assert(n == manual)
  }

  test("relation traversal ($user->orders, README.md:106-113)") {
    val orders = g.model("customer").where("c_custkey", 7L).related("orders")
    assert(orders.count() > 0)
    assert(orders.select("o_custkey").distinct().collect()(0).getLong(0) == 7L)
  }

  test("create assigns fresh ids (README.md:64-85)") {
    val batch = g.model("orders").where("o_custkey", 7L).read()
    val out = g.model("orders").create(batch)
    val base = g.model("orders").read()
    assert(out.count() == base.count() + batch.count())
  }

  test("update changes only the selected rows (README.md:117-141)") {
    val out = g.model("orders").where("o_custkey", 7L)
      .update(Map("o_orderpriority" -> F.lit("X")))
    val changed = out.filter(F.col("o_orderpriority") === "X")
    assert(changed.count() ==
      g.model("orders").where("o_custkey", 7L).read().count())
  }

  test("point and bulk delete (README.md:145-153)") {
    val cutoff = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    val out = g.model("orders")
      .filter(F.col("o_orderdate") < F.lit(cutoff)).delete()
    assert(out.filter(F.col("o_orderdate") < F.lit(cutoff)).count() == 0)
    assert(out.count() > 0)
  }

  test("validation + json export") {
    val rep = g.model("customer").where("c_custkey", 1L).validate().collect()
    assert(rep.length == 1 && rep(0).getAs[Int]("n_errors") == 0)
    val js = g.model("region").asJson().collect()(0).getString(0)
    assert(js.startsWith("{") && js.contains("r_name"))
  }

  test("ChildSet tracks removals like Hive_Container (container.php:150-158)") {
    val kids = g.model("orders").where("o_custkey", 7L).read()
    val n = kids.count()
    val firstTwo = kids.select("o_orderkey").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val cs = graft.api.ChildSet(kids, "o_orderkey").remove(firstTwo)
    assert(cs.result().count() == n - 2)
    assert(cs.removedKeys().collect().map(_.getLong(0)).toSet == firstTwo.toSet)
    // add + remove compose
    val extra = kids.limit(1).withColumn("o_orderkey", F.lit(424242L))
    val cs2 = cs.add(extra)
    assert(cs2.result().count() == n - 2 + 1)
  }

  test("shingles golden") {
    import spark.implicits._
    val got = Seq("a b c d e", "x y").toDF("t")
      .select(Text.shingles(F.col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq("x y"))
  }
}
