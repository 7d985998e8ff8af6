package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import java.sql.Timestamp

import graft.operators.Read
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY §2 (or a
  * north-star extension), expressed Spark-first; `oracleSql` carries
  * the DuckDB-equivalent ANSI SQL run by the driver on the same
  * parquet tables. Column names are aliased identically on both
  * sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship (SURVEY §7 step 2): "top customer orders" — scan
    * `orders`, QBE-filter on `o_custkey`, declared sort
    * `o_orderdate desc, o_orderkey asc`, limit 10. Driver smoke-checks
    * rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Read.read(spark, "/root/testdata/sf0.001", "orders",
      example = Map("o_custkey" -> 7L), limit = Some(10))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1 — full declared-field aliased scan
    "s1_scan_project" -> ((s, dir) => Tables.scan(s, dir, "customer")),

    // S2/P3 — point lookup by unique key
    "s2_point_lookup" -> ((s, dir) =>
      Read.read(s, dir, "customer", example = Map("c_custkey" -> 42L),
        limit = Some(1), sorted = false)),

    // P3 — query-by-example conjunctive equality + declared sort
    "p3_qbe" -> ((s, dir) =>
      Read.read(s, dir, "orders",
        example = Map("o_custkey" -> 7L, "o_orderstatus" -> "F"))),

    // P4 — arbitrary predicate passthrough
    "p4_predicate" -> ((s, dir) =>
      Read.read(s, dir, "orders",
        extra = Some(F.col("o_totalprice") > 150000.0 &&
          F.col("o_orderdate") >= F.lit(Timestamp.valueOf("1998-01-01 00:00:00"))),
        sorted = false)),

    // O1/O3 — declared multi-column sort + LIMIT (top-k)
    "o1_sort_limit" -> ((s, dir) =>
      Read.read(s, dir, "orders", limit = Some(10))),

    // P2/O4 — select_list: DISTINCT two-column projection
    "o4_select_list" -> ((s, dir) =>
      Read.selectList(s, dir, "nation", "n_nationkey", "n_name")),

    // A1 — total(): COUNT(*) over filtered subquery
    "a1_total" -> ((s, dir) =>
      Read.total(s, dir, "lineitem",
        extra = Some(F.col("l_shipdate") >= F.lit(Timestamp.valueOf("1995-01-01 00:00:00")) &&
          F.col("l_shipdate") < F.lit(Timestamp.valueOf("1996-01-01 00:00:00"))))),

    // A2 — uniqueness probe as a count frame (oracled form of is_unique)
    "a2_unique_probe" -> ((s, dir) =>
      Tables.scan(s, dir, "customer")
        .filter(F.col("c_custkey") === 42L)
        .agg(F.count(F.lit(1)).as("n")))
  )

  def oracleSql: Map[String, String] = Map(
    "s1_scan_project" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    "s2_point_lookup" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey = 42",
    "p3_qbe" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
        "FROM orders WHERE o_custkey = 7 AND o_orderstatus = 'F'"),
    "p4_predicate" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
        "FROM orders WHERE o_totalprice > 150000.0 AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'"),
    "o1_sort_limit" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
        "FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 10"),
    "o4_select_list" ->
      "SELECT DISTINCT n_nationkey, n_name FROM nation",
    "a1_total" ->
      ("SELECT COUNT(*) AS total FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"),
    "a2_unique_probe" ->
      "SELECT COUNT(*) AS n FROM customer WHERE c_custkey = 42"
  )
}
