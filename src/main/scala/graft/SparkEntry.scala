package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import java.sql.Timestamp

import graft.operators.{Joins, Read, Validate, Writes}
import graft.schema.{Catalog, FTimestamp}
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

  private val ordersCols =
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
  private val customerCols =
    "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment"
  private val partCols =
    "p_partkey, p_name, p_brand, p_type, p_size, p_retailprice"

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // ---- §2.1 scans ----
    "s1_scan_project" -> ((s, dir) => Tables.scan(s, dir, "customer")),
    "s2_point_lookup" -> ((s, dir) =>
      Read.read(s, dir, "customer", example = Map("c_custkey" -> 42L),
        limit = Some(1), sorted = false)),

    // ---- §2.2 projections / filters ----
    "p3_qbe" -> ((s, dir) =>
      Read.read(s, dir, "orders",
        example = Map("o_custkey" -> 7L, "o_orderstatus" -> "F"))),
    "p4_predicate" -> ((s, dir) =>
      Read.read(s, dir, "orders",
        extra = Some(F.col("o_totalprice") > 150000.0 &&
          F.col("o_orderdate") >= F.lit(Timestamp.valueOf("1998-01-01 00:00:00"))),
        sorted = false)),
    "p6_computed" -> ((s, dir) => Tables.scanWithAliases(s, dir, "customer")),

    // ---- §2.5 sort / limit / distinct ----
    "o1_sort_limit" -> ((s, dir) => Read.read(s, dir, "orders", limit = Some(10))),
    // O2 — caller-supplied sort overriding the declared one
    // (README.md:106-110 order_by('created','desc'))
    "o2_caller_sort" -> ((s, dir) =>
      Tables.scan(s, dir, "orders")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").asc)
        .limit(5)),
    "o4_select_list" -> ((s, dir) =>
      Read.selectList(s, dir, "nation", "n_nationkey", "n_name")),

    // ---- §2.4 aggregates ----
    "a1_total" -> ((s, dir) =>
      Read.total(s, dir, "lineitem",
        extra = Some(F.col("l_shipdate") >= F.lit(Timestamp.valueOf("1995-01-01 00:00:00")) &&
          F.col("l_shipdate") < F.lit(Timestamp.valueOf("1996-01-01 00:00:00"))))),
    "a2_unique_probe" -> ((s, dir) =>
      Tables.scan(s, dir, "customer")
        .filter(F.col("c_custkey") === 42L)
        .agg(F.count(F.lit(1)).as("n"))),

    // ---- §2.3 joins ----
    "j1_belongs_to" -> ((s, dir) => Joins.related(s, dir, "orders", "customer")),
    "j2_has_many" -> ((s, dir) =>
      Joins.related(s, dir, "customer", "orders", example = Map("c_custkey" -> 7L))),
    "j3_many_to_many" -> ((s, dir) =>
      Joins.related(s, dir, "part", "orders", example = Map("p_partkey" -> 1L))),
    "j4_semi_ids" -> ((s, dir) =>
      Joins.relatedIds(s, dir, "part", "orders", Map("p_partkey" -> 1L))),
    "j1b_has_one" -> ((s, dir) =>
      Joins.related(s, dir, "nation", "first_customer")),
    "j5_conditions" -> ((s, dir) =>
      Joins.related(s, dir, "customer", "open_orders",
        example = Map("c_custkey" -> 7L))),

    // ---- §2.1 write-path merges (S5-S8) ----
    "s5_insert" -> ((s, dir) => {
      val base = Tables.scan(s, dir, "orders")
      val batch = base.filter(F.col("o_orderkey") <= 3L)
      Writes.insert(base, batch, "o_orderkey", Seq(F.col("o_orderkey")))
    }),
    "s6_update" -> ((s, dir) => {
      val base = Tables.scan(s, dir, "orders")
      val delta = base.filter(F.col("o_orderstatus") === "P")
        .select(F.col("o_orderkey"),
          F.lit("1-URGENT").as("o_orderpriority"),
          (F.col("o_totalprice") * 1.1).as("o_totalprice"))
      Writes.update(base, delta, Seq("o_orderkey"))
    }),
    "s7_delete" -> ((s, dir) => {
      val base = Tables.scan(s, dir, "orders")
      val badCust = Tables.scan(s, dir, "customer")
        .filter(F.col("c_nationkey") === 3).select("c_custkey")
      val victims = base.join(F.broadcast(badCust),
        base("o_custkey") === badCust("c_custkey"), "left_semi")
      Writes.delete(base, victims, Seq("o_orderkey"))
    }),
    // reference LIMIT-n DML (`model.php:775,831`, compiled at
    // `model.php:1213-1217,1248-1252`): delta/victim set restricted to
    // its first n rows by primary key
    "s6b_update_limit" -> ((s, dir) => {
      val base = Tables.scan(s, dir, "orders")
      val delta = base.filter(F.col("o_orderstatus") === "P")
        .select(F.col("o_orderkey"), F.lit("1-URGENT").as("o_orderpriority"))
      Writes.update(base, delta, Seq("o_orderkey"), limit = Some(5))
    }),
    "s7b_delete_limit" -> ((s, dir) => {
      val base = Tables.scan(s, dir, "orders")
      val victims = base.filter(F.col("o_orderstatus") === "F")
      Writes.delete(base, victims, Seq("o_orderkey"), limit = Some(10))
    }),
    "s8_upsert" -> ((s, dir) => {
      val base = Tables.scan(s, dir, "orders")
      val updates = base.filter(F.col("o_orderkey") <= 10L)
        .withColumn("o_orderpriority", F.lit("5-LOW"))
      val inserts = base.filter(F.col("o_orderkey") <= 5L)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10000000L)
      Writes.upsert(base, updates.unionByName(inserts), Seq("o_orderkey"))
    }),

    // ---- §2.6 scalar functions / validation ----
    // mixed-format fixture: four concrete formats of the reference's
    // strtotime cascade (field/timestamp.php:30-38) — ISO datetime,
    // ISO-T, US m/d/Y, bare epoch seconds — chosen per row, all parsed
    // by the ONE lenientParse cascade. Order dates are midnight-only,
    // so every format round-trips to the same instant.
    "f2_lenient_ts" -> ((s, dir) => {
      val d = F.col("o_orderdate")
      val raw = F.when(F.col("o_orderkey") % 4 === 0,
          F.date_format(d, "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("o_orderkey") % 4 === 1,
          F.date_format(d, "yyyy-MM-dd'T'HH:mm:ss"))
        .when(F.col("o_orderkey") % 4 === 2, F.date_format(d, "MM/dd/yyyy"))
        .otherwise(F.unix_seconds(d.cast("timestamp")).cast("string"))
      Tables.scan(s, dir, "orders").select(
        F.col("o_orderkey"),
        FTimestamp.lenientParse(raw).cast("timestamp_ntz").as("parsed"))
    }),
    // F5 relative date math end-to-end: the reference's bulk-delete
    // cutoff `where('last_login', '<', strtotime('-1 year'))`
    // (README.md:150-151, /root/reference). Anchored at a FIXED
    // instant (not now()) so the graded result replays; the fixture's
    // events all land in Jan 2024, so a 2025-01-15 anchor puts the
    // 1-year-back cutoff mid-range and both filter outcomes occur.
    "f5_relative_date" -> ((s, dir) => {
      val anchor = F.lit("2025-01-15 12:30:00").cast("timestamp_ntz")
      Tables.scan(s, dir, "events")
        .filter(F.col("ts") <
          graft.functions.Dates.relative("-1 year", anchor))
        .select(F.col("event_id"), F.col("ts"))
    }),
    "f_verbose" -> ((s, dir) =>
      Tables.scan(s, dir, "orders").select(
        F.col("o_orderkey"),
        F.date_format(F.col("o_orderdate"), "MM/dd/yyyy").as("d_verbose"),
        F.when(F.col("o_orderstatus") === "F", "Yes").otherwise("No").as("is_final"),
        // format_number (the FFloat verbose) adds locale separators,
        // which the DuckDB oracle cannot reproduce on floats — the
        // oracled column uses plain %.2f; format_number is pinned by a
        // golden ScalaTest instead.
        F.format_string("%.2f", F.col("o_totalprice")).as("price_fmt"))),
    "f1_casts" -> ((s, dir) =>
      Tables.scan(s, dir, "events").select(
        F.col("event_id"),
        F.get_json_object(F.col("props"), "$.k").cast("long").as("k"),
        F.nullif(F.trim(F.col("event_type")), F.lit("")).as("etype"))),
    "s10_json" -> ((s, dir) =>
      Tables.scan(s, dir, "nation").select(
        F.col("n_nationkey"),
        F.to_json(F.struct(F.col("n_nationkey"), F.col("n_name"))).as("js"))),
    "f10_validate" -> ((s, dir) =>
      Validate.report(Tables.scan(s, dir, "customer"), Catalog("customer"))),
    // FEmail + FBool end-to-end: the customer_profile model derives a
    // validated email (EmailRule: both pass and fail rows exist by
    // construction) and a boolean rendered through FBool's Yes/No
    // verbose (field/email.php, field/boolean.php:13-33)
    "f12_email_bool" -> ((s, dir) => {
      val t = Catalog("customer_profile")
      Validate.report(Tables.scan(s, dir, "customer_profile"), t)
        .withColumn("active_verbose",
          t.field("c_active").ftype.verbose(F.col("c_active")))
    }),

    // ---- SQL surface: registered views + native graft expressions ----
    "sql_group_agg" -> ((s, dir) => {
      Tables.scan(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "count(*) AS n_rows FROM lineitem_v GROUP BY l_returnflag, l_linestatus")
    }),
    "sql_dot_product" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Tables.scan(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql("SELECT vec_id, round(dot_product(embedding, embedding), 6) AS sq_norm " +
        "FROM embeddings_v")
    }),
    // whole-catalog SQL through the PERSISTENT catalog: external
    // parquet tables + catalog views in the warehouse (the metastore
    // path — BASELINE.json's stated approach), then an arbitrary
    // multi-table query runs through spark.sql with no DataFrame code
    "sql_catalog_join" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql("SELECT n_name, count(*) AS n_customers, avg(c_acctbal) AS avg_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name")
    }),

    // star join through BOTH declared dims — the BroadcastFixedDims
    // rule (GraftSparkExtensions) stamps the broadcast hints; no
    // per-query hints, no size estimation (PlanShapeSpec pins the plan
    // — including through the persistent catalog views)
    "sql_star_join" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql("SELECT r_name, n_name, count(*) AS n_customers " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name")
    }),

    // classic OLAP multi-join shapes (TPC-H Q3/Q5 on the fixture's
    // column subset), run as pure SQL through the catalog — the
    // dialect-shared text below IS the oracle, so the two engines run
    // the identical query. Revenue accumulates in DECIMAL: exact, so
    // neither the values nor the top-10 ranking depend on float
    // accumulation order (Spark partial aggs vs DuckDB parallel scan)
    "sql_tpch_q3" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ3Sql)
    }),
    "sql_tpch_q5" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ5Sql)
    }),
    "sql_tpch_q1" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ1Sql)
    }),
    "sql_tpch_q10" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ10Sql)
    }),
    "sql_tpch_q18" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ18Sql)
    }),
    "sql_tpch_q6" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ6Sql)
    }),
    "sql_tpch_q14" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ14Sql)
    }),
    // correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join (no per-row re-execution); the dialect-shared
    // text runs verbatim on both engines
    "sql_correlated" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(correlatedSql)
    }),
    "sql_tpch_q7" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ7Sql)
    }),
    "sql_tpch_q8" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ8Sql)
    }),
    "sql_tpch_q13" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ13Sql)
    }),
    "sql_tpch_q15" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ15Sql)
    }),
    "sql_tpch_q17" -> ((s, dir) => {
      graft.api.Graft(s, dir).enableSql(persistent = true)
      s.sql(tpchQ17Sql)
    })
  ) ++ Extensions.queries

  /** Dialect-shared TPC-H-shape SQL (identical text runs on Spark and
    * DuckDB): Q3 shipping-priority top-10 and Q5 local-supplier
    * volume, restricted to the fixture's columns. */
  // all-decimal revenue: cast the raw 2-dp columns (unambiguous),
  // multiply in decimal (exact), never round a double product — see
  // the tpchQ1Sql comment for the divergence the old form risked.
  // The OUTPUT cast is DOUBLE, not decimal: the driver's hash renders
  // decimals float-style, so any trailing-zero value ('138014.00' vs
  // '138014.0') fails hash_match even when both engines agree at full
  // precision. One decimal→double conversion of identical exact
  // operands is deterministic on both engines (graded outputs are
  // double/long/string/timestamp only — SURVEY §5 contract).
  private val revenueSql =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue"
  // Q1 pricing summary: every money measure is EXACT — the raw
  // columns are 2-dp values (casting THEM to decimal is unambiguous;
  // casting a double PRODUCT is not: Spark rounds the exact binary
  // value HALF_UP, DuckDB rounds in float arithmetic, and the 6th
  // digit diverges — observed on sum_charge before this form), all
  // arithmetic then stays in decimal; the OUTPUT casts go to DOUBLE
  // (see revenueSql — decimal outputs fail the driver hash on
  // trailing zeros). The avg columns stay double: the driver
  // canonicalizes at 9 significant digits, absorbing grouped-mean
  // accumulation wobble
  private val tpchQ1Sql: String =
    "SELECT l_returnflag, l_linestatus, " +
      "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price, " +
      "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge, " +
      "avg(l_quantity) AS avg_qty, avg(l_extendedprice) AS avg_price, " +
      "avg(l_discount) AS avg_disc, count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
      "GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag, l_linestatus"
  // Q10 returned-item report (fixture's column subset): revenue from
  // R-flagged lineitems per customer over a quarter, top 20. Same
  // all-decimal revenue; c_custkey tiebreak for engine-stable order
  private val tpchQ10Sql: String =
    s"SELECT c_custkey, c_name, $revenueSql, c_acctbal, n_name " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
      "AND l_returnflag = 'R' " +
      "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
      "ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
  // Q18 large-volume orders: IN-subquery with a HAVING aggregate —
  // the decorrelated-subquery join shape. sum(l_quantity) stays double
  // because quantities are integers (the sum is exact in either engine)
  private val tpchQ18Sql: String =
    "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, " +
      "sum(l_quantity) AS sum_qty " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem " +
      "GROUP BY l_orderkey HAVING sum(l_quantity) > 150) " +
      "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice " +
      "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"
  // Q6 forecasting revenue change: pure scan-side filter + one global
  // decimal sum — the pushdown showcase (every predicate reaches the
  // parquet reader). Double BETWEENs compare identical binary values
  // on both engines; the revenue product stays decimal end-to-end
  private val tpchQ6Sql: String =
    "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue " +
      "FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' " +
      "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
  // Q14 promo revenue share (fixture p_type is the literal category
  // 'PROMO'): decimal sums, percentage as one double division over
  // identical exact operands
  private val tpchQ14Sql: String =
    "WITH m AS (SELECT " +
      "sum(CASE WHEN p_type = 'PROMO' THEN " +
      "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) " +
      "ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo, " +
      "sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00') " +
      "SELECT CAST(promo AS DOUBLE) AS promo_revenue, " +
      "CAST(total AS DOUBLE) AS total_revenue, " +
      "100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_pct " +
      "FROM m"
  // shared per-row decimal volume term (see tpchQ1Sql for why the
  // factors are cast RAW and multiplied in decimal)
  private val volExpr =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
  // Q7 volume shipping between a nation pair, both directions, by
  // ship year (fixture nations are synthetic NATION_n; the pair is
  // chosen so both sides have suppliers at every SF). year() cast to
  // BIGINT: Spark's is int32, DuckDB's int64
  private val tpchQ7Sql: String =
    "SELECT supp_nation, cust_nation, l_year, " +
      "CAST(sum(vol) AS DOUBLE) AS revenue FROM (" +
      "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
      s"$volExpr AS vol " +
      "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8') " +
      "OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')) " +
      "GROUP BY supp_nation, cust_nation, l_year " +
      "ORDER BY supp_nation, cust_nation, l_year"
  // Q8 market share of NATION_3 suppliers in EUROPE customers' PROMO
  // part orders, by order year: decimal sums, one double division
  // over identical exact operands for the share
  private val tpchQ8Sql: String =
    "SELECT o_year, CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol " +
      "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume, " +
      "CAST(sum(vol) AS DOUBLE) AS total_volume, " +
      "CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol " +
      "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / " +
      "CAST(sum(vol) AS DOUBLE) AS mkt_share FROM (" +
      "SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
      s"$volExpr AS vol, n2.n_name AS nation " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'EUROPE' AND p_type = 'PROMO') " +
      "GROUP BY o_year ORDER BY o_year"
  // Q13 customer order-count distribution: LEFT join keeps the
  // zero-order customers (the distribution's head), double grouping
  private val tpchQ13Sql: String =
    "SELECT c_count, count(*) AS custdist FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS c_count " +
      "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
      "GROUP BY c_custkey) " +
      "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
  // Q15 top supplier(s) by quarterly revenue: the revenue CTE is
  // decimal-exact, so the max-equality predicate is exact too (no
  // float-compare hazard in the "ties all returned" contract); only
  // the OUTPUT projection widens to double (driver-hash contract)
  private val tpchQ15Sql: String =
    "WITH rev AS (SELECT l_suppkey AS supplier_no, " +
      s"CAST(sum($volExpr) AS DECIMAL(18,4)) AS total_revenue " +
      "FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1997-10-01 00:00:00' " +
      "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1) " +
      "SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue " +
      "FROM supplier JOIN rev ON s_suppkey = supplier_no " +
      "WHERE total_revenue = (SELECT max(total_revenue) FROM rev) " +
      "ORDER BY s_suppkey"
  // Q17 small-quantity-order revenue: correlated average per part
  // (Catalyst decorrelates); the avg is sum-of-integer-valued-doubles
  // over a count — deterministic on both engines — and the final
  // division is one double op
  private val tpchQ17Sql: String =
    "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 " +
      "AS avg_yearly FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand = 'Brand#1' AND l_quantity < (" +
      "SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 " +
      "WHERE l2.l_partkey = p_partkey)"
  private val correlatedSql: String =
    "SELECT c_custkey, c_name, " +
      "(SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders " +
      "FROM customer " +
      "WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 12 " +
      "ORDER BY c_custkey ASC"
  private val tpchQ3Sql: String =
    s"SELECT l_orderkey, o_orderdate, $revenueSql " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' " +
      "AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' " +
      "AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00' " +
      "GROUP BY l_orderkey, o_orderdate " +
      "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
  private val tpchQ5Sql: String =
    s"SELECT n_name, $revenueSql " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
      // n_name tiebreak: equal decimal revenues would otherwise make
      // the output order engine-dependent (Q3 has its l_orderkey twin)
      "GROUP BY n_name ORDER BY revenue DESC, n_name ASC"

  def oracleSql: Map[String, String] = Map(
    "s1_scan_project" -> s"SELECT $customerCols FROM customer",
    "s2_point_lookup" -> s"SELECT $customerCols FROM customer WHERE c_custkey = 42",
    "p3_qbe" ->
      s"SELECT $ordersCols FROM orders WHERE o_custkey = 7 AND o_orderstatus = 'F'",
    "p4_predicate" ->
      (s"SELECT $ordersCols FROM orders " +
        "WHERE o_totalprice > 150000.0 AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'"),
    "p6_computed" ->
      (s"SELECT $customerCols, trim(concat_ws(' ', c_name, c_mktsegment)) AS c_label " +
        "FROM customer"),
    "o1_sort_limit" ->
      s"SELECT $ordersCols FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 10",
    "o2_caller_sort" ->
      s"SELECT $ordersCols FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5",
    "o4_select_list" -> "SELECT DISTINCT n_nationkey, n_name FROM nation",
    "a1_total" ->
      ("SELECT COUNT(*) AS total FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"),
    "a2_unique_probe" -> "SELECT COUNT(*) AS n FROM customer WHERE c_custkey = 42",
    "j1_belongs_to" ->
      (s"SELECT $ordersCols, $customerCols FROM orders JOIN customer ON o_custkey = c_custkey"),
    "j2_has_many" ->
      (s"SELECT $customerCols, $ordersCols FROM customer JOIN orders ON c_custkey = o_custkey " +
        "WHERE c_custkey = 7"),
    "j3_many_to_many" ->
      (s"SELECT $partCols, $ordersCols FROM part " +
        "JOIN lineitem ON p_partkey = l_partkey JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE p_partkey = 1"),
    "j4_semi_ids" ->
      "SELECT DISTINCT l_orderkey FROM lineitem WHERE l_partkey = 1",
    "j1b_has_one" ->
      ("SELECT n_nationkey, n_name, n_regionkey, " + customerCols + " FROM nation JOIN " +
        "(SELECT " + customerCols + " FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY c_nationkey ORDER BY c_custkey ASC) AS rn FROM customer) " +
        "WHERE rn = 1) c ON n_nationkey = c_nationkey"),
    "j5_conditions" ->
      (s"SELECT $customerCols, $ordersCols FROM customer JOIN orders ON c_custkey = o_custkey " +
        "WHERE c_custkey = 7 AND o_orderstatus = 'O'"),
    "s5_insert" ->
      (s"SELECT $ordersCols FROM orders UNION ALL " +
        "SELECT (SELECT max(o_orderkey) FROM orders) + row_number() OVER (ORDER BY o_orderkey), " +
        "o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
        "FROM orders WHERE o_orderkey <= 3"),
    "s6_update" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice, " +
        "o_orderdate, " +
        "CASE WHEN o_orderstatus = 'P' THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority " +
        "FROM orders"),
    "s7_delete" ->
      (s"SELECT $ordersCols FROM orders WHERE NOT EXISTS " +
        "(SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_nationkey = 3)"),
    "s6b_update_limit" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, " +
        "CASE WHEN o_orderkey IN (SELECT o_orderkey FROM orders " +
        "WHERE o_orderstatus = 'P' ORDER BY o_orderkey ASC LIMIT 5) " +
        "THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority FROM orders"),
    "s7b_delete_limit" ->
      (s"SELECT $ordersCols FROM orders WHERE o_orderkey NOT IN " +
        "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_orderkey ASC LIMIT 10)"),
    "s8_upsert" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, " +
        "CASE WHEN o_orderkey <= 10 THEN '5-LOW' ELSE o_orderpriority END AS o_orderpriority " +
        "FROM orders UNION ALL " +
        "SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, " +
        "o_orderpriority FROM orders WHERE o_orderkey <= 5"),
    "f2_lenient_ts" ->
      ("WITH raws AS (SELECT o_orderkey, CASE CAST(o_orderkey % 4 AS INT) " +
        "WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') " +
        "WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') " +
        "WHEN 2 THEN strftime(o_orderdate, '%m/%d/%Y') " +
        "ELSE CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR) END AS raw " +
        "FROM orders) " +
        "SELECT o_orderkey, coalesce(" +
        "try_strptime(raw, '%Y-%m-%d %H:%M:%S'), " +
        "try_strptime(raw, '%Y-%m-%dT%H:%M:%S'), " +
        "try_strptime(raw, '%m/%d/%Y'), " +
        // bare epoch seconds: make_timestamp takes epoch MICROS and
        // yields a plain (ntz) timestamp — no session-zone dependence
        "CASE WHEN regexp_matches(raw, '^\\d{9,11}$') " +
        "THEN make_timestamp(CAST(raw AS BIGINT) * 1000000) END) AS parsed " +
        "FROM raws"),
    "f5_relative_date" ->
      // epoch_ns // 1000 replays the Spark side's exact ns→µs
      // truncation before both the compare and the projection
      ("SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts " +
        "FROM events WHERE make_timestamp(epoch_ns(ts) // 1000) < " +
        "TIMESTAMP '2025-01-15 12:30:00' - INTERVAL 1 YEAR"),
    "f_verbose" ->
      ("SELECT o_orderkey, strftime(o_orderdate, '%m/%d/%Y') AS d_verbose, " +
        "CASE WHEN o_orderstatus = 'F' THEN 'Yes' ELSE 'No' END AS is_final, " +
        "printf('%.2f', o_totalprice) AS price_fmt FROM orders"),
    "f1_casts" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "nullif(trim(event_type), '') AS etype FROM events"),
    "s10_json" ->
      ("SELECT n_nationkey, CAST(to_json(struct_pack(n_nationkey := n_nationkey, " +
        "n_name := n_name)) AS VARCHAR) AS js FROM nation"),
    "f10_validate" ->
      (s"SELECT $customerCols, " +
        "(c_name IS NOT NULL AND trim(c_name) <> '') AS ok_c_name_not_empty, " +
        "(c_name IS NULL OR length(c_name) >= 5) AS ok_c_name_min_length_5, " +
        "(c_name IS NULL OR length(c_name) <= 127) AS ok_c_name_max_length_127, " +
        "(c_acctbal IS NULL OR (c_acctbal >= -1000.0 AND c_acctbal <= 10000.0)) AS ok_c_acctbal_range, " +
        "(c_mktsegment IS NULL OR c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')) AS ok_c_mktsegment_in_set, " +
        "(CASE WHEN (c_name IS NOT NULL AND trim(c_name) <> '') THEN 0 ELSE 1 END + " +
        " CASE WHEN (c_name IS NULL OR length(c_name) >= 5) THEN 0 ELSE 1 END + " +
        " CASE WHEN (c_name IS NULL OR length(c_name) <= 127) THEN 0 ELSE 1 END + " +
        " CASE WHEN (c_acctbal IS NULL OR (c_acctbal >= -1000.0 AND c_acctbal <= 10000.0)) THEN 0 ELSE 1 END + " +
        " CASE WHEN (c_mktsegment IS NULL OR c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')) THEN 0 ELSE 1 END) " +
        "::INTEGER AS n_errors FROM customer"),
    "f12_email_bool" -> {
      val emailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
      ("SELECT c_custkey, c_email, c_active, " +
        "(c_email IS NOT NULL AND trim(c_email) <> '') AS ok_c_email_not_empty, " +
        s"(c_email IS NULL OR regexp_matches(c_email, '$emailRe')) AS ok_c_email_email, " +
        "(CASE WHEN (c_email IS NOT NULL AND trim(c_email) <> '') THEN 0 ELSE 1 END + " +
        s" CASE WHEN (c_email IS NULL OR regexp_matches(c_email, '$emailRe')) THEN 0 ELSE 1 END" +
        ")::INTEGER AS n_errors, " +
        "CASE WHEN c_active THEN 'Yes' ELSE 'No' END AS active_verbose FROM (" +
        "SELECT c_custkey, regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') || " +
        "CASE WHEN right(c_name, 1) IN ('0', '5') THEN '@invalid' " +
        "ELSE '@example.com' END AS c_email, " +
        "c_acctbal > 0 AS c_active FROM customer)")
    },
    "sql_group_agg" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "sql_dot_product" ->
      ("SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), " +
        "CAST(embedding AS DOUBLE[])), 6) AS sq_norm FROM embeddings"),
    "sql_catalog_join" ->
      ("SELECT n_name, count(*) AS n_customers, avg(c_acctbal) AS avg_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
    "sql_star_join" ->
      ("SELECT r_name, n_name, count(*) AS n_customers " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name"),
    // dialect-shared: the oracle runs the IDENTICAL text Spark ran
    "sql_tpch_q3" -> tpchQ3Sql,
    "sql_tpch_q5" -> tpchQ5Sql,
    "sql_tpch_q1" -> tpchQ1Sql,
    "sql_tpch_q10" -> tpchQ10Sql,
    "sql_tpch_q18" -> tpchQ18Sql,
    "sql_tpch_q6" -> tpchQ6Sql,
    "sql_tpch_q14" -> tpchQ14Sql,
    "sql_tpch_q7" -> tpchQ7Sql,
    "sql_tpch_q8" -> tpchQ8Sql,
    "sql_tpch_q13" -> tpchQ13Sql,
    "sql_tpch_q15" -> tpchQ15Sql,
    "sql_tpch_q17" -> tpchQ17Sql,
    "sql_correlated" -> correlatedSql
  ) ++ Extensions.oracleSql
}
