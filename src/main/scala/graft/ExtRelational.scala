package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Relational/OLAP SQL surface: grouped/distinct/rollup/cube
  * aggregation, pivot/unpivot, set and bag ops, window functions,
  * gap fill, cohort retention, exact decimal correlation.
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtRelational {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- grouped aggregation (driver-example shape; TPC-H Q1 style) ----
    "a3_group_agg" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          F.sum("l_quantity").as("sum_qty"),
          F.sum("l_extendedprice").as("sum_base_price"),
          F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .as("sum_disc_price"),
          F.avg("l_quantity").as("avg_qty"),
          F.count(F.lit(1)).as("count_order"))),


    // distinct aggregates: exact count(DISTINCT) per group — Spark
    // plans this as a two-phase expand+aggregate, still one logical op
    "a4_distinct_agg" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").as("n_parts"),
          F.countDistinct("l_suppkey").as("n_supps"),
          F.count(F.lit(1)).as("n_rows"))),


    // hierarchical totals: ROLLUP produces (flag,status), (flag), ()
    // grand-total levels in one pass — no key NULLs in the data, so
    // the level-indicator NULLs are unambiguous
    "a5_rollup" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").as("sum_qty"),
          F.count(F.lit(1)).as("n_rows"))),


    // pivot: one column per l_linestatus value — fixed value list so
    // the plan is a single pass (no distinct-values pre-query)
    "a6_pivot" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")),


    // post-aggregation filter (HAVING)
    "a7_having" -> ((s, dir) =>
      Tables.scan(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).as("n_orders"),
          F.sum("o_totalprice").as("spend"))
        .filter(F.col("n_orders") >= 12)),


    // full cube: all four grouping levels of (flag, status) in one
    // pass, with GROUPING_ID disambiguating level NULLs from data
    // NULLs — the standard OLAP cube contract (cast to BIGINT on both
    // engines: Spark's grouping_id and DuckDB's GROUPING differ in
    // native width)
    "a8_cube" -> ((s, dir) =>
      Tables.scan(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("long").as("gid"),
          F.sum("l_quantity").as("sum_qty"),
          F.count(F.lit(1)).as("n_rows"))),


    // exact Pearson correlation via decimal co-moments: the RAW
    // columns are cast to decimal first (value is exactly 2-dp, hour
    // is a small integer — both recover bit-identically from the
    // binary double in either engine), every product then runs in
    // exact decimal arithmetic, the SUMs (where accumulation order
    // would diverge — Spark's native corr() merges streaming
    // co-moments in partition order, so its value is not even
    // run-stable) are DECIMAL-exact, and the final formula runs in
    // double over identical operands → the result is bit-identical
    // across engines. Never cast a double PRODUCT to decimal: Spark
    // rounds the exact BigDecimal of the binary double HALF_UP while
    // DuckDB scales in float arithmetic, so the low digits diverge
    // (the x_window_running / sum_charge hazard class). The shape is
    // one map-side-combinable grouped pass; nothing is collected
    "x_stats_corr" -> ((s, dir) => {
      val x = F.col("value").cast("decimal(18,6)")
      val y = F.hour(F.col("ts")).cast("decimal(18,6)")
      val m = Tables.scan(s, dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(x).as("sx"), F.sum(y).as("sy"),
          F.sum(x * y).as("sxy"),
          F.sum(x * x).as("sxx"), F.sum(y * y).as("syy"))
      val (n, sx, sy, sxy, sxx, syy) = (F.col("n").cast("double"),
        F.col("sx").cast("double"), F.col("sy").cast("double"),
        F.col("sxy").cast("double"), F.col("sxx").cast("double"),
        F.col("syy").cast("double"))
      // zero-variance guard: Spark's non-ANSI x/0 yields NULL but
      // DuckDB's IEEE division yields Inf/NaN — an explicit NULL on a
      // zero denominator keeps a constant-value (or constant-hour)
      // group identical on both engines. The denominator is a double
      // computed from identical exact operands, so the guard fires
      // identically too.
      val den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
      m.select(F.col("event_type"), F.col("n"),
        F.when(den === 0.0, F.lit(null).cast("double"))
          .otherwise((n * sxy - sx * sy) / den)
          .as("corr_value_hour"))
    }),


    // ---- window functions: top-N per group ----
    "x_window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").asc)
      Tables.scan(s, dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),


    // bag-semantics set algebra: EXCEPT ALL / INTERSECT ALL preserve
    // multiplicity (a customer with 3 hi-spend orders and 1 finished
    // order keeps 2 in the difference) — the multiset complement of
    // o7's distinct set ops. Output canonicalized to per-key
    // multiplicities so the rows are deterministic
    "o10_bag_ops" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      val hi = o.filter(F.col("o_totalprice") > SETOPS_CUTOFF)
        .select("o_custkey")
      val fin = o.filter(F.col("o_orderstatus") === "F")
        .select("o_custkey")
      val ex = hi.exceptAll(fin).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).as("except_mult"))
      val in = hi.intersectAll(fin).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).as("intersect_mult"))
      ex.join(in, Seq("o_custkey"), "full_outer")
        .select(F.col("o_custkey"),
          F.coalesce(F.col("except_mult"), F.lit(0L)).as("except_mult"),
          F.coalesce(F.col("intersect_mult"), F.lit(0L)).as("intersect_mult"))
    }),


    // full-outer reconciliation: daily click vs purchase series
    // joined FULL OUTER so days with only one side survive with
    // explicit zeros — the two-feed consistency audit (the only join
    // type the surface didn't yet grade)
    "x_full_outer" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      def daily(t: String, out: String) =
        ev.filter(F.col("event_type") === t)
          .groupBy(F.to_date(F.col("ts")).as("day"))
          .agg(F.count(F.lit(1)).as(out))
      daily("click", "n_clicks")
        .join(daily("purchase", "n_purchases"), Seq("day"), "full_outer")
        .select(F.col("day"),
          F.coalesce(F.col("n_clicks"), F.lit(0L)).as("n_clicks"),
          F.coalesce(F.col("n_purchases"), F.lit(0L)).as("n_purchases"))
    }),


    // value-based (RANGE) window frame: per-user trailing one-hour
    // purchase total — the frame is defined by the ORDER-BY VALUE
    // (event time), not a row count, so irregular event spacing is
    // handled exactly. Ordered on epoch micros (integers) so both
    // engines build identical frames; sums in decimal
    // trailing ROBUST center: exact interpolated median over the last
    // 10 purchases per user (rows frame, tie-broken total order) —
    // the windowed twin of the MAD gate's percentile. O(frame) per
    // row with a CONSTANT frame width, so it scales linearly; both
    // engines interpolate at the (n-1)*q rank on identical doubles.
    "x_rolling_median" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-9, org.apache.spark.sql.expressions.Window.currentRow)
      Tables.scan(s, dir, "events")
        .filter(F.col("event_type") === "purchase")
        .select(F.col("event_id"), F.col("user_id"), F.col("ts"),
          F.col("value"),
          F.percentile(F.col("value"), F.lit(0.5)).over(w)
            .as("med_trailing"))
    }),

    "x_window_trailing" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.scan(s, dir, "events")
        .filter(F.col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("trailing_1h",
          // decimal sum (order-exact), double output (driver-hash
          // contract — see SURVEY §5)
          F.sum(F.col("value").cast("decimal(18,6)")).over(w)
            .cast("double"))
    }),


    // first/last/nth_value over the full partition frame — the
    // "entry/exit/second-touch" profile per user. Ordering is the µs
    // instant (matching the oracle's epoch_us truncation of the ns
    // fixture) tie-broken by event_id, so both engines see one total
    // order; one row per user via rn = 1 on the same ordering.
    "x_window_firstlast" -> ((s, dir) => {
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")), F.col("event_id"))
      val full = ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.scan(s, dir, "events")
        .select(
          F.col("user_id"),
          F.row_number().over(ord).as("rn"),
          F.first(F.col("event_type")).over(full).as("first_type"),
          F.last(F.col("event_type")).over(full).as("last_type"),
          F.nth_value(F.col("event_type"), 2).over(full).as("second_type"),
          F.count(F.lit(1)).over(full).cast("long").as("n_events"))
        .filter(F.col("rn") === 1)
        .drop("rn")
    }),


    // calendar-spine gap fill: a generated date spine × the observed
    // event types, left-joined to daily counts so silent days appear
    // as explicit zeros — the "no data IS data" contract every
    // monitoring/training-freshness pipeline needs. The spine bounds
    // come from min/max(to_date(ts)) — not a hardcoded range, so
    // events outside a fixed window can never be silently dropped and
    // the query conserves the event count at every SF. The spine is
    // sequence+explode over the 1-row bounds aggregate (no driver
    // loop; the cross joins are 1-row and dims-only); counts
    // aggregate before the join so the spine join is rows =
    // days × types, not events
    "x_gap_fill" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      val daily = ev.groupBy(F.to_date(F.col("ts")).as("day"),
          F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n_raw"))
      val spine = ev
        .agg(F.min(F.to_date(F.col("ts"))).as("lo"),
          F.max(F.to_date(F.col("ts"))).as("hi"))
        .select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).as("day"))
        .crossJoin(ev.select("event_type").distinct())
      spine.join(daily, Seq("day", "event_type"), "left")
        .select(F.col("day"), F.col("event_type"),
          F.coalesce(F.col("n_raw"), F.lit(0L)).as("n"))
    }),


    // cohort retention: users bucketed by first-activity week, then
    // counted per (cohort, week-offset) — the standard retention
    // triangle. Two grouped passes (first-touch, distinct activity)
    // and one join; every output is an integer count, so the result
    // is engine-exact by construction
    "x_cohort_retention" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
        .select(F.col("user_id"),
          F.floor(F.datediff(F.to_date(F.col("ts")),
            F.lit("2024-01-01").cast("date")) / 7).cast("long").as("week"))
      val cohorts = ev.groupBy("user_id")
        .agg(F.min("week").as("cohort_week"))
      val active = ev.distinct()
      active.join(cohorts, "user_id")
        .groupBy(F.col("cohort_week"),
          (F.col("week") - F.col("cohort_week")).as("week_offset"))
        .agg(F.countDistinct("user_id").as("n_users"))
    }),


    // unpivot/melt — the inverse reshaping of a6's pivot: the wide
    // per-status quantity columns fold back into (status, value)
    // rows. Pure metadata reshaping (an Expand node): no shuffle
    // beyond the pivot's own aggregation
    "o9_unpivot" -> ((s, dir) => {
      val wide = Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
      wide.unpivot(Array(F.col("l_returnflag")),
        Array(F.col("qty_f"), F.col("qty_o")), "status_col", "sum_qty")
    }),


    // semi-structured extraction: the events' JSON props payload is
    // parsed in-plan (get_json_object is codegen'd — no UDF, no
    // driver round-trip) and aggregated like any typed column; the
    // events-pipeline table-stakes for schema-on-read payloads
    "x_json_extract" -> ((s, dir) =>
      Tables.scan(s, dir, "events")
        .withColumn("k",
          F.get_json_object(F.col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).as("n"),
          F.count(F.col("k")).as("n_k"),
          F.sum("k").as("sum_k"),
          F.min("k").as("min_k"), F.max("k").as("max_k"),
          F.countDistinct("k").as("distinct_k"))),


    // fixed-width value histogram per event type — the distribution
    // dashboard. Bucketing is floor(value/width): one exact IEEE
    // division of the same 2-dp double on both engines, so boundary
    // values land identically; map-side-combinable single pass
    "x_histogram" -> ((s, dir) =>
      Tables.scan(s, dir, "events")
        .withColumn("bucket", F.floor(F.col("value") / HIST_WIDTH).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").as("sum_value"))
        .withColumn("bucket_lo", (F.col("bucket") * HIST_WIDTH).cast("double"))),


    // set operations (absent from the reference — SURVEY §2.5 — but
    // table stakes for an analytics engine): symmetric difference of
    // two order-derived customer segments via UNION/INTERSECT/EXCEPT
    "o7_set_ops" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      val hi = o.filter(F.col("o_totalprice") > SETOPS_CUTOFF)
        .select("o_custkey")
      val fin = o.filter(F.col("o_orderstatus") === "F")
        .select("o_custkey")
      hi.union(fin).distinct().except(hi.intersect(fin))
    }),


    // per-user running total + step delta over purchase events — the
    // cumulative/lag analytic-window family. BOTH derived columns are
    // done in DECIMAL so they are EXACT: a double running sum's value
    // would depend on accumulation order (Spark folds sequentially,
    // DuckDB uses segment trees), and round(double - double, 6)
    // diverges on half-way/representation cases (Spark rounds the
    // exact BigDecimal of the binary double HALF_UP, DuckDB rounds in
    // float arithmetic) — decimal subtraction has neither hazard
    "x_window_running" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val dec = F.col("value").cast("decimal(18,6)")
      Tables.scan(s, dir, "events")
        .filter(F.col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("running_total",
          F.sum(dec).over(wRun).cast("double"))
        .withColumn("delta",
          (dec - F.lag(dec, 1).over(w)).cast("double"))
    }),


    // distribution-rank window family over recent orders: rank,
    // quartile (ntile), percent_rank, cume_dist per status partition.
    // Ordering includes o_orderkey so ties are impossible → every
    // rank value is deterministic; rank-derived fractions are exact
    // IEEE divisions of identical integers on both engines. Ranking
    // ints are cast to BIGINT (Spark's ntile/rank are int32, DuckDB's
    // are int64 — driver compares arrow types)
    "x_window_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey").asc)
      Tables.scan(s, dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        .select(F.col("o_orderkey"), F.col("o_orderstatus"), F.col("o_totalprice"),
          F.rank().over(w).cast("long").as("rnk"),
          F.ntile(4).over(w).cast("long").as("quartile"),
          F.percent_rank().over(w).as("pct_rank"),
          F.cume_dist().over(w).as("cume"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a3_group_agg" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "sum(l_extendedprice) AS sum_base_price, " +
        "sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price, " +
        "avg(l_quantity) AS avg_qty, count(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),

    "a4_distinct_agg" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows " +
        "FROM lineitem GROUP BY l_returnflag"),

    "a5_rollup" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "count(*) AS n_rows FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),

    "a6_pivot" ->
      ("SELECT l_returnflag, " +
        "sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f, " +
        "sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o " +
        "FROM lineitem GROUP BY l_returnflag"),

    "a7_having" ->
      ("SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend " +
        "FROM orders GROUP BY o_custkey HAVING count(*) >= 12"),

    "a8_cube" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
        "sum(l_quantity) AS sum_qty, count(*) AS n_rows " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),

    // decimal co-moments + double formula over identical operands —
    // mirrors the Spark side exactly (see queries map)
    "x_stats_corr" ->
      ("WITH m AS (SELECT event_type, count(*) AS n, " +
        "sum(CAST(value AS DECIMAL(18,6))) AS sx, " +
        "sum(CAST(hour(ts) AS DECIMAL(18,6))) AS sy, " +
        "sum(CAST(value AS DECIMAL(18,6)) * CAST(hour(ts) AS DECIMAL(18,6))) AS sxy, " +
        "sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sxx, " +
        "sum(CAST(hour(ts) AS DECIMAL(18,6)) * CAST(hour(ts) AS DECIMAL(18,6))) AS syy " +
        "FROM events GROUP BY 1), " +
        // zero-variance guard mirrors the Spark side: explicit NULL
        // on a zero denominator (DuckDB would emit Inf/NaN)
        "f AS (SELECT event_type, n, " +
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num, " +
        "sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
        "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den " +
        "FROM m) " +
        "SELECT event_type, n, " +
        "CASE WHEN den = 0 THEN NULL ELSE num / den END " +
        "AS corr_value_hour FROM f"),

    // ranks are tie-free (o_orderkey in the ordering), so every
    // column is a deterministic function of the sorted sequence
    "x_window_rank" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice, " +
        "CAST(rank() OVER w AS BIGINT) AS rnk, " +
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
        "percent_rank() OVER w AS pct_rank, " +
        "cume_dist() OVER w AS cume " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' " +
        "WINDOW w AS (PARTITION BY o_orderstatus " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC)"),

    "x_window_topn" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
        "FROM orders) WHERE rn <= 3"),

    "o10_bag_ops" ->
      ("WITH hi AS (SELECT o_custkey FROM orders " +
        s"WHERE o_totalprice > $SETOPS_CUTOFF), " +
        "fin AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'), " +
        "ex AS (SELECT o_custkey, count(*) AS except_mult FROM " +
        "(SELECT * FROM hi EXCEPT ALL SELECT * FROM fin) GROUP BY 1), " +
        "ia AS (SELECT o_custkey, count(*) AS intersect_mult FROM " +
        "(SELECT * FROM hi INTERSECT ALL SELECT * FROM fin) GROUP BY 1) " +
        "SELECT coalesce(ex.o_custkey, ia.o_custkey) AS o_custkey, " +
        "CAST(coalesce(except_mult, 0) AS BIGINT) AS except_mult, " +
        "CAST(coalesce(intersect_mult, 0) AS BIGINT) AS intersect_mult " +
        "FROM ex FULL JOIN ia ON ex.o_custkey = ia.o_custkey"),

    "x_full_outer" ->
      ("WITH c AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks " +
        "FROM events WHERE event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1) " +
        "SELECT coalesce(c.day, p.day) AS day, " +
        "CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks, " +
        "CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases " +
        "FROM c FULL JOIN p ON c.day = p.day"),

    // epoch-micros ORDER BY gives both engines identical integer
    // frame bounds; RANGE peers (equal timestamps) are included on
    // both sides per the SQL standard
    "x_rolling_median" ->
      ("SELECT event_id, user_id, ts, value, " +
        "quantile_cont(value, 0.5) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) " +
        "AS med_trailing FROM events WHERE event_type = 'purchase'"),

    "x_window_trailing" ->
      ("SELECT event_id, user_id, ts, value, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (" +
        "PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
        "AS DOUBLE) AS trailing_1h " +
        "FROM events WHERE event_type = 'purchase'"),

    "x_window_firstlast" ->
      ("SELECT user_id, first_type, last_type, second_type, n_events FROM (" +
        "SELECT user_id, row_number() OVER w AS rn, " +
        "first_value(event_type) OVER wf AS first_type, " +
        "last_value(event_type) OVER wf AS last_type, " +
        "nth_value(event_type, 2) OVER wf AS second_type, " +
        "CAST(count(*) OVER wf AS BIGINT) AS n_events FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), " +
        "wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)" +
        ") WHERE rn = 1"),

    // generate_series is DuckDB's spine; the left join + coalesce 0
    // mirrors the Spark side exactly
    "x_gap_fill" ->
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type, " +
        "count(*) AS n_raw FROM events GROUP BY 1, 2), " +
        // spine bounds derived from the data, mirroring the Spark side
        "b AS (SELECT min(CAST(ts AS DATE)) AS lo, " +
        "max(CAST(ts AS DATE)) AS hi FROM events), " +
        "spine AS (SELECT unnest(generate_series(lo, hi, " +
        "INTERVAL 1 DAY))::DATE AS day FROM b), " +
        "types AS (SELECT DISTINCT event_type FROM events) " +
        "SELECT s.day, t.event_type, " +
        "CAST(coalesce(d.n_raw, 0) AS BIGINT) AS n " +
        "FROM spine s CROSS JOIN types t " +
        "LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type"),

    "x_cohort_retention" ->
      ("WITH w AS (SELECT DISTINCT user_id, " +
        "CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS week " +
        "FROM events), " +
        "c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1) " +
        "SELECT c.cohort_week, w.week - c.cohort_week AS week_offset, " +
        "count(DISTINCT w.user_id) AS n_users " +
        "FROM w JOIN c USING (user_id) GROUP BY 1, 2"),

    // UNION ALL is the dialect-portable melt (Spark's unpivot KEEPS
    // null cells, so no null filter on either side)
    "o9_unpivot" ->
      ("WITH w AS (SELECT l_returnflag, " +
        "sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f, " +
        "sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, 'qty_f' AS status_col, qty_f AS sum_qty FROM w " +
        "UNION ALL " +
        "SELECT l_returnflag, 'qty_o' AS status_col, qty_o AS sum_qty FROM w"),

    // ->> extracts the raw string, cast mirrors Spark's long cast;
    // sums cast back to BIGINT (DuckDB sum(BIGINT) is HUGEINT)
    // TRY_CAST mirrors Spark's null-on-invalid cast('long'): a plain
    // CAST would ABORT the oracle on a non-integer $.k instead of
    // mismatching gracefully
    "x_json_extract" ->
      ("SELECT event_type, count(*) AS n, " +
        "count(TRY_CAST(props->>'k' AS BIGINT)) AS n_k, " +
        "CAST(sum(TRY_CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k, " +
        "min(TRY_CAST(props->>'k' AS BIGINT)) AS min_k, " +
        "max(TRY_CAST(props->>'k' AS BIGINT)) AS max_k, " +
        "count(DISTINCT TRY_CAST(props->>'k' AS BIGINT)) AS distinct_k " +
        "FROM events GROUP BY 1"),

    "x_histogram" ->
      ("SELECT event_type, bucket, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value, " +
        s"CAST(bucket * $HIST_WIDTH AS DOUBLE) AS bucket_lo " +
        "FROM (SELECT event_type, value, " +
        s"CAST(floor(value / $HIST_WIDTH) AS BIGINT) AS bucket FROM events) " +
        "GROUP BY event_type, bucket"),

    "o7_set_ops" ->
      (s"(SELECT o_custkey FROM orders WHERE o_totalprice > $SETOPS_CUTOFF " +
        "UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') " +
        s"EXCEPT (SELECT o_custkey FROM orders WHERE o_totalprice > $SETOPS_CUTOFF " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"),

    "x_window_running" ->
      ("SELECT event_id, user_id, ts, value, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total, " +
        "CAST(CAST(value AS DECIMAL(18,6)) - lag(CAST(value AS DECIMAL(18,6))) OVER (" +
        "PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS delta " +
        "FROM events WHERE event_type = 'purchase'")
  )
}
