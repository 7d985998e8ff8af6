package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Data quality and ML-feature analytics: profiling,
  * constraints, dense ids, binning, scaling, imputation, outliers.
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtAnalytics {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- data-quality gates (operators/Quality.scala) ----
    // column profiling: nulls/distinct/min/max for four
    // heterogeneous-typed columns as one aggregation branch per column
    // (deliberately NOT a single multi-distinct aggregation — that
    // plans an Expand multiplying the scan by the column count; see
    // Quality.profile's scaladoc for the measurements)
    "x_profile_columns" -> ((s, dir) =>
      graft.operators.Quality.profile(
        Tables.scan(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))),

    // declarative constraint suite over orders: the single-table
    // checks fold into one scan; the referential rule anti-joins
    // against the broadcast distinct customer key set
    "x_constraint_check" -> ((s, dir) =>
      graft.operators.Quality.checkConstraints(
        Tables.scan(s, dir, "orders"), Seq(
          graft.operators.Quality.NotNull("o_custkey"),
          graft.operators.Quality.Unique("o_orderkey"),
          graft.operators.Quality.InSet("o_orderstatus", Seq("O", "F", "P")),
          graft.operators.Quality.Check("totalprice_positive",
            F.col("o_totalprice") > 0),
          graft.operators.Quality.RefIntegrity("o_custkey",
            Tables.scan(s, dir, "customer"), "c_custkey")))),

    // group-mean imputation over a planted-null corpus (every 23rd
    // event's value nulled): NULLs fill with their type's decimal-
    // exact mean of the surviving values
    "x_impute" -> ((s, dir) =>
      graft.operators.Analytics.imputeMean(
        Tables.scan(s, dir, "events")
          .select(F.col("event_id"), F.col("event_type"),
            F.when(F.col("event_id") % 23 === 0, F.lit(null))
              .otherwise(F.col("value")).as("value")),
        "event_type", "value", Seq("event_id"))),

    // robust outliers: |value - median| > 3 * MAD per event_type,
    // exact sort-based percentiles on both engines
    "x_anomaly_mad" -> ((s, dir) =>
      graft.operators.Analytics.madOutliers(
        Tables.scan(s, dir, "events"),
        "event_type", "value", Seq("event_id"), MAD_CUT)),


    // scalable dense ids: global 1-based ordinals WITHOUT the
    // single-partition row_number() window — range partitions
    // numbered in parallel against broadcast partition offsets
    "x_assign_ids" -> ((s, dir) =>
      graft.operators.Ranking.denseIds(
        Tables.scan(s, dir, "documents").select("doc_id", "source"),
        Seq(F.col("doc_id")), RANK_PARTS)),

    // equi-depth decile binning on the same primitive: bins defined
    // by RANK (exactly replayable), never by quantile boundaries
    // whose tie handling is engine-dependent
    "x_quantile_bins" -> ((s, dir) =>
      graft.operators.Ranking.equiDepthBins(
        Tables.scan(s, dir, "events").select("event_id", "value"),
        Seq(F.col("value"), F.col("event_id")), "value",
        BIN_COUNT, RANK_PARTS)),

    // feature scaling: per-type z-scores from DECIMAL-exact moments
    // (merge-order-stable), broadcast stats, map-side z
    "x_feature_scale" -> ((s, dir) =>
      graft.operators.Analytics.standardize(
        Tables.scan(s, dir, "events")
          .select("event_id", "event_type", "value"),
        "event_type", "value", Seq("event_id")))
  )

  def oracleSql: Map[String, String] = Map(
    // profile: min-then-cast (never cast-then-min), timestamps
    // through an explicit second-precision format on both engines
    "x_profile_columns" -> {
      def block(c: String, mn: String, mx: String) =
        s"SELECT '$c' AS \"column\", n_rows, " +
          s"n_rows - nn_$c AS n_nulls, nd_$c AS n_distinct, " +
          s"$mn AS min_value, $mx AS max_value FROM s"
      "WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate").map { c =>
          s"CAST(count($c) AS BIGINT) AS nn_$c, " +
            s"CAST(count(DISTINCT $c) AS BIGINT) AS nd_$c, " +
            (if (c == "l_shipdate")
              s"strftime(min($c), '%Y-%m-%d %H:%M:%S') AS mn_$c, " +
                s"strftime(max($c), '%Y-%m-%d %H:%M:%S') AS mx_$c"
            else s"CAST(min($c) AS VARCHAR) AS mn_$c, " +
              s"CAST(max($c) AS VARCHAR) AS mx_$c")
        }.mkString(", ") + " FROM lineitem) " +
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
          .map(c => block(c, s"mn_$c", s"mx_$c"))
          .mkString(" UNION ALL ")
    },

    "x_constraint_check" -> {
      val union = "SELECT 'not_null(o_custkey)' AS \"constraint\", " +
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS violations FROM orders " +
        "UNION ALL SELECT 'unique(o_orderkey)', " +
        "CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'in_set(o_orderstatus)', " +
        "CAST(sum(CASE WHEN o_orderstatus IS NOT NULL " +
        "AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'check(totalprice_positive)', " +
        "CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'ref(o_custkey)', " +
        "CAST((SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL " +
        "AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)"
      s"SELECT \"constraint\", violations, violations = 0 AS passed FROM ($union)"
    },

    // the oracle's windowed row_number IS the single-partition
    // formulation denseIds exists to avoid
    "x_assign_ids" ->
      ("SELECT doc_id, source, " +
        "CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn " +
        "FROM documents"),

    "x_quantile_bins" ->
      ("WITH r AS (SELECT event_id, value, " +
        "row_number() OVER (ORDER BY value, event_id) AS rn, " +
        "count(*) OVER () AS n FROM events) " +
        s"SELECT CAST(floor((rn - 1) * $BIN_COUNT / n) AS BIGINT) AS bin, " +
        "CAST(count(*) AS BIGINT) AS n_rows, " +
        "min(value) AS min_value, max(value) AS max_value " +
        "FROM r GROUP BY 1"),

    // decimal-exact moments, double arithmetic in the SAME shape as
    // the Spark side (x_stats_corr's merge-order-stability trick)
    "x_feature_scale" ->
      ("WITH m AS (SELECT event_type AS g, count(*) AS n, " +
        "sum(CAST(value AS DECIMAL(18,6))) AS sx, " +
        "sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sxx " +
        "FROM events GROUP BY 1), " +
        "st AS (SELECT g, CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean, " +
        "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "/ (CAST(n AS DOUBLE) - 1)) AS std FROM m) " +
        "SELECT event_id, event_type, value, " +
        "CASE WHEN std = 0 OR std IS NULL THEN NULL " +
        "ELSE (value - mean) / std END AS z " +
        "FROM events e JOIN st ON e.event_type = st.g"),

    "x_impute" ->
      ("WITH e AS (SELECT event_id, event_type, " +
        "CASE WHEN event_id % 23 = 0 THEN NULL ELSE value END AS value " +
        "FROM events), " +
        "m AS (SELECT event_type AS g, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / " +
        "CAST(count(value) AS DOUBLE) AS g_mean FROM e GROUP BY 1) " +
        "SELECT event_id, event_type, " +
        "coalesce(value, g_mean) AS value_imputed, " +
        "value IS NULL AS was_null " +
        "FROM e JOIN m ON e.event_type = m.g"),

    // exact interpolated percentiles on both engines (Spark
    // `percentile`, DuckDB `quantile_cont`) — same (n-1)*q rank
    // convention, so the gate computes on identical doubles
    "x_anomaly_mad" ->
      ("WITH med AS (SELECT event_type AS g, quantile_cont(value, 0.5) AS med " +
        "FROM events GROUP BY 1), " +
        "stats AS (SELECT g, min(med) AS med, " +
        "quantile_cont(abs(value - med), 0.5) AS mad " +
        "FROM events e JOIN med ON e.event_type = med.g GROUP BY g) " +
        "SELECT e.event_id, e.event_type, e.value FROM events e " +
        "JOIN stats s ON e.event_type = s.g " +
        s"WHERE abs(e.value - s.med) > $MAD_CUT * s.mad")
  )
}
