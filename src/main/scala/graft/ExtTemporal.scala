package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Temporal joins and versioned state: as-of, range, interval
  * joins, SCD2 build/lookup, CDC apply (batch + streaming).
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtTemporal {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- temporal joins over events ----
    // as-of join: each click carries the most recent purchase (ts,
    // value) by the same user at-or-before its timestamp
    "x_asof_join" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      Temporal.asofJoin(
        ev.filter(F.col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") === "purchase")
          .select("user_id", "ts", "value"),
        "user_id", "ts", "value", prefix = "purchase")
    }),


    // SCD2 dimension versioning: each user's purchases become validity
    // intervals (valid_from/valid_to/version/is_current) — the
    // dimension-history builder; one keyed window pass, size-preserving
    "x_scd2" -> ((s, dir) =>
      Temporal.scd2(
        Tables.scan(s, dir, "events")
          .filter(F.col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id")),


    // the consuming query SCD2 exists for: clicks joined to the
    // purchase-history dimension on ts ∈ [valid_from, valid_to) —
    // "which version of the user's state was current when this event
    // happened". Half-open intervals so boundary facts match exactly
    // one version; inner join (clicks before a user's first purchase
    // have no covering version and drop out on both engines).
    "x_scd2_lookup" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      val dim = Temporal.scd2(
        ev.filter(F.col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id")
        .select(F.col("user_id"), F.col("valid_from"), F.col("valid_to"),
          F.col("version"), F.col("value").as("dim_value"))
      Temporal.scd2Lookup(
        ev.filter(F.col("event_type") === "click")
          .select(F.col("event_id").as("click_id"), F.col("user_id"),
            F.col("ts").as("click_ts")),
        dim, "user_id", "click_ts")
        .select("click_id", "user_id", "click_ts", "version", "dim_value",
          "valid_from")
    }),


    // bucketed range join: clicks within ±5 min of each error event,
    // per user (zero-neighbor errors included)
    "x_range_join" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      Temporal.rangeCountJoin(
        ev.filter(F.col("event_type") === "error")
          .select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") === "click")
          .select("user_id", "ts"),
        "event_id", "user_id", "ts", RANGE_WINDOW_SEC)
    }),


    // CDC apply: fold a synthetic change feed (deletes, updates,
    // inserts, and per-key CONFLICTING changes resolved
    // last-writer-wins by version) into the orders snapshot — the
    // log-structured MERGE shape; the snapshot's only work is one
    // broadcast anti-join
    "x_cdc_apply" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      graft.operators.Writes.cdcApply(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        cdcChangeFeed(o), Seq("o_orderkey"), "op", "ver")
    }),


    // streaming twin: the SAME change feed arrives as micro-batches
    // (one file per trigger, conflicts split arbitrarily across
    // batches) and folds into versioned parquet state — final state
    // must equal the batch apply, which is the shared oracle
    "x_stream_cdc" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      val root = layoutDir(dir, "cdc_stream")
      cdcChangeFeed(o).repartition(4)
        .write.mode("overwrite").parquet(s"$root/changes")
      graft.streaming.StreamingOps.streamingCdcApply(s,
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        s"$root/changes", Seq("o_orderkey"), "op", "ver",
        s"$root/state")
    }),


    // interval-overlap join: both sides are variable-length intervals
    // (purchase vs error windows per user) — grid-bucketed equi-join
    // with first-shared-cell dedup, never a theta pair space
    "x_interval_join" -> ((s, dir) => {
      val ev = Tables.scan(s, dir, "events")
      val a = ev.filter(F.col("event_type") === "purchase")
        .select(F.col("event_id").as("a_id"), F.col("user_id"),
          F.col("ts").as("a_start"),
          F.expr(s"ts + INTERVAL $IVAL_A_MIN MINUTES").as("a_end"))
      val b = ev.filter(F.col("event_type") === "error")
        .select(F.col("event_id").as("b_id"), F.col("user_id"),
          F.col("ts").as("b_start"),
          F.expr(s"ts + INTERVAL $IVAL_B_MIN MINUTES").as("b_end"))
      Temporal.intervalJoin(a, b, "user_id",
          "a_start", "a_end", "b_start", "b_end", IVAL_BUCKET_SEC)
        .select("a_id", "b_id", "user_id", "overlap_us")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "x_scd2" ->
      ("SELECT event_id, user_id, ts, value, ts AS valid_from, " +
        "lead(ts) OVER w AS valid_to, " +
        "CAST(row_number() OVER w AS BIGINT) AS version, " +
        "(lead(ts) OVER w IS NULL) AS is_current " +
        "FROM events WHERE event_type = 'purchase' " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"),

    // same versioned dim as a CTE, consumed by the point-in-time
    // interval predicate (half-open, NULL valid_to = current)
    "x_scd2_lookup" ->
      ("WITH dim AS (SELECT user_id, ts AS valid_from, " +
        "lead(ts) OVER w AS valid_to, " +
        "CAST(row_number() OVER w AS BIGINT) AS version, " +
        "value AS dim_value " +
        "FROM events WHERE event_type = 'purchase' " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts, " +
        "d.version, d.dim_value, d.valid_from " +
        "FROM events c JOIN dim d ON c.event_type = 'click' " +
        "AND d.user_id = c.user_id AND c.ts >= d.valid_from " +
        "AND (d.valid_to IS NULL OR c.ts < d.valid_to)"),

    "x_asof_join" ->
      ("WITH p AS (SELECT user_id, ts, max(value) AS pv FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts), " +
        "c AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'click') " +
        "SELECT c.user_id, c.ts, c.event_id, p.ts AS purchase_ts, " +
        "p.pv AS purchase_value " +
        "FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts"),

    "x_range_join" ->
      ("WITH e AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'error'), " +
        "c AS (SELECT user_id, ts AS cts FROM events " +
        "WHERE event_type = 'click') " +
        "SELECT e.event_id, e.user_id, e.ts, count(c.cts) AS n_nearby " +
        s"FROM e LEFT JOIN c ON c.user_id = e.user_id AND c.cts BETWEEN " +
        s"e.ts - INTERVAL $RANGE_WINDOW_SEC SECOND AND " +
        s"e.ts + INTERVAL $RANGE_WINDOW_SEC SECOND " +
        "GROUP BY e.event_id, e.user_id, e.ts"),

    // replays the change-feed construction, the last-writer-wins
    // window, and the apply in plain SQL. The streaming twin must
    // converge to the identical state (versioned merge is
    // batch-split-invariant), so it shares this oracle verbatim.
    "x_cdc_apply" -> cdcApplySql,

    "x_stream_cdc" -> cdcApplySql,

    // the oracle's theta-join IS the O(n²) formulation the grid
    // bucketing exists to avoid — correctness twin, not a plan twin
    "x_interval_join" ->
      (s"WITH a AS (SELECT event_id AS a_id, user_id, ts AS a_start, " +
        s"ts + INTERVAL $IVAL_A_MIN MINUTE AS a_end FROM events " +
        "WHERE event_type = 'purchase'), " +
        s"b AS (SELECT event_id AS b_id, user_id, ts AS b_start, " +
        s"ts + INTERVAL $IVAL_B_MIN MINUTE AS b_end FROM events " +
        "WHERE event_type = 'error') " +
        "SELECT a_id, b_id, a.user_id AS user_id, " +
        "date_diff('microseconds', greatest(a_start, b_start), " +
        "least(a_end, b_end)) AS overlap_us " +
        "FROM a JOIN b ON a.user_id = b.user_id " +
        "AND a_start < b_end AND b_start < a_end")
  )
}
