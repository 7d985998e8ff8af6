package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

import graft.functions.Text
import graft.operators.{Curation, Dedup, Joins, Layout, Multimodal, Similarity, Skew, Temporal}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Windowed events + Structured Streaming twins: tumbling/
  * sliding/session windows, stateful dedup/enrich/join, funnels,
  * sessionization, EWMA, best-n-per-key.
  *
  * One wiring object per operator family (query + its DuckDB
  * oracle side by side); [[Extensions]] concatenates the
  * families. Shared constants/helpers live in [[ExtShared]].
  */
private[graft] object ExtStreaming {
  import ExtShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- events: windowed aggregation (batch) + streaming twin ----
    "x_window_tumbling" -> ((s, dir) =>
      EventWindows.tumblingHourly(Tables.scan(s, dir, "events"))),

    "x_window_sliding" -> ((s, dir) =>
      EventWindows.slidingHourly(Tables.scan(s, dir, "events"))),

    "x_window_session" -> ((s, dir) =>
      EventWindows.sessions(Tables.scan(s, dir, "events"), "10 minutes")),

    "x_stream_tumbling" -> ((s, dir) =>
      EventWindows.streamingTumblingHourly(s, dir)),

    "x_stream_sliding" -> ((s, dir) =>
      EventWindows.streamingSlidingHourly(s, dir)),

    "x_stream_session" -> ((s, dir) =>
      EventWindows.streamingSessions(s, dir, "10 minutes")),

    // stream-static enrichment join: stream side vs a STATIC dim —
    // no join state on either side (the missing member of the
    // streaming-join matrix next to the stream-stream interval join)
    "x_stream_enrich" -> ((s, dir) =>
      EventWindows.streamingEnrich(s, dir)),

    // production-emission twin: append mode, sessions emitted once
    // when the watermark closes them; stream-tail sessions stay open
    // by design and the oracle excludes exactly those
    "x_stream_session_append" -> ((s, dir) =>
      EventWindows.streamingSessionsAppend(s, dir, "10 minutes")),

    // append-mode tumbling twin: hourly windows emitted once when the
    // watermark closes them; the stream-tail windows stay open
    "x_stream_tumbling_append" -> ((s, dir) =>
      EventWindows.streamingTumblingAppend(s, dir)),

    "x_stream_dedup" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamingDedup(s, dir)),

    // bounded-state variant: state entries expire behind the
    // watermark horizon. The correctness fixture's synthetic ingest
    // span (1 s per doc) fits inside the 1-hour horizon, so the
    // output is provably identical to global first-occurrence dedup —
    // which is exactly what the oracle checks; past the horizon the
    // re-emit trade is documented on the operator.
    "x_stream_dedup_bounded" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamingDedupBounded(s, dir)),

    "x_stream_state" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamingUserTotals(s, dir)),

    // exactly-once parquet sink graded END-TO-END: the deduplicated
    // document stream lands on disk via foreachBatch (one overwritten
    // batch_id dir per micro-batch — a replayed batch overwrites its
    // own output instead of appending duplicates; replay idempotence
    // is pinned by StreamingSpec), and the graded result is the
    // parquet READ BACK from the sink, so the whole write path sits
    // under the oracle. The output dir is wiped first: the checkpoint
    // pins file-listing state that must not leak across grading runs.
    "x_stream_sink" -> ((s, dir) => {
      val out = layoutDir(dir, "stream_sink")
      deleteRec(new java.io.File(out))
      graft.streaming.StreamingOps.streamingDedupToParquet(s, dir, out)
        .select("doc_id", "fp")
    }),

    // stream-stream interval join (append mode, watermark-bounded
    // join state): clicks ⋈ same-user purchases ≤ 2 h before
    "x_stream_join" -> ((s, dir) =>
      EventWindows.streamingIntervalJoin(s, dir)),

    // LEFT OUTER twin — the "no match within the window" production
    // shape (abandoned-cart / missing-ack detection): a matchless
    // click is emitted with NULL purchase columns once the watermark
    // proves no future purchase can still join it. Clicks too close
    // to the end of the finite fixture (ts at/after the final
    // watermark) never get that proof and are excluded — the oracle
    // applies the same watermark-closed discipline as the _append
    // window twins.
    "x_stream_join_outer" -> ((s, dir) =>
      EventWindows.streamingIntervalJoin(s, dir,
        queryName = "stream_join_outer", joinType = "left_outer")),


    // ---- event analytics (operators/Analytics.scala) ----
    // ordered-stage funnel: first-touch per stage, stage i+1 counts
    // only at-or-after the user's stage-i time
    // strict-adjacency sequence pattern (MATCH_RECOGNIZE-lite): count
    // non-overlapping view->click->purchase runs of CONSECUTIVE
    // events per user — the adjacency-sensitive twin of the funnel's
    // "eventually after" stages. Ordered code string per user + pure
    // string arithmetic; replace's left-to-right non-overlap IS the
    // match semantics on both engines.
    "x_seq_pattern" -> ((s, dir) =>
      graft.operators.Analytics.sequencePattern(
        Tables.scan(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", FUNNEL_STAGES)),

    "x_funnel" -> ((s, dir) =>
      graft.operators.Analytics.funnel(
        Tables.scan(s, dir, "events"),
        "user_id", "ts", "event_type", FUNNEL_STAGES)),

    // windowed-conversion twin: each stage must land within 24h of
    // the previous one — "converted within a day", not "eventually"
    "x_funnel_window" -> ((s, dir) =>
      graft.operators.Analytics.funnel(
        Tables.scan(s, dir, "events"),
        "user_id", "ts", "event_type", FUNNEL_STAGES,
        maxGapSec = Some(FUNNEL_GAP_SEC))),

    // best-3 purchases per user through the bounded-heap aggregator —
    // map-side partials move O(users × 3) rows, no per-group sort
    // (the window twin's plan); output identical to row_number ≤ 3
    "x_topn_group_agg" -> ((s, dir) =>
      graft.operators.Analytics.topNPerKey(
        Tables.scan(s, dir, "events")
          .filter(F.col("event_type") === "purchase"),
        "user_id", "event_id", "value", n = 3)),

    // truncated EWMA trend per user over purchase values — the
    // parallel-window formulation of the sequential recurrence
    "x_ewma" -> ((s, dir) =>
      graft.operators.Analytics.ewma(
        Tables.scan(s, dir, "events")
          .filter(F.col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id", "value", EWMA_ALPHA, EWMA_DEPTH)),


    // event-grain sessionization: every event labeled with its user's
    // session ordinal (10-minute gap) — the raw-event twin of the
    // session_window aggregate
    "x_sessionize" -> ((s, dir) =>
      graft.operators.Analytics.sessionize(
        Tables.scan(s, dir, "events")
          .select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", gapSec = 600L))
  )

  def oracleSql: Map[String, String] = Map(
    "x_window_tumbling" ->
      ("SELECT make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) AS w_start, " +
        "event_type, count(*) AS n, sum(value) AS sum_value FROM events " +
        "GROUP BY 1, 2"),

    "x_window_sliding" ->
      ("WITH expanded AS (" +
        "SELECT make_timestamp((epoch_ns(ts) // 1800000000000) * 1800000000) AS w_start, " +
        "event_type, value FROM events UNION ALL " +
        "SELECT make_timestamp(((epoch_ns(ts) // 1800000000000) - 1) * 1800000000) AS w_start, " +
        "event_type, value FROM events) " +
        "SELECT w_start, event_type, count(*) AS n, sum(value) AS sum_value " +
        "FROM expanded GROUP BY 1, 2"),

    "x_window_session" -> sessionGaiSql,

    // the streaming twin drains to the identical merged sessions
    "x_stream_session" -> sessionGaiSql,

    "x_stream_session_append" -> sessionAppendSql,

    // batch tumbling restricted to watermark-closeable windows
    // (window end <= max(ts) - watermark delay)
    "x_stream_tumbling_append" ->
      ("WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events) " +
        "SELECT make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) AS w_start, " +
        "event_type, count(*) AS n, sum(value) AS sum_value FROM events, wm " +
        "WHERE make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) " +
        "+ INTERVAL 1 HOUR <= wm.w " +
        "GROUP BY 1, 2"),

    // the oracle is the equivalent batch join — stream-static joins
    // are exactly-once over a finite fixture
    "x_stream_enrich" ->
      ("SELECT c_mktsegment, count(*) AS n_purchases, " +
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "WHERE event_type = 'purchase' GROUP BY 1"),

    "x_stream_tumbling" ->
      ("SELECT make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) AS w_start, " +
        "event_type, count(*) AS n, sum(value) AS sum_value FROM events " +
        "GROUP BY 1, 2"),

    "x_stream_state" ->
      ("SELECT user_id, count(*) AS n_events, sum(value) AS sum_value " +
        "FROM events GROUP BY user_id"),

    "x_stream_sliding" ->
      ("WITH expanded AS (" +
        "SELECT make_timestamp((epoch_ns(ts) // 1800000000000) * 1800000000) AS w_start, " +
        "event_type, value FROM events UNION ALL " +
        "SELECT make_timestamp(((epoch_ns(ts) // 1800000000000) - 1) * 1800000000) AS w_start, " +
        "event_type, value FROM events) " +
        "SELECT w_start, event_type, count(*) AS n, sum(value) AS sum_value " +
        "FROM expanded GROUP BY 1, 2"),

    "x_stream_dedup" ->
      ("SELECT min(doc_id) AS doc_id, fp FROM (SELECT doc_id, " +
        "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents) GROUP BY fp"),

    // the sink's read-back must equal the batch dedup — the same
    // contract as x_stream_dedup, now proven THROUGH the parquet
    // files the foreachBatch sink wrote
    "x_stream_sink" ->
      ("SELECT min(doc_id) AS doc_id, fp FROM (SELECT doc_id, " +
        "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents) GROUP BY fp"),

    // same first-occurrence semantics within the horizon (the
    // fixture's ingest span fits inside it — see the query comment)
    "x_stream_dedup_bounded" ->
      ("SELECT min(doc_id) AS doc_id, fp FROM (SELECT doc_id, " +
        "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents) GROUP BY fp"),

    "x_stream_join" ->
      ("SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts, " +
        "p.event_id AS purchase_id, p.ts AS purchase_ts, " +
        "p.value AS p_value " +
        "FROM events c JOIN events p ON c.event_type = 'click' " +
        "AND p.event_type = 'purchase' AND p.user_id = c.user_id " +
        "AND p.ts BETWEEN c.ts - INTERVAL 2 HOUR AND c.ts"),

    // LEFT OUTER twin: matched rows are the inner result verbatim;
    // a matchless click appears (NULL purchase columns) only when
    // the final watermark passed its ts — the no-match proof
    // Structured Streaming needs before a null emission, since a
    // purchase may join at-or-before the click's own timestamp.
    // The watermark replay is exact: Catalyst pushes the
    // event-type filter BELOW each side's watermark node, so each
    // side tracks only its own substream's max event time
    // (millisecond-floored, the engine's watermark unit) and the
    // global watermark is the MIN of the two sides minus the
    // 10-minute delay. Matchless clicks at/after that point never
    // get their proof on a finite stream and are excluded on both
    // engines (boundary verified empirically against the running query).
    "x_stream_join_outer" ->
      ("WITH wmc AS (SELECT make_timestamp(((epoch_ns(max(ts)) // 1000000) - 600000) * 1000) AS w " +
        "FROM events WHERE event_type = 'click'), " +
        "wmp AS (SELECT make_timestamp(((epoch_ns(max(ts)) // 1000000) - 600000) * 1000) AS w " +
        "FROM events WHERE event_type = 'purchase'), " +
        "wm AS (SELECT least((SELECT w FROM wmc), (SELECT w FROM wmp)) AS w) " +
        "SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts, " +
        "p.event_id AS purchase_id, p.ts AS purchase_ts, " +
        "p.value AS p_value " +
        "FROM events c LEFT JOIN events p ON " +
        "p.event_type = 'purchase' AND p.user_id = c.user_id " +
        "AND p.ts BETWEEN c.ts - INTERVAL 2 HOUR AND c.ts " +
        "WHERE c.event_type = 'click' AND (p.event_id IS NOT NULL " +
        "OR c.ts < (SELECT w FROM wm))"),

    "x_seq_pattern" -> {
      // mirror the operator's FULL-NAME code assignment: stage i is
      // chr('a'+i), everything else '.'
      val code = FUNNEL_STAGES.zipWithIndex
        .map { case (t, i) => s"WHEN '$t' THEN '${('a' + i).toChar}'" }
        .mkString("CASE event_type ", " ", " ELSE '.' END")
      val pat = FUNNEL_STAGES.indices.map(i => ('a' + i).toChar).mkString
      "WITH s AS (SELECT user_id, " +
        s"string_agg($code, '' ORDER BY ts, event_id) AS seq " +
        "FROM events GROUP BY user_id) " +
        "SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events, " +
        s"CAST((length(seq) - length(replace(seq, '$pat', ''))) / ${pat.length} " +
        "AS BIGINT) AS n_matches FROM s"
    },

    "x_funnel" ->
      ("WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "s1 AS (SELECT s0.user_id, min(t0) AS t0, " +
        "min(CASE WHEN e.ts >= t0 THEN e.ts END) AS t1 " +
        "FROM s0 LEFT JOIN events e ON e.user_id = s0.user_id " +
        "AND e.event_type = 'click' GROUP BY 1), " +
        "s2 AS (SELECT s1.user_id, min(t0) AS t0, min(t1) AS t1, " +
        "min(CASE WHEN e.ts >= t1 THEN e.ts END) AS t2 " +
        "FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
        "AND e.event_type = 'purchase' GROUP BY 1), " +
        funnelTailSql),

    // same chain with the 24h conversion window on each hop — the
    // CASE window mirrors the Spark side's unix_micros bound
    "x_funnel_window" ->
      ("WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "s1 AS (SELECT s0.user_id, min(t0) AS t0, " +
        s"min(CASE WHEN e.ts >= t0 AND date_diff('microseconds', t0, e.ts) <= CAST($FUNNEL_GAP_SEC AS BIGINT) * 1000000 THEN e.ts END) AS t1 " +
        "FROM s0 LEFT JOIN events e ON e.user_id = s0.user_id " +
        "AND e.event_type = 'click' GROUP BY 1), " +
        "s2 AS (SELECT s1.user_id, min(t0) AS t0, min(t1) AS t1, " +
        s"min(CASE WHEN e.ts >= t1 AND date_diff('microseconds', t1, e.ts) <= CAST($FUNNEL_GAP_SEC AS BIGINT) * 1000000 THEN e.ts END) AS t2 " +
        "FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
        "AND e.event_type = 'purchase' GROUP BY 1), " +
        funnelTailSql),

    "x_sessionize" ->
      ("WITH e AS (SELECT event_id, user_id, ts, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR date_diff('microseconds', lag(ts) OVER w, ts) > 600 * 1000000 " +
        "THEN 1 ELSE 0 END AS f FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT event_id, user_id, ts, " +
        "CAST(sum(f) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS session_seq FROM e"),

    // the window formulation IS the oracle — identical output, the
    // aggregator only changes the PLAN
    "x_topn_group_agg" ->
      ("SELECT user_id, rnk, event_id, value FROM (" +
        "SELECT user_id, CAST(row_number() OVER (PARTITION BY user_id " +
        "ORDER BY value DESC, event_id ASC) AS BIGINT) AS rnk, " +
        "event_id, value FROM events WHERE event_type = 'purchase') " +
        "WHERE rnk <= 3"),

    "x_ewma" -> {
      // weights inlined at full double round-trip precision; the
      // numerator/denominator chains are LEFT-associated on both
      // engines, so the doubles match bit-for-bit
      val terms = (0 until EWMA_DEPTH).map { j =>
        val wj = (EWMA_ALPHA * math.pow(1 - EWMA_ALPHA, j)).toString
        val l = if (j == 0) "value" else s"lag(value, $j) OVER w"
        (s"CASE WHEN $l IS NOT NULL THEN $wj * $l ELSE 0.0 END",
          s"CASE WHEN $l IS NOT NULL THEN $wj ELSE 0.0 END")
      }
      "SELECT event_id, user_id, ts, value, " +
        s"(${terms.map(_._1).mkString(" + ")}) / " +
        s"(${terms.map(_._2).mkString(" + ")}) AS ewma " +
        "FROM events WHERE event_type = 'purchase' " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    }
  )
}
