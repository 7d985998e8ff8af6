package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, graftbridge}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{ManifestStats, ManifestTable}

/** `df.writeStream.format("graft-manifest")` — the manifest table as
  * a REAL Structured Streaming sink, exactly-once WITHOUT
  * `foreachBatch` boilerplate: every mode commits through the
  * `#batch:<micro-batch-id>` ledger in the same atomic publish as its
  * file-list change, so the engine's at-least-once batch replays
  * (crash recovery, speculative re-fires) no-op against the marker.
  * The natural twin of the `graft-cdf` SOURCE: a pipeline can now be
  * manifest-to-manifest end to end under plain `readStream` →
  * `writeStream`.
  *
  * Modes:
  *  - `append`: each micro-batch is a ledgered append
  *    ([[ManifestTable.appendBatch]]);
  *  - `update`: each micro-batch replace-or-inserts by the REQUIRED
  *    `mergeKey` option ([[ManifestTable.upsertBatch]]) — the
  *    streaming CDC apply shape, subject to upsert's documented
  *    match-scan envelope (declare the key a bloom column, or
  *    cluster by it);
  *  - `complete`: each micro-batch atomically replaces the table
  *    ([[ManifestTable.overwriteBatch]]) — the streaming-aggregation
  *    full-result shape; history stays time-travel-readable and old
  *    files become ordinary vacuum orphans.
  *
  * Table creation and declarations follow the batch writer exactly:
  * an absent table is initialized on the first batch with the
  * `statCols` / `bloomCols` / `bloomCapacity` options; on an existing
  * table those options refuse loudly (a table declaration, not a
  * per-write preference).
  *
  * ONE LEDGER PER TABLE — ENFORCED: micro-batch ids are the
  * CHECKPOINT's identity, so the sink's first commit records a
  * fingerprint of its checkpoint location beside the batch ledger
  * (`#sinkckpt:` — [[ManifestTable.claimSinkCheckpoint]]). A
  * restarted query (same checkpoint — including a WIPED one at the
  * same location, whose id-0 replays still no-op) re-claims
  * idempotently; a SECOND query or a RELOCATED checkpoint, whose
  * restarted ids would otherwise silently no-op as replays of
  * long-committed batches, refuses loudly at its first batch. A
  * query with no explicit `checkpointLocation` option carries no
  * fingerprint and keeps the documented hand-rolled-`foreachBatch`
  * contract (ledger no-ops, caller's responsibility).
  *
  * The micro-batch frame re-wraps over its own incremental execution
  * ([[graftbridge.asBatchFrame]]) — planning a fresh query over a
  * streaming-marked plan would throw — and materializes exactly once
  * inside the ledgered writer. */
private[sources] final class ManifestStreamSink(
    spark: SparkSession, root: String, mode: OutputMode,
    mergeKey: Option[String], statCols: Seq[String],
    bloomCols: Seq[String], bloomCap: Option[Long],
    checkpointFp: Option[String]) extends Sink {

  // a restarted query re-passes its creation options every time, so
  // a MATCHING re-declaration on an existing table is idempotent and
  // accepted; only a CONFLICTING shape refuses (same spirit as the
  // batch writer's creation-time contract — the stat shape is the
  // table's declaration, never a per-write preference)
  ManifestTable.latest(root).foreach { snap =>
    val (dStat, dBloom, dCap) = ManifestTable.declaredStatShape(snap)
    require((statCols.isEmpty || statCols == dStat) &&
      (bloomCols.isEmpty || bloomCols == dBloom) &&
      (bloomCap.isEmpty || bloomCap.contains(dCap)),
      s"statCols/bloomCols/bloomCapacity are creation-time " +
        s"declarations and the manifest table at $root already " +
        s"exists with a different shape (statCols=${dStat.mkString(",")}" +
        s" bloomCols=${dBloom.mkString(",")} bloomCapacity=$dCap) — " +
        "drop/re-init the table to change it")
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the micro-batch frame's OWN session (the streaming query's
    // session clone), not the construction-time one: per-query SQL
    // conf (session timezone, shuffle partitions set for the stream)
    // must govern the ledgered write — the Delta-sink convention
    val session = data.sparkSession
    val df = graftbridge.asBatchFrame(session, data)
    if (ManifestTable.latest(root).isEmpty)
      ManifestTable.init(root, statCols, bloomCols,
        bloomCap.getOrElse(ManifestStats.BloomKeyCapacity))
    // replay-identity: this query's checkpoint must own the ledger
    // BEFORE any batch id is interpreted against it
    checkpointFp.foreach(ManifestTable.claimSinkCheckpoint(root, _))
    if (mode == OutputMode.Append())
      ManifestTable.appendBatch(session, root, batchId, df)
    else if (mode == OutputMode.Update())
      ManifestTable.upsertBatch(session, root, batchId, mergeKey.get, df)
    else
      ManifestTable.overwriteBatch(session, root, batchId, df)
    // cached plans over the root must not serve the pre-batch
    // snapshot (same contract as every other write path)
    session.catalog.refreshByPath(root)
  }

  override def toString: String = s"ManifestSink[$root, $mode]"
}
