package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.ManifestTable

/** SUBSCRIBE to a [[ManifestTable]]'s change data feed — the
  * micro-batch reader over [[ManifestTable.changes]]: a durable
  * VERSION WATERMARK (one tiny checkpoint file) records the last
  * delivered version, and every [[drain]] delivers the commits
  * published since as per-version file-diff batches, batchId = the
  * TO version. A downstream pipeline subscribes to a manifest table
  * exactly the way the CDC-apply stack consumes its feed:
  *
  * {{{
  * ManifestChangeFeed.drain(spark, srcRoot, ckpt) { (batch, id) =>
  *   ManifestTable.appendBatch(spark, sinkRoot, id, batch) // or upsertBatch
  * }
  * }}}
  *
  * Delivery is AT-LEAST-ONCE with stable batch ids: the watermark
  * advances only AFTER `apply` returns, so a crash between apply and
  * the advance re-delivers that version with the SAME id — paired
  * with an id-ledgered sink ([[ManifestTable.appendBatch]]/
  * [[ManifestTable.upsertBatch]], the gen-store sinks) the pipeline
  * is exactly-once end to end, the same contract Structured
  * Streaming's `foreachBatch` gives. Batch COST scales with each
  * version's changed files only ([[ManifestTable.changes]]); the
  * feed's lookback is bounded by manifest retention
  * ([[ManifestTable.expireManifests]]) and data-file retention
  * ([[ManifestTable.vacuum]]) exactly like time travel — size the
  * drain cadence inside both. Single subscriber per checkpoint dir
  * (one watermark), like any streaming query's checkpoint.
  *
  * NOT SUBSCRIBABLE: signature/IVF store roots
  * ([[graft.operators.SignatureStore]]/[[graft.operators.IvfStore]])
  * — their purge/compaction maintenance eagerly expires all but the
  * newest manifest and vacuums with zero grace, so a subscriber more
  * than one version behind fails its next drain on the retention
  * pre-check. Subscribe to pipeline corpus tables, whose retention
  * the operator controls. */
object ManifestChangeFeed {

  private def conf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def wmPath(checkpointDir: String): HPath =
    new HPath(checkpointDir, "version_watermark")

  // the session-less overloads serve ad-hoc inspection; [[drain]]
  // itself threads its OWN session's config, so the watermark and the
  // feed always resolve through the same filesystem even from a
  // thread with no active session (getActiveSession is thread-local)
  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf)

  /** The last DELIVERED version (None before the first drain). */
  def watermark(checkpointDir: String): Option[Int] =
    watermarkWith(fsOf(wmPath(checkpointDir)), checkpointDir)

  private def watermarkWith(fs: FileSystem,
                            checkpointDir: String): Option[Int] = {
    val p = wmPath(checkpointDir)
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }.toOption
  }

  /** Advance the watermark via write-temp-then-rename — the manifest
    * commit pattern, so the published file is always complete: a
    * crash mid-write leaves only the temp (the next drain reads the
    * OLD watermark and re-delivers from it — ordinary at-least-once),
    * never a truncated watermark that silently replays the ENTIRE
    * feed. Local/HDFS renames need the stale target removed first;
    * a crash in that sliver leaves NO watermark — full re-drain,
    * which ledgered sinks no-op and plain sinks absorb as the same
    * at-least-once contract every drain already carries. */
  private def writeWatermark(fs: FileSystem, checkpointDir: String,
                             v: Int): Unit = {
    val p = wmPath(checkpointDir)
    fs.mkdirs(new HPath(checkpointDir))
    val tmp = new HPath(checkpointDir,
      s".version_watermark.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      // FileSystem.rename refuses an existing target on some schemes
      // (local included) — drop the stale watermark and retry once
      fs.delete(p, false)
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"could not publish watermark $p (rename refused twice)")
      }
    }
  }

  /** Deliver every version published after the watermark (or after
    * `fromVersion` on the first drain) to `apply`, one file-diff
    * batch per version in order, advancing the watermark after each.
    * Returns the delivered version ids (empty = nothing new). A
    * version whose FROM side has been expired fails loudly with the
    * retention contract ([[ManifestTable.changes]] pre-checks). */
  def drain(spark: SparkSession, root: String, checkpointDir: String,
            fromVersion: Int = 0)
           (apply: (DataFrame, Long) => Unit): Seq[Long] = {
    val fs = wmPath(checkpointDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val head = ManifestTable.latest(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root")).version
    val start = watermarkWith(fs, checkpointDir).getOrElse(fromVersion)
    val delivered = ((start + 1) to head).map { v =>
      apply(ManifestTable.changes(spark, root, v - 1, v), v.toLong)
      writeWatermark(fs, checkpointDir, v)
      v.toLong
    }
    delivered
  }
}
