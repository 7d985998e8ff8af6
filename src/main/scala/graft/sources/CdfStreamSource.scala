package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession,
  functions => F}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.operators.ManifestTable

/** `spark.readStream.format("graft-cdf")` — the manifest change feed
  * as a REAL Structured Streaming source: triggers, checkpointed
  * offsets, query management, `foreachBatch` sinks — everything the
  * drain-loop API ([[graft.streaming.ManifestChangeFeed]]) could not
  * give a downstream pipeline.
  *
  * OFFSET = the manifest VERSION (one long — the same watermark the
  * drain loop persists, here owned by the streaming checkpoint's
  * offset log). A micro-batch covering versions (a, b] is the union
  * of [[ManifestTable.changes]](v−1, v) for each v, every row tagged
  * `_commit_version` — so per-commit attribution survives Spark's
  * range batching and the stream's total content equals the batch
  * feed's, whatever the trigger cadence. Batch cost scales with each
  * version's changed files only.
  *
  * Options:
  *  - `path` (required): the manifest table root;
  *  - `fromVersion` (default 0): versions ≤ this are never delivered
  *    (0 = the whole feed since init);
  *  - `maxVersionsPerTrigger` (default unbounded): cap the versions
  *    one micro-batch covers — a cold subscriber to a long-lived
  *    table then pages through history instead of planning one
  *    union over every version ever published. The cap's frontier
  *    persists in the source's own metadata dir and is written
  *    before each offer, so offsets stay monotone across restarts
  *    (a capped re-offer can never rewind below a committed offset).
  *
  * Delivery is the engine's exactly-once-offsets + at-least-once
  * side effects: a crashed micro-batch REPLAYS with the same batchId
  * — pair the sink with the manifest's own ledgered writers
  * (`appendBatch`/`upsertBatch` in `foreachBatch`) for exactly-once
  * end to end, the same contract the drain loop documents. Retention
  * bounds the lookback exactly like time travel: a restart whose
  * checkpointed offset predates [[ManifestTable.expireManifests]] /
  * [[ManifestTable.vacuum]] retention fails loudly on the changes()
  * pre-check. Like the drain loop, signature/IVF store roots are not
  * subscribable (their maintenance eagerly expires the lookback). */
final class CdfStreamSource extends StreamSourceProvider
  with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdf requires a 'path' option (the manifest table root)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(),
      CdfStreamSource.changeSchema(sqlContext.sparkSession,
        rootOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new CdfStreamSource.CdfSource(sqlContext.sparkSession,
      rootOf(parameters), metadataPath,
      parameters.get("fromVersion").map(_.trim.toInt).getOrElse(0),
      parameters.get("maxVersionsPerTrigger").map(_.trim.toInt))
}

object CdfStreamSource {

  /** The stream's row shape: the table's LOGICAL schema (rename
    * chains coalesced — identical to [[ManifestTable.changes]]'s
    * output) + `_change_type` + `_commit_version`. Pinned at stream
    * creation, like any source schema. */
  private[sources] def changeSchema(spark: SparkSession,
                                    root: String): StructType = {
    val snap = ManifestTable.latest(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
    val logical = ManifestTable.recordedSchemaOf(spark, root, snap)
    StructType(logical.fields.map(_.copy(nullable = true)) ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }

  private final class CdfSource(spark: SparkSession, root: String,
                                metadataPath: String, fromVersion: Int,
                                maxVersionsPerTrigger: Option[Int])
    extends Source {

    maxVersionsPerTrigger.foreach(m => require(m > 0,
      s"maxVersionsPerTrigger must be positive, got $m"))

    private val pinnedSchema = changeSchema(spark, root)

    override def schema: StructType = pinnedSchema

    // ---- offered-offset log (rate limiting that survives restart) --
    // The offset the source last OFFERED persists in the source's own
    // metadata dir and is written BEFORE getOffset returns (the
    // FileStreamSource pattern): offsets are then monotone across
    // restarts by construction — a capped cold re-offer can never
    // land BELOW an offset the engine already committed, which would
    // re-deliver versions under NEW batch ids (the one shape a
    // ledgered sink cannot no-op). The log is APPEND-ONLY and carries
    // the value in the file NAME (`max_offered.<version>`, content
    // irrelevant): recovery reads the max over the listing, so no
    // state ever needs deleting or renaming on the offer path — a
    // crash at any point leaves either the old set or the old set
    // plus one higher marker, both monotone. (The previous
    // delete-then-rename single file had a crash window that erased
    // the log entirely and let a capped restart re-offer below a
    // committed offset.) Markers BELOW the new max are garbage, not
    // state — pruned best-effort after each advance.
    private def metaDir = new org.apache.hadoop.fs.Path(metadataPath)
    private def fs = metaDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    private val MarkerPrefix = "max_offered."
    // pre-r18 checkpoints wrote the value INTO this single file
    private def legacyOfferedPath =
      new org.apache.hadoop.fs.Path(metadataPath, "max_offered_version")

    private def readOffered(): Option[Int] = {
      val markers = scala.util.Try {
        fs.listStatus(metaDir).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith(MarkerPrefix))
          .flatMap(n => scala.util.Try(
            n.stripPrefix(MarkerPrefix).toInt).toOption)
      }.getOrElse(Nil)
      val legacy = scala.util.Try {
        val in = fs.open(legacyOfferedPath)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim.toInt
        finally in.close()
      }.toOption
      (markers ++ legacy).reduceOption(_ max _)
    }

    private def writeOffered(v: Int): Unit = {
      fs.mkdirs(metaDir)
      val marker = new org.apache.hadoop.fs.Path(metaDir,
        s"$MarkerPrefix$v")
      // overwrite=true keeps a same-version re-offer idempotent; the
      // name alone carries the value, so a partial create is still a
      // valid marker
      fs.create(marker, true).close()
      // prune superseded markers (and the legacy file) — pure garbage
      // collection: losing this step never loses the frontier
      scala.util.Try {
        fs.listStatus(metaDir).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(MarkerPrefix) &&
            scala.util.Try(n.stripPrefix(MarkerPrefix).toInt)
              .toOption.exists(_ < v))
            fs.delete(st.getPath, false)
        }
        fs.delete(legacyOfferedPath, false)
      }
      ()
    }

    private def versionOf(o: OffsetV1): Int = o match {
      case l: LongOffset => l.offset.toInt
      case other => other.json.trim.toInt // SerializedOffset (WAL replay)
    }

    override def getOffset: Option[OffsetV1] = {
      val head = ManifestTable.latest(root).getOrElse(
        throw new IllegalStateException(s"no manifest at $root")).version
      val offered = readOffered()
      val base = math.max(offered.getOrElse(fromVersion), fromVersion)
      val next = maxVersionsPerTrigger
        .map(m => math.min(head, base + m)).getOrElse(head)
      if (next > base) {
        writeOffered(next) // durable BEFORE the engine sees the offer
        Some(LongOffset(next.toLong))
      } else if (offered.isDefined) {
        // RE-OFFER the persisted frontier: the offered log is written
        // before the engine durably records the offer, so a crash in
        // that window leaves offered > committed — returning None here
        // would strand the gap (committed, offered] until some future
        // commit raises the head. Offering `base` is free when the
        // engine is caught up (equal offset = no-op) and builds the
        // gap batch when it is behind.
        Some(LongOffset(base.toLong))
      } else None
    }

    /** One per-version frame, CONFORMED to the pinned source schema:
      * a column added to the table after the stream started is
      * dropped (the subscription serves the schema it was created
      * with — restart from a fresh checkpoint to widen); a pinned
      * column missing from an OLD version's frame (the stream pinned
      * at a later schema, e.g. a capped cold subscriber paging
      * through pre-evolution history) null-fills, exactly as a batch
      * read of those files would; and a pinned column gone from the
      * HEAD schema too (rename/drop landed mid-stream) fails loudly
      * with the re-subscribe instruction instead of wedging every
      * retry on a union mismatch — null-filling THAT would silently
      * blank renamed data. */
    private def conformed(v: Int): DataFrame = {
      val part = ManifestTable.changes(spark, root, v - 1, v)
        .withColumn("_commit_version", F.lit(v.toLong))
      val have = part.columns.toSet
      val missing = pinnedSchema.fields.filterNot(f => have(f.name))
      if (missing.nonEmpty) {
        val headCols = ManifestTable.recordedSchemaOf(spark, root,
          ManifestTable.latest(root).getOrElse(throw
            new IllegalStateException(s"no manifest at $root")))
          .fieldNames.toSet ++ Set("_change_type", "_commit_version")
        val gone = missing.map(_.name).filterNot(headCols)
        if (gone.nonEmpty) throw new IllegalStateException(
          s"manifest table at $root no longer serves column(s) " +
            s"${gone.mkString(",")} the stream pinned at creation " +
            "(a rename/drop landed mid-stream) — re-subscribe with a " +
            "fresh checkpoint to pick up the new schema")
      }
      part.select(pinnedSchema.fields.map(f =>
        if (have(f.name)) F.col(f.name)
        else F.lit(null).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    }

    override def getBatch(start: Option[OffsetV1],
                          end: OffsetV1): DataFrame = {
      val lo = start.map(versionOf).getOrElse(fromVersion)
      val hi = versionOf(end)
      val parts = ((lo + 1) to hi).map(conformed)
      val batch = parts.reduceLeftOption(_.unionByName(_)).getOrElse(
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          pinnedSchema))
      // the engine requires getBatch's frame to be streaming-marked;
      // execution stays lazy inside the micro-batch
      org.apache.spark.sql.graftbridge.asStreamingFrame(spark, batch)
    }

    override def stop(): Unit = ()
  }
}
