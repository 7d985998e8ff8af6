package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation,
  CreatableRelationProvider, DataSourceRegister, RelationProvider,
  SchemaRelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.operators.{ManifestStats, ManifestTable}

/** `USING graft-manifest` — the DataSource V1 provider that lets
  * [[graft.operators.ManifestTable]] roots live in a PERSISTENT
  * catalog (Hive metastore): the catalog entry stores only the
  * provider name and the table root; every session that resolves it
  * gets a fresh [[ManifestSql.ManifestWritableRelation]] pinned to
  * the table's then-current head — pruned, snapshot-isolated,
  * SQL-insertable, across JVM restarts.
  *
  * Options:
  *  - `path` (required): the manifest table root;
  *  - `versionAsOf` (optional, ad-hoc reads only): pin a published
  *    version. Persistent entries never carry it — time travel is a
  *    session-level pin, not a catalog identity.
  *
  * Catalog-resolved reads arrive through the
  * [[SchemaRelationProvider]] arm (Spark passes the schema stored at
  * registration): a table whose recorded schema has since evolved
  * fails LOUDLY with a re-register instruction instead of serving the
  * stale projection — the same pin contract as
  * `ManifestFileIndex.refresh`. Nullability-only drift is tolerated
  * (every recorded field is nullable by construction). */
final class ManifestSource extends RelationProvider
  with SchemaRelationProvider with CreatableRelationProvider
  with StreamSinkProvider
  with org.apache.spark.sql.sources.StreamSourceProvider
  with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest requires a 'path' option (the manifest table root)"))

  // ---- STREAMING READ arm (r19): the table itself as a source ----
  // `spark.readStream.table("graft.default.t")` (through the DSv2
  // door's V1 fallback) or `.format("graft-manifest").option("path",
  // root)` streams the table's INSERT-ROW FEED: every row any commit
  // ADDED, in the table's own schema — appends deliver whole batches,
  // row-level updates/merges deliver their rewritten rows (the Delta
  // `ignoreChanges` contract, here the default and documented),
  // compaction delivers nothing. `readChangeFeed=true` serves the
  // full change rows instead (`_change_type`/`_commit_version` —
  // exactly format "graft-cdf", which this arm delegates to, offsets,
  // rate limiting, and restart monotonicity included).

  private def readChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.trim.equalsIgnoreCase("true"))

  private def tableSchema(spark: org.apache.spark.sql.SparkSession,
                          root: String): StructType = {
    val full = CdfStreamSource.changeSchema(spark, root)
    StructType(full.fields.dropRight(2)) // minus _change_type/_commit_version
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val root = rootOf(parameters)
    (shortName(),
      if (readChangeFeed(parameters))
        CdfStreamSource.changeSchema(sqlContext.sparkSession, root)
      else tableSchema(sqlContext.sparkSession, root))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val cdf = new CdfStreamSource().createSource(sqlContext,
      metadataPath, None, "graft-cdf", parameters - "readChangeFeed")
    if (readChangeFeed(parameters)) cdf
    else new ManifestSource.InsertFeedSource(cdf,
      tableSchema(sqlContext.sparkSession, rootOf(parameters)))
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String])
      : BaseRelation =
    ManifestSql.baseRelation(sqlContext.sparkSession,
      rootOf(parameters), parameters.get("versionAsOf").map(_.trim.toInt))

  /** The WRITE arm ([[CreatableRelationProvider]]): makes
    * `df.write.format("graft-manifest").option("path", root)` and
    * SQL `CREATE TABLE … USING graft-manifest OPTIONS (path …) AS
    * SELECT …` first-class — a table is CREATED (manifest init +
    * first ledgered append) or written through the existing commit
    * protocol, never as raw files. SaveMode maps exactly onto the
    * ledger ops: ErrorIfExists refuses an existing manifest, Ignore
    * no-ops one, Append appends (creating if absent), Overwrite
    * replaces the snapshot atomically (creating if absent).
    *
    * Creation-time declarations ride options: `statCols` /
    * `bloomCols` (comma-separated) and `bloomCapacity` — the same
    * knobs as [[ManifestTable.init]]. On an EXISTING table they
    * refuse loudly: stats/bloom shape is a table declaration, not a
    * per-write preference (recompact/re-init to change it). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    require(parameters.get("versionAsOf").isEmpty,
      "cannot write through a versionAsOf option — time travel is " +
        "read-only")
    def csv(k: String): Seq[String] = parameters.get(k).toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
    val statCols = csv("statCols")
    val bloomCols = csv("bloomCols")
    val bloomCap = parameters.get("bloomCapacity").map(_.trim.toLong)
    val exists = ManifestTable.latest(root).isDefined
    if (exists)
      require(statCols.isEmpty && bloomCols.isEmpty && bloomCap.isEmpty,
        s"statCols/bloomCols/bloomCapacity are creation-time " +
          s"declarations and the manifest table at $root already " +
          "exists — drop/re-init the table to change its stat shape")
    // PREDICATE OVERWRITE: mode(Overwrite) + a 'replaceWhere' option
    // (a SQL boolean expression) replaces exactly the matching rows
    // with the batch in one ledgered commit (ManifestTable
    // .overwriteWhere — pruned victim scan, new rows must satisfy
    // the predicate). The daily-partition-reload shape.
    val replaceWhere = parameters.get("replaceWhere").map(_.trim)
      .filter(_.nonEmpty)
    require(replaceWhere.isEmpty || mode == SaveMode.Overwrite,
      "'replaceWhere' applies to mode(\"overwrite\") only")
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"manifest table at $root already exists (SaveMode." +
            "ErrorIfExists) — use mode(\"append\") or mode(\"overwrite\")")
      case SaveMode.Ignore if exists => ()
      case _ =>
        if (!exists)
          ManifestTable.init(root, statCols, bloomCols,
            bloomCap.getOrElse(ManifestStats.BloomKeyCapacity))
        (mode, replaceWhere) match {
          case (SaveMode.Overwrite, Some(cond)) if exists =>
            ManifestTable.overwriteWhere(spark, root,
              org.apache.spark.sql.functions.expr(cond), data)
          case (SaveMode.Overwrite, _) if exists =>
            ManifestTable.overwrite(spark, root, data)
          case _ => ManifestTable.append(spark, root, data)
        }
        // cached plans over the root must not serve the pre-write
        // snapshot (same contract as the SQL insert path)
        spark.catalog.refreshByPath(root)
    }
    ManifestSql.baseRelation(spark, root, None)
  }

  /** The STREAMING WRITE arm ([[StreamSinkProvider]]):
    * `df.writeStream.format("graft-manifest").option("path", root)` —
    * every output mode commits through the `#batch:<id>` ledger, so
    * engine-level batch replays no-op (exactly-once without
    * `foreachBatch`). See [[ManifestStreamSink]] for the mode →
    * ledger-op mapping and the one-ledger-per-table contract. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val root = rootOf(parameters)
    require(parameters.get("versionAsOf").isEmpty,
      "cannot write through a versionAsOf option — time travel is " +
        "read-only")
    require(partitionColumns.isEmpty,
      "graft-manifest does not partition by directory — cluster the " +
        "table with compact(clusterBy) / GRAFT COMPACT ... CLUSTER BY " +
        "instead")
    val mergeKey = parameters.get("mergeKey").map(_.trim).filter(_.nonEmpty)
    require(outputMode != OutputMode.Update() || mergeKey.isDefined,
      "update mode replace-or-inserts by key — pass a 'mergeKey' " +
        "option naming the merge column")
    require(outputMode == OutputMode.Update() || mergeKey.isEmpty,
      s"'mergeKey' applies to update mode only (got $outputMode)")
    def csv(k: String): Seq[String] = parameters.get(k).toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
    // the checkpoint LOCATION travels to the sink; the fingerprint
    // itself resolves lazily at the first batch from the STREAMING
    // QUERY ID the engine persists inside the checkpoint — a
    // wiped-and-recreated checkpoint at the same path gets a fresh id
    // and refuses loudly instead of silently no-opping new batches
    // below the old ledger watermark
    new ManifestStreamSink(sqlContext.sparkSession, root, outputMode,
      mergeKey, csv("statCols"), csv("bloomCols"),
      parameters.get("bloomCapacity").map(_.trim.toLong),
      parameters.get("checkpointLocation").map(_.trim))
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String],
                              schema: StructType): BaseRelation = {
    val rel = createRelation(sqlContext, parameters)
    require(rel.schema.fieldNames.toSeq == schema.fieldNames.toSeq &&
      rel.schema.fields.map(_.dataType).toSeq ==
        schema.fields.map(_.dataType).toSeq,
      s"manifest table at ${rootOf(parameters)} has evolved since its " +
        "catalog registration (registered " +
        s"${schema.simpleString}, current ${rel.schema.simpleString}) — " +
        "re-register the catalog entry to pick up the new projection")
    rel
  }
}

object ManifestSource {

  /** The insert-row feed: the change feed filtered to `insert` rows
    * and projected back to the table's own schema — plan-level
    * transformations of the underlying streaming-marked micro-batch
    * frame, so laziness and the streaming marker carry. Offsets,
    * rate limiting, restart monotonicity, and retention checks all
    * belong to the wrapped CDF source. */
  private final class InsertFeedSource(
      underlying: org.apache.spark.sql.execution.streaming.Source,
      tableSchema: StructType)
    extends org.apache.spark.sql.execution.streaming.Source {
    import org.apache.spark.sql.{functions => F}
    override def schema: StructType = tableSchema
    override def getOffset = underlying.getOffset
    override def getBatch(
        start: Option[org.apache.spark.sql.execution.streaming.Offset],
        end: org.apache.spark.sql.execution.streaming.Offset)
        : DataFrame =
      underlying.getBatch(start, end)
        .filter(F.col("_change_type") === "insert")
        .select(tableSchema.fieldNames.toIndexedSeq.map(F.col): _*)
    override def commit(
        end: org.apache.spark.sql.execution.streaming.Offset): Unit =
      underlying.commit(end)
    override def stop(): Unit = underlying.stop()
  }
}
