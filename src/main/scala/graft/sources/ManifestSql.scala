package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StructField, StructType}

import graft.operators.{ManifestStats, ManifestTable}

/** SQL FRONT DOOR for [[ManifestTable]] — a pruned, snapshot-pinned
  * relation registered in the session catalog, so
  * `spark.sql("SELECT … FROM corpus WHERE doc_id = 7")` plans a
  * stats-pruned scan with snapshot isolation and (optionally) time
  * travel, composing the manifest stack with the SQL/metastore stack.
  *
  * Design: a custom [[FileIndex]] over Spark's own parquet
  * `HadoopFsRelation` — the seam transactional table formats use
  * publicly (Delta Lake's TahoeFileIndex popularized it). Spark calls
  * `listFiles(partitionFilters, dataFilters)` AT PLANNING TIME with
  * the query's pushed data filters as resolved Catalyst expressions;
  * the index maps them onto the manifest's per-file stats
  * ([[ManifestTable.candidatesOf]] — min/max bounds, null counts,
  * prefix intervals AND the per-file Bloom side index), so the
  * planned scan lists only candidate files. Everything downstream is
  * stock Spark: vectorized parquet readers, row-group pushdown,
  * whole-stage codegen — a hand-rolled DataSource-V2 reader factory
  * would repeat the pruning but lose the vectorized exec path.
  *
  * Snapshot semantics: the relation PINS the snapshot current at
  * registration (or `versionAsOf`) — exactly a transactional reader's
  * contract: queries against the view are repeatable while writers
  * commit new versions; re-[[register]] (or `REFRESH TABLE`, which
  * routes to [[ManifestFileIndex.refresh]]) moves the pin to the
  * head. Renamed columns read through their `#colmap:` chain (the
  * same coalesce projection as the Scala reads); predicates on a
  * renamed column's coalesce are not prunable shapes — compaction
  * normalizes the files and restores pruning, as documented on the
  * rename.
  */
object ManifestSql {

  /** The manifest-backed [[FileIndex]]: `listFiles` returns only the
    * files whose recorded stats may match the pushed data filters.
    * Conservative everywhere the stats machinery is — an
    * un-evaluable filter shape simply lists every file, and Spark
    * re-applies every filter on the rows anyway (this index only
    * ever SKIPS provably matchless files). */
  final class ManifestFileIndex(
      spark: SparkSession, root: String,
      @volatile private var snap: ManifestTable.Snapshot,
      physicalSchema: StructType) extends FileIndex {

    private def fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

    // file statuses resolve lazily ONCE per pin (refresh re-stats):
    // the manifest records paths, not sizes — a per-query stat of
    // every file would tax planning at large file counts
    @volatile private var statusCache
        : Option[Map[String, FileStatus]] = None

    private def statuses: Map[String, FileStatus] = {
      statusCache.getOrElse {
        val m = snap.files.map(f =>
          f -> fs.getFileStatus(new HPath(root, f))).toMap
        statusCache = Some(m)
        m
      }
    }

    override def rootPaths: Seq[HPath] = Seq(new HPath(root))

    override def partitionSchema: StructType = StructType(Nil)

    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression])
        : Seq[PartitionDirectory] = {
      val cand =
        if (dataFilters.isEmpty) snap.files
        else {
          val cond = dataFilters.reduce(
            org.apache.spark.sql.catalyst.expressions.And)
          ManifestTable.candidatesOf(spark, Some(root), snap,
            physicalSchema, cond)
        }
      val st = statuses
      Seq(PartitionDirectory(InternalRow.empty,
        cand.map(st).toArray[FileStatus]))
    }

    override def inputFiles: Array[String] =
      snap.files.map(f => s"$root/$f").toArray

    /** Move the pin to the current head (REFRESH TABLE). The
      * recorded schema must still match the registered one — a
      * schema-changing commit (rename/drop/widen) needs a
      * re-[[register]], which rebuilds the projection. */
    override def refresh(): Unit = {
      val head = ManifestTable.latest(root).getOrElse(
        throw new IllegalStateException(s"no manifest at $root"))
      val headPhysical = physicalSchemaOf(spark, root, head)
      require(headPhysical == physicalSchema,
        s"manifest schema at $root changed since registration — " +
          "re-register the SQL view to pick up the new projection")
      snap = head
      statusCache = None
    }

    override def sizeInBytes: Long = statuses.values.map(_.getLen).sum
  }

  /** The physical read schema of a snapshot: the recorded schema
    * (all-nullable) plus the historical names of renamed columns —
    * exactly what the Scala-side snapshot read plans with. */
  private def physicalSchemaOf(spark: SparkSession, root: String,
                               snap: ManifestTable.Snapshot): StructType = {
    val sc = ManifestTable.recordedSchemaOf(spark, root, snap)
    val colmap = ManifestTable.colmapOfSnap(snap)
    val extra = sc.fields.flatMap(f =>
      colmap.getOrElse(f.name, Seq.empty)
        .map(o => StructField(o, f.dataType, nullable = true)))
    StructType(sc.fields.map(_.copy(nullable = true)) ++ extra)
  }

  /** The manifest table as a DataFrame whose SCAN prunes on pushed
    * filters — the composable form ([[register]] wraps it in a temp
    * view). `versionAsOf` pins time travel. */
  def relation(spark: SparkSession, root: String,
               versionAsOf: Option[Int] = None): DataFrame = {
    val snap = versionAsOf match {
      case Some(v) => ManifestTable.snapshot(root, v).getOrElse(
        throw new IllegalStateException(
          s"no manifest v$v at $root (never published or expired)"))
      case None => ManifestTable.latest(root).getOrElse(
        throw new IllegalStateException(s"no manifest at $root"))
    }
    val logical = ManifestTable.recordedSchemaOf(spark, root, snap)
    val physical = physicalSchemaOf(spark, root, snap)
    val colmap = ManifestTable.colmapOfSnap(snap)
    val idx = new ManifestFileIndex(spark, root, snap, physical)
    val rel = HadoopFsRelation(
      location = idx,
      partitionSchema = StructType(Nil),
      dataSchema = physical,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    val base = spark.baseRelationToDataFrame(rel)
    if (colmap.isEmpty) base
    else base.select(logical.fields.toSeq.map { f =>
      colmap.get(f.name) match {
        case Some(olds) =>
          F.coalesce((f.name +: olds).map(F.col): _*).as(f.name)
        case None => F.col(f.name)
      }
    }: _*)
  }

  /** Register the manifest table as `name` for `spark.sql` access —
    * the SQL twin of [[ManifestTable.read]], with planning-time file
    * pruning under pure SQL. Re-register to move the snapshot pin. */
  def register(spark: SparkSession, name: String, root: String,
               versionAsOf: Option[Int] = None): Unit =
    relation(spark, root, versionAsOf).createOrReplaceTempView(name)
}
