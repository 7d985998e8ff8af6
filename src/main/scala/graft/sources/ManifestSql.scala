package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

import graft.operators.ManifestTable

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
  * registration (or the `versionAsOf` version) — exactly a
  * transactional reader's contract: queries against the view are
  * repeatable while writers commit new versions. `REFRESH TABLE`
  * (routed to [[ManifestFileIndex.refresh]]) moves a HEAD pin to the
  * current head and leaves a `versionAsOf` pin exactly where it is
  * (a time-travel view must never silently start serving head data);
  * re-[[register]] rebuilds everything. Renamed columns read through
  * their `#colmap:` chain (the same coalesce projection as the Scala
  * reads — one shared [[ManifestTable.readShapeOf]] owner);
  * predicates on a renamed column's coalesce are not prunable
  * shapes — compaction normalizes the files and restores pruning, as
  * documented on the rename. */
object ManifestSql {

  /** The manifest-backed [[FileIndex]]: `listFiles` returns only the
    * files whose recorded stats may match the pushed data filters.
    * Conservative everywhere the stats machinery is — an
    * un-evaluable filter shape simply lists every file, and Spark
    * re-applies every filter on the rows anyway (this index only
    * ever SKIPS provably matchless files). */
  final class ManifestFileIndex(
      spark: SparkSession, root: String,
      initial: ManifestTable.Snapshot,
      versionAsOf: Option[Int],
      physicalSchema: StructType) extends FileIndex {

    /** One immutable pin = (snapshot, its lazily-statted file
      * statuses): swapped atomically by [[refresh]], so a query
      * planning concurrently with a refresh sees a CONSISTENT pair —
      * never the new file list against the old status map. Statuses
      * resolve lazily once per pin: the manifest records paths, not
      * sizes, and a per-query stat of every file would tax planning
      * at large file counts. */
    private final class Pin(val snap: ManifestTable.Snapshot) {
      lazy val statuses: Map[String, FileStatus] = {
        val fs = new HPath(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        snap.files.map(f =>
          f -> fs.getFileStatus(new HPath(root, f))).toMap
      }
    }

    @volatile private var pin = new Pin(initial)

    override def rootPaths: Seq[HPath] = Seq(new HPath(root))

    override def partitionSchema: StructType = StructType(Nil)

    override def listFiles(partitionFilters: Seq[Expression],
                           dataFilters: Seq[Expression])
        : Seq[PartitionDirectory] = {
      val p = pin
      val cand =
        if (dataFilters.isEmpty) p.snap.files
        else {
          val cond = dataFilters.reduce(
            org.apache.spark.sql.catalyst.expressions.And)
          ManifestTable.candidatesOf(spark, Some(root), p.snap,
            physicalSchema, cond)
        }
      Seq(PartitionDirectory(InternalRow.empty,
        cand.map(p.statuses).toArray[FileStatus]))
    }

    override def inputFiles: Array[String] =
      pin.snap.files.map(f => s"$root/$f").toArray

    /** REFRESH TABLE: a head-pinned view moves to the current head; a
      * `versionAsOf` view re-reads its OWN version (and fails loudly
      * if retention expired it) — time travel never silently becomes
      * the head. The recorded schema must still match the registered
      * one — a schema-changing commit (rename/drop/widen) needs a
      * re-[[register]], which rebuilds the projection. */
    override def refresh(): Unit = {
      val target = resolveSnapshot(root, versionAsOf)
      val headPhysical = physicalSchemaOf(spark, root, target)
      require(headPhysical == physicalSchema,
        s"manifest schema at $root changed since registration — " +
          "re-register the SQL view to pick up the new projection")
      pin = new Pin(target)
    }

    override def sizeInBytes: Long = pin.statuses.values.map(_.getLen).sum
  }

  private def resolveSnapshot(root: String,
                              versionAsOf: Option[Int])
      : ManifestTable.Snapshot = versionAsOf match {
    case Some(v) => ManifestTable.snapshot(root, v).getOrElse(
      throw new IllegalStateException(
        s"no manifest v$v at $root (never published or expired)"))
    case None => ManifestTable.latest(root).getOrElse(
      throw new IllegalStateException(s"no manifest at $root"))
  }

  /** The physical read schema of a snapshot — the recorded schema
    * plus rename-chain names, from the shared
    * [[ManifestTable.readShapeOf]] owner. */
  private def physicalSchemaOf(spark: SparkSession, root: String,
                               snap: ManifestTable.Snapshot): StructType =
    ManifestTable.readShapeOf(
      ManifestTable.recordedSchemaOf(spark, root, snap),
      ManifestTable.colmapOfSnap(snap))._1

  /** The manifest table as a DataFrame whose SCAN prunes on pushed
    * filters — the composable form ([[register]] wraps it in a temp
    * view). `versionAsOf` pins time travel. */
  def relation(spark: SparkSession, root: String,
               versionAsOf: Option[Int] = None): DataFrame = {
    val snap = resolveSnapshot(root, versionAsOf)
    val (physical, projection) = ManifestTable.readShapeOf(
      ManifestTable.recordedSchemaOf(spark, root, snap),
      ManifestTable.colmapOfSnap(snap))
    val idx = new ManifestFileIndex(spark, root, snap, versionAsOf,
      physical)
    val rel = HadoopFsRelation(
      location = idx,
      partitionSchema = StructType(Nil),
      dataSchema = physical,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    val base = spark.baseRelationToDataFrame(rel)
    projection.fold(base)(p => base.select(p: _*))
  }

  /** Register the manifest table as `name` for `spark.sql` access —
    * the SQL twin of [[ManifestTable.read]], with planning-time file
    * pruning under pure SQL. Re-register to move the snapshot pin. */
  def register(spark: SparkSession, name: String, root: String,
               versionAsOf: Option[Int] = None): Unit =
    relation(spark, root, versionAsOf).createOrReplaceTempView(name)
}
