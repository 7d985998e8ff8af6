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

  /** The datasource provider name manifest catalog entries register
    * under (`USING graft-manifest`) — the one string every door
    * (V1 rules, parse-time rewrites, the DSv2 catalog) detects by. */
  val ManifestProvider = "graft-manifest"

  /** The manifest-backed [[FileIndex]]: `listFiles` returns only the
    * files whose recorded stats may match the pushed data filters.
    * Conservative everywhere the stats machinery is — an
    * un-evaluable filter shape simply lists every file, and Spark
    * re-applies every filter on the rows anyway (this index only
    * ever SKIPS provably matchless files). */
  final class ManifestFileIndex(
      spark: SparkSession, val root: String,
      initial: ManifestTable.Snapshot,
      val versionAsOf: Option[Int],
      physicalSchema: StructType) extends FileIndex {

    /** One immutable pin = (snapshot, its file statuses): swapped
      * atomically by [[refresh]], so a query planning concurrently
      * with a refresh sees a CONSISTENT pair — never the new file
      * list against the old status map. Statuses SYNTHESIZE from the
      * manifest's recorded per-file byte sizes (the `bytes:` stat the
      * writer commits with the file list — the Iceberg/Delta
      * `file_size_in_bytes` idea), so planning issues ZERO
      * per-file `getFileStatus` RPCs; only legacy files whose lines
      * predate the bytes field fall back to the FS, and only when a
      * query actually plans them ([[listFiles]] maps candidates, not
      * the table). The synthesized status carries mtime 0 — batch
      * file-source planning reads only path and length (split
      * sizing), never modification time. */
    private final class Pin(val snap: ManifestTable.Snapshot) {
      private lazy val fs = new HPath(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      private val cache =
        new java.util.concurrent.ConcurrentHashMap[String, FileStatus]()
      // per-file, on demand — pin construction (registration, every
      // post-insert refresh) stays O(1): a query planning N candidates
      // decodes N payloads (through the shared content-addressed LRU),
      // never the whole table
      private def recordedBytesOf(f: String): Option[Long] =
        snap.stats.get(f)
          .map(p => graft.operators.ManifestStats.decodeCached(p).bytes)
          .filter(_ >= 0L)
      def statusOf(f: String): FileStatus = {
        val hit = cache.get(f)
        if (hit != null) return hit
        val st = recordedBytesOf(f) match {
          case Some(len) => new FileStatus(len, false, 1,
            128L * 1024 * 1024, 0L, new HPath(root, f))
          case None => fs.getFileStatus(new HPath(root, f))
        }
        cache.putIfAbsent(f, st)
        st
      }
      /** Table size for the optimizer: recorded bytes, plus an FS
        * stat for only the legacy files lacking them. */
      lazy val totalBytes: Long =
        snap.files.map(f =>
          recordedBytesOf(f).getOrElse(statusOf(f).getLen)).sum
      /** Any deletion vector among the pinned files? Once per pin. */
      lazy val hasDv: Boolean = ManifestTable.hasDv(snap)
    }

    @volatile private var pin = new Pin(initial)

    /** The snapshot this index currently serves — what the DV-overlay
      * machinery keys on (same pin as the planned scan, so overlay
      * and file list always agree). */
    private[graft] def pinnedSnapshot: ManifestTable.Snapshot = pin.snap

    /** Does the pinned snapshot carry any deletion vector? Computed
      * once per pin ([[graft.plans.GraftMorReads]] probes this on
      * every query — O(files) once, not per query). */
    private[graft] def pinnedHasDv: Boolean = pin.hasDv

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
        cand.map(p.statusOf).toArray[FileStatus]))
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

    override def sizeInBytes: Long = pin.totalBytes
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

  /** [[ParquetFileFormat]] with the RAW write path disabled: plain
    * `INSERT INTO`/`INSERT OVERWRITE` on the front-door relation
    * routes through [[ManifestWritableRelation.insert]] (the
    * `InsertableRelation` case of Spark's DataSourceAnalysis precedes
    * its HadoopFsRelation case), but any OTHER V1 write shape that
    * falls through to `InsertIntoHadoopFsRelationCommand` would write
    * bare parquet into the table root — files no manifest references,
    * invisible to readers and swept by vacuum. Better a loud refusal
    * at `prepareWrite` (write jobs only — the read side never calls
    * it) than silent data loss. */
  private final class ManifestGuardedParquet extends ParquetFileFormat {
    override def prepareWrite(sparkSession: SparkSession,
                              job: org.apache.hadoop.mapreduce.Job,
                              options: Map[String, String],
                              dataSchema: StructType)
        : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
      throw new UnsupportedOperationException(
        "manifest tables accept plain INSERT INTO (ledgered append) " +
          "and INSERT OVERWRITE (atomic replace) only — this write " +
          "shape would bypass the manifest commit protocol; use the " +
          "ManifestTable Scala API for merges and row-level DML")
  }

  /** The front-door [[HadoopFsRelation]], WRITABLE through the
    * manifest commit protocol: `INSERT INTO` appends (one atomic
    * ledgered commit), `INSERT OVERWRITE` replaces the snapshot
    * ([[ManifestTable.overwrite]]) — never a raw file write into the
    * root. After a successful insert the relation's own pin moves to
    * the new head, so the writing session's next read sees its write
    * (the transactional-table contract); OTHER registrations of the
    * same table keep their pins until refreshed, exactly as for
    * Scala-path writes. Time-travel registrations refuse writes. */
  final class ManifestWritableRelation private[sources] (
      spark: SparkSession, val root: String,
      val versionAsOf: Option[Int],
      private[graft] val idx: ManifestFileIndex,
      private[graft] val physical: StructType)
    extends HadoopFsRelation(idx, StructType(Nil), physical, None,
      new ManifestGuardedParquet, Map.empty)(spark)
    with org.apache.spark.sql.sources.InsertableRelation {
    override def insert(data: DataFrame, overwrite: Boolean): Unit =
      sqlInsert(spark, idx, data, overwrite, physical.fieldNames.toSeq)
  }

  /** The ONE owner of SQL-insert commit semantics, shared by the
    * temp-view `InsertableRelation` path and the catalog-path rewrite
    * rule ([[graft.plans.ManifestInsertCommand]]) — two copies would
    * let the paths drift. Positional alignment under the table's
    * column names (SQL INSERT semantics; the analyzer has already
    * arity-checked and cast the query), ledgered append or atomic
    * overwrite, then: move this registration's own head pin (the
    * writing session's next read sees the write) and invalidate any
    * CACHED plans over the table root (`CACHE TABLE` holds
    * materialized InMemoryRelations that a pin move alone cannot
    * see — Spark's own insert commands recache the same way). */
  private[graft] def sqlInsert(spark: SparkSession, idx: ManifestFileIndex,
                               data: DataFrame, overwrite: Boolean,
                               columnNames: Seq[String]): Unit = {
    require(idx.versionAsOf.isEmpty,
      s"cannot INSERT into a versionAsOf registration of ${idx.root} — " +
        "time travel is read-only; register the head to write")
    sqlInsertAt(spark, idx.root, data, overwrite, columnNames)
    idx.refresh()
    spark.catalog.refreshByPath(idx.root)
  }

  /** The root-addressed core of [[sqlInsert]] — shared with the DSv2
    * door ([[graft.catalog.GraftTable]]), which has no standing
    * FileIndex to re-pin (every v2 analysis builds a fresh pin):
    * positional alignment, the [[BatchIdConf]] ledger contract, and
    * the append/overwrite commit, one owner. */
  private[graft] def sqlInsertAt(spark: SparkSession, root: String,
                                 data: DataFrame, overwrite: Boolean,
                                 columnNames: Seq[String]): Unit = {
    val aligned =
      if (data.columns.toSeq == columnNames) data
      else data.toDF(columnNames.toIndexedSeq: _*)
    withBatchId(spark) {
      case Some(_) if overwrite => throw new IllegalArgumentException(
        s"$BatchIdConf applies to INSERT INTO and MERGE INTO only — " +
          "INSERT OVERWRITE is not a replayable micro-batch shape")
      case Some(id) => ManifestTable.appendBatch(spark, root, id, aligned)
      case None =>
        if (overwrite) ManifestTable.overwrite(spark, root, aligned)
        else ManifestTable.append(spark, root, aligned)
    }
  }

  /** Session conf carrying the ledger batch id for an idempotent SQL
    * write (the Delta `txnVersion` idea, public pattern): when set,
    * the next `MERGE INTO` or `INSERT INTO` on a manifest table
    * commits under `#batch:<id>` — a replay with the same id finds
    * the marker and no-ops. AUTO-RESET after each write (applied or
    * no-oped), so a stale id can never silently swallow an unrelated
    * later write. `INSERT OVERWRITE` refuses it: an overwrite is not
    * a replayable micro-batch shape. */
  val BatchIdConf = "spark.graft.sql.batchId"

  /** Read-and-consume the [[BatchIdConf]] around one SQL write: the
    * conf resets whether the write applies or no-ops, and a
    * non-numeric value fails before any data moves. */
  private def withBatchId[A](spark: SparkSession)
                            (f: Option[Long] => A): A = {
    val batchId = spark.conf.getOption(BatchIdConf).map { raw =>
      scala.util.Try(raw.trim.toLong).getOrElse(throw
        new IllegalArgumentException(
          s"$BatchIdConf must be a long, got '$raw'"))
    }
    try f(batchId)
    finally batchId.foreach(_ => spark.conf.unset(BatchIdConf))
  }

  private def requireHead(idx: ManifestFileIndex, verb: String): Unit =
    require(idx.versionAsOf.isEmpty,
      s"cannot $verb a versionAsOf registration of ${idx.root} — " +
        "time travel is read-only; register the head to write")

  /** Shared post-write bookkeeping for every SQL write shape: move
    * THIS registration's pin to the new head (the writing session's
    * next read sees its write) and invalidate cached plans over the
    * table root — same contract as [[sqlInsert]]. */
  private def afterSqlWrite(spark: SparkSession,
                            idx: ManifestFileIndex): Unit = {
    idx.refresh()
    spark.catalog.refreshByPath(idx.root)
  }

  /** Should SQL deletes on this table run merge-on-read? The
    * `#dvmode:` table declaration ([[ManifestTable.setMorDeletes]]). */
  private def sqlDeletesAreMoR(idx: ManifestFileIndex): Boolean =
    ManifestTable.latest(idx.root).exists(ManifestTable.morDeletes)

  /** The ONE owner of SQL `DELETE FROM` semantics: the ledgered
    * copy-on-write [[ManifestTable.deleteWhere]] (victim scan pruned
    * by the predicate through bounds + Blooms) — or, on a table
    * declared merge-on-read ([[ManifestTable.setMorDeletes]]), the
    * deletion-vector [[ManifestTable.deleteWhereMoR]], which rewrites
    * NO data file — then the shared pin move + cache invalidation. */
  private[graft] def sqlDelete(spark: SparkSession, idx: ManifestFileIndex,
                               predicate: org.apache.spark.sql.Column)
      : Unit = {
    requireHead(idx, "DELETE FROM")
    if (sqlDeletesAreMoR(idx))
      ManifestTable.deleteWhereMoR(spark, idx.root, predicate)
    else ManifestTable.deleteWhere(spark, idx.root, predicate)
    afterSqlWrite(spark, idx)
  }

  /** SQL `DELETE FROM … WHERE [p AND] <membership terms>` — each
    * term a `c IN (SELECT …)` or equality-correlated `[NOT] EXISTS`
    * conjunct: [[ManifestTable.deleteWhereTerms]] (merge-on-read
    * twin under `#dvmode:`) under the same guards — the subqueries
    * arrive as unbounded values frames. */
  private[graft] def sqlDeleteIn(spark: SparkSession,
                                 idx: ManifestFileIndex,
                                 residue: Option[org.apache.spark.sql.Column],
                                 terms: Seq[ManifestTable.MembershipTerm])
      : Unit = {
    requireHead(idx, "DELETE FROM")
    if (sqlDeletesAreMoR(idx))
      ManifestTable.deleteWhereTermsMoR(spark, idx.root, residue, terms)
    else ManifestTable.deleteWhereTerms(spark, idx.root, residue, terms)
    afterSqlWrite(spark, idx)
  }

  /** SQL `UPDATE … WHERE [p AND] <membership terms>`:
    * [[ManifestTable.updateWhereTerms]] under the same guards. */
  private[graft] def sqlUpdateIn(spark: SparkSession,
                                 idx: ManifestFileIndex,
                                 residue: Option[org.apache.spark.sql.Column],
                                 terms: Seq[ManifestTable.MembershipTerm],
                                 assignments: Seq[(String,
                                   org.apache.spark.sql.Column)]): Unit = {
    requireHead(idx, "UPDATE")
    ManifestTable.updateWhereTerms(spark, idx.root, residue, terms,
      assignments.toMap)
    afterSqlWrite(spark, idx)
  }

  /** The ONE owner of SQL `UPDATE` semantics:
    * [[ManifestTable.updateWhere]] under the same guards. */
  private[graft] def sqlUpdate(spark: SparkSession, idx: ManifestFileIndex,
                               predicate: org.apache.spark.sql.Column,
                               assignments: Seq[(String,
                                 org.apache.spark.sql.Column)]): Unit = {
    requireHead(idx, "UPDATE")
    ManifestTable.updateWhere(spark, idx.root, predicate,
      assignments.toMap)
    afterSqlWrite(spark, idx)
  }

  /** The ONE owner of SQL upsert-shaped `MERGE INTO` semantics
    * (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT
    * *`): whole-row replace-or-insert by the ON key through
    * [[ManifestTable.upsert]] — or [[ManifestTable.upsertBatch]] when
    * [[BatchIdConf]] is set, making the merge ledgered and a replay a
    * no-op. The conf auto-resets afterward in BOTH outcomes. */
  private[graft] def sqlMergeUpsert(spark: SparkSession,
                                    idx: ManifestFileIndex, idCol: String,
                                    updates: DataFrame): Unit = {
    requireHead(idx, "MERGE INTO")
    withBatchId(spark) {
      case Some(id) =>
        ManifestTable.upsertBatch(spark, idx.root, id, idCol, updates)
      case None => ManifestTable.upsert(spark, idx.root, idCol, updates)
    }
    afterSqlWrite(spark, idx)
  }

  /** The ONE owner of GENERAL SQL `MERGE INTO` semantics — every
    * shape beyond the whole-row upsert and key-list-delete fast
    * paths: conditional/partial `WHEN MATCHED THEN UPDATE/DELETE`,
    * conditional `WHEN NOT MATCHED THEN INSERT`, and `WHEN NOT
    * MATCHED BY SOURCE` clauses, through the copy-on-write
    * [[ManifestTable.mergeInto]]. [[BatchIdConf]] makes it ledgered
    * exactly as the upsert shape. */
  private[graft] def sqlMergeInto(spark: SparkSession,
                                  idx: ManifestFileIndex,
                                  idCols: Seq[String],
                                  source: DataFrame,
                                  sourceKeys: Seq[org.apache.spark.sql.Column],
                                  matched: Seq[ManifestTable.WhenMatched],
                                  notMatched: Seq[ManifestTable.WhenNotMatched],
                                  notMatchedBySource:
                                    Seq[ManifestTable.WhenMatched],
                                  refreshPin: Boolean = true): Unit = {
    requireHead(idx, "MERGE INTO")
    withBatchId(spark) { id =>
      ManifestTable.mergeInto(spark, idx.root, idCols, source, sourceKeys,
        matched, notMatched, notMatchedBySource, batchId = id)
    }
    // a SCHEMA-EVOLVING merge widened the table: this plan's pinned
    // index belongs to the pre-evolution registration (its refresh
    // would rightly trip the drift guard) and the catalog entry was
    // already refreshed in place — only the cached-plan invalidation
    // remains to do
    if (refreshPin) afterSqlWrite(spark, idx)
    else spark.catalog.refreshByPath(idx.root)
  }

  /** The ONE owner of SQL delete-shaped `MERGE INTO` semantics
    * (`WHEN MATCHED THEN DELETE`, no other clauses): delete target
    * rows whose ON key appears in the source —
    * [[ManifestTable.deleteIds]], whose victim scan prunes per key
    * for driver-sized id sets. A set [[BatchIdConf]] must be
    * CONSUMED here like every other MERGE shape (a stale id left
    * behind could silently no-op an unrelated later write): with an
    * id, the delete routes through the general
    * [[ManifestTable.mergeInto]] with a matched-DELETE clause, whose
    * commit carries the ledger marker — a replayed batch no-ops. */
  private[graft] def sqlMergeDelete(spark: SparkSession,
                                    idx: ManifestFileIndex, idCol: String,
                                    victims: DataFrame): Unit = {
    requireHead(idx, "MERGE INTO")
    withBatchId(spark) {
      case Some(id) =>
        // single-col by contract; dedup like deleteIds does — key
        // multiplicity is meaningless for a delete
        val keyed = victims.toDF("mergekey").distinct()
        ManifestTable.mergeInto(spark, idx.root, Seq(idCol),
          keyed, Seq(org.apache.spark.sql.functions.col("mergekey")),
          matched = Seq(ManifestTable.WhenMatched(None,
            ManifestTable.MergeDelete)),
          batchId = Some(id))
        ()
      case None =>
        ManifestTable.deleteIds(spark, idx.root, idCol, victims)
        ()
    }
    afterSqlWrite(spark, idx)
  }

  /** The bare front-door relation (physical schema, no rename
    * projection) — what the SQL machinery plans and what
    * [[ManifestSource]] serves out of the persistent catalog. */
  private[sources] def baseRelation(spark: SparkSession, root: String,
                                    versionAsOf: Option[Int])
      : ManifestWritableRelation =
    baseRelationAt(spark, root, versionAsOf,
      resolveSnapshot(root, versionAsOf))

  private def baseRelationAt(spark: SparkSession, root: String,
                             versionAsOf: Option[Int],
                             snap: ManifestTable.Snapshot)
      : ManifestWritableRelation = {
    val (physical, _) = ManifestTable.readShapeOf(
      ManifestTable.recordedSchemaOf(spark, root, snap),
      ManifestTable.colmapOfSnap(snap))
    val idx = new ManifestFileIndex(spark, root, snap, versionAsOf,
      physical)
    new ManifestWritableRelation(spark, root, versionAsOf, idx, physical)
  }

  // ---- merge-on-read overlay for the SQL doors ----

  /** True while THIS THREAD is building a manifest relation or its DV
    * overlay: the injected [[graft.plans.GraftMorReads]] rule must
    * not fire on the internal analyses those constructions trigger
    * (it would recurse / double-wrap). */
  private val constructing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  private[graft] def underConstruction: Boolean = constructing.get()

  private[graft] def guardedConstruction[A](f: => A): A = {
    val prev = constructing.get()
    constructing.set(true)
    try f finally constructing.set(prev)
  }

  /** The DELETION-VECTOR overlay over a planned manifest frame:
    * select `cols` plus the parquet file/row-position metadata,
    * anti-join the pinned snapshot's DV rows, and project back to
    * exactly `cols` — the same shape every Scala read plans inside
    * [[ManifestTable]], expressed over the SQL relation (pushed
    * filters still reach the scan THROUGH the left side of the
    * anti-join). */
  private def withDvOverlay(spark: SparkSession, root: String,
                            snap: ManifestTable.Snapshot,
                            base: DataFrame,
                            cols: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val abs = "__graft_abs"
    val pos = "__graft_pos"
    val wide = base.select(cols ++ Seq(
      org.apache.spark.sql.functions.col("_metadata.file_path").as(abs),
      org.apache.spark.sql.functions.col("_metadata.row_index").as(pos))
      : _*)
    ManifestTable.overlayDv(spark, root,
      ManifestTable.dvRefsOf(snap, snap.files), wide, abs, pos)
      .drop(abs, pos)
  }

  /** Overlay an already-analyzed V1 manifest [[org.apache.spark.sql
    * .execution.datasources.LogicalRelation]] (the persistent-catalog
    * resolution path) with its pinned snapshot's deletion vectors —
    * the plan [[graft.plans.GraftMorReads]] swaps in. `rel` may be
    * the [[ManifestWritableRelation]] itself OR the plain
    * `HadoopFsRelation` copy Spark's FindDataSourceTable leaves (the
    * copy keeps the [[ManifestFileIndex]], which carries everything
    * the overlay needs). Output attributes re-alias under the
    * original exprIds so parents keep resolving (the same pattern as
    * the DSv2 read swap). */
  private[graft] def dvOverlayFor(spark: SparkSession,
                                  idx: ManifestFileIndex,
                                  rel: org.apache.spark.sql.sources
                                    .BaseRelation,
                                  original: org.apache.spark.sql.catalyst
                                    .plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    guardedConstruction {
      import org.apache.spark.sql.catalyst.expressions.Alias
      val snap = idx.pinnedSnapshot
      val base = spark.baseRelationToDataFrame(rel)
      val overlaid = withDvOverlay(spark, idx.root, snap, base,
        original.output.map(a =>
          org.apache.spark.sql.functions.col(a.name)))
      val analyzed0 = overlaid.queryExecution.analyzed
      // Catalog.refreshTable walks the resolved plan and does an
      // UNGUARDED catalogTable.get on every LogicalRelation leaf —
      // a catalog-resolved original carries its CatalogTable, so
      // every relation inside the overlay (the re-read table AND the
      // DV sidecar scan, whose cache identity IS this table) must
      // carry it too, or refreshTable dies on None.get
      val analyzed = original match {
        case olr: org.apache.spark.sql.execution.datasources
          .LogicalRelation if olr.catalogTable.isDefined =>
          analyzed0.transform {
            case ilr: org.apache.spark.sql.execution.datasources
              .LogicalRelation if ilr.catalogTable.isEmpty =>
              ilr.copy(catalogTable = olr.catalogTable)
          }
        case _ => analyzed0
      }
      val resolver = spark.sessionState.conf.resolver
      val aligned = original.output.map { out =>
        val src = analyzed.output.find(a => resolver(a.name, out.name))
          .getOrElse(throw new IllegalStateException(
            s"column '${out.name}' missing from the DV-overlaid " +
              s"manifest relation at ${idx.root}"))
        Alias(src, out.name)(exprId = out.exprId,
          qualifier = out.qualifier)
      }
      org.apache.spark.sql.catalyst.plans.logical.Project(aligned,
        analyzed)
    }

  /** The manifest table as a DataFrame whose SCAN prunes on pushed
    * filters — the composable form ([[register]] wraps it in a temp
    * view). `versionAsOf` pins time travel. A snapshot carrying
    * deletion vectors gets the overlay applied HERE (one resolution
    * serves pin and overlay), so the frame is correct even in a
    * session without the graft extensions. */
  def relation(spark: SparkSession, root: String,
               versionAsOf: Option[Int] = None): DataFrame =
    guardedConstruction {
      val snap = resolveSnapshot(root, versionAsOf)
      val (_, projection) = ManifestTable.readShapeOf(
        ManifestTable.recordedSchemaOf(spark, root, snap),
        ManifestTable.colmapOfSnap(snap))
      val rel = baseRelationAt(spark, root, versionAsOf, snap)
      val base = spark.baseRelationToDataFrame(rel)
      if (!ManifestTable.hasDv(snap))
        projection.fold(base)(p => base.select(p: _*))
      else
        withDvOverlay(spark, root, snap, base,
          projection.getOrElse(
            base.columns.toSeq.map(org.apache.spark.sql.functions.col)))
    }

  /** Register the manifest table as `name` for `spark.sql` access —
    * the SQL twin of [[ManifestTable.read]], with planning-time file
    * pruning under pure SQL. Re-register to move the snapshot pin.
    * On an un-renamed table the view is the bare insertable relation,
    * so `INSERT INTO name ...` / `INSERT OVERWRITE ...` write through
    * the ledgered commit; a rename-chained table registers its
    * coalesce projection, which SQL cannot insert through (the Scala
    * writers remain the write path there). */
  def register(spark: SparkSession, name: String, root: String,
               versionAsOf: Option[Int] = None): Unit =
    relation(spark, root, versionAsOf).createOrReplaceTempView(name)

  /** PERSISTENT registration: a real catalog entry (HMS-backed under
    * `Graft.enableSql(persistent = true)`'s session wiring) that
    * survives the JVM — `USING graft-manifest` with the table root as
    * its path, resolved back through [[ManifestSource]] on every
    * session, each resolution pinning the THEN-current head. The
    * catalog stores the schema at registration; a schema-changing
    * commit (new column, rename, drop, widen) needs a re-register,
    * the same contract as [[ManifestFileIndex.refresh]]. A
    * rename-chained table persists as `<name>_store` (the physical
    * relation) plus a VIEW `name` applying the coalesce projection —
    * read-only; an un-renamed table persists directly as `name`,
    * SQL-insertable. Time travel is session business (a pin, not an
    * identity) — `versionAsOf` is intentionally absent here. */
  /** Backtick-quote an identifier for splicing into SQL text: each
    * dot-separated part is escaped, so reserved words, hyphens, and
    * case-odd names resolve to exactly the named object instead of
    * failing the parse or resolving elsewhere. A literal dot INSIDE a
    * part is out of contract (dots are the multipart separator —
    * Spark's own `spark.table(name)` parses them the same way). */
  private def quotedId(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`")
      .mkString(".")

  def registerPersistent(spark: SparkSession, name: String,
                         root: String): Unit = {
    val snap = resolveSnapshot(root, None)
    val (_, projection) = ManifestTable.readShapeOf(
      ManifestTable.recordedSchemaOf(spark, root, snap),
      ManifestTable.colmapOfSnap(snap))
    // a same-named temp view would shadow the catalog entry
    spark.catalog.dropTempView(name)
    // drop WHATEVER shape a previous registration left under a name:
    // a rename on the table flips the registration shape from a bare
    // TABLE `name` to `name_store` + VIEW `name` (and a fresh root
    // under a reused name can flip it back) — DROP TABLE refuses
    // views and vice versa, so probe the catalog for the right verb
    def dropAnyShape(objName: String): Unit = {
      if (spark.catalog.tableExists(objName)) {
        val isView = scala.util.Try(
          spark.catalog.getTable(objName).tableType == "VIEW")
          .getOrElse(false)
        if (isView) spark.sql(s"DROP VIEW IF EXISTS ${quotedId(objName)}")
        else spark.sql(s"DROP TABLE IF EXISTS ${quotedId(objName)}")
      }
      ()
    }
    // Re-registration publishes under a TEMP name first, then
    // drop-old + rename-new: the expensive step (createTable resolves
    // the provider relation — snapshot read, schema build) happens
    // OUTSIDE the unavailability window, which shrinks to two catalog
    // round-trips. Session-catalog DDL has no transactional swap
    // (Spark's own CREATE OR REPLACE paths share the residual
    // window), so a reader racing those two statements can still see
    // the name absent for a moment — documented on registerManifest.
    def createTable(tableName: String): Unit = {
      val tmp = s"${tableName}_reg_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      spark.catalog.createTable(tmp, "graft-manifest",
        Map("path" -> root))
      try {
        dropAnyShape(tableName)
        spark.sql(s"ALTER TABLE ${quotedId(tmp)} " +
          s"RENAME TO ${quotedId(tableName)}")
        ()
      } catch {
        case t: Throwable =>
          scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS ${quotedId(tmp)}"))
          throw t
      }
    }
    projection match {
      case None =>
        dropAnyShape(s"${name}_store") // stale store from a view-shaped past
        createTable(name)
      case Some(cols) =>
        val store = s"${name}_store"
        createTable(store)
        dropAnyShape(name) // a bare-TABLE past blocks CREATE OR REPLACE VIEW
        // render the coalesce projection to SQL text by analyzing it
        // against the catalog table (resolved NamedExpression.sql is
        // the supported rendering — the registerPersistent model-view
        // pattern, Graft.scala)
        val projected = spark.table(quotedId(store)).select(cols: _*)
        val projSql = projected.queryExecution.analyzed match {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
            p.projectList.map(_.sql).mkString(", ")
          case other => throw new IllegalStateException(
            s"expected a Project over $store, got ${other.nodeName}")
        }
        spark.sql(s"CREATE OR REPLACE VIEW ${quotedId(name)} AS " +
          s"SELECT $projSql FROM ${quotedId(store)}")
        ()
    }
  }
}
