package graft.operators

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{Column, SparkSession, functions => F}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-file column statistics for [[ManifestTable]] — the
  * planning-time file-skipping layer (the Iceberg/Delta min-max
  * metrics idea, independently implemented).
  *
  * At WRITE time every committing op records, for each freshly
  * written data file, its row count plus (for the table's declared
  * stat columns) a normalized min/max and null count — ONE aggregate
  * job over only the new files, committed atomically with the file
  * list as `#filestat:` manifest lines. At PLAN time
  * [[ManifestTable.candidateFiles]] evaluates a predicate against
  * each file's bounds and lists only files that MAY contain a match —
  * a 100 TB point delete then opens the handful of candidate files
  * instead of every footer.
  *
  * Both evaluators are strictly conservative:
  *  - [[mayMatch]] answers TRUE on any missing stat, unsupported
  *    predicate shape, type mismatch, or parse failure — pruning is
  *    only ever an optimization, never a semantics change;
  *  - [[mustMatch]] (every row in the file satisfies the predicate —
  *    the metadata-only `count(*)` fast path) answers FALSE on the
  *    same unknowns, and additionally requires a zero null count
  *    (NULL never satisfies a predicate, and min/max alone cannot see
  *    nulls).
  *
  * Normalized value encoding (manifest lines are newline-framed, so
  * raw values never appear unescaped):
  *  - integral/float/double/decimal → plain numeric string
  *    (BigDecimal-comparable; non-finite floats drop the stat);
  *  - date → epoch days, timestamp → epoch micros (numeric);
  *  - timestamp_ntz → fixed-width `yyyy-MM-dd HH:mm:ss.SSSSSS`
  *    (lexicographic = chronological);
  *  - string → the value itself, dropped when longer than
  *    [[MaxStringStat]] chars (bound the manifest size — a long-text
  *    column is not a pruning column);
  * and every min/max is Base64-wrapped in the manifest line, so no
  * value can collide with the line format.
  */
object ManifestStats {

  /** Longest string min/max recorded; longer values drop the stat
    * for that file+column (conservative: the file stays a candidate
    * for every predicate on that column). */
  val MaxStringStat = 64

  /** One stat column's record in one file: the normalized (min, max)
    * — None when the column has NO non-null values in the file (the
    * null-only marker: comparisons prune, min/max skip) — and the
    * exact null count. A column with values whose stat was dropped
    * (oversized string, NaN) records NO entry at all: unknown, always
    * conservative. */
  final case class ColStat(bounds: Option[(String, String)], nulls: Long)

  /** Decoded stats of one data file. `bloomRef` is the root-relative
    * path of the commit's per-file BLOOM sidecar (`blooms.idx`, one
    * `file|col|b64-filter` line per (file, column)) — the file-skipping
    * index for equality/IN predicates whose keys min/max cannot
    * prune (scattered ids). None on pre-bloom files and bloom-less
    * tables; blooms load LAZILY and only for equality-shaped
    * predicates, so the manifest itself stays O(files) small lines.
    * `bytes` is the file's on-disk size, recorded at commit time from
    * the writer's own directory listing (the Iceberg/Delta
    * `file_size_in_bytes` idea): SQL planning and compaction sizing
    * then read sizes from the manifest instead of one
    * `getFileStatus` RPC per file — −1 on pre-r17 lines (legacy
    * files fall back to the FS, and only when actually planned).
    * `dvRef`/`dvRows` are the file's DELETION VECTOR (merge-on-read
    * deletes, r20): `dvRef` names the root-relative `data/<token>`
    * directory holding (file, pos) parquet rows — the positions of
    * this file's deleted rows — and `dvRows` is their exact count.
    * Readers overlay the DV (anti-join on parquet row position);
    * rewrites (compact, copy-on-write DML) fold it away with the
    * payload they replace. None/0 = no deleted rows (every pre-r20
    * line). */
  final case class FileStats(rows: Long, cols: Map[String, ColStat],
                             bloomRef: Option[String] = None,
                             bytes: Long = -1L,
                             dvRef: Option[String] = None,
                             dvRows: Long = 0L)

  /** Per-file-per-column Bloom capacity: filters are sized for this
    * many distinct keys at [[BloomFpp]]; a file whose column exceeds
    * it DROPS the bloom (recording a saturated filter would cost the
    * bytes and prune nothing) — the size cap of the bloom layer,
    * exactly like [[MaxStringStat]] for string bounds. Files beyond
    * the cap stay candidates for every equality predicate; cluster
    * or split such tables to re-enter the envelope. */
  val BloomKeyCapacity: Long = 16384L
  val BloomFpp: Double = 0.01

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** `rows:<n>` then `bytes:<n>` (when known) then
    * `;<col>:<b64min>:<b64max>:<nulls>` per column; a null-only
    * column writes `-` (not a base64 alphabet char) in both bound
    * slots; a bloom side-index reference rides as a
    * `bloomref:<b64 path>` segment ('rows', 'bytes' and 'bloomref'
    * are reserved column names). */
  def encode(fs: FileStats): String =
    ((Seq(s"rows:${fs.rows}") ++
      (if (fs.bytes >= 0) Seq(s"bytes:${fs.bytes}") else Seq.empty) ++
      fs.cols.toSeq.sortBy(_._1).map {
        case (c, ColStat(Some((lo, hi)), nulls)) =>
          s"$c:${b64(lo)}:${b64(hi)}:$nulls"
        case (c, ColStat(None, nulls)) => s"$c:-:-:$nulls"
      }) ++ fs.bloomRef.map(r => s"bloomref:${b64(r)}") ++
      fs.dvRef.map(r => s"dvref:${b64(r)}:${fs.dvRows}")).mkString(";")

  /** CONTENT-ADDRESSED decode cache: repeated planning over the same
    * snapshot (every DML op re-reads the manifest) would otherwise
    * re-parse O(files) payloads per op — at million-file scale that
    * is minutes of driver time for information that never changes.
    * Keyed by the payload STRING ITSELF, the cache can never serve
    * stale stats: equal payload ⇒ equal decode, and a rewritten file
    * gets a new payload line. Bounded by ACCESS-ORDERED (LRU)
    * eviction: at the cap a table bigger than the cache evicts only
    * its coldest payloads instead of dumping ~1M decoded stats and
    * re-decoding the world on the next planning pass. Synchronized
    * map, not a concurrent one — planning is driver-side and the
    * per-hit critical section is a pointer move. */
  private val DecodeCacheMax = 1 << 20
  private val decodeCache: java.util.Map[String, FileStats] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, FileStats](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, FileStats]): Boolean =
          size() > DecodeCacheMax
      })

  /** [[decode]] through the content-addressed cache — the planning
    * hot path ([[ManifestTable.candidateFiles]] and friends). */
  def decodeCached(payload: String): FileStats = {
    val hit = decodeCache.get(payload)
    if (hit != null) return hit
    val v = decode(payload)
    decodeCache.put(payload, v)
    v
  }

  def decode(payload: String): FileStats = {
    val parts = payload.split(';').toSeq
    val rows = parts.collectFirst {
      case p if p.startsWith("rows:") => p.stripPrefix("rows:").toLong
    }.getOrElse(-1L)
    // same legacy-name hazard as 'bloomref' below: a pre-r17 table
    // with a declared stat column literally named 'bytes' encodes
    // 'bytes:<b64lo>:<b64hi>:<n>' — 4 parts, falls through to the
    // column-stat parse, never throws here
    def isBytes(p: String): Boolean =
      p.startsWith("bytes:") && p.split(':').length == 2
    val bytes = parts.collectFirst {
      case p if isBytes(p) =>
        scala.util.Try(p.stripPrefix("bytes:").toLong).toOption
    }.flatten.getOrElse(-1L)
    // a bloom REF segment is exactly two ':'-parts (prefix + b64 path);
    // a pre-r16 table whose declared stat column was literally named
    // 'bloomref' (word-shaped, so legal at init back then) encodes as
    // 'bloomref:<b64lo>:<b64hi>:<n>' — 4 parts — and must fall through
    // to the column-stat parse below, not throw in unb64 (an
    // unprunable table beats an unreadable one, so a corrupt ref also
    // degrades to None)
    def isBloomRef(p: String): Boolean =
      p.startsWith("bloomref:") && p.split(':').length == 2
    val bloomRef = parts.collectFirst {
      case p if isBloomRef(p) =>
        scala.util.Try(unb64(p.stripPrefix("bloomref:"))).toOption
    }.flatten
    // a DV ref is exactly three ':'-parts (prefix + b64 dir + count).
    // A legacy stat column literally NAMED 'dvref' encodes 4 parts and
    // falls through to the column parse ('dvref' is reserved at init
    // from r20 on). Unlike a corrupt bloomref — where degrading to
    // None merely loses pruning — a corrupt DV ref must FAIL LOUDLY:
    // dropping it would silently resurrect deleted rows.
    def isDvRef(p: String): Boolean =
      p.startsWith("dvref:") && p.split(':').length == 3
    val dv = parts.collectFirst {
      case p if isDvRef(p) =>
        val Array(_, ref, n) = p.split(':')
        (scala.util.Try(unb64(ref)).toOption,
          scala.util.Try(n.toLong).toOption) match {
          case (Some(r), Some(c)) => (r, c)
          case _ => throw new IllegalStateException(
            s"corrupt deletion-vector reference in file stats: '$p' — " +
              "refusing to read (dropping a DV would resurrect " +
              "deleted rows)")
        }
    }
    val cols = parts
      .filterNot(p => p.startsWith("rows:") || isBytes(p) ||
        isBloomRef(p) || isDvRef(p))
      .flatMap { p =>
        p.split(':') match {
          case Array(c, "-", "-", n) => Some(c -> ColStat(None, n.toLong))
          case Array(c, lo, hi, n) =>
            Some(c -> ColStat(Some((unb64(lo), unb64(hi))), n.toLong))
          case _ => None
        }
      }.toMap
    FileStats(rows, cols, bloomRef, bytes, dv.map(_._1),
      dv.map(_._2).getOrElse(0L))
  }

  private def isSupported(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  /** min/max normalization — monotone per type, so it commutes with
    * the aggregate and the normalized ordering IS the value ordering.
    * FLOAT canonicalizes through DOUBLE first: the recorded decimal is
    * the exact widened value (e.g. 0.1f → "0.10000000149011612"), so
    * stats written before a float→double schema widening compare
    * consistently with double literals afterwards — [[litComparable]]
    * folds float literals through the same double expansion. */
  private def norm(agg: Column, dt: DataType): Column = dt match {
    case DateType => F.unix_date(agg).cast("string")
    case TimestampType => F.unix_micros(agg).cast("string")
    case TimestampNTZType => F.date_format(agg, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    case StringType =>
      F.when(F.length(agg) <= MaxStringStat, agg) // else NULL → stat dropped
    case FloatType => agg.cast("double").cast("string")
    case _ => agg.cast("string")
  }

  /** Column types a per-file Bloom supports: integral keys probe as
    * longs (a widening-stable encoding — byte→long casts commute with
    * the put), strings as themselves. Floats/dates/timestamps are not
    * lookup-key shapes; they fall to min/max pruning. Shared with the
    * write-fused tap ([[graft.plans.BloomWriteTap]]) so eligibility
    * never drifts between the two builders. */
  private[graft] def isBloomSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Per-file stats of freshly written files. Returns relpath →
    * encoded payload. Stat columns the batch lacks (schema evolution)
    * simply record no bounds — those files stay candidates for
    * predicates on the missing column.
    *
    * HYBRID SOURCE — footers first, aggregate as fallback: the
    * freshly written parquet footers already carry exact per-file row
    * counts, min/max and null counts (what Iceberg/Delta lift into
    * their manifests), so the default write path records stats from
    * ONE driver-side footer read per new file — ZERO Spark jobs. The
    * Spark aggregate runs only for (a) `bloomCols` (key membership is
    * not a footer stat) and (b) any stat column whose footer answer
    * is not usable (INT96 timestamps, omitted/unknown statistics,
    * exotic physical types) — and then reads only THOSE columns.
    * [[footerColStats]] maps footer values onto the exact normalized
    * encoding [[norm]] writes, gated by the same [[normalizedOk]] /
    * [[MaxStringStat]] rules, so the two sources are byte-identical
    * (pinned by ManifestStatsSpec's parity law); any footer the
    * mapping cannot vouch for falls back to the aggregate rather
    * than guess.
    *
    * `bloomCols` build a per-file Bloom filter per column (capacity
    * `bloomCapacity`, the table's declared [[BloomKeyCapacity]]
    * override); the filters land in ONE sidecar under the batch's own
    * `data/<token>/` dir (immutable with the data files, swept by
    * vacuum with them) and each file's payload records the reference.
    * An overfull file (more distinct keys than the capacity) drops
    * its bloom — conservative, never saturated-and-useless.
    *
    * `sizes` (relpath → on-disk bytes, from the writer's own
    * directory listing) ride into the payload so planners never stat
    * the filesystem. */
  def compute(spark: SparkSession, root: String, relFiles: Seq[String],
              statCols: Seq[String],
              bloomCols: Seq[String] = Seq.empty,
              bloomCapacity: Long = BloomKeyCapacity,
              sizes: Map[String, Long] = Map.empty,
              preBlooms: Option[Map[String, Map[String, (Array[Byte], Long)]]] =
                None): Map[String, String] = {
    if (relFiles.isEmpty) return Map.empty
    val conf = spark.sparkContext.hadoopConfiguration
    // footer scrape, POOLED: each footer open is 1-2 storage
    // round-trips, so a many-file batch on an object store must not
    // pay them serially on the driver (the Iceberg/Delta planner-pool
    // idea). None = footer unreadable (fall back wholesale).
    val foot: Map[String, Option[FooterFile]] =
      if (relFiles.size == 1)
        Map(relFiles.head -> scala.util.Try(
          footerFile(conf, root, relFiles.head, statCols)).toOption)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, relFiles.size))
        try {
          import scala.jdk.CollectionConverters._
          val tasks: java.util.List[java.util.concurrent.Callable[
            (String, Option[FooterFile])]] = relFiles.map { f =>
            new java.util.concurrent.Callable[(String, Option[FooterFile])] {
              override def call(): (String, Option[FooterFile]) =
                f -> scala.util.Try(
                  footerFile(conf, root, f, statCols)).toOption
            }: java.util.concurrent.Callable[(String, Option[FooterFile])]
          }.asJava
          pool.invokeAll(tasks).asScala.map(_.get()).toMap
        } finally pool.shutdown()
      }
    val allFootersOk = foot.values.forall(_.isDefined)
    val aggCols: Seq[String] =
      if (!allFootersOk) statCols
      else statCols.filter(c => foot.values.flatten.exists(
        _.cols.getOrElse(c, FooterNone) == FooterUnknown))
    // write-fused blooms ([[graft.plans.BloomWriteTap]]): usable only
    // when no aggregate is needed anyway, the footers vouch for row
    // counts, and every file with rows carries a tap entry — any gap
    // falls back wholesale to the read-back aggregate (the reference
    // implementation)
    val pre: Option[Map[String, Map[String, (Array[Byte], Long)]]] =
      preBlooms.filter(pb => aggCols.isEmpty && allFootersOk &&
        relFiles.forall { f =>
          foot(f).exists(_.rows == 0L) || pb.contains(f)
        })
    val (aggStats, bloomRefs) =
      if (pre.isDefined)
        (Map.empty[String, (Long, Map[String, ColStat])],
          sidecarFromPre(spark, root, relFiles, pre.get, bloomCapacity))
      else if (aggCols.nonEmpty || bloomCols.nonEmpty)
        aggregateStats(spark, root, relFiles, aggCols, bloomCols,
          bloomCapacity)
      else (Map.empty[String, (Long, Map[String, ColStat])],
        Map.empty[String, String])
    relFiles.map { f =>
      val ff = foot(f)
      val agg = aggStats.get(f)
      val rows = ff.map(_.rows).orElse(agg.map(_._1)).getOrElse(-1L)
      val footCols: Map[String, ColStat] = ff.map(_.cols.collect {
        case (c, FooterStat(cs)) if !aggCols.contains(c) => c -> cs
      }).getOrElse(Map.empty)
      val cols = footCols ++ agg.map(_._2).getOrElse(Map.empty)
      f -> encode(FileStats(rows, cols, bloomRefs.get(f),
        sizes.getOrElse(f, -1L)))
    }.toMap
  }

  /** The Spark-side stats job — ONE aggregate over only the new
    * files, reading only `statCols ++ bloomCols`: per file, the row
    * count and each stat column's normalized bounds + null count,
    * plus the Bloom sidecar (written here, referenced per file).
    * Returns (relpath → (rows, colstats), relpath → bloomRef). The
    * fallback half of [[compute]] and the reference implementation
    * its footer half is parity-tested against. Files the scan yields
    * no rows for (0-row files) produce no entry. */
  private[graft] def aggregateStats(spark: SparkSession, root: String,
                                    relFiles: Seq[String],
                                    statCols: Seq[String],
                                    bloomCols: Seq[String],
                                    bloomCapacity: Long = BloomKeyCapacity)
      : (Map[String, (Long, Map[String, ColStat])], Map[String, String]) = {
    if (relFiles.isEmpty || (statCols.isEmpty && bloomCols.isEmpty))
      return (Map.empty, Map.empty)
    val df = spark.read.parquet(relFiles.map(f => s"$root/$f"): _*)
    val present = statCols.filter(df.columns.contains)
      .filter(c => isSupported(df.schema(c).dataType))
    val bloomPresent = bloomCols.filter(df.columns.contains)
      .filter(c => isBloomSupported(df.schema(c).dataType))
    if (present.isEmpty && bloomPresent.isEmpty) return (Map.empty, Map.empty)
    val statAggs: Seq[Column] =
      present.flatMap { c =>
        val dt = df.schema(c).dataType
        Seq(norm(F.min(F.col(c)), dt), norm(F.max(F.col(c)), dt),
          F.sum(F.when(F.col(c).isNull, 1L).otherwise(0L)))
      }
    val bloomAggs: Seq[Column] = bloomPresent.map { c =>
      df.schema(c).dataType match {
        case StringType =>
          F.udaf(new StringKeyBloomAgg(bloomCapacity, BloomFpp),
            org.apache.spark.sql.Encoders.STRING).apply(F.col(c))
        case _ =>
          F.udaf(new LongKeyBloomAgg(bloomCapacity, BloomFpp),
            org.apache.spark.sql.Encoders.LONG)
            .apply(F.col(c).cast("long"))
      }
    }
    val aggs: Seq[Column] =
      F.count(F.lit(1)).as("__rows") +: (statAggs ++ bloomAggs)
    val out = df.withColumn("__f", F.input_file_name())
      .groupBy("__f").agg(aggs.head, aggs.tail: _*)
      .collect() // bounded by the batch's file count — metadata scale
    val bloomBase = 2 + 3 * present.size
    // one sidecar file per batch, inside the batch's own token dir
    val bloomRows: Seq[(String, String, Array[Byte])] = out.toSeq.flatMap { r =>
      val rel = ManifestTable.relPathOf(r.getString(0))
      bloomPresent.zipWithIndex.flatMap { case (c, j) =>
        val v =
          if (r.isNullAt(bloomBase + j)) Array.empty[Byte]
          else r.getAs[Array[Byte]](bloomBase + j)
        if (v.isEmpty) None else Some((rel, c, v))
      }
    }
    val bloomRef: Option[String] = writeSidecar(spark, root, relFiles, bloomRows)
    val withBloom = bloomRows.iterator.map(_._1).toSet
    val perFile = out.map { r =>
      val rel = ManifestTable.relPathOf(r.getString(0))
      val rowCount = r.getLong(1)
      val cols = present.zipWithIndex.flatMap { case (c, i) =>
        val (loI, hiI, nI) = (2 + 3 * i, 3 + 3 * i, 4 + 3 * i)
        val nulls = r.getLong(nI)
        if (r.isNullAt(loI) || r.isNullAt(hiI)) {
          // null aggregates: either the column has NO values in this
          // file (null-only marker — prunes comparisons, skips
          // min/max) or values exist but the stat dropped (oversized
          // string) — then record nothing: unknown stays conservative
          if (nulls == rowCount) Some(c -> ColStat(None, nulls)) else None
        } else {
          val (lo, hi) = (r.getString(loI), r.getString(hiI))
          if (!normalizedOk(df.schema(c).dataType, lo) ||
              !normalizedOk(df.schema(c).dataType, hi)) None
          else Some(c -> ColStat(Some((lo, hi)), nulls))
        }
      }.toMap
      rel -> ((rowCount, cols))
    }.toMap
    val refs = perFile.keys.flatMap(rel =>
      bloomRef.filter(_ => withBloom(rel)).map(rel -> _)).toMap
    (perFile, refs)
  }

  /** Write one commit's bloom sidecar (`file|col|b64` lines) under
    * the batch's own token dir. The rows are driver-local — zero
    * Spark jobs on either side of the seam, and the loader stays
    * job-free too (planning must never launch jobs). None when there
    * is nothing to record. Shared by the aggregate path and the
    * write-fused tap path so the on-disk format can never drift. */
  private def writeSidecar(spark: SparkSession, root: String,
                           relFiles: Seq[String],
                           bloomRows: Seq[(String, String, Array[Byte])])
      : Option[String] = {
    if (bloomRows.isEmpty) return None
    val tokenDir = relFiles.head.split('/').take(2).mkString("/")
    val ref = s"$tokenDir/blooms.idx"
    val p = new org.apache.hadoop.fs.Path(s"$root/$ref")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bloomRows.map { case (f, c, b) =>
      s"$f|$c|${Base64.getEncoder.encodeToString(b)}"
    }.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    Some(ref)
  }

  /** Sidecar + per-file refs from write-fused tap results
    * ([[graft.plans.BloomWriteTap]]) — the zero-job twin of
    * [[aggregateStats]]'s bloom half. Applies the SAME capacity drop:
    * a filter whose approximate new-key count exceeds the capacity
    * records nothing (conservative — the file stays a candidate for
    * every equality predicate), exactly like KeyBloomAgg.finish. */
  private def sidecarFromPre(spark: SparkSession, root: String,
                             relFiles: Seq[String],
                             pre: Map[String, Map[String, (Array[Byte], Long)]],
                             bloomCapacity: Long): Map[String, String] = {
    val bloomRows: Seq[(String, String, Array[Byte])] =
      relFiles.flatMap { f =>
        pre.getOrElse(f, Map.empty).toSeq.sortBy(_._1).collect {
          case (c, (bytes, newKeys))
              if newKeys <= bloomCapacity && bytes.nonEmpty => (f, c, bytes)
        }
      }
    val ref = writeSidecar(spark, root, relFiles, bloomRows)
    val withBloom = bloomRows.iterator.map(_._1).toSet
    ref.map(r => withBloom.map(_ -> r).toMap).getOrElse(Map.empty)
  }

  // ---- footer-sourced stats (the zero-job write path) ----

  /** One stat column's footer verdict: a usable [[ColStat]], a
    * CONFIDENT absence (the aggregate would record nothing either —
    * column missing from the file, bounds out of the recordable form),
    * or UNKNOWN (the footer cannot vouch — the aggregate must answer). */
  private[graft] sealed trait FooterAnswer
  private[graft] final case class FooterStat(cs: ColStat) extends FooterAnswer
  private[graft] case object FooterNone extends FooterAnswer
  private[graft] case object FooterUnknown extends FooterAnswer

  private[graft] final case class FooterFile(rows: Long,
                                             cols: Map[String, FooterAnswer])

  /** Driver-side footer scrape of ONE freshly written file: exact row
    * count (always answerable — block counts are mandatory) and, per
    * requested stat column, the footer statistics mapped onto the
    * SAME normalized encoding the aggregate writes. Throws on an
    * unreadable footer — the caller falls back wholesale. */
  private[graft] def footerFile(conf: org.apache.hadoop.conf.Configuration,
                                root: String, f: String,
                                statCols: Seq[String]): FooterFile = {
    import scala.jdk.CollectionConverters._
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$root/$f"), conf))
    try {
      val md = reader.getFooter
      val blocks = md.getBlocks.asScala.toSeq
      val schema = md.getFileMetaData.getSchema
      val rows = blocks.map(_.getRowCount).sum
      val cols = statCols.map { c =>
        val field =
          if (schema.containsField(c)) Some(schema.getType(Seq(c): _*))
          else None
        c -> (field match {
          case None => FooterNone // absent column: aggregate records nothing too
          case Some(t) if !t.isPrimitive => FooterNone
          case Some(t) => scala.util.Try(
            footerColStats(t.asPrimitiveType(), blocks, c, rows))
            .getOrElse(FooterUnknown)
        })
      }.toMap
      FooterFile(rows, cols)
    } finally reader.close()
  }

  /** Merge one column's per-block footer statistics into a
    * [[FooterAnswer]]. Bounds merge on the RAW values (the same
    * orderings parquet's comparators and Spark's interpreted
    * aggregate orderings use — NaN greatest, -0.0 < 0.0, unsigned
    * bytes for strings) and normalize ONCE at the end, so an
    * unrecordable value (NaN bound, oversized string) drops the
    * entry exactly when the aggregate's whole-file min/max would. */
  private def footerColStats(pt: org.apache.parquet.schema.PrimitiveType,
                             blocks: Seq[
                               org.apache.parquet.hadoop.metadata.BlockMetaData],
                             col: String, totalRows: Long): FooterAnswer = {
    import scala.jdk.CollectionConverters._
    val cls = normClassOf(pt).getOrElse(return FooterUnknown)
    var nulls = 0L
    var lo: Any = null
    var hi: Any = null
    for (b <- blocks) {
      val chunk = b.getColumns.asScala
        .find(_.getPath.toDotString == col)
        .getOrElse(return FooterUnknown)
      val st = chunk.getStatistics
      if (st == null || !st.isNumNullsSet) return FooterUnknown
      nulls += st.getNumNulls
      if (chunk.getValueCount - st.getNumNulls > 0) {
        // non-null values exist in this block: bounds are required
        if (!st.hasNonNullValue) return FooterUnknown // stats omitted
        val bLo = cls.raw(st.genericGetMin.asInstanceOf[AnyRef])
          .getOrElse(return FooterUnknown)
        val bHi = cls.raw(st.genericGetMax.asInstanceOf[AnyRef])
          .getOrElse(return FooterUnknown)
        if (lo == null) { lo = bLo; hi = bHi }
        else {
          if (cls.cmp(bLo, lo) < 0) lo = bLo
          if (cls.cmp(bHi, hi) > 0) hi = bHi
        }
      }
    }
    if (lo == null) FooterStat(ColStat(None, nulls)) // null-only (or empty)
    else (cls.norm(lo), cls.norm(hi)) match {
      case (Some(l), Some(h)) => FooterStat(ColStat(Some((l, h)), nulls))
      // a bound outside the recordable form — the aggregate records
      // nothing for such a file either (values exist, so never the
      // null-only marker)
      case _ => FooterNone
    }
  }

  /** Normalization class of a parquet primitive: raw-value
    * extraction, the merge ordering, and the final normalized
    * encoding — each the exact footer-side mirror of [[norm]] for
    * the Spark type the primitive round-trips as. None = a shape the
    * mirror does not vouch for (INT96, NANOS timestamps, unsigned
    * ints, booleans, raw binary) → the aggregate answers. */
  private sealed abstract class NormClass {
    def raw(v: AnyRef): Option[Any]
    def cmp(a: Any, b: Any): Int
    def norm(a: Any): Option[String]
  }

  private object LongClass extends NormClass {
    override def raw(v: AnyRef): Option[Any] = v match {
      case x: java.lang.Integer => Some(x.longValue())
      case x: java.lang.Long => Some(x.longValue())
      case _ => None
    }
    override def cmp(a: Any, b: Any): Int =
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override def norm(a: Any): Option[String] = Some(a.toString)
  }

  private object FloatClass extends NormClass {
    override def raw(v: AnyRef): Option[Any] = v match {
      case x: java.lang.Float => Some(x.floatValue())
      case _ => None
    }
    override def cmp(a: Any, b: Any): Int =
      java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    override def norm(a: Any): Option[String] = {
      val f = a.asInstanceOf[Float]
      // [[norm]] records the float's exact double expansion; NaN/Inf
      // fail [[normalizedOk]] there — mirror the drop here
      if (f.isNaN || f.isInfinite) None else Some(f.toDouble.toString)
    }
  }

  private object DoubleClass extends NormClass {
    override def raw(v: AnyRef): Option[Any] = v match {
      case x: java.lang.Double => Some(x.doubleValue())
      case _ => None
    }
    override def cmp(a: Any, b: Any): Int =
      java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    override def norm(a: Any): Option[String] = {
      val d = a.asInstanceOf[Double]
      if (d.isNaN || d.isInfinite) None else Some(d.toString)
    }
  }

  private final class DecimalClass(scale: Int) extends NormClass {
    override def raw(v: AnyRef): Option[Any] = v match {
      case x: java.lang.Integer =>
        Some(java.math.BigInteger.valueOf(x.longValue()))
      case x: java.lang.Long =>
        Some(java.math.BigInteger.valueOf(x.longValue()))
      case b: org.apache.parquet.io.api.Binary =>
        Some(new java.math.BigInteger(b.getBytes))
      case _ => None
    }
    override def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[java.math.BigInteger]
        .compareTo(b.asInstanceOf[java.math.BigInteger])
    override def norm(a: Any): Option[String] =
      // same rendering as Spark's Decimal.toString (plain or
      // scientific per java.math.BigDecimal's own rules)
      Some(new java.math.BigDecimal(
        a.asInstanceOf[java.math.BigInteger], scale).toString)
  }

  private final class TsClass(toMicros: Long => Long,
                              ntz: Boolean) extends NormClass {
    override def raw(v: AnyRef): Option[Any] = v match {
      case x: java.lang.Long => Some(toMicros(x.longValue()))
      case _ => None
    }
    override def cmp(a: Any, b: Any): Int =
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override def norm(a: Any): Option[String] = {
      val micros = a.asInstanceOf[Long]
      if (!ntz) Some(micros.toString)
      else scala.util.Try {
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        ldt.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
      }.toOption.filter(_.length == 26) // the normalizedOk form gate
    }
  }

  private object StringClass extends NormClass {
    override def raw(v: AnyRef): Option[Any] = v match {
      case b: org.apache.parquet.io.api.Binary => Some(b.getBytes)
      case _ => None
    }
    override def cmp(a: Any, b: Any): Int =
      bytesCmp(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override def norm(a: Any): Option[String] = {
      val s = new String(a.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8)
      // [[MaxStringStat]] counts CHARACTERS (Spark length() = code
      // points), not UTF-16 units
      if (s.codePointCount(0, s.length) <= MaxStringStat) Some(s) else None
    }
  }

  private def normClassOf(pt: org.apache.parquet.schema.PrimitiveType)
      : Option[NormClass] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val ann = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case INT32 => ann match {
        case null => Some(LongClass)
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned => Some(LongClass)
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
          Some(LongClass) // epoch days — the raw int IS the encoding
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(new DecimalClass(d.getScale))
        case _ => None
      }
      case INT64 => ann match {
        case null => Some(LongClass)
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned => Some(LongClass)
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          val toMicros: Option[Long => Long] = ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS =>
              Some(identity[Long])
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              Some((x: Long) => Math.multiplyExact(x, 1000L))
            case _ => None // NANOS: not a self-written shape
          }
          toMicros.map(f => new TsClass(f, ntz = !ts.isAdjustedToUTC))
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(new DecimalClass(d.getScale))
        case _ => None
      }
      case FLOAT => Some(FloatClass)
      case DOUBLE => Some(DoubleClass)
      case BINARY => ann match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          Some(StringClass)
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(new DecimalClass(d.getScale))
        case _ => None
      }
      case FIXED_LEN_BYTE_ARRAY => ann match {
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(new DecimalClass(d.getScale))
        case _ => None
      }
      case _ => None // INT96, BOOLEAN: the aggregate answers
    }
  }

  // ---- bloom side-index load + probe ----

  /** Deserialized bloom side files, CONTENT-ADDRESSED by absolute
    * path: a `blooms.idx` is immutable once its commit publishes
    * (it lives in the batch's own `data/<token>/` dir), so a cache
    * entry can never go stale. Clear-on-overflow valve like the
    * decode cache. */
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[(String, String), org.apache.spark.util.sketch.BloomFilter]]()
  private val BloomCacheMax = 4096

  /** Failed-sidecar BACKOFF (path → last failure millis): a
    * persistently corrupt-but-present sidecar must not be re-fetched
    * and re-logged on every planning pass of every DML op. Unlike the
    * positive cache the entry EXPIRES ([[BloomRetryMillis]]) — the
    * failure may be transient, and on an immutable key a later
    * successful read can only be the true content. */
  private val bloomFailures =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val BloomRetryMillis = 60000L

  /** Load (and cache) one commit's bloom sidecar (`file|col|b64`
    * lines): (file-relpath, column) → filter. Pure driver-side FS
    * read — planning never launches a Spark job. A missing/corrupt
    * sidecar answers empty — blooms are only ever an optimization. */
  def loadBlooms(spark: SparkSession, root: String, ref: String)
      : Map[(String, String), org.apache.spark.util.sketch.BloomFilter] = {
    val key = s"$root/$ref"
    val hit = bloomCache.get(key)
    if (hit != null) return hit
    // inside the backoff window after a failed read: skip the
    // re-fetch (and the re-log) — pruning degrades to bounds exactly
    // as on the failing call itself
    val lastFail = bloomFailures.get(key)
    if (lastFail != null &&
        System.currentTimeMillis() - lastFail < BloomRetryMillis)
      return Map.empty
    val p = new org.apache.hadoop.fs.Path(key)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // only a GENUINELY absent sidecar (vacuumed, or hand-built table)
    // caches the empty answer; a transient read failure must NOT be
    // pinned forever on an immutable key — log, skip pruning for this
    // call, retry naturally on the next op
    val loaded: Option[Map[(String, String),
        org.apache.spark.util.sketch.BloomFilter]] =
      if (!fs.exists(p)) Some(Map.empty)
      else scala.util.Try {
        val in = fs.open(p)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        lines.flatMap { l =>
          l.split('|') match {
            case Array(f, c, b64bloom) =>
              Some((f, c) -> org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(
                  Base64.getDecoder.decode(b64bloom))))
            case _ => None
          }
        }.toMap
      }.toOption
    loaded match {
      case Some(m) =>
        if (bloomCache.size >= BloomCacheMax) bloomCache.clear()
        bloomCache.putIfAbsent(key, m)
        bloomFailures.remove(key)
        m
      case None =>
        bloomFailures.put(key, System.currentTimeMillis())
        graft.util.Log.warn(
          s"bloom sidecar read failed (transient?): $key — " +
            s"pruning degrades to bounds for ${BloomRetryMillis / 1000}s")
        Map.empty
    }
  }

  /** Does the filter admit literal `v` (of `litDt`) as a key of a
    * `colDt` column? None = not probe-able (type shapes the put side
    * never recorded) — conservative. Must mirror the PUT side
    * exactly: integral columns put `cast(long)`, strings put raw. */
  private def bloomMayContain(
      bf: org.apache.spark.util.sketch.BloomFilter,
      colDt: DataType, v: Any, litDt: DataType): Option[Boolean] =
    colDt match {
      case ByteType | ShortType | IntegerType | LongType => v match {
        case x: Byte => Some(bf.mightContainLong(x.toLong))
        case x: Short => Some(bf.mightContainLong(x.toLong))
        case x: Int => Some(bf.mightContainLong(x.toLong))
        case x: Long => Some(bf.mightContainLong(x))
        case _ => None
      }
      case StringType => v match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          Some(bf.mightContainString(s.toString))
        case s: String => Some(bf.mightContainString(s))
        case _ => None
      }
      case _ => None
    }

  /** Is a normalized value usable for ordering? NaN/Infinity are
    * unorderable; an NTZ outside the fixed 26-char 4-digit-year form
    * (year ≥ 10000 or negative) breaks the lexicographic =
    * chronological invariant — such stats drop (conservative), never
    * lie. */
  private def normalizedOk(dt: DataType, v: String): Boolean = dt match {
    case FloatType | DoubleType =>
      scala.util.Try(BigDecimal(v)).isSuccess
    case TimestampNTZType => v.length == 26
    case _ => true
  }

  /** Normalized-string comparison in the column type's ordering —
    * the same ordering the evaluators use. */
  private[operators] def cmpNormalized(dt: DataType, a: String,
                                       b: String): Int = dt match {
    case _: NumericType | DateType | TimestampType =>
      BigDecimal(a).compare(BigDecimal(b))
    case _ => utf8Cmp(a, b)
  }

  /** Normalized stat value → an external JVM value of the column's
    * type (what `lit()`/collect would carry) — the decode side of
    * [[norm]], for metadata-only min/max answers. */
  private[operators] def denormalize(dt: DataType, v: String): Any =
    dt match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case IntegerType => v.toInt
      case LongType => v.toLong
      case FloatType => v.toFloat
      case DoubleType => v.toDouble
      case _: DecimalType => new java.math.BigDecimal(v)
      case DateType => java.time.LocalDate.ofEpochDay(v.toLong)
      case TimestampType =>
        val micros = v.toLong
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
      case TimestampNTZType =>
        java.time.LocalDateTime.parse(v,
          java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
      case _ => v
    }

  // ---- predicate evaluation against one file's bounds ----

  /** Resolve a user predicate against the recorded table schema —
    * ONE driver-side analysis pass per op (never per file), yielding
    * properly-typed attributes and literals (type coercion applied,
    * sugar desugared) for the per-file evaluators below. None when
    * the predicate does not analyze (unknown column, …) — callers
    * fall back to no pruning. */
  def compilePredicate(spark: SparkSession, predicate: Column,
                       schema: StructType): Option[Expression] =
    scala.util.Try {
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .filter(predicate).queryExecution.analyzed
        .collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
    }.toOption.flatten

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Fold the literal side of a comparison to (value, type): a bare
    * Literal, or ANY resolved foldable expression — `lit(x).cast(…)`,
    * `to_timestamp_ntz(lit(…))`, … — evaluated here on the driver
    * (RuntimeReplaceable through its replacement; anything that
    * throws, e.g. a timezone-needing cast with no zone bound, folds
    * to None and the comparison stays conservative). */
  private def fold(e: Expression): Option[(Any, DataType)] = e match {
    case Literal(null, _) => None
    case Literal(v, dt) => Some((v, dt))
    // references.isEmpty (not `foldable`: some pure literal functions,
    // e.g. ParseToTimestamp, report non-foldable) — deterministic and
    // row-independent is exactly what driver evaluation needs
    case _ if e.resolved && e.deterministic && e.references.isEmpty =>
      scala.util.Try {
        val v = e match {
          case r: RuntimeReplaceable => r.replacement.eval(null)
          case _ => e.eval(null)
        }
        Option(v).map((_, e.dataType))
      }.toOption.flatten
    case _ => None
  }

  /** Literal → the same normalized comparable space as the stats.
    * None = not convertible (conservative). */
  private def litComparable(colDt: DataType, v: Any,
                            litDt: DataType): Option[Either[BigDecimal, String]] =
    colDt match {
      case _: NumericType | DateType | TimestampType =>
        val n: Option[BigDecimal] = (v, litDt) match {
          case (x: Int, _) => Some(BigDecimal(x))
          case (x: Long, _) => Some(BigDecimal(x))
          case (x: Short, _) => Some(BigDecimal(x.toInt))
          case (x: Byte, _) => Some(BigDecimal(x.toInt))
          // floats fold through their exact double expansion — the
          // same canonical form [[norm]] records, so float-era stats
          // stay comparable after a float→double widening
          case (x: Float, _) if !x.isNaN && !x.isInfinite =>
            Some(BigDecimal(x.toDouble))
          case (x: Double, _) if !x.isNaN && !x.isInfinite =>
            Some(BigDecimal(x))
          case (x: org.apache.spark.sql.types.Decimal, _) =>
            Some(BigDecimal(x.toJavaBigDecimal))
          // a string literal against a date column: parse to epoch days
          case (s: org.apache.spark.unsafe.types.UTF8String, StringType)
              if colDt == DateType =>
            scala.util.Try(BigDecimal(
              java.time.LocalDate.parse(s.toString).toEpochDay)).toOption
          case _ => None
        }
        n.map(scala.Left(_))
      case StringType => v match {
        case s: org.apache.spark.unsafe.types.UTF8String => Some(scala.Right(s.toString))
        case s: String => Some(scala.Right(s))
        case _ => None
      }
      case TimestampNTZType => v match {
        case micros: Long if litDt == TimestampNTZType =>
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
          val s = ldt.format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
          // outside the fixed-width 4-digit-year form the ordering
          // invariant (and the recorded stats) do not apply
          if (s.length == 26) Some(scala.Right(s)) else None
        case _ => None
      }
      case _ => None
    }

  /** Spark's string ordering is UTF8String binary order — unsigned
    * UTF-8 byte comparison, NOT java.lang.String's UTF-16 order. */
  private def utf8Cmp(a: String, b: String): Int =
    bytesCmp(a.getBytes(StandardCharsets.UTF_8),
      b.getBytes(StandardCharsets.UTF_8))

  private def bytesCmp(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Exclusive upper bound of the prefix interval: the set of strings
    * starting with `prefix` is EXACTLY `[prefix, succ(prefix))` in
    * bytewise order, where succ increments the last non-0xFF byte and
    * drops what follows. None = unbounded (all-0xFF prefix: the
    * interval is `[prefix, +inf)`). Exact because recorded bounds are
    * never truncated (oversized stats are DROPPED, not shortened). */
  private def prefixSucc(prefix: String): Option[Array[Byte]] = {
    val b = prefix.getBytes(StandardCharsets.UTF_8)
    var i = b.length - 1
    while (i >= 0 && b(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(b, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  /** (prefix, bounds) → (mayContainPrefixRow, allRowsHavePrefix). */
  private def prefixCheck(p: String, lo: String,
                          hi: String): (Boolean, Boolean) = {
    val pB = p.getBytes(StandardCharsets.UTF_8)
    val loB = lo.getBytes(StandardCharsets.UTF_8)
    val hiB = hi.getBytes(StandardCharsets.UTF_8)
    val succ = prefixSucc(p)
    val may = bytesCmp(hiB, pB) >= 0 &&
      succ.forall(s => bytesCmp(loB, s) < 0)
    val all = bytesCmp(loB, pB) >= 0 &&
      succ.forall(s => bytesCmp(hiB, s) < 0)
    (may, all)
  }

  private def foldString(e: Expression): Option[String] =
    fold(e).flatMap {
      case (s: org.apache.spark.unsafe.types.UTF8String, _) => Some(s.toString)
      case (s: String, _) => Some(s)
      case _ => None
    }

  /** sign(statVal − literal) in the column type's ordering. */
  private def cmp(colDt: DataType, statVal: String, v: Any,
                  litDt: DataType): Option[Int] =
    litComparable(colDt, v, litDt).flatMap {
      case scala.Left(n) =>
        scala.util.Try(BigDecimal(statVal).compare(n)).toOption
      case scala.Right(s) => Some(utf8Cmp(statVal, s))
    }

  /** Per-file stat lookup: the first resolved name with a recorded
    * entry wins (`resolve` maps a predicate name to the stat keys to
    * try — identity normally, the rename chain for mapped columns). */
  private def statFor(name: String, st: FileStats,
                      schema: StructType,
                      resolve: String => Seq[String])
      : Option[(ColStat, DataType)] =
    resolve(name).iterator.flatMap { n =>
      st.cols.get(n).flatMap(cs =>
        schema.fields.find(_.name == name).map(f => (cs, f.dataType)))
    }.nextOption()

  /** Can ANY row in a file with bounds `st` satisfy the COMPILED
    * predicate ([[compilePredicate]])? TRUE on every unknown — see
    * object doc. `bloomFor` resolves a (current-name) column to the
    * file's per-file Bloom, when one was recorded — equality/IN
    * shapes then prune on key membership where min/max cannot
    * (scattered ids); a bloom answer can only ever REMOVE candidates
    * the bounds admitted, never add. */
  def mayMatch(cond: Expression, st: FileStats, schema: StructType,
               resolve: String => Seq[String] = n => Seq(n),
               bloomFor: String => Option[
                 org.apache.spark.util.sketch.BloomFilter] = _ => None)
      : Boolean =
    mayMatchExpr(cond, st, schema, resolve, bloomFor)

  /** IN-list / IN-set sizes past this evaluate conservatively (the
    * per-file probe cost is literals × files of driver time). The
    * scattered-id merge prune sizes itself to stay inside it. */
  val MaxInProbe = 4096

  private def mayMatchExpr(e: Expression, st: FileStats,
                           schema: StructType,
                           resolve: String => Seq[String],
                           bloomFor: String => Option[
                             org.apache.spark.util.sketch.BloomFilter])
      : Boolean = {
    def may(x: Expression) = mayMatchExpr(x, st, schema, resolve, bloomFor)
    // check(colSide, litSide, pred over (sign(lo−v), sign(hi−v))):
    // a NULL-ONLY column satisfies no comparison — definite false
    def check(colE: Expression, litE: Expression,
              pred: (Int, Int) => Boolean): Option[Boolean] =
      for {
        n <- attrName(colE)
        vd <- fold(litE)
        csDt <- statFor(n, st, schema, resolve)
        res <- csDt._1.bounds match {
          case None => Some(false)
          case Some((lo, hi)) =>
            for {
              cl <- cmp(csDt._2, lo, vd._1, vd._2)
              ch <- cmp(csDt._2, hi, vd._1, vd._2)
            } yield pred(cl, ch)
        }
      } yield res
    // value-level equality: bounds answer AND bloom answer combine —
    // either saying "impossible" prunes; both unknown stays unknown
    def valueEqMay(n: String, v: Any, vDt: DataType): Option[Boolean] = {
      val boundsAns: Option[Boolean] =
        statFor(n, st, schema, resolve).flatMap { case (cs, dt) =>
          cs.bounds match {
            case None => Some(false) // null-only: no value equals v
            case Some((lo, hi)) =>
              for {
                cl <- cmp(dt, lo, v, vDt)
                ch <- cmp(dt, hi, v, vDt)
              } yield cl <= 0 && ch >= 0
          }
        }
      val bloomAns: Option[Boolean] =
        for {
          bf <- bloomFor(n)
          dt <- schema.fields.find(_.name == n).map(_.dataType)
          ans <- bloomMayContain(bf, dt, v, vDt)
        } yield ans
      (boundsAns, bloomAns) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (None, None) => None
        case _ => Some(true)
      }
    }
    def eqMay(colE: Expression, litE: Expression): Option[Boolean] =
      for {
        n <- attrName(colE)
        vd <- fold(litE)
        ans <- valueEqMay(n, vd._1, vd._2)
      } yield ans
    e match {
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)
      case EqualTo(a, b) =>
        eqMay(a, b).orElse(eqMay(b, a)).getOrElse(true)
      case EqualNullSafe(a, b) =>
        eqMay(a, b).orElse(eqMay(b, a)).getOrElse(true)
      case LessThan(a, b) => // col < v possible iff lo < v; v < col iff hi > v
        check(a, b, (cl, _) => cl < 0)
          .orElse(check(b, a, (_, ch) => ch > 0)).getOrElse(true)
      case LessThanOrEqual(a, b) =>
        check(a, b, (cl, _) => cl <= 0)
          .orElse(check(b, a, (_, ch) => ch >= 0)).getOrElse(true)
      case GreaterThan(a, b) => // col > v possible iff hi > v
        check(a, b, (_, ch) => ch > 0)
          .orElse(check(b, a, (cl, _) => cl < 0)).getOrElse(true)
      case GreaterThanOrEqual(a, b) =>
        check(a, b, (_, ch) => ch >= 0)
          .orElse(check(b, a, (cl, _) => cl <= 0)).getOrElse(true)
      case In(a, list) =>
        attrName(a) match {
          case Some(_) if list.nonEmpty && list.size <= MaxInProbe &&
              list.forall(l => fold(l).isDefined) =>
            list.exists(l => eqMay(a, l).getOrElse(true))
          case _ => true
        }
      // the optimizer's large-IN form (isin past the InSet threshold,
      // and the shape SQL-pushed filters arrive in): values are
      // already internal, typed by the child — null elements never
      // satisfy an equality, so they are skipped, not conservative
      case InSet(a, hset) =>
        attrName(a) match {
          case Some(n) if hset.nonEmpty && hset.size <= MaxInProbe =>
            hset.exists(v => v != null &&
              valueEqMay(n, v, a.dataType).getOrElse(true))
          case _ => true
        }
      // NOT by duality: if EVERY row satisfies x, none satisfies
      // NOT x. (Rows where x is NULL satisfy neither — irrelevant
      // here: mustMatch(x) already implies x is TRUE on every row.)
      case Not(x) => !mustMatchExpr(x, st, schema, resolve)
      case StartsWith(a, litE) =>
        (for {
          n <- attrName(a)
          p <- foldString(litE)
          csDt <- statFor(n, st, schema, resolve)
          if csDt._2 == StringType
        } yield csDt._1.bounds match {
          case None => false // null-only: no string to carry the prefix
          case Some((lo, hi)) => prefixCheck(p, lo, hi)._1
        }).getOrElse(true)
      // the null count answers null predicates exactly
      case IsNull(a) =>
        attrName(a).flatMap(statFor(_, st, schema, resolve))
          .map(_._1.nulls > 0L).getOrElse(true)
      case IsNotNull(a) =>
        attrName(a).flatMap(statFor(_, st, schema, resolve))
          // non-null values exist iff bounds were recordable
          .map(_._1.bounds.isDefined).getOrElse(true)
      case _ => true // unsupported shape: never prune on it
    }
  }

  /** Does EVERY row in a file with bounds `st` satisfy the COMPILED
    * predicate? FALSE on every unknown, and FALSE when the column has
    * any nulls in the file (NULL satisfies no predicate). Powers the
    * metadata-only `count(*)` fast path ([[ManifestTable.countWhere]]):
    * a fully-matching file contributes its recorded row count without
    * being opened. */
  def mustMatch(cond: Expression, st: FileStats, schema: StructType,
                resolve: String => Seq[String] = n => Seq(n)): Boolean =
    mustMatchExpr(cond, st, schema, resolve)

  private def mustMatchExpr(e: Expression, st: FileStats,
                            schema: StructType,
                            resolve: String => Seq[String]): Boolean = {
    def must(x: Expression) = mustMatchExpr(x, st, schema, resolve)
    def check(colE: Expression, litE: Expression,
              pred: (Int, Int) => Boolean): Option[Boolean] =
      for {
        n <- attrName(colE)
        vd <- fold(litE)
        csDt <- statFor(n, st, schema, resolve)
        if csDt._1.nulls == 0L // any null row fails the predicate
        b <- csDt._1.bounds
        cl <- cmp(csDt._2, b._1, vd._1, vd._2)
        ch <- cmp(csDt._2, b._2, vd._1, vd._2)
      } yield pred(cl, ch)
    e match {
      case And(l, r) => must(l) && must(r)
      case Or(l, r) => must(l) || must(r)
      case EqualTo(a, b) => // every row = v iff lo = hi = v
        check(a, b, (cl, ch) => cl == 0 && ch == 0)
          .orElse(check(b, a, (cl, ch) => cl == 0 && ch == 0))
          .getOrElse(false)
      case LessThan(a, b) => // all col < v iff hi < v
        check(a, b, (_, ch) => ch < 0)
          .orElse(check(b, a, (cl, _) => cl > 0)).getOrElse(false)
      case LessThanOrEqual(a, b) =>
        check(a, b, (_, ch) => ch <= 0)
          .orElse(check(b, a, (cl, _) => cl >= 0)).getOrElse(false)
      case GreaterThan(a, b) => // all col > v iff lo > v
        check(a, b, (cl, _) => cl > 0)
          .orElse(check(b, a, (_, ch) => ch < 0)).getOrElse(false)
      case GreaterThanOrEqual(a, b) =>
        check(a, b, (cl, _) => cl >= 0)
          .orElse(check(b, a, (_, ch) => ch <= 0)).getOrElse(false)
      case StartsWith(a, litE) =>
        (for {
          n <- attrName(a)
          p <- foldString(litE)
          csDt <- statFor(n, st, schema, resolve)
          if csDt._2 == StringType && csDt._1.nulls == 0L
          b <- csDt._1.bounds
        } yield prefixCheck(p, b._1, b._2)._2).getOrElse(false)
      case IsNull(a) => // every row null ⇔ the null-only marker
        attrName(a).flatMap(statFor(_, st, schema, resolve))
          .exists(s => s._1.bounds.isEmpty && s._1.nulls > 0L)
      case IsNotNull(a) =>
        attrName(a).flatMap(statFor(_, st, schema, resolve))
          .exists(_._1.nulls == 0L)
      // NOT by duality, with a NULL guard: "every row satisfies
      // NOT x" needs x to be FALSE on every row — mayMatch(x)=false
      // gives "x is never TRUE", and neverNullOn(x) closes the
      // remaining case (a NULL x makes NOT x NULL, which satisfies
      // nothing). Blooms never participate on this side.
      case Not(x) =>
        neverNullOn(x, st, schema, resolve) &&
          !mayMatchExpr(x, st, schema, resolve, _ => None)
      case _ => false // unsupported shape: never claim full coverage
    }
  }

  /** Can `e` be proven to NEVER evaluate to NULL on any row of the
    * file? Structural and conservative: comparisons need a null-free
    * column side (per the recorded null counts) and a non-null
    * foldable literal side; null tests are never null themselves;
    * AND/OR require both operands (FALSE&&NULL is FALSE, but proving
    * which operand short-circuits is beyond the stats). FALSE on any
    * doubt. */
  private def neverNullOn(e: Expression, st: FileStats,
                          schema: StructType,
                          resolve: String => Seq[String]): Boolean = {
    def nn(x: Expression) = neverNullOn(x, st, schema, resolve)
    def colNullFree(a: Expression): Boolean =
      attrName(a).flatMap(statFor(_, st, schema, resolve))
        .exists(_._1.nulls == 0L)
    def sideOk(a: Expression, b: Expression): Boolean =
      (colNullFree(a) && fold(b).isDefined) ||
        (colNullFree(b) && fold(a).isDefined)
    e match {
      case And(l, r) => nn(l) && nn(r)
      case Or(l, r) => nn(l) && nn(r)
      case Not(x) => nn(x)
      case IsNull(_) | IsNotNull(_) => true
      case _: EqualNullSafe => true // <=> is never null
      case EqualTo(a, b) => sideOk(a, b)
      case LessThan(a, b) => sideOk(a, b)
      case LessThanOrEqual(a, b) => sideOk(a, b)
      case GreaterThan(a, b) => sideOk(a, b)
      case GreaterThanOrEqual(a, b) => sideOk(a, b)
      case StartsWith(a, l) => colNullFree(a) && foldString(l).isDefined
      case In(a, list) =>
        colNullFree(a) && list.forall(l => fold(l).isDefined)
      case InSet(a, hset) => colNullFree(a) && !hset.contains(null)
      case _ => false
    }
  }
}

/** Per-file Bloom builder — partial filters OR-merge, so the
  * aggregation distributes like a sum (the [[graft.operators.Layout]]
  * BloomAgg design, specialized to the manifest's fixed capacity).
  * The buffer carries an approximate NEW-key count (a put is counted
  * only when the filter did not already admit the key; merge sums
  * partition counts, overcounting shared keys — the conservative
  * direction) so `finish` can DROP an overfull filter instead of
  * recording a saturated, prune-less one. Empty bytes = dropped.
  * One base class, two key-type hooks — the drop threshold and
  * serialization logic must never drift between the types. */
private[operators] sealed abstract class KeyBloomAgg[T](
    capacity: Long, fpp: Double)
  extends org.apache.spark.sql.expressions.Aggregator[
    T, (org.apache.spark.util.sketch.BloomFilter, Long), Array[Byte]] {
  import org.apache.spark.util.sketch.BloomFilter
  protected def admits(b: BloomFilter, a: T): Boolean
  protected def put(b: BloomFilter, a: T): Unit
  override final def zero: (BloomFilter, Long) =
    (BloomFilter.create(capacity, fpp), 0L)
  override final def reduce(b: (BloomFilter, Long),
                            a: T): (BloomFilter, Long) =
    if (a == null) b
    else if (admits(b._1, a)) b
    else { put(b._1, a); (b._1, b._2 + 1L) }
  override final def merge(x: (BloomFilter, Long),
                           y: (BloomFilter, Long)): (BloomFilter, Long) = {
    x._1.mergeInPlace(y._1)
    (x._1, x._2 + y._2)
  }
  override final def finish(b: (BloomFilter, Long)): Array[Byte] =
    if (b._2 > capacity) Array.empty[Byte]
    else {
      val bos = new java.io.ByteArrayOutputStream()
      b._1.writeTo(bos)
      bos.toByteArray
    }
  override final def bufferEncoder
      : org.apache.spark.sql.Encoder[(BloomFilter, Long)] =
    org.apache.spark.sql.Encoders.javaSerialization[(BloomFilter, Long)]
  override final def outputEncoder
      : org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

private[operators] final class LongKeyBloomAgg(capacity: Long, fpp: Double)
  extends KeyBloomAgg[java.lang.Long](capacity, fpp) {
  import org.apache.spark.util.sketch.BloomFilter
  override protected def admits(b: BloomFilter, a: java.lang.Long): Boolean =
    b.mightContainLong(a)
  override protected def put(b: BloomFilter, a: java.lang.Long): Unit = {
    b.putLong(a); ()
  }
}

private[operators] final class StringKeyBloomAgg(capacity: Long, fpp: Double)
  extends KeyBloomAgg[String](capacity, fpp) {
  import org.apache.spark.util.sketch.BloomFilter
  override protected def admits(b: BloomFilter, a: String): Boolean =
    b.mightContainString(a)
  override protected def put(b: BloomFilter, a: String): Unit = {
    b.putString(a); ()
  }
}
