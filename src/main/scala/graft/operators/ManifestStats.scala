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
    * predicates, so the manifest itself stays O(files) small lines. */
  final case class FileStats(rows: Long, cols: Map[String, ColStat],
                             bloomRef: Option[String] = None)

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

  /** `rows:<n>` then `;<col>:<b64min>:<b64max>:<nulls>` per column;
    * a null-only column writes `-` (not a base64 alphabet char) in
    * both bound slots; a bloom side-index reference rides as a
    * `bloomref:<b64 path>` segment ('rows' and 'bloomref' are
    * reserved column names). */
  def encode(fs: FileStats): String =
    ((s"rows:${fs.rows}" +:
      fs.cols.toSeq.sortBy(_._1).map {
        case (c, ColStat(Some((lo, hi)), nulls)) =>
          s"$c:${b64(lo)}:${b64(hi)}:$nulls"
        case (c, ColStat(None, nulls)) => s"$c:-:-:$nulls"
      }) ++ fs.bloomRef.map(r => s"bloomref:${b64(r)}")).mkString(";")

  /** CONTENT-ADDRESSED decode cache: repeated planning over the same
    * snapshot (every DML op re-reads the manifest) would otherwise
    * re-parse O(files) payloads per op — at million-file scale that
    * is minutes of driver time for information that never changes.
    * Keyed by the payload STRING ITSELF, the cache can never serve
    * stale stats: equal payload ⇒ equal decode, and a rewritten file
    * gets a new payload line. Bounded by a clear-on-overflow valve
    * (re-decoding after a clear is only the cold cost again). */
  private val decodeCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileStats]()
  private val DecodeCacheMax = 1 << 20

  /** [[decode]] through the content-addressed cache — the planning
    * hot path ([[ManifestTable.candidateFiles]] and friends). */
  def decodeCached(payload: String): FileStats = {
    val hit = decodeCache.get(payload)
    if (hit != null) return hit
    val v = decode(payload)
    if (decodeCache.size >= DecodeCacheMax) decodeCache.clear()
    decodeCache.putIfAbsent(payload, v)
    v
  }

  def decode(payload: String): FileStats = {
    val parts = payload.split(';').toSeq
    val rows = parts.collectFirst {
      case p if p.startsWith("rows:") => p.stripPrefix("rows:").toLong
    }.getOrElse(-1L)
    val bloomRef = parts.collectFirst {
      case p if p.startsWith("bloomref:") =>
        unb64(p.stripPrefix("bloomref:"))
    }
    val cols = parts
      .filterNot(p => p.startsWith("rows:") || p.startsWith("bloomref:"))
      .flatMap { p =>
        p.split(':') match {
          case Array(c, "-", "-", n) => Some(c -> ColStat(None, n.toLong))
          case Array(c, lo, hi, n) =>
            Some(c -> ColStat(Some((unb64(lo), unb64(hi))), n.toLong))
          case _ => None
        }
      }.toMap
    FileStats(rows, cols, bloomRef)
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
    * lookup-key shapes; they fall to min/max pruning. */
  private def isBloomSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Per-file stats of freshly written files: ONE aggregate over only
    * the new files (the batch just written — never the table).
    * Returns relpath → encoded payload. Stat columns the batch lacks
    * (schema evolution) simply record no bounds — those files stay
    * candidates for predicates on the missing column.
    *
    * `bloomCols` additionally build a per-file Bloom filter per
    * column IN THE SAME aggregate; the filters land in ONE side
    * parquet under the batch's own `data/<token>/` dir (immutable
    * with the data files, swept by vacuum with them) and each file's
    * payload records the reference. An overfull file (more than
    * [[BloomKeyCapacity]] distinct keys) drops its bloom —
    * conservative, never saturated-and-useless. */
  def compute(spark: SparkSession, root: String, relFiles: Seq[String],
              statCols: Seq[String],
              bloomCols: Seq[String] = Seq.empty): Map[String, String] = {
    if (relFiles.isEmpty || (statCols.isEmpty && bloomCols.isEmpty))
      return Map.empty
    val df = spark.read.parquet(relFiles.map(f => s"$root/$f"): _*)
    val present = statCols.filter(df.columns.contains)
      .filter(c => isSupported(df.schema(c).dataType))
    val bloomPresent = bloomCols.filter(df.columns.contains)
      .filter(c => isBloomSupported(df.schema(c).dataType))
    val statAggs: Seq[Column] =
      present.flatMap { c =>
        val dt = df.schema(c).dataType
        Seq(norm(F.min(F.col(c)), dt), norm(F.max(F.col(c)), dt),
          F.sum(F.when(F.col(c).isNull, 1L).otherwise(0L)))
      }
    val bloomAggs: Seq[Column] = bloomPresent.map { c =>
      df.schema(c).dataType match {
        case StringType =>
          F.udaf(new StringKeyBloomAgg(BloomKeyCapacity, BloomFpp),
            org.apache.spark.sql.Encoders.STRING).apply(F.col(c))
        case _ =>
          F.udaf(new LongKeyBloomAgg(BloomKeyCapacity, BloomFpp),
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
    val bloomRef: Option[String] =
      if (bloomRows.isEmpty) None
      else {
        // the rows are already driver-local (one per file×column) —
        // write the sidecar directly through the FS as b64 lines:
        // zero Spark jobs on either side of the seam, and the loader
        // stays job-free too (planning must never launch jobs)
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
    val withBloom = bloomRows.iterator.map(_._1).toSet
    out.map { r =>
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
      rel -> encode(FileStats(rowCount, cols,
        bloomRef.filter(_ => withBloom(rel))))
    }.toMap
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

  /** Load (and cache) one commit's bloom sidecar (`file|col|b64`
    * lines): (file-relpath, column) → filter. Pure driver-side FS
    * read — planning never launches a Spark job. A missing/corrupt
    * sidecar answers empty — blooms are only ever an optimization. */
  def loadBlooms(spark: SparkSession, root: String, ref: String)
      : Map[(String, String), org.apache.spark.util.sketch.BloomFilter] = {
    val key = s"$root/$ref"
    val hit = bloomCache.get(key)
    if (hit != null) return hit
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
        m
      case None =>
        System.err.println(
          s"[graft] bloom sidecar read failed (transient?): $key — " +
            "pruning degrades to bounds for this call")
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
