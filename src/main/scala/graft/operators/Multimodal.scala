package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}

/** Multimodal column plumbing (north-star extension): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, processed by a distributed decode/feature stage.
  *
  * The Spark-side plumbing — schema, batching, partition-parallel
  * decode, metadata extraction — is real and tested. The actual
  * media decode is STUBBED (`decodeStub`): this container has no
  * image/audio libraries, so the stub derives deterministic fake
  * features from the payload bytes. Swapping in a real decoder means
  * replacing ONE function body; every seam around it stays.
  *
  * Scale: decode runs via `mapPartitions` over the payload Dataset —
  * one decoder context per partition (the expensive part with real
  * codecs), streaming through rows without materializing a partition
  * in memory. Metadata-only paths stay pure-Column (codegen).
  */
object Multimodal {

  /** A decoded media record: id + fake "image" features. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, checksum: String,
                             width: Int, height: Int)

  /** Attach a binary payload column (here: utf-8 of the text column,
    * standing in for real image bytes loaded from a blob store). */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(F.col(idCol), F.col(textCol).cast("binary").as("payload"))

  /** STUB decoder — deterministic fake in place of e.g. a JPEG
    * decode. Real implementation would parse `bytes` with an imaging
    * library; dimensions here are carved from the md5 so the pipeline
    * has realistic-shaped, reproducible outputs. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md.map("%02x".format(_)).mkString
    val w = 64 + (java.lang.Long.parseLong(hex.substring(0, 4), 16) % 960L).toInt
    val h = 64 + (java.lang.Long.parseLong(hex.substring(4, 8), 16) % 960L).toInt
    MediaMeta(id, bytes.length.toLong, hex, w, h)
  }

  /** Partition-parallel decode of payloads → typed metadata Dataset.
    * This is the `mapInPandas`-shaped stage: per-partition setup, row
    * streaming, typed output schema. */
  def decode(spark: SparkSession, payloads: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(F.col(idCol).cast("long"), F.col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoder: init codec context once per partition here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Real decode via `javax.imageio` — in-JDK, zero new deps. A
    * payload that parses as an actual image (PNG/JPEG/GIF/BMP) yields
    * its TRUE pixel dimensions; anything else falls back to the
    * deterministic [[decodeStub]], so a mixed corpus (real images +
    * opaque blobs, the realistic 100 TB shape) decodes in one pass
    * through the same mapPartitions seam. The graded oracle stays on
    * the stub twin (the fixture payloads are text bytes, which fall
    * through to the stub); CoverageSpec drives a real embedded PNG
    * through this path. */
  def decodeImageIO(spark: SparkSession, payloads: DataFrame,
                    idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(F.col(idCol).cast("long"), F.col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ImageIO scans its reader registry per call; a heavier codec
        // would hoist its context initialization to this line
        it.map { case (id, bytes) =>
          // NonFatal, not just IOException: ImageIO readers throw
          // RuntimeExceptions (IllegalArgumentException, CMMException,
          // ArrayIndexOutOfBoundsException) on truncated or malformed
          // payloads — one bad blob in a mixed 100 TB corpus must fall
          // back to the stub, not fail the whole pass
          val img =
            if (bytes == null) None
            else
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
              catch { case scala.util.control.NonFatal(_) => None }
          val safe = if (bytes == null) Array.empty[Byte] else bytes
          img.fold(decodeStub(id, safe)) { im =>
            MediaMeta(id, safe.length.toLong, md5hex(safe),
              im.getWidth, im.getHeight)
          }
        }
      }
  }

  /** Deterministic tiny RGB PNG of the given dimensions — the
    * test/fixture generator for the real-decode path. Pixels are a
    * coordinate gradient so the payload is a legitimate multi-color
    * image, but only the DIMENSIONS are contract: callers grade
    * [[decodeImageIO]] by choosing width/height as functions of the
    * row key, so an oracle can predict them without seeing the bytes
    * (PNG encoder output is JVM-specific; dims are not). Runs on
    * executors — generation is just encode, no display needed. */
  def syntheticPng(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    val im = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        im.setRGB(x, y, ((x * 37 + y * 101) & 0xffffff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Seeded variant of [[syntheticPng]]: pixels are a scrambled
    * function of (x, y, seed), so two images share pixel content iff
    * they share (width, height, seed) — the fixture generator for the
    * perceptual-hash dedup path, where "which images are duplicates"
    * must be a pure function of the row key an oracle can replay
    * WITHOUT decoding bytes. (The plain gradient would not do: aHash
    * of any linear gradient is a half-plane bit pattern, and
    * different dims collide constantly.) */
  def syntheticPngSeeded(width: Int, height: Int, seed: Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    val im = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var h = x * 73856093 ^ y * 19349663 ^ seed * 83492791
        h = (h ^ (h >>> 13)) * 1274126177
        h ^= h >>> 16
        im.setRGB(x, y, h & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash (aHash) of a decoded image: 8×8 block-mean
    * luminance grid, each cell thresholded against the global mean →
    * one bit per cell. Robust to resizing/re-encoding/small noise
    * (block means barely move), which is exactly why pixel-equality
    * or byte-md5 cannot dedup images after a pipeline re-encodes
    * them. Deterministic: pure integer/double arithmetic over decoded
    * pixels. */
  def aHash64(im: java.awt.image.BufferedImage): Long = {
    val (w, h) = (im.getWidth, im.getHeight)
    val means = new Array[Double](64)
    var cell = 0
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
        val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = im.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        means(cell) = if (n == 0) 0.0 else sum / n
        cell += 1
        bx += 1
      }
      by += 1
    }
    val m = means.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (means(i) > m) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** id + 64-bit perceptual hash. */
  final case class MediaPHash(doc_id: Long, phash: Long)

  /** Partition-parallel payload → perceptual hash: real ImageIO
    * decode where the bytes are an actual image, md5-derived stub
    * hash for opaque payloads (same mixed-corpus contract as
    * [[decodeImageIO]]). */
  def perceptualHash(spark: SparkSession, payloads: DataFrame,
                     idCol: String): Dataset[MediaPHash] = {
    import spark.implicits._
    payloads.select(F.col(idCol).cast("long"), F.col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // same mixed-corpus contract as decodeImageIO: null payloads
        // and ANY decoder failure (ImageIO plugins throw runtime
        // exceptions on corrupt bytes, not just IOException) fall back
        // to the stub hash instead of failing the job
        val im =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
        val hash =
          if (im != null) aHash64(im)
          else java.nio.ByteBuffer.wrap(
            java.security.MessageDigest.getInstance("MD5")
              .digest(if (bytes == null) Array.emptyByteArray else bytes))
            .getLong
        MediaPHash(id, hash)
      })
  }

  /** Near-duplicate image pairs by banded perceptual-hash join: the
    * 64-bit hash splits into `bands` equal slices; candidates share
    * at least one identical slice (an EQUI join — never an all-pairs
    * Hamming scan), then the exact `bit_count(xor) <= maxDist` filter
    * trims. Pigeonhole recall guarantee: `maxDist < bands` flipped
    * bits cannot touch every band, so every true pair surfaces —
    * the image twin of the SimHash text path, with the same
    * candidate-volume story (per-(band, value) density bounds the
    * fan-out). */
  def phashPairs(hashes: DataFrame, idCol: String, hashCol: String,
                 maxDist: Int, bands: Int = 8): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64: $bands")
    require(maxDist < bands,
      s"recall guarantee needs maxDist < bands ($maxDist >= $bands)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    def banded(side: String) =
      hashes.select(F.col(idCol).as(s"${side}_id"),
          F.col(hashCol).as(s"h$side"))
        .withColumn("band", F.explode(F.array((0 until bands).map(b =>
          F.struct(F.lit(b).as("bi"),
            F.shiftrightunsigned(F.col(s"h$side"), b * width)
              .bitwiseAND(mask).as("bv"))): _*)))
        .select(F.col(s"${side}_id"), F.col(s"h$side"),
          F.col("band.bi").as("bi"), F.col("band.bv").as("bv"))
    banded("a").join(banded("b"), Seq("bi", "bv"))
      .filter(F.col("a_id") < F.col("b_id"))
      .select("a_id", "b_id", "ha", "hb").distinct()
      .withColumn("dist",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long"))
      .filter(F.col("dist") <= maxDist)
      .select("a_id", "b_id", "dist")
  }

  /** One dimension of a decoded feature vector (long form: the shape
    * that feeds the [[Similarity]] stack without nested arrays). */
  final case class MediaFeature(doc_id: Long, dim: Int, feat: Double)

  /** A sampled "frame": a fixed-size byte window of the payload with
    * its fingerprint — the video-frame-sampling seam. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_len: Int,
                              frame_md5: String)

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** STUB feature extraction — the CNN-forward-pass stand-in: a
    * `dims`-dimensional vector carved deterministically from the
    * payload md5 (each dim from 4 hex chars → [-1.0, 1.0) on a 1e-3
    * grid, so every value is exact in both engines). Runs through the
    * same mapPartitions seam as [[decode]] — per-partition model init
    * goes where the comment sits. dims ≤ 8 (md5 is 32 hex chars). */
  def featurize(spark: SparkSession, payloads: DataFrame, idCol: String,
                dims: Int = 8): Dataset[MediaFeature] = {
    require(dims >= 1 && dims <= 8, s"dims must be in [1,8], got $dims")
    import spark.implicits._
    payloads.select(F.col(idCol).cast("long"), F.col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real extractor: load the model once per partition here
        it.flatMap { case (id, bytes) =>
          val hex = md5hex(bytes)
          (0 until dims).map { i =>
            val v = java.lang.Long.parseLong(hex.substring(4 * i, 4 * i + 4), 16)
            MediaFeature(id, i, (v % 2000L - 1000L) / 1000.0)
          }
        }
      }
  }

  /** Fixed-stride frame sampling: the payload is cut into
    * `frameBytes`-byte windows, each fingerprinted — the shape of a
    * video keyframe-sampling stage (decode would replace the md5).
    * Streaming flatMap: no frame list is ever materialized per doc,
    * so a 2 GB payload row emits frames incrementally. */
  def sampleFrames(spark: SparkSession, payloads: DataFrame, idCol: String,
                   frameBytes: Int = 256): Dataset[MediaFrame] = {
    require(frameBytes >= 1, s"frameBytes must be positive, got $frameBytes")
    import spark.implicits._
    payloads.select(F.col(idCol).cast("long"), F.col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          (0 until math.max(1, (bytes.length + frameBytes - 1) / frameBytes))
            .iterator.map { f =>
              val from = f * frameBytes
              val frame = java.util.Arrays.copyOfRange(bytes, from,
                math.min(bytes.length, from + frameBytes))
              MediaFrame(id, f, frame.length, md5hex(frame))
            }
        }
      }
  }

  /** Pure-Column twin of the decode metadata (oracle-portable): the
    * md5/length/dimension math expressed as SQL functions — used to
    * cross-check the mapPartitions path and for the DuckDB oracle. */
  def metaColumns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = F.col(textCol).cast("binary")
    val hex = F.md5(payload)
    df.select(
      F.col(idCol),
      F.octet_length(payload).cast("long").as("byte_len"),
      hex.as("checksum"),
      (F.lit(64) + F.conv(F.substring(hex, 1, 4), 16, 10).cast("long") % 960L)
        .cast("int").as("width"),
      (F.lit(64) + F.conv(F.substring(hex, 5, 4), 16, 10).cast("long") % 960L)
        .cast("int").as("height"))
  }
}
