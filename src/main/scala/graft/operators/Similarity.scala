package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Similarity search over embedding columns (north-star extension):
  * brute-force cosine top-k as the exact baseline, sign-LSH banded
  * near-dup pairs, and an IVF-style bucketed variant (with an
  * optional k-means centroid trainer) as the scale paths.
  *
  * Scale design:
  *  - The query set is always broadcast; the corpus is scanned once,
  *    never collected.
  *  - Dot products run through [[graft.plans.DotProduct]] — a native
  *    codegen'd Catalyst expression, no UDF, no per-row JVM boxing.
  *    Norms are precomputed per side so each pair costs one dot.
  *  - Brute force is O(|corpus|·|queries|) but embarrassingly
  *    parallel — correct baseline at any scale, wall-clock bounded by
  *    queries count. IVF reduces scanned candidates to the probed
  *    cells only; sign-LSH bounds the near-dup pair space to bucket
  *    collisions; recall < 1 by construction for both, with the
  *    trade documented per operator.
  */
object Similarity {

  /** Allocation-free codegen'd dot product (graft.plans.DotProduct);
    * double accumulation in element order, bit-compatible with the
    * `zip_with`/`aggregate` composition and the DuckDB oracle. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k.
    *
    * `queries` must be small (it is broadcast). Result: one row per
    * (query, rank) with the matched id and the cosine similarity
    * rounded to 6 dp (rounding makes rank ties deterministic and
    * engine-portable). Self-matches are excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms are precomputed per side — each pair then costs exactly
    // one dot product instead of three
    val q = F.broadcast(queries.select(
      F.col(idCol).as("query_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm")))
    val scored = corpus.select(F.col(idCol).as("match_id"), F.col(vecCol).as("c_vec"),
        norm(F.col(vecCol)).as("c_nrm"))
      .join(q, F.col("match_id") =!= F.col("query_id"))
      .withColumn("sim", F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    scored
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select("query_id", "match_id", "sim", "rank")
  }

  /** Aggregator-based top-k (scale path): same result as
    * [[bruteForceTopK]], but candidates are reduced map-side to ≤ k
    * rows per query by [[graft.plans.TopKAggregator]] BEFORE the
    * shuffle — the exchange moves O(queries × k) rows instead of the
    * full |corpus| × |queries| candidate set that the window
    * formulation sorts. */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = F.broadcast(queries.select(
      F.col(idCol).as("query_id"), F.col(vecCol).as("q_vec"),
      norm(F.col(vecCol)).as("q_nrm")))
    val scored = corpus.select(F.col(idCol).as("match_id"), F.col(vecCol).as("c_vec"),
        norm(F.col(vecCol)).as("c_nrm"))
      .join(q, F.col("match_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("match_id"),
        F.round(dot(F.col("q_vec"), F.col("c_vec")) /
          (F.col("q_nrm") * F.col("c_nrm")), 6).as("sim"))
      .as[(Long, Long, Double)]
    val agg = new graft.plans.TopKAggregator(k)
    scored.groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (qid, items) =>
        items.iterator.zipWithIndex.map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
      }
      .toDF("query_id", "match_id", "sim", "rank")
  }

  /** Metadata-FILTERED similarity search: exact top-k over only the
    * corpus vectors whose id appears in `allowedIds` (the
    * lang/quality/source predicate of a retrieval pipeline). The
    * filter is applied BEFORE any scoring — as a semi-join on the id,
    * so no disallowed vector is ever scored, and (with a small or
    * pre-aggregated allow-list) it broadcasts; when the metadata
    * lives in the corpus table itself, pass the predicate to
    * `corpus.filter` instead and it pushes into the parquet scan.
    * Post-filtering top-k results would instead under-fill k whenever
    * the filter is selective — the classic filtered-ANN mistake. */
  def filteredTopK(corpus: DataFrame, allowedIds: DataFrame,
                   queries: DataFrame, idCol: String, vecCol: String,
                   k: Int): DataFrame =
    bruteForceTopK(
      corpus.join(allowedIds.select(idCol), Seq(idCol), "left_semi"),
      queries, idCol, vecCol, k)

  /** Symmetric int8 scalar quantization of a float embedding: each
    * vector is scaled by `127 / max(|x_i|)` and the elements rounded
    * to integers in [-127, 127] (`floor(x·scale + 0.5)` — plain
    * half-up, bit-identical on any IEEE engine, unlike banker's
    * `round`). Zero vectors quantize to zero via the `greatest`
    * guard. All arithmetic is double → the oracle replays it exactly. */
  def quantize(vec: Column): Column = {
    val maxAbs = F.array_max(F.transform(vec, x => F.abs(x.cast("double"))))
    val scale = F.lit(127.0) / F.greatest(maxAbs, F.lit(1e-30))
    F.transform(vec, x => F.floor(x.cast("double") * scale + 0.5).cast("long"))
  }

  /** Exact cosine top-k over int8-QUANTIZED vectors — the
    * shuffle-byte scale path: a 64-dim float32 embedding is 256 B on
    * the wire; its int8 twin is 64 B (and the codegen'd integer dot
    * is SIMD-friendly). On a 100 TB corpus the quantized scan +
    * exchange moves 4× less data for a recall@10 loss that
    * ExtensionsSpec pins ≥ 0.9 against the float [[bruteForceTopK]].
    *
    * Scores are the cosine of the QUANTIZED vectors: the integer dot
    * and integer norms are exact (no FP accumulation-order hazard at
    * all — the one top-k variant whose scores are engine-identical by
    * construction), divided once and rounded to 6 dp for rank
    * stability. Self-matches excluded; `queries` broadcast. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    def side(d: DataFrame, idAs: String, qAs: String, nAs: String): DataFrame =
      d.select(F.col(idCol).as(idAs), quantize(F.col(vecCol)).as(qAs))
        .withColumn(nAs, F.sqrt(F.aggregate(
          F.transform(F.col(qAs), x => x * x), F.lit(0L), (acc, x) => acc + x)
          .cast("double")))
    val q = F.broadcast(side(queries, "query_id", "q_q", "q_nrm"))
    val scored = side(corpus, "match_id", "c_q", "c_nrm")
      .join(q, F.col("match_id") =!= F.col("query_id"))
      .withColumn("sim", F.round(
        F.aggregate(F.zip_with(F.col("q_q"), F.col("c_q"), (a, b) => a * b),
          F.lit(0L), (acc, x) => acc + x).cast("double") /
          F.greatest(F.col("q_nrm") * F.col("c_nrm"), F.lit(1e-30)), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    scored
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select("query_id", "match_id", "sim", "rank")
  }

  /** Deterministic 60-bit md5 hash of a string — the Scala-side twin
    * of `Text.hash60` (same value as DuckDB
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), used to seed the
    * sign-LSH hyperplanes reproducibly on both engines. */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Rademacher (±1) hyperplane weights for sign-LSH: component d of
    * plane p is +1 iff bit 0 of md5("hp{p}_{d}") is 0 — reproducible
    * in any engine with md5. */
  private[graft] def hyperplane(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => if ((hash60(s"hp${p}_$d") & 1L) == 0L) 1.0 else -1.0)

  /** Embedding near-duplicate pairs ≥ cosine threshold, banded by
    * random-hyperplane sign buckets (SimHash-for-vectors).
    *
    * Each vector gets `planes` sign bits (sign of the dot product
    * against an md5-seeded ±1 hyperplane); the bits are grouped into
    * `bands` buckets and two vectors are candidates iff they agree on
    * ALL bits of at least one band — an equi-join on (band_idx,
    * bucket), never the n² cross space. Exact cosine then verifies
    * candidates only.
    *
    * Recall at true angle θ is `1-(1-(1-θ/π)^r)^b` (r bits per band)
    * — a documented trade, deterministic on both engines: the DuckDB
    * oracle replays the identical hyperplanes and banding. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, planes: Int = 16,
                   bands: Int = 4): DataFrame =
    signLshBanded(df, idCol, vecCol, planes, bands) match {
      case None => emptyPairs(df, idCol)
      case Some(banded) =>
        scoredBandJoin(banded, banded, idCol, threshold,
          F.col("id_a") < F.col("id_b"))
    }

  /** Cross-split sign-LSH matches: rows NOT matching `benchPred`
    * (training) paired with rows matching it (benchmark) at cosine ≥
    * `threshold`, candidates from shared LSH bands only. The
    * embedding-space analogue of [[Dedup.minhashCrossPairs]] — the
    * shape of SEMANTIC decontamination: an eval item paraphrased
    * beyond n-gram or shingle overlap still lands in the same
    * hyperplane buckets as its source. Both sides band from one scan
    * of `df`; pair volume is bucket-governed, never
    * |training| × |benchmark|. */
  def crossNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        benchPred: Column, threshold: Double,
                        planes: Int = 16, bands: Int = 4): DataFrame =
    signLshBanded(df, idCol, vecCol, planes, bands) match {
      case None => emptyPairs(df, idCol)
      case Some(banded) =>
        scoredBandJoin(banded.filter(!benchPred), banded.filter(benchPred),
          idCol, threshold, F.lit(true))
    }

  private def emptyPairs(df: DataFrame, idCol: String): DataFrame =
    df.limit(0).select(F.col(idCol).as("id_a"),
      F.col(idCol).as("id_b"), F.lit(0.0).as("sim"))

  /** One (id, vec, band_idx, bucket) row per input row per band:
    * `planes` hyperplane sign bits grouped into `bands` buckets.
    * None when the frame has no sized vector to probe the embedding
    * width from. */
  private def signLshBanded(df: DataFrame, idCol: String, vecCol: String,
                            planes: Int, bands: Int): Option[DataFrame] = {
    require(planes % bands == 0, "bands must divide planes")
    val bitsPerBand = planes / bands
    // O(1) scalar probe for the embedding width (drives the literal
    // weight vectors; never collects data rows). An empty or
    // null-vector-first frame has no width to probe.
    val dimRow = df.select(F.size(F.col(vecCol)).as("d"))
      .filter(F.col("d") > 0).head(1)
    if (dimRow.isEmpty) return None
    val dim = dimRow(0).getInt(0)
    val bits = (0 until planes).map { p =>
      F.when(F.round(dot(F.col(vecCol), F.typedlit(hyperplane(p, dim))), 6) >= 0, 1)
        .otherwise(0).as(s"__bit$p")
    }
    val signed = df.select(F.col(idCol) +: F.col(vecCol) +: bits: _*)
    val bandCols = (0 until bands).map { b =>
      val bucket = (0 until bitsPerBand)
        .map(i => F.col(s"__bit${b * bitsPerBand + i}") * (1 << i))
        .reduce(_ + _)
      F.struct(F.lit(b).as("band_idx"), bucket.as("bucket")).as(s"bb$b")
    }
    // norms are precomputed per banded row (map-side, pre-join) —
    // each candidate pair then costs exactly one dot product. The id
    // column keeps its name so split predicates (crossNearDupPairs)
    // resolve against the banded frame.
    Some(signed
      .select(F.col(idCol), F.col(vecCol),
        F.explode(F.array(bandCols: _*)).as("bb"))
      .select(F.col(idCol), F.col(vecCol).as("__lsh_vec"),
        norm(F.col(vecCol)).as("__lsh_nrm"),
        F.col("bb.band_idx").as("band_idx"), F.col("bb.bucket").as("bucket")))
  }

  /** Equi-join two banded frames on (band_idx, bucket), score with
    * exact cosine, keep pairs at `threshold` passing `pairPred`. */
  private def scoredBandJoin(left: DataFrame, right: DataFrame,
                             idCol: String, threshold: Double,
                             pairPred: Column): DataFrame = {
    val l = left.select(F.col(idCol).as("id_a"),
      F.col("__lsh_vec").as("v_a"), F.col("__lsh_nrm").as("n_a"),
      F.col("band_idx"), F.col("bucket"))
    val r = right.select(F.col(idCol).as("id_b"),
      F.col("__lsh_vec").as("v_b"), F.col("__lsh_nrm").as("n_b"),
      F.col("band_idx"), F.col("bucket"))
    // score and threshold-filter BEFORE the pair dedup: the cosine is
    // codegen'd map-side work on the join output, so a pair colliding
    // in several bands is scored at most `bands` times (cheap), while
    // deduping first would shuffle every candidate WITH both raw
    // vectors attached — at 64 floats a side that is ~30x the bytes
    // of the (id_a, id_b, sim) rows that survive the threshold
    l.join(r, Seq("band_idx", "bucket"))
      .filter(pairPred)
      .withColumn("sim", F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6))
      .filter(F.col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .dropDuplicates("id_a", "id_b")
  }

  /** IVF-style ANN (scale path).
    *
    * Coarse quantization: `centroids` (small by contract — a sample
    * or upstream k-means; collected once and shipped as literal
    * vectors) partition the corpus into cells by nearest-centroid;
    * each query probes its `nprobe` nearest cells and ranks only
    * those candidates.
    *
    * Cell assignment is a per-row argmax over the centroid literals —
    * pure map-side work inside codegen, ZERO exchange (the previous
    * formulation exploded corpus × centroids through a `row_number`
    * window shuffle). The only shuffle left is the final per-query
    * rank over probed-cell candidates. Ties on cell similarity go to
    * the lower centroid id on both engines (lexicographic max over
    * `(csim, -cent_id)` here; `ORDER BY csim DESC, cent_id ASC` in
    * the oracle). Recall trades off with nprobe by construction. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int,
              maxDriverQueryRows: Int = 10000): DataFrame = {
    val cents = collectCentroids(centroids, idCol, vecCol)
    require(cents.nonEmpty, "ivfTopK needs at least one centroid")

    val corpusCells = corpus
      .select(F.col(idCol).as("match_id"), F.col(vecCol).as("c_vec"),
        norm(F.col(vecCol)).as("c_nrm"))
      .withColumn("cell", cellOf(cents, F.col("c_vec"), F.col("c_nrm")))

    val queryCells = probeQueryCells(corpus.sparkSession, queries, cents,
      idCol, vecCol, nprobe, maxDriverQueryRows)

    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    corpusCells.join(F.broadcast(queryCells), Seq("cell"))
      .filter(F.col("match_id") =!= F.col("query_id"))
      .withColumn("sim", F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm")), 6))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select("query_id", "match_id", "sim", "rank")
  }

  /** Query-side probe resolution shared by [[ivfTopK]] and
    * [[ivfResidualTopK]]: each query's `nprobe` cosine-nearest cells,
    * resolved on the DRIVER. Queries are eagerly collect()ed at
    * plan-BUILD time (they are small by the same contract that lets
    * them broadcast — callers handing a lazy / expensive frame here
    * pay its evaluation immediately), and resolving their nprobe
    * cells in Scala halves the generated-code volume (the corpus side
    * is the only remaining centroid-literal tree — at ~100 centroids
    * the duplicated codegen dominated this operator's wall-clock as
    * pure plan-compile overhead). Arithmetic mirrors cellStructs
    * exactly: left-to-right double accumulation, HALF_UP rounding at
    * 6 dp, ties to the lower centroid id.
    *
    * The small-query contract is ENFORCED, not just documented: the
    * limit() bounds the collect itself (at most maxDriverQueryRows+1
    * rows ever reach the driver, pushed into the scan as a plan
    * limit), so a corpus-sized query frame fails fast with a clear
    * message instead of silently OOMing the driver at scale.
    * Returns (query_id, q_vec, q_nrm, cell). */
  private[operators] def probeQueryCells(spark: org.apache.spark.sql.SparkSession,
                              queries: DataFrame,
                              cents: Array[(Long, Seq[Float], Double)],
                              idCol: String, vecCol: String, nprobe: Int,
                              maxDriverQueryRows: Int): DataFrame = {
    import spark.implicits._
    val collectedQueries = queries
      .select(F.col(idCol).cast("long"), F.col(vecCol))
      .limit(maxDriverQueryRows + 1)
      .collect()
    require(collectedQueries.length <= maxDriverQueryRows,
      s"IVF query frame exceeds maxDriverQueryRows=$maxDriverQueryRows: " +
        "queries are collected to the driver by contract (they must be " +
        "small enough to broadcast). Pass a sampled/filtered query frame, " +
        "or raise maxDriverQueryRows explicitly if the driver can hold it.")
    collectedQueries
      .toSeq
      .flatMap { r =>
        val qid = r.getLong(0)
        val qv = r.getSeq[Float](1)
        var acc = 0.0; qv.foreach(x => acc += x.toDouble * x.toDouble)
        val qnrm = math.sqrt(acc)
        cents.map { case (cid, cv, cnorm) =>
          var d = 0.0
          var i = 0
          while (i < qv.length) { d += qv(i).toDouble * cv(i).toDouble; i += 1 }
          val raw = d / (qnrm * cnorm)
          // a zero-norm (or empty) query yields NaN — rank it below
          // every real similarity instead of crashing in BigDecimal.
          // Deliberately NOT Spark's ordering: Catalyst sorts NaN
          // ABOVE every double, so the old in-plan formulation would
          // have probed the cells in the opposite order for a
          // degenerate query. "A meaningless similarity probes last"
          // is the defensible semantics, so we keep it and document
          // the divergence here.
          val csim =
            if (java.lang.Double.isFinite(raw))
              BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            else Double.NegativeInfinity
          (qid, qv, qnrm, cid, csim)
        }
          .sortBy { case (_, _, _, cid, csim) => (-csim, cid) }
          .take(nprobe)
          .map { case (qid2, qv2, qnrm2, cid, _) => (qid2, qv2, qnrm2, cid) }
      }
      .toDF("query_id", "q_vec", "q_nrm", "cell")
  }

  /** IVF with per-cell int8 RESIDUAL quantization (IVF-SQ8 — the
    * bounded-memory index layout): each corpus vector is stored as
    * its cell id, one double scale, and the int8-quantized RESIDUAL
    * `vec − centroid(cell)`. Residuals are much smaller in magnitude
    * than raw vectors (the centroid absorbs the shared component), so
    * the same 8 bits carry more precision than whole-vector
    * quantization — the standard coarse-quantizer + fine-code split
    * of an inverted-file index.
    *
    * Memory/scale: a 64-dim float32 corpus row is 256 B; the residual
    * row is 64 B + 8 B scale + 8 B cell — ~4× less index memory and
    * shuffle volume, independent of centroid count (at 10⁵ centroids
    * the centroid table itself is the only full-precision state, and
    * it is k×dim, never corpus-sized). Queries stay full-precision;
    * candidates are scored against the RECONSTRUCTED vector
    * `centroid + residual/scale` — all-double IEEE arithmetic,
    * rounded at 6 dp, so the DuckDB oracle replays it exactly.
    * Recall vs the float IVF at the same nprobe is pinned ≥ 0.85 in
    * ExtensionsSpec (the quantization distortion costs a few points
    * on top of the probe loss; both trades are documented). */
  def ivfResidualTopK(corpus: DataFrame, queries: DataFrame,
                      centroids: DataFrame, idCol: String, vecCol: String,
                      k: Int, nprobe: Int,
                      maxDriverQueryRows: Int = 10000): DataFrame = {
    val cents = collectCentroids(centroids, idCol, vecCol)
    require(cents.nonEmpty, "ivfResidualTopK needs at least one centroid")
    val spark = corpus.sparkSession

    // centroid lookup frame (k rows, broadcast): the residual join
    // needs the centroid VECTOR per corpus row, which the argmax
    // expression deliberately does not emit
    import spark.implicits._
    val centDf = F.broadcast(
      cents.toSeq.map { case (cid, cv, _) => (cid, cv.map(_.toDouble)) }
        .toDF("cell", "c_cent"))

    // the stored index row: (cell, match_id, scale, int8 residual).
    // quantize() is the same symmetric int8 formula as quantizedTopK —
    // scale = 127/max|r_i|, half-up rounding, zero-vector guard.
    val residual = F.zip_with(F.col("c_vec"), F.col("c_cent"),
      (x, c) => x.cast("double") - c)
    val indexed = corpus
      .select(F.col(idCol).as("match_id"), F.col(vecCol).as("c_vec"),
        norm(F.col(vecCol)).as("c_nrm"))
      .withColumn("cell", cellOf(cents, F.col("c_vec"), F.col("c_nrm")))
      .join(centDf, Seq("cell"))
      .withColumn("r", residual)
      .withColumn("scale",
        F.lit(127.0) / F.greatest(
          F.array_max(F.transform(F.col("r"), x => F.abs(x))), F.lit(1e-30)))
      .withColumn("q_res", F.transform(F.col("r"),
        x => F.floor(x * F.col("scale") + 0.5).cast("long")))
      .select("cell", "match_id", "c_cent", "scale", "q_res")

    val queryCells = probeQueryCells(spark, queries, cents,
      idCol, vecCol, nprobe, maxDriverQueryRows)

    // reconstruct approx = centroid + residual/scale and score the
    // full-precision query against it — double end to end
    val approx = F.zip_with(F.col("c_cent"), F.col("q_res"),
      (c, r) => c + r / F.col("scale"))
    val aDot = F.aggregate(
      F.zip_with(F.col("q_vec"), F.col("a_vec"),
        (q, a) => q.cast("double") * a),
      F.lit(0.0), (acc, x) => acc + x)
    val aNrm = F.sqrt(F.aggregate(
      F.transform(F.col("a_vec"), x => x * x), F.lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    indexed.join(F.broadcast(queryCells), Seq("cell"))
      .filter(F.col("match_id") =!= F.col("query_id"))
      .withColumn("a_vec", approx)
      .withColumn("sim", F.round(aDot / (F.col("q_nrm") * aNrm), 6))
      .withColumn("rank", F.row_number().over(w).cast("long"))
      .filter(F.col("rank") <= k)
      .select("query_id", "match_id", "sim", "rank")
  }

  /** IVF-PQ top-k (the third rung of the quantization ladder after
    * float IVF and IVF-SQ8): each corpus vector is stored as its cell
    * id plus `m` sub-codes — the residual `vec − centroid(cell)` is
    * split into `m` equal subvectors and each replaced by the id of
    * its nearest codebook entry. Index row = cell + m small ints
    * (8 B at m=8), versus 64 B for SQ8 and 256 B for float — the
    * memory ladder that lets a 10⁹-vector index fit a cluster's RAM.
    *
    * Codebooks here are built DETERMINISTICALLY by sampling: per
    * subspace, the residual slices of the `codesPerSub` lowest-id
    * corpus rows. Sampled codebooks trade a few recall points against
    * kmeans-trained ones, but make "which code encodes which row" a
    * pure function of the corpus an external engine can replay — the
    * same sampled-vs-trained trade the stride-centroid IVF documents,
    * applied one level down. Encoding is an argmin over codebook
    * literals (first-min tie-break, matching SQL's ORDER BY dist, j);
    * candidates are scored against `centroid + concat(codebook[s][
    * code_s])`, all-double arithmetic rounded at 6 dp so the oracle
    * replays it exactly. Recall@10 vs the float IVF at the same
    * nprobe is pinned in ExtensionsSpec. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String, k: Int, nprobe: Int,
                m: Int, codesPerSub: Int, rerank: Int = 0,
                maxDriverQueryRows: Int = 10000): DataFrame = {
    require(rerank == 0 || rerank >= k,
      s"rerank shortlist ($rerank) must be 0 (off) or >= k ($k)")
    val cents = collectCentroids(centroids, idCol, vecCol)
    require(cents.nonEmpty, "ivfPqTopK needs at least one centroid")
    val dim = cents.head._2.length
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(codesPerSub >= 1, s"bad codesPerSub=$codesPerSub")
    val subDim = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._

    val centDf = F.broadcast(
      cents.toSeq.map { case (cid, cv, _) => (cid, cv.map(_.toDouble)) }
        .toDF("cell", "c_cent"))
    val residual = F.zip_with(F.col("c_vec"), F.col("c_cent"),
      (x, c) => x.cast("double") - c)
    val resFrame = corpus
      .select(F.col(idCol).as("match_id"), F.col(vecCol).as("c_vec"),
        norm(F.col(vecCol)).as("c_nrm"))
      .withColumn("cell", cellOf(cents, F.col("c_vec"), F.col("c_nrm")))
      .join(centDf, Seq("cell"))
      .withColumn("r", residual)

    // sampled codebooks: residual slices of the codesPerSub lowest-id
    // rows — a bounded driver collect (codesPerSub × dim doubles)
    val cbRows: Array[Array[Double]] = resFrame
      .select(F.col("match_id"), F.col("r"))
      .orderBy("match_id").limit(codesPerSub)
      .collect().map(_.getSeq[Double](1).toArray)
    require(cbRows.nonEmpty, "empty corpus — no codebook rows")
    val codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => cbRows.map(_.slice(s * subDim, (s + 1) * subDim)))

    // encode via a per-partition loop, NOT an expression tree: as
    // m × codesPerSub aggregates the encode is a 128-subexpression
    // codegen unit whose janino compile dominates the query (measured
    // ~3 s of the 4.9 s total at sf0.1). The loop computes the SAME
    // left-to-right squared-distance folds with the SAME first-min
    // tie-break, so the oracle replay is unchanged; per-partition
    // imperative scoring over a broadcast codebook is the documented
    // mapPartitions exception (a model applied row-wise).
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val indexed = resFrame
      .select(F.col("cell"), F.col("match_id"), F.col("c_cent"), F.col("r"))
      .as[(Long, Long, Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val cbs = bcCb.value
        it.map { case (cell, id, cent, r) =>
          // encode AND reconstruct in one pass: the approximation
          // centroid + codebook[s][code_s] depends only on this
          // corpus row, so materializing it here (64 doubles — the
          // same width SQ8 ships) keeps the per-candidate scoring
          // expression small
          val a = cent.toArray
          var s = 0
          while (s < m) {
            val cb = cbs(s)
            var best = 0; var bestD = Double.MaxValue
            var j = 0
            while (j < cb.length) {
              var d = 0.0; var i = 0
              while (i < subDim) {
                val x = r(s * subDim + i) - cb(j)(i); d += x * x; i += 1
              }
              if (d < bestD) { bestD = d; best = j } // strict: first min wins
              j += 1
            }
            var i = 0
            while (i < subDim) {
              a(s * subDim + i) = cent(s * subDim + i) + cb(best)(i); i += 1
            }
            s += 1
          }
          (cell, id, a.toSeq)
        }
      }
      .toDF("cell", "match_id", "a_vec")

    val queryCells = probeQueryCells(spark, queries, cents,
      idCol, vecCol, nprobe, maxDriverQueryRows)

    val aDot = F.aggregate(
      F.zip_with(F.col("q_vec"), F.col("a_vec"),
        (q, a) => q.cast("double") * a),
      F.lit(0.0), (acc, x) => acc + x)
    val aNrm = F.sqrt(F.aggregate(
      F.transform(F.col("a_vec"), x => x * x), F.lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("match_id").asc)
    val pqRanked = indexed.join(F.broadcast(queryCells), Seq("cell"))
      .filter(F.col("match_id") =!= F.col("query_id"))
      .withColumn("sim", F.round(aDot / (F.col("q_nrm") * aNrm), 6))
      .withColumn("rank", F.row_number().over(w).cast("long"))
    if (rerank == 0)
      pqRanked.filter(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    else {
      // two-stage retrieval (the production PQ pattern): the 8 B codes
      // produce a cheap shortlist of `rerank` per query, then ONLY
      // those rows are re-scored against their full-precision vectors
      // — exact-scoring cost drops from |probed cells| to
      // queries × rerank, and the shortlist (tiny) broadcasts onto
      // the corpus for the vector fetch
      val shortlist = pqRanked.filter(F.col("rank") <= rerank)
        .select(F.col("query_id"), F.col("match_id"),
          F.col("q_vec"), F.col("q_nrm"))
      val full = corpus.select(F.col(idCol).as("match_id"),
        F.col(vecCol).as("f_vec"))
      val fDot = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("f_vec"),
          (q, a) => q.cast("double") * a.cast("double")),
        F.lit(0.0), (acc, x) => acc + x)
      val fNrm = F.sqrt(F.aggregate(
        F.transform(F.col("f_vec"), x => x.cast("double") * x.cast("double")),
        F.lit(0.0), (acc, x) => acc + x))
      full.join(F.broadcast(shortlist), Seq("match_id"))
        .withColumn("sim", F.round(fDot / (F.col("q_nrm") * fNrm), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "sim", "rank")
    }
  }

  /** Centroid frame → (id, vec, norm) literals, sorted by id.
    * Centroids are small by contract: one driver collect, then
    * literal vectors (precomputed norms) — never a per-row join.
    * Norm arithmetic matches [[norm]]: left-to-right double
    * accumulation over float values. */
  private[operators] def collectCentroids(centroids: DataFrame, idCol: String,
                               vecCol: String): Array[(Long, Seq[Float], Double)] =
    centroids
      .select(F.col(idCol).cast("long"), F.col(vecCol))
      .collect()
      .map { r =>
        val cid = r.getLong(0)
        val cv = r.getSeq[Float](1)
        var acc = 0.0; cv.foreach(x => acc += x.toDouble * x.toDouble)
        (cid, cv, math.sqrt(acc))
      }
      .sortBy(_._1)

  /** (csim, -cent_id) structs for every centroid — lexicographic
    * max/sort picks best similarity, ties to the LOWER id. Map-side
    * argmax over centroid literals: zero exchange. */
  private def centStructs(cents: Array[(Long, Seq[Float], Double)],
                          vec: Column, nrm: Column): Seq[Column] =
    cents.toSeq.map { case (cid, cv, cnorm) =>
      F.struct(
        F.round(dot(vec, F.typedlit(cv)) / (nrm * F.lit(cnorm)), 6).as("csim"),
        F.lit(-cid).as("neg_id"))
    }

  /** Above this k the literal-struct argmax is a codegen bomb (k
    * centroid vectors in the generated method + constant pool); the
    * plan-shipped [[graft.plans.CentroidIndex]] path takes over. 256
    * literals of dim ≤ ~100 stay comfortably inside JIT limits; a
    * 100-TB IVF runs k in the 10³–10⁵ range and always takes the
    * index path. */
  private[graft] val MaxLiteralCentroids = 256

  /** Cell id of the cosine-nearest centroid — the ONE argmax both
    * [[assignCells]] and [[ivfTopK]] use. Zero exchange either way:
    * k ≤ [[MaxLiteralCentroids]] embeds centroid literals in codegen;
    * larger k ships the matrix once per plan as a reference object and
    * loops in the JVM. Both branches share arithmetic bit-for-bit
    * (same rounding, same tie rule), pinned by ApproxSpec. */
  private def cellOf(cents: Array[(Long, Seq[Float], Double)],
                     vec: Column, nrm: Column): Column =
    cellOfStrategy(cents, vec, nrm, MaxLiteralCentroids)

  /** [[cellOf]] with the literal/index cutover exposed — the spec
    * seam that pins both physical strategies to identical
    * assignments on the same centroid set. */
  private[graft] def cellOfStrategy(cents: Array[(Long, Seq[Float], Double)],
                                    vec: Column, nrm: Column,
                                    maxLiteral: Int): Column =
    if (cents.length <= maxLiteral)
      -F.array_max(F.array(centStructs(cents, vec, nrm): _*))
        .getField("neg_id")
    else
      graft.plans.CentroidAssign.nearestCentroid(vec, nrm,
        new graft.plans.CentroidIndex(
          cents.map(_._1),
          cents.map(_._2.map(_.toDouble).toArray),
          cents.map(_._3)))

  /** SemDeDup-shaped embedding dedup: assign every vector to its
    * cosine-nearest trained centroid (same map-side argmax as
    * [[ivfTopK]] — zero exchange), score only WITHIN-cell pairs, and
    * report every vector that has a >= `threshold` neighbor of lower
    * id in its cell (keep-min-id, the [[graft.operators.Dedup]]
    * convention). Output: `(vec_id, dup_of, sim)` — the dropped
    * vector, its lowest-id duplicate, and that pair's cosine.
    *
    * Scale: this is the clustered formulation of embedding dedup —
    * the pair space is bounded per cell (corpus²/k in expectation,
    * vs corpus² brute force), and k grows with the corpus so cells
    * stay ~constant-sized. The only shuffle is the equi-join on the
    * cell id; no all-pairs join exists at any k.
    *
    * `maxCellSize` bounds the WORST case too: natural embedding
    * distributions are clustered, and one hot cell holding p% of the
    * corpus would otherwise produce (pN)² within-cell pairs —
    * quadratic blowup on exactly the data that most needs dedup.
    * Cells over the cap are hash-split on the id into ~cap-sized
    * blocks (a deterministic md5 split — no skewed window sort, no
    * RNG), pairs are scored exactly within each block, and every
    * member is additionally scored against the cell's min-id
    * representative. Pair volume per cell is thereby ≤
    * size·(cap + 1) instead of size²; a duplicate-dense hot cell
    * (the case the cap exists for) still resolves every member to
    * the true min-id duplicate through the representative pass,
    * while cross-block near-dup pairs whose similarity to the
    * representative falls below threshold are the documented
    * approximation — the same graceful-degradation trade production
    * SemDeDup makes by capping or sub-sampling oversized clusters. */
  def semDedup(corpus: DataFrame, centroids: DataFrame, idCol: String,
               vecCol: String, threshold: Double,
               maxCellSize: Int = 1 << 20): DataFrame =
    semDedupCandidates(corpus, centroids, idCol, vecCol, maxCellSize)
      .withColumn("sim", F.round(
        dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nrm_a") * F.col("nrm_b")), 6))
      .filter(F.col("sim") >= threshold)
      .groupBy(F.col("id_b").as("vec_id"))
      .agg(F.min("id_a").as("dup_of"),
        F.min_by(F.col("sim"), F.col("id_a")).as("sim"))

  /** Cell assignment shared by [[semDedup]] and [[cellSizes]]: every
    * corpus vector mapped to its cosine-nearest centroid with the
    * same map-side argmax as [[ivfTopK]] (ties to the lower id) —
    * zero exchange at any k (see [[cellOf]] for the two physical
    * strategies). Emits (cell, id, vec, nrm). */
  private[operators] def assignCells(corpus: DataFrame, centroids: DataFrame,
                          idCol: String, vecCol: String): DataFrame =
    assignCellsWith(corpus, centroids, idCol, vecCol, MaxLiteralCentroids)

  /** [[assignCells]] with the literal/index cutover exposed for the
    * strategy-agreement spec. */
  private[graft] def assignCellsWith(corpus: DataFrame, centroids: DataFrame,
                                     idCol: String, vecCol: String,
                                     maxLiteral: Int): DataFrame = {
    val cents = collectCentroids(centroids, idCol, vecCol)
    require(cents.nonEmpty, "cell assignment needs at least one centroid")
    corpus
      .select(F.col(idCol).cast("long").as("id"), F.col(vecCol).as("vec"),
        norm(F.col(vecCol)).as("nrm"))
      .withColumn("cell",
        cellOfStrategy(cents, F.col("vec"), F.col("nrm"), maxLiteral))
  }

  /** Cell-balance audit for the kmeans/IVF index: the distribution of
    * cell populations — (cell_size, n_cells) — the dashboard that
    * detects the hot-cell skew [[semDedup]]'s `maxCellSize` defends
    * against and that sizes `nprobe` for [[ivfTopK]]. One map-side
    * argmax and two rollups (k-row intermediate): runs at corpus
    * scan cost, no join anywhere. */
  def cellSizes(corpus: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame =
    assignCells(corpus, centroids, idCol, vecCol)
      .groupBy("cell")
      .agg(F.count(F.lit(1)).as("cell_size"))
      .groupBy("cell_size")
      .agg(F.count(F.lit(1)).as("n_cells"))

  /** Candidate pair frame behind [[semDedup]] — exposed package-side
    * so the spec can pin the capped path's pair-volume bound
    * directly. Emits (id_a, vec_a, nrm_a, id_b, vec_b, nrm_b) with
    * id_a < id_b; duplicate pairs across the block/representative
    * branches are harmless (the consumer aggregates with min). */
  private[graft] def semDedupCandidates(corpus: DataFrame, centroids: DataFrame,
                                        idCol: String, vecCol: String,
                                        maxCellSize: Int): DataFrame = {
    require(maxCellSize >= 2, s"maxCellSize=$maxCellSize must be >= 2")
    // pin the cell assignment ONCE: downstream it fans out into six
    // subtrees (the sizes agg, small×2 sides, big×2 sides, reps), and
    // without the pin each subtree independently re-runs the k-way
    // centroid argmax (and the Lloyd replay upstream of `centroids`)
    // over the whole corpus — a ~6× corpus re-scan whose cost grows
    // with k. Same executor-memory pin/lineage-truncation seam as
    // Dedup.dupComponents: localCheckpoint is right for local[32]; a
    // cluster deployment routes it through a reliable checkpoint dir
    // (see the seam comment at Dedup.dupComponents).
    val cells = assignCells(corpus, centroids, idCol, vecCol)
      .localCheckpoint(true)
    // cell-size audit frame is k rows — broadcast it back onto the
    // members; the only corpus-sized shuffles below key on (cell) or
    // (cell, blk), never on anything pair-shaped
    val sizes = cells.groupBy("cell").agg(F.count(F.lit(1)).as("cell_n"))
    val tagged = cells.join(F.broadcast(sizes), Seq("cell"))
    def sideA(df: DataFrame, keys: String*): DataFrame =
      df.select(keys.map(F.col) :+ F.col("id").as("id_a") :+
        F.col("vec").as("vec_a") :+ F.col("nrm").as("nrm_a"): _*)
    def sideB(df: DataFrame, keys: String*): DataFrame =
      df.select(keys.map(F.col) :+ F.col("id").as("id_b") :+
        F.col("vec").as("vec_b") :+ F.col("nrm").as("nrm_b"): _*)
    val pairCols = Seq("id_a", "vec_a", "nrm_a", "id_b", "vec_b", "nrm_b")
      .map(F.col)
    val small = tagged.filter(F.col("cell_n") <= maxCellSize)
    val smallPairs = sideA(small, "cell").join(sideB(small, "cell"), Seq("cell"))
      .filter(F.col("id_a") < F.col("id_b")).select(pairCols: _*)
    // oversized cells: deterministic ~cap-sized hash blocks. ceil
    // keeps expected block size under the cap; the md5 split is
    // portable (oracle-replayable) and avoids the one-task window
    // sort a rank-based split would force onto the hot cell.
    val big = tagged.filter(F.col("cell_n") > maxCellSize)
      .withColumn("blk", graft.functions.Text.hash60(F.col("id")) %
        F.ceil(F.col("cell_n") / F.lit(maxCellSize.toDouble)).cast("long"))
    val blockPairs = sideA(big, "cell", "blk")
      .join(sideB(big, "cell", "blk"), Seq("cell", "blk"))
      .filter(F.col("id_a") < F.col("id_b")).select(pairCols: _*)
    // representative pass: the cell's min-id member vs every other
    // member — one extra comparison per member, and the reason an
    // all-duplicates hot cell still resolves exactly (everyone meets
    // the true min-id duplicate regardless of block)
    val reps = big.groupBy("cell").agg(F.min("id").as("id"))
      .join(big, Seq("cell", "id")) // ≤ k rep rows rehydrated with vectors
    val repPairs = F.broadcast(sideA(reps, "cell")).join(sideB(big, "cell"), Seq("cell"))
      .filter(F.col("id_a") < F.col("id_b")).select(pairCols: _*)
    smallPairs.unionByName(blockPairs).unionByName(repPairs)
  }

  /** Incremental SemDeDup — the embedding twin of
    * [[graft.operators.Dedup.incrementalNearDedup]], completing the
    * incremental family (exact fingerprints, LSH text near-dup,
    * embedding near-dup): clean an incoming `batch` of vectors
    * against an existing `corpus` without ever re-pairing the corpus
    * with itself. A batch vector is dropped when a ≥ `threshold`
    * cosine neighbor exists in its cell among (a) ANY corpus vector
    * or (b) a LOWER-ID batch vector (in-batch dedup, keep-min-id);
    * survivors are returned as the cleaned batch.
    *
    * Scale: both sides take the same zero-exchange cell assignment as
    * [[semDedup]]; the only joins are cell equi-joins whose pair
    * volume is |batch-cell| × |cell| — batch-bounded, independent of
    * corpus² — and the batch assignment is pinned once before its
    * three consumers. Hot cells are the [[cellSizes]] audit's job
    * here: an incremental pass re-runs per batch, so cap-splitting is
    * deliberately left to the full [[semDedup]] sweep. */
  def semDedupIncremental(corpus: DataFrame, batch: DataFrame,
                          centroids: DataFrame, idCol: String,
                          vecCol: String, threshold: Double): DataFrame = {
    def sim(aV: Column, aN: Column, bV: Column, bN: Column): Column =
      F.round(dot(aV, bV) / (aN * bN), 6)
    val corpusCells = assignCells(corpus, centroids, idCol, vecCol)
      .select(F.col("cell"), F.col("id").as("o_id"),
        F.col("vec").as("o_vec"), F.col("nrm").as("o_nrm"))
    val batchCells = assignCells(batch, centroids, idCol, vecCol)
      .localCheckpoint(true) // feeds both drop joins + the keep list
    val vsCorpus = batchCells.join(corpusCells, Seq("cell"))
      .filter(sim(F.col("vec"), F.col("nrm"),
        F.col("o_vec"), F.col("o_nrm")) >= threshold)
      .select(F.col("id"))
    val vsBatch = batchCells.join(
        batchCells.select(F.col("cell"), F.col("id").as("o_id"),
          F.col("vec").as("o_vec"), F.col("nrm").as("o_nrm")),
        Seq("cell"))
      .filter(F.col("o_id") < F.col("id") &&
        sim(F.col("vec"), F.col("nrm"),
          F.col("o_vec"), F.col("o_nrm")) >= threshold)
      .select(F.col("id"))
    val dropped = vsCorpus.unionByName(vsBatch).distinct()
      .select(F.col("id").cast("long").as(idCol))
    batch.join(dropped, Seq(idCol), "left_anti")
  }

  /** Deterministic spherical Lloyd k-means over the embedding column —
    * the IVF centroid trainer (better cell balance and recall than a
    * raw sample for the same nprobe).
    *
    * Init is the stride sample (first k vectors with `id % (n/k) ==
    * 0`, id order); each round assigns every vector to its
    * cosine-nearest centroid with the same map-side argmax as
    * [[ivfTopK]] (no shuffle beyond the per-cell mean), then recomputes
    * cell means via posexplode + one grouped avg — the per-round
    * driver traffic is k×dim doubles, never corpus rows. Empty cells
    * keep their previous centroid. No RNG anywhere: identical inputs
    * give identical centroids on every run.
    *
    * Returns (cent_id, centroid) with float vectors, directly usable
    * as [[ivfTopK]]'s `centroids` frame. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    require(n > 0 && k > 0, "kmeans needs a non-empty corpus and k > 0")
    val stride = math.max(1L, n / k)
    var cents: Array[Array[Double]] = df
      .filter(F.col(idCol) % stride === 0)
      .orderBy(F.col(idCol)).limit(k)
      .select(F.col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

    for (_ <- 0 until iters) {
      // same literal-vs-index branch as [[cellOf]], but over the
      // DOUBLE-precision training centroids (9-dp means — a float
      // round-trip here would change the trained result): small k
      // embeds double literals, large k ships a CentroidIndex, whose
      // matrix is already double. Norm arithmetic matches in both
      // branches (left-to-right sum of squares).
      val assigned: Column =
        if (k <= MaxLiteralCentroids) {
          val structs = cents.zipWithIndex.map { case (cv, ci) =>
            val cnorm = math.sqrt(cv.map(x => x * x).sum)
            F.struct(
              F.round(dot(F.col(vecCol), F.typedlit(cv.toSeq)) /
                (norm(F.col(vecCol)) * F.lit(cnorm)), 6).as("csim"),
              F.lit(-ci).as("neg_id"))
          }
          -F.array_max(F.array(structs.toIndexedSeq: _*)).getField("neg_id")
        } else
          graft.plans.CentroidAssign.nearestCentroid(
            F.col(vecCol), norm(F.col(vecCol)),
            new graft.plans.CentroidIndex(
              cents.indices.map(_.toLong).toArray,
              cents,
              cents.map(cv => math.sqrt(cv.map(x => x * x).sum))))
      // means are rounded to 9 dp on the driver: avg() merges partial
      // sums in shuffle-fetch order, so the raw double can wobble by
      // an ulp between runs — rounding far above ulp scale restores
      // run-to-run identical centroids (the documented contract).
      // HALF_UP (away from zero), not rint's HALF_EVEN: DuckDB's
      // round() is half-away-from-zero, and the x_ann_kmeans oracle
      // replays this training step with round(avg(x), 9)
      val means = df
        .withColumn("cell", assigned.cast("int"))
        .select(F.col("cell"), F.posexplode(F.col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(F.avg("x").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1))
            .map(r => BigDecimal(r.getDouble(2))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      cents = cents.zipWithIndex.map { case (old, ci) =>
        means.get(ci).map(_.toArray).getOrElse(old)
      }
    }
    spark.createDataFrame(
        cents.zipWithIndex.map { case (cv, ci) =>
          (ci.toLong, cv.map(_.toFloat).toSeq) }.toIndexedSeq)
      .toDF(idCol, vecCol)
  }

  /** Per-group mean embedding in long form: one row per (group, dim)
    * with the dimension's mean and the group size. The distributed
    * building block of centroid/prototype computation (class
    * prototypes, IVF cell seeding, drift monitoring).
    *
    * posexplode + one grouped avg: the shuffle carries (group, dim,
    * partial sum/count) — map-side combined, `groups × dim` result
    * rows regardless of corpus size, no vectors ever collected. Long
    * form rather than an array column deliberately: it re-aggregates
    * incrementally (a new batch folds in via weighted sums) and
    * compares across engines without array-element type pitfalls.
    * Means are rounded to 6 dp — far above the ulp-order wobble of
    * shuffle-merge-order double addition, so results are run-to-run
    * and engine-to-engine stable. */
  def groupCentroids(df: DataFrame, groupCol: String,
                     vecCol: String): DataFrame =
    df.select(F.col(groupCol),
        F.posexplode(F.col(vecCol)).as(Seq("dim", "x")))
      .groupBy(F.col(groupCol), F.col("dim").cast("long").as("dim"))
      .agg(F.round(F.avg(F.col("x").cast("double")), 6).as("centroid"),
        F.count(F.lit(1)).as("n"))
}
