package graft

import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Approximate-sketch operators (HLL++ distinct counts, quantile
  * sketches). Sketch internals are engine-specific, so there is no
  * cross-engine oracle — instead these specs pin the ERROR CONTRACT
  * against the exact operators on the same fixture. At 100 TB the
  * sketches are the operators you actually run (mergeable, fixed
  * memory, one pass); the exact twins they are checked against here
  * are the graded queries (`a4_distinct_agg`, `x_length_quantiles`).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays within its rsd bound on every group") {
    val li = Tables.scan(spark, sf, "lineitem")
    // rsd 0.05 → HLL++ relative standard deviation; 3σ gives a hard
    // spec bound of 15% while typical error is ~2%
    val both = li.groupBy("l_returnflag")
      .agg(F.countDistinct("l_partkey").as("exact"),
        F.approx_count_distinct("l_partkey", 0.05).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (exact, approx) = (r.getAs[Long]("exact"), r.getAs[Long]("approx"))
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.15,
        s"group ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr > 0.15")
    }
  }

  test("approx quantiles bracket the exact percentiles within rank tolerance") {
    val docs = Tables.scan(spark, sf, "documents")
      .withColumn("len", F.length(F.col("text")).cast("double"))
    val eps = 0.02
    val qs = Array(0.25, 0.5, 0.75, 0.95)
    val approx = docs.stat.approxQuantile("len", qs, eps)
    val n = docs.count()
    val sorted = docs.select("len").orderBy("len")
      .collect().map(_.getDouble(0))
    // the sketch contract: the returned value's RANK is within eps*n
    // of the requested quantile's rank (value distance is unbounded)
    qs.zip(approx).foreach { case (q, v) =>
      val lo = math.max(0, math.ceil((q - eps) * n).toInt - 1)
      val hi = math.min(n.toInt - 1, math.floor((q + eps) * n).toInt)
      assert(v >= sorted(lo) && v <= sorted(hi),
        s"q=$q: value $v outside rank window [${sorted(lo)}, ${sorted(hi)}]")
    }
  }

  test("HLL sketches merge: union of per-partition sketches equals whole-table sketch") {
    // the property that makes the sketch scale-safe: partial sketches
    // from independent partitions combine without re-reading data —
    // Spark's partial aggregation relies on exactly this, so the
    // per-group approx on a repartitioned frame must equal the
    // single-partition result bit-for-bit (same sketch algebra)
    val li = Tables.scan(spark, sf, "lineitem").select("l_returnflag", "l_partkey")
    def counts(parts: Int): Map[String, Long] =
      li.repartition(parts).groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.05).as("a"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(1) == counts(8),
      "sketch result depends on partitioning — merge is not order-invariant")
  }
}
