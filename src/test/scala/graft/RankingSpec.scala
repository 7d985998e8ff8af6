package graft

import graft.operators.Ranking
import org.apache.spark.sql.{functions => F}

/** Laws for the distributed dense-id primitive: the ids must be
  * gapless, 1-based, in sort order, and identical across partition
  * counts and re-runs — the properties the broadcast-offset numbering
  * could silently lose if the count pass and the numbering pass ever
  * saw different range boundaries.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = scala.util.Random.shuffle((1 to 400).toList)
    .map(i => (i.toLong, s"v$i"))

  test("denseIds: gapless 1..n in sort order, stable across partition counts") {
    val df = rows.toDF("k", "v")
    val want = rows.sortBy(_._1).zipWithIndex
      .map { case ((k, _), i) => k -> (i + 1L) }.toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = Ranking.denseIds(df.repartition(5), Seq(F.col("k")), parts)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("rn")).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("denseIds: re-running the returned frame reproduces the same ids") {
    val out = Ranking.denseIds(rows.toDF("k", "v"), Seq(F.col("k")), 4)
    val a = out.collect().map(r => (r.getLong(0), r.getAs[Long]("rn"))).sorted
    val b = out.collect().map(r => (r.getLong(0), r.getAs[Long]("rn"))).sorted
    assert(a.sameElements(b),
      "second action re-executed the lineage with different boundaries")
  }

  test("equiDepthBins: near-equal depths, ordered non-overlapping value ranges") {
    val df = rows.toDF("k", "v").withColumn("x", F.col("k") * 3 % 101)
    val bins = Ranking.equiDepthBins(df,
        Seq(F.col("x"), F.col("k")), "x", nBins = 8, nPartitions = 4)
      .orderBy("bin").collect()
    assert(bins.length == 8)
    val sizes = bins.map(_.getAs[Long]("n_rows"))
    assert(sizes.sum == 400 && sizes.max - sizes.min <= 1,
      s"equi-depth violated: ${sizes.mkString(",")}")
    // rank-ordered bins: each bin's min is >= the previous bin's max
    // (equal is legal — ties split by the rank tiebreaker)
    bins.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("min_value") >= lo.getAs[Long]("max_value"),
        s"bins overlap: $lo / $hi")
    }
  }
}
