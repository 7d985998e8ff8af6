package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  *
  * Each query is forced through the `noop` sink rather than
  * `.count()`: count() lets Catalyst prune the whole projection away,
  * which would benchmark the scan, not the operator. noop executes the
  * full physical plan (codegen, shuffles, sort) and discards rows. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated query-name filter for targeted
    // profiling (noise triage, per-operator iteration); the driver
    // never sets it, so graded runs always cover the full set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val benched = only.fold(SparkEntry.queries)(sel =>
      SparkEntry.queries.filter { case (k, _) => sel(k) })
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: run every query once against the target SF so the
    // timed passes measure steady-state execution (codegen cache, JIT,
    // file-footer metadata) rather than first-touch costs
    benched.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // median of 3 timed passes per query: one contended/GC-unlucky
    // pass on a shared box can otherwise record a 10-40x outlier and
    // poison the recorded baseline for every later round.
    // Passes are INTERLEAVED round-robin (pass 1 of every query, then
    // pass 2, ...): back-to-back passes of one query all land in the
    // same contended stretch of a shared box, so a per-query median
    // alone cannot remove a box-noise episode — spreading each
    // query's samples across the whole run can.
    val passes = 3
    val names = benched.toSeq.sortBy(_._1)
    val samples = Array.fill(names.size)(Vector.empty[Double])
    for (_ <- 0 until passes; i <- names.indices) {
      val (name, fn) = names(i)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      samples(i) :+= (System.nanoTime() - t0) / 1e9
    }
    val results = names.indices.map { i =>
      val sorted = samples(i).sorted
      names(i)._1 -> sorted(sorted.size / 2)
    }
    // The driver captures only a bounded tail of this process's output
    // and parses the JSON line out of it, so the line must (a) be the
    // LAST thing printed — after spark.stop(), so no shutdown logging
    // can follow it — and (b) stay short: millisecond precision keeps
    // ~70 per-query entries well under the driver's 2000-char tail
    // buffer (full nanosecond doubles overflowed it and the line was
    // truncated mid-parse in rounds 1-3).
    // Locale.ROOT: a comma-decimal default locale would otherwise
    // emit invalid JSON
    def ms3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Try: a shutdown race (e.g. streaming state-store threads) must
    // not swallow the JSON line the driver parses — emit it regardless
    scala.util.Try(spark.stop())
    println(s"""{"metric":"total","value":${ms3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
