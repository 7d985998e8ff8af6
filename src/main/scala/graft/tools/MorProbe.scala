package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for debugging one queries() entry with a full
  * stack trace (Verify logs only the message). Not part of the
  * driver contract. */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.api.Metastore.configure(SparkSession.builder()
      .master("local[4]"))
      .withExtensions(new graft.plans.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val name = if (args.length > 1) args(1) else "x_manifest_delete_mor"
    try {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"ROWS=${df.count()}")
    } catch {
      case t: Throwable => t.printStackTrace()
    }
    spark.stop()
  }
}
