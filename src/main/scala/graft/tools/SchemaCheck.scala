package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SchemaCheck {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("orders","lineitem","documents","embeddings","events")) {
      println(s"== $t"); spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").printSchema()
    }
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val n = o.filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))).count()
    println(s"ts-literal filter count: $n")
    o.select(min("o_orderdate"), max("o_orderdate")).show(false)
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.select(min("ts"), max("ts"), expr("max(ts % 1000000) as ns_part")).show(false)
    e.show(3, 60)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").show(3, 80)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr("vec_id","size(embedding) as dim","label").show(3)
    spark.stop()
  }
}
