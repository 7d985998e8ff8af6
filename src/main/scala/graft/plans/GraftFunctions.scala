package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - [[GraftFunctions.register]] — runtime registration into an
  *    existing session's function registry (tests, notebooks).
  *  - [[GraftSparkExtensions]] — `SparkSessionExtensions` injection for
  *    `spark.sql.extensions=graft.plans.GraftSparkExtensions` /
  *    `SparkSession.builder().withExtensions(...)` (production: every
  *    session gets the functions at build time).
  */
object GraftFunctions {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "rolling_hash" -> (exprs => RollingHash(exprs(0)))
  )

  def register(spark: SparkSession): Unit = functions.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
  }

  private[plans] def inject(e: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name), builder))
    }
}

class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
