package graft.operators

import graft.schema.{Rule, TableDef}
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Validation engine (SURVEY §2.6 F10/F11) — the reference's
  * per-field rule sets (`meta.php:43-61`) applied table-at-a-time
  * (`model.php:940-1026` runs them per record; we run them as one
  * codegen'd projection over the whole frame).
  *
  * Output shape: one boolean column per (field, rule) named
  * `ok_<field>_<rule-slug>`, plus `n_errors` — flat primitives so the
  * result is oracle-comparable and writable anywhere.
  */
object Validate {

  /** Sanitized column-name slug for a rule. */
  def slug(r: Rule): String =
    r.name.toLowerCase.replaceAll("[^a-z0-9]+", "_").stripSuffix("_")

  /** Evaluate every declared rule; append per-rule booleans and an
    * error count. NULL values fail NotEmpty but pass the rest (the
    * reference only runs value rules on present values,
    * `model.php:995-1010` — rules other than not_empty are
    * vacuously true on NULL). */
  def report(df: DataFrame, t: TableDef,
             context: Option[String] = None): DataFrame = {
    val checks: Seq[(String, Column)] = for {
      f <- t.fields
      r <- f.rulesFor(context)
    } yield {
      val c = F.col(f.name)
      val ok = r match {
        case graft.schema.NotEmpty => r.ok(c)
        case _ => c.isNull || r.ok(c)
      }
      (s"ok_${f.name}_${slug(r)}", ok)
    }
    val withChecks = checks.foldLeft(df) { case (d, (name, ok)) =>
      d.withColumn(name, ok)
    }
    val nErrors = checks.map { case (name, _) =>
      F.when(F.col(name), 0).otherwise(1)
    }.reduceOption(_ + _).getOrElse(F.lit(0))
    withChecks.withColumn("n_errors", nErrors.cast("int"))
  }

  /** Rows passing every rule (the reference throws
    * Validate_Exception on failure; the set-level analogue is a
    * partition into valid/invalid). */
  def valid(df: DataFrame, t: TableDef): DataFrame =
    report(df, t).filter(F.col("n_errors") === 0)
      .select(df.columns.toIndexedSeq.map(F.col): _*)

  def invalid(df: DataFrame, t: TableDef): DataFrame =
    report(df, t).filter(F.col("n_errors") > 0)
}
