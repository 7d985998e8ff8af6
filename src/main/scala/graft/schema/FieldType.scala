package graft.schema

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types._

/** Field type system.
  *
  * Re-expresses the reference's ten field types
  * (`/root/reference/classes/hive/field/<type>.php`) as Spark column
  * transforms instead of per-cell PHP casts:
  *
  *  - `coerce` is the table-at-a-time equivalent of
  *    `Hive_Field::value()` (`field.php:65-80`): empty input becomes
  *    NULL when the field is nullable, else the declared default;
  *    otherwise the value is cast to the field's Spark type.
  *  - `verbose` is `Hive_Field::verbose()` (`field.php:82-87`):
  *    render the typed value for display.
  *
  * Everything stays a Catalyst `Column` expression (codegen-friendly,
  * pushdown-safe) — no UDFs.
  */
sealed trait FieldType {
  def sparkType: DataType

  /** Raw → typed coercion with empty→NULL/default semantics.
    * The reference treats PHP-falsy values as empty
    * (`field/integer.php:13-26`); we pin the saner subset: NULL and
    * blank strings are empty (documented divergence, SURVEY §7).
    * Unparseable non-empty input coerces to the same fallback rather
    * than throwing — PHP casts never error, and Spark 4 runs ANSI-on
    * where a plain `cast` would raise on garbage, so the cast goes
    * through `try_cast`. */
  def coerce(raw: Column, nullable: Boolean = true, default: Option[Any] = None): Column = {
    val empty = raw.isNull || (F.trim(raw.cast(StringType)) === F.lit(""))
    val fallback =
      if (!nullable && default.isDefined) F.lit(default.get).cast(sparkType)
      else F.lit(null).cast(sparkType)
    F.when(empty, fallback).otherwise(F.coalesce(cast(raw), fallback))
  }

  protected def cast(raw: Column): Column = raw.try_cast(sparkType)

  /** Typed → display string. */
  def verbose(typed: Column): Column = typed.cast(StringType)
}

/** Auto-increment integer primary key (`field/auto.php:11-18`).
  * Identity assignment is done by the write path (see
  * [[graft.operators.Writes.insert]]): `max(id) + row_number()`,
  * deterministic within a batch. */
case object FAuto extends FieldType { val sparkType: DataType = LongType }

/** `(int)` cast (`field/integer.php:13-26`). */
case object FInt extends FieldType { val sparkType: DataType = LongType }

/** `(float)` cast with display precision (`field/float.php:16-43`). */
final case class FFloat(decimals: Int = 2) extends FieldType {
  val sparkType: DataType = DoubleType
  override def verbose(typed: Column): Column = F.format_number(typed, decimals)
}

/** `(boolean)` cast; verbose "Yes"/"No" (`field/boolean.php:13-33`). */
case object FBool extends FieldType {
  val sparkType: DataType = BooleanType
  override def verbose(typed: Column): Column =
    F.when(typed, "Yes").otherwise("No")
}

/** `(string)` cast (`field/string.php:13-26`). */
case object FStr extends FieldType { val sparkType: DataType = StringType }

/** String subtype; the email *rule* lives in the rule set
  * (`field/email.php:11-13`, README.md:42-49). */
case object FEmail extends FieldType { val sparkType: DataType = StringType }

/** String subtype constrained to a closed set (`field/enum.php`). */
final case class FEnum(values: Seq[String]) extends FieldType {
  val sparkType: DataType = StringType
}

case object FPassword extends FieldType { val sparkType: DataType = StringType }
case object FText extends FieldType { val sparkType: DataType = StringType }

/** Timestamp with lenient parse and formatted display
  * (`field/timestamp.php:16-45`). The reference stores unix epochs and
  * parses arbitrary strings via `strtotime`; we use TimestampType and a
  * `try_to_timestamp` cascade over a documented format subset
  * (SURVEY §2.6 F2) — no UDF, stays in codegen. */
final case class FTimestamp(format: String = "MM/dd/yyyy") extends FieldType {
  val sparkType: DataType = TimestampType

  override protected def cast(raw: Column): Column = FTimestamp.lenientParse(raw)

  override def verbose(typed: Column): Column = F.date_format(typed, format)
}

object FTimestamp {
  /** `strtotime`-style lenient parsing: ISO datetime, ISO date, US
    * m/d/Y, epoch seconds — first match wins. */
  def lenientParse(raw: Column): Column = {
    val s = F.trim(raw.cast(StringType))
    // try_to_timestamp (never throws) instead of cast — Spark 4 runs
    // with ANSI mode on, where a failed string→timestamp cast errors.
    F.coalesce(
      F.try_to_timestamp(s), // ISO datetime/date, Spark's default parse
      F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss")),
      F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
      F.try_to_timestamp(s, F.lit("MM/dd/yyyy")),
      // bare epoch seconds
      F.when(s.rlike("^\\d{9,11}$"), s.cast(LongType).cast(TimestampType))
    )
  }
}

/** Array-of-float embedding column (north-star extension surface;
  * not in the reference — see FIXTURES.md `embeddings`). */
case object FVector extends FieldType {
  val sparkType: DataType = ArrayType(FloatType)
}

/** Opaque binary payload (multimodal extension surface). */
case object FBinary extends FieldType { val sparkType: DataType = BinaryType }
