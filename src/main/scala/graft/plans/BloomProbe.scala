package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType,
  LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** NATIVE Bloom-membership probe over a broadcast
  * [[org.apache.spark.util.sketch.BloomFilter]] — the codegen'd
  * replacement for the `F.udf(bloom.mightContain _)` shape: a Scala
  * UDF boxes every key, breaks the whole-stage-codegen span it sits
  * in, and re-serializes its closure per task; this expression stays
  * inside codegen (one broadcast reference object, a primitive call
  * per row) — the same mechanism Spark's own runtime row-level
  * filters use (`BloomFilterMightContain`), expressed over the
  * `DataFrameStatFunctions.bloomFilter` encoding our builders
  * produce (raw string bytes / raw longs, NOT xxhash64 — the two
  * encodings are incompatible, which is why this is its own
  * expression rather than a reuse of Spark's).
  *
  * Semantics match the UDFs it replaces: NULL keys probe to FALSE
  * (a NULL never equality-joins), never NULL. Strings probe their
  * UTF-8 bytes (`mightContainBinary` — byte-identical to
  * `putString`); integral types probe as longs.
  *
  * The Broadcast handle is deliberately NOT `@transient`: under
  * interpreted/fallback evaluation (codegen compile failure,
  * CODEGEN_FACTORY_MODE=NO_CODEGEN) the expression itself is
  * serialized into the task closure, and a transient handle would
  * deserialize as null and NPE in `eval` on executors. Broadcast
  * handles are designed to travel in closures (the torrent value
  * is fetched lazily per executor), so keeping the field
  * serializable costs only the small handle. */
case class BloomMightContain(child: Expression,
                             bloom: Broadcast[BloomFilter])
  extends UnaryExpression with Predicate {

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"bloom probe supports string and integral keys, got " +
              other.catalogString)
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && (v match {
      case s: UTF8String => bloom.value.mightContainBinary(s.getBytes)
      case l: java.lang.Long => bloom.value.mightContainLong(l)
      case i: java.lang.Integer => bloom.value.mightContainLong(i.toLong)
      case s: java.lang.Short => bloom.value.mightContainLong(s.toLong)
      case b: java.lang.Byte => bloom.value.mightContainLong(b.toLong)
      case other => throw new IllegalStateException(
        s"unsupported bloom probe value $other")
    })
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val filter = s"((${classOf[BloomFilter].getName}) $bloomRef.value())"
    val childGen = child.genCode(ctx)
    val probe = child.dataType match {
      case StringType =>
        s"$filter.mightContainBinary(${childGen.value}.getBytes())"
      case _ => s"$filter.mightContainLong((long) ${childGen.value})"
    }
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = $probe;
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BloomMightContain {
  /** The Column form both call sites use:
    * `df.filter(BloomMightContain.probe(col, bc))`. */
  def probe(key: org.apache.spark.sql.Column,
            bloom: Broadcast[BloomFilter]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.toColumn(
      BloomMightContain(
        org.apache.spark.sql.graftbridge.toExpression(key), bloom))
}
