package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin-Karp) rolling hash of a string:
  * `h = fold(code_0, (acc, c) => (acc * multiplier + c) mod p)` over
  * the string's UTF-16 code units, seeded with the first unit —
  * matching `list_reduce(list_transform(...ord...), (a,b) ->
  * (a*M + b) % P)` in ANSI SQL engines for ASCII text.
  *
  * This is the incremental-update hash family used for document
  * fingerprinting and char-shingle dedup: the same recurrence lets a
  * sliding window add/remove one character in O(1). Codegen'd to a
  * tight loop — no per-row allocation.
  *
  * multiplier and mod stay below 2^31 so every intermediate fits in
  * 63 bits (portable to engines that error on int64 overflow).
  */
case class RollingHash(child: Expression,
                       multiplier: Long = 1000003L,
                       mod: Long = 2147483647L)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) 0L
    else {
      var acc = s.charAt(0).toLong % mod
      var i = 1
      while (i < s.length) {
        acc = (acc * multiplier + s.charAt(i).toLong) % mod
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |if (!$s.isEmpty()) {
         |  $acc = ((long) $s.charAt(0)) % ${mod}L;
         |  for (int $i = 1; $i < $s.length(); $i++) {
         |    $acc = ($acc * ${multiplier}L + (long) $s.charAt($i)) % ${mod}L;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.graftbridge

  def rollingHash(c: Column): Column =
    graftbridge.toColumn(RollingHash(graftbridge.toExpression(c)))
}
