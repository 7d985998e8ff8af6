package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment for LARGE centroid sets.
  *
  * The literal-struct argmax (Similarity.centStructs) embeds every
  * centroid vector as a codegen literal: at the k a 100-TB IVF needs
  * (10³–10⁵ cells) that blows the generated method past the JIT limit
  * and the class constant pool — a codegen bomb. This expression keeps
  * the same map-side zero-exchange argmax but ships the centroid
  * matrix as ONE plan-referenced object (`ctx.addReferenceObj`):
  * codegen emits a single call into a tight JVM loop, the matrix rides
  * to executors once inside the serialized task binary (Spark's
  * torrent-broadcast path, the same mechanism a broadcast-join build
  * side uses), and generated-code size is independent of k.
  *
  * Arithmetic is replicated from the literal path EXACTLY so both
  * branches agree row-for-row and the same DuckDB oracle covers
  * either: left-to-right double accumulation over the element order,
  * `csim = round(dot/(nrm·cnorm), 6)` with Spark's double-round
  * semantics (NaN/Inf pass through, else HALF_UP at 6 dp), argmax with
  * Catalyst's total double ordering (NaN greatest), ties to the LOWER
  * centroid id (ids are scanned in ascending order; only a strictly
  * greater similarity displaces the incumbent).
  */
final class CentroidIndex(val ids: Array[Long],
                          val vecs: Array[Array[Double]],
                          val norms: Array[Double]) extends Serializable {
  require(ids.length == vecs.length && ids.length == norms.length,
    "centroid index arrays must be parallel")

  // Content-based equality (round-11 advice): NearestCentroid is a
  // case class embedding this object, so Catalyst canonicalization —
  // exchange reuse, common-subexpression elimination — compares
  // expressions through it. With default reference equality two
  // NearestCentroid nodes built from IDENTICAL centroid sets across
  // plan rebuilds would never canonicalize equal and reuse would
  // silently miss (never falsely merge — but the missed reuse is
  // real). norms are derived from vecs, so (ids, vecs) determine
  // equality; norms still participate for defense in depth.
  override def equals(o: Any): Boolean = o match {
    case that: CentroidIndex =>
      java.util.Arrays.equals(ids, that.ids) &&
        java.util.Arrays.equals(norms, that.norms) &&
        vecs.length == that.vecs.length &&
        vecs.indices.forall(i => java.util.Arrays.equals(vecs(i), that.vecs(i)))
    case _ => false
  }

  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(ids) + java.util.Arrays.hashCode(norms)

  /** Argmax over all centroids for one row's vector. `isFloat` is the
    * corpus element type (resolved once at plan time). */
  def assign(vec: ArrayData, isFloat: Boolean, nrm: Double): Long = {
    var best = Double.NegativeInfinity
    var bestId = Long.MinValue
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      val n = math.min(vec.numElements(), cv.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        d += x * cv(i)
        i += 1
      }
      val raw = d / (nrm * norms(c))
      // Spark's Round on DoubleType: NaN/Infinity unchanged, else
      // scala BigDecimal (decimal-string semantics) HALF_UP — the
      // same rounding F.round applies in the literal branch
      val csim =
        if (java.lang.Double.isFinite(raw))
          BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else raw
      // Double.compare is Catalyst's double ordering: NaN above every
      // value, so a degenerate all-NaN row still deterministically
      // takes the lowest centroid id (strict > keeps the first seen)
      if (java.lang.Double.compare(csim, best) > 0) {
        best = csim
        bestId = ids(c)
      }
      c += 1
    }
    bestId
  }
}

/** `nearest_centroid(vec, nrm)` → LongType centroid id, over a
  * plan-shipped [[CentroidIndex]]. Stays inside whole-stage codegen
  * (one virtual call per row; the k·dim flops dominate at any k this
  * path is chosen for). */
case class NearestCentroid(vec: Expression, nrm: Expression,
                           index: CentroidIndex) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = nrm
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (vecOk && nrm.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid needs (array<float|double>, double), got " +
          s"${vec.dataType.catalogString} / ${nrm.dataType.catalogString}")
  }

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, n: Any): Any =
    index.assign(v.asInstanceOf[ArrayData], isFloat, n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ONE reference object regardless of k — generated code size is
    // constant; the matrix itself never enters the constant pool
    val idx = ctx.addReferenceObj("centroidIndex", index,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = $idx.assign($v, $isFloat, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, nrm = newRight)
}

object CentroidAssign {
  import org.apache.spark.sql.graftbridge

  /** Column-level handle: cell id of the cosine-nearest centroid. */
  def nearestCentroid(vec: Column, nrm: Column, index: CentroidIndex): Column =
    graftbridge.toColumn(NearestCentroid(
      graftbridge.toExpression(vec), graftbridge.toExpression(nrm), index))
}
