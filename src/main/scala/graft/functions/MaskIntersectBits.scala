package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `mask_intersect_bits(a, b) -> long`: popcount of the bitwise AND of two
 * equal-length ARRAY<BIGINT> bitmasks — |A ∩ B| when each set is packed as
 * ceil(V/64) longs over a fixed ≤[[graft.queries.Dedup]] wide-dense
 * vocabulary.
 *
 * Exists because the wide dense-domain Jaccard path evaluates set
 * intersections on hundreds of millions of banded candidate pairs per
 * round; Spark's higher-order `zip_with`/`aggregate` composition for the
 * same arithmetic is a CodegenFallback (interpreted lambda per element per
 * row), which would dominate the pair loop. This is a tight
 * whole-stage-codegen'd long loop instead.
 *
 * Caller contract: both arrays are the same length with no null elements
 * (both produced by the same mask-build expression over the same
 * vocabulary); a shorter array is treated as zero-padded.
 */
case class MaskIntersectBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: LongType, _), ArrayType(_: LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"mask_intersect_bits requires two ARRAY<BIGINT> inputs, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "mask_intersect_bits"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    MaskIntersectBits.andPopcount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MaskIntersectBits.andPopcount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaskIntersectBits =
    copy(left = newLeft, right = newRight)
}

object MaskIntersectBits {
  /** Σ popcount(a[i] & b[i]) over the common prefix of the two masks. */
  def andPopcount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0L
    while (i < n) {
      c += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    c
  }
}
