package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `sorted_intersect_size(a, b) -> long`: |A ∩ B| for two SORTED, distinct
 * STRING arrays, via a single merge pass — no per-row hash set, no result
 * array allocation.
 *
 * Exists because the exact-verify stage of the dedup operators
 * ([[graft.queries.Dedup]]) evaluates set intersections on millions of
 * candidate pairs; Spark's `array_intersect` builds a hash map and a new
 * array per evaluation, which dominated the query's runtime. Both inputs
 * are produced with `sort_array(array_distinct(...))`, so the linear merge
 * is sufficient and exact.
 *
 * Caller contract: both arrays ascending-sorted and duplicate-free with no
 * null elements; violating it undercounts silently.
 */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size requires two ARRAY<STRING> inputs, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_size"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.mergeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectSize.mergeCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Merge-count of two ascending sorted duplicate-free string arrays. */
  def mergeCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
