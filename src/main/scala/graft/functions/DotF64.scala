package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `dot_f64(a, b) -> double`: index-ordered dot product of two equal-length
 * ARRAY<DOUBLE> columns.
 *
 * Exists because the higher-order spelling
 * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` interprets two lambdas per
 * element and allocates the zipped array — the dominant cost of the
 * similarity-search operators, which evaluate a dot product per
 * (vector × anchor) and per candidate pair. Summation order is the array
 * index order, identical to the folded aggregate it replaces (and to the
 * oracle's generate_series sum), so results are bit-identical.
 */
case class DotF64(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_f64 requires two ARRAY<DOUBLE> inputs, got ${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_f64"

  // length mismatch → NULL, matching the aggregate(zip_with(...)) spelling
  // this expression replaces (zip_with null-pads the shorter side and the
  // null poisons the sum): a truncated/malformed embedding must flag the
  // row, not return a plausible-looking partial dot product
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    if (ad.numElements() != bd.numElements()) null
    else DotF64.dot(ad, bd)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotF64.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

object DotF64 {
  /** Index-ordered sum of products over the common prefix length. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
