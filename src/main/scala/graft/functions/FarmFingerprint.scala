package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `farm_fingerprint(string|binary) -> long` as a native Catalyst expression.
 *
 * BigQuery-compatible FARM_FINGERPRINT (see [[FarmHash]]). Implemented as an
 * `Expression` with `doGenCode` (not a UDF) so it participates in whole-stage
 * codegen and filters built on it remain pushdown-friendly — the reference's
 * hash-mod sampling filters sit directly on this function
 * (`/root/reference/backend/controller/ml_model/templates/model_bqml.sql:95-101`).
 */
case class FarmFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"farm_fingerprint requires STRING or BINARY input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "farm_fingerprint"

  protected override def nullSafeEval(input: Any): Any = child.dataType match {
    case _: StringType => FarmHash.fingerprint64(input.asInstanceOf[UTF8String].getBytes)
    case BinaryType    => FarmHash.fingerprint64(input.asInstanceOf[Array[Byte]])
    case other => throw new IllegalStateException(s"farm_fingerprint: unsupported type $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case _: StringType => s"graft.functions.FarmHash.fingerprint64($c.getBytes())"
      case _             => s"graft.functions.FarmHash.fingerprint64($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): FarmFingerprint =
    copy(child = newChild)
}
