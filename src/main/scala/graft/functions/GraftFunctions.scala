package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/**
 * Registration + Column-level API for graft's custom Catalyst expressions.
 *
 * `register(spark)` installs them into the session's function registry so
 * they are usable from SQL text (the BQ-dialect layer relies on this for
 * `FARM_FINGERPRINT` in user scripts).
 */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    if (!isRegistered(spark)) {
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("farm_fingerprint"),
        new ExpressionInfo(classOf[FarmFingerprint].getName, "farm_fingerprint"),
        (children: Seq[Expression]) => FarmFingerprint(children.head))
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("sorted_intersect_size"),
        new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
        (children: Seq[Expression]) => SortedIntersectSize(children(0), children(1)))
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("winnow_fp"),
        new ExpressionInfo(classOf[WinnowFp].getName, "winnow_fp"),
        (children: Seq[Expression]) => WinnowFp(children(0),
          children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int]))
    }
  }

  private def isRegistered(spark: SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("farm_fingerprint"))

  /** BigQuery-compatible FARM_FINGERPRINT as a Column op (requires register). */
  def farm_fingerprint(c: Column): Column = call_function("farm_fingerprint", c)

  /** |A ∩ B| of two sorted distinct string arrays (requires register). */
  def sorted_intersect_size(a: Column, b: Column): Column =
    call_function("sorted_intersect_size", a, b)

  /** Distinct winnowing fingerprints of a string (requires register). */
  def winnow_fp(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("winnow_fp", text, lit(k), lit(w))
  }
}
