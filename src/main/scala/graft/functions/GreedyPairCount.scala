package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `greedy_pair_count(word, pairs) -> long`: the number of subword pieces a
 * greedy left-to-right tokenizer emits for `word` when its merge table is
 * the given set of two-code-point pieces — at each position, consume the
 * 2-cp piece if it is in the table, else fall back to a single code point
 * (the WordPiece/byte-fallback degradation mode with a depth-1 merge
 * table). The pair table rides in as model parameters, encoded
 * `(cp0 << 21) | cp1` (code points < 2^21 by Unicode's definition).
 *
 * Exists because greedy segmentation is inherently iterative — it has no
 * closed form in relational algebra, and spelling it as a per-character
 * higher-order-function chain would interpret two lambdas per code point.
 * One codegen'd call per ROW with a tight primitive loop keeps the
 * (vocabulary-bounded) scan inside whole-stage codegen. The DuckDB oracle
 * computes the identical scan as a recursive CTE.
 *
 * Piece-kind accounting needs no second function: every piece is 1 or 2
 * code points, so `n_pair_pieces = len − n_pieces` and
 * `n_single_pieces = 2·n_pieces − len`.
 */
case class GreedyPairCount(child: Expression, pairs: Seq[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"greedy_pair_count requires a STRING input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "greedy_pair_count"

  @transient private lazy val pairSet: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](math.max(8, pairs.size * 2))
    pairs.foreach(p => s.add(p))
    s
  }

  protected override def nullSafeEval(s: Any): Any =
    GreedyPairCount.count(s.asInstanceOf[UTF8String], pairSet)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("greedyPairSet", pairSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GreedyPairCount.count($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): GreedyPairCount =
    copy(child = newChild)
}

object GreedyPairCount {

  /** Encode a two-code-point piece to its table key. */
  def key(cp0: Int, cp1: Int): Long = (cp0.toLong << 21) | cp1.toLong

  /** Greedy left-to-right piece count; empty string → 0. */
  def count(s: UTF8String, set: java.util.HashSet[java.lang.Long]): Long = {
    val cps = s.toString.codePoints.toArray
    var i = 0
    var n = 0L
    while (i < cps.length) {
      if (i + 1 < cps.length && set.contains(key(cps(i), cps(i + 1)))) i += 2
      else i += 1
      n += 1L
    }
    n
  }
}
