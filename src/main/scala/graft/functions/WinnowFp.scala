package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `winnow_fp(text) -> array<long>`: MOSS-style winnowing fingerprints —
 * polynomial 32-bit hash of every K-char gram (h = Σ cp[i+j]·31^(K−1−j)
 * mod 2^32 over code points, the exact formula the DuckDB oracle computes
 * in SQL), minimum hash per W-gram sliding window, distinct minima in
 * first-occurrence order.
 *
 * Exists because the same computation as higher-order array expressions
 * (`transform`/`zip_with`/`slice`) is interpreted per ELEMENT — lambda
 * dispatch per character made the fingerprint pass the documents table's
 * most expensive operator. One codegen'd call per ROW with a tight
 * primitive loop is ~50× cheaper and keeps the scan inside whole-stage
 * codegen.
 *
 * Returns null for strings shorter than K+W−1 characters (no complete
 * window exists).
 */
case class WinnowFp(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1, s"winnow_fp gram length k must be >= 1, got $k")
  require(w >= 1, s"winnow_fp window size w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires a STRING input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "winnow_fp"

  protected override def nullSafeEval(s: Any): Any =
    WinnowFp.fingerprints(s.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resTerm = ctx.freshName("winnowRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resTerm =
         |  graft.functions.WinnowFp.fingerprints($c, $k, $w);
         |if ($resTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resTerm;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {

  private val Mask32 = 0xffffffffL

  /** Distinct window-minimum gram hashes; null when no complete window.
    * Intermediate sums stay < 2^43 for K ≤ 8, so a single final mask is
    * exact (31^7·0x10FFFF·8 < 2^63 even for K = 8 full-range code points
    * — masked per gram, never overflowing). */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = s.toString.codePoints.toArray
    val nGrams = cps.length - k + 1
    if (nGrams < w) return null
    val gh = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31 + cps(i + j); j += 1 }
      gh(i) = h & Mask32
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    i = 0
    val nWin = nGrams - w + 1
    while (i < nWin) {
      var mn = gh(i)
      var j = 1
      while (j < w) { if (gh(i + j) < mn) mn = gh(i + j); j += 1 }
      if (seen.add(mn)) out += mn
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
