package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `affine_minhash(hashes) -> array<long>`: the full MinHash signature in
 * one pass — for each permutation j, `min_i(hashes[i]·a(j) + b(j))`.
 *
 * Exists because the natural DataFrame spelling — one
 * `array_min(transform(...))` per permutation — evaluates an interpreted
 * lambda per (element × permutation) and allocates a permuted array per
 * row per permutation; with 32 permutations that dominated the LSH
 * pipeline. Here the k×n loop runs as primitive Java inside whole-stage
 * codegen with a single output allocation.
 *
 * Overflow contract (same as the expression form it replaces): callers
 * fold hashes to 32 bits and keep a(j), b(j) < 2^31, so `h·a + b` never
 * exceeds Long range — Spark 4 runs ANSI mode, silent wraparound would be
 * an error. Returns null for a null or empty input array.
 */
// the permutation constants are Seq (structural equality), not Array
// (identity equality): case-class equality feeds Catalyst semanticEquals,
// and identity-equal params would block common-subexpression elimination
// and exchange reuse between textually identical minhash calls
case class AffineMinHash(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {

  require(a.length == b.length, "affine_minhash: a and b must have equal length")

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"affine_minhash requires ARRAY<BIGINT> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "affine_minhash"

  protected override def nullSafeEval(h: Any): Any =
    AffineMinHash.compute(h.asInstanceOf[ArrayData], aArr, bArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val resTerm = ctx.freshName("minhashRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $resTerm =
         |  graft.functions.AffineMinHash.compute($c, $aRef, $bRef);
         |if ($resTerm == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resTerm;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AffineMinHash =
    copy(child = newChild)
}

object AffineMinHash {
  /** k minima of the affine-permuted hash array; null on empty input. */
  def compute(h: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = h.numElements()
    if (n == 0) return null
    val k = a.length
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val aj = a(j)
      val bj = b(j)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = h.getLong(i) * aj + bj
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }
}
