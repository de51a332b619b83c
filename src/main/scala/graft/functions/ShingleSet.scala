package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `shingle_set(text, n) -> array<string>`: sorted distinct n-word shingles
 * of a space-tokenized string, in one codegen'd pass.
 *
 * Semantics (bit-identical to the composed-expression spelling used by the
 * dedup family, and to the DuckDB oracles):
 *   - words = split on single spaces, empty tokens dropped;
 *   - n = 1: the distinct word set (empty text -> empty array);
 *   - n > 1: all runs of n consecutive words joined by one space; fewer
 *     than n words -> ONE shingle of all words joined (so a 2-word doc
 *     still fingerprints, matching `CASE WHEN len(words) < n` oracles);
 *   - result distinct + sorted in UTF8 binary order (what `sort_array`
 *     uses), so `sorted_intersect_size` can merge-count downstream.
 *
 * Exists because the higher-order spelling — `filter(split(...))` +
 * `transform(sequence(...), i -> concat_ws(...))` + `array_distinct` +
 * `sort_array` — interprets a lambda per word and per shingle and showed
 * up as the dominant cost of every shingle-based dedup operator
 * (crmint-class corpora re-run it in several plan subtrees). One tight
 * byte-scanning loop per ROW keeps the whole scan stage inside
 * whole-stage codegen.
 */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle_set requires n >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires a STRING input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "shingle_set"

  protected override def nullSafeEval(s: Any): Any =
    ShingleSet.build(s.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleSet.build($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  private val Space = ' '.toByte

  /** Sorted distinct shingle array; operates on raw UTF-8 bytes (space is
    * ASCII, so byte scanning never splits a multi-byte code point). */
  def build(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // word boundaries: starts(i) inclusive, ends(i) exclusive
    var nWords = 0
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var i = 0
    val len = bytes.length
    while (i < len) {
      if (bytes(i) != Space) {
        val s = i
        while (i < len && bytes(i) != Space) i += 1
        if (nWords == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nWords * 2)
          ends = java.util.Arrays.copyOf(ends, nWords * 2)
        }
        starts(nWords) = s
        ends(nWords) = i
        nWords += 1
      } else i += 1
    }

    def joined(from: Int, count: Int): UTF8String = {
      // words joined by single spaces (collapses any original space runs)
      var sz = if (count > 0) count - 1 else 0
      var j = from
      while (j < from + count) { sz += ends(j) - starts(j); j += 1 }
      val out = new Array[Byte](sz)
      var off = 0
      j = from
      while (j < from + count) {
        if (j > from) { out(off) = Space; off += 1 }
        val wl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), out, off, wl)
        off += wl
        j += 1
      }
      UTF8String.fromBytes(out)
    }

    val set = new java.util.TreeSet[UTF8String]()
    if (n == 1 || nWords == 0) {
      // blank text is [] for EVERY n — without the nWords==0 guard the
      // short-doc branch below emits [""] and all blank docs become
      // mutual exact duplicates under n-gram dedup
      var j = 0
      while (j < nWords) { set.add(joined(j, 1)); j += 1 }
    } else if (nWords < n) {
      set.add(joined(0, nWords)) // degenerate short doc: one whole-text shingle
    } else {
      var j = 0
      while (j <= nWords - n) { set.add(joined(j, n)); j += 1 }
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
