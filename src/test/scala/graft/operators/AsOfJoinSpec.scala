package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  private def quotes = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
      ("b", 15L, 9.0)
    ).toDF("k", "t", "px")
  }

  test("backward picks the latest right row at or before each left time") {
    val s = spark
    import s.implicits._
    val trades = Seq(("a", 5L), ("a", 20L), ("a", 25L), ("b", 100L))
      .toDF("k", "t")
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "t", "t",
        Seq("t" -> "qt", "px" -> "qpx"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(out === Array(
      ("a", 5L, -1L, -1.0),   // before any quote -> NULL (left join)
      ("a", 20L, 20L, 2.0),   // equal time matches (inclusive)
      ("a", 25L, 20L, 2.0),   // strictly-before quote wins over later one
      ("b", 100L, 15L, 9.0))) // keys never cross
  }

  test("right-side time ties resolve to the greatest payload, deterministically") {
    val s = spark
    import s.implicits._
    val right = Seq(("a", 10L, 1.0), ("a", 10L, 7.0), ("a", 10L, 3.0))
      .toDF("k", "t", "px")
    val left = Seq(("a", 10L), ("a", 99L)).toDF("k", "t")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t",
        Seq("px" -> "qpx"))
      .orderBy("t").collect().map(_.getDouble(2))
    assert(out === Array(7.0, 7.0))
  }

  test("matches a per-row max-subquery oracle on random data") {
    val s = spark
    import s.implicits._
    val left = s.range(500).select(
      (col("id") % 7).as("k"), (col("id") * 13 % 1000).as("t")).distinct()
    val right = s.range(300).select(
      (col("id") % 7).as("k"), (col("id") * 29 % 1000).as("t"),
      col("id").as("payload"))
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "t",
      Seq("t" -> "rt", "payload" -> "payload"))
    // oracle: max (rt, payload) struct over the admissible range per left row
    val oracle = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left_outer")
      .groupBy(col("l.k").as("k"), col("l.t").as("t"))
      .agg(max(struct(col("r.t"), col("r.payload"))).as("m"))
      .select(col("k"), col("t"), col("m.t").as("rt"), col("m.payload").as("payload"))
    assert(got.exceptAll(oracle).isEmpty && oracle.exceptAll(got).isEmpty)
  }

  test("forward picks the earliest right row at or after each left time") {
    val s = spark
    import s.implicits._
    val trades = Seq(("a", 5L), ("a", 20L), ("a", 35L), ("b", 1L)).toDF("k", "t")
    val out = AsOfJoin.forward(trades, quotes, Seq("k"), "t", "t",
        Seq("t" -> "qt", "px" -> "qpx"))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(out === Array(
      ("a", 5L, 10L, 1.0),    // next quote after 5
      ("a", 20L, 20L, 2.0),   // equal time matches (inclusive)
      ("a", 35L, -1L, -1.0),  // after the last quote -> NULL
      ("b", 1L, 15L, 9.0)))
  }

  test("forward matches a per-row min-subquery oracle on random data") {
    val s = spark
    import s.implicits._
    val left = s.range(500).select(
      (col("id") % 7).as("k"), (col("id") * 13 % 1000).as("t")).distinct()
    val right = s.range(300).select(
      (col("id") % 7).as("k"), (col("id") * 29 % 1000).as("t"),
      col("id").as("payload"))
    val got = AsOfJoin.forward(left, right, Seq("k"), "t", "t",
      Seq("t" -> "rt"))
    // forward picks min rt among admissible rows; project rt only so the
    // oracle's tie choice cannot differ
    val oracle = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") >= col("l.t"), "left_outer")
      .groupBy(col("l.k").as("k"), col("l.t").as("t"))
      .agg(min(col("r.t")).as("rt"))
    assert(got.exceptAll(oracle).isEmpty && oracle.exceptAll(got).isEmpty)
  }

  test("NULL times never match: right NULL-time rows are excluded, left NULL-time rows get NULL") {
    val s = spark
    import s.implicits._
    val right = Seq(("a", Some(10L), 1.0), ("a", None, 99.0)).toDF("k", "t", "px")
    val left = Seq(("a", Some(5L)), ("a", Some(10L)), ("a", None)).toDF("k", "t")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("px" -> "qpx"))
      .collect().map(r => (if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).sortBy(_._1)
    // t=5: only the NULL-time quote is admissible-looking but must NOT match;
    // t=10: matches px=1.0; t=NULL: never matches anything
    assert(out === Array((-1L, -1.0), (5L, -1.0), (10L, 1.0)))
    // forward direction: same contract (the reversed sort must keep
    // NULL-time left rows at the frame head, not hand them every row)
    val fwd = AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("px" -> "qpx"))
      .collect().map(r => (if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).sortBy(_._1)
    assert(fwd === Array((-1L, -1.0), (5L, 1.0), (10L, 1.0)))
  }

  test("helper/output column collisions are rejected") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 2L)).toDF("k", "t")
    val bad = Seq((1L, 2L)).toDF("k", "__side")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, bad, Seq("k"), "t", "__side", Seq("__side" -> "x"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, l, Seq("k"), "t", "t", Seq("t" -> "t"))
    }
    intercept[IllegalArgumentException] { // duplicate payload outputs
      AsOfJoin.backward(l, l, Seq("k"), "t", "t", Seq("t" -> "x", "k" -> "x"))
    }
    intercept[IllegalArgumentException] { // dotted output breaks field access
      AsOfJoin.backward(l, l, Seq("k"), "t", "t", Seq("t" -> "a.b"))
    }
  }
}
