package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed NTILE must agree with Spark's own window NTILE on
  * arbitrary inputs — rank formula and partition-offset plumbing both. */
class QuantilesSpec extends AnyFunSuite with SparkFixture {

  test("ntileFromRank matches the SQL NTILE bucket formula across an (N, n) grid") {
    import spark.implicits._
    // one DataFrame carrying every (total, rank) pair in the sweep keeps
    // this a single Spark job instead of hundreds
    val totals = Seq(1, 2, 3, 7, 10, 11, 99, 100, 101, 256, 400)
    for (n <- Seq(1, 2, 3, 7, 10, 23)) {
      val rows = totals.flatMap(t => (1 to t).map(r => (t.toLong, r.toLong)))
      val df = rows.toDF("total", "rank")
        .withColumn("mine", Quantiles.ntileFromRank(col("rank"), col("total"), n))
        .withColumn("sparks", ntile(n).over(
          Window.partitionBy(col("total")).orderBy(col("rank"))).cast("long"))
      val bad = df.filter(col("mine") =!= col("sparks")).count()
      assert(bad == 0L, s"bucket mismatch for n=$n")
    }
  }

  test("withNtile equals the window NTILE on random data with duplicate keys") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 2000).map(i => (i.toLong, rng.nextInt(50).toDouble))
    val df = rows.toDF("id", "v").repartition(13) // scrambled layout
    val mine = Quantiles.withNtile(df, 10, Seq(col("v"), col("id")), "seg")
      .select(col("id"), col("seg"))
    val ref = df.withColumn("seg",
        ntile(10).over(Window.partitionBy(lit(0)).orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("seg"))
    assert(mine.except(ref).count() == 0 && ref.except(mine).count() == 0)
  }

  test("withGlobalRank assigns each row its exact 1-based rank") {
    import spark.implicits._
    val df = (1 to 997).map(i => ((i * 37) % 997).toLong).toDF("k").repartition(9)
    val ranked = Quantiles.withGlobalRank(df, Seq(col("k")), "r", "tot")
    val rows = ranked.select("k", "r", "tot").collect()
    assert(rows.forall(_.getLong(2) == 997L))
    // values are a permutation of 0..996, so rank must be k+1
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) + 1))
  }

  test("withRunningTotal equals the single-partition window prefix sum") {
    import spark.implicits._
    val df = (1 to 997).map(i => (((i * 37) % 997).toLong, (i % 13).toLong))
      .toDF("k", "v").repartition(9)
    val got = Quantiles.withRunningTotal(df, Seq(col("k")), "v", "cum")
      .select("k", "cum")
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("k"), sum(col("v")).over(w).as("cum"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // NULL values count as 0, like SUM ignoring nulls mid-stream
    val withNulls = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L))).toDF("k", "v")
    val cum = Quantiles.withRunningTotal(withNulls, Seq(col("k")), "v", "cum")
      .orderBy("k").select("cum").collect().map(_.getLong(0))
    assert(cum === Array(5L, 5L, 12L))
  }
}
