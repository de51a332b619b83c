package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the relational operators the dense driver
  * fixture can't isolate. */
class RelationalSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q29SoleLateSupplier: sole late supplier in multi-supplier orders; single-supplier and multi-late orders drop") {
    import spark.implicits._
    val dir = tmpSfDir()
    val d0 = "2024-01-01"
    val late = "2024-05-01"   // 121 days after d0 — past the 90-day fence
    val ontime = "2024-01-10"
    val li = Seq(
      // o1: s1 late, s2 on time → sole late s1
      (1L, 1L, ts(late)), (1L, 2L, ts(ontime)),
      // o2: s1 and s3 both late → not sole → dropped
      (2L, 1L, ts(late)), (2L, 3L, ts(late)),
      // o3: single-supplier order, late → no other supplier → dropped
      (3L, 1L, ts(late)),
      // o4: s2 late, s1 on time → sole late s2
      (4L, 2L, ts(late)), (4L, 1L, ts(ontime)))
    writeTable(dir, "lineitem", li.toDF("l_orderkey", "l_suppkey", "l_shipdate"))
    writeTable(dir, "orders",
      Seq((1L, ts(d0)), (2L, ts(d0)), (3L, ts(d0)), (4L, ts(d0)))
        .toDF("o_orderkey", "o_orderdate"))
    writeTable(dir, "supplier",
      Seq((1L, "S One"), (2L, "S Two"), (3L, "S Three"))
        .toDF("s_suppkey", "s_name"))
    val out = Relational.q29SoleLateSupplier(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "S One", 1L), (2L, "S Two", 1L)),
      s"got ${out.toSeq}")
  }
}
