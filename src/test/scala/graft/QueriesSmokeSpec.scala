package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Smoke: every driver-contract query runs at sf0.001 and is deterministic
 * (two runs, identical collected results). The value-level correctness gate
 * is the DuckDB oracle (tools/oracle_check.py / the driver's CORRECTNESS
 * run); this spec catches runtime regressions cheaply in `sbt test`.
 */
class QueriesSmokeSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is deterministic at sf0.001") {
      val r1 = fn(spark, sfDir).collect().map(_.toString)
      val r2 = fn(spark, sfDir).collect().map(_.toString)
      assert(r1.sameElements(r2), s"$name not deterministic")
    }
  }
}
