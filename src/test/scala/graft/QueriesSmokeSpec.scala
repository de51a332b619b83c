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
      // cache-ownership gate (VERDICT r06 nit 1): whatever a query build
      // persists — DataFrame caches AND checkpoint RDD blocks — must be
      // released by the query's own QueryCaches scope after its action,
      // NOT by a harness clearCache(). Snapshot first: earlier suites may
      // legitimately hold caches this spec doesn't own.
      spark.catalog.clearCache()
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val r1 = fn(spark, sfDir).collect().map(_.toString)
      val r2 = fn(spark, sfDir).collect().map(_.toString)
      assert(r1.sameElements(r2), s"$name not deterministic")
      // the release listener fires on the async listener bus — poll
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      def leaked() = (spark.sparkContext.getPersistentRDDs.keySet -- before)
      while (leaked().nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(leaked().isEmpty,
        s"$name leaked persisted RDDs past its action: ids ${leaked().mkString(",")}")
    }
  }
}
