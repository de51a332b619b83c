package graft.core

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifetime ownership ([[QueryCaches]]): persists reported inside an
  * `owned` build are released after the FIRST action over the returned
  * plan — for both direct actions (collect) and writer commands (the
  * Verify parquet write / Bench noop write path, whose QueryExecution
  * wraps the query in a command node). */
class QueryCachesSpec extends AnyFunSuite with SparkFixture {

  private def newRddIds(before: Set[Int]): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- before

  private def awaitReleased(before: Set[Int]): Set[Int] = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (newRddIds(before).nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    newRddIds(before)
  }

  private def build(): DataFrame = QueryCaches.owned(spark) {
    import spark.implicits._
    val base = (1 to 100).toDF("n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    QueryCaches.report(base)
    base.groupBy(($"n" % 10).as("k")).count()
  }

  test("owned releases reported persists after a collect action") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val df = build()
    assert(df.collect().length == 10)
    assert(awaitReleased(before).isEmpty, "persist survived the first action")
  }

  test("owned releases reported persists after a writer-command action") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val df = build()
    df.write.format("noop").mode("overwrite").save()
    assert(awaitReleased(before).isEmpty, "persist survived the writer command")
  }

  test("report outside an owned build is a no-op; explicit scope releases on demand") {
    import spark.implicits._
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val scope = new QueryCaches.CacheScope
    val base = (1 to 50).toDF("n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    QueryCaches.report(base) // no active owned build: must NOT register anywhere
    scope.collect(base)
    assert(base.count() == 50)
    // no auto-release happened (no listener was registered for the scope)
    Thread.sleep(200)
    assert(newRddIds(before).nonEmpty, "cache should still be live under explicit ownership")
    scope.release()
    assert(newRddIds(before).isEmpty, "explicit release must unpersist immediately")
  }
}
