package graft.sources

import graft.SparkFixture
import graft.queries.Wildcard
import org.scalatest.funsuite.AnyFunSuite

/** Wildcard/partitioned scan: partition pruning must be visible in the
  * physical plan, and the latest-suffix lookup must be metadata-only. */
class WildcardSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("suffix BETWEEN predicate prunes partitions in the physical plan") {
    val df = Wildcard.qSuffixPrune(spark, sf)
    df.collect() // force planning + AQE finalization
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in:\n$plan")
    assert(plan.contains("_table_suffix"), "partition column missing from scan")
    // the scan must NOT push the suffix range as a data filter — it must be
    // a partition filter (directory-level pruning, no file contents read)
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains(">= 20240110") || scanLine.contains("20240110"),
      s"suffix bound not in partition filters: $scanLine")
  }

  test("latest-suffix metadata listing matches the data's real max day") {
    val suffixes = WildcardTable.listSuffixes(spark, sf)
    assert(suffixes.nonEmpty && suffixes == suffixes.sorted)
    assert(suffixes.max == "20240130")
    // one partition directory per day of January 2024 coverage
    assert(suffixes.forall(_.matches("202401\\d\\d")))
  }

  test("single-shard scan reads only the latest partition's files") {
    val df = Wildcard.qLatestSuffix(spark, sf)
    assert(df.collect().nonEmpty)
    // after execution the scan's numFiles metric reflects the PRUNED file
    // set: exactly the one day=20240130 directory (1 part file in fixture)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case other => other.children.flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.nonEmpty)
    val numFiles = found.map(_.metrics("numFiles").value).sum
    assert(numFiles == 1, s"expected 1 pruned file, scan read $numFiles")
  }
}
