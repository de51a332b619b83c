package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hive-style partitioned layouts and the ORC format — the two
 * Spark-native source capabilities a BigQuery-shaped pipeline maps onto
 * when it leaves date-sharded tables behind: `_TABLE_SUFFIX` becomes a
 * partition column (pruned by the catalog, not by filename games), and
 * columnar interchange beyond parquet stays pushdown-capable.
 */
class PartitionedLayoutSpec extends AnyFunSuite with SparkFixture {

  private def docs() = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta", "en", "web", 10L),
      (1L, "gamma delta", "en", "web", 11L),
      (2L, "uno dos", "es", "web", 7L),
      (3L, "ein zwei", "de", "book", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("hive-partitioned write prunes non-matching partitions at the scan") {
    val dir = tmpSfDir().resolve("part_docs").toString
    docs().write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    // parity first
    assert(back.select(col("doc_id")).collect().map(_.getLong(0)).sorted
      .sameElements(Array(0L, 1L)))
    // the catalog must prune: only the lang=en directory's file(s) scanned
    back.collect() // finalize AQE
    val scans = back.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val files = scans.head.selectedPartitions.toPartitionArray.map(_.filePath.toString)
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"partition pruning failed; scanned: ${files.mkString(", ")}")
    // and the partition filter is visible in the scan node, not a residual
    assert(scans.head.partitionFilters.nonEmpty,
      "lang filter should be a partition filter on the scan")
  }

  test("ORC round-trips with predicate pushdown and matches the parquet read") {
    val base = tmpSfDir()
    val pq = base.resolve("docs_pq").toString
    val orc = base.resolve("docs_orc").toString
    docs().write.mode("overwrite").parquet(pq)
    docs().write.mode("overwrite").orc(orc)
    val fromPq = spark.read.parquet(pq).filter(col("n_chars") >= 8)
      .select(col("doc_id"), col("text"), col("lang"))
    val fromOrc = spark.read.orc(orc).filter(col("n_chars") >= 8)
      .select(col("doc_id"), col("text"), col("lang"))
    assert(fromOrc.collect().map(_.toString).sorted
      .sameElements(fromPq.collect().map(_.toString).sorted))
    // the ORC scan must carry the pushed filter (codegen'd formats only
    // prune stripes when the predicate reaches the reader)
    fromOrc.collect()
    val orcScans = fromOrc.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(orcScans.nonEmpty)
    assert(orcScans.head.metadata.get("PushedFilters")
      .exists(_.contains("GreaterThanOrEqual(n_chars,8)")),
      s"ORC pushdown missing: ${orcScans.head.metadata.get("PushedFilters")}")
  }
}
