package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/**
 * Scan/join hygiene net (builder brief §push-down-and-prune): filters must
 * reach the parquet scan as PushedFilters, date-window predicates on the
 * wildcard layout must prune partitions AT THE SCAN, projections must not
 * read unused columns, and small dims must broadcast. Asserted on the
 * pre-adaptive physical plan (`sparkPlan`) so the checks are deterministic
 * under AQE.
 */
class ScanHygieneSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec => f }

  test("q2_filter_proj: predicate is pushed to the parquet scan") {
    val df = SparkEntry.queries("q2_filter_proj")(spark, sfDir)
    val pushed = scans(df.queryExecution.sparkPlan)
      .flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(_ != "[]"), s"no pushed filters: $pushed")
  }

  test("q2_filter_proj: scan reads only the projected columns") {
    val df = SparkEntry.queries("q2_filter_proj")(spark, sfDir)
    val schemas = scans(df.queryExecution.sparkPlan).map(_.requiredSchema)
    // lineitem has 16 columns; the query needs a handful
    assert(schemas.nonEmpty && schemas.forall(_.size < 8),
      s"scan reads too many columns: $schemas")
  }

  test("q_suffix_prune: the suffix window prunes wildcard partitions at the scan") {
    val df = SparkEntry.queries("q_suffix_prune")(spark, sfDir)
    val withPartFilters = scans(df.queryExecution.sparkPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(withPartFilters.nonEmpty,
      "no scan carries partition filters — the suffix window is not pruning")
  }

  test("MlCompiler.eventsCte: the date window prunes the events shards") {
    // checked at the eventsCte stage: the full dataset() persists this
    // slice, which hides the scan inside an InMemoryRelation
    import graft.plans.MlCompiler
    val cfg = MlCompiler.MlModel(
      isClassification = true, uniqueId = "user_pseudo_id",
      features = Seq(MlCompiler.GaFeature("error")),
      label = MlCompiler.GaLabel("purchase", "k"),
      suffixLo = "20240105", suffixHi = "20240125",
      hashSplit = false, engagementEvent = "view")
    val ev = MlCompiler.eventsCte(
      graft.queries.Ga4.ga4EventsPartitioned(spark, sfDir), cfg, MlCompiler.Training)
    val withPartFilters = scans(ev.queryExecution.sparkPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(withPartFilters.nonEmpty,
      "ML events scan has no partition filters — full-corpus read at 100 TB")
  }

  test("q5_join_multi: small dimensions broadcast") {
    val df = SparkEntry.queries("q5_join_multi")(spark, sfDir)
    val bhj = df.queryExecution.sparkPlan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "no broadcast joins in the multi-dim join")
  }

  test("decontam_overlap: the benchmark shingle set is the broadcast side of the semi-join") {
    val df = SparkEntry.queries("decontam_overlap")(spark, sfDir)
    val bhj = df.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec if b.joinType.sql == "LEFT SEMI" => b }
    assert(bhj.nonEmpty,
      "decontamination semi-join does not broadcast the benchmark set — " +
        "at 100 TB that shuffles the training corpus instead of shipping the benchmark")
  }

  test("sample_per_source_topn: per-source counts broadcast; docs scan reads few columns") {
    val df = SparkEntry.queries("sample_per_source_topn")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "the per-source count relation must broadcast, not shuffle the corpus")
    val schemas = scans(plan).map(_.requiredSchema)
    assert(schemas.nonEmpty && schemas.forall(_.size <= 2),
      s"sampler scans more than (doc_id, source): $schemas")
  }

  test("corpus_report: scan reads only the three report columns") {
    val df = SparkEntry.queries("corpus_report")(spark, sfDir)
    val schemas = scans(df.queryExecution.sparkPlan).map(_.requiredSchema)
    assert(schemas.nonEmpty && schemas.forall(_.size <= 3),
      s"report scans text columns it never aggregates: $schemas")
  }

  test("output_predictions: latest-shard gclid scan prunes partitions; band join broadcasts") {
    val df = SparkEntry.queries("output_predictions")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    // the freshest-click scan must read ONLY the latest shard — at 100 TB
    // the latest partition is a day, the table is years
    val latest = graft.sources.WildcardTable.listSuffixes(spark, sfDir).max
    val pruned = scans(plan).filter(s =>
      s.partitionFilters.nonEmpty && s.partitionFilters.mkString.contains(latest))
    assert(pruned.nonEmpty,
      "no scan is pruned to the latest shard — the gclid lookup reads the full corpus")
    // the ≤10-row conversion-value segments must be the broadcast side of
    // the band join (a shuffle there would move the scored corpus instead)
    val bnl = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b }
    assert(bnl.nonEmpty, "band join onto conversion-value segments is not broadcast")
  }
}
