package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketed co-located joins (builder brief §partitioning: "bucketing for
 * co-located joins"): two tables bucketed the same way on the join key
 * must join with NO shuffle exchange on either side — the pattern that
 * turns a repeated 100 TB fact⋈fact join from two full shuffles into a
 * local merge per bucket.
 */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("same-bucketing join plans with zero shuffle exchanges") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val embs = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))

    s.sql("DROP TABLE IF EXISTS bkt_docs")
    s.sql("DROP TABLE IF EXISTS bkt_embs")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("bkt_docs")
    embs.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("bkt_embs")

    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffle-prone join strategy; bucketing must neutralize it.
      // Exchanges are inserted by EnsureRequirements (a preparation rule),
      // so they only exist in executedPlan — and with AQE on, executedPlan
      // is an opaque AdaptiveSparkPlanExec leaf where collect finds nothing
      // either way. AQE off makes the executed plan inspectable.
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
      // positive control: the SAME join over the raw (un-bucketed) parquet
      // shuffles — proving the assertion below can fail
      assert(exchanges(docs.join(embs, "doc_id")) > 0,
        "control broken: un-bucketed join shows no exchanges")
      val joined = s.table("bkt_docs").join(s.table("bkt_embs"), "doc_id")
      assert(exchanges(joined) == 0,
        s"bucketed join still shuffles: ${joined.queryExecution.sparkPlan}")
      // and it still computes the right thing
      assert(joined.count() == embs.join(docs, "doc_id").count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.sql("DROP TABLE IF EXISTS bkt_docs")
      s.sql("DROP TABLE IF EXISTS bkt_embs")
    }
  }
}
