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
    try {
      // force the shuffle-prone join strategy; bucketing must neutralize it
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("bkt_docs").join(s.table("bkt_embs"), "doc_id")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles: ${joined.queryExecution.executedPlan}")
      // and it still computes the right thing
      assert(joined.count() == embs.join(docs, "doc_id").count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS bkt_docs")
      s.sql("DROP TABLE IF EXISTS bkt_embs")
    }
  }
}
