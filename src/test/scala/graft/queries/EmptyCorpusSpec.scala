package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** A 100 TB engine meets empty inputs constantly — a brand-new source, a
  * filtered-to-nothing slice, a first incremental batch. Every
  * documents/embeddings-family contract query must return an empty (or
  * schema-correct aggregate) result on an EMPTY table, never throw from a
  * driver-side model-parameter collect or an unguarded scalar. */
class EmptyCorpusSpec extends AnyFunSuite with SparkFixture {

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))
  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def emptyDir(): String = {
    val dir = tmpSfDir()
    writeTable(dir, "documents",
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docsSchema))
    writeTable(dir, "embeddings",
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], embSchema))
    dir.toString
  }

  // every §2.7 query that reads only documents/embeddings
  private val corpusQueries = Seq(
    "text_tokens", "text_quality", "text_langid", "text_fingerprint", "text_scrub",
    "text_repetition", "text_winnow_fp", "text_ngram_counts", "text_pack_chunks",
    "text_seg_dedup", "text_tfidf_topk", "text_rarity_score", "text_script_ratio",
    "bpe_pair_counts", "pack_padding_waste", "vocab_coverage",
    "text_chunk_windows", "mm_dedup_hash",
    "filter_gopher_rules", "sample_quality_weighted",
    "dedup_bow_fp", "dedup_jaccard_words", "dedup_jaccard_ngrams", "dedup_simhash",
    "dedup_minhash_lsh", "dedup_minhash_lsh_md5", "dedup_incremental_md5",
    "dedup_components", "dedup_cluster_sizes", "dedup_embedding_cosine",
    "dedup_semantic", "dedup_winnow_overlap", "dedup_substring_spans",
    "dedup_lsh_audit", "stats_mad_outliers",
    "sample_stratified", "sample_per_source_topn", "pipeline_curation",
    "curation_best_of_cluster", "contamination_check", "decontam_overlap",
    "shingle_except", "shingle_intersect", "corpus_report", "corpus_rollup",
    "corpus_pivot", "mix_weighted", "mix_temperature", "mix_token_budget",
    "mix_epochs", "shuffle_order", "stats_length_pctl", "stats_percent_rank",
    "integrity_full_outer", "embed_quantize", "embed_dim_stats", "embed_source_drift",
    "embed_kmeans_assign", "embed_kmeans_update", "embed_kmeans_fit",
    "embed_kmeans_inertia",
    "sim_bruteforce_topk", "sim_lsh_buckets", "sim_ivf_topk", "sim_knn_accuracy",
    "sim_ivf_multiprobe", "stats_kruskal_wallis", "text_lm_kneser_ney",
    "dedup_graph_triangles", "dedup_graph_modularity", "dedup_token_savings",
    "text_mattr", "stats_dunn_posthoc")

  test("every corpus-family query returns (not throws) on fully empty tables") {
    val dir = emptyDir()
    val failures = corpusQueries.flatMap { name =>
      try {
        graft.SparkEntry.queries(name)(spark, dir).collect()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  // events-family queries over the flat table (wildcard/ML compositions
  // carry their own latest-shard DECLARE contract and are exercised on
  // non-empty layouts elsewhere)
  private val eventsQueries = Seq(
    "q10_first_event", "q11_ntile", "q12_lag_lead", "q21_sessionize",
    "q24_json_props", "q25_hour_buckets", "q_asof_join", "q_asof_fwd",
    "q_funnel", "q_gap_fill", "q_range_frame", "q_cohort_retention", "q_rfm_segments",
    "q_attribution_linear", "q_cohort_ltv", "ml_split_leakage", "stats_key_skew",
    "seq_transition_matrix", "stats_friedman")

  test("event-analytics queries return (not throws) on an empty events table") {
    val dir = tmpSfDir()
    writeTable(dir, "events",
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], eventsSchema))
    val failures = eventsQueries.flatMap { name =>
      try {
        graft.SparkEntry.queries(name)(spark, dir.toString).collect()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
