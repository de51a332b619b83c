package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Text-analysis operators for the large-scale training-data pipeline
 * (builder brief §text-analysis): token counting, quality scoring,
 * n-gram-heuristic language ID, document fingerprinting. All pure
 * column expressions — fully codegen'd, no UDFs, shuffle only for the
 * final aggregations.
 */
object Text {

  private def docs(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")

  /** Non-empty whitespace tokens. */
  private def words(c: Column): Column =
    filter(split(c, " "), w => w =!= "")

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_re_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length / distinct-ratio / stopword-ratio heuristics.
    * Ratios are exact int/int double divisions — bit-identical cross-engine. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    val nw = size(w).cast("double")
    val distinctRatio = size(array_distinct(w)).cast("double") / nw
    val stopRatio = size(filter(w, x => x.isin("the", "a"))).cast("double") / nw
    docs(s, dir)
      .select(col("doc_id"),
        size(w).cast("long").as("n_words"),
        distinctRatio.as("distinct_ratio"),
        stopRatio.as("stopword_ratio"),
        when(size(w) >= 12 && distinctRatio >= 0.6, "high")
          .when(size(w) >= 6, "medium")
          .otherwise("low").as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic (stopword/marker-ngram ratio) + accuracy against
    * the labelled lang column. */
  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    val enRatio = size(filter(w, x => x.isin("the", "a"))).cast("double") / size(w).cast("double")
    docs(s, dir)
      .select(col("lang"),
        when(enRatio >= 0.1, "en_like").otherwise("other").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Document fingerprinting: md5 content hash + bag-of-words hash (the
    * normalization-invariant near-dup key). */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        md5(col("text")).as("content_fp"),
        md5(concat_ws(" ", sort_array(array_distinct(words(col("text")))))).as("bow_fp"))
      .orderBy(col("doc_id"))

  /** Bag-of-words fingerprint dedup: one keeper per identical word set. */
  def dedupBowFp(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", sort_array(array_distinct(words(col("text")))))).as("bow_fp"))
      .groupBy(col("bow_fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy(col("bow_fp"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangId _),
    "text_fingerprint" -> (textFingerprint _),
    "dedup_bow_fp" -> (dedupBowFp _))

  val oracle: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_re_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  len(list_distinct(w))::DOUBLE / len(w)::DOUBLE AS distinct_ratio,
        |  len(list_filter(w, x -> x IN ('the', 'a')))::DOUBLE / len(w)::DOUBLE AS stopword_ratio,
        |  CASE
        |    WHEN len(w) >= 12 AND len(list_distinct(w))::DOUBLE / len(w)::DOUBLE >= 0.6 THEN 'high'
        |    WHEN len(w) >= 6 THEN 'medium'
        |    ELSE 'low' END AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT lang, list_filter(string_split(text, ' '), w -> w <> '') AS w
        |  FROM documents),
        |p AS (
        |  SELECT lang,
        |    CASE WHEN len(list_filter(w, x -> x IN ('the', 'a')))::DOUBLE / len(w)::DOUBLE >= 0.1
        |      THEN 'en_like' ELSE 'other' END AS predicted
        |  FROM t)
        |SELECT lang, predicted, COUNT(1) AS n
        |FROM p GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_fp,
        |  md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))), ' ')) AS bow_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_bow_fp" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), w -> w <> ''))), ' ')) AS bow_fp
        |  FROM documents)
        |SELECT bow_fp, min(doc_id) AS keeper, COUNT(1) AS n_copies
        |FROM fp GROUP BY bow_fp HAVING COUNT(1) > 1
        |ORDER BY bow_fp""".stripMargin)
}
