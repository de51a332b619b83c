package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Tables._

/**
 * Retrieval-scoring operators for the training-data pipeline (builder
 * brief §text-analysis): the ranking primitives a corpus team runs to
 * pull topical slices out of a web-scale crawl (RETRO/REALM-style
 * retrieval curation, "find the docs most about X" sampling). Complements
 * [[Corpus.textTfidfTopk]]'s corpus-level term statistics with
 * document-level relevance ranking.
 */
object Retrieval {

  private def docs(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")

  // ---------------------------------------------------------------------
  // BM25 top-K retrieval — text_bm25_topk
  // ---------------------------------------------------------------------

  /** BM25 free parameters (the Robertson/Lucene defaults). Spelled as the
    * exact double literals the oracle uses: k1+1 = 2.2, 1−b = 0.25. */
  private val Bm25K1 = 1.2
  private val Bm25K1Plus1 = 2.2
  private val Bm25OneMinusB = 0.25
  private val Bm25B = 0.75

  /** The fixed query — driver-constant model input, like the ANN anchor
    * vectors: a retrieval curation job scores the corpus against a term
    * set chosen offline. */
  private[queries] val Bm25Query = Seq("vector", "hash", "stream", "the")

  private val Bm25TopK = 50

  /**
   * BM25 top-K document retrieval (Robertson et al., the Okapi/Lucene
   * scoring function): every document is scored against the fixed query
   * term set with
   * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` where
   * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`, and the K best documents
   * come back — the standard "pull the most-relevant slice" curation scan.
   *
   * Scale shape: the explode filters to the query terms BEFORE any
   * shuffle (per-row `isin` over the scan — the relation entering the
   * (doc, term) aggregate is |docs|·|Q| at most, not |tokens|); document
   * frequencies collapse to ≤|Q| rows and broadcast back; the corpus
   * size / average length are metadata-sized driver scalars (the AQE
   * statistics round-trip convention, same as [[Corpus.textTfidfTopk]]'s
   * N); the final top-K is a TakeOrderedAndProject, never a global sort.
   *
   * Determinism: idf and the saturation term are fixed IEEE op sequences
   * spelled identically in the oracle (explicit parenthesization — float
   * multiply/divide are not associative); each per-term score rounds to
   * 6 dp and sums as exact DECIMAL so partial-agg order can't flip low
   * bits; ties on the rounded score break by doc_id.
   */
  def textBm25Topk(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))
    // corpus scalars: doc count + total token mass (exact longs; avgdl is
    // ONE double division — the identical IEEE op the oracle runs)
    val row = base.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).first()
    val nDocs = row.getLong(0)
    val avgdl = if (nDocs > 0) row.getLong(1).toDouble / nDocs.toDouble else 1.0
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val tfD = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val sat = (tfD * lit(Bm25K1Plus1)) /
      (tfD + lit(Bm25K1) *
        (lit(Bm25OneMinusB) + lit(Bm25B) * (col("dl").cast("double") / lit(avgdl))))
    tf.join(broadcast(dfRel), Seq("term"))
      .select(col("doc_id"), col("dl"),
        round(idf * sat, 6).cast(DecimalType(20, 6)).as("ts"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_q_terms"), sum(col("ts")).cast("double").as("score"))
      .select(col("doc_id"), col("dl").as("n_tokens"), col("n_q_terms"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
  }

  // ---------------------------------------------------------------------
  // Registration
  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25_topk" -> (textBm25Topk _))

  val oracle: Map[String, String] = Map(
    "text_bm25_topk" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, w FROM t WHERE len(w) > 0),
         |c AS (
         |  SELECT CAST(COUNT(1) AS BIGINT) AS n,
         |    CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS tot FROM b),
         |tf AS (
         |  SELECT doc_id, dl, term, CAST(COUNT(1) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, dl, unnest(w) AS term FROM b)
         |  WHERE term IN (${Bm25Query.map(q => s"'$q'").mkString(", ")})
         |  GROUP BY doc_id, dl, term),
         |df AS (
         |  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tf GROUP BY term),
         |sc AS (
         |  SELECT doc_id, dl,
         |    round(
         |      ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |                 / (CAST(df AS DOUBLE) + 0.5))
         |      * ((CAST(tf AS DOUBLE) * $Bm25K1Plus1)
         |         / (CAST(tf AS DOUBLE) + $Bm25K1
         |            * ($Bm25OneMinusB + $Bm25B
         |               * (CAST(dl AS DOUBLE)
         |                  / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))), 6) AS ts
         |  FROM tf JOIN df USING (term) CROSS JOIN c)
         |SELECT doc_id, dl AS n_tokens, CAST(COUNT(1) AS BIGINT) AS n_q_terms,
         |  CAST(SUM(CAST(ts AS DECIMAL(20,6))) AS DOUBLE) AS score
         |FROM sc GROUP BY doc_id, dl
         |ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin)
}
