package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Array / higher-order-function inventory (SURVEY §2.2 "correlated subquery"
 * rows): the reference's correlated `(SELECT ... FROM UNNEST(arr) WHERE ...)`
 * subqueries (model_bqml.sql:220-253) are expressed as native array
 * expressions — `filter` / `transform` / `aggregate` — which Catalyst
 * evaluates inline with no decorrelation, no explode, and no shuffle.
 *
 * Float convention: embeddings are float32; both engines promote to double
 * before any accumulation, and accumulated outputs are rounded to 6 dp
 * (double accumulation error ~1e-15 per element; 6 dp leaves 9 orders of
 * magnitude of guard band).
 */
object Arrays {

  private def emb(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")

  /** embedding elements promoted to double (order-preserving). */
  private def dArr(c: Column): Column = transform(c, x => x.cast("double"))

  /** Per-row scalar aggregate over own array:
    * SUM(SELECT x FROM UNNEST(embedding)) as a fold. */
  def q22ArrayAgg(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(aggregate(dArr(col("embedding")), lit(0.0), (acc, x) => acc + x), 6).as("vec_sum"))
      .orderBy(col("vec_id"))

  /** Filtered per-row aggregate: the IFNULL(SUM(SELECT 1 FROM UNNEST(params)
    * WHERE <cmp>)) counter shape (model_bqml.sql:220-248). */
  def q23ArrayFilter(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
        round(aggregate(filter(dArr(col("embedding")), x => x > 0), lit(0.0), (a, x) => a + x), 6)
          .as("pos_sum"))
      .orderBy(col("vec_id"))

  /** Explode + re-aggregate (UNNEST lateral join, model_bqml.sql:166,188):
    * per-label element-position stats over exploded vectors. */
  def q26ExplodeAgg(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(dArr(col("embedding"))).as(Seq("pos", "x")))
      .filter(col("pos") < 8)
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n"), round(sum(col("x")), 6).as("sum_x"))
      .orderBy(col("label"), col("pos"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_array_agg" -> (q22ArrayAgg _),
    "q23_array_filter" -> (q23ArrayFilter _),
    "q26_explode_agg" -> (q26ExplodeAgg _))

  val oracle: Map[String, String] = Map(
    "q22_array_agg" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  round(list_sum(embedding::DOUBLE[]), 6) AS vec_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q23_array_filter" ->
      """SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  round(coalesce(list_sum(list_filter(embedding::DOUBLE[], x -> x > 0)), 0.0), 6) AS pos_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q26_explode_agg" ->
      """SELECT CAST(label AS BIGINT) AS label,
        |  CAST(i - 1 AS BIGINT) AS pos,
        |  COUNT(1) AS n,
        |  round(SUM(embedding[i]::DOUBLE), 6) AS sum_x
        |FROM embeddings, generate_series(1, 8) AS t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin)
}
