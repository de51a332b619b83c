package graft.queries

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Relational operator inventory (SURVEY §2.2): each entry is one operator
 * shape the reference's generated SQL relies on, expressed Spark-first on
 * the driver-provided TPC-H-ish tables, with a DuckDB oracle in
 * [[Relational.oracle]].
 *
 * Conventions (driver compare contract):
 *  - every computed column is aliased identically in Spark and oracle SQL;
 *  - money/qty aggregates use exact decimal arithmetic (see Tables.dec);
 *  - every result has a total deterministic ORDER BY.
 */
object Relational {

  /** Hash-agg with multiple aggregates (model_bqml.sql:214-259 shape / TPC-H Q1). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Deterministic hash-mod split on FARM_FINGERPRINT (model_bqml.sql:95-101). */
  def qHashSplit(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    load(s, dir, "customer")
      .select(col("c_custkey"),
        (abs(GraftFunctions.farm_fingerprint(col("c_name"))) % 100).as("bucket"))
      .withColumn("split", when(col("bucket") < 90, "train").otherwise("holdout"))
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
      .orderBy(col("split"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_hash_split" -> (qHashSplit _))

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS avg_qty,
        |  COUNT(1) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
