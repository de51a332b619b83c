package graft.queries

import graft.sources.WildcardTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * Wildcard-table scan queries (SURVEY §2.2 rows 19-20): `_TABLE_SUFFIX`
 * range pruning (`model_bqml.sql:91-94`) and the `__TABLES_SUMMARY__`
 * latest-shard lookup + scan (`output.sql:2-7,18-19`), over the
 * date-partitioned layout of [[graft.sources.WildcardTable]].
 *
 * Scale: both queries read only the matching partition directories —
 * WildcardSpec asserts the pruning on the physical plan. The latest-shard
 * lookup is file-system metadata (no data scan), mirroring BigQuery's
 * metadata-table query.
 */
object Wildcard {

  /** `SELECT ... FROM events_* WHERE _TABLE_SUFFIX BETWEEN d1 AND d2`:
    * partition-pruned range scan + per-shard aggregate. */
  def qSuffixPrune(s: SparkSession, dir: String): DataFrame =
    WildcardTable.events(s, dir)
      .filter(col("_table_suffix").between("20240110", "20240115"))
      .groupBy(col("_table_suffix"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy(col("_table_suffix"))

  /** `DECLARE latest = (SELECT MAX(...suffix...) FROM __TABLES_SUMMARY__)`
    * then scan `events_<latest>`: metadata lookup + single-shard scan. */
  def qLatestSuffix(s: SparkSession, dir: String): DataFrame = {
    val latest = WildcardTable.listSuffixes(s, dir).max
    WildcardTable.events(s, dir)
      .filter(col("_table_suffix") === latest)
      .groupBy(col("_table_suffix"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_suffix_prune" -> (qSuffixPrune _),
    "q_latest_suffix" -> (qLatestSuffix _))

  val oracle: Map[String, String] = Map(
    "q_suffix_prune" ->
      """SELECT strftime(ts, '%Y%m%d') AS _table_suffix, COUNT(1) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events
        |WHERE strftime(ts, '%Y%m%d') BETWEEN '20240110' AND '20240115'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_latest_suffix" ->
      """WITH latest AS (SELECT MAX(strftime(ts, '%Y%m%d')) AS d FROM events)
        |SELECT strftime(ts, '%Y%m%d') AS _table_suffix, event_type, COUNT(1) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events, latest
        |WHERE strftime(ts, '%Y%m%d') = latest.d
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin)
}
