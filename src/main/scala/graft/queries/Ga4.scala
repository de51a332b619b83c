package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/**
 * GA4 nested `event_params` idioms (SURVEY §2.2 correlated-UNNEST rows;
 * FIXTURES.md §1): the reference's ML templates probe an
 * `ARRAY<STRUCT<key, value STRUCT<string_value,int_value,float_value,
 * double_value>>>` column with typed COALESCE
 * (`model_bqml.sql:166-173`), build per-comparison feature counters over
 * it (`model_bqml.sql:219-248`; `bigquery.py:104-115`), and project nested
 * scalars like `geo.country` / `device.web_info.browser`
 * (`model_bqml.sql:74-90`).
 *
 * The GA4-shaped relation is DERIVED deterministically from the driver's
 * flat `events` table (no synthesized inputs), with identical derivation
 * SQL on the DuckDB side — so the oracle compare exercises the full
 * nested-construction + probing path on both engines.
 *
 * Scale: everything here is a projection + hash aggregation over array
 * columns probed with higher-order functions (filter/exists) — no explode,
 * no shuffle beyond the final groupBy, and Catalyst keeps the probes
 * inside whole-stage codegen.
 */
object Ga4 {

  /** Typed four-slot value struct (explicit null types so every array
    * element carries the same struct schema). */
  private def slots(sv: Column, iv: Column, fv: Column, dv: Column): Column =
    struct(sv.as("string_value"), iv.as("int_value"),
      fv.as("float_value"), dv.as("double_value"))

  private def nullS = lit(null).cast("string")
  private def nullL = lit(null).cast("long")
  private def nullD = lit(null).cast("double")

  /** GA4-shaped events: nested params + geo/device structs, derived
    * 1:1 from the flat events table. */
  def ga4Events(s: SparkSession, dir: String): DataFrame =
    ga4From(events(s, dir))

  /** Same relation over the date-partitioned wildcard layout: carries the
    * `_table_suffix` partition column, so date-window filters downstream
    * (the ML compiler's `events` CTE) prune partitions at the scan instead
    * of reading all shards — the `events_*` cost model at 100 TB. */
  def ga4EventsPartitioned(s: SparkSession, dir: String): DataFrame =
    ga4From(graft.sources.WildcardTable.events(s, dir))

  private def ga4From(e: DataFrame): DataFrame = {
    val m4 = pmod(col("event_id"), lit(4))
    val v = col("value")
    // deterministic first-touch instant: 2024-01-01T00:00Z + user_id hours
    val firstTouchUs = (lit(1704067200L) + pmod(col("user_id"), lit(720)) * 3600L) * 1000000L
    // sparse ad-click id (output.sql:105-117): only some click events carry
    // one, and a few carry the EMPTY string to exercise the reference's
    // COALESCE(string_value, "") != "" guard
    val gclidEntry = array(struct(lit("gclid").as("key"),
      slots(
        when(pmod(col("event_id"), lit(9)) === 0, lit(""))
          .otherwise(concat(lit("gcl_"), col("event_id").cast("string"))),
        nullL, nullD, nullD).as("value")))
    val baseParams = array(
      // 'k': always the int slot (from the props JSON)
      struct(lit("k").as("key"),
        slots(nullS, get_json_object(col("props"), "$.k").cast("long"), nullL.cast("double"), nullD)
          .as("value")),
      // 'm': exactly one of the four typed slots, by event_id mod 4 —
      // exercises the COALESCE probing order across all slots
      struct(lit("m").as("key"),
        slots(
          when(m4 === 3, round(v, 2).cast("string")).otherwise(nullS),
          when(m4 === 0, round(v, 0).cast("long")).otherwise(nullL),
          when(m4 === 1, v).otherwise(nullD),
          when(m4 === 2, v * 2).otherwise(nullD)).as("value")),
      // 'engagement_time_msec': int slot (bigquery.py:70-73 exclusion list)
      struct(lit("engagement_time_msec").as("key"),
        slots(nullS, pmod(col("event_id"), lit(1000)), nullD, nullD).as("value")),
      // 'medium': string slot
      struct(lit("medium").as("key"),
        slots(
          when(pmod(col("user_id"), lit(3)) === 0, lit("organic"))
            .when(pmod(col("user_id"), lit(3)) === 1, lit("cpc"))
            .otherwise(lit("referral")),
          nullL, nullD, nullD).as("value")))
    // keep the partition column when the source is the wildcard layout, so
    // downstream date filters remain partition-prunable
    val partitionCols =
      if (e.columns.contains("_table_suffix")) Seq(col("_table_suffix")) else Nil
    e.select(partitionCols ++ Seq(
      col("event_id"),
      expr("ts DIV 1000").as("event_timestamp"),
      date_format(timestamp_micros(expr("ts DIV 1000")), "yyyyMMdd").as("event_date"),
      col("event_type").as("event_name"),
      col("user_id").cast("string").as("user_pseudo_id"),
      // GA4 signed-in user_id is sparse: present for every 4th user only
      when(pmod(col("user_id"), lit(4)) === 0, concat(lit("u"), col("user_id").cast("string")))
        .otherwise(lit(null).cast("string")).as("user_id"),
      firstTouchUs.as("user_first_touch_timestamp"),
      when(pmod(col("event_id"), lit(10)) < 7, lit("WEB")).otherwise(lit("APP")).as("platform"),
      when(col("event_type") === "click" && pmod(col("event_id"), lit(3)) === 0,
        concat(baseParams, gclidEntry)).otherwise(baseParams).as("event_params"),
      struct(
        element_at(array(lit("US"), lit("DE"), lit("FR"), lit("JP"), lit("BR")),
          (pmod(col("user_id"), lit(5)) + 1).cast("int")).as("country"),
        concat(lit("r"), pmod(col("user_id"), lit(7)).cast("string")).as("region")).as("geo"),
      struct(
        element_at(array(lit("en"), lit("de"), lit("fr")),
          (pmod(col("user_id"), lit(3)) + 1).cast("int")).as("language"),
        when(pmod(col("event_id"), lit(2)) === 0, lit("mobile")).otherwise(lit("desktop"))
          .as("category"),
        element_at(array(lit("android"), lit("ios"), lit("linux"), lit("windows")),
          (pmod(col("user_id"), lit(4)) + 1).cast("int")).as("operating_system"),
        struct(element_at(array(lit("chrome"), lit("safari"), lit("firefox")),
          (pmod(col("event_id"), lit(3)) + 1).cast("int")).as("browser")).as("web_info"))
        .as("device"),
      struct(
        element_at(array(lit("google"), lit("direct"), lit("newsletter")),
          (pmod(col("user_id"), lit(3)) + 1).cast("int")).as("source"),
        element_at(array(lit("organic"), lit("none"), lit("email")),
          (pmod(col("user_id"), lit(3)) + 1).cast("int")).as("medium")).as("traffic_source")): _*)
  }

  /** Shared DuckDB-side derivation of the GA4 relation (kept textually in
    * one place so every oracle, including the ML compiler's, agrees). */
  private[queries] val duckGa4 =
    """ga4 AS (
      |  SELECT
      |    event_id,
      |    epoch_us(ts) AS event_timestamp,
      |    strftime(ts, '%Y%m%d') AS event_date,
      |    event_type AS event_name,
      |    CAST(user_id AS VARCHAR) AS user_pseudo_id,
      |    CASE WHEN user_id % 4 = 0 THEN 'u' || CAST(user_id AS VARCHAR) END AS user_id,
      |    (1704067200 + (user_id % 720) * 3600) * 1000000 AS user_first_touch_timestamp,
      |    CASE WHEN event_id % 10 < 7 THEN 'WEB' ELSE 'APP' END AS platform,
      |    [
      |      {'key': 'k', 'value': {
      |        'string_value': CAST(NULL AS VARCHAR),
      |        'int_value': CAST(json_extract_string(props, '$.k') AS BIGINT),
      |        'float_value': CAST(NULL AS DOUBLE),
      |        'double_value': CAST(NULL AS DOUBLE)}},
      |      {'key': 'm', 'value': {
      |        'string_value': CASE WHEN event_id % 4 = 3 THEN CAST(round(value, 2) AS VARCHAR) END,
      |        'int_value': CASE WHEN event_id % 4 = 0 THEN CAST(round(value, 0) AS BIGINT) END,
      |        'float_value': CASE WHEN event_id % 4 = 1 THEN value END,
      |        'double_value': CASE WHEN event_id % 4 = 2 THEN value * 2 END}},
      |      {'key': 'engagement_time_msec', 'value': {
      |        'string_value': CAST(NULL AS VARCHAR),
      |        'int_value': event_id % 1000,
      |        'float_value': CAST(NULL AS DOUBLE),
      |        'double_value': CAST(NULL AS DOUBLE)}},
      |      {'key': 'medium', 'value': {
      |        'string_value': CASE user_id % 3 WHEN 0 THEN 'organic' WHEN 1 THEN 'cpc' ELSE 'referral' END,
      |        'int_value': CAST(NULL AS BIGINT),
      |        'float_value': CAST(NULL AS DOUBLE),
      |        'double_value': CAST(NULL AS DOUBLE)}}
      |    ] || CASE WHEN event_type = 'click' AND event_id % 3 = 0 THEN [
      |      {'key': 'gclid', 'value': {
      |        'string_value': CASE WHEN event_id % 9 = 0 THEN '' ELSE 'gcl_' || CAST(event_id AS VARCHAR) END,
      |        'int_value': CAST(NULL AS BIGINT),
      |        'float_value': CAST(NULL AS DOUBLE),
      |        'double_value': CAST(NULL AS DOUBLE)}}
      |    ] ELSE [] END AS event_params,
      |    {'country': ['US','DE','FR','JP','BR'][CAST(user_id % 5 AS INT) + 1],
      |     'region': 'r' || CAST(user_id % 7 AS VARCHAR)} AS geo,
      |    {'language': ['en','de','fr'][CAST(user_id % 3 AS INT) + 1],
      |     'category': CASE WHEN event_id % 2 = 0 THEN 'mobile' ELSE 'desktop' END,
      |     'operating_system': ['android','ios','linux','windows'][CAST(user_id % 4 AS INT) + 1],
      |     'web_info': {'browser': ['chrome','safari','firefox'][CAST(event_id % 3 AS INT) + 1]}} AS device,
      |    {'source': ['google','direct','newsletter'][CAST(user_id % 3 AS INT) + 1],
      |     'medium': ['organic','none','email'][CAST(user_id % 3 AS INT) + 1]} AS traffic_source
      |  FROM events)""".stripMargin

  /** First param with the given key (null-safe: missing key → null struct). */
  private def param(key: String): Column =
    element_at(filter(col("event_params"), p => p.getField("key") === lit(key)), 1)
      .getField("value")

  /**
   * Typed COALESCE probing (model_bqml.sql:166-173): pull parameter 'm'
   * whichever typed slot it landed in, plus the int parameter 'k',
   * aggregated per event name over web-platform events.
   */
  def ga4ParamsProbe(s: SparkSession, dir: String): DataFrame = {
    val m = param("m")
    val probed = coalesce(
      m.getField("int_value").cast("double"),
      m.getField("float_value"),
      m.getField("double_value"),
      m.getField("string_value").cast("double"))
    ga4Events(s, dir)
      .filter(lower(col("platform")) === "web")
      .select(col("event_name"), probed.as("m"),
        param("k").getField("int_value").as("k"))
      .groupBy(col("event_name"))
      .agg(count(lit(1)).as("n"), dsum(col("m")).as("sum_m"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_name"))
  }

  /**
   * Per-comparison feature counters (model_bqml.sql:219-248): one counter
   * per (key, comparison) pair, summed per user — the analytics-variables
   * shape of the ML template, expressed with higher-order `exists` instead
   * of correlated UNNEST subqueries.
   */
  def ga4ParamCounters(s: SparkSession, dir: String): DataFrame = {
    def has(key: String, pred: Column => Column): Column =
      when(exists(col("event_params"),
        p => p.getField("key") === lit(key) && pred(p.getField("value"))), 1L).otherwise(0L)
    ga4Events(s, dir)
      .select(col("user_pseudo_id"),
        has("k", v => v.getField("int_value") > 50).as("c_k"),
        has("medium", v => v.getField("string_value") === "cpc").as("c_cpc"),
        has("engagement_time_msec", v => v.getField("int_value") > 500).as("c_eng"))
      .groupBy(col("user_pseudo_id"))
      .agg(sum(col("c_k")).as("k_gt50"), sum(col("c_cpc")).as("cpc_events"),
        sum(col("c_eng")).as("engaged_events"), count(lit(1)).as("n_events"))
      .orderBy(col("user_pseudo_id"))
  }

  /** Nested scalar projection (model_bqml.sql:74-90): geo.country and
    * device.web_info.browser straight out of the structs. */
  def ga4NestedProj(s: SparkSession, dir: String): DataFrame =
    ga4Events(s, dir)
      .select(col("geo.country").as("country"),
        col("device.web_info.browser").as("browser"),
        col("user_pseudo_id"), col("event_timestamp"))
      .groupBy(col("country"), col("browser"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_pseudo_id")).as("n_users"),
        max(col("event_timestamp")).as("last_ts"))
      .orderBy(col("country"), col("browser"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ga4_params_probe" -> (ga4ParamsProbe _),
    "ga4_param_counters" -> (ga4ParamCounters _),
    "ga4_nested_proj" -> (ga4NestedProj _))

  val oracle: Map[String, String] = Map(
    "ga4_params_probe" ->
      s"""WITH $duckGa4,
         |probed AS (
         |  SELECT event_name,
         |    (SELECT COALESCE(
         |        CAST(p.value.int_value AS DOUBLE), p.value.float_value,
         |        p.value.double_value, CAST(p.value.string_value AS DOUBLE))
         |     FROM unnest(event_params) AS t(p) WHERE p.key = 'm') AS m,
         |    (SELECT p.value.int_value
         |     FROM unnest(event_params) AS t(p) WHERE p.key = 'k') AS k
         |  FROM ga4 WHERE lower(platform) = 'web')
         |SELECT event_name, COUNT(1) AS n,
         |  CAST(SUM(CAST(m AS DECIMAL(12,2))) AS DOUBLE) AS sum_m,
         |  CAST(SUM(k) AS BIGINT) AS sum_k
         |FROM probed GROUP BY event_name ORDER BY event_name""".stripMargin,
    "ga4_param_counters" ->
      s"""WITH $duckGa4,
         |flags AS (
         |  SELECT user_pseudo_id,
         |    CASE WHEN EXISTS (SELECT 1 FROM unnest(event_params) AS t(p)
         |      WHERE p.key = 'k' AND p.value.int_value > 50) THEN 1 ELSE 0 END AS c_k,
         |    CASE WHEN EXISTS (SELECT 1 FROM unnest(event_params) AS t(p)
         |      WHERE p.key = 'medium' AND p.value.string_value = 'cpc') THEN 1 ELSE 0 END AS c_cpc,
         |    CASE WHEN EXISTS (SELECT 1 FROM unnest(event_params) AS t(p)
         |      WHERE p.key = 'engagement_time_msec' AND p.value.int_value > 500) THEN 1 ELSE 0 END AS c_eng
         |  FROM ga4)
         |SELECT user_pseudo_id, CAST(SUM(c_k) AS BIGINT) AS k_gt50,
         |  CAST(SUM(c_cpc) AS BIGINT) AS cpc_events,
         |  CAST(SUM(c_eng) AS BIGINT) AS engaged_events, COUNT(1) AS n_events
         |FROM flags GROUP BY user_pseudo_id ORDER BY user_pseudo_id""".stripMargin,
    "ga4_nested_proj" ->
      s"""WITH $duckGa4
         |SELECT geo.country AS country, device.web_info.browser AS browser,
         |  COUNT(1) AS n, COUNT(DISTINCT user_pseudo_id) AS n_users,
         |  MAX(event_timestamp) AS last_ts
         |FROM ga4 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
