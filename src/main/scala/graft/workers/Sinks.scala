package graft.workers

import graft.core.Dag
import graft.core.Dag.{Worker, WorkerContext}
import graft.core.Spec.WorkerValue
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.mutable
import scala.util.matching.Regex

/**
 * Row-wise upload sinks (SURVEY §2.1): the reference's paged
 * coordinator/processor pattern collapses into `foreachPartition` — Spark
 * task parallelism replaces the 1000-row/50-page self-respawn plumbing.
 * Request granularity mirrors the reference exactly: the Ads sink batches
 * 2,000 conversions per request
 * (bq_to_ads_offline_click_conversion.py:41-232); the GA4 MP sink posts
 * ONE payload per row — its `mp_batch_size` param (default 20) is
 * accepted but, as in the reference, not used for request batching
 * (bq_to_measurement_protocol_ga4.py:111-153 `_send_payload` per row).
 */
object Sinks {

  /** Minimal HTTP transport; real deployments plug an HTTP client, tests
    * and this container use [[RecordingTransport]] (zero egress). */
  trait HttpTransport extends Serializable {
    def post(url: String, body: String): (Int, String)
  }

  /** Records requests in-JVM (local-mode executors share the JVM). */
  object RecordingTransport extends HttpTransport {
    val requests = new ConcurrentLinkedQueue[(String, String)]()
    def post(url: String, body: String): (Int, String) = {
      requests.add(url -> body)
      if (url.contains("/debug/")) (200, """{"validationMessages":[]}""") else (204, "")
    }
    def clear(): Unit = requests.clear()
    def size: Int = requests.size()
  }

  /** python string.Template substitution: `$var` and `${var}`;
    * missing variable raises (substitute semantics), `$$` escapes, and a
    * `$` that starts no valid pattern ("$1", trailing "$") raises like
    * Template.substitute's ValueError('Invalid placeholder') — a template
    * typo must fail at render, not post a malformed payload downstream. */
  def pyTemplateSubstitute(template: String, values: Map[String, String]): String = {
    val re: Regex = ("\\$(\\$|\\{([A-Za-z_][A-Za-z0-9_]*)\\}|([A-Za-z_][A-Za-z0-9_]*))").r
    // every '$' must begin a valid pattern (checked on the TEMPLATE, before
    // substitution — substituted values may legitimately contain '$')
    val covered = re.findAllMatchIn(template).map(m => m.start until m.end).toList
    var i = template.indexOf('$')
    while (i >= 0) {
      if (!covered.exists(_.contains(i)))
        throw new IllegalArgumentException(s"Invalid placeholder in string at index $i")
      i = template.indexOf('$', i + 1)
    }
    re.replaceAllIn(template, m => {
      if (m.group(1) == "$") Regex.quoteReplacement("$")
      else {
        val name = Option(m.group(2)).getOrElse(m.group(3))
        values.get(name) match {
          case Some(v) => Regex.quoteReplacement(v)
          case None => throw new NoSuchElementException(s"KeyError: '$name'")
        }
      }
    })
  }

  private[graft] def rowValues(row: org.apache.spark.sql.Row): Map[String, String] =
    row.schema.fieldNames.zipWithIndex.map { case (n, i) =>
      n -> (row.get(i) match {
        case null => ""
        case v => v.toString // Double 12.0 renders "12.0", matching python str(float)
      })
    }.toMap

  /** get_url_param_by_id (ga_utils.py): GA4 measurement id "G-..." vs
    * Firebase app id. */
  def urlParamById(measurementId: String): String =
    if (measurementId.matches(raw"[a-zA-Z]-[a-zA-Z0-9]+")) "measurement_id"
    else "firebase_app_id"

  /**
   * BQToMeasurementProtocolGA4: table rows → templated JSON → POST per row
   * to the MP endpoint (debug mode hits the validation endpoint and only
   * logs). Distribution: foreachPartition, one transport per partition.
   */
  final class MeasurementProtocolGA4(
      spark: SparkSession,
      params: Map[String, WorkerValue],
      transport: HttpTransport = RecordingTransport) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "bq_table_id")
      val template = Workers.str(params, "template")
      val measurementId = Workers.str(params, "measurement_id")
      val apiSecret = Workers.str(params, "api_secret")
      val debug = Workers.bool(params, "debug")
      val urlParam = urlParamById(measurementId)
      val domain =
        if (debug) "https://www.google-analytics.com/debug/mp/collect"
        else "https://www.google-analytics.com/mp/collect"
      val url = s"$domain?$urlParam=$measurementId&api_secret=$apiSecret"
      val t = transport
      Workers.resolveTable(spark, table).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          rows.foreach { row =>
            val payload = pyTemplateSubstitute(template, rowValues(row))
            val (status, _) = t.post(url, payload)
            if (!debug && status != 204)
              throw new RuntimeException(s"Failed to send event with status code ($status)")
          }
      }
    }
  }

  /**
   * BQToAdsOfflineClickConversion: rows → conversion JSONs, uploaded in
   * chunks of ≤2000 (API max) with partial-failure mode.
   */
  final class AdsOfflineClickConversion(
      spark: SparkSession,
      params: Map[String, WorkerValue],
      transport: HttpTransport = RecordingTransport) extends Worker {

    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "bq_table_id")
      val template = Workers.str(params, "template")
      val customerId = Workers.str(params, "customer_id")
      val url = s"https://googleads.googleapis.com/customers/$customerId:uploadClickConversions"
      val t = transport
      // batch size 2000 (bq_to_ads_offline_click_conversion.py:38); local val so
      // the task closure doesn't capture non-serializable `this`
      val batchSize = AdsOfflineClickConversion.BatchSize
      Workers.resolveTable(spark, table).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          rows.grouped(batchSize).foreach { batch =>
            val conversions = batch.map(r => pyTemplateSubstitute(template, rowValues(r)))
            val payload =
              s"""{"conversions":[${conversions.mkString(",")}],"partialFailure":true}"""
            val (status, _) = t.post(url, payload)
            if (status / 100 != 2)
              throw new RuntimeException(s"Conversion upload failed with status $status")
          }
      }
    }
  }

  object AdsOfflineClickConversion {
    val BatchSize = 2000 // bq_to_ads_offline_click_conversion.py:38
  }

  /**
   * detect_patch_update (common/utils.py:6-36): deep tree compare deciding
   * whether an audience patch would change the target — used by the GA
   * audience updaters to skip no-op API calls.
   */
  def detectPatchUpdate(patch: JValue, target: JValue): Boolean = (patch, target) match {
    case (JObject(pf), JObject(tf)) =>
      val pm = pf.toMap; val tm = tf.toMap
      val newKeys = pm.keySet.diff(tm.keySet)
      newKeys.nonEmpty || pm.exists { case (k, v) => detectPatchUpdate(v, tm(k)) }
    case (JArray(pa), JArray(ta)) =>
      pa.length != ta.length || pa.zip(ta).exists { case (p, t) => detectPatchUpdate(p, t) }
    case (p, t) if p.getClass != t.getClass => true
    case (p, t) => p != t
  }

  def detectPatchUpdate(patchJson: String, targetJson: String): Boolean =
    detectPatchUpdate(JsonMethods.parse(patchJson), JsonMethods.parse(targetJson))

  /**
   * GAAudiencesUpdater plan (ga_audiences_updater.py:22-63 + ga_utils):
   * template-rendered audiences from table rows diffed against the remote
   * list → insert/update operations. Remote fetch is a pluggable function
   * (the API client lives outside the engine).
   */
  final class AudiencesUpdater(
      spark: SparkSession,
      params: Map[String, WorkerValue],
      fetchRemote: () => Seq[(String, String)] = () => Nil, // (name, audienceJson)
      apply: (String, String, String) => Unit = (_, _, _) => ()) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "bq_table_id")
      val template = Workers.str(params, "template")
      val rows = Workers.resolveTable(spark, table).collect() // audience lists are small by contract
      val patches = rows.map { r =>
        val json = pyTemplateSubstitute(template, rowValues(r))
        val name = (JsonMethods.parse(json) \ "name") match {
          case JString(n) => n
          case _ => ""
        }
        name -> json
      }
      val remote = fetchRemote().toMap
      patches.foreach { case (name, patchJson) =>
        remote.get(name) match {
          case None => apply("insert", name, patchJson)
          case Some(targetJson) if detectPatchUpdate(patchJson, targetJson) =>
            apply("update", name, patchJson)
          case _ => ctx.log(s"Audience '$name' unchanged, skipping")
        }
      }
    }
  }

  def register(r: Dag.Registry, spark: SparkSession): Unit = {
    r.register("BQToMeasurementProtocolGA4")(p => new MeasurementProtocolGA4(spark, p))
    r.register("MeasurementProtocolGA4")(p => new MeasurementProtocolGA4(spark, p))
    r.register("BQToAdsOfflineClickConversion")(p => new AdsOfflineClickConversion(spark, p))
    r.register("AdsOfflineClickConversion")(p => new AdsOfflineClickConversion(spark, p))
    r.register("GAAudiencesUpdater")(p => new AudiencesUpdater(spark, p))
    // GA4AudiencesUpdater lives in Ga.register — it needs an AdminClient
    // and carries the GA4-specific field handling + throttle.
  }
}
