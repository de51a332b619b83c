package graft.workers

import graft.core.Dag
import graft.core.Dag.{Worker, WorkerContext}
import graft.core.Spec.WorkerValue
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Google Analytics connector workers (SURVEY §2.1 rows 13-15 + the full
 * GA4 audience updater): GADataImporter's chunked upload + keep-last-N
 * eviction (`ga/ga_data_importer.py:27-75`; `ga/ga_utils.py:116-194`),
 * GA4ConversionEventCreator's idempotent-409 create
 * (`ga/ga_conversion_event_creator_ga4.py:21-34`; `ga_utils.py:499-528`),
 * GA4CustomDimensionCreator's scope/length validations
 * (`ga/ga_custom_dimension_creator_ga4.py:21-42`; `ga_utils.py:439-496`),
 * and GA4AudiencesUpdater's output-only/immutable field handling with the
 * 1 op/s Admin-API throttle (`ga_utils.py:324-436,417-419`).
 *
 * External API clients are pluggable traits (the engine has zero egress);
 * the in-JVM recording implementations double as the test harness.
 */
object Ga {

  // ---------------------------------------------------------------- clients

  /** GA (UA) Data Import management API surface used by the importer. */
  trait DataImportClient extends Serializable {
    /** Existing uploads as (id, uploadTime) — unsorted, like the API. */
    def listUploads(account: String, property: String, dataset: String): Seq[(String, String)]
    def deleteUploads(account: String, property: String, dataset: String,
        ids: Seq[String]): Unit
    /** One resumable-upload chunk. */
    def uploadChunk(account: String, property: String, dataset: String,
        chunk: Array[Byte]): Unit
  }

  /** GA4 Admin API surface used by the creators/updater. `create*` throws
    * [[HttpStatusException]] to model HTTP errors (409 = already exists). */
  trait AdminClient extends Serializable {
    def createConversionEvent(property: String, bodyJson: String): Unit
    def createCustomDimension(property: String, bodyJson: String): Unit
    def listAudiences(property: String): Seq[String] // audience JSONs
    def createAudience(property: String, bodyJson: String): Unit
    def patchAudience(name: String, updateMask: String, bodyJson: String): Unit
  }

  final class HttpStatusException(val status: Int, msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------- GADataImporter

  /** Upload chunk size, `ga_utils.py:162` (1 MB). */
  val UploadChunkBytes: Int = 1024 * 1024

  /**
   * GADataImporter (`ga_data_importer.py:27-75`): evict old uploads per
   * `max_uploads`, then stream the CSV to the Data Import in 1 MB chunks.
   * Eviction (`ga_utils.py:142-147`): sort by uploadTime ascending;
   * max_uploads == 1 → delete ALL existing; max_uploads = N > 1 → keep the
   * newest N-1 (the incoming upload becomes the Nth); unset → keep all.
   */
  final class GaDataImporter(
      spark: SparkSession,
      params: Map[String, WorkerValue],
      client: DataImportClient,
      progress: Double => Unit = _ => ()) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val uri = Workers.str(params, "csv_uri")
      val account = Workers.str(params, "account_id")
      val property = Workers.str(params, "property_id")
      val dataset = Workers.str(params, "dataset_id")
      require(uri.nonEmpty && account.nonEmpty && property.nonEmpty && dataset.nonEmpty,
        "'csv_uri', 'account_id', 'property_id' and 'dataset_id' are required")
      val maxUploads = Workers.num(params, "max_uploads", 0)

      if (maxUploads > 0) {
        val keep = if (maxUploads == 1) 0 else (maxUploads - 1).toInt
        val deleted = deleteOldestUploads(client, account, property, dataset, keep)
        ctx.log(
          if (maxUploads == 1) s"Deleted all existing uploads for ids: $deleted"
          else s"Deleted oldest upload(s) for ids: $deleted")
      } else ctx.log("Kept all uploads")

      // stream the file through the chunked resumable upload — never
      // materialized whole (reference note: 1GB files are common)
      val path = new Path(uri)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val total = fs.getFileStatus(path).getLen.toDouble
      val in = fs.open(path)
      try {
        val buf = new Array[Byte](UploadChunkBytes)
        var sent = 0L
        // read-FULLY per chunk: a single in.read returns partial data at
        // block boundaries on remote filesystems, and resumable-upload
        // protocols require full-size non-final chunks
        var eof = false
        while (!eof) {
          var filled = 0
          while (!eof && filled < buf.length) {
            val n = in.read(buf, filled, buf.length - filled)
            if (n < 0) eof = true else filled += n
          }
          if (filled > 0) {
            client.uploadChunk(account, property, dataset, buf.take(filled))
            sent += filled
            // progress rounded to 4 digits (ga_utils.py:188-191)
            progress(math.rint(sent / total * 10000) / 10000)
          }
        }
        progress(1.0)
      } finally in.close()
      ctx.log("Successfully uploaded data import to Google Analytics")
    }
  }

  /** delete_oldest_uploads (`ga_utils.py:117-156`): keep == 0 deletes all.
    * Returns the deleted ids (oldest first). */
  def deleteOldestUploads(client: DataImportClient, account: String,
      property: String, dataset: String, keep: Int): Seq[String] = {
    require(keep >= 0, s"Invalid value for argument `max_to_keep`: $keep")
    val sorted = client.listUploads(account, property, dataset).sortBy(_._2)
    val toDelete = (if (keep == 0) sorted else sorted.dropRight(keep)).map(_._1)
    if (toDelete.nonEmpty) client.deleteUploads(account, property, dataset, toDelete)
    toDelete
  }

  // --------------------------------------------- GA4 conversion + dimension

  /** GA4ConversionEventCreator (`ga_utils.py:499-528`): ≤40-char event
    * name; create is idempotent on HTTP 409. */
  final class Ga4ConversionEventCreator(
      params: Map[String, WorkerValue],
      client: AdminClient) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val property = Workers.str(params, "ga_property_id")
      val eventName = Workers.str(params, "event_name")
      require(eventName.length <= 40, "Event names must be 40 characters or fewer.")
      val body = JsonMethods.compact(JObject("eventName" -> JString(eventName)))
      try {
        ctx.log(s"Creating new conversion event named $eventName.")
        client.createConversionEvent(property, body)
      } catch {
        case e: HttpStatusException if e.status == 409 =>
          ctx.log("Requested conversion event already exists. No changes made.")
      }
    }
  }

  /** GA4CustomDimensionCreator (`ga_utils.py:439-496`): scope-dependent
    * parameter-name limits (USER 24 / EVENT 40), display ≤82,
    * description ≤150; NPA flag only for USER scope; 409-idempotent. */
  final class Ga4CustomDimensionCreator(
      params: Map[String, WorkerValue],
      client: AdminClient) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val property = Workers.str(params, "ga_property_id")
      val parameterName = Workers.str(params, "parameter_name")
      val scope = Workers.str(params, "scope")
      val displayName = Workers.str(params, "display_name")
      val description = Workers.str(params, "description")
      val npa = Workers.bool(params, "disallow_ads_personalization")
      val maxLen = Map("USER" -> 24, "EVENT" -> 40)
      require(maxLen.contains(scope), "Scope must be either USER or EVENT.")
      require(parameterName.length <= maxLen(scope),
        s"Parameter Name can be ${maxLen(scope)} characters maximum.")
      require(displayName.length <= 82, "Display Name can be 82 characters maximum.")
      require(description.length <= 150, "Description can be 150 characters maximum.")
      var fields: List[(String, JValue)] = List(
        "parameterName" -> JString(parameterName),
        "scope" -> JString(scope),
        "displayName" -> JString(displayName))
      if (scope == "USER") fields :+= ("disallowAdsPersonalization" -> JBool(npa))
      if (description.nonEmpty) fields :+= ("description" -> JString(description))
      try {
        ctx.log("Inserting new custom dimension.")
        client.createCustomDimension(property, JsonMethods.compact(JObject(fields: _*)))
      } catch {
        case e: HttpStatusException if e.status == 409 =>
          ctx.log("Requested parameter name already exists. No changes made.")
      }
    }
  }

  // ------------------------------------------------- GA4 audiences updater

  private val Ga4RequiredFields =
    Seq("displayName", "description", "membershipDurationDays", "filterClauses")
  private val Ga4ImmutableFields =
    Seq("membershipDurationDays", "exclusionDurationMode", "filterClauses")
  private val Ga4OutputOnlyFields = Seq("name", "adsPersonalizationEnabled")

  /** One planned Admin-API call. */
  sealed trait AudienceOp
  case class InsertAudience(body: JObject) extends AudienceOp
  case class UpdateAudience(resourceName: String, body: JObject) extends AudienceOp

  private def stripFields(o: JObject, fields: Seq[String]): JObject =
    JObject(o.obj.filterNot { case (k, _) => fields.contains(k) })

  /**
   * get_audience_operations_ga4 (`ga_utils.py:351-397`): diff patches
   * against the remote audience map keyed by displayName. Output-only
   * fields are removed from the target before comparison; immutable-field
   * drift warns and is stripped from the update body; inserts must carry
   * the required fields.
   */
  def audienceOperationsGa4(
      patches: Seq[JObject],
      remote: Map[String, JObject],
      warn: String => Unit = _ => ()): Seq[AudienceOp] =
    patches.flatMap { patch =>
      val displayName = patch \ "displayName" match {
        case JString(n) => n
        case _ => ""
      }
      remote.get(displayName) match {
        case Some(target) =>
          val cleaned = stripFields(target, Ga4OutputOnlyFields)
          if (Sinks.detectPatchUpdate(patch, cleaned)) {
            Ga4ImmutableFields.foreach { f =>
              val lhs = patch \ f
              val rhs = cleaned \ f
              val drift = (lhs, rhs) match {
                case (JNothing, _) => false // template omits the field: no intent, no drift
                case (_, JNothing) => true // template sets a field GA4 doesn't have
                case (l, r) => Sinks.detectPatchUpdate(l, r)
              }
              if (drift) warn(
                s"""Change detected in immutable field "$f". Either fix the template """ +
                  s"to match the GA4 value or delete the audience named " +
                  s""""$displayName" in GA4.""")
            }
            val resourceName = target \ "name" match {
              case JString(n) => n
              case _ => ""
            }
            Some(UpdateAudience(resourceName, stripFields(patch, Ga4ImmutableFields)))
          } else None
        case None =>
          val missing = Ga4RequiredFields.filterNot(f => (patch \ f) != JNothing)
          if (missing.nonEmpty)
            throw new IllegalArgumentException(
              s"You are missing some required fields in your template: $missing")
          Some(InsertAudience(patch))
      }
    }

  /**
   * GA4AudiencesUpdater (`ga_audiences_updater_ga4.py:23-57`): table rows →
   * templated audience patches → diff → throttled Admin-API operations.
   * The 1 op/s sleep is the documented Admin API quota
   * (`ga_utils.py:417-419`; BASELINE.md) — injectable for tests.
   */
  final class Ga4AudiencesUpdater(
      spark: SparkSession,
      params: Map[String, WorkerValue],
      client: AdminClient,
      sleep: Long => Unit = Thread.sleep) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "bq_table_id")
      val template = Workers.str(params, "template")
      val property = Workers.str(params, "ga_property_id")
      val rows = Workers.resolveTable(spark, table).collect() // audience lists are small by contract
      val patches = rows.map { r =>
        JsonMethods.parse(Sinks.pyTemplateSubstitute(template, Sinks.rowValues(r)))
          .asInstanceOf[JObject]
      }.toSeq
      val remote = client.listAudiences(property).map { json =>
        val o = JsonMethods.parse(json).asInstanceOf[JObject]
        val name = o \ "displayName" match {
          case JString(n) => n
          case _ => ""
        }
        name -> o
      }.toMap
      val ops = audienceOperationsGa4(patches, remote, warn = ctx.log)
      ops.foreach { op =>
        sleep(1000L) // 1 op/s Admin API quota (ga_utils.py:417-419)
        op match {
          case InsertAudience(body) =>
            ctx.log("Inserting new audience")
            client.createAudience(property, JsonMethods.compact(body))
          case UpdateAudience(name, body) =>
            val mask = body.obj.map(_._1).mkString(",")
            ctx.log(s"Updating existing audience for resource: $name")
            client.patchAudience(name, mask, JsonMethods.compact(body))
        }
      }
    }
  }

  def register(r: Dag.Registry, spark: SparkSession,
      dataImport: DataImportClient, admin: AdminClient): Unit = {
    r.register("GADataImporter")(p => new GaDataImporter(spark, p, dataImport))
    r.register("GA4ConversionEventCreator")(p => new Ga4ConversionEventCreator(p, admin))
    r.register("GA4CustomDimensionCreator")(p => new Ga4CustomDimensionCreator(p, admin))
    r.register("GA4AudiencesUpdater")(p => new Ga4AudiencesUpdater(spark, p, admin))
  }
}
