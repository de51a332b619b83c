package graft.plans

import java.time.LocalDate
import graft.core.Spec._
import graft.plans.MlCompiler.{GaFeature, GaLabel, GaTrigger, MlModel}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * MlModel → pipeline compiler (`ml_model/compiler.py:246-266` +
 * `templates/training_pipeline.json`, `templates/predictive_pipeline.json`):
 * turns one model configuration into the two runnable [[PipelineSpec]]s the
 * reference deploys —
 *
 *  - TRAINING: a dataset+train Setup job (plus, for classifiers, a
 *    Conversion Value Calculations job chained on `success`) on the
 *    quarterly cron `0 0 {safe_day} {quarterly_months} *`;
 *  - PREDICTIVE: Setup → Output → Upload chained on `success`, daily
 *    (`0 0 * * *`), where Output is a real BQ-dialect SQL script (the
 *    `output.sql` composition) and Upload is the destination worker with
 *    the reference's parameter set (MP batch 20, debug false /
 *    Ads customer id + conversion action).
 *
 * Where the reference compiles ALL work into SQL text for a generic
 * script-executor worker, the Spark-native engine compiles the
 * dataset/train/predict steps into a typed model config (the JSON this
 * object codecs) consumed by native DataFrame workers
 * ([[graft.workers.MlModelJobs]]) — the Output step stays a genuine SQL
 * script because that step IS relational. Pipeline shape (job names,
 * chaining, crons, upload params) matches the reference's templates.
 */
object MlModelPipelines {

  /** `ml_model/shared.py` Source (the input.source vocabulary). */
  sealed abstract class InputSource(val wire: String) {
    def hasGa: Boolean = this != FirstParty
    def hasFp: Boolean = this != GoogleAnalytics
  }
  case object GoogleAnalytics extends InputSource("GOOGLE_ANALYTICS")
  case object FirstParty extends InputSource("FIRST_PARTY")
  case object GoogleAnalyticsAndFirstParty
    extends InputSource("GOOGLE_ANALYTICS_AND_FIRST_PARTY")
  object InputSource {
    def fromWire(s: String): InputSource = s.toUpperCase match {
      case "FIRST_PARTY" => FirstParty
      case "GOOGLE_ANALYTICS_AND_FIRST_PARTY" => GoogleAnalyticsAndFirstParty
      case _ => GoogleAnalytics
    }
  }

  /** `compiler.py:65-67`. */
  sealed abstract class Destination(val wire: String)
  case object GoogleAnalyticsMpEvent extends Destination("GOOGLE_ANALYTICS_MP_EVENT")
  case object GoogleAdsOfflineConversion extends Destination("GOOGLE_ADS_OFFLINE_CONVERSION")
  object Destination {
    def fromWire(s: String): Destination = s.toUpperCase match {
      case "GOOGLE_ADS_OFFLINE_CONVERSION" => GoogleAdsOfflineConversion
      case _ => GoogleAnalyticsMpEvent
    }
  }

  /** `compiler.py:50-62`. */
  val RegressionTypes: Set[String] =
    Set("BOOSTED_TREE_REGRESSOR", "DNN_REGRESSOR", "RANDOM_FOREST_REGRESSOR", "LINEAR_REG")
  val ClassificationTypes: Set[String] =
    Set("BOOSTED_TREE_CLASSIFIER", "DNN_CLASSIFIER", "RANDOM_FOREST_CLASSIFIER", "LOGISTIC_REG")

  /**
   * The pipeline-facing MlModel (`models.py:371-666` slice + the compiler
   * context `compiler.py:227-250`). `dataset` is the dataset-compiler
   * slice; `sourceDir`/`workDir` are the Spark analogs of the BigQuery
   * project/dataset data locations (where the GA4 export lives / where
   * model + tables land).
   */
  case class MlModelSpec(
      name: String,
      modelType: String,
      dataset: MlModel,
      projectId: String,
      bqDatasetId: String,
      bqDatasetLocation: String,
      destination: Destination,
      ga4MeasurementId: String = "",
      ga4ApiSecret: String = "",
      adsCustomerId: String = "",
      adsConversionActionId: String = "",
      hyperParameters: Seq[(String, String)] = Nil,
      // the event carrying the ad-click id for the ads-destination output
      // (`output.sql:105-117` hardcodes page_view; the driver fixture's
      // vocabulary uses click)
      clickEvent: String = "page_view",
      source: InputSource = GoogleAnalytics,
      // first-party input (`input.parameters.first_party_table` +
      // the FIRST_PARTY variable roles, compiler.py:109-206)
      fpTable: String = "",
      fpRoles: Option[MlCompiler.FpRoles] = None,
      fpGclid: String = "",
      sourceDir: String = "",
      workDir: String = "") {
    require(RegressionTypes.contains(modelType.toUpperCase) ||
      ClassificationTypes.contains(modelType.toUpperCase),
      s"Unknown model type: $modelType (compiler.py:50-62)")
    def isClassification: Boolean = ClassificationTypes.contains(modelType.toUpperCase)
    /** Reference worker-facing table ids (`{project}.{dataset}.X` with the
      * project dropped — the session catalog is the "project"). */
    def table(n: String): String = s"$bqDatasetId.$n"
  }

  // ---- schedule helpers (compiler.py:367-379) ----

  /** Current day if < 28 else 28 — never schedules Feb 29/30/31. */
  def safeDay(today: LocalDate = LocalDate.now()): String = {
    val d = today.getDayOfMonth
    if (d < 28) d.toString else "28"
  }

  /** Months every 3 from the current month, mod-12 wrapped. */
  def quarterlyMonths(today: LocalDate = LocalDate.now()): String =
    (today.getMonthValue until today.getMonthValue + 11 by 3)
      .map(m => if (m > 12) m % 12 else m).mkString(",")

  def trainingCron(today: LocalDate = LocalDate.now()): String =
    s"0 0 ${safeDay(today)} ${quarterlyMonths(today)} *"

  val PredictiveCron = "0 0 * * *"

  private def uuid(): String = java.util.UUID.randomUUID().toString

  private def p(name: String, t: ParamType, value: String): ParamSpec =
    ParamSpec(name, t, value)

  /** The params every dataset/train/predict job gets: the full model
    * config (the Spark analog of the reference's compiled SQL text) plus
    * the location passthrough the reference attaches to every job. */
  private def modelParams(cfg: MlModelSpec): Seq[ParamSpec] = Seq(
    p("ml_model", ParamType.Text, toJson(cfg)),
    p("bq_dataset_location", ParamType.PString, cfg.bqDatasetLocation))

  /** Compile-time validation: a model created over the REST wire with
    * missing locations or hostile identifier fields must fail at
    * pipeline-build time (the reference validates on save), not at 2 AM
    * when the cron fires — and `bqDatasetId`/`clickEvent` are spliced
    * into SQL text, so they are restricted to identifier-safe characters
    * rather than escaped. */
  private val IdentRe = "[A-Za-z_][A-Za-z0-9_]*"

  private def validateForCompile(cfg: MlModelSpec): Unit = {
    // the reference's compiler is where a user first learns their model
    // type can't run (`compiler.py:50-62`); our trainer's rejection
    // (`workers/Ml.scala` estimator) must therefore surface HERE, at
    // pipeline-compile time, not when the quarterly cron fires
    require(!cfg.modelType.equalsIgnoreCase("DNN_REGRESSOR"),
      "MODEL_TYPE DNN_REGRESSOR is not supported: MLlib has no perceptron " +
        "regressor; use BOOSTED_TREE_REGRESSOR / RANDOM_FOREST_REGRESSOR / LINEAR_REG")
    require(!cfg.source.hasGa || cfg.sourceDir.nonEmpty,
      "source_dir is required to compile pipelines over a GA source")
    require(cfg.workDir.nonEmpty, "work_dir is required to compile pipelines")
    require(cfg.bqDatasetId.matches(IdentRe),
      s"bq_dataset_id must be an identifier: '${cfg.bqDatasetId}'")
    require(cfg.clickEvent.matches("[A-Za-z0-9_.-]+"),
      s"click_event must be an event name: '${cfg.clickEvent}'")
    // the suffix window is spliced into the first-party Output SQL as
    // literals (and is a _TABLE_SUFFIX-shaped date everywhere else)
    require(cfg.dataset.suffixLo.matches("[0-9]{8}") && cfg.dataset.suffixHi.matches("[0-9]{8}"),
      s"timespan bounds must be yyyyMMdd: '${cfg.dataset.suffixLo}'..'${cfg.dataset.suffixHi}'")
    if (cfg.source.hasFp) {
      require(cfg.fpTable.nonEmpty, "first_party_table is required for a FIRST_PARTY source")
      val roles = cfg.fpRoles.getOrElse(
        throw new IllegalArgumentException("FIRST_PARTY variables (roles) are required"))
      if (cfg.source == FirstParty) {
        // fp-only models take the label and the Output window from the
        // customer table; compiling without these roles would fail only
        // when the nightly cron fires
        require(roles.label.isDefined,
          "a FIRST_PARTY-only model requires a FIRST_PARTY LABEL variable")
        require(roles.triggerDate.isDefined,
          "a FIRST_PARTY-only model requires a TRIGGER_DATE variable")
        require(cfg.destination != GoogleAdsOfflineConversion || cfg.fpGclid.nonEmpty,
          "the Ads destination requires a FIRST_PARTY GCLID variable")
      }
      // role column names are spliced into the Output SQL
      val spliced = Seq(roles.uniqueId) ++ roles.triggerDate ++
        (if (cfg.fpGclid.nonEmpty) Seq(cfg.fpGclid) else Nil)
      spliced.foreach(c => require(c.matches(IdentRe),
        s"first-party role columns must be identifiers: '$c'"))
    }
    // Feature-variable invariants: a malformed wire feature must fail HERE,
    // not as a MatchError/NumberFormatException when the nightly cron
    // builds the plan (keyed-without-comparison features are legal — they
    // fall back to name counters, as the reference's template does).
    cfg.dataset.features.filterNot(_.isNameCounter).foreach { f =>
      require(f.description != null && f.description.nonEmpty,
        s"feature '${f.name}' has a comparison but no description " +
          "(the description names its cnt_ output column)")
      f.cmp match {
        case MlCompiler.Regex(pat) =>
          require(pat != null && pat.nonEmpty,
            s"feature '${f.name}': REGEX comparison requires a pattern")
          require(scala.util.Try(java.util.regex.Pattern.compile(pat)).isSuccess,
            s"feature '${f.name}': REGEX pattern does not compile: '$pat'")
        case (MlCompiler.Equal | MlCompiler.NotEqual) if f.valueIsString =>
          require(f.value != null, s"feature '${f.name}': comparison requires a value")
        case _ =>
          require(f.value != null && scala.util.Try(f.value.toDouble).isSuccess,
            s"feature '${f.name}': numeric comparison requires a numeric " +
              s"value, got '${f.value}'")
      }
    }
    val outs = cfg.dataset.features.map(_.outName)
    require(outs.distinct.size == outs.size,
      s"duplicate feature output columns: ${outs.diff(outs.distinct).distinct.mkString(", ")}")
  }

  /** `templates/training_pipeline.json`. */
  def training(cfg: MlModelSpec, today: LocalDate = LocalDate.now()): PipelineSpec = {
    validateForCompile(cfg)
    val setupId = uuid()
    val setup = JobSpec(setupId, s"${cfg.name} - Training Setup",
      "MlTrainingSetup", modelParams(cfg))
    val jobs =
      if (cfg.isClassification)
        Seq(setup, JobSpec(uuid(), s"${cfg.name} - Conversion Value Calculations",
          "MlConversionValues", modelParams(cfg),
          Seq(StartConditionSpec(setupId, Condition.Success))))
      else Seq(setup)
    PipelineSpec(s"${cfg.name} - Training", jobs,
      schedules = Seq(ScheduleSpec(trainingCron(today))))
  }

  /** `templates/predictive_pipeline.json`. */
  def predictive(cfg: MlModelSpec): PipelineSpec = {
    validateForCompile(cfg)
    val setupId = uuid()
    val outputId = uuid()
    val setup = JobSpec(setupId, s"${cfg.name} - Predictive Setup",
      "MlPredictiveSetup", modelParams(cfg))
    val output = JobSpec(outputId, s"${cfg.name} - Predictive Output",
      "BQScriptExecutor", Seq(
        p("script", ParamType.Sql, outputScript(cfg)),
        p("bq_dataset_location", ParamType.PString, cfg.bqDatasetLocation)),
      Seq(StartConditionSpec(setupId, Condition.Success)))
    val upload = JobSpec(uuid(), s"${cfg.name} - Predictive Upload",
      uploadWorkerClass(cfg), uploadParams(cfg),
      Seq(StartConditionSpec(outputId, Condition.Success)))
    PipelineSpec(s"${cfg.name} - Predictive", Seq(setup, output, upload),
      schedules = Seq(ScheduleSpec(PredictiveCron)))
  }

  private def uploadWorkerClass(cfg: MlModelSpec): String = cfg.destination match {
    case GoogleAnalyticsMpEvent => "BQToMeasurementProtocolGA4"
    case GoogleAdsOfflineConversion => "BQToAdsOfflineClickConversion"
  }

  /** `predictive_pipeline.json:57-146`: the reference's upload parameter
    * set verbatim (bq_table_id carries the dataset prefix so the session
    * catalog resolves it — the separate bq_dataset_id param is kept for
    * shape parity). */
  private def uploadParams(cfg: MlModelSpec): Seq[ParamSpec] = {
    val common = Seq(
      p("bq_project_id", ParamType.PString, cfg.projectId),
      p("bq_dataset_id", ParamType.PString, cfg.bqDatasetId),
      p("bq_dataset_location", ParamType.PString, cfg.bqDatasetLocation),
      p("bq_table_id", ParamType.PString, cfg.table("output")))
    cfg.destination match {
      case GoogleAnalyticsMpEvent => common ++ Seq(
        p("measurement_id", ParamType.PString, cfg.ga4MeasurementId),
        p("api_secret", ParamType.PString, cfg.ga4ApiSecret),
        p("template", ParamType.Text, mpEventTemplate(cfg)),
        p("mp_batch_size", ParamType.PNumber, "20"),
        p("debug", ParamType.PBoolean, "0"))
      case GoogleAdsOfflineConversion => common ++ Seq(
        p("customer_id", ParamType.PString, cfg.adsCustomerId),
        p("template", ParamType.Text, adsConversionTemplate(cfg)),
        p("debug", ParamType.PBoolean, "0"))
    }
  }

  /** `templates/google_analytics_mp_event.json` compiled: clientId when
    * the model keys on CLIENT_ID *or* GA is in source (the output table
    * then carries client_id), userId when it keys on USER_ID — the
    * template's placeholders must match the output table's columns or
    * the upload worker's row substitution throws. */
  def mpEventTemplate(cfg: MlModelSpec): String = {
    val isUser = cfg.dataset.uniqueId == "user_id"
    val clientId =
      if (!isUser || cfg.source.hasGa) """"clientId": "${client_id}", """ else ""
    val userId = if (isUser) """"userId": "${user_id}", """ else ""
    val ids = clientId + userId
    val scoreFields =
      if (cfg.isClassification) """"score": "${score}", "nscore": "${normalized_score}""""
      else """"revenue": "${revenue}""""
    s"""{$ids"nonPersonalizedAds": false, "events": [{"name": "$${event_name}", """ +
      s""""params": {"type": "$${type}", "value": "$${value}", $scoreFields}}]}"""
  }

  /** `templates/google_ads_offline_conversion.json` compiled. */
  def adsConversionTemplate(cfg: MlModelSpec): String =
    s"""{"conversionEnvironment": "WEB", "gclid": "$${gclid}", """ +
      s""""conversionAction": "customers/${cfg.adsCustomerId}/conversionActions/${cfg.adsConversionActionId}", """ +
      s""""conversionDateTime": "$${datetime}", "conversionValue": $${value}, "currencyCode": "USD"}"""

  /**
   * The OUTPUTING-step script (`output.sql:2-135`) in the engine's BQ
   * dialect: for a GA source, latest shard from `__TABLES_SUMMARY__` +
   * wildcard event scan; for a FIRST_PARTY source, the customer table
   * windowed on its trigger-date column (the reference scans
   * "yesterday"; the engine scans the model's predictive window so the
   * nightly shape is reproducible over fixed data). Then the
   * `prepared_predictions` band join and the destination branch — MP's
   * users-without-score anti-join or Ads' freshest-gclid window (GA) /
   * direct gclid column (first-party). The correlated-UNNEST spellings
   * become Spark higher-order/LATERAL VIEW forms; everything else is the
   * reference's text shape. The oracle-checked DataFrame twins are
   * `output_predictions`/`_mp` in `queries/Ml.scala`; the script paths
   * are exercised end-to-end by the compiled-pipeline integration specs.
   */
  def outputScript(cfg: MlModelSpec): String = {
    val ds = cfg.bqDatasetId
    val ga = cfg.source.hasGa
    // the {ds}_events_star / {ds}_tables_summary / {ds}_first_party views
    // are registered by the Setup job, namespaced per dataset id so
    // concurrent predictive pipelines for different models cannot scan
    // each other's source (the dialect's generic session-global
    // `events_*` rewrite stays available for ad-hoc scripts)
    val head =
      if (ga)
        s"""DECLARE _LATEST_TABLE_SUFFIX STRING DEFAULT (
           |  SELECT MAX(SPLIT(table_id, 'events_')[OFFSET(1)])
           |  FROM ${ds}_tables_summary
           |  WHERE REGEXP_CONTAINS(table_id, '^events_[0-9]+$$')
           |);""".stripMargin
      else ""
    val sourceCte =
      if (ga)
        s"""  events AS (
           |    SELECT ${cfg.dataset.uniqueId} AS unique_id,
           |      event_name AS name,
           |      event_timestamp AS `timestamp`,
           |      event_params AS params
           |    FROM ${ds}_events_star
           |    WHERE _TABLE_SUFFIX = _LATEST_TABLE_SUFFIX
           |    AND LOWER(platform) = 'web'
           |  )""".stripMargin
      else {
        // output.sql:23-34 first_party branch; the -1s end bound is the
        // reference's DATETIME_SUB(..., INTERVAL 1 SECOND)
        val roles = cfg.fpRoles.get
        val trigger = roles.triggerDate.getOrElse(
          throw new IllegalArgumentException("FIRST_PARTY output requires a TRIGGER_DATE role"))
        val gclidCol = if (cfg.fpGclid.nonEmpty) s"\n    ${cfg.fpGclid} AS gclid," else ""
        s"""  first_party AS (
           |    SELECT ${roles.uniqueId} AS unique_id,$gclidCol
           |      $trigger AS `timestamp`
           |    FROM ${ds}_first_party
           |    WHERE $trigger BETWEEN to_timestamp('${cfg.dataset.suffixLo}', 'yyyyMMdd')
           |    AND to_timestamp('${cfg.dataset.suffixHi}', 'yyyyMMdd') - INTERVAL 1 SECOND
           |  )""".stripMargin
      }
    // the GA export carries both GA ids alongside the model's unique id
    // (output.sql:40-43); a first-party table has only its unique id
    val gaIds = if (ga) " p.user_pseudo_id, p.user_id," else ""
    val gaIdsBare = if (ga) " user_pseudo_id, user_id," else ""
    val groupCols = if (ga) "1, 2, 3" else "1"
    val prepared =
      if (cfg.isClassification)
        s"""  prepared_predictions AS (
           |    SELECT DISTINCT
           |      p.unique_id,$gaIds
           |      ROUND(MAX(cv.value), 4) AS value,
           |      MAX(cv.normalized_probability) AS normalized_score,
           |      MAX(p.probability) * 100 AS score
           |    FROM ${cfg.table("predictions")} p
           |    LEFT OUTER JOIN ${cfg.table("conversion_values")} cv
           |    ON p.probability BETWEEN cv.probability_range_start AND cv.probability_range_end
           |    GROUP BY $groupCols
           |  )""".stripMargin
      else
        s"""  prepared_predictions AS (
           |    SELECT DISTINCT
           |      unique_id,$gaIdsBare
           |      IF(predicted_label > 0, ROUND(predicted_label, 4), 0) AS value,
           |      IF(predicted_label > 0, ROUND(predicted_label, 4), 0) AS revenue
           |    FROM ${cfg.table("predictions")}
           |  )""".stripMargin
    val exceptIds = if (ga) "unique_id, user_pseudo_id, user_id" else "unique_id"
    val branch = cfg.destination match {
      case GoogleAnalyticsMpEvent =>
        val idCols =
          if (ga && cfg.dataset.uniqueId == "user_id")
            "p.user_pseudo_id AS client_id,\n    p.unique_id AS user_id,"
          else if (cfg.dataset.uniqueId == "user_id") "p.unique_id AS user_id,"
          else "p.unique_id AS client_id,"
        val wos =
          if (ga)
            // unique_id IS NOT NULL: the reference's NOT IN (output.sql:82)
            // silently returns ZERO rows the moment one prop_score event
            // carries a NULL unique_id (a signed-out session on a USER_ID
            // model) — NULL in a NOT IN subquery poisons every row. The
            // guard makes the script agree with the left_anti DataFrame
            // twin (output_predictions_mp) on all inputs; NULL-id rows
            // themselves never reach the output either way (the final
            // equi-join cannot match them).
            s"""  users_with_score AS (
               |    SELECT DISTINCT unique_id FROM events
               |    WHERE name = 'prop_score'
               |    AND EXISTS(params, pp -> pp.value.string_value = 'Predicted_Value')
               |    AND unique_id IS NOT NULL
               |  ),
               |  users_without_score AS (
               |    SELECT DISTINCT unique_id FROM events
               |    WHERE unique_id NOT IN (SELECT unique_id FROM users_with_score)
               |  )""".stripMargin
          else
            s"""  users_without_score AS (
               |    SELECT DISTINCT unique_id FROM first_party
               |  )""".stripMargin
        s"""$wos
           |  SELECT
           |    p.* EXCEPT($exceptIds),
           |    $idCols
           |    'prop_score' AS event_name,
           |    'Predicted_Value' AS type
           |  FROM prepared_predictions p
           |  INNER JOIN users_without_score wos
           |  ON p.unique_id = wos.unique_id""".stripMargin
      case GoogleAdsOfflineConversion =>
        val gclids =
          if (ga)
            s"""  gclids AS (
               |    SELECT * EXCEPT(row_num) FROM (
               |      SELECT unique_id,
               |        p.value.string_value AS gclid,
               |        FORMAT_TIMESTAMP('%F %T%Ez', TIMESTAMP_MICROS(`timestamp`)) AS `datetime`,
               |        ROW_NUMBER() OVER (PARTITION BY unique_id
               |          ORDER BY `timestamp` DESC, p.value.string_value DESC) AS row_num
               |      FROM events LATERAL VIEW EXPLODE(params) t AS p
               |      WHERE name = '${cfg.clickEvent}' AND p.key = 'gclid'
               |      AND COALESCE(p.value.string_value, '') != ''
               |    ) WHERE row_num = 1
               |  )""".stripMargin
          else
            s"""  gclids AS (
               |    SELECT unique_id, gclid,
               |      FORMAT_TIMESTAMP('%F %T%Ez', `timestamp`) AS `datetime`
               |    FROM first_party
               |    WHERE COALESCE(gclid, '') != ''
               |  )""".stripMargin
        s"""$gclids
           |  SELECT p.*, g.gclid, g.`datetime`
           |  FROM prepared_predictions p
           |  INNER JOIN gclids g
           |  ON p.unique_id = g.unique_id""".stripMargin
    }
    // CREATE OR REPLACE TABLE is a v2-catalog statement; the session
    // catalog spells the same semantic as DROP + CTAS
    s"""$head
       |DROP TABLE IF EXISTS ${cfg.table("output")};
       |CREATE TABLE ${cfg.table("output")} AS (
       |  WITH
       |$sourceCte,
       |$prepared,
       |$branch
       |);""".stripMargin.stripLeading()
  }

  // ---- JSON codec (the /api/ml-models wire format; ml_model/views.py) ----

  def toJson(cfg: MlModelSpec): String = {
    val d = cfg.dataset
    def vbl(role: String, name: String, key: String, cmp: String = null,
        value: String = null, isStr: Boolean = false, desc: String = null,
        source: String = "GOOGLE_ANALYTICS"): JValue = {
      val base: List[(String, JValue)] = List(
        "role" -> JString(role), "name" -> JString(name),
        "source" -> JString(source))
      val kv = Option(key).map(k => "key" -> (JString(k): JValue)).toList
      val cv = Option(cmp).map(c => "comparison" -> (JString(c): JValue)).toList
      val vv = Option(value).map(v => "value" -> (JString(v): JValue)).toList
      val sv = if (isStr) List("value_is_string" -> (JBool(true): JValue)) else Nil
      val dv = Option(desc).map(x => "description" -> (JString(x): JValue)).toList
      JObject(base ++ kv ++ cv ++ vv ++ sv ++ dv)
    }
    def cmpWire(c: MlCompiler.Cmp): (String, String) = c match {
      case null => (null, null)
      case MlCompiler.Equal => ("EQUAL", null)
      case MlCompiler.NotEqual => ("NOT_EQUAL", null)
      case MlCompiler.Greater => ("GREATER", null)
      case MlCompiler.GreaterOrEqual => ("GREATER_OR_EQUAL", null)
      case MlCompiler.Less => ("LESS", null)
      case MlCompiler.LessOrEqual => ("LESS_OR_EQUAL", null)
      case MlCompiler.Regex(pat) => ("REGEX", pat)
    }
    val features = d.features.map { f =>
      val (cw, regexPat) = cmpWire(f.cmp)
      vbl("FEATURE", f.name, f.key, cw,
        if (regexPat != null) regexPat else f.value, f.valueIsString, f.description)
    }
    val label =
      if (d.label != null && d.label.name != null && d.label.name.nonEmpty)
        List(vbl("LABEL", d.label.name, d.label.key, isStr = d.label.valueIsString))
      else Nil
    val trigger = d.triggerEvent.map(t => vbl("TRIGGER_EVENT", t.name, t.key)).toList
    def fpVbl(role: String, name: String): JValue =
      vbl(role, name, key = null, source = "FIRST_PARTY")
    // GCLID is emitted independently of the role set, mirroring fromJson
    val fpVars = cfg.fpRoles.toList.flatMap { r =>
      List(fpVbl("USER_ID", r.uniqueId)) ++
        r.features.map(fpVbl("FEATURE", _)) ++
        r.label.map(fpVbl("LABEL", _)) ++
        r.firstValue.map(fpVbl("FIRST_VALUE", _)) ++
        r.triggerDate.map(fpVbl("TRIGGER_DATE", _))
    } ++ (if (cfg.fpGclid.nonEmpty) List(fpVbl("GCLID", cfg.fpGclid)) else Nil)
    val j = JObject(
      "name" -> JString(cfg.name),
      "type" -> JString(cfg.modelType),
      "unique_id" -> JString(if (d.uniqueId == "user_id") "USER_ID" else "CLIENT_ID"),
      "destination" -> JString(cfg.destination.wire),
      "project_id" -> JString(cfg.projectId),
      "bq_dataset_id" -> JString(cfg.bqDatasetId),
      "bq_dataset_location" -> JString(cfg.bqDatasetLocation),
      "ga4_measurement_id" -> JString(cfg.ga4MeasurementId),
      "ga4_api_secret" -> JString(cfg.ga4ApiSecret),
      "ads_customer_id" -> JString(cfg.adsCustomerId),
      "ads_conversion_action_id" -> JString(cfg.adsConversionActionId),
      "click_event" -> JString(cfg.clickEvent),
      "source" -> JString(cfg.source.wire),
      "first_party_table" -> JString(cfg.fpTable),
      "source_dir" -> JString(cfg.sourceDir),
      "work_dir" -> JString(cfg.workDir),
      "class_imbalance" -> JInt(d.classImbalance),
      "conversion_rate_segments" -> JInt(d.conversionRateSegments),
      "average_conversion_value" -> JDouble(d.averageConversionValue),
      "hash_split" -> JBool(d.hashSplit),
      "split_hash" -> JString(d.splitHash match {
        case MlCompiler.Md5Split => "MD5"; case _ => "FARM" }),
      "engagement_event" -> JString(d.engagementEvent),
      "suffix_lo" -> JString(d.suffixLo),
      "suffix_hi" -> JString(d.suffixHi),
      "hyper_parameters" -> JArray(cfg.hyperParameters.map { case (n, v) =>
        JObject("name" -> JString(n), "value" -> JString(v)): JValue }.toList),
      "variables" -> JArray(((features.toList ++ label) ++ trigger ++ fpVars)))
    JsonMethods.compact(JsonMethods.render(j))
  }

  def fromJson(json: String): MlModelSpec = {
    val root = JsonMethods.parse(json)
    def str(k: String, default: String = ""): String =
      root \ k match { case JString(s) => s; case _ => default }
    def num(k: String, default: Double): Double = root \ k match {
      case JInt(i) => i.toDouble; case JDouble(d) => d; case JDecimal(d) => d.toDouble
      case _ => default
    }
    def bool(k: String, default: Boolean): Boolean =
      root \ k match { case JBool(b) => b; case _ => default }
    def vstr(v: JValue, k: String): String =
      v \ k match { case JString(s) => s; case _ => null }
    val allVars = root \ "variables" match { case JArray(a) => a; case _ => Nil }
    val (fpVars, vars) = allVars.partition(v => vstr(v, "source") == "FIRST_PARTY")
    def byRole(r: String): List[JValue] =
      vars.filter(v => vstr(v, "role") == r)
    def fpByRole(r: String): List[String] =
      fpVars.filter(v => vstr(v, "role") == r).map(v => vstr(v, "name"))
    def cmpOf(v: JValue): (MlCompiler.Cmp, String) = {
      val value = vstr(v, "value")
      vstr(v, "comparison") match {
        case null => (null, value)
        case "EQUAL" => (MlCompiler.Equal, value)
        case "NOT_EQUAL" => (MlCompiler.NotEqual, value)
        case "GREATER" => (MlCompiler.Greater, value)
        case "GREATER_OR_EQUAL" => (MlCompiler.GreaterOrEqual, value)
        case "LESS" => (MlCompiler.Less, value)
        case "LESS_OR_EQUAL" => (MlCompiler.LessOrEqual, value)
        case "REGEX" => (MlCompiler.Regex(value), value)
        case other => throw new IllegalArgumentException(s"Unknown comparison: $other")
      }
    }
    val features = byRole("FEATURE").map { v =>
      val (cmp, value) = cmpOf(v)
      GaFeature(vstr(v, "name"), vstr(v, "key"), cmp, value,
        v \ "value_is_string" match { case JBool(b) => b; case _ => false },
        vstr(v, "description"))
    }
    val source = InputSource.fromWire(str("source", "GOOGLE_ANALYTICS"))
    // a FIRST_PARTY-only model has no GA label; GA-including models must
    val label = byRole("LABEL").headOption match {
      case Some(labelJ) => GaLabel(vstr(labelJ, "name"), vstr(labelJ, "key"),
        labelJ \ "value_is_string" match { case JBool(b) => b; case _ => false })
      case None if source == FirstParty => GaLabel("", "")
      case None => throw new IllegalArgumentException(
        "MlModel requires a GOOGLE_ANALYTICS LABEL variable")
    }
    val fpRoles = fpByRole("USER_ID").headOption.map { uid =>
      MlCompiler.FpRoles(
        uniqueId = uid,
        features = fpByRole("FEATURE"),
        label = fpByRole("LABEL").headOption,
        firstValue = fpByRole("FIRST_VALUE").headOption,
        triggerDate = fpByRole("TRIGGER_DATE").headOption)
    }
    val trigger = byRole("TRIGGER_EVENT").headOption
      .map(v => GaTrigger(vstr(v, "name"), vstr(v, "key")))
    val modelType = str("type")
    val dataset = MlModel(
      isClassification = ClassificationTypes.contains(modelType.toUpperCase),
      uniqueId = if (str("unique_id") == "USER_ID") "user_id" else "user_pseudo_id",
      features = features,
      label = label,
      suffixLo = str("suffix_lo"),
      suffixHi = str("suffix_hi"),
      triggerEvent = trigger,
      classImbalance = num("class_imbalance", 4).toInt,
      conversionRateSegments = num("conversion_rate_segments", 10).toInt,
      averageConversionValue = num("average_conversion_value", 1.0),
      hashSplit = bool("hash_split", default = true),
      engagementEvent = str("engagement_event", "user_engagement"),
      splitHash = if (str("split_hash") == "MD5") MlCompiler.Md5Split else MlCompiler.FarmSplit)
    val hps = root \ "hyper_parameters" match {
      case JArray(a) => a.map(h => (vstr(h, "name"), vstr(h, "value")))
      case _ => Nil
    }
    MlModelSpec(
      name = str("name"),
      modelType = modelType,
      dataset = dataset,
      projectId = str("project_id"),
      bqDatasetId = str("bq_dataset_id"),
      bqDatasetLocation = str("bq_dataset_location"),
      destination = Destination.fromWire(str("destination")),
      ga4MeasurementId = str("ga4_measurement_id"),
      ga4ApiSecret = str("ga4_api_secret"),
      adsCustomerId = str("ads_customer_id"),
      adsConversionActionId = str("ads_conversion_action_id"),
      hyperParameters = hps,
      clickEvent = str("click_event", "page_view"),
      source = source,
      fpTable = str("first_party_table"),
      fpRoles = fpRoles,
      fpGclid = fpByRole("GCLID").headOption.getOrElse(""),
      sourceDir = str("source_dir"),
      workDir = str("work_dir"))
  }
}
