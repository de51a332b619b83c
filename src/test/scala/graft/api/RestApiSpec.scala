package graft.api

import graft.core.Dag
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.Executors

/** REST facade parity: import → list → start → status round-trip over
  * real HTTP (mirrors pipeline_views_tests.py shapes). */
class RestApiSpec extends AnyFunSuite {

  private val pipelineJson =
    """{"name": "api_pipe",
      |  "jobs": [
      |    {"id": "j1", "name": "first", "worker_class": "Commenter",
      |     "params": [{"name": "comment", "type": "text", "value": "hi"}],
      |     "hash_start_conditions": []},
      |    {"id": "j2", "name": "second", "worker_class": "Commenter",
      |     "params": [], "hash_start_conditions": [
      |       {"preceding_job_id": "j1", "condition": "success"}]}
      |  ],
      |  "params": [], "schedules": []}""".stripMargin

  test("workers list, pipeline import/start/status/export over HTTP") {
    val registry = new Dag.Registry
    registry.register("Commenter")(p => new graft.workers.Workers.Commenter(p))
    val executor = Executors.newScheduledThreadPool(2)
    val api = new RestApi(registry, executor)
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    def post(path: String, body: String = ""): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // GET /api/workers (jobs_app.py:50-57)
      val workers = get("/api/workers")
      assert(workers.statusCode() == 200 && workers.body().contains("Commenter"))

      // import
      val created = post("/api/pipelines", pipelineJson)
      assert(created.statusCode() == 201)
      val id = (JsonMethods.parse(created.body()) \ "id") match {
        case JLong(n) => n
        case JInt(n) => n.toLong
        case other => fail(s"unexpected id: $other")
      }

      // list + detail
      assert(get("/api/pipelines").body().contains("api_pipe"))
      val detail = JsonMethods.parse(get(s"/api/pipelines/$id").body())
      assert((detail \ "status") == JString("idle"))
      assert((detail \ "jobs").asInstanceOf[JArray].arr.length == 2)

      // start → run completes through the 2-job DAG
      val started = post(s"/api/pipelines/$id/start")
      assert(started.statusCode() == 202)
      val p = api.get(id.toLong).get
      assert(p.awaitCompletion(30000) == Dag.PipelineStatus.Succeeded)
      val after = JsonMethods.parse(get(s"/api/pipelines/$id").body())
      assert((after \ "status") == JString("succeeded"))
      // double-start of a finished pipeline restarts (idle/succeeded are inactive)
      assert(post(s"/api/pipelines/$id/start").statusCode() == 202)
      p.awaitCompletion(30000)

      // export round-trips through the spec codec
      val export = get(s"/api/pipelines/$id/export")
      assert(export.statusCode() == 200)
      assert(graft.core.Spec.fromJson(export.body()).jobs.map(_.id) == Seq("j1", "j2"))

      // 404s
      assert(get("/api/pipelines/999").statusCode() == 404)
      assert(post("/api/pipelines/999/start").statusCode() == 404)

      // ---- jobs blueprint (job/views.py:69-160) ----
      val jobs = JsonMethods.parse(get(s"/api/jobs?pipeline_id=$id").body())
        .asInstanceOf[JArray].arr
      assert(jobs.length == 2)
      assert((jobs.head \ "worker_class") == JString("Commenter"))
      assert((jobs.head \ "status") == JString("succeeded"))
      val one = JsonMethods.parse(get(s"/api/jobs/$id/j1").body())
      assert((one \ "name") == JString("first"))
      assert((one \ "params").asInstanceOf[JArray].arr.nonEmpty)
      // update: rename + param change on the inactive pipeline
      val put = http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/api/jobs/$id/j1"))
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"name": "renamed", "params": [
            |{"name": "comment", "type": "text", "value": "updated"}]}""".stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(put.statusCode() == 200)
      val renamed = JsonMethods.parse(get(s"/api/jobs/$id/j1").body())
      assert((renamed \ "name") == JString("renamed"))
      // native JSON numbers/booleans coerce like the import codec
      // (Spec.paramValueString), not to empty string
      val putNum = http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/api/jobs/$id/j1"))
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"params": [{"name": "n", "type": "number", "value": 5},
            |{"name": "b", "type": "boolean", "value": true}]}""".stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(putNum.statusCode() == 200)
      val numd = (JsonMethods.parse(get(s"/api/jobs/$id/j1").body()) \ "params")
        .asInstanceOf[JArray].arr
      assert(numd.map(v => v \ "value") == List(JString("5"), JString("1")))
      // start conditions sent in the body are applied, not silently dropped
      val putCond = http.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/api/jobs/$id/j2"))
        .PUT(HttpRequest.BodyPublishers.ofString(
          """{"hash_start_conditions": [
            |{"preceding_job_id": "j1", "condition": "whatever"}]}""".stripMargin))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(putCond.statusCode() == 200)
      val j2 = JsonMethods.parse(get(s"/api/jobs/$id/j2").body())
      assert((j2 \ "hash_start_conditions")(0) \ "condition" == JString("whatever"))
      assert(get(s"/api/jobs/$id/nope").statusCode() == 404)
    } finally {
      api.shutdown()
      executor.shutdownNow()
    }
  }

  test("ml-models blueprint: CRUD compiles and recompiles the two pipelines (ml_model/views.py:145-244)") {
    val registry = new Dag.Registry
    registry.register("Commenter")(p => new graft.workers.Workers.Commenter(p))
    val executor = Executors.newScheduledThreadPool(2)
    val api = new RestApi(registry, executor)
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    def send(method: String, path: String, body: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .method(method, HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    val modelJson = graft.plans.MlModelPipelines.toJson(
      graft.plans.MlModelPipelines.MlModelSpec(
        name = "Api Model", modelType = "LOGISTIC_REG",
        dataset = graft.plans.MlCompiler.MlModel(
          isClassification = true, uniqueId = "user_pseudo_id",
          features = Seq(graft.plans.MlCompiler.GaFeature("click")),
          label = graft.plans.MlCompiler.GaLabel("purchase", "k"),
          suffixLo = "20240105", suffixHi = "20240125"),
        projectId = "p", bqDatasetId = "ds", bqDatasetLocation = "US",
        destination = graft.plans.MlModelPipelines.GoogleAnalyticsMpEvent,
        sourceDir = "/root/testdata/sf0.001", workDir = "/tmp/graft_api_model"))
    try {
      // create → model + its two compiled pipelines appear
      val created = send("POST", "/api/ml-models", modelJson)
      assert(created.statusCode() == 201, created.body())
      val mid = (JsonMethods.parse(created.body()) \ "id") match {
        case JLong(n) => n; case JInt(n) => n.toLong; case other => fail(s"id: $other")
      }
      val pipes = (JsonMethods.parse(created.body()) \ "pipelines").asInstanceOf[JArray].arr
      assert(pipes.map(p => p \ "name") ==
        List(JString("Api Model - Training"), JString("Api Model - Predictive")))

      assert(get("/api/ml-models").body().contains("Api Model"))
      val detail = JsonMethods.parse(get(s"/api/ml-models/$mid").body())
      assert((detail \ "type") == JString("LOGISTIC_REG"))

      // the compiled pipelines are real pipeline resources
      val plist = JsonMethods.parse(get("/api/pipelines").body()).asInstanceOf[JArray].arr
      assert(plist.exists(p => (p \ "name") == JString("Api Model - Predictive")))

      // PUT with a body that fails compile-time validation: 400, and the
      // existing pipelines must survive untouched (build-then-swap)
      val badPut = send("PUT", s"/api/ml-models/$mid",
        modelJson.replace(""""work_dir":"/tmp/graft_api_model"""", """"work_dir":""""))
      assert(badPut.statusCode() == 400, badPut.body())
      val plistAfterBad = JsonMethods.parse(get("/api/pipelines").body()).asInstanceOf[JArray].arr
      assert(plistAfterBad.exists(p => (p \ "name") == JString("Api Model - Predictive")),
        "a rejected update must not destroy the model's existing pipelines")

      // PUT: update recompiles (old pipelines replaced, name changes through)
      val updated = send("PUT", s"/api/ml-models/$mid",
        modelJson.replace("Api Model", "Api Model v2"))
      assert(updated.statusCode() == 200)
      val plist2 = JsonMethods.parse(get("/api/pipelines").body()).asInstanceOf[JArray].arr
      assert(plist2.exists(p => (p \ "name") == JString("Api Model v2 - Predictive")))
      assert(!plist2.exists(p => (p \ "name") == JString("Api Model - Predictive")),
        "stale compiled pipelines must be replaced")

      // DELETE removes the model and its pipelines
      assert(send("DELETE", s"/api/ml-models/$mid", "").statusCode() == 204)
      assert(get(s"/api/ml-models/$mid").statusCode() == 404)
      val plist3 = JsonMethods.parse(get("/api/pipelines").body()).asInstanceOf[JArray].arr
      assert(!plist3.exists(p => (p \ "name") == JString("Api Model v2 - Predictive")))

      assert(get("/api/ml-models/999").statusCode() == 404)
      assert(send("PUT", "/api/ml-models/999", modelJson).statusCode() == 404)
    } finally {
      api.shutdown()
      executor.shutdownNow()
    }
  }

  test("variables endpoint: FP schema introspection drops nested columns; GA discovery grouped (ml_model/views.py:246-291)") {
    val spark = graft.SparkFixture.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a first-party table with droppable columns: a struct (RECORD) and
    // an array — plus the usable scalar spread
    val fpDir = java.nio.file.Files.createTempDirectory("graft_fp").toString + "/crm.parquet"
    Seq((1L, "a@x.com", 12.5, true))
      .toDF("customer_id", "email", "ltv", "active")
      .withColumn("first_seen", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("address", struct(lit("street").as("s"), lit("city").as("c")))
      .withColumn("tags", array(lit("a"), lit("b")))
      .write.parquet(fpDir)

    val registry = new Dag.Registry
    val executor = Executors.newScheduledThreadPool(1)
    val api = new RestApi(registry, executor, spark = () => Some(spark))
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val enc = java.net.URLEncoder.encode(fpDir, "UTF-8")
      val fp = JsonMethods.parse(get(s"/api/ml-models/variables?fp_table=$enc").body())
        .asInstanceOf[JArray].arr
      val byName = fp.map(v => (v \ "name") -> (v \ "parameters")(0) \ "value_type").toMap
      assert(!byName.contains(JString("address")) && !byName.contains(JString("tags")),
        "RECORD/JSON-analog columns must be dropped (bigquery.py:158-161)")
      assert(byName(JString("customer_id")) == JString("INTEGER"))
      assert(byName(JString("email")) == JString("STRING"))
      assert(byName(JString("ltv")) == JString("FLOAT"))
      assert(byName(JString("active")) == JString("BOOLEAN"))
      assert(byName(JString("first_seen")) == JString("TIMESTAMP"))
      assert(fp.forall(v => (v \ "source") == JString("FIRST_PARTY")))

      // GA + FP combined: analytics variables grouped by event name with
      // their typed parameter slots, FP columns appended after
      val both = JsonMethods.parse(
        get(s"/api/ml-models/variables?ga_dir=/root/testdata/sf0.001&fp_table=$enc").body())
        .asInstanceOf[JArray].arr
      val gaVars = both.filter(v => (v \ "source") == JString("GOOGLE_ANALYTICS"))
      assert(gaVars.nonEmpty, "sf0.001 must yield analytics variables")
      assert(gaVars.forall { v =>
        (v \ "parameters").asInstanceOf[JArray].arr.nonEmpty &&
          ((v \ "count") match { case JInt(n) => n > 0; case JLong(n) => n > 0; case _ => false })
      })
      assert(both.count(v => (v \ "source") == JString("FIRST_PARTY")) == 5)

      // reference aborts 400 when the GA dataset has no event tables;
      // missing params and a session-less facade are client errors too
      assert(get("/api/ml-models/variables").statusCode() == 400)
      val noSession = new RestApi(registry, executor)
      val p2 = noSession.start()
      try assert(http.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p2/api/ml-models/variables?fp_table=$enc")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() == 400)
      finally noSession.shutdown()
    } finally {
      api.shutdown()
      executor.shutdownNow()
    }
  }
}
