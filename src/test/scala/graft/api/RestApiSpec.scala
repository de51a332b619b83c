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
    } finally {
      api.shutdown()
      executor.shutdownNow()
    }
  }
}
