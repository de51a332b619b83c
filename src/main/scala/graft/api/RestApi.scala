package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.{Dag, Spec}
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/**
 * Thin REST facade mirroring the reference's controller API surface
 * (SURVEY §7.1.8; `backend/controller/pipeline/views.py:379-389`,
 * `backend/jobs_app.py:50-57`) on the JDK's built-in HTTP server — no
 * web-framework dependency, parity-testing only:
 *
 *   GET  /api/workers                 → registered worker class names
 *   GET  /api/pipelines               → pipeline summaries
 *   POST /api/pipelines               → import a PipelineSpec JSON
 *   GET  /api/pipelines/{id}          → detail incl. per-job statuses
 *   POST /api/pipelines/{id}/start    → start (202, like the async starter)
 *   POST /api/pipelines/{id}/stop     → stop
 *   GET  /api/pipelines/{id}/export   → the export-format JSON
 *
 * The 3-service Pub/Sub loop of the reference collapses into the
 * in-process [[Dag.PipelineRun]] scheduler; statuses surface with the
 * same vocabulary (idle/running/stopping/failed/succeeded).
 */
final class RestApi(registry: Dag.Registry,
    executor: java.util.concurrent.ScheduledExecutorService) {

  private val pipelines = TrieMap.empty[Long, Dag.PipelineRun]
  private val nextId = new AtomicLong(0)

  def create(spec: Spec.PipelineSpec): Long = {
    val id = nextId.incrementAndGet()
    pipelines.put(id, new Dag.PipelineRun(spec, registry, executor))
    id
  }

  def get(id: Long): Option[Dag.PipelineRun] = pipelines.get(id)

  private def summary(id: Long, p: Dag.PipelineRun): JObject = JObject(
    "id" -> JLong(id),
    "name" -> JString(p.spec.name),
    "status" -> JString(p.status.wire))

  private def detail(id: Long, p: Dag.PipelineRun): JObject = JObject(
    "id" -> JLong(id),
    "name" -> JString(p.spec.name),
    "status" -> JString(p.status.wire),
    "jobs" -> JArray(p.spec.jobs.toList.map { j =>
      JObject(
        "id" -> JString(j.id),
        "name" -> JString(j.name),
        "worker_class" -> JString(j.workerClass),
        "status" -> JString(p.jobs(j.id).status.wire))
    }))

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(status, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private val PipelineIdRe = raw"/api/pipelines/(\d+)".r
  private val PipelineActionRe = raw"/api/pipelines/(\d+)/(start|stop|export)".r

  private def handle(x: HttpExchange): Unit = {
    val path = x.getRequestURI.getPath
    val method = x.getRequestMethod
    try (method, path) match {
      case ("GET", "/api/workers") =>
        respond(x, 200, JsonMethods.compact(JArray(
          registry.names.toList.map(JString(_)))))
      case ("GET", "/api/pipelines") =>
        respond(x, 200, JsonMethods.compact(JArray(
          pipelines.toList.sortBy(_._1).map { case (id, p) => summary(id, p) })))
      case ("POST", "/api/pipelines") =>
        val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val spec = Spec.fromJson(body)
        val id = create(spec)
        respond(x, 201, JsonMethods.compact(summary(id, pipelines(id))))
      case ("POST", PipelineActionRe(id, action)) =>
        pipelines.get(id.toLong) match {
          case None => respond(x, 404, """{"error":"not found"}""")
          case Some(p) => action match {
            case "start" =>
              val ok = p.start()
              respond(x, if (ok) 202 else 409, JsonMethods.compact(summary(id.toLong, p)))
            case "stop" =>
              p.stop()
              respond(x, 200, JsonMethods.compact(summary(id.toLong, p)))
            case _ => respond(x, 405, """{"error":"method"}""")
          }
        }
      case ("GET", PipelineActionRe(id, "export")) =>
        pipelines.get(id.toLong) match {
          case None => respond(x, 404, """{"error":"not found"}""")
          case Some(p) => respond(x, 200, Spec.toJson(p.spec))
        }
      case ("GET", PipelineIdRe(id)) =>
        pipelines.get(id.toLong) match {
          case None => respond(x, 404, """{"error":"not found"}""")
          case Some(p) => respond(x, 200, JsonMethods.compact(detail(id.toLong, p)))
        }
      case _ => respond(x, 404, """{"error":"no route"}""")
    } catch {
      case e: Exception =>
        respond(x, 400, JsonMethods.compact(JObject(
          "error" -> JString(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))))
    }
  }

  private var server: HttpServer = _

  /** Binds on an ephemeral (or given) port; returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/api", (x: HttpExchange) => handle(x))
    server.setExecutor(null) // current-thread dispatch; parity tests only
    server.start()
    server.getAddress.getPort
  }

  def shutdown(): Unit = if (server != null) server.stop(0)
}
