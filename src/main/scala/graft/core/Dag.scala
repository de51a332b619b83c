package graft.core

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/**
 * In-process pipeline DAG runtime with the reference's exact status-machine
 * semantics (`/root/reference/backend/controller/models.py`):
 *
 *  - statuses: pipeline {idle,running,stopping,failed,succeeded}, job adds
 *    {waiting} (`shared.py:20-34`);
 *  - start gate: pipeline inactive + params render (strict) + ≥1 job + all
 *    jobs inactive; render failure fails the pipeline AND all jobs before
 *    any task runs (`models.py:199-250`);
 *  - start conditions success/fail/whatever, evaluated when the upstream
 *    reaches an inactive status; a condition invalidated once the upstream
 *    *finished* fails the whole pipeline (`models.py:872-911`);
 *  - dynamic task fan-out: a worker may enqueue sub-tasks under its job; the
 *    job completes when the in-flight count hits zero and the LAST task's
 *    status wins (`models.py:996-1035`);
 *  - stop: waiting→idle, running→stopping; a stopping job still records its
 *    final task status but does not start dependents (`models.py:1043-1052`).
 *
 * The reference's three-service Pub/Sub loop collapses into one scheduler
 * with an executor pool; "task" = one worker execution (typically one or
 * more Spark actions).
 */
object Dag {

  sealed abstract class JobStatus(val wire: String)
  object JobStatus {
    case object Idle extends JobStatus("idle")
    case object Waiting extends JobStatus("waiting")
    case object Running extends JobStatus("running")
    case object Stopping extends JobStatus("stopping")
    case object Failed extends JobStatus("failed")
    case object Succeeded extends JobStatus("succeeded")
    val inactive: Set[JobStatus] = Set(Idle, Failed, Succeeded)
  }

  sealed abstract class PipelineStatus(val wire: String)
  object PipelineStatus {
    case object Idle extends PipelineStatus("idle")
    case object Running extends PipelineStatus("running")
    case object Stopping extends PipelineStatus("stopping")
    case object Failed extends PipelineStatus("failed")
    case object Succeeded extends PipelineStatus("succeeded")
    val inactive: Set[PipelineStatus] = Set(Idle, Failed, Succeeded)
  }

  /** What a worker sees + how it fans out sub-tasks (worker.py:34-128). */
  trait WorkerContext {
    def params: Map[String, Spec.WorkerValue]
    def generalSettings: Map[String, String]
    /** Dynamic fan-out: enqueue a sub-task under the same job. */
    def enqueue(workerClass: String, params: Map[String, Spec.WorkerValue], delaySeconds: Int = 0): Unit
    def log(message: String): Unit = ()
  }

  /** A worker executes one task; throwing fails the task. */
  trait Worker {
    def execute(ctx: WorkerContext): Unit
    /** Re-enqueue budget on failure (worker.py:26,48: default 1 attempt). */
    def maxAttempts: Int = 1
  }

  /** Case-insensitive worker registry (finder.py:104-119); `names` keeps
    * the registered spelling, like the reference's /api/workers listing. */
  final class Registry {
    private val builders = new ConcurrentHashMap[String, Map[String, Spec.WorkerValue] => Worker]()
    private val display = new ConcurrentHashMap[String, String]()
    def register(name: String)(b: Map[String, Spec.WorkerValue] => Worker): Unit = {
      builders.put(name.toLowerCase, b)
      display.put(name.toLowerCase, name)
    }
    def lookup(name: String): Option[Map[String, Spec.WorkerValue] => Worker] =
      Option(builders.get(name.toLowerCase))
    def names: Seq[String] = display.values.asScala.toSeq.sorted
  }

  final class PipelineRun(
      val spec: Spec.PipelineSpec,
      registry: Registry,
      executor: ScheduledExecutorService,
      globalParams: Seq[Spec.ParamSpec] = Nil,
      generalSettings: Map[String, String] = Map.empty,
      session: () => Templates.Session = () => new Templates.Session()) {

    private val lock = new Object
    @volatile private var _status: PipelineStatus = PipelineStatus.Idle
    val jobs: Map[String, JobRun] = spec.jobs.map(j => j.id -> new JobRun(j, this)).toMap
    private[core] var renderedJobParams: Map[String, Map[String, String]] = Map.empty
    private val failures = mutable.ArrayBuffer.empty[String]

    private[core] def registryRef: Registry = registry
    private[core] def executorRef: ScheduledExecutorService = executor
    private[core] def settingsRef: Map[String, String] = generalSettings
    private[core] def lockRef: Object = lock

    def status: PipelineStatus = _status
    def failureMessages: Seq[String] = lock.synchronized(failures.toSeq)
    private[core] def recordFailure(msg: String): Unit = lock.synchronized { failures += msg }

    private[core] def setStatus(s: PipelineStatus): Unit = lock.synchronized {
      _status = s
      lock.notifyAll()
    }

    def dependentJobs(id: String): Seq[JobRun] =
      spec.jobs.filter(_.startConditions.exists(_.precedingJobId == id)).map(j => jobs(j.id))

    /** models.py:199-221 + 232-250. */
    def start(): Boolean = lock.synchronized {
      if (!PipelineStatus.inactive.contains(_status)) return false
      // params render — strict; failure marks pipeline + all jobs failed
      val rendered =
        try {
          val sess = session()
          Some(Templates.renderScopes(globalParams, spec, sess))
        } catch {
          case e: Templates.TemplateError =>
            recordFailure(s"Invalid parameter: ${e.getMessage}")
            None
        }
      if (rendered.isEmpty || spec.jobs.isEmpty || !jobs.values.forall(_.getReady)) {
        if (rendered.isEmpty || !jobs.values.forall(_.getReady)) {
          // deliberately force-fails EVERY job (even one mid-flight): the
          // reference does exactly this on FAILED_RENDERING_PARAMETERS /
          // JOBS_NOT_READY — "invites the user to look at logs by setting
          // all jobs as failed" (models.py:239-250)
          setStatus(PipelineStatus.Failed)
          jobs.values.foreach(_.setStatus(JobStatus.Failed))
        }
        return false
      }
      renderedJobParams = rendered.get._3
      setStatus(PipelineStatus.Running)
      jobs.values.foreach(_.setStatus(JobStatus.Waiting))
      spec.jobs.foreach(j => jobs(j.id).start())
      true
    }

    /** models.py:252-262. */
    def stop(): Boolean = lock.synchronized {
      if (_status != PipelineStatus.Running) return false
      setStatus(PipelineStatus.Stopping)
      jobs.values.foreach(_.stop())
      // If no job was actively running, conclude immediately.
      leafJobFinished()
      true
    }

    private[core] def hasFinished: Boolean =
      jobs.values.forall(j => JobStatus.inactive.contains(j.status))

    private[core] def hasStopped: Boolean =
      jobs.values.exists(_.status == JobStatus.Idle)

    /** models.py:295-311. */
    private[core] def hasFailed: Boolean = {
      jobs.values.exists { j =>
        (dependentJobs(j.spec.id).isEmpty && j.status == JobStatus.Failed) ||
          j.spec.startConditions.exists(sc => j.startConditionInvalidated(sc))
      }
    }

    /** models.py:314-330. */
    private[core] def leafJobFinished(): Unit = lock.synchronized {
      if (hasFailed) {
        if (_status == PipelineStatus.Running) {
          setStatus(PipelineStatus.Stopping)
          jobs.values.foreach(_.stop())
        }
        setStatus(PipelineStatus.Failed)
      } else if (hasStopped && hasFinished) {
        setStatus(PipelineStatus.Idle)
      } else if (hasFinished) {
        setStatus(PipelineStatus.Succeeded)
      }
    }

    /** Blocks until the pipeline reaches an inactive status. */
    def awaitCompletion(timeoutMs: Long = 60000): PipelineStatus = {
      val deadline = System.currentTimeMillis() + timeoutMs
      lock.synchronized {
        while (!PipelineStatus.inactive.contains(_status) &&
               System.currentTimeMillis() < deadline) {
          lock.wait(math.max(1, deadline - System.currentTimeMillis()))
        }
        _status
      }
    }
  }

  final class JobRun(val spec: Spec.JobSpec, pipeline: PipelineRun) {
    @volatile private var _status: JobStatus = JobStatus.Idle
    private val inflight = new ConcurrentHashMap[String, Boolean]()

    def status: JobStatus = _status
    private[core] def setStatus(s: JobStatus): Unit = pipeline.lockRef.synchronized {
      _status = s
      pipeline.lockRef.notifyAll()
    }

    def getReady: Boolean = JobStatus.inactive.contains(_status)

    /** models.py:880-888. */
    private def conditionFulfilled(sc: Spec.StartConditionSpec): Boolean = {
      val preceding = pipeline.jobs(sc.precedingJobId).status
      sc.condition match {
        case Spec.Condition.Success => preceding == JobStatus.Succeeded
        case Spec.Condition.Fail => preceding != JobStatus.Succeeded
        case Spec.Condition.Whatever => true
      }
    }

    /** models.py:872-878: only invalidated once the upstream FINISHED. */
    private[core] def startConditionInvalidated(sc: Spec.StartConditionSpec): Boolean = {
      val preceding = pipeline.jobs(sc.precedingJobId).status
      if (preceding != JobStatus.Failed && preceding != JobStatus.Succeeded) false
      else !conditionFulfilled(sc)
    }

    /** models.py:898-911. */
    private[core] def start(): Unit = pipeline.lockRef.synchronized {
      if (_status != JobStatus.Waiting) return
      spec.startConditions.foreach { sc =>
        val precedingStatus = pipeline.jobs(sc.precedingJobId).status
        if (!JobStatus.inactive.contains(precedingStatus)) return // upstream still running
        if (!conditionFulfilled(sc)) {
          pipeline.leafJobFinished()
          return
        }
      }
      startAsSingle()
    }

    /** models.py:913-921. */
    private[core] def startAsSingle(): Unit = {
      require(_status == JobStatus.Waiting, "start_as_single outside pipeline start")
      setStatus(JobStatus.Running)
      val rendered = pipeline.renderedJobParams.getOrElse(spec.id, Map.empty)
      val workerParams: Map[String, Spec.WorkerValue] = spec.params.map { p =>
        p.name -> Templates.workerValue(p.ptype, rendered.getOrElse(p.name, p.value))
      }.toMap
      enqueue(spec.workerClass, workerParams, 0)
    }

    /** models.py:940-962 — task bookkeeping + executor submission. */
    private[core] def enqueue(workerClass: String,
                              params: Map[String, Spec.WorkerValue],
                              delaySeconds: Int): Unit = {
      if (_status != JobStatus.Running) return // bq_worker enqueue gate (models.py:946)
      val name = UUID.randomUUID().toString
      inflight.put(name, true)
      val run: Runnable = () => runTask(name, workerClass, params)
      if (delaySeconds <= 0) pipeline.executorRef.execute(run)
      else pipeline.executorRef.schedule(run, delaySeconds.toLong, TimeUnit.SECONDS)
    }

    private def runTask(name: String, workerClass: String,
                        taskParams: Map[String, Spec.WorkerValue]): Unit = {
      val job = this
      val builder = pipeline.registryRef.lookup(workerClass)
      val ctx = new WorkerContext {
        def params: Map[String, Spec.WorkerValue] = taskParams
        def generalSettings: Map[String, String] = pipeline.settingsRef
        def enqueue(wc: String, p: Map[String, Spec.WorkerValue], delay: Int): Unit =
          job.enqueue(wc, p, delay)
      }
      builder match {
        case None =>
          pipeline.recordFailure(s"Unknown worker class: $workerClass")
          taskFinished(name, JobStatus.Failed)
        case Some(b) =>
          val worker = b(taskParams)
          var attempt = 0
          var done = false
          var lastError: Throwable = null
          while (!done && attempt < math.max(1, worker.maxAttempts)) {
            attempt += 1
            try { worker.execute(ctx); done = true }
            catch { case e: Throwable => lastError = e }
          }
          if (done) taskFinished(name, JobStatus.Succeeded)
          else {
            pipeline.recordFailure(
              s"Job '${spec.name}' ($workerClass) failed: ${Option(lastError).map(_.getMessage).getOrElse("?")}")
            taskFinished(name, JobStatus.Failed)
          }
      }
    }

    /** models.py:964-1035 — last-task lock + dependent start. */
    private def taskFinished(name: String, newStatus: JobStatus): Unit =
      pipeline.lockRef.synchronized {
        inflight.remove(name)
        if (!inflight.isEmpty) return
        val stoppingSignal = _status == JobStatus.Stopping
        setStatus(newStatus)
        if (pipeline.status == PipelineStatus.Failed) return
        val dependents = pipeline.dependentJobs(spec.id)
        val waitingSignal = dependents.forall(_.status == JobStatus.Waiting)
        if (dependents.nonEmpty && !stoppingSignal && waitingSignal) {
          dependents.foreach(_.start())
        } else {
          pipeline.leafJobFinished()
        }
      }

    /** models.py:1043-1052. */
    private[core] def stop(): Boolean = pipeline.lockRef.synchronized {
      _status match {
        case JobStatus.Waiting => setStatus(JobStatus.Idle); false
        case JobStatus.Running => setStatus(JobStatus.Stopping); true
        case _ => false
      }
    }
  }

  /** Driver-side cron ticker over the restricted grammar (§3.2). */
  final class Scheduler {
    def startDue(pipelines: Seq[PipelineRun], now: java.time.LocalDateTime): Seq[String] =
      pipelines.flatMap { p =>
        // one pipeline's unsupported cron (the reference accepts anything
        // croniter accepts at SAVE time) must not abort the whole tick —
        // guard per-pipeline so every valid schedule still fires
        val due = p.spec.runOnSchedule &&
          p.spec.schedules.exists(s =>
            scala.util.Try(Cron.matches(s.cron, now)).getOrElse(false)) &&
          PipelineStatus.inactive.contains(p.status)
        // start() can refuse (another trigger won the race, a job is not
        // ready) — report only runs that actually started
        if (due && p.start()) Some(p.spec.name) else None
      }
  }

  def newExecutor(threads: Int = 8): ScheduledExecutorService =
    Executors.newScheduledThreadPool(threads)
}
