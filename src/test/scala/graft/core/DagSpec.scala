package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import Dag._
import Spec._

/**
 * DAG semantics ported from the reference's integration scenarios
 * (`backend/tests/controller/integration/models_tests.py`, 818 lines):
 * chain/diamond start conditions, fail/whatever edges, invalidated
 * conditions failing the pipeline, render-failure before start, fan-out
 * last-task semantics, stop transitions.
 */
class DagSpec extends AnyFunSuite {

  private def newRegistry(executed: ConcurrentLinkedQueue[String]): Registry = {
    val r = new Registry
    r.register("Commenter") { params =>
      (ctx: WorkerContext) => {
        executed.add(params.get("tag").collect { case WorkerValue.S(s) => s }.getOrElse("?"))
        params.get("fail_at_the_end") match {
          case Some(WorkerValue.B(true)) => throw new RuntimeException("forced failure")
          case _ =>
        }
      }
    }
    r.register("FanOut") { params =>
      (ctx: WorkerContext) => {
        executed.add("parent")
        (1 to 3).foreach { i =>
          ctx.enqueue("Child", Map("tag" -> WorkerValue.S(s"child$i")))
        }
      }
    }
    r.register("Child") { params =>
      (ctx: WorkerContext) => {
        executed.add(params("tag").asInstanceOf[WorkerValue.S].v)
      }
    }
    r
  }

  private def job(id: String, tag: String, fail: Boolean = false,
                  after: Seq[(String, Condition)] = Nil): JobSpec =
    JobSpec(id, id, "Commenter",
      params = Seq(
        ParamSpec("tag", ParamType.PString, tag),
        ParamSpec("fail_at_the_end", ParamType.PBoolean, if (fail) "1" else "0")),
      startConditions = after.map { case (pid, c) => StartConditionSpec(pid, c) })

  private def run(spec: PipelineSpec,
                  executed: ConcurrentLinkedQueue[String] = new ConcurrentLinkedQueue[String]())
      : (PipelineStatus, PipelineRun, Seq[String]) = {
    val exec = Dag.newExecutor(4)
    try {
      val p = new PipelineRun(spec, newRegistry(executed), exec)
      p.start()
      val st = p.awaitCompletion(30000)
      (st, p, executed.asScala.toSeq)
    } finally exec.shutdown()
  }

  test("3-job success chain runs in order and succeeds") {
    val spec = PipelineSpec("chain", Seq(
      job("a", "A"),
      job("b", "B", after = Seq("a" -> Condition.Success)),
      job("c", "C", after = Seq("b" -> Condition.Success))))
    val (st, p, order) = run(spec)
    assert(st == PipelineStatus.Succeeded)
    assert(order == Seq("A", "B", "C"))
    assert(p.jobs.values.forall(_.status == JobStatus.Succeeded))
  }

  test("success condition invalidated by upstream failure fails the pipeline") {
    val spec = PipelineSpec("failchain", Seq(
      job("a", "A", fail = true),
      job("b", "B", after = Seq("a" -> Condition.Success))))
    val (st, p, order) = run(spec)
    assert(st == PipelineStatus.Failed)
    assert(order == Seq("A"))
    assert(p.jobs("a").status == JobStatus.Failed)
    // b never ran: stopped back to idle by the fail propagation
    assert(p.jobs("b").status != JobStatus.Succeeded)
  }

  test("fail condition: downstream runs exactly when upstream fails") {
    val onFail = PipelineSpec("onfail", Seq(
      job("a", "A", fail = true),
      job("b", "B", after = Seq("a" -> Condition.Fail))))
    val (st1, _, order1) = run(onFail)
    assert(st1 == PipelineStatus.Succeeded, "fail-edge satisfied => pipeline succeeds")
    assert(order1 == Seq("A", "B"))

    val onSuccess = PipelineSpec("onfail2", Seq(
      job("a", "A"),
      job("b", "B", after = Seq("a" -> Condition.Fail))))
    val (st2, _, order2) = run(onSuccess)
    assert(st2 == PipelineStatus.Failed, "fail-edge invalidated by success => pipeline fails")
    assert(order2 == Seq("A"))
  }

  test("whatever condition runs downstream on success and on failure") {
    // Reference semantics (models.py:295-311): only LEAF failures fail the
    // pipeline. A failed upstream with a satisfied whatever-edge and a
    // succeeding leaf ⇒ pipeline SUCCEEDED.
    for (fail <- Seq(false, true)) {
      val spec = PipelineSpec("whatever", Seq(
        job("a", "A", fail = fail),
        job("b", "B", after = Seq("a" -> Condition.Whatever))))
      val (st, _, order) = run(spec)
      assert(order == Seq("A", "B"))
      assert(st == PipelineStatus.Succeeded)
    }
  }

  test("diamond: join waits for both parents") {
    val spec = PipelineSpec("diamond", Seq(
      job("a", "A"),
      job("b", "B", after = Seq("a" -> Condition.Success)),
      job("c", "C", after = Seq("a" -> Condition.Success)),
      job("d", "D", after = Seq("b" -> Condition.Success, "c" -> Condition.Success))))
    val (st, _, order) = run(spec)
    assert(st == PipelineStatus.Succeeded)
    assert(order.head == "A" && order.last == "D")
    assert(order.toSet == Set("A", "B", "C", "D"))
  }

  test("invalid template fails pipeline before any job runs (models.py:207-211)") {
    val executed = new ConcurrentLinkedQueue[String]()
    val spec = PipelineSpec("badtpl",
      jobs = Seq(job("a", "A")),
      params = Seq(ParamSpec("bad", ParamType.PString, "{{ undefined_var }}")))
    val (st, p, order) = run(spec, executed)
    assert(st == PipelineStatus.Failed)
    assert(order.isEmpty, "no job may run after a render failure")
    assert(p.jobs("a").status == JobStatus.Failed)
    assert(p.failureMessages.exists(_.contains("undefined")))
  }

  test("empty pipeline does not start and stays idle") {
    val exec = Dag.newExecutor(2)
    try {
      val p = new PipelineRun(PipelineSpec("empty"), new Registry, exec)
      assert(!p.start())
      assert(p.status == PipelineStatus.Idle)
    } finally exec.shutdown()
  }

  test("fan-out: job succeeds only after all subtasks finish (last-task lock)") {
    val executed = new ConcurrentLinkedQueue[String]()
    val spec = PipelineSpec("fanout", Seq(
      JobSpec("f", "f", "FanOut"),
      job("after", "AFTER", after = Seq("f" -> Condition.Success))))
    val (st, _, order) = run(spec, executed)
    assert(st == PipelineStatus.Succeeded)
    assert(order.head == "parent")
    assert(order.count(_.startsWith("child")) == 3)
    assert(order.last == "AFTER", "dependent starts only after last subtask")
  }

  test("pipeline cannot start while already running") {
    val exec = Dag.newExecutor(2)
    val reg = new Registry
    reg.register("Slow") { _ => (ctx: WorkerContext) => Thread.sleep(300) }
    try {
      val p = new PipelineRun(PipelineSpec("dbl", Seq(JobSpec("s", "s", "Slow"))), reg, exec)
      assert(p.start())
      assert(!p.start(), "second start must be rejected")
      assert(p.awaitCompletion(10000) == PipelineStatus.Succeeded)
    } finally exec.shutdown()
  }

  test("stop: waiting jobs go idle, pipeline ends idle") {
    val exec = Dag.newExecutor(2)
    val reg = new Registry
    val gate = new java.util.concurrent.CountDownLatch(1)
    reg.register("Blocker") { _ => (ctx: WorkerContext) => gate.await() }
    reg.register("Commenter") { _ => (ctx: WorkerContext) => () }
    try {
      val spec = PipelineSpec("stopme", Seq(
        JobSpec("a", "a", "Blocker"),
        JobSpec("b", "b", "Commenter",
          startConditions = Seq(StartConditionSpec("a", Condition.Success)))))
      val p = new PipelineRun(spec, reg, exec)
      p.start()
      Thread.sleep(100) // a running, b waiting
      assert(p.jobs("b").status == JobStatus.Waiting)
      assert(p.stop())
      assert(p.status == PipelineStatus.Stopping)
      assert(p.jobs("b").status == JobStatus.Idle)
      assert(p.jobs("a").status == JobStatus.Stopping)
      gate.countDown()
      val st = p.awaitCompletion(10000)
      assert(st == PipelineStatus.Idle, s"stopped pipeline ends idle, got $st")
    } finally exec.shutdown()
  }

  test("scheduler starts only due + scheduled + inactive pipelines") {
    val exec = Dag.newExecutor(2)
    val executed = new ConcurrentLinkedQueue[String]()
    try {
      val due = new PipelineRun(
        PipelineSpec("due", Seq(job("a", "A")),
          schedules = Seq(ScheduleSpec("30 6 * * *")), runOnSchedule = true),
        newRegistry(executed), exec)
      val notDue = new PipelineRun(
        PipelineSpec("notdue", Seq(job("b", "B")),
          schedules = Seq(ScheduleSpec("0 0 * * *")), runOnSchedule = true),
        newRegistry(executed), exec)
      val unscheduled = new PipelineRun(
        PipelineSpec("uns", Seq(job("c", "C")),
          schedules = Seq(ScheduleSpec("30 6 * * *")), runOnSchedule = false),
        newRegistry(executed), exec)
      // one pipeline with cron syntax our restricted grammar rejects (the
      // reference accepts anything croniter accepts at save time) must not
      // abort the tick for the others
      val badCron = new PipelineRun(
        PipelineSpec("bad", Seq(job("d", "D")),
          schedules = Seq(ScheduleSpec("*/5 * * * *")), runOnSchedule = true),
        newRegistry(executed), exec)
      val now = java.time.LocalDateTime.of(2024, 3, 11, 6, 30, 0)
      val started = new Scheduler().startDue(Seq(badCron, due, notDue, unscheduled), now)
      assert(started == Seq("due"))
      due.awaitCompletion(10000)
      assert(executed.asScala.toSeq == Seq("A"))
    } finally exec.shutdown()
  }

  test("export/import round-trip preserves the spec (views.py format)") {
    val spec = PipelineSpec("roundtrip",
      jobs = Seq(job("a", "A"), job("b", "B", after = Seq("a" -> Condition.Fail))),
      params = Seq(ParamSpec("P", ParamType.PNumber, "42")),
      schedules = Seq(ScheduleSpec("0 6 * * *")),
      runOnSchedule = true)
    val json = Spec.toJson(spec)
    val back = Spec.fromJson(json)
    assert(back == spec.copy(
      jobs = spec.jobs.map(j => j.copy(params = j.params.map(p => p.copy(label = Some(p.name))))),
      params = spec.params.map(p => p.copy(label = Some(p.name)))))
  }
}
