package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Pipeline/Job/Param/StartCondition/Schedule ADTs + JSON codec matching the
 * reference's pipeline export format
 * (`/root/reference/backend/controller/pipeline/views.py:197-245`:
 * `{name, jobs:[{id, name, worker_class, params, hash_start_conditions}],
 * params, schedules:[{cron}]}`).
 */
object Spec {

  sealed abstract class ParamType(val wire: String)
  object ParamType {
    case object PString extends ParamType("string")
    case object Text extends ParamType("text")
    case object Sql extends ParamType("sql")
    case object PBoolean extends ParamType("boolean")
    case object PNumber extends ParamType("number")
    case object StringList extends ParamType("string_list")
    case object NumberList extends ParamType("number_list")
    val all: Seq[ParamType] = Seq(PString, Text, Sql, PBoolean, PNumber, StringList, NumberList)
    def fromWire(s: String): ParamType =
      all.find(_.wire == s).getOrElse(PString)
  }

  /** Rendered param coerced to its worker-facing value
    * (`models.py:1100-1114`). */
  sealed trait WorkerValue
  object WorkerValue {
    case class S(v: String) extends WorkerValue
    case class B(v: Boolean) extends WorkerValue
    case class N(v: Double) extends WorkerValue
    case class I(v: Long) extends WorkerValue
    case class SL(v: Seq[String]) extends WorkerValue
    case class NL(v: Seq[WorkerValue]) extends WorkerValue
  }

  case class ParamSpec(name: String, ptype: ParamType, value: String, label: Option[String] = None) {
    def labelOrName: String = label.getOrElse(name)
  }

  sealed abstract class Condition(val wire: String)
  object Condition {
    case object Success extends Condition("success")
    case object Fail extends Condition("fail")
    case object Whatever extends Condition("whatever")
    def fromWire(s: String): Condition = s.toLowerCase match {
      case "success" => Success
      case "fail" => Fail
      case _ => Whatever
    }
  }

  case class StartConditionSpec(precedingJobId: String, condition: Condition)

  case class JobSpec(
      id: String,
      name: String,
      workerClass: String,
      params: Seq[ParamSpec] = Nil,
      startConditions: Seq[StartConditionSpec] = Nil)

  case class ScheduleSpec(cron: String)

  case class PipelineSpec(
      name: String,
      jobs: Seq[JobSpec] = Nil,
      params: Seq[ParamSpec] = Nil,
      schedules: Seq[ScheduleSpec] = Nil,
      runOnSchedule: Boolean = false)

  // ---- JSON codec (export format) ----

  /** Wire param `value` → string form: the export format (and UI) may
    * carry numbers/booleans natively. Shared with the REST job-update
    * path so both decoders coerce identically. */
  private[graft] def paramValueString(v: JValue): String = v match {
    case JString(s) => s
    case JBool(b) => if (b) "1" else "0"
    case JInt(i) => i.toString
    case JDouble(d) => d.toString
    case _ => ""
  }

  private def paramFromJson(v: JValue): ParamSpec = {
    val JString(name) = v \ "name"
    val ptype = (v \ "type") match { case JString(t) => ParamType.fromWire(t); case _ => ParamType.PString }
    val value = paramValueString(v \ "value")
    val label = (v \ "label") match { case JString(l) => Some(l); case _ => None }
    ParamSpec(name, ptype, value, label)
  }

  def fromJson(json: String): PipelineSpec = {
    val root = JsonMethods.parse(json)
    val JString(name) = root \ "name"
    val params = (root \ "params") match {
      case JArray(arr) => arr.map(paramFromJson)
      case _ => Nil
    }
    val schedules = (root \ "schedules") match {
      case JArray(arr) => arr.map(s => ScheduleSpec((s \ "cron") match { case JString(c) => c; case _ => "" }))
      case _ => Nil
    }
    val runOnSchedule = (root \ "run_on_schedule") match {
      case JBool(b) => b
      case JString(s) => s == "True" || s == "true"
      case _ => false
    }
    val jobs = (root \ "jobs") match {
      case JArray(arr) => arr.map { j =>
        val id = (j \ "id") match {
          case JString(s) => s
          case JInt(i) => i.toString
          case _ => java.util.UUID.randomUUID().toString
        }
        val JString(jname) = j \ "name"
        val JString(wc) = j \ "worker_class"
        val jparams = (j \ "params") match { case JArray(a) => a.map(paramFromJson); case _ => Nil }
        val scs = (j \ "hash_start_conditions") match {
          case JArray(a) => a.map { sc =>
            val pid = (sc \ "preceding_job_id") match {
              case JString(s) => s
              case JInt(i) => i.toString
              case _ => ""
            }
            val cond = (sc \ "condition") match { case JString(c) => Condition.fromWire(c); case _ => Condition.Whatever }
            StartConditionSpec(pid, cond)
          }
          case _ => Nil
        }
        JobSpec(id, jname, wc, jparams, scs)
      }
      case _ => Nil
    }
    PipelineSpec(name, jobs, params, schedules, runOnSchedule)
  }

  def toJson(p: PipelineSpec): String = {
    def paramJ(pp: ParamSpec): JValue = JObject(
      "name" -> JString(pp.name),
      "type" -> JString(pp.ptype.wire),
      "label" -> JString(pp.labelOrName),
      "value" -> JString(pp.value))
    val j = JObject(
      "name" -> JString(p.name),
      "run_on_schedule" -> JBool(p.runOnSchedule),
      "params" -> JArray(p.params.map(paramJ).toList),
      "schedules" -> JArray(p.schedules.map(s => JObject("cron" -> JString(s.cron)): JValue).toList),
      "jobs" -> JArray(p.jobs.map { job =>
        JObject(
          "id" -> JString(job.id),
          "name" -> JString(job.name),
          "worker_class" -> JString(job.workerClass),
          "params" -> JArray(job.params.map(paramJ).toList),
          "hash_start_conditions" -> JArray(job.startConditions.map { sc =>
            JObject(
              "preceding_job_id" -> JString(sc.precedingJobId),
              "condition" -> JString(sc.condition.wire)): JValue
          }.toList)): JValue
      }.toList))
    JsonMethods.compact(JsonMethods.render(j))
  }
}
