package graft.core

import java.time.LocalDateTime

/**
 * Restricted cron matcher with the reference's exact grammar
 * (`/root/reference/backend/controller/cron_utils.py:27-72`): five
 * space-separated fields (minute hour dom month dow); each field is `*` or a
 * comma list of integers; ranges (`-`) and steps (`/`) are rejected.
 * Day-of-week: Monday=1..Saturday=6, Sunday=0 (isoweekday 7 → 0).
 */
object Cron {

  final class CronError(msg: String) extends RuntimeException(msg)

  /** `_to_int` equality — via BigInt, because python's `int()` is
    * arbitrary-precision: "99999999999 * * * *" is a schedule that parses
    * and simply never fires; `.toInt` would escape the CronError contract
    * with a NumberFormatException the scheduler's guard then swallows. */
  private def digitsEqual(v: String, target: Int): Boolean = {
    val t = v.trim
    if (t.nonEmpty && t.forall(_.isDigit)) BigInt(t) == target
    else throw new CronError("Failed to parse string to integer")
  }

  /** `_parse_arg`: true if the target matches this cron field. */
  private[core] def parseArg(value: String, target: Int): Boolean = {
    val v = value.trim
    if (v == "*") return true
    if (v.contains("-")) throw new CronError("Unsupported syntax used in cron: \"-\"")
    if (v.contains("/")) throw new CronError("Unsupported syntax used in cron: \"/\"")
    // empty comma entries are dropped, as the reference's filter(None, ...)
    v.split(",").map(_.trim).filter(_.nonEmpty).exists(digitsEqual(_, target))
  }

  /** True if `dt` falls into the cron schedule. */
  def matches(cron: String, dt: LocalDateTime): Boolean = {
    cron.trim.split(" ") match {
      case Array(minute, hour, dom, month, dow) =>
        val isoDow = dt.getDayOfWeek.getValue // Mon=1..Sun=7
        val weekday = if (isoDow == 7) 0 else isoDow
        parseArg(minute, dt.getMinute) &&
          parseArg(hour, dt.getHour) &&
          parseArg(dom, dt.getDayOfMonth) &&
          parseArg(month, dt.getMonthValue) &&
          parseArg(dow, weekday)
      case _ => throw new CronError(s"cron must have 5 fields: '$cron'")
    }
  }

  /** Validity under the restricted grammar (the reference additionally
    * accepts anything croniter accepts at *save* time but its matcher
    * rejects ranges/steps at run time; we validate what we can match). */
  def isValid(cron: String): Boolean =
    try {
      cron.trim.split(" ") match {
        case fields @ Array(_, _, _, _, _) =>
          fields.forall { f =>
            val t = f.trim
            t == "*" || t.split(",").map(_.trim).filter(_.nonEmpty)
              .forall(x => x.forall(_.isDigit) && x.nonEmpty)
          }
        case _ => false
      }
    } catch { case _: Exception => false }
}
