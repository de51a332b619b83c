package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime

/** Matcher semantics ported from cron_utils.py:27-72. */
class CronSpec extends AnyFunSuite {

  private val monday = LocalDateTime.of(2024, 3, 11, 6, 0, 0)  // Monday
  private val sunday = LocalDateTime.of(2024, 3, 10, 23, 59, 0) // Sunday

  test("star matches everything") {
    assert(Cron.matches("* * * * *", monday))
  }

  test("exact fields and comma lists") {
    assert(Cron.matches("0 6 11 3 1", monday))
    assert(Cron.matches("0 0,6,12 * 3,4 *", monday))
    assert(!Cron.matches("1 6 11 3 *", monday))
    assert(!Cron.matches("0 7 * * *", monday))
  }

  test("sunday is 0 (isoweekday 7 -> 0)") {
    assert(Cron.matches("59 23 * * 0", sunday))
    assert(!Cron.matches("59 23 * * 7", sunday))
    assert(Cron.matches("0 6 * * 1", monday))
  }

  test("ranges and steps are rejected (cron_utils.py:41-45)") {
    intercept[Cron.CronError] { Cron.matches("0-30 * * * *", monday) }
    intercept[Cron.CronError] { Cron.matches("*/5 * * * *", monday) }
  }

  test("quarterly training cron from the compiler (compiler.py:368-379 shape)") {
    // '0 0 6 4,7,10,1 *' — 6th of Apr/Jul/Oct/Jan at midnight
    val apr6 = LocalDateTime.of(2024, 4, 6, 0, 0, 0)
    val may6 = LocalDateTime.of(2024, 5, 6, 0, 0, 0)
    assert(Cron.matches("0 0 6 4,7,10,1 *", apr6))
    assert(!Cron.matches("0 0 6 4,7,10,1 *", may6))
  }

  test("validity under restricted grammar") {
    assert(Cron.isValid("0 0 6 4,7,10,1 *"))
    assert(!Cron.isValid("0 0 * *"))
    assert(!Cron.isValid("0-5 * * * *"))
  }

  test("overlong numeric fields parse like python int: never match, never throw") {
    // python's int() is arbitrary-precision — a schedule like this is
    // valid and simply never fires; it must not escape as a
    // NumberFormatException the scheduler's guard would swallow forever
    val dt = java.time.LocalDateTime.of(2024, 4, 6, 0, 0)
    assert(Cron.isValid("99999999999 * * * *"))
    assert(!Cron.matches("99999999999 * * * *", dt))
    assert(Cron.matches("0,99999999999 * * * *", dt))
  }
}
