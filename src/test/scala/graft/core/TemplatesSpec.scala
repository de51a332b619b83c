package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime
import Spec._

class TemplatesSpec extends AnyFunSuite {

  private val fixedNow = LocalDateTime.of(2024, 3, 15, 10, 30, 45)
  private def sess(peek: Templates.TablePeek = t => throw new Templates.TemplateError(s"table `$t` not found")) =
    new Templates.Session(now = () => fixedNow, tablePeek = peek)

  test("legacy syntax upgrades (models.py:1055-1070)") {
    assert(Templates.upgradeLegacySyntaxes("{% VAR_NAME %}") == "{{ VAR_NAME }}")
    assert(Templates.upgradeLegacySyntaxes("%(var_name)") == "{{ var_name }}")
    // lowercase {% %} is NOT upgraded (only uppercase+underscore detected)
    assert(Templates.upgradeLegacySyntaxes("{% var %}") == "{% var %}")
    assert(Templates.upgradeLegacySyntaxes("a %(x) b {% A_1 %} c") == "a {{ x }} b {{ A_1 }} c")
  }

  test("variable substitution with strict undefined") {
    assert(Templates.render("day={{ d }}", Map("d" -> "20240101"), sess()) == "day=20240101")
    val e = intercept[Templates.TemplateError] {
      Templates.render("{{ missing }}", Map.empty, sess())
    }
    assert(e.getMessage.contains("undefined"))
  }

  test("inline date functions with python strftime formats (inline.py:33-48)") {
    val s = sess()
    assert(Templates.render("{{ today('%Y%m%d') }}", Map.empty, s) == "20240315")
    assert(Templates.render("{{ days_ago(7, '%Y-%m-%d') }}", Map.empty, s) == "2024-03-08")
    assert(Templates.render("{{ hours_ago(11, '%H') }}", Map.empty, s) == "23")
    assert(Templates.render("{{ days_since('20240301', '%Y%m%d') }}", Map.empty, s) == "14")
    assert(Templates.render("{{ today('%F %T') }}", Map.empty, s) == "2024-03-15 10:30:45")
  }

  test("strptime %y uses the POSIX pivot: 69-99 -> 19xx, 00-68 -> 20xx") {
    assert(Templates.strptime("99", "%y").getYear == 1999)
    assert(Templates.strptime("69", "%y").getYear == 1969)
    assert(Templates.strptime("68", "%y").getYear == 2068)
    assert(Templates.strptime("00", "%y").getYear == 2000)
  }

  test("bigquery() peeks first row, memoizes, joins lists with newline (inline.py:51-80)") {
    var calls = 0
    val peek: Templates.TablePeek = { t =>
      calls += 1
      Map("f" -> "v1", "lst" -> Seq(1, 2, 3))
    }
    val s = sess(peek)
    assert(Templates.render("{{ bigquery('p.d.t', 'f') }}", Map.empty, s) == "v1")
    assert(Templates.render("{{ bigquery('p.d.t', 'lst') }}", Map.empty, s) == "1\n2\n3")
    assert(calls == 1, "table peek must be memoized per session")
    val e = intercept[Templates.TemplateError] {
      Templates.render("{{ bigquery('p.d.t', 'nope') }}", Map.empty, s)
    }
    assert(e.getMessage.contains("No field"))
  }

  test("worker_value coercion (models.py:1100-1114)") {
    import Templates.workerValue
    assert(workerValue(ParamType.PBoolean, "1") == WorkerValue.B(true))
    assert(workerValue(ParamType.PBoolean, "0") == WorkerValue.B(false))
    assert(workerValue(ParamType.PBoolean, "true") == WorkerValue.B(false))
    assert(workerValue(ParamType.PNumber, "42") == WorkerValue.I(42L))
    assert(workerValue(ParamType.PNumber, "4.5") == WorkerValue.N(4.5))
    assert(workerValue(ParamType.StringList, "a\nb\n") == WorkerValue.SL(Seq("a", "b", "")))
    assert(workerValue(ParamType.NumberList, "1\n\n2.5\n") ==
      WorkerValue.NL(Seq(WorkerValue.I(1), WorkerValue.N(2.5))))
    assert(workerValue(ParamType.Sql, "SELECT 1") == WorkerValue.S("SELECT 1"))
  }

  test("scope chaining: global -> pipeline -> job (models.py:159-171)") {
    val globals = Seq(ParamSpec("G", ParamType.PString, "gv"))
    val p = PipelineSpec(
      name = "p",
      jobs = Seq(JobSpec("j1", "j1", "commenter",
        params = Seq(ParamSpec("jp", ParamType.PString, "{{ P }}-{{ G }}")))),
      params = Seq(ParamSpec("P", ParamType.PString, "pv-{{ G }}")))
    val (g, pc, jobs) = Templates.renderScopes(globals, p, sess())
    assert(g("G") == "gv")
    assert(pc("P") == "pv-gv")
    assert(jobs("j1")("jp") == "pv-gv-gv")
  }

  test("pipeline param shadows global of same name") {
    val globals = Seq(ParamSpec("X", ParamType.PString, "global"))
    val p = PipelineSpec(
      name = "p",
      jobs = Seq(JobSpec("j1", "j1", "commenter",
        params = Seq(ParamSpec("out", ParamType.PString, "{{ X }}")))),
      params = Seq(ParamSpec("X", ParamType.PString, "pipeline")))
    val (_, _, jobs) = Templates.renderScopes(globals, p, sess())
    assert(jobs("j1")("out") == "pipeline")
  }
}
