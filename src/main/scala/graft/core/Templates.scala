package graft.core

import java.time.format.DateTimeFormatter
import java.time.{Duration, LocalDateTime}
import scala.collection.mutable
import scala.util.matching.Regex

/**
 * Param templating engine with the reference's semantics
 * (`/root/reference/backend/controller/models.py:1055-1114`,
 * `backend/controller/inline.py:33-89`):
 *
 *  - legacy syntax upgrades `{% VAR %}` (uppercase) and `%(var)` → `{{ var }}`;
 *  - strict-undefined rendering: any unknown variable is an error (which the
 *    pipeline runtime turns into fail-before-start);
 *  - inline functions `today`, `days_ago`, `hours_ago`, `days_since`
 *    (python-strftime formats) and `bigquery(table, field)` — first-row peek,
 *    memoized per render session, list values joined with '\n';
 *  - worker-value coercion: boolean ⇔ "1", number via long-then-double,
 *    `*_list` split on '\n'.
 */
object Templates {

  final class TemplateError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** First-row table peek used by the `bigquery` inline function;
    * in the Spark engine this is `spark.table(t).limit(1)` (see
    * graft.workers.SparkTablePeek). */
  type TablePeek = String => Map[String, Any]

  /** One render session: carries the clock, the table peek + its memo cache. */
  final class Session(
      val now: () => LocalDateTime = () => LocalDateTime.now(),
      val tablePeek: TablePeek = t => throw new TemplateError(s"table `$t` not found")) {
    private[Templates] val bqCache = mutable.Map.empty[String, Map[String, Any]]
  }

  private val LegacyUpper: Regex = raw"\{% ([A-Z0-9_]+) %\}".r
  private val LegacyPercent: Regex = raw"%\(([^)]+)\)".r
  private val Interp: Regex = raw"\{\{(.*?)\}\}".r

  /** `models.py:1055-1070` verbatim behavior. */
  def upgradeLegacySyntaxes(template: String): String = {
    val t1 = LegacyUpper.replaceAllIn(template, m => Regex.quoteReplacement(s"{{ ${m.group(1)} }}"))
    LegacyPercent.replaceAllIn(t1, m => Regex.quoteReplacement(s"{{ ${m.group(1)} }}"))
  }

  /** Python-strftime subset → formatted string (passthrough for unknowns,
    * matching CPython's lenient behavior for literal text). */
  def strftime(dt: LocalDateTime, fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append(f"${dt.getYear}%04d")
          case 'y' => sb.append(f"${dt.getYear % 100}%02d")
          case 'm' => sb.append(f"${dt.getMonthValue}%02d")
          case 'd' => sb.append(f"${dt.getDayOfMonth}%02d")
          case 'H' => sb.append(f"${dt.getHour}%02d")
          case 'M' => sb.append(f"${dt.getMinute}%02d")
          case 'S' => sb.append(f"${dt.getSecond}%02d")
          case 'j' => sb.append(f"${dt.getDayOfYear}%03d")
          case 'F' => sb.append(dt.format(DateTimeFormatter.ISO_LOCAL_DATE))
          case 'T' => sb.append(f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d")
          case '%' => sb.append('%')
          case other => sb.append('%').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Python-strptime subset (the inverse of [[strftime]], enough for
    * `days_since`). */
  def strptime(s: String, fmt: String): LocalDateTime = {
    var year = 1900; var month = 1; var day = 1; var hour = 0; var minute = 0; var second = 0
    var i = 0; var j = 0
    def readInt(src: String, at: Int, maxLen: Int): (Int, Int) = {
      var k = at
      while (k < src.length && k - at < maxLen && src.charAt(k).isDigit) k += 1
      if (k == at) throw new TemplateError(s"time data '$s' does not match format '$fmt'")
      (src.substring(at, k).toInt, k)
    }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => val (v, k) = readInt(s, j, 4); year = v; j = k
          // POSIX pivot (Python strptime): 00-68 → 20xx, 69-99 → 19xx
          case 'y' => val (v, k) = readInt(s, j, 2)
            year = if (v >= 69) 1900 + v else 2000 + v; j = k
          case 'm' => val (v, k) = readInt(s, j, 2); month = v; j = k
          case 'd' => val (v, k) = readInt(s, j, 2); day = v; j = k
          case 'H' => val (v, k) = readInt(s, j, 2); hour = v; j = k
          case 'M' => val (v, k) = readInt(s, j, 2); minute = v; j = k
          case 'S' => val (v, k) = readInt(s, j, 2); second = v; j = k
          case '%' =>
            if (j >= s.length || s.charAt(j) != '%')
              throw new TemplateError(s"time data '$s' does not match format '$fmt'")
            j += 1
          case other => throw new TemplateError(s"unsupported strptime directive %$other")
        }
        i += 2
      } else {
        if (j >= s.length || s.charAt(j) != c)
          throw new TemplateError(s"time data '$s' does not match format '$fmt'")
        i += 1; j += 1
      }
    }
    LocalDateTime.of(year, month, day, hour, minute, second)
  }

  // ---- expression evaluation inside {{ ... }} ----

  private sealed trait Value
  private case class VStr(s: String) extends Value
  private case class VNum(d: Double, isInt: Boolean) extends Value

  private def valueToString(v: Value): String = v match {
    case VStr(s) => s
    case VNum(d, true) => d.toLong.toString
    case VNum(d, false) => d.toString
  }

  private def parseArgs(argStr: String): Seq[String] = {
    // split on commas not inside quotes
    val args = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    argStr.foreach { c =>
      if (quote != 0) { cur.append(c); if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { cur.append(c); quote = c }
      else if (c == ',') { args += cur.toString.trim; cur.clear() }
      else cur.append(c)
    }
    if (cur.toString.trim.nonEmpty || args.nonEmpty) args += cur.toString.trim
    args.toSeq.filter(_.nonEmpty)
  }

  private def evalAtom(atom: String, context: Map[String, String], session: Session): Value = {
    val t = atom.trim
    if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
        (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
      VStr(t.substring(1, t.length - 1))
    else if (t.matches(raw"-?\d+")) VNum(t.toDouble, isInt = true)
    else if (t.matches(raw"-?\d*\.\d+")) VNum(t.toDouble, isInt = false)
    else if (t.matches(raw"[A-Za-z_][A-Za-z0-9_]*")) context.get(t) match {
      case Some(v) => VStr(v)
      case None => throw new TemplateError(s"'$t' is undefined")
    }
    else throw new TemplateError(s"cannot evaluate expression: '$t'")
  }

  private val CallRe: Regex = raw"([A-Za-z_][A-Za-z0-9_]*)\((.*)\)".r

  private def evalExpr(expr: String, context: Map[String, String], session: Session): Value =
    expr.trim match {
      case CallRe(fn, argStr) =>
        val args = parseArgs(argStr).map(a => valueToString(evalAtom(a, context, session)))
        fn match {
          case "today" =>
            require1(fn, args, 1); VStr(strftime(session.now(), args(0)))
          case "days_ago" =>
            require1(fn, args, 2)
            VStr(strftime(session.now().minusDays(toLong(args(0))), args(1)))
          case "hours_ago" =>
            require1(fn, args, 2)
            VStr(strftime(session.now().minusHours(toLong(args(0))), args(1)))
          case "days_since" =>
            require1(fn, args, 2)
            val then_ = strptime(args(0), args(1))
            VNum(Duration.between(then_, session.now()).toDays.toDouble, isInt = true)
          case "bigquery" =>
            require1(fn, args, 2)
            val (table, field) = (args(0), args(1))
            val row = session.bqCache.getOrElseUpdate(table, {
              val r = session.tablePeek(table)
              if (r == null) throw new TemplateError(s"BigQuery table `$table` is empty")
              r
            })
            row.get(field) match {
              case None => throw new TemplateError(s"No field '$field' in BigQuery table `$table`")
              case Some(xs: Seq[_]) => VStr(xs.map(_.toString).mkString("\n"))
              case Some(v) => VStr(String.valueOf(v))
            }
          case other => throw new TemplateError(s"'$other' is undefined")
        }
      case atom => evalAtom(atom, context, session)
    }

  private def require1(fn: String, args: Seq[String], n: Int): Unit =
    if (args.length != n) throw new TemplateError(s"$fn() takes $n arguments, got ${args.length}")

  private def toLong(s: String): Long =
    try s.trim.toDouble.toLong
    catch { case e: NumberFormatException => throw new TemplateError(s"invalid number '$s'", e) }

  /** Render a template against a variable context (StrictUndefined). */
  def render(template: String, context: Map[String, String], session: Session): String = {
    val upgraded = upgradeLegacySyntaxes(template)
    Interp.replaceAllIn(upgraded,
      m => Regex.quoteReplacement(valueToString(evalExpr(m.group(1), context, session))))
  }

  /** `Param.worker_value` coercion (`models.py:1100-1114`, `_str_to_number`
    * at `models.py:43-58`: int first, then float). */
  def workerValue(ptype: Spec.ParamType, rendered: String): Spec.WorkerValue = {
    import Spec.{ParamType => PT, WorkerValue => WV}
    def num(s: String): Spec.WorkerValue =
      try WV.I(s.trim.toLong)
      catch {
        case _: NumberFormatException =>
          try WV.N(s.trim.toDouble)
          catch { case e: NumberFormatException => throw new TemplateError(s"invalid number '$s'", e) }
      }
    ptype match {
      case PT.PBoolean => WV.B(rendered == "1")
      case PT.PNumber => num(rendered)
      case PT.StringList => WV.SL(rendered.split("\n", -1).toSeq)
      case PT.NumberList => WV.NL(rendered.split("\n", -1).toSeq.filter(_.trim.nonEmpty).map(num))
      case _ => WV.S(rendered)
    }
  }

  /**
   * Hierarchical render of a pipeline's params (`models.py:159-171`):
   * globals with an empty context, pipeline params seeing globals, job params
   * seeing globals+pipeline. Returns rendered (global, pipeline, perJob) maps.
   * Throws TemplateError on the first failure — the runtime fails the
   * pipeline before any job runs (`models.py:207-211`).
   */
  def renderScopes(
      globalParams: Seq[Spec.ParamSpec],
      pipeline: Spec.PipelineSpec,
      session: Session): (Map[String, String], Map[String, String], Map[String, Map[String, String]]) = {
    val globalCtx = mutable.LinkedHashMap.empty[String, String]
    globalParams.foreach { p =>
      globalCtx += p.name -> render(p.value, Map.empty, session)
    }
    val pipelineCtx = mutable.LinkedHashMap.empty[String, String]
    pipelineCtx ++= globalCtx
    pipeline.params.foreach { p =>
      pipelineCtx += p.name -> render(p.value, globalCtx.toMap, session)
    }
    val perJob = pipeline.jobs.map { job =>
      job.id -> job.params.map { p =>
        p.name -> render(p.value, pipelineCtx.toMap, session)
      }.toMap
    }.toMap
    (globalCtx.toMap, pipelineCtx.toMap, perJob)
  }
}
