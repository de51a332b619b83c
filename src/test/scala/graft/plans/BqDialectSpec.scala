package graft.plans

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class BqDialectSpec extends AnyFunSuite with SparkFixture {

  test("statement splitting respects quotes and comments") {
    val script =
      """CREATE TABLE t AS SELECT 'a;b' AS s; -- trailing; comment
        |SELECT 1;
        |/* block; comment */ SELECT 2""".stripMargin
    val stmts = BqDialect.splitStatements(script)
    assert(stmts.length == 3)
    assert(stmts(0).contains("'a;b'"))
    assert(stmts(2).contains("SELECT 2"))
  }

  test("OFFSET indexing and REGEXP_CONTAINS rewrite") {
    assert(BqDialect.rewrite("SELECT arr[OFFSET(1)] FROM t") == "SELECT arr[1] FROM t")
    assert(BqDialect.rewrite("SELECT REGEXP_CONTAINS(x, 'p') FROM t") ==
      "SELECT regexp_like(x, 'p') FROM t")
  }

  test("CAST ... FORMAT and FORMAT_DATE rewrites") {
    assert(BqDialect.rewrite("SELECT CAST(d AS DATE FORMAT 'YYYYMMDD') FROM t") ==
      "SELECT to_date(d, 'yyyyMMdd') FROM t")
    assert(BqDialect.rewrite("SELECT FORMAT_DATE('%F', dcol) FROM t") ==
      "SELECT date_format(dcol, 'yyyy-MM-dd') FROM t")
    assert(BqDialect.rewrite("SELECT FORMAT_TIMESTAMP('%F %T%Ez', ts) FROM t") ==
      "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ssxxx') FROM t")
  }

  test("%Ez prints '+00:00' at zero offset like BigQuery, never 'Z'") {
    val sql = BqDialect.rewrite(
      "SELECT FORMAT_TIMESTAMP('%F %T%Ez', TIMESTAMP_MICROS(1704067200000000)) AS d")
    assert(spark.sql(sql).head().getString(0) == "2024-01-01 00:00:00+00:00")
  }

  test("rewritten SQL actually runs on Spark") {
    import spark.implicits._
    Seq(("20240315", Seq(10, 20, 30))).toDF("d", "arr").createOrReplaceTempView("dialect_t")
    val df = spark.sql(BqDialect.rewrite(
      "SELECT CAST(d AS DATE FORMAT 'YYYYMMDD') AS dt, arr[OFFSET(1)] AS second, " +
        "REGEXP_CONTAINS(d, '^2024') AS y2024 FROM dialect_t"))
    val row = df.collect().head
    assert(row.getDate(0).toString == "2024-03-15")
    assert(row.getInt(1) == 20)
    assert(row.getBoolean(2))
  }

  test("scripting: leading comments don't demote DECLARE/SELECT; comment-only chunks skipped") {
    import spark.implicits._
    Seq(("O", 10), ("F", 20)).toDF("status", "v").createOrReplaceTempView("dialect_sc")
    val script =
      """-- header comment
        |DECLARE want STRING DEFAULT 'O';
        |/* which rows */
        |SELECT v FROM dialect_sc WHERE status = want;
        |-- trailing comment only""".stripMargin
    val out = BqDialect.runScript(spark, script)
    assert(out.isDefined, "comment-prefixed SELECT must be returned as the result")
    assert(out.get.collect().map(_.getInt(0)).toSeq == Seq(10))
  }

  test("scripting: DECLARE without a type binds the evaluated default") {
    val out = BqDialect.runScript(spark,
      """DECLARE n DEFAULT (SELECT 2 + 3);
        |SELECT n AS got""".stripMargin)
    assert(out.get.collect().head.getInt(0) == 5)
  }

  test("scripting: variables are not substituted inside string literals") {
    import spark.implicits._
    Seq("has status word", "other").toDF("c").createOrReplaceTempView("dialect_lit")
    val out = BqDialect.runScript(spark,
      """DECLARE status STRING DEFAULT 'O';
        |SELECT c FROM dialect_lit WHERE c LIKE '%status%'""".stripMargin)
    assert(out.get.collect().map(_.getString(0)).toSeq == Seq("has status word"))
  }

  test("temp function with parameterized and composite types") {
    val r = BqDialect.rewriteTempFunction(
      "CREATE TEMP FUNCTION f(x NUMERIC(10,2), y STRUCT<a INT64, b STRING>) " +
        "RETURNS FLOAT64 AS (x + y.a)")
    assert(r.isDefined, "parameterized args must parse")
    assert(r.get.contains("x DECIMAL(10,2)"))
    assert(r.get.contains("y STRUCT<A BIGINT, B STRING>") ||
      r.get.contains("y STRUCT<a BIGINT, b STRING>"), r.get)
    assert(r.get.contains("RETURNS DOUBLE"))
  }

  test("FORMAT_DATE expression containing a quoted paren survives the rewrite") {
    val s = "SELECT FORMAT_DATE('%F', COALESCE(d, CAST('(' AS DATE))) FROM t"
    assert(BqDialect.rewrite(s) ==
      "SELECT date_format(COALESCE(d, CAST('(' AS DATE)), 'yyyy-MM-dd') FROM t")
  }

  test("SELECT * EXCEPT and GROUP BY ordinal pass through to Spark 4 unchanged") {
    import spark.implicits._
    Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0))
      .toDF("k", "v", "x").createOrReplaceTempView("dialect_pt")
    // SELECT * EXCEPT(...) (model_bqml.sql:111,263-265) — no rewrite needed
    val except = "SELECT * EXCEPT(x) FROM dialect_pt WHERE v = 1"
    assert(BqDialect.rewrite(except) == except)
    val r1 = spark.sql(BqDialect.rewrite(except)).collect().head
    assert(r1.schema.fieldNames.toSeq == Seq("k", "v"))
    // GROUP BY 1 ordinal (model_bqml.sql:165-174) — no rewrite needed
    val ordinal = "SELECT k, SUM(v) AS sv FROM dialect_pt GROUP BY 1 ORDER BY 1"
    assert(BqDialect.rewrite(ordinal) == ordinal)
    val r2 = spark.sql(BqDialect.rewrite(ordinal)).collect()
    assert(r2.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L), ("b", 3L)))
  }

  test("events_* + __TABLES_SUMMARY__ scripting runs the output.sql:2-19 shape with partition pruning") {
    BqDialect.registerWildcardTables(spark, "/root/testdata/sf0.001")
    val script =
      """DECLARE latest_suffix STRING DEFAULT (
        |  SELECT MAX(SPLIT(table_id, 'events_')[OFFSET(1)])
        |  FROM `proj.ds.__TABLES_SUMMARY__`
        |  WHERE REGEXP_CONTAINS(table_id, '^events_20')
        |);
        |SELECT event_type, COUNT(1) AS n
        |FROM `proj.ds.events_*`
        |WHERE _TABLE_SUFFIX = latest_suffix
        |GROUP BY 1 ORDER BY 1""".stripMargin
    val df = BqDialect.runScript(spark, script).get
    val rows = df.collect()
    assert(rows.nonEmpty && rows.map(_.getLong(1)).sum > 0)
    // the spliced literal must reach the scan as a partition filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("20240130"),
      s"latest-suffix partition filter missing:\n$plan")
  }

  test("CREATE TEMP FUNCTION (BQ AS-expr form) runs as a Spark 4 SQL UDF") {
    val script =
      """CREATE TEMP FUNCTION double_it(x INT64) RETURNS INT64 AS (x * 2);
        |CREATE TEMP FUNCTION shout(s STRING) AS (UPPER(s));
        |SELECT double_it(21) AS n, shout('hi') AS s""".stripMargin
    val row = BqDialect.runScript(spark, script).get.collect().head
    assert(row.getLong(0) == 42L)
    assert(row.getString(1) == "HI")
  }

  test("DECLARE/SET scripting splices driver-side scalars (output.sql:2-7,19)") {
    import spark.implicits._
    Seq(("events_20240101", 1), ("events_20240102", 2), ("events_20240103", 3))
      .toDF("table_id", "n").createOrReplaceTempView("tables_summary")
    val out = BqDialect.runScript(spark,
      """DECLARE latest STRING;
        |SET latest = (SELECT MAX(table_id) FROM tables_summary);
        |SELECT n FROM tables_summary WHERE table_id = latest""".stripMargin)
    assert(out.get.collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("script runs multi-statement DDL + final select with FARM_FINGERPRINT") {
    val out = BqDialect.runScript(spark,
      """CREATE OR REPLACE TEMPORARY VIEW script_v AS SELECT 'abc' AS s;
        |SELECT FARM_FINGERPRINT(s) AS fp FROM script_v""".stripMargin)
    assert(out.get.collect().head.getLong(0) == graft.functions.FarmHash.fingerprint64("abc"))
  }
}
