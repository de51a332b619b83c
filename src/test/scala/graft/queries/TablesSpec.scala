package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver has shipped the events table with `ts` as nanosecond
  * timestamps (read as a raw long under `nanosAsLong`) and, since the
  * round-7 regeneration, as microsecond TIMESTAMP_NTZ. Every consumer —
  * window ordering, `ts DIV 1000` epoch math, the wildcard layout's
  * suffix derivation — assumes the nanosecond-long form, so Tables.events
  * must present exactly that whatever the physical layout. */
class TablesSpec extends AnyFunSuite with SparkFixture {

  private val baseUs = 1704067200L * 1000000L // 2024-01-01T00:00:00Z in micros

  test("events: TIMESTAMP_NTZ micros layout is normalized to the nanosecond long form") {
    import spark.implicits._
    val dir = tmpSfDir()
    val df = Seq((1L, baseUs, 7L, "view", 1.5, "{}"),
                 (2L, baseUs + 123456L, 8L, "click", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType,
      "fixture must exercise the NTZ physical layout")

    val got = Tables.events(spark, dir.toString)
    assert(got.schema("ts").dataType == LongType)
    val ns = got.orderBy("event_id").select("ts").as[Long].collect()
    assert(ns.toSeq == Seq(baseUs * 1000L, (baseUs + 123456L) * 1000L))
    // the epoch-micros idiom every query uses must round-trip exactly
    val us = got.orderBy("event_id").selectExpr("ts DIV 1000").as[Long].collect()
    assert(us.toSeq == Seq(baseUs, baseUs + 123456L))
  }

  test("events: long-ts layout passes through unchanged") {
    import spark.implicits._
    val dir = tmpSfDir()
    writeTable(dir, "events", Seq((1L, baseUs * 1000L, 7L, "view", 1.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val got = Tables.events(spark, dir.toString)
    assert(got.schema("ts").dataType == LongType)
    assert(got.select("ts").as[Long].head() == baseUs * 1000L)
  }

  test("wildcard layout materializes and prunes over the NTZ layout") {
    import spark.implicits._
    val dir = tmpSfDir()
    val df = Seq((1L, baseUs, 7L, "view", 1.0, "{}"),
                 (2L, baseUs + 86400L * 1000000L, 8L, "click", 2.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")

    assert(graft.sources.WildcardTable.listSuffixes(spark, dir.toString) ==
      Seq("20240101", "20240102"))
    val shard = graft.sources.WildcardTable.events(spark, dir.toString)
      .where(col("_table_suffix") === "20240102")
    assert(shard.select("event_id").as[Long].collect().toSeq == Seq(2L))
    assert(shard.schema("ts").dataType == LongType)
  }
}
