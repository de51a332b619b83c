package graft.streaming

import graft.SparkFixture
import graft.workers.Sinks
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** AvailableNow streaming sink: drains the staging dir once, checkpoints,
  * and picks up only NEW files on the next run. */
class StreamingSinksSpec extends AnyFunSuite with SparkFixture {

  test("measurement-protocol stream drains staging dir; restart sends only new files") {
    import spark.implicits._
    val staging = Files.createTempDirectory("graft_stream_in")
    val ckpt = Files.createTempDirectory("graft_stream_ck")
    val df1 = Seq(("c1", "purchase", 10.0), ("c2", "signup", 0.0))
      .toDF("client_id", "event", "value")
    df1.coalesce(1).write.mode("append").parquet(staging.toString)

    Sinks.RecordingTransport.clear()
    val template = """{"client_id":"$client_id","events":[{"name":"$event"}]}"""
    def run(): Unit = StreamingSinks.measurementProtocolAvailableNow(
      spark, staging.toString, df1.schema, template,
      "https://example.invalid/mp/collect", ckpt.toString)

    run()
    assert(Sinks.RecordingTransport.size == 2)
    val bodies = {
      val it = Sinks.RecordingTransport.requests.iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()._2).toList
    }
    assert(bodies.exists(_.contains("\"client_id\":\"c1\"")))

    // second run with no new files: checkpoint prevents re-sending
    run()
    assert(Sinks.RecordingTransport.size == 2)

    // drop one new file: only it is sent
    Seq(("c3", "view", 1.0)).toDF("client_id", "event", "value")
      .coalesce(1).write.mode("append").parquet(staging.toString)
    run()
    assert(Sinks.RecordingTransport.size == 3)
  }
}
