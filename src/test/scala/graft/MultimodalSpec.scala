package graft

import graft.operators.BinaryBatch
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the batched binary decode plumbing (multimodal stub). */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("decode emits one row per input with deterministic stub features") {
    import spark.implicits._
    val df = Seq(
      (1L, "abc".getBytes("UTF-8")),
      (2L, "a longer payload with more bytes".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = BinaryBatch.decode(spark, df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    assert(out(1L).getLong(1) == 3L)                  // byte_len
    assert(out(1L).getLong(2) == 16L * (1 + ('a' & 3)))  // width from first byte
    assert(out(3L).isNullAt(2) && out(3L).getLong(1) == 0L) // empty payload
    assert(out(4L).isNullAt(2) && out(4L).getLong(1) == 0L) // null payload
  }

  test("batching: results identical across batch sizes (no cross-batch state)") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"payload number $i repeated " * (i % 5).toInt))
      .map { case (i, t) => (i, t.getBytes("UTF-8")) }
      .toDF("doc_id", "payload")
    val a = BinaryBatch.decode(spark, df, "doc_id", "payload", batchSize = 1)
      .collect().map(_.toString).sorted
    val b = BinaryBatch.decode(spark, df, "doc_id", "payload", batchSize = 64)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("resize caps the byte budget at the target raster; empty/null payloads survive") {
    import spark.implicits._
    val df = Seq(
      (1L, ("x" * 1000).getBytes("UTF-8")),  // larger than 64*64/8 = 512
      (2L, "tiny".getBytes("UTF-8")),
      (3L, Array.emptyByteArray)).toDF("doc_id", "payload")
    val out = BinaryBatch.resize(spark, df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(5) == 512L) // truncated to target budget
    assert(out(2L).getLong(5) == 4L)   // smaller stays
    assert(out(3L).getLong(5) == 0L && out(3L).isNullAt(1))
  }

  test("frame sampling fans one row out to min(3, stub frame count) rows") {
    import spark.implicits._
    // len 13 -> nf = 1 + 13%7 = 7 -> 3 sampled frames at stride 13/7 = 1
    val df = Seq((7L, "abcdefghijklm".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val rows = BinaryBatch.frameSample(spark, df, "doc_id", "payload")
      .orderBy("frame_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L)) // positions
    assert(rows.map(_.getLong(3)).toSeq == Seq('a'.toLong, 'b'.toLong, 'c'.toLong))
  }
}
