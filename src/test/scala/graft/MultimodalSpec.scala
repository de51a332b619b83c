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
}
