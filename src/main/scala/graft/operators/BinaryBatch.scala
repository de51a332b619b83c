package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (builder brief §multimodal): media payloads are
 * opaque `binary` columns with typed metadata; decode / feature-extraction
 * runs batched per partition — the Scala analog of `mapInPandas`, with the
 * same shape: an iterator of row-batches in, an iterator of row-batches out,
 * so a real decoder can amortize model/library setup per batch.
 *
 * The actual image/audio decode is STUBBED ([[StubDecoder]] — the container
 * has no media libraries); the Spark-side contract (schema, batching,
 * partition-parallelism, null handling) is real and tested in MultimodalSpec.
 */
object BinaryBatch {

  /** One decoded media record (what a real decoder would emit). */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))

  /**
   * STUB decoder: deterministic fake dimensions derived from payload bytes.
   * A real deployment swaps this for an image/audio library call; the
   * signature (whole batch in, whole batch out) is the real contract.
   */
  object StubDecoder {
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row] =
      batch.map { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Row(id, 0L, null, null, null)
        else Row(id,
          bytes.length.toLong,
          16L * (1 + (bytes(0) & 3)),
          16L * (1 + (bytes(bytes.length - 1) & 3)),
          1L + bytes.length % 7)
      }
  }

  /** Default rows per decode batch (what a vectorized decoder wants). */
  val DefaultBatchSize = 64

  /**
   * Decode a (id, payload) DataFrame in per-partition batches. Partitions
   * stream: no partition-sized materialization beyond one batch.
   */
  def decode(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
             batchSize: Int = DefaultBatchSize): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    import spark.implicits._
    val pairs = df.select(df(idCol).cast("long"), df(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => StubDecoder.decodeBatch(batch))
    }(enc)
  }
}
