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

  /** One resized media record. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("in_w", LongType, nullable = true),
    StructField("in_h", LongType, nullable = true),
    StructField("out_w", LongType, nullable = false),
    StructField("out_h", LongType, nullable = false),
    StructField("out_bytes", LongType, nullable = false)))

  /** One sampled frame (one media row fans out to ≤ maxFrames rows). */
  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame_pos", LongType, nullable = false),
    StructField("sample_byte", LongType, nullable = false)))

  /** STUB resize: output payload is a truncation to the target raster's
    * byte budget (outW·outH/8) — a real library call replaces the body,
    * the batch contract stays. */
  object StubResizer {
    def resizeBatch(batch: Seq[(Long, Array[Byte])], outW: Int, outH: Int): Seq[Row] =
      batch.map { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Row(id, null, null, outW.toLong, outH.toLong, 0L)
        else Row(id,
          16L * (1 + (bytes(0) & 3)),
          16L * (1 + (bytes(bytes.length - 1) & 3)),
          outW.toLong, outH.toLong,
          math.min(bytes.length.toLong, outW.toLong * outH / 8))
      }
  }

  /** STUB frame sampler: up to `maxFrames` evenly spaced frames out of the
    * stub frame count (1 + len%7); each emits the byte at its frame
    * offset. One row in, many rows out — the generator-shaped contract. */
  object StubFrameSampler {
    def sampleBatch(batch: Seq[(Long, Array[Byte])], maxFrames: Int): Seq[Row] =
      batch.flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Nil
        else {
          val nf = 1 + bytes.length % 7
          val k = math.min(maxFrames, nf)
          (0 until k).map { i =>
            val pos = i.toLong * (bytes.length / nf)
            Row(id, i.toLong, pos, (bytes(pos.toInt) & 0xff).toLong)
          }
        }
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

  /** Batched resize through the same per-partition streaming contract. */
  def resize(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
             outW: Int = 64, outH: Int = 64,
             batchSize: Int = DefaultBatchSize): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(b => StubResizer.resizeBatch(b, outW, outH))
      }(enc)
  }

  /** Batched frame sampling: each media row fans out to ≤ maxFrames rows. */
  def frameSample(spark: SparkSession, df: DataFrame, idCol: String, binCol: String,
                  maxFrames: Int = 3, batchSize: Int = DefaultBatchSize): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    import spark.implicits._
    df.select(df(idCol).cast("long"), df(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(b => StubFrameSampler.sampleBatch(b, maxFrames))
      }(enc)
  }
}
