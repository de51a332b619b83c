package graft.streaming

import graft.workers.Sinks
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming variants of the upload sinks (SURVEY §2.6).
 *
 * The reference's "streaming" is a paged table scan + HTTP POST
 * (`bq_to_measurement_protocol_ga4.py:35-168`) — batch in disguise. The
 * Spark-native upgrade: `readStream` over the staging directory with
 * `Trigger.AvailableNow` (process everything that exists, then stop) and
 * checkpointed progress. Files are processed exactly once across runs;
 * the HTTP delivery itself is AT-LEAST-ONCE (the checkpoint commits per
 * micro-batch, so a mid-batch failure re-sends that batch's already-POSTed
 * rows on retry — the same contract as the reference's page-restart
 * behavior; Measurement Protocol dedups on event identity upstream). New
 * files dropped into the staging dir are picked up by the next run — the
 * incremental upload pattern a 100 TB pipeline needs (no re-scan of
 * already-sent rows).
 */
object StreamingSinks {

  /**
   * Streaming Measurement-Protocol upload: parquet staging dir →
   * AvailableNow micro-batches → per-partition templated POSTs (batch
   * shape identical to the batch sink — same transport, same template
   * substitution). Returns after draining; checkpoint dir carries
   * progress across runs.
   */
  def measurementProtocolAvailableNow(
      spark: SparkSession,
      stagingDir: String,
      schema: StructType,
      template: String,
      url: String,
      checkpointDir: String,
      transport: Sinks.HttpTransport = Sinks.RecordingTransport): Unit = {
    val t = transport
    val query = spark.readStream
      .schema(schema)
      .parquet(stagingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach { row =>
            val payload = Sinks.pyTemplateSubstitute(template, Sinks.rowValues(row))
            val (status, _) = t.post(url, payload)
            if (status / 100 != 2)
              throw new RuntimeException(s"Failed to send event with status code ($status)")
          }
        }
        ()
      }
      .start()
    query.awaitTermination()
  }
}
