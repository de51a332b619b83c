package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-time streaming operators (builder brief §streaming): the
 * Spark-native upgrade of the reference's batch event analytics to
 * unbounded inputs — `readStream` → transform → `writeStream`, with
 * watermarks bounding state and `flatMapGroupsWithState` carrying custom
 * per-key session state.
 *
 * Each operator is the streaming twin of an oracle-checked batch query
 * (q25_hour_buckets, q21_sessionize, dedup_bow_fp), and
 * StreamingOpsSpec proves parity: feeding the same rows through the
 * streaming path yields the batch result once the watermark closes.
 *
 * Scale design: all three shapes are the canonical unbounded-state-safe
 * patterns — windowed aggregation state is bounded by (watermark ÷ window)
 * buckets per key; sessions die at watermark + gap via event-time timeout;
 * dedup state holds one fingerprint per in-watermark document. Nothing
 * accumulates forever, so a 1000-executor cluster can run them
 * indefinitely.
 */
object StreamingOps {

  /** One event on the stream (the `events` table's streaming shape). */
  case class StreamEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  /** A closed session emitted by [[sessionize]]. */
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  /** Open-session state carried between triggers (micros since epoch). */
  case class SessionState(startUs: Long, endUs: Long, n: Long, total: Double)

  /**
   * Streaming hourly histogram — event-time tumbling windows with a
   * watermark (q25_hour_buckets unbounded): late data beyond `lateness`
   * is dropped, closed windows emit exactly once in append mode.
   */
  def hourlyCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("total_value"))

  private val GapUs = 30L * 60 * 1000 * 1000

  /**
   * Streaming 30-minute-gap sessionization (q21_sessionize unbounded):
   * `flatMapGroupsWithState` with event-time timeout. A session closes —
   * and is emitted downstream — when a same-user event arrives more than
   * 30 minutes later, or when the watermark passes the session end + gap
   * (the no-more-events case). State per user is one open session; the
   * watermark (required for event-time timeout) bounds both state and
   * lateness.
   */
  def sessionize(events: Dataset[StreamEvent], lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          def toSession(st: SessionState): Session =
            Session(userId, new Timestamp(st.startUs / 1000), new Timestamp(st.endUs / 1000),
              st.n, st.total)
          if (state.hasTimedOut) {
            // watermark passed session end + gap: no later event can extend it
            val closed = state.getOption.map(toSession).toSeq
            state.remove()
            closed.iterator
          } else {
            // fold this trigger's events (sorted: arrival order within a
            // batch is not event-time order) into the open session, closing
            // whenever a >gap jump appears
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000
              open match {
                case Some(st) if us - st.endUs > GapUs =>
                  closed += toSession(st)
                  open = Some(SessionState(us, us, 1, e.value))
                case Some(st) =>
                  open = Some(SessionState(st.startUs, math.max(st.endUs, us),
                    st.n + 1, st.total + e.value))
                case None =>
                  open = Some(SessionState(us, us, 1, e.value))
              }
            }
            open.foreach { st =>
              state.update(st)
              // fire when the watermark proves no event can extend this
              // session (end + gap); +1ms because the timeout must be
              // strictly later than the current watermark
              state.setTimeoutTimestamp(st.endUs / 1000 + GapUs / 1000 + 1)
            }
            closed.result().iterator
          }
      }
  }

  /**
   * Streaming click→conversion attribution — a watermarked stream-stream
   * interval join, the marketing-attribution shape of the reference's
   * domain (GA4 events to offline conversions) expressed Spark-natively:
   * each conversion matches same-user clicks that happened in the
   * `windowMinutes` before it. Both watermarks plus the time-range
   * condition bound the join state on BOTH sides — clicks expire once the
   * conversion watermark passes click_ts + window, so an unbounded stream
   * holds only the attribution window's worth of state per side.
   */
  def attributionJoin(clicks: DataFrame, conversions: DataFrame,
      windowMinutes: Int = 30, lateness: String = "1 hour"): DataFrame = {
    val c = clicks
      .withWatermark("ts", lateness)
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_type").as("click_type"))
    val v = conversions
      .withWatermark("ts", lateness)
      .select(col("user_id").as("conv_user"), col("ts").as("conv_ts"),
        col("value").as("conv_value"))
    c.join(v,
      col("click_user") === col("conv_user") &&
        col("conv_ts") >= col("click_ts") &&
        col("conv_ts") <= col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_user").as("user_id"), col("click_ts"), col("click_type"),
        col("conv_ts"), col("conv_value"))
  }

  /**
   * Streaming exact dedup (dedup_bow_fp unbounded): first occurrence of
   * each content fingerprint passes, repeats within the watermark horizon
   * are dropped. `dropDuplicatesWithinWatermark` keeps fingerprint state
   * only until the watermark passes — the standard bounded-state dedup for
   * a continuously ingesting 100 TB corpus (exact-once per horizon; the
   * batch operators handle full-corpus dedup).
   */
  def dedupByFingerprint(docs: DataFrame, lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(concat_ws(" ",
        sort_array(array_distinct(filter(split(col("text"), " "), w => w =!= ""))))))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")
}
