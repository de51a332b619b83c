package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join: for every left row, attach the single most recent
 * right row at or before the left row's time, per key — the "latest
 * state/event as of T" lookup an attribution or feature pipeline needs.
 *
 * Spark has no built-in as-of join, and the naive spellings both die at
 * scale: a range join materializes every (left × admissible-right) pair
 * before picking the max (quadratic on hot keys), and a correlated
 * subquery runs once per left row. This is the scalable formulation —
 * tag both inputs, UNION them, and carry the last right payload forward
 * with one partitioned running window:
 *
 *   - ONE shuffle (hash on the key for the window), work linear in
 *     |left| + |right|, no pair materialization;
 *   - the same merge-on-time algorithm pandas `merge_asof` and kdb `aj`
 *     implement imperatively, expressed declaratively so Catalyst/AQE
 *     keep planning freedom.
 *
 * Semantics:
 *   - inclusive — a right row at exactly the left time matches (right
 *     rows sort before left rows at equal time);
 *   - left-outer — a left row with no admissible right row gets NULL
 *     payload columns;
 *   - right-side (key, time) ties resolve to the greatest payload struct
 *     (deterministic on every run and engine; payload types must be
 *     orderable — no maps).
 */
object AsOfJoin {

  /**
   * @param left      probe side; all its columns pass through
   * @param right     build side (the "state" stream)
   * @param keys      equi-join key columns (present on both sides)
   * @param leftTime  left ordering column (any orderable type, shared
   *                  with rightTime)
   * @param rightTime right ordering column
   * @param payload   right columns to attach, as (rightCol, outputName);
   *                  include rightTime itself to see the matched time
   */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, payload, forwardDir = false)

  /** Forward as-of join: the single EARLIEST right row at or after each
    * left row's time — "next event after T" (the conversion that followed
    * an impression). Same machinery as [[backward]] under a reversed time
    * sort; right-side (key, time) ties resolve to the greatest payload
    * struct, exactly as in [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, payload, forwardDir = true)

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)], forwardDir: Boolean): DataFrame = {
    require(payload.nonEmpty, "asof: payload must name at least one right column")
    val helpers = Seq("__t", "__side", "__rpay", "__m")
    helpers.foreach { h =>
      require(!left.columns.contains(h) && !right.columns.contains(h),
        s"asof: input must not contain helper column '$h'")
    }
    val outs = payload.map(_._2)
    require(outs.distinct.size == outs.size,
      s"asof: duplicate payload output names: ${outs.diff(outs.distinct).distinct.mkString(", ")}")
    payload.foreach { case (_, out) =>
      require(!left.columns.contains(out),
        s"asof: left already has a column named '$out'")
      require(!out.contains("."),
        s"asof: payload output name must not contain '.': '$out'")
    }
    // NULL-time right rows are excluded up front: `right.t <= left.t` is
    // never true for NULL (ASOF JOIN / merge_asof semantics) — under the
    // window's nulls-first sort they would otherwise become a
    // match-of-last-resort at the head of every key partition. A left row
    // with NULL time correctly gets NULL payload for free: it sorts
    // before every (non-null-time) right row, so its frame holds none.
    val r = right
      .filter(col(rightTime).isNotNull)
      .select(
        keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(payload.map { case (c, out) => col(c).as(out) }: _*).as("__rpay")): _*)
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    // left rows get a NULL __rpay, right rows get NULL left columns
    val u = l.unionByName(r, allowMissingColumns = true)
    // right-before-left at equal time (inclusive match); among tied right
    // rows the winning payload struct sorts last — left rows' NULL __rpay
    // never reorders them relative to right rows (the side tag already
    // did). Forward is the same scan under reversed time order: the last
    // right row seen walking time DOWNWARD is the nearest future row.
    // desc_nulls_first, not plain desc (nulls-last): a NULL-time left row
    // must keep an EMPTY frame in both directions, or it would "match"
    // under the reversed sort
    val timeOrd = if (forwardDir) col("__t").desc_nulls_first else col("__t").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("__side").asc, col("__rpay").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map { case (_, out) => col(s"__m.$out").as(out) }: _*)
  }
}
