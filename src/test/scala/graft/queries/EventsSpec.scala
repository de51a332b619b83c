package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Ordering semantics the dense driver fixture can't isolate: the funnel
  * must require STRICT stage order inside the attribution window, and the
  * gap-fill panel must zero-fill and carry the last ACTIVE day forward. */
class EventsSpec extends AnyFunSuite with SparkFixture {

  /** ns timestamp at `minutes` past 2024-01-01T00:00Z. */
  private def tsNs(minutes: Long): Long = 1704067200L * 1000000000L + minutes * 60L * 1000000000L

  private def usOf(minutes: Long): Long = tsNs(minutes) / 1000L

  test("qFunnel: stages require strict order inside the 24h window; no view means no row") {
    import spark.implicits._
    val dir = tmpSfDir()
    val H = 60L
    val rows = Seq(
      // user 1: view → click → purchase, all in order and in window → stage 3
      (1L, 1L, tsNs(1 * H), "view", 1.0),
      (2L, 1L, tsNs(2 * H), "click", 1.0),
      (3L, 1L, tsNs(3 * H), "purchase", 1.0),
      // user 2: click BEFORE its only view → the click must not count → stage 1
      (4L, 2L, tsNs(1 * H), "click", 1.0),
      (5L, 2L, tsNs(2 * H), "view", 1.0),
      // user 3: click 25h after the view — outside the window → stage 1
      (6L, 3L, tsNs(1 * H), "view", 1.0),
      (7L, 3L, tsNs(26 * H), "click", 1.0),
      // user 4: purchase BEFORE the qualifying click → stage 2
      (8L, 4L, tsNs(1 * H), "view", 1.0),
      (9L, 4L, tsNs(90), "purchase", 1.0),
      (10L, 4L, tsNs(2 * H), "click", 1.0),
      // user 5: no view at all → not in the funnel
      (11L, 5L, tsNs(1 * H), "click", 1.0),
      (12L, 5L, tsNs(2 * H), "purchase", 1.0))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.qFunnel(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "only users with a view enter the funnel")
    assert(out(1L).getLong(4) == 3)
    assert(out(2L).getLong(4) == 1 && out(2L).isNullAt(2),
      "a click before the first view must not advance the funnel")
    assert(out(3L).getLong(4) == 1, "a click outside the window must not advance the funnel")
    assert(out(4L).getLong(4) == 2 && out(4L).isNullAt(3),
      "a purchase before the qualifying click must not advance the funnel")
    assert(out(1L).getLong(1) == usOf(1 * H) && out(1L).getLong(2) == usOf(2 * H) &&
      out(1L).getLong(3) == usOf(3 * H))
  }

  test("statsFriedman: textbook no-tie chi2 on a stable daily ranking") {
    import spark.implicits._
    val dir = tmpSfDir()
    val day = 24 * 60L
    // day0: A=1, B=2; day1: A=1, B=3 — B out-ranks A in both blocks:
    // R_A=2, R_B=4 → chi2_F = 12/(2·2·3)·(4+16) − 3·2·3 = 2
    val rows = Seq(
      (1L, 1L, tsNs(0 * day + 1), "A", 1.0),
      (2L, 1L, tsNs(0 * day + 2), "B", 1.0),
      (3L, 1L, tsNs(0 * day + 3), "B", 1.0),
      (4L, 1L, tsNs(1 * day + 1), "A", 1.0),
      (5L, 1L, tsNs(1 * day + 2), "B", 1.0),
      (6L, 1L, tsNs(1 * day + 3), "B", 1.0),
      (7L, 1L, tsNs(1 * day + 4), "B", 1.0))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val r = Events.statsFriedman(spark, dir.toString).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2)) == ((2L, 2L, 2.0)),
      s"got ${r(0)}")
  }

  test("statsFriedman: tied and zero-filled blocks use average ranks; k=1 is NULL") {
    import spark.implicits._
    val dir = tmpSfDir()
    val day = 24 * 60L
    // day0: A=1, B=1 (tied block); day1: NO events (zero-zero tie after
    // the calendar fill); day2: A absent (true zero) vs B=2.
    // Doubled ranks: (3,3), (3,3), (2,4) → R2_A=8, R2_B=10 → chi2 = 1.0
    val rows = Seq(
      (1L, 1L, tsNs(0 * day + 1), "A", 1.0),
      (2L, 1L, tsNs(0 * day + 2), "B", 1.0),
      (3L, 1L, tsNs(2 * day + 1), "B", 1.0),
      (4L, 1L, tsNs(2 * day + 2), "B", 1.0))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val r = Events.statsFriedman(spark, dir.toString).collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2)) == ((2L, 3L, 1.0)),
      s"got ${r(0)}")

    val dir2 = tmpSfDir()
    writeTable(dir2, "events",
      Seq((1L, 1L, tsNs(1), "A", 1.0))
        .toDF("event_id", "user_id", "ts", "event_type", "value"))
    val r2 = Events.statsFriedman(spark, dir2.toString).collect()
    assert(r2.length == 1 && r2(0).getLong(0) == 1L && r2(0).isNullAt(2),
      "a single treatment has no ranking to test — NULL, not a division error")
  }

  test("qGapFill: dense panel zero-fills and carries the last active day forward") {
    import spark.implicits._
    val dir = tmpSfDir()
    val day = 24 * 60L
    val rows = Seq(
      // user 1 active on days 1 and 4; user 2 only on day 5 (sets the span)
      (1L, 1L, tsNs(0 * day + 60), "view", 2.0),
      (2L, 1L, tsNs(3 * day + 60), "view", 4.0),
      (3L, 2L, tsNs(4 * day + 60), "view", 8.0))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.qGapFill(spark, dir.toString).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDate(4).toString)))
      .toMap
    assert(out.size == 10, "2 users × 5-day span = 10 panel cells")
    assert(out((1L, "2024-01-01")) == ((1L, 2.0, "2024-01-01")))
    assert(out((1L, "2024-01-02")) == ((0L, 0.0, "2024-01-01")),
      "an inactive day zero-fills and keeps the last active day")
    assert(out((1L, "2024-01-04")) == ((1L, 4.0, "2024-01-04")))
    assert(out((1L, "2024-01-05")) == ((0L, 0.0, "2024-01-04")))
    assert(out((2L, "2024-01-03")) == ((0L, 0.0, null)),
      "before any activity the carried day is NULL")
    assert(out((2L, "2024-01-05")) == ((1L, 8.0, "2024-01-05")))
  }

  test("qGapFill reads spine bounds from partition metadata — no extra scan job at build time") {
    // VERDICT r06 nit 2: the old bounds pass ran agg(min,max).first() —
    // a full extra scan of events before the main job. The bounds now come
    // from the date-sharded layout's directory names (the same listing
    // q_latest_suffix reads), so CONSTRUCTING the query must run exactly
    // the jobs any lazy events-query build runs (parquet schema
    // inference) and not one more. Self-calibrating: measure a build
    // that is known to take no driver-side action over the data.
    val sfDir = "/root/testdata/sf0.001"
    graft.sources.WildcardTable.eventsPath(spark, sfDir) // layout setup, not query work
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Events.q10FirstEvent(spark, sfDir) // lazy baseline over the same table
      Thread.sleep(500) // job-start events arrive on the async listener bus
      val baseline = jobs.getAndSet(0)
      val df = Events.qGapFill(spark, sfDir)
      Thread.sleep(500)
      assert(jobs.get() <= baseline,
        s"qGapFill construction ran ${jobs.get()} Spark job(s) vs the lazy baseline's " +
          s"$baseline; spine bounds must come from partition metadata, not a data scan")
      assert(df.count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("qIslandsScd2: consecutive same-tier runs collapse; validity chains; last row current") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      // user 1: low low mid low → 3 islands
      (1L, 1L, tsNs(10), "view", Some(5.0)),
      (2L, 1L, tsNs(20), "view", Some(6.0)),
      (3L, 1L, tsNs(30), "view", Some(50.0)),
      (4L, 1L, tsNs(40), "view", Some(5.0)),
      // user 2: one NULL-value event → tier 'none', single current island
      (5L, 2L, tsNs(10), "view", Option.empty[Double]),
      // user 3: high throughout → one island of 2
      (6L, 3L, tsNs(10), "view", Some(150.0)),
      (7L, 3L, tsNs(20), "view", Some(900.0)))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.qIslandsScd2(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, "low", 2L, usOf(10), Some(usOf(30)), false),
      (1L, 2L, "mid", 1L, usOf(30), Some(usOf(40)), false),
      (1L, 3L, "low", 1L, usOf(40), None, true),
      (2L, 1L, "none", 1L, usOf(10), None, true),
      (3L, 1L, "high", 2L, usOf(10), None, true)))
  }

  test("statsCusumShift: sustained rate shift accumulates past the interval; below-slack days clamp at zero") {
    import spark.implicits._
    val dir = tmpSfDir()
    val D = 24 * 60L
    // 'view': 2/day days 0..9, then 10/day days 10..19 → days=20, tot=120,
    // slack line 1.25μ = 7.5/day. Scaled D_t = 80n − 600: −440 below, +200
    // above. Running min is the falling prefix itself → S=0 through day 9;
    // then S = 200·(d−9); interval 8·tot = 960 → alarm from day 14 on.
    var eid = 0L
    val rows = (0 until 20).flatMap { d =>
      val c = if (d < 10) 2 else 10
      (1 to c).map { i => eid += 1; (eid, 1L, tsNs(d * D + i), "view", Some(1.0)) }
    }
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.statsCusumShift(spark, dir.toString).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.length == 20)
    assert(out.take(10).forall(r => r._2 == 0L && !r._3),
      s"pre-shift rows must clamp at 0: ${out.take(10).toSeq}")
    assert(out.drop(10).zipWithIndex.forall { case ((n, s, a), k) =>
      n == 10L && s == 200L * (k + 1) && a == (s > 960L)
    }, s"got ${out.drop(10).toSeq}")
    assert(out.indexWhere(_._3) == 14, s"first alarm day: ${out.indexWhere(_._3)}")
  }

  test("qInterEventGaps: lower-median and ceil-p90 over second-bucketed per-user gaps; type from the later event") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      // u1 'view' at minutes 0, 60, 120 → two 3600s gaps
      (1L, 1L, tsNs(0), "view", Some(1.0)),
      (2L, 1L, tsNs(60), "view", Some(1.0)),
      (3L, 1L, tsNs(120), "view", Some(1.0)),
      // u2 'view' at minutes 0..3 → three 60s gaps
      (4L, 2L, tsNs(0), "view", Some(1.0)),
      (5L, 2L, tsNs(1), "view", Some(1.0)),
      (6L, 2L, tsNs(2), "view", Some(1.0)),
      (7L, 2L, tsNs(3), "view", Some(1.0)),
      // u3: view → click: the 600s gap belongs to 'click' (the later event)
      (8L, 3L, tsNs(0), "view", Some(1.0)),
      (9L, 3L, tsNs(10), "click", Some(1.0)))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.qInterEventGaps(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 'view' gaps sorted: 60,60,60,3600,3600 → k50=3 → 60; k90=5 → 3600
    assert(out.toSeq == Seq(
      ("click", 1L, 600L, 600L, 600L),
      ("view", 5L, 60L, 3600L, 3600L)),
      s"got ${out.toSeq}")
  }

  test("qDidLift: treated delta minus control delta per user; midpoint splits the span") {
    import spark.implicits._
    val dir = tmpSfDir()
    val D = 24 * 60L
    // span days 0..10 → mid=5 (post = dn ≥ 5)
    val rows = Seq(
      (1L, 1L, tsNs(0 * D), "click", Option.empty[Double]),
      (2L, 1L, tsNs(1 * D), "purchase", Some(10.0)),   // pre
      (3L, 1L, tsNs(6 * D), "purchase", Some(30.0)),   // post → Δ=+2000¢
      (4L, 2L, tsNs(2 * D), "click", Some(1.0)),       // treated, Δ=0
      (5L, 3L, tsNs(1 * D), "purchase", Some(20.0)),
      (6L, 3L, tsNs(7 * D), "purchase", Some(20.0)),   // control, Δ=0
      (7L, 4L, tsNs(8 * D), "purchase", Some(10.0)),   // control, Δ=+1000¢
      (8L, 4L, tsNs(10 * D), "view", Some(1.0)))       // sets the span max
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.qDidLift(spark, dir.toString).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 2000L, 1000L)), s"got $r")
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6)) ==
      ((1000.0, 500.0, 500.0)), s"got $r")
  }

  test("statsAutocorr: alternating daily series gives r=-1 at odd lags, +1 at even; 1-pair lag is NULL") {
    import spark.implicits._
    val dir = tmpSfDir()
    val D = 24 * 60L
    // 'view' daily counts [1,2,1,2,1,2] on days 0..5 (dense, no gaps)
    val counts = Seq(1, 2, 1, 2, 1, 2)
    var eid = 0L
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map { i => eid += 1; (eid, 1L, tsNs(d * D + i), "view", Some(1.0)) }
    }
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.statsAutocorr(spark, dir.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    // lags 6,7 have zero pairs → no row at all
    assert(out.toSeq == Seq(
      (1L, 5L, Some(-1.0)), (2L, 4L, Some(1.0)), (3L, 3L, Some(-1.0)),
      (4L, 2L, Some(1.0)), (5L, 1L, None)),
      s"got ${out.toSeq}")
  }

  test("statsSeasonalityDow: Monday-only type fires chi2; uniform type scores zero") {
    import spark.implicits._
    val dir = tmpSfDir()
    val D = 24 * 60L
    var eid = 0L
    def ev(day: Long, typ: String, n: Int): Seq[(Long, Long, Long, String, Some[Double])] =
      (1 to n).map { i => eid += 1; (eid, 1L, tsNs(day * D + i), typ, Some(1.0)) }
    // 2024-01-01 (day 0) is a Monday. 'click': 4 events on two Mondays →
    // chi2 = (7·16 − 16)/4 = 24 > 12.592. 'view': 2/day over 14 days →
    // every dow holds 4 → chi2 = 0.
    val rows = ev(0, "click", 2) ++ ev(7, "click", 2) ++
      (0L until 14L).flatMap(d => ev(d, "view", 2))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.statsSeasonalityDow(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(out.filter(_._1 == "click").toSeq ==
      Seq(("click", 1L, 4L, 1000000L, 24.0, true)), s"got ${out.toSeq}")
    val views = out.filter(_._1 == "view")
    assert(views.length == 7 &&
      views.forall(v => v._3 == 4L && v._5 == 0.0 && !v._6),
      s"got ${views.toSeq}")
  }

  test("mlChurnLabels: label window is the last 14 days; pre-cutoff-only users churn; post-only users drop") {
    import spark.implicits._
    val dir = tmpSfDir()
    val D = 24 * 60L
    val rows = Seq(
      // u1: view day 1 + purchase day 2, silent after → churned
      (1L, 1L, tsNs(1 * D), "view", Option.empty[Double]),
      (2L, 1L, tsNs(2 * D), "purchase", Some(10.0)),
      // u2: view day 5, view day 15 (inside the label window) → retained
      (3L, 2L, tsNs(5 * D), "view", Some(1.0)),
      (4L, 2L, tsNs(15 * D), "view", Some(1.0)),
      // u3: only post-cutoff activity (day 20 = max) → no feature base, dropped
      (5L, 3L, tsNs(20 * D), "view", Some(1.0)))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.mlChurnLabels(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // cutoff = day 20 − 14 = day 6
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 1000L, 4L, true),
      (2L, 1L, 0L, 0L, 1L, false)),
      s"got ${out.toSeq}")
  }

  test("qParetoRevenue: decile curve in exact ppm; duplicate boundary ranks repeat") {
    import spark.implicits._
    val dir = tmpSfDir()
    // revenues: u1 100.00, u2 50.00, u3 30.00, u4 20.00 (total 200.00);
    // the view event is outside the revenue base
    val rows = Seq(
      (1L, 1L, tsNs(10), "purchase", Some(60.0)),
      (2L, 1L, tsNs(20), "purchase", Some(40.0)),
      (3L, 2L, tsNs(10), "purchase", Some(50.0)),
      (4L, 3L, tsNs(10), "purchase", Some(30.0)),
      (5L, 4L, tsNs(10), "purchase", Some(20.0)),
      (6L, 5L, tsNs(10), "view", Some(999.0)))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.qParetoRevenue(spark, dir.toString).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // boundary rank per decile d over 4 users: (4d+9) div 10
    assert(out.toSeq == Seq(
      (1, 1L, 250000L, 500000L), (2, 1L, 250000L, 500000L),
      (3, 2L, 500000L, 750000L), (4, 2L, 500000L, 750000L),
      (5, 2L, 500000L, 750000L), (6, 3L, 750000L, 900000L),
      (7, 3L, 750000L, 900000L), (8, 4L, 1000000L, 1000000L),
      (9, 4L, 1000000L, 1000000L), (10, 4L, 1000000L, 1000000L)),
      s"got ${out.toSeq}")
  }

  test("statsDailyAnomaly: spike vs trailing-only baseline fires; warmup days stay NULL") {
    import spark.implicits._
    val dir = tmpSfDir()
    val D = 24 * 60L // minutes per day
    // 'view': day 1..7 counts 8,12,9,11,10,10,10 (mean 10, var 10/6),
    // day 8 = 100 → z huge → anomaly
    val counts = Seq(8, 12, 9, 11, 10, 10, 10, 100)
    var eid = 0L
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map { i => eid += 1; (eid, eid % 7, tsNs(d * D + i), "view", Some(1.0)) }
    }
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = Events.statsDailyAnomaly(spark, dir.toString).collect()
      .map(r => (r.getLong(2), r.getLong(3),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6)))
    def rnd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.length == 8)
    assert(out(0) == ((8L, 0L, None, false)), "day 1: empty baseline, no z")
    assert(out(1)._2 == 1L && out(1)._3.isEmpty, "day 2: one-sample baseline, no z")
    // day 8: baseline days 1..7 → mean 10, sample var 10/6
    val std = math.sqrt(10.0 / 6.0)
    val z8 = rnd((100.0 - 10.0) / std)
    assert(out(7) == ((100L, 7L, Some(z8), true)), s"got ${out(7)}; want z=$z8")
  }

  test("qStickiness: trailing-window WAU counts each user once; only active days emit") {
    import spark.implicits._
    val dir = tmpSfDir()
    val day = 24 * 60L
    val rows = Seq(
      // day 0: users 1 and 2; day 1: user 1 again (twice — distinct per day);
      // day 9 (outside day-1's window): user 3 alone, users 1/2 aged out
      (1L, 1L, tsNs(0 * day + 1), "view", 1.0),
      (2L, 2L, tsNs(0 * day + 2), "view", 1.0),
      (3L, 1L, tsNs(1 * day + 1), "view", 1.0),
      (4L, 1L, tsNs(1 * day + 2), "click", 1.0),
      (5L, 3L, tsNs(9 * day + 1), "view", 1.0))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("props", org.apache.spark.sql.functions.lit("{}")))
    val out = Events.qStickiness(spark, dir.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // day0: DAU 2, WAU 2 → 1.0; day1: DAU 1 (dup events collapse), WAU 2
    // (user 2 still weekly-active) → 0.5; day9: DAU 1, WAU 1 → 1.0.
    assert(out.toSeq == Seq((2L, 2L, 1.0), (1L, 2L, 0.5), (1L, 1L, 1.0)),
      "WAU must be the trailing 7-day distinct-user count, not a sum of DAUs")
  }
}
