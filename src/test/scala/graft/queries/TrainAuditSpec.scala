package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics the oracle compare can't isolate: negative-sample exclusion +
  * determinism, the robust-fence arithmetic, split-leakage boundary rules,
  * and the substring-span merge. */
class TrainAuditSpec extends AnyFunSuite with SparkFixture {

  private def tsNs(day: Int, minute: Long): Long =
    (1704067200L + (day - 1) * 86400L) * 1000000000L + minute * 60L * 1000000000L

  test("mlNegativeSample: K per user, never an interacted item, deterministic") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 1000 parts over 50 buckets → ~20 candidates per probe bucket, far
    // above K=3 even after removing a user's true interactions
    val parts = (1L to 1000L).map(p => (p, s"part$p", "b", "t", 1, 1.0))
    writeTable(dir, "part",
      parts.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    val custs = (1L to 10L).map(c => (c, s"c$c", 1L, 0.0, "SEG"))
    writeTable(dir, "customer",
      custs.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    // customer c ordered parts c..c+9 via one order each
    val orders = (1L to 10L).map(c => (c, c, "O", 1.0, "2024-01-01", "P"))
    writeTable(dir, "orders",
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    val li = for { c <- 1L to 10L; p <- c to c + 9 } yield
      (c, p, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-02")
    writeTable(dir, "lineitem",
      li.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate"))

    val out = TrainAudit.mlNegativeSample(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val interacted = li.map { case (c, p, _, _, _, _, _, _, _, _, _) => (c, p) }.toSet
    assert(out.groupBy(_._1).forall(_._2.length == 3), "exactly K=3 negatives per user")
    assert(out.forall { case (c, _, p) => !interacted((c, p)) },
      "a sampled negative must never be a true interaction")
    val again = TrainAudit.mlNegativeSample(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(again), "the sample is a pure function of the catalog")
  }

  test("statsMadOutliers: lower-median fences, NULL lengths out of the population") {
    import spark.implicits._
    val dir = tmpSfDir()
    // source a: lengths 10,10,10,100 → med=10 (rank (4+1)/2=2), adev 0,0,0,90
    // → mad=0 (rank 2) → outliers: the 100 (90 > 3*0)
    val rows = Seq[(Long, String, String, String, Option[Long])](
      (1L, "x", "en", "a", Some(10L)), (2L, "x", "en", "a", Some(10L)),
      (3L, "x", "en", "a", Some(10L)), (4L, "x", "en", "a", Some(100L)),
      // source b: 1..5 + a NULL → med=3, adev 2,1,0,1,2 → mad=1
      // → outliers: none (max adev 2 ≤ 3)
      (5L, "x", "en", "b", Some(1L)), (6L, "x", "en", "b", Some(2L)),
      (7L, "x", "en", "b", Some(3L)), (8L, "x", "en", "b", Some(4L)),
      (9L, "x", "en", "b", Some(5L)), (10L, "x", "en", "b", None))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = TrainAudit.statsMadOutliers(spark, dir.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("a") == ((4L, 10L, 0L, 1L)))
    assert(out("b") == ((5L, 3L, 1L, 0L)), "NULL n_chars must not shift the median rank")
  }

  test("mlSplitLeakage: straddling users leak; boundary event is test-side") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (1L, 1L, tsNs(2, 0), "view", 1.0),   // u1: train only
      (2L, 2L, tsNs(20, 0), "view", 1.0),  // u2: test only
      (3L, 3L, tsNs(2, 0), "view", 1.0),   // u3: straddles → leaking
      (4L, 3L, tsNs(20, 0), "view", 1.0),
      (5L, 4L, tsNs(16, 0), "view", 1.0))  // u4: exactly AT cutoff → test-side
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = TrainAudit.mlSplitLeakage(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("view", 1L, 2L, 1L)),
      s"expected train=1, test=2 (incl. the boundary user), leak=1; got ${out.toSeq}")
  }

  test("statsKeySkew: heaviest keys ranked with integer ppm shares") {
    import spark.implicits._
    val dir = tmpSfDir()
    // user 7: 6 events, user 8: 3, user 9: 1 → total 10
    val rows = (1L to 6L).map(i => (i, 7L, tsNs(2, i), "view", 1.0)) ++
      (7L to 9L).map(i => (i, 8L, tsNs(2, i), "view", 1.0)) :+
      (10L, 9L, tsNs(2, 10L), "view", 1.0)
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = TrainAudit.statsKeySkew(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 7L, 6L, 600000L), (2L, 8L, 3L, 300000L),
      (3L, 9L, 1L, 100000L)))
  }

  test("dedupSubstringSpans: shared 5-grams merge into maximal spans") {
    import spark.implicits._
    val dir = tmpSfDir()
    // docs 1 and 2 share tokens a1..a7 (a 7-token run = three overlapping
    // 5-grams -> ONE merged span of 7 tokens); doc 3 is unique
    val shared = (1 to 7).map(i => s"a$i").mkString(" ")
    val rows = Seq(
      (1L, s"x1 x2 $shared y1 y2", "en", "s0", 0L),
      (2L, s"z1 $shared z2 z3 z4", "en", "s0", 0L),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "en", "s0", 0L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val res = Dedup.dedupSubstringSpans(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(res(1L) == ((11L, 1L, 7L)), s"doc1: one 7-token span; got ${res(1L)}")
    assert(res(2L) == ((11L, 1L, 7L)), s"doc2: one 7-token span; got ${res(2L)}")
    assert(res(3L) == ((9L, 0L, 0L)), "unique doc has no duplicated spans")
  }

  test("splitTemporalEmbargo: boundary events purge; crossing counts span the gap") {
    import spark.implicits._
    val dir = tmpSfDir()
    // T1 = 2024-01-14 00:00, T2 = 2024-01-17 00:00
    val rows = Seq(
      // view: u1 crosses the gap (train day 10 → test day 20), one purged
      (1L, 1L, tsNs(10, 0), "view", 1.0),
      (2L, 1L, tsNs(15, 0), "view", 1.0),
      (3L, 1L, tsNs(20, 0), "view", 1.0),
      (4L, 2L, tsNs(5, 0), "view", 1.0),    // u2: train only
      // click: both events inside [T1, T2) — all purged, nobody crosses
      (5L, 3L, tsNs(14, 0), "click", 1.0),  // exactly AT T1 → purged
      (6L, 3L, tsNs(16, 59), "click", 1.0))
    writeTable(dir, "events",
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"))
    val out = TrainAudit.splitTemporalEmbargo(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("click", 0L, 2L, 0L, 1000000L, 0L),
      ("view", 2L, 1L, 1L, 250000L, 1L)),
      s"got ${out.toSeq}")
  }

  test("evalAucRoc: all-one-parity labels yield NULL, not a division blowup") {
    import spark.implicits._
    val dir = tmpSfDir()
    // every label even → n_pos = 0: Spark's Divide would NULL but DuckDB's
    // IEEE division would NaN/inf — the guard must NULL on BOTH engines
    val rows = (0L to 9L).map(i =>
      (i, Seq.fill(4)(i.toFloat / 10f), (2 * i).toInt))
    writeTable(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val r = TrainAudit.evalAucRoc(spark, dir.toString).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 0L && r(0).getLong(1) == 10L) // n_pos, n_neg
    assert(r(0).isNullAt(2), s"auc must be NULL on a degenerate split, got ${r(0)}")
    // sanity: a mixed-parity corpus still produces a real AUC
    val dir2 = tmpSfDir()
    val mixed = (0L to 9L).map(i =>
      (i, Seq.fill(4)(i.toFloat / 10f), i.toInt))
    writeTable(dir2, "embeddings", mixed.toDF("vec_id", "embedding", "label"))
    val r2 = TrainAudit.evalAucRoc(spark, dir2.toString).collect()
    assert(!r2(0).isNullAt(2))
  }
}
