package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Semantic cases for the retrieval family: BM25's closed form on a
  * fixture small enough to verify each factor by hand (df/idf per term,
  * the length-normalized saturation, the Σ-of-rounded-terms contract,
  * and exclusion of no-hit / empty / NULL documents). */
class RetrievalSpec extends AnyFunSuite with SparkFixture {

  private def bm25Dir(): String = {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, "vector vector hash x", "en", "s0"),          // dl=4, hits vector×2, hash×1
      (1L, "stream y y y y y y y", "en", "s0"),          // dl=8, hits stream×1
      (2L, "x y z", "en", "s1"),                         // dl=3, no query hits
      (3L, "vector", "en", "s1"),                        // dl=1, hits vector×1
      (4L, "", "en", "s1"),                              // empty — not a document
      (5L, null.asInstanceOf[String], "en", "s1"))       // failed extraction
      .map { case (id, t, l, s) =>
        (id, t, l, s, Option(t).map(_.length.toLong).getOrElse(0L))
      }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir.toString
  }

  test("textBm25Topk scores match the closed form; no-hit/empty/NULL docs excluded") {
    // corpus: N=4 scoring docs (0,1,2,3), total tokens 4+8+3+1=16, avgdl=4.0
    // df: vector=2 (docs 0,3), hash=1 (doc 0), stream=1 (doc 1)
    val idfVector = math.log(1.0 + (4.0 - 2.0 + 0.5) / (2.0 + 0.5)) // ln 2
    val idfHash = math.log(1.0 + (4.0 - 1.0 + 0.5) / (1.0 + 0.5))   // ln(10/3)
    def sat(tf: Double, dl: Double): Double =
      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 4.0)))
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

    val rows = Retrieval.textBm25Topk(spark, bm25Dir()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    val ids = rows.map(_._1)
    assert(!ids.contains(2L) && !ids.contains(4L) && !ids.contains(5L),
      "documents with no query hits (or no tokens) never appear")

    val byId = rows.toMap
    // doc 0: dl=4 is exactly avgdl, so the hash term's saturation is
    //        tf·2.2/(tf+1.2) with tf=1 → exactly 1.0 → ts = idf(hash)
    assert(byId(0L)._1 == 4L && byId(0L)._2 == 2L)
    val exp0 = (r6(idfVector * sat(2.0, 4.0)) + r6(idfHash)).toDouble
    assert(byId(0L)._3 == exp0, s"doc 0 score ${byId(0L)._3} != $exp0")
    // doc 1: a long doc is length-penalized (dl=2·avgdl)
    val exp1 = r6(idfHash * sat(1.0, 8.0)).toDouble
    assert(byId(1L) == ((8L, 1L, exp1)))
    // doc 3: a short doc is length-boosted (dl=avgdl/4)
    val exp3 = r6(idfVector * sat(1.0, 1.0)).toDouble
    assert(byId(3L) == ((1L, 1L, exp3)))
    // ranking: two hits beat one; the rows arrive score-descending
    assert(ids.head == 0L)
    assert(rows.map(_._2._3).sorted.reverse.toSeq == rows.map(_._2._3).toSeq)
  }

  test("retrievalRrfFusion: lists fuse by reciprocal rank; single-list docs score one term") {
    import spark.implicits._
    val dir = tmpSfDir()
    // BM25 side: doc9 (vector+hash) > doc0 (stream×2) > doc8 (vector×3,
    // length-penalized); doc10 has no query hits → cos-only
    val docRows = Seq(
      (0L, "stream stream", "en", "s0"),
      (8L, "vector vector vector", "en", "s0"),
      (9L, "vector hash", "en", "s0"),
      (10L, "x y z", "en", "s1"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents",
      docRows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    // cosine side vs anchor [1,0,0,0]: vec9 1.0 > vec11 0.8 > vec8 0.6 > vec10 0.0
    val embRows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),   // anchor
      (8L, Array(0.6f, 0.8f, 0.0f, 0.0f), 0),
      (9L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (10L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (11L, Array(0.8f, 0.6f, 0.0f, 0.0f), 0))  // no document row → cos-only
    writeTable(dir, "embeddings", embRows.toDF("vec_id", "embedding", "label"))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Retrieval.retrievalRrfFusion(spark, dir.toString).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (9L, Some(1L), Some(1L), r6(1.0 / 61 + 1.0 / 61)),
      (8L, Some(3L), Some(3L), r6(1.0 / 63 + 1.0 / 63)),
      (0L, Some(2L), None, r6(1.0 / 62)),
      (11L, None, Some(2L), r6(1.0 / 62)),
      (10L, None, Some(4L), r6(1.0 / 64))),
      s"got ${out.toSeq}")
  }

  test("retrievalMmrDiversify: redundancy penalty reorders a near-duplicate below a diverse doc") {
    import spark.implicits._
    val dir = tmpSfDir()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // anchor = x-axis. vec8/vec9: identical (rel .8, sim(8,9)=1);
    // vec10: rel .6 but ORTHOGONAL to 8/9 (sim 0) — pure relevance order
    // is 8,9,10; MMR must demote the duplicate below the diverse doc.
    val embRows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),   // anchor
      (8L, Array(0.8f, 0.6f, 0.0f, 0.0f), 0),
      (9L, Array(0.8f, 0.6f, 0.0f, 0.0f), 0),   // exact dup of 8
      (10L, Array(0.6f, -0.8f, 0.0f, 0.0f), 0)) // rel .6, ⊥ to 8/9
    writeTable(dir, "embeddings", embRows.toDF("vec_id", "embedding", "label"))
    val out = Retrieval.retrievalMmrDiversify(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // pick 1: vec8 (rel .8, dup-tie → smaller id), score .7·.8
    // pick 2: vec9 scores .7·.8−.3·1 = .26; vec10 scores .7·.6−.3·0 = .42
    //         → the DIVERSE lower-relevance doc wins
    // pick 3: vec9 takes the tail
    assert(out.toSeq == Seq(
      (1L, 8L, 0.8, r6(0.7 * 0.8 - 0.3 * 0.0)),
      (2L, 10L, 0.6, r6(0.7 * 0.6 - 0.3 * 0.0)),
      (3L, 9L, 0.8, r6(0.7 * 0.8 - 0.3 * 1.0))),
      s"got ${out.toSeq}")
  }

  test("retrievalNdcg: rank-discounted hits over the ideal; no-relevant-docs query stays NULL") {
    import spark.implicits._
    val dir = tmpSfDir()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // anchor 0 (label 1): retrieval order 8 (rel), 9 (not), 10 (rel) →
    // DCG = disc1 + disc3 = 1.0 + 0.5; n_rel = 2 → IDCG = 1 + 0.63092975.
    // anchor 1 (label 9): nothing relevant → idcg 0, ndcg NULL.
    val embRows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f), 9),
      (8L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (9L, Array(0.8f, 0.6f, 0.0f, 0.0f), 2),
      (10L, Array(0.6f, 0.8f, 0.0f, 0.0f), 1))
    writeTable(dir, "embeddings", embRows.toDF("vec_id", "embedding", "label"))
    val out = Retrieval.retrievalNdcg(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out.toSeq == Seq(
      (0L, 2L, 1.5, 1.63092975, Some(r6(1.5 / 1.63092975))),
      (1L, 0L, 0.0, 0.0, None)),
      s"got ${out.toSeq}")
  }
}
