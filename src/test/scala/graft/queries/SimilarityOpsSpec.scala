package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the IVF nprobe tuning sweep that the dense driver fixture
  * can't isolate: a query whose true neighbor lives OUTSIDE its first
  * probe cell must be missed at nprobe=1 and recovered at nprobe=2, with
  * candidate counts and scan fractions growing monotonically. */
class SimilarityOpsSpec extends AnyFunSuite with SparkFixture {

  private def vec(entries: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(64)(0.0f)
    entries.foreach { case (i, v) => a(i) = v }
    a.toSeq
  }

  private def multiDir(): String = {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      // centroids 0..7: c0 along dim0, c1 tilted into dim1, c2..c7 on
      // their own far axes (no candidates there)
      (0L, vec(0 -> 1.0f), 0),
      (1L, vec(0 -> 0.8f, 1 -> 0.6f), 0),
      (2L, vec(2 -> 1.0f), 0), (3L, vec(3 -> 1.0f), 0),
      (4L, vec(4 -> 1.0f), 0), (5L, vec(5 -> 1.0f), 0),
      (6L, vec(6 -> 1.0f), 0), (7L, vec(7 -> 1.0f), 0),
      // query 8: probe order c0 (dot 1.0) then c1 (dot 0.98)
      (8L, vec(0 -> 1.0f, 1 -> 0.3f), 0),
      // candidate a → cell c0 (1.0 vs 0.83); candidate b → cell c1
      // (0.996 vs 0.75). BOTH are true top-5 neighbors of the query, but
      // b is reachable only by the second probe.
      (18L, vec(0 -> 1.0f, 1 -> 0.05f), 0),
      (19L, vec(0 -> 0.75f, 1 -> 0.66f), 0))
    writeTable(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    dir.toString
  }

  test("simIvfMultiprobe: the out-of-cell neighbor is missed at nprobe=1, recovered at 2") {
    val out = Similarity.simIvfMultiprobe(spark, multiDir()).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "one row per probe depth")
    assert(out(1L) == ((1L, 1L, 0.5, 0.5)),
      "nprobe=1 scans only cell c0 (1 of 2 candidates) and misses b")
    assert(out(2L) == ((1L, 2L, 1.0, 1.0)),
      "nprobe=2 adds cell c1, scans both candidates, full recall")
    assert(out(3L) == ((1L, 2L, 1.0, 1.0)) && out(4L) == ((1L, 2L, 1.0, 1.0)),
      "probing empty cells adds no candidates and keeps recall")
    val byNp = out.toSeq.sortBy(_._1).map(_._2)
    assert(byNp.sliding(2).forall { case Seq(a, b) => a._2 <= b._2 && a._4 <= b._4 },
      "candidates and recall are monotone in probe depth")
  }
}
