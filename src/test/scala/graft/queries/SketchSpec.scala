package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Estimator guarantees of the md5-derived sketch audits ([[Sketch]]) —
  * the properties the DuckDB hash-compare can't state as invariants. */
class SketchSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("KMV reports the exact count for small sets and stays within " +
      "theory's error envelope for sketched ones") {
    val rows = Sketch.sketchKmvDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("est_kmv")
      if (n <= 128) assert(est == n.toDouble, s"small-set exactness: $r")
      // KMV std error ≈ 1/√(k−2) ≈ 8.9%; 5σ is a generous deterministic net
      else assert(math.abs(est - n) / n < 0.45, s"KMV error envelope: $r")
    }
  }

  test("HLL registers imply a harmonic sum consistent with m=64 and the " +
      "raw estimate tracks the exact count outside the small-range regime") {
    val rows = Sketch.sketchHllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sTotal = r.getAs[Long]("s_total")
      val vEmpty = r.getAs[Long]("v_empty")
      // every register contributes between 2^0 (rho=43) and 2^43 (empty)
      assert(sTotal >= 64L && sTotal <= 64L * 8796093022208L, s"S bounds: $r")
      assert(vEmpty >= 0L && vEmpty <= 64L, s"empty-register bounds: $r")
      if (!r.getAs[Boolean]("small_range")) {
        val n = r.getAs[Long]("n_exact")
        val est = r.getAs[Double]("est_hll")
        // HLL std error ≈ 1.04/√64 = 13%; 5σ deterministic net
        assert(math.abs(est - n) / n < 0.65, s"HLL error envelope: $r")
      }
    }
  }

  test("Count-Min never undercounts: every probe's overestimate is >= 0") {
    val rows = Sketch.sketchCmsHeavy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L, s"CMS undercount: $r")
      assert(r.getAs[Long]("est_cms") >= r.getAs[Long]("n_exact"), s"$r")
    }
  }

  test("Bloom fill ratio and measured fp rate stay inside [0, 1] and a " +
      "zero-probe source reports NULL fp, not a division error") {
    val rows = Sketch.sketchBloomFp(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill >= 0.0 && fill <= 1.0, s"fill: $r")
      assert(r.getAs[Long]("bits_set") <= 4L * r.getAs[Long]("n_members"),
        s"more bits than k*members: $r")
      if (r.getAs[Long]("n_probes") == 0L)
        assert(r.isNullAt(r.fieldIndex("fp_rate")), s"zero-probe fp: $r")
      else {
        val fp = r.getAs[Double]("fp_rate")
        assert(fp >= 0.0 && fp <= 1.0, s"fp range: $r")
      }
    }
  }

  test("KMV Jaccard is exact when the union fits the sketch and always " +
      "lands in [0, 1]") {
    val rows = Sketch.sketchKmvJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("jaccard_kmv")
      val exact = r.getAs[Double]("jaccard_exact")
      assert(est >= 0.0 && est <= 1.0, s"range: $r")
      if (r.getAs[Long]("n_union") <= 128)
        assert(est == exact, s"small-union exactness: $r")
    }
  }
}
