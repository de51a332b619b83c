package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the accuracy trade-off of the two-level (coarse-cell / IVF-style)
  * E-step vs the exact flat argmin — the approximation every fineModel
  * consumer and the Lloyd trainer ride above C = 8 (ADVICE r10: document
  * OR quantify; this quantifies). A member disagrees when its true
  * nearest fine centroid lives outside its coarse cell (no multi-probe
  * is done). */
class KmeansFitSpec extends AnyFunSuite with SparkFixture {

  test("two-level E-step vs flat argmin: disagreement and inertia gap are pinned") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("embedding").isNotNull)
    // force the relation path on real data: 492 members / target 16 -> C=31
    val target = 16L
    val members = e.filter(col("vec_id") >= 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val c0 = math.max(8L, (members.length + target - 1L) / target)
    assert(c0 > 8L, "fixture must exercise the two-level branch")
    val cents = e.filter(col("vec_id") < c0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

    // engine-side two-level assignment
    val centRel = {
      val s = spark
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      cents.toSeq.map { case (cid, cv) => (cid, cv) }.toDF("cid", "cv")
        .withColumn("cc", graft.functions.GraftFunctions.dot_f64(col("cv"), col("cv")))
    }
    val memRel = e.filter(col("vec_id") >= 8)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("vv", graft.functions.GraftFunctions.dot_f64(col("v"), col("v")))
    val twoLevel = KmeansFit.assignRel(memRel, centRel, cents.length.toLong)
      .select(col("vec_id"), col("cid"), col("rd2"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

    // exact flat argmin, driver-side
    def d2(v: Array[Double], c: Array[Double]): Double =
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    val flat = members.map { case (id, v) =>
      (id, cents.map { case (cid, cv) => (d2(v, cv), cid) }.min)
    }.toMap

    assert(twoLevel.keySet == flat.keySet)
    val n = members.length
    val nDisagree = members.count { case (id, _) => twoLevel(id)._1 != flat(id)._2 }
    // inertia (mean assigned d²) ratio: approx / exact — ≥ 1 by definition
    val exactInertia = flat.values.map(_._1).sum / n
    val approxInertia = twoLevel.values.map(_._2).sum / n
    val ratio = approxInertia / exactInertia
    info(f"disagreement: $nDisagree/$n (${100.0 * nDisagree / n}%.1f%%), " +
      f"inertia ratio: $ratio%.4f (C=$c0, K1=${math.ceil(math.sqrt(c0.toDouble)).toLong})")
    // pinned envelope on the driver fixture (measured: 58.3% label flips,
    // inertia ratio 1.0765 at C=31/K1=6): the fixture's embeddings are
    // near-uniform, so most flips are near-ties — the honest accuracy
    // metric for the approximation is the assigned-distance mass, which
    // stays within a few percent of exact. Label agreement is NOT the
    // contract (SemDeDup-style consumers threshold within-cell distances;
    // they never compare cids across methods).
    assert(ratio >= 1.0 - 1e-9, "approximation cannot beat the exact argmin")
    assert(ratio <= 1.15, f"inertia blow-up $ratio%.4f exceeds the pinned 1.15 envelope")
    assert(nDisagree.toDouble / n <= 0.75,
      s"two-level disagreement $nDisagree/$n exceeds the pinned 75% sanity ceiling")
  }
}
