package graft.queries

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Direct semantics tests for the curation operators: the components
 * fixpoint on adversarial graph shapes (the DuckDB oracle only sees the
 * dup graphs the corpus happens to contain), and the determinism of the
 * stratified sample.
 */
class CurationSpec extends AnyFunSuite with SparkFixture {

  private def components(nodes: Seq[Long], edges: Seq[(Long, Long)],
      edgeCollectCap: Long = 0L): Map[Long, Long] = {
    // cap 0 forces the distributed propagation path; tests cover the
    // driver union-find fast path separately
    val docs = spark.createDataFrame(nodes.map(Tuple1(_))).toDF("doc_id")
    val pairs = if (edges.isEmpty)
      spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("da", "db")
    else spark.createDataFrame(edges).toDF("da", "db")
    Curation.connectedComponents(docs, pairs, edgeCollectCap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents: chain needs multi-hop propagation") {
    // 5-4-3-2-1 chain: min label must travel 4 hops
    val got = components(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("connectedComponents: separate clusters and singletons stay apart") {
    val got = components(Seq(1L, 2L, 3L, 10L, 11L, 99L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("connectedComponents: empty edge set is the identity labelling") {
    val got = components(Seq(7L, 8L), Seq.empty)
    assert(got == Map(7L -> 7L, 8L -> 8L))
  }

  test("reliable-checkpoint rounds (cluster setting) agree with localCheckpoint rounds") {
    // the multi-executor setting: fault-tolerant checkpoint() per round
    // instead of executor-memory localCheckpoint. Algorithm identical.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val hadCkpt = spark.sparkContext.getCheckpointDir
    spark.conf.set("spark.graft.components.reliableCheckpoint", "true")
    try {
      // misconfiguration must fail fast, not corrupt rounds
      spark.sparkContext.setCheckpointDir(null.asInstanceOf[String])
      val noDir = intercept[IllegalArgumentException] {
        components(Seq(1L, 2L), Seq((1L, 2L)))
      }
      assert(noDir.getMessage.contains("setCheckpointDir"))
      spark.sparkContext.setCheckpointDir(dir)
      val got = components(Seq(1L, 2L, 3L, 4L, 5L, 9L),
        Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)))
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 9L -> 9L))
      // the checkpoint files actually landed under the reliable dir
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() > 0)
    } finally {
      spark.conf.unset("spark.graft.components.reliableCheckpoint")
      spark.sparkContext.setCheckpointDir(hadCkpt.orNull)
    }
  }

  test("1000-node chain (diameter >> propagation budget) solves via the star-contraction fallback") {
    // per-hop propagation would need ~999 rounds; the automatic
    // star-contraction fallback must solve it in O(log n) WITHOUT the
    // old non-convergence IllegalStateException
    val n = 1000L
    val nodes = 1L to n
    val edges = (1L until n).map(i => (i, i + 1))
    val got = components(nodes, edges, edgeCollectCap = 0L)
    assert(got.size == n.toInt)
    assert(got.values.forall(_ == 1L), s"split labels: ${got.filter(_._2 != 1L).take(5)}")
  }

  test("starContractionComponents: direct — chains, cliques, singletons, empty") {
    def star(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val docs = spark.createDataFrame(nodes.map(Tuple1(_))).toDF("doc_id")
      val pairs = if (edges.isEmpty)
        spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("u", "v")
      else spark.createDataFrame(edges).toDF("u", "v")
      Curation.starContractionComponents(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // chain out of id order + triangle + duplicate/self/reversed edges
    val got = star(1L to 12L,
      Seq((9L, 8L), (8L, 7L), (7L, 6L), (6L, 5L), // chain 5..9
        (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 1L), // triangle w/ noise
        (11L, 12L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 5L,
      10L -> 10L, 11L -> 11L, 12L -> 11L), s"got $got")
    assert(star(Seq(3L, 4L), Seq.empty) == Map(3L -> 3L, 4L -> 4L))
  }

  test("driver union-find fast path agrees with the distributed path") {
    val nodes = (1L to 40L)
    val edges = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L), // chain
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (30L, 20L)) // out-of-order pair
    val dist = components(nodes, edges, edgeCollectCap = 0L)
    val fast = components(nodes, edges, edgeCollectCap = 1000L)
    assert(fast == dist)
    assert(fast(5L) == 1L && fast(12L) == 10L && fast(30L) == 20L && fast(39L) == 39L)
  }

  test("dedupComponents output is consistent with the pair query") {
    val sfDir = "/root/testdata/sf0.001"
    val comp = Curation.dedupComponents(spark, sfDir)
    // every pair partner must share a component with its mate
    val pairs = Dedup.dedupJaccardWords(spark, sfDir).select("da", "db")
    val labels = comp.select(col("doc_id"), col("comp_id"))
    val mism = pairs
      .join(labels.withColumnRenamed("doc_id", "da").withColumnRenamed("comp_id", "ca"), "da")
      .join(labels.withColumnRenamed("doc_id", "db").withColumnRenamed("comp_id", "cb"), "db")
      .filter(col("ca") =!= col("cb")).count()
    assert(mism == 0)
    // canonical docs are exactly the per-component minima
    val bad = comp.groupBy(col("comp_id"))
      .agg(min(col("doc_id")).as("mn"))
      .filter(col("comp_id") =!= col("mn")).count()
    assert(bad == 0)
  }

  test("sampleStratified is deterministic and respects stratum rates loosely") {
    val sfDir = "/root/testdata/sf0.001"
    val a = Curation.sampleStratified(spark, sfDir).collect().toSeq
    val b = Curation.sampleStratified(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("dedupGraphPagerank: the bridge doc out-ranks leaves; 3-round fixpoint matches by hand") {
    import spark.implicits._
    val dir = tmpSfDir()
    // path graph 0–1–2 (J(0,1)=J(1,2)=9/11≥0.8, J(0,2)=8/12<0.8) + singleton 3
    val base = (1 to 10).map(i => s"w$i")
    val rows = Seq(
      (0L, base.mkString(" "), "en", "s0"),
      (1L, (base.take(9) :+ "x").mkString(" "), "en", "s0"),
      (2L, (base.take(8) ++ Seq("x", "y")).mkString(" "), "en", "s0"),
      (3L, "lonely words here", "en", "s1"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b0 = 0.15 / 4.0
    // replicate the engine arithmetic: 14-dp terms, exact-decimal sum,
    // 12-dp round per iteration
    def leaf(rb: Double): Double = rnd(b0 + 0.85 * rnd(rb / 2.0, 14), 12)
    def mid(ra: Double, rc: Double): Double = rnd(b0 + 0.85 *
      (BigDecimal(rnd(ra / 1.0, 14)) + BigDecimal(rnd(rc / 1.0, 14))).toDouble, 12)
    var (ra, rb, rc) = (0.25, 0.25, 0.25)
    for (_ <- 1 to 3) {
      val (na, nb, nc) = (leaf(rb), mid(ra, rc), leaf(rb))
      ra = na; rb = nb; rc = nc
    }
    val out = Curation.dedupGraphPagerank(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, rb), (0L, 1L, ra), (2L, 1L, rc)),
      s"got ${out.toSeq}; expected center ${rb}, leaves ${ra}")
  }
}
