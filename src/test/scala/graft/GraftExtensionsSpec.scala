package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The cluster-deployment registration path: a session built with
 * `spark.sql.extensions=graft.GraftExtensions` must expose every custom
 * expression from SQL text with NO per-session `GraftFunctions.register`
 * call — and produce bit-identical results to the session-registered path.
 */
class GraftExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("extensions-injected session evaluates all custom functions from SQL") {
    spark // force the shared fixture session (and its SparkContext) up first
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf resolved from the
      // SparkContext at context creation — the shared test context
      // predates it, so exercise the same class through the builder's
      // extensions hook (what the conf resolves to on a real cluster)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()

      val row = s2.sql(
        """SELECT
          |  farm_fingerprint('abc') AS fp,
          |  shingle_set('a b c d', 3) AS sh,
          |  sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS isz,
          |  dot_f64(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |  affine_minhash(array(7L, 11L), array(3L, 5L), array(1L, 2L)) AS mh,
          |  winnow_fp('abcdefgh', 3, 2) AS wf,
          |  greedy_pair_count('abab', array(203423842L)) AS gp
          |""".stripMargin + "FROM range(1)").collect().head

      // same value the golden-tested kernel produces (FarmHashSpec vectors)
      assert(row.getLong(0) == graft.functions.FarmHash.fingerprint64(
        "abc".getBytes("UTF-8")))
      assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
      assert(row.getLong(2) == 2L)
      assert(row.getDouble(3) == 11.0)
      // min(7*3+1, 11*3+1)=22; min(7*5+2, 11*5+2)=37
      assert(row.getSeq[Long](4) == Seq(22L, 37L))
      assert(row.getSeq[Long](5).nonEmpty)
      // key('a','b') = (97 << 21) | 98 = 203423842; 'abab' -> ab|ab
      assert(row.getLong(6) == 2L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
