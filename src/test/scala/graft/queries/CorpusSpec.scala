package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Semantic cases for the corpus-preparation operators that the driver
  * fixtures can't pin down: keep-first segment dedup with reassembly,
  * permutation/shard invariants of the global shuffle, decontamination
  * flagging, order statistics, per-source sampling bounds, and
  * quantization edge vectors. */
class CorpusSpec extends AnyFunSuite with SparkFixture {

  // 8-token segments (Corpus.SegTokens); craft docs around that unit.
  private val seg1 = "a b c d e f g h"           // segment shared by docs
  private val seg2 = "i j k l m n o p"
  private val seg3 = "q r s t u v w x"

  private def corpusDir(): String = {
    import spark.implicits._
    val dir = tmpSfDir()
    val d0 = s"$seg1 $seg2"       // doc 0: two segments, first occurrence
    val d1 = s"$seg1 $seg3"       // doc 1: seg1 is a dup, seg3 survives
    val d2 = seg1                 // doc 2: entirely duplicated → no text
    val d3 = "short tail"         // doc 3: single partial segment
    val rows = Seq(
      (0L, d0, "en", "s0", d0.length.toLong),
      (1L, d1, "en", "s0", d1.length.toLong),
      (2L, d2, "en", "s1", d2.length.toLong),
      (3L, d3, "de", "s1", d3.length.toLong))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir.toString
  }

  test("textSegDedup keeps first occurrence corpus-wide and reassembles in order") {
    val dir = corpusDir()
    val rows = Corpus.textSegDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows(0L) == ((2L, 2L, s"$seg1 $seg2")), "doc 0 owns both its segments")
    assert(rows(1L) == ((2L, 1L, seg3)), "doc 1 loses the shared segment, keeps its own")
    assert(rows(2L)._2 == 0L && rows(2L)._3 == null,
      "a fully-duplicated doc keeps zero segments and gets NULL text")
    assert(rows(3L) == ((1L, 1L, "short tail")), "a sub-segment doc is its own segment")
  }

  test("shuffleOrder emits a permutation with balanced round-robin shards") {
    val dir = corpusDir()
    val rows = Corpus.shuffleOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == (1L to 4L), "pos must be a 1..N permutation")
    assert(rows.map(_._2).toSet == Set(0L, 1L, 2L, 3L), "every doc appears once")
    assert(rows.forall { case (pos, _, shard) => shard == (pos - 1) % 8 },
      "shard is round-robin in shuffle order")
    val again = Corpus.shuffleOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq,
      "the shuffle is reproducible across runs")
  }

  test("decontamOverlap flags a training doc copied from the benchmark, not an unrelated one") {
    import spark.implicits._
    val dir = tmpSfDir()
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val copied = s"intro words $bench trailing words here now"
    val clean = "nothing in common with the held out benchmark rows at all"
    val rows = Seq(
      (0L, bench, "en", "src0", bench.length.toLong),   // the benchmark source
      (1L, copied, "en", "src1", copied.length.toLong), // contains benchmark 5-grams
      (2L, clean, "en", "src1", clean.length.toLong))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.decontamOverlap(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out.keySet == Set(1L, 2L), "every non-benchmark doc is reported")
    assert(out(1L)._1 > 0 && out(1L)._2, "the copied doc overlaps and is flagged")
    assert(out(2L) == ((0L, false)), "the clean doc has zero hits and is not flagged")
  }

  test("statsLengthPctl returns the exact order statistics") {
    import spark.implicits._
    val dir = tmpSfDir()
    // lengths 10,20,...,1000: pctl p → value 10 * ceil(100p/100)
    val rows = (1 to 100).map(i => (i.toLong, "x", "en", "s0", (i * 10).toLong))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.statsLengthPctl(spark, dir.toString).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(25 -> 250L, 50 -> 500L, 75 -> 750L, 90 -> 900L, 99 -> 990L))
  }

  test("samplePerSourceTopn keeps at most N per source, deterministically") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = (0 until 300).map(i => (i.toLong, "x", "en", s"s${i % 3}", 1L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.samplePerSourceTopn(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = out.groupBy(_._1)
    assert(bySource.keySet == Set("s0", "s1", "s2"))
    assert(bySource.values.forall(_.length <= 10), "never more than N per source")
    assert(bySource.values.forall(g => g.map(_._3).sorted.toSeq == (1L to g.length)),
      "ranks are dense 1..k per source")
    val again = Corpus.samplePerSourceTopn(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq.sorted == again.toSeq.sorted, "sample is reproducible")
  }

  test("dedupClusterSizes histograms bow-fingerprint clusters, counting permuted copies") {
    import spark.implicits._
    val dir = tmpSfDir()
    val a = "alpha beta gamma"
    val aPerm = "gamma alpha beta"        // same word set → same cluster
    val b = "delta epsilon"
    val rows = Seq(
      (0L, a, "en", "s0", 1L), (1L, aPerm, "en", "s0", 1L), (2L, a, "en", "s1", 1L),
      (3L, b, "en", "s0", 1L), (4L, b, "en", "s1", 1L),
      (5L, "unique words here", "en", "s0", 1L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.dedupClusterSizes(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)),
      s"expected one singleton, one pair, one triple; got $out")
  }

  test("mixTokenBudget fills the budget exactly in deterministic order and stays under it") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 100 docs at 90% keep + 100 at the 15% default, 300 tokens each —
    // the 20k budget binds, and cum sums are multiples of 300
    val text300 = (1 to 300).map(i => s"w$i").mkString(" ")
    val rows = (0 until 100).map(i => (i.toLong, text300, "en", "src0", 1L)) ++
      (100 until 200).map(i => (i.toLong, text300, "en", "other", 1L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.mixTokenBudget(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = out.map(_._3).sum
    assert(total == (20000L / 300) * 300,
      s"the budget must fill to the last whole doc (19800); got $total in $out")
    val again = Corpus.mixTokenBudget(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq.sorted == again.toSeq.sorted, "the fill is reproducible")
  }

  test("HLL sketch: approx_count_distinct tracks the exact vocabulary within its rsd") {
    import org.apache.spark.sql.functions._
    // the sketch path for the tf-idf/vocab family at 100 TB: one pass, no
    // exact distinct shuffle — verify the error envelope on real fixtures
    val terms = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(Text.words(col("text"))).as("term"))
    val row = terms.agg(
      countDistinct(col("term")).as("exact"),
      approx_count_distinct(col("term"), 0.02).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"sketch estimate $approx drifted >5% from exact $exact")
  }

  test("embedQuantize handles a zero vector with NULL accounting and counts saturation") {
    import spark.implicits._
    val dir = tmpSfDir()
    val unit = Array.fill(4)(1.0f)               // every dim saturates at ±127
    val zero = Array.fill(4)(0.0f)               // failed-encoder guard path
    val mixed = Array(1.0f, 0.5f, 0.0f, -1.0f)   // one exact zero, two saturated
    writeTable(dir, "embeddings", Seq(
      (0L, unit, 0), (1L, zero, 0), (2L, mixed, 1))
      .toDF("vec_id", "embedding", "label"))
    val out = Similarity.embedQuantize(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(3) == 0 && out(0L).getLong(4) == 4,
      "all-ones vector saturates every dim")
    assert(out(0L).getDouble(5) == 0.0,
      "±maxabs reconstructs exactly (to 6 dp)")
    assert(out(1L).isNullAt(3) && out(1L).isNullAt(4) && out(1L).isNullAt(5),
      "zero vector gets NULL accounting, not a division error")
    assert(out(2L).getLong(3) == 1 && out(2L).getLong(4) == 2,
      "mixed vector counts one zero and two saturated dims")
  }

  test("mixAnneal: pretrain splits by sqrt mass, anneal goes only to rule-passing mass") {
    import spark.implicits._
    val dir = tmpSfDir()
    // s0's doc passes the full Gopher battery (50 words incl. 2 stopwords,
    // 4-char mean length, no symbols/digits); s1's doc fails word count.
    val pass = (Seq.fill(48)("word") ++ Seq("the", "of")).mkString(" ")
    val rows = Seq(
      (0L, pass, "en", "s0", 400L),
      (1L, "too short the of", "en", "s1", 100L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.mixAnneal(spark, dir.toString).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // w_pre: √400=20, √100=10 → pretrain 900000·20/30, 900000·10/30;
    // anneal mass: only s0's 400 chars pass → s0 takes the whole 100000.
    assert(out("s0") == ((400L, 400L, 20L, 600000L, 100000L, 700000L)))
    assert(out("s1") == ((100L, 0L, 10L, 300000L, 0L, 300000L)))
  }

  test("tokCharCoverage: rank/cumulative ppm; a char past the 99.95% knee is not needed") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 4000 'a' + one 'b' → coverage before 'b' = 4000/4001 = 99.975% ≥
    // 99.95% → 'b' is outside the alphabet the tokenizer needs
    val rows = Seq(
      (0L, "a" * 4000, "en", "s0", 4000L),
      (1L, "b", "en", "s0", 1L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Text.tokCharCoverage(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "a", 4000L, 999750L, true),
      (2L, "b", 1L, 1000000L, false)),
      s"got ${out.toSeq}")
  }

  test("corpusSimpsonDiversity: head-heavy slice concentrates; all-distinct slice maxes diversity; singletons NULL") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, "a a a b", "en", "s0", 7L),   // λ = 6/12 = 0.5 → effective 2
      (1L, "a b c d", "en", "s1", 7L),   // λ = 0 → diversity 1, effective NULL
      (2L, "x", "en", "s2", 1L),         // N=1 → λ NULL
      (3L, "", "en", "s3", 0L))          // no tokens → source absent
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.corpusSimpsonDiversity(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(out.toSeq == Seq(
      ("s0", 4L, 2L, Some(0.5), Some(0.5), Some(2.0)),
      ("s1", 4L, 4L, Some(0.0), Some(1.0), None),
      ("s2", 1L, 1L, None, None, None)),
      s"got ${out.toSeq}")
  }

  test("statsPercentileCont: PERCENTILE_CONT lerp on a 5-value fixture; NULLs out") {
    import spark.implicits._
    val dir = tmpSfDir()
    // lengths 10,20,30,40,50 → h=(n−1)·p over ranks 1..5
    val rows = Seq(
      (0L, "t", "en", "s0", Some(10L)), (1L, "t", "en", "s0", Some(20L)),
      (2L, "t", "en", "s0", Some(30L)), (3L, "t", "en", "s0", Some(40L)),
      (4L, "t", "en", "s0", Some(50L)),
      (5L, "t", "en", "s0", Option.empty[Long])) // NULL length: excluded
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Corpus.statsPercentileCont(spark, dir.toString).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0.25, 20L, 20L, 20.0),       // h=1.0 → exact rank 2
      (0.5, 30L, 30L, 30.0),        // h=2.0 → exact rank 3
      (0.75, 40L, 40L, 40.0),       // h=3.0 → exact rank 4
      (0.9, 40L, 50L, 46.0),        // h=3.6 → lerp(40, 50, .6)
      (0.99, 40L, 50L, 49.6)),      // h=3.96 → lerp(40, 50, .96)
      s"got ${out.toSeq}")
  }
}
