package graft.queries

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Semantic cases for the corpus-governance family that the driver
  * fixtures can't pin down: normalization collapse classes (case, digits,
  * punctuation, whitespace), all-occurrence boilerplate removal vs
  * keep-first seg-dedup, overlap-matrix Jaccard arithmetic, and the
  * exact-quota contract of the stratified split. */
class GovernanceSpec extends AnyFunSuite with SparkFixture {

  // ---------------------------------------------------------------- norm

  private def normDir(): String = {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      // docs 0–3 are one normalization class: case, digit runs, punctuation
      (0L, "Hello World 2024", "en", "web"),
      (1L, "hello world 7", "en", "cc"),
      (2L, "HELLO, world... 123456", "en", "web"),
      (3L, "hello   world   0", "en", "books"),
      (4L, "hello worlds 0", "en", "web"),   // different content — own class
      (5L, "!!! ...", "en", "web"),          // normalizes to '' — not clustered
      (6L, "???", "en", "cc"),               // normalizes to '' — not clustered
      (7L, null.asInstanceOf[String], "en", "web")) // failed extraction
      .map { case (id, t, l, s) =>
        (id, t, l, s, Option(t).map(_.length.toLong).getOrElse(0L))
      }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir.toString
  }

  test("dedupNormExact clusters case/digit/punct variants, keeps the lowest doc_id") {
    val rows = Governance.dedupNormExact(spark, normDir()).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2), r.getBoolean(3)))
      .toMap
    val fp0 = rows(0L)._1
    assert(fp0.nonEmpty, "a normalizable doc gets a fingerprint")
    (1L to 3L).foreach { id =>
      assert(rows(id)._1 == fp0, s"doc $id normalizes into doc 0's class")
    }
    assert(rows(0L) == ((fp0, 4L, true)), "lowest doc_id is canonical")
    (1L to 3L).foreach(id => assert(!rows(id)._3, s"doc $id is a duplicate"))
    assert(rows(4L)._1 != fp0 && rows(4L)._2 == 1L && rows(4L)._3,
      "different content stays its own cluster")
    Seq(5L, 6L, 7L).foreach { id =>
      assert(rows(id) == ((None, 1L, true)),
        s"doc $id (empty-norm or NULL) is unclustered with NULL fp")
    }
  }

  // ---------------------------------------------------------- boilerplate

  private val segA = "a b c d e f g h" // appears in 3 docs → boilerplate
  private val segB = "i j k l m n o p" // appears in 2 docs → kept
  private val segC = "q r s t u v w x" // unique

  private def boilerDir(): String = {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, s"$segA $segB", "en", "s0"),
      (1L, s"$segA $segC", "en", "s0"),
      (2L, s"$segA $segB", "en", "s1"),
      (3L, segA, "en", "s1")) // entirely boilerplate → NULL text
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir.toString
  }

  test("textBoilerplate drops EVERY occurrence of a df>=3 segment, keeps df<3") {
    val rows = Governance.textBoilerplate(spark, boilerDir()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rows(0L) == ((2L, 1L, segB)), "doc 0 loses the boilerplate, keeps segB")
    assert(rows(1L) == ((2L, 1L, segC)), "doc 1 loses the boilerplate, keeps segC")
    assert(rows(2L) == ((2L, 1L, segB)), "doc 2 keeps its df=2 segment — unlike keep-first dedup")
    assert(rows(3L) == ((1L, 1L, null)), "an all-boilerplate doc reassembles to NULL")
  }

  // ------------------------------------------------------- overlap matrix

  test("corpusSourceOverlap computes Jaccard over distinct shingles per source pair") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 5-token docs → one DecontamShingle(=5)-gram each; srcX ∩ srcY = {d1},
    // srcX has {d1, d2}, srcY has {d1}; srcZ shares nothing.
    val d1 = "alpha beta gamma delta epsilon"
    val d2 = "one two three four five"
    val d3 = "zeta eta theta iota kappa"
    val rows = Seq(
      (0L, d1, "en", "srcX"), (1L, d2, "en", "srcX"),
      (2L, d1, "en", "srcY"), (3L, d1, "en", "srcY"), // dup within source — distinct shingles
      (4L, d3, "en", "srcZ"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.corpusSourceOverlap(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.keySet == Set(("srcX", "srcY")), "only overlapping pairs appear")
    assert(out(("srcX", "srcY")) == ((2L, 1L, 1L, 0.5)),
      "|X|=2, |Y|=1, inter=1 → Jaccard 1/(2+1-1) = 0.5")
  }

  // -------------------------------------------------------- exact split

  test("splitStratifiedExact hits exact 80/10/10 quotas per stratum and is deterministic") {
    import spark.implicits._
    val dir = tmpSfDir()
    // two strata: 20 docs in s0, 10 in s1
    val rows = (0L until 30L).map { id =>
      val src = if (id < 20) "s0" else "s1"
      (id, s"doc $id body", "en", src, 10L)
    }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.splitStratifiedExact(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.length == 30)
    val bySrc = out.groupBy(_._2)
    assert(bySrc("s0").count(_._5 == "train") == 16 &&
      bySrc("s0").count(_._5 == "val") == 2 && bySrc("s0").count(_._5 == "test") == 2,
      "20-doc stratum splits exactly 16/2/2")
    assert(bySrc("s1").count(_._5 == "train") == 8 &&
      bySrc("s1").count(_._5 == "val") == 1 && bySrc("s1").count(_._5 == "test") == 1,
      "10-doc stratum splits exactly 8/1/1")
    bySrc.foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length), "ranks are a per-stratum permutation")
    }
    val again = Governance.splitStratifiedExact(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    assert(out.map(r => (r._1, r._5)).sortBy(_._1).toSeq == again.sortBy(_._1).toSeq,
      "the split is reproducible across runs")
  }

  // ------------------------------------------------- method agreement

  test("dedupMethodAgreement separates norm-only, bow-only, and both-method duplicates") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, "the quick brown fox", "en", "s0"),  // canonical under both
      (1L, "the quick brown fox", "en", "s0"),  // exact copy → both methods flag
      (2L, "The QUICK brown fox!", "en", "s0"), // case/punct variant → norm flags, bow does NOT (case-sensitive words)
      (3L, "fox brown quick the", "en", "s0"),  // permutation → bow flags, norm does NOT
      (4L, "something else", "en", "s1"))       // unique
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.dedupMethodAgreement(spark, dir.toString).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("s0") == ((4L, 2L, 2L, 1L, 3L)),
      "norm flags {1,2}, bow flags {1,3}, both {1}, either {1,2,3}")
    assert(out("s1") == ((1L, 0L, 0L, 0L, 0L)))
  }

  // ---------------------------------------------------------- BPE trainer

  test("bpeTrainMerges learns iterative merges with greedy overlap and stops when exhausted") {
    import spark.implicits._
    val dir = tmpSfDir()
    // hand-computable dictionary: ab×5, abc×3, aaa×2
    //  r1: (a,b)=8 beats (a,a)=4, (b,c)=3          → ab
    //  r2: (a,a)=4 beats (ab,c)=3                  → aa, and greedy overlap
    //      turns [a,a,a] into [aa,a] (NOT [aa,a,a])
    //  r3: (ab,c)=3 — a SECOND-GENERATION merge consuming r1's symbol → abc
    //  r4: (aa,a)=2 → aaa; then no pairs remain — early stop at 4 < 8 rows
    val rows = Seq(
      (0L, "ab ab ab ab ab", "en", "s0"),
      (1L, "abc abc abc", "en", "s0"),
      (2L, "aaa aaa", "en", "s1"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Text.bpeTrainMerges(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a", "b", "ab", 8L),
      (2L, "a", "a", "aa", 4L),
      (3L, "ab", "c", "abc", 3L),
      (4L, "aa", "a", "aaa", 2L)))
  }

  // ---------------------------------------------------- PQ codes

  test("embedPqAssign encodes each subspace independently with smaller-code ties") {
    import spark.implicits._
    val dir = tmpSfDir()
    def vec(hot: Int*): Array[Float] = {
      val v = Array.fill(64)(0f); hot.foreach(v(_) = 1f); v
    }
    // centroid 0 is hot in subspace 0 (dim 0), centroid 1 in subspace 1
    // (dim 8); member 8 = c0+c1 must take code 0 in subspace 0 and code 1
    // in subspace 1 — no single whole-vector centroid matches it
    val rows = Seq(
      (0L, vec(0), 0), (1L, vec(8), 0),
      (8L, vec(0, 8), 1), (9L, vec(), 1)) // 9 = zero vector (failed encoder)
    writeTable(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    writeTable(dir, "documents",
      Seq((0L, "x", "en", "s0", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Similarity.embedPqAssign(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out((8L, 0L)) == ((0L, 0.0)), "subspace 0 → centroid 0's slice, zero error")
    assert(out((8L, 1L)) == ((1L, 0.0)), "subspace 1 → centroid 1's slice, zero error")
    (2L to 7L).foreach { m =>
      assert(out((8L, m)) == ((0L, 0.0)), s"all-zero subspace $m ties to the smaller code")
    }
    assert(out((9L, 0L)) == ((1L, 0.0)),
      "zero vector matches c1's all-zero subspace-0 slice exactly (c0 would cost its norm)")
    assert(out.keys.count(_._1 == 9L) == 8, "every member emits one row per subspace")
  }

  test("simPqAdcTopk ranks candidates by summed LUT distances over their codes") {
    import spark.implicits._
    val dir = tmpSfDir()
    def vec(hot: Int*): Array[Float] = {
      val v = Array.fill(64)(0f); hot.foreach(v(_) = 1f); v
    }
    // centroid j is hot exactly in its own subspace (dim 8j); query = e0;
    // candidates sit exactly ON centroids 0..3 → est(c0)=0, est(c_k)=1 for
    // k>0 (one unit of query mass in subspace 0 — wait, c0 matches it;
    // the others pay their own subspace's unit) — ties break by vec_id.
    val cents = (0 until 8).map(j => (j.toLong, vec(8 * j), 0))
    val query = Seq((8L, vec(0), 1))
    val cands = (0 until 4).map(k => (18L + k, vec(8 * k), 1))
    writeTable(dir, "embeddings", (cents ++ query ++ cands).toDF("vec_id", "embedding", "label"))
    writeTable(dir, "documents",
      Seq((0L, "x", "en", "s0", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Similarity.simPqAdcTopk(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (8L, 1L, 18L, 0.0),   // exact code match — zero estimated distance
      (8L, 2L, 19L, 2.0),   // pays its own subspace's unit + the query's unmatched unit
      (8L, 3L, 20L, 2.0),
      (8L, 4L, 21L, 2.0)))
  }

  test("simPqRerankTopk fixes ADC quantization ties with exact distances") {
    import spark.implicits._
    val dir = tmpSfDir()
    def vecf(hot: Map[Int, Float]): Array[Float] = {
      val v = Array.fill(64)(0f); hot.foreach { case (i, x) => v(i) = x }; v
    }
    val cents = (0 until 8).map(j => (j.toLong, vecf(Map(8 * j -> 1f)), 0))
    val query = Seq((8L, vecf(Map(0 -> 1f)), 1))
    // both 18 and 19 quantize to ADC estimate 0 (codes hide their error);
    // exact distances differ: d²(q,19)=0.09 < d²(q,18)=0.16 — only the
    // re-rank pass can order them correctly
    val cands = Seq(
      (18L, vecf(Map(0 -> 1f, 8 -> 0.4f)), 1),
      (19L, vecf(Map(0 -> 0.7f)), 1),
      (20L, vecf(Map(8 -> 1f)), 1))
    writeTable(dir, "embeddings", (cents ++ query ++ cands).toDF("vec_id", "embedding", "label"))
    writeTable(dir, "documents",
      Seq((0L, "x", "en", "s0", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val adc = Similarity.simPqAdcTopk(spark, dir.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(adc.take(2).toSeq == Seq((1L, 18L), (2L, 19L)),
      "ADC ties 18/19 at estimate 0 and falls back to id order")
    val rr = Similarity.simPqRerankTopk(spark, dir.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rr.toSeq == Seq((1L, 19L, 0.09), (2L, 18L, 0.16), (3L, 20L, 2.0)),
      "the exact pass reorders the tied pair by true distance")
  }

  test("embedIvfPqAssign encodes residuals — exact where raw PQ pays quantization error") {
    import spark.implicits._
    val dir = tmpSfDir()
    def vecf(hot: Map[Int, Float]): Array[Float] = {
      val v = Array.fill(64)(0f); hot.foreach { case (i, x) => v(i) = x }; v
    }
    val cents = (0 until 8).map(j => (j.toLong, vecf(Map(8 * j -> 1f)), 0))
    // member 8 = 2·e0: nearest cell c0, residual = e0 — exactly a
    // sub-centroid slice, so IVFPQ reconstructs it with ZERO error while
    // raw PQ (embed_pq_assign) pays (2−1)² = 1 in subspace 0
    val member = Seq((8L, vecf(Map(0 -> 2f)), 1))
    writeTable(dir, "embeddings", (cents ++ member).toDF("vec_id", "embedding", "label"))
    writeTable(dir, "documents",
      Seq((0L, "x", "en", "s0", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val raw = Similarity.embedPqAssign(spark, dir.toString).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(raw(0L) == ((0L, 1.0)), "raw PQ: code 0 with one unit of quantization error")
    val ivfpq = Similarity.embedIvfPqAssign(spark, dir.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(ivfpq.forall(_._1 == 0L), "coarse cell is c0")
    val bySub = ivfpq.map(t => t._2 -> ((t._3, t._4))).toMap
    assert(bySub(0L) == ((0L, 0.0)), "residual e0 IS sub-centroid 0's slice — zero error")
    (1L to 7L).foreach(m => assert(bySub(m)._2 == 0.0, s"zero residual in subspace $m"))
  }

  // -------------------------------------------------- dedup funnel

  test("pipelineDedupReasons attributes exact-stage drops before near-stage drops") {
    import spark.implicits._
    val dir = tmpSfDir()
    val base = "spark makes big data processing fast scalable reliable for everyone working daily"
    val near = "spark makes big data processing fast scalable reliable for everyone working nightly"
    val rows = Seq(
      (0L, base, "en", "s0"),
      (1L, base.toUpperCase, "en", "s0"),  // case variant → EXACT stage drops it
      (2L, near, "en", "s1"),              // near-dup of 0 → NEAR stage drops it
      (3L, "totally different content about cooking pasta sauce", "en", "s1"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.queries.Dedup.pipelineDedupReasons(spark, dir.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("s0") == ((2L, 1L, 0L, 1L)), "doc 1 drops at the exact stage — never reaches near")
    assert(out("s1") == ((2L, 0L, 1L, 1L)), "doc 2 drops at the near stage, doc 3 is kept")
  }

  // ------------------------------------------------- curriculum order

  test("curriculumOrder walks difficulty bands easy-first with intra-band shuffle") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 20 docs, lengths 1..20 tokens → deciles of 2 docs each
    val rows = (1 to 20).map { i =>
      val t = Seq.fill(i)("w").mkString(" ")
      (i.toLong, t, "en", "s0", t.length.toLong)
    } :+ (99L, "", "en", "s0", 0L) // empty doc — excluded
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.curriculumOrder(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 20, "the empty doc is excluded")
    assert(out.map(_._1).toSeq == (1L to 20L), "pos is a 1..N permutation in band order")
    // bands are non-decreasing along the curriculum and sized 2 each
    assert(out.sortBy(_._1).map(_._4).toSeq == out.sortBy(_._1).map(_._4).sorted.toSeq)
    assert(out.groupBy(_._4).forall(_._2.length == 2))
    // within a band, difficulty (n_tok) respects the band, position is md5-shuffled
    out.groupBy(_._4).foreach { case (band, rs) =>
      rs.foreach { r => assert((r._3 + 1) / 2 == band, s"n_tok ${r._3} in band $band") }
    }
    assert(out.forall(r => r._5 == (r._1 - 1) % 8), "shards are round-robin in curriculum order")
  }

  // ------------------------------------------------------- KS drift

  test("statsKsDrift computes the exact two-sample KS statistic per source") {
    import spark.implicits._
    val dir = tmpSfDir()
    // sA lengths {1,2,3,4}; sB lengths {3,4,5,6}.
    // For sA vs rest(=sB): F_A − F_B is largest at x=2: 2/4 − 0/4 = 0.5.
    val rows = (Seq(1L, 2L, 3L, 4L).map(("sA", _)) ++ Seq(3L, 4L, 5L, 6L).map(("sB", _)))
      .zipWithIndex.map { case ((src, len), i) => (i.toLong, s"doc $i", "en", src, len) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.statsKsDrift(spark, dir.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("sA") == ((4L, 4L, 0.5)) && out("sB") == ((4L, 4L, 0.5)),
      "both sources drift from each other with D = 0.5")
  }

  test("statsKsDrift is empty for a single-source corpus (no rest sample)") {
    import spark.implicits._
    val dir = tmpSfDir()
    writeTable(dir, "documents",
      Seq((0L, "a", "en", "only", 5L), (1L, "b", "en", "only", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(Governance.statsKsDrift(spark, dir.toString).collect().isEmpty)
  }

  // --------------------------------------------------- LSH precision

  test("dedupLshPrecision prices the candidate funnel: exact dup verifies at both stages") {
    import spark.implicits._
    val dir = tmpSfDir()
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val rows = Seq(
      (0L, base, "en", "s0"),
      (1L, base, "en", "s1"),                                  // exact copy — J = 1
      (2L, "completely unrelated words about cooking pasta tonight", "en", "s0"),
      (3L, "", "en", "s0"), (4L, "   ", "en", "s1"))           // zero-shingle docs — no signature
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.queries.Dedup.dedupLshPrecision(spark, dir.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("1_bucket", "2_agree"))
    assert(out("1_bucket") == ((1L, 1L, 1.0)),
      "only the (0,1) pair is proposed — empty docs never form a bucket pair")
    assert(out("2_agree") == ((1L, 1L, 1.0)), "the exact dup survives the agreement prefilter")
  }

  // ---------------------------------------------------------- Zipf fit

  test("corpusZipfFit recovers slope -1 with r2=1 on an exact power-law corpus") {
    import spark.implicits._
    val dir = tmpSfDir()
    // freq(rank r) = 12/r at ranks 1..4 — exactly ln f = ln 12 − ln r, so
    // the least-squares fit must return slope −1, intercept ln 12, R² 1
    // (up to the 8-dp term rounding).
    val freqs = Seq("w1" -> 12, "w2" -> 6, "w3" -> 4, "w4" -> 3)
    val text = freqs.flatMap { case (w, f) => Seq.fill(f)(w) }.mkString(" ")
    writeTable(dir, "documents",
      Seq((0L, text, "en", "s0", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Governance.corpusZipfFit(spark, dir.toString).collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-5, s"slope ${r.getDouble(1)} should be -1")
    assert(math.abs(r.getDouble(2) - math.log(12.0)) < 1e-5, "intercept should be ln 12")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-6, "R^2 should be 1")
  }

  test("corpusZipfFit yields NULL fit terms on a degenerate single-token corpus") {
    import spark.implicits._
    val dir = tmpSfDir()
    writeTable(dir, "documents",
      Seq((0L, "only only only", "en", "s0", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Governance.corpusZipfFit(spark, dir.toString).collect().head
    assert(r.getLong(0) == 1L && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
      "a 1-point fit has no defined slope — NULL, not a division error")
  }

  // ---------------------------------------------------------- diversity

  test("textDistinctNgrams reports type/token and bigram-diversity ratios") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, "a b a b", "en", "rep"),   // 4 tokens, 2 types; bigrams: ab, ba, ab → 3 total, 2 distinct
      (1L, "x", "en", "tiny"))        // 1 token, no bigrams
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.textDistinctNgrams(spark, dir.toString).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("rep") == ((4L, 2L, 0.5, 3L, 2L)))
    assert(out("tiny")._1 == 1L && out("tiny")._4 == 0L, "a 1-token source has zero bigrams")
  }

  // ---------------------------------------------------------------- gini

  test("statsGini: equal lengths → 0, [1,3] → 0.25, singleton → 0, ties collapse") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, "eq", 5L), (1L, "eq", 5L), (2L, "eq", 5L),     // perfectly even
      (3L, "uneq", 1L), (4L, "uneq", 3L),                  // G = |1-3|·2/(2·n²·μ) = 0.25
      (5L, "single", 7L),                                  // n=1 → 0 by convention
      (6L, "skew", 1L), (7L, "skew", 1L), (8L, "skew", 98L)) // near-total concentration
      .map { case (id, s, n) => (id, "x", "en", s, n) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.statsGini(spark, dir.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("eq") == ((3L, 15L, 0.0)))
    assert(out("uneq") == ((2L, 4L, 0.25)))
    assert(out("single") == ((1L, 7L, 0.0)))
    // skew: sorted [1,1,98]; 2Σi·x = 2(1·1+2·1+3·98) = 594;
    // G = 594/(3·100) − 4/3 = 1.98 − 1.333333… = 0.646667
    assert(out("skew") == ((3L, 100L, 0.646667)))
  }

  // ----------------------------------------------------- unique budget

  test("mixUniqueBudget weights by canonical mass only — a mirrored source loses its double count") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      // 'mirror': the same content three times (one cluster) — unique = 400 of 1200
      (0L, "same old content", "en", "mirror", 400L),
      (1L, "Same  OLD content", "en", "mirror", 400L),
      (2L, "SAME OLD CONTENT!", "en", "mirror", 400L),
      // 'fresh': one unique doc of 400 — same unique mass as mirror
      (3L, "completely new words", "en", "fresh", 400L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.mixUniqueBudget(spark, dir.toString).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    // both sources: unique 400 → w = 20 each → equal 500000-char targets,
    // even though 'mirror' has 3× the raw mass
    assert(out("mirror") == ((1200L, 400L, 0.666667, 20L, 500000L)))
    assert(out("fresh") == ((400L, 400L, 0.0, 20L, 500000L)))
  }

  // ----------------------------------------------------------- entropy

  test("statsEntropy: uniform two-type source hits ln2 at efficiency 1; single type → 0") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, "a b a b", "en", "uniform"),
      (1L, "x x x x", "en", "flat"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.statsEntropy(spark, dir.toString).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = out("uniform")
    assert(u.getLong(1) == 4 && u.getLong(2) == 2)
    assert(u.getDouble(3) == 0.693147 && u.getDouble(4) == 1.0,
      "two equiprobable types carry exactly ln 2 nats at full efficiency")
    val f = out("flat")
    assert(f.getDouble(3) == 0.0 && f.isNullAt(4),
      "one type carries zero information; efficiency is undefined, not 0/0")
  }

  // -------------------------------------------------------- burstiness

  test("statsBurstiness: a Poisson-ish background word sits at VMR ≈ spread, a bursty word ≫") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 'bg' appears once in each of 4 docs (tf = [1,1,1,1] → VMR = 0);
    // 'burst' appears 4 times in ONE doc (tf = [4,0,0,0] over N=4 docs).
    val rows = Seq(
      (0L, "bg burst burst burst burst", "en", "s0"),
      (1L, "bg x", "en", "s0"),
      (2L, "bg x", "en", "s0"),
      (3L, "bg x", "en", "s0"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.statsBurstiness(spark, dir.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // bg: μ = 1, E[x²] = 1 → VMR = 0 (deterministic, below Poisson — every doc exactly once)
    assert(out("bg") == ((4L, 4L, 1.0, 0.0)))
    // burst: μ = 1, E[x²] = 16/4 = 4 → VMR = (4 − 1)/1 = 3; burst_rate = 4/1
    assert(out("burst") == ((4L, 1L, 4.0, 3.0)))
  }

  // ---------------------------------------------------------- novelty

  test("corpusNovelty: the first source owns shared shingles; later batches report the overlap") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 5-token docs → one whole-doc shingle each (DecontamShingle = 5).
    val shared = "alpha beta gamma delta epsilon"
    val rows = Seq(
      (0L, shared, "en", "batch_a"),                       // a's shingle
      (1L, "one two three four five", "en", "batch_a"),    // a-only
      (2L, shared, "en", "batch_b"),                       // seen in a → not novel
      (3L, "six seven eight nine ten", "en", "batch_b"))   // b-novel
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.corpusNovelty(spark, dir.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("batch_a") == ((2L, 2L, 1.0)), "the first batch is all novel")
    assert(out("batch_b") == ((2L, 1L, 0.5)), "the repeat shingle counts against batch_b")
  }

  // ----------------------------------------------------------- heaps

  test("statsHeapsFit: vocabulary-growth curve is exact; growing vocab fits β > 0") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 10 tokens total → checkpoints at 1..10. First occurrences:
    // 'a'@1, then five new types at positions 6..10.
    val rows = Seq(
      (0L, "a a a a a", "en", "s0", 9L),
      (1L, "b c d e f", "en", "s0", 9L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.statsHeapsFit(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      (1L to 10L).map(k => (k, k, if (k <= 5) 1L else k - 4L)).toSeq,
      "V(n) steps up exactly at each new type's first-occurrence checkpoint")
    val betas = out.map(_._4).distinct
    assert(betas.length == 1 && betas.head > 0.0,
      "an open vocabulary fits a positive Heaps exponent, identical on every row")
    assert(out.head._5 > 0.0 && out.head._5 <= 1.0, "R² is a valid fit quality")
  }

  test("statsHeapsFit: a closed-vocabulary corpus fits β = 0") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq((0L, "a a a a a a a a a a", "en", "s0", 19L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.statsHeapsFit(spark, dir.toString).collect()
    assert(out.forall(_.getLong(2) == 1L), "the single type appears in the first tenth")
    assert(out.forall(_.getDouble(3) == 0.0), "flat V(n) → zero exponent")
    assert(out.forall(_.isNullAt(5)), "zero y-variance leaves R² undefined, not 0/0")
  }

  // ------------------------------------------------------ group split

  test("splitGroupAware keeps every member of a duplicate class in one split") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (10L, "Hello World 1", "en", "web"),   // one normalization class…
      (11L, "hello world 2", "en", "cc"),    // …split must not separate them
      (12L, "HELLO world 999", "en", "books"),
      (13L, "something else entirely", "en", "web"),
      (14L, null.asInstanceOf[String], "en", "web"),  // singleton group = own id
      (15L, "...", "en", "web"))                       // empty-norm singleton
      .map { case (id, t, l, s) =>
        (id, t, l, s, Option(t).map(_.length.toLong).getOrElse(0L))
      }
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.splitGroupAware(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val g10 = out(10L)
    assert(g10._1 == 10L && g10._2 == 3L, "lowest member id is the group key")
    Seq(11L, 12L).foreach { id =>
      assert(out(id) == g10, s"doc $id shares doc 10's group AND split")
    }
    Seq(13L, 14L, 15L).foreach { id =>
      assert(out(id)._1 == id && out(id)._2 == 1L, s"doc $id is a singleton group")
    }
    val buckets = Set("train", "val", "test")
    assert(out.values.forall(v => buckets.contains(v._3)))
  }

  // -------------------------------------------------------------- k-anon

  test("privacyKAnon: only under-k QI groups report; NULL metadata coalesces to sentinels") {
    import spark.implicits._
    val dir = tmpSfDir()
    // QI = (lang, source, floor(n_chars/100)); k = 5
    val rows =
      // 6 docs share (en, web, bucket 1) → AT k, suppressed from the audit
      (0L until 6L).map(i => (i, "t", Some("en"), Some("web"), Some(150L))) ++
      // 2 docs share (en, cc, bucket 0) → under k, risk 1/2
      Seq((10L, "t", Some("en"), Some("cc"), Some(10L)),
        (11L, "t", Some("en"), Some("cc"), Some(99L)),
        // singleton (fr, web, bucket 2) → under k, risk 1/1
        (12L, "t", Some("fr"), Some("web"), Some(250L)),
        // NULL metadata → sentinel QI ('', '', -1), 1 member
        (13L, "t", Option.empty[String], Option.empty[String], Option.empty[Long]))
    writeTable(dir, "documents",
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.privacyKAnon(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("", "", -1L, 1L, 1000000L),
      ("en", "cc", 0L, 2L, 500000L),
      ("fr", "web", 2L, 1L, 1000000L)),
      s"got ${out.toSeq}")
  }

  test("privacyLDiversity: homogeneous QI groups report whatever their size; diverse ones pass") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows =
      // (web, bucket 1): 6 docs, ALL 'en' → k-anonymous but l=1 → reported
      (0L until 6L).map(i => (i, "t", "en", "web", 150L)) ++
      // (cc, bucket 0): 2 docs, 'en'+'fr' → l=2 → passes
      Seq((10L, "t", "en", "cc", 10L), (11L, "t", "fr", "cc", 99L),
        // (books, bucket 0): singleton → l=1 → reported
        (12L, "t", "de", "books", 50L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Governance.privacyLDiversity(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("books", 0L, 1L, 1L),
      ("web", 1L, 6L, 1L)),
      s"got ${out.toSeq}")
  }

  test("statsKruskalWallis: textbook no-tie H on fully separated groups") {
    import spark.implicits._
    val dir = tmpSfDir()
    // A:{10,20} B:{30,40} C:{50,60} — ranks 1..6, no ties:
    // H = 12/(6·7)·(3²/2 + 7²/2 + 11²/2) − 3·7 = 32/7 = 4.571429
    val rows = Seq(
      (0L, "t", "en", "a", 10L), (1L, "t", "en", "a", 20L),
      (2L, "t", "en", "b", 30L), (3L, "t", "en", "b", 40L),
      (4L, "t", "en", "c", 50L), (5L, "t", "en", "c", 60L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Governance.statsKruskalWallis(spark, dir.toString).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 3L && r(0).getLong(1) == 6L)
    assert(r(0).getDouble(2) == 4.571429, s"got ${r(0).getDouble(2)}")
  }

  test("statsKruskalWallis: tie-corrected H via average ranks; NULL on constant values") {
    import spark.implicits._
    val dir = tmpSfDir()
    // A:{1,1} B:{1,2}: avg rank of the tied 1s is 2, of the 2 is 4.
    // Uncorrected H = 0.6, tie factor C = 1 − 24/60 = 0.6 → H = 1.0 —
    // the variance form produces the corrected value directly.
    val rows = Seq(
      (0L, "t", "en", "a", 1L), (1L, "t", "en", "a", 1L),
      (2L, "t", "en", "b", 1L), (3L, "t", "en", "b", 2L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Governance.statsKruskalWallis(spark, dir.toString).collect()
    assert(r.length == 1 && r(0).getDouble(2) == 1.0, s"got ${r(0)}")

    val dir2 = tmpSfDir()
    val const = Seq(
      (0L, "t", "en", "a", 5L), (1L, "t", "en", "b", 5L), (2L, "t", "en", "c", 5L))
    writeTable(dir2, "documents", const.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r2 = Governance.statsKruskalWallis(spark, dir2.toString).collect()
    assert(r2.length == 1 && r2(0).isNullAt(2),
      "constant pooled ranks have zero variance — H is NULL, not a division error")
  }

  test("statsDunnPosthoc: pairwise z from pooled mean ranks, no ties") {
    import spark.implicits._
    val dir = tmpSfDir()
    // A:{10,20} B:{30,40} C:{50,60} — mean ranks 1.5 / 3.5 / 5.5,
    // σ² = (6·7/12)·(1/2+1/2) = 3.5 for every pair
    val rows = Seq(
      (0L, "t", "en", "a", 10L), (1L, "t", "en", "a", 20L),
      (2L, "t", "en", "b", 30L), (3L, "t", "en", "b", 40L),
      (4L, "t", "en", "c", 50L), (5L, "t", "en", "c", 60L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    def rnd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val zNear = rnd(-2.0 / math.sqrt(3.5))
    val zFar = rnd(-4.0 / math.sqrt(3.5))
    val out = Governance.statsDunnPosthoc(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out == Map(
      ("a", "b") -> ((1.5, 3.5, zNear)),
      ("a", "c") -> ((1.5, 5.5, zFar)),
      ("b", "c") -> ((3.5, 5.5, zNear))), s"got $out")
  }

  test("statsDunnPosthoc: fully tied corpus has zero rank variance — z is NULL") {
    import spark.implicits._
    val dir = tmpSfDir()
    val rows = Seq(
      (0L, "t", "en", "a", 7L), (1L, "t", "en", "a", 7L),
      (2L, "t", "en", "b", 7L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Governance.statsDunnPosthoc(spark, dir.toString).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(4) == r(0).getDouble(5), "everyone shares the mean rank")
    assert(r(0).isNullAt(6), "σ² = 0 — NULL, not a division error")
  }
}
