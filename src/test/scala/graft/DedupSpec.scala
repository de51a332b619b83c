package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics tests for the near-dup operators on planted duplicates. */
class DedupSpec extends AnyFunSuite with SparkFixture {

  private def docsDir(): String = {
    import spark.implicits._
    val dir = tmpSfDir()
    // 16 distinct words; near-dup changes only the last word → word-set
    // jaccard 15/17≈0.88, 3-shingle jaccard 13/15≈0.87 (high band-collision
    // odds; the fixed hash constants make the outcome deterministic).
    val base = "spark makes big data processing fast scalable reliable for everyone working with huge datasets every day"
    val nearDup = "spark makes big data processing fast scalable reliable for everyone working with huge datasets every night"
    val unrelated = "completely different words about cooking pasta with tomato sauce basil"
    val rows = Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, nearDup, "en", "s0", nearDup.length.toLong),          // near-dup of 0
      (2L, base, "en", "s1", base.length.toLong),                // exact dup of 0
      (3L, unrelated, "en", "s0", unrelated.length.toLong),
      (4L, "tiny doc", "en", "s0", 8L))                          // < 3 words branch
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    dir.toString
  }

  test("minhash LSH finds exact and near duplicates, skips unrelated docs") {
    val dir = docsDir()
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), "exact dup must collide in every band")
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 2L)),
      s"near-dup should be caught by at least one band; got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("exact-dup pair has jaccard 1.0 in LSH output") {
    val dir = docsDir()
    val jac = Dedup.dedupMinhashLsh(spark, dir)
      .filter(col("da") === 0 && col("db") === 2)
      .select("jac").collect()
    assert(jac.length == 1 && jac.head.getDouble(0) == 1.0)
  }

  test("simhash: identical texts get identical signatures, disjoint texts differ") {
    val dir = docsDir()
    val sigs = Dedup.dedupSimhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(2L))
    assert(sigs(0L) != sigs(3L))
  }

  test("word jaccard emits the planted same-lang pairs above threshold") {
    val dir = docsDir()
    val rows = Dedup.dedupJaccardWords(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(rows((0L, 2L)) == 1.0)
    assert(rows.contains((0L, 1L)) && rows((0L, 1L)) >= 0.8)
    assert(!rows.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental dedup probes only the newest batch against the existing corpus") {
    // fixture sources: s0 = {0,1,3,4}, s1 = {2} → the batch is doc 2
    // (exact dup of doc 0, near-dup of doc 1); pairs must be
    // (new=2, old∈{0,1}) only — never old-vs-old pairs like (0,1)
    val dir = docsDir()
    val rows = Dedup.dedupIncrementalMd5(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.keySet.forall(_._1 == 2L), s"only the s1 batch may probe; got $rows")
    assert(rows((2L, 0L)) == 1.0, "exact dup of the existing doc must match at J=1")
    assert(!rows.contains((2L, 3L)) && !rows.contains((2L, 4L)))
  }

  test("wide dense path (vocab 65..4096): brute-force parity + codegen popcount in plan") {
    import spark.implicits._
    val dir = tmpSfDir()
    // 81 distinct words — past the 64-bit dense domain, inside the wide
    // mask domain. Planted: exact dup (a,c), near-dup (a,b) at J=19/21,
    // an unrelated doc, and a superset doc (J=20/80 with a — must NOT pair).
    val w = (0 to 80).map(i => s"w$i")
    val a = w.slice(0, 20).mkString(" ")
    val b = (w.slice(0, 19) :+ w(80)).mkString(" ")
    val d = w.slice(40, 60).mkString(" ")
    val e = w.mkString(" ")
    val rows = Seq(
      (0L, a, "en", "s0", a.length.toLong),
      (1L, b, "en", "s0", b.length.toLong),
      (2L, a, "en", "s1", a.length.toLong),
      (3L, d, "en", "s0", d.length.toLong),
      (4L, e, "en", "s0", e.length.toLong),
      (5L, a, "fr", "s0", a.length.toLong)) // same set, other lang: blocked
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))

    val df = Dedup.dedupJaccardWords(spark, dir.toString)
    assert(df.queryExecution.optimizedPlan.toString.contains("mask_intersect_bits"),
      "vocab in 65..4096 must take the wide dense path (codegen popcount verify)")
    val got = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap

    // brute-force oracle over the fixture
    val sets = rows.map { case (id, text, lang, _, _) =>
      (id, lang, text.split("\\s+").map(_.toLowerCase).toSet)
    }
    val want = (for {
      (ia, la, sa) <- sets; (ib, lb, sb) <- sets
      if ia < ib && la == lb
      inter = (sa & sb).size
      jac = inter.toDouble / (sa | sb).size
      if jac >= 0.8
    } yield ((ia, ib), (inter.toLong, jac))).toMap
    assert(got == want, s"wide-path pairs diverge from brute force:\n got=$got\n want=$want")
  }

  test("dense path HINTS broadcast only for narrow (lang, mask) rows — never member arrays") {
    // the members arrays collectively hold every doc_id in the corpus; an
    // EXPLICIT broadcast() hint carrying them would ship the corpus's ids
    // to the driver and every executor at ANY scale (the round-5 review
    // finding). The planner may still auto-broadcast the member side when
    // its measured size is tiny (as on this fixture) — that choice is
    // stats-driven and reverses itself at scale, so only the hint is
    // asserted. This fixture's ≤64-word vocabulary forces the dense path.
    val dir = docsDir()
    val df = Dedup.dedupJaccardWords(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join}
    val hinted = df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        def names(h: Option[HintInfo], side: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
          if (h.exists(_.strategy.exists(_.toString.contains("broadcast"))))
            Seq(side.output.map(_.name))
          else Nil
        names(j.hint.leftHint, j.left) ++ names(j.hint.rightHint, j.right)
    }.flatten
    assert(hinted.nonEmpty, "dense path should hint-broadcast the narrow mask side")
    hinted.foreach { cols =>
      assert(!cols.exists(c => c.contains("members") || c == "ma" || c == "mb"),
        s"hinted broadcast side must not carry member arrays, got: $cols")
    }
  }

  test("containment is directional: a quoted subset is found inside its " +
      "superset but not the reverse") {
    import spark.implicits._
    val dir = tmpSfDir()
    val quote = "the quick brown fox jumps over the lazy dog near the river bank today"
    val host = quote + " and then a very long additional report follows " +
      "with completely different content about quarterly numbers and " +
      "regional forecasts across many markets and several product lines " +
      "plus appendix tables listing vendors customers and open issues"
    val rows = Seq(
      (0L, quote, "en", "s0", quote.length.toLong),
      (1L, host, "en", "s0", host.length.toLong),
      (2L, "unrelated cooking text with pasta tomato and basil sauce recipes",
        "en", "s1", 64L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Dedup.dedupContainment(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // quote ⊂ host: every 3-shingle of doc 0 appears in doc 1
    assert(got.exists { case (in, out, c) => in == 0L && out == 1L && c == 1.0 },
      s"missing subset pair, got ${got.toSeq}")
    // the reverse direction is far below threshold, and the unrelated doc
    // pairs with nothing
    assert(!got.exists { case (in, _, _) => in == 1L || in == 2L },
      s"unexpected containment rows: ${got.toSeq}")
  }

  test("dedupThresholdSweep: every candidate cut appears, zero-pair cuts read 0") {
    import spark.implicits._
    val dir = tmpSfDir()
    // no near-dup pairs at all → the sizing table must still show all
    // five thresholds with (0, 0), not vanish the rows a planner reads
    val rows = Seq(
      (0L, "completely unique text about alpine skiing and snow conditions",
        "en", "s0", 60L),
      (1L, "another unrelated document discussing tropical fish aquariums",
        "en", "s0", 60L))
    writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = Dedup.dedupThresholdSweep(spark, dir.toString).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9).map(t => (t, 0L, 0L)),
      s"got ${got.toSeq}")
  }
}
