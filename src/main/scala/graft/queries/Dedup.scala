package graft.queries

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/**
 * Near-duplicate detection operators (builder brief §dedup): exact word-set
 * Jaccard (the verification oracle), SimHash (md5-derived, cross-engine
 * reproducible), and MinHash+LSH (the 100 TB-scale candidate generator,
 * keyed on [[graft.functions.FarmHash]]).
 *
 * Scale design: the exact pair join is quadratic and exists as the
 * small-scale oracle / LSH-verification stage; at scale, candidate pairs
 * come from `dedupMinhashLsh` (band-bucket equi-join — shuffle on band key,
 * never all-pairs) and only candidates get the exact-Jaccard check.
 */
object Dedup {

  private def docWords(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(filter(split(col("text"), " "), w => w =!= "")).as("words"))

  private val JaccardThreshold = 0.8

  /**
   * Exact word-set Jaccard over same-lang pairs (lang = blocking key),
   * accelerated with prefix filtering (PPJoin-style): if J(A,B) ≥ t, the
   * two sets must share a token within the first |X| − ⌈t·|X|⌉ + 1 tokens
   * of a canonical global-rarity ordering — so the inverted-index join runs
   * only on those prefix tokens (the rarest ones), not on every token.
   * The exact verification (array_intersect on the full distinct word sets)
   * keeps the output identical to the naive all-pairs oracle.
   */
  def dedupJaccardWords(s: SparkSession, dir: String): DataFrame = {
    val dw = docWords(s, dir) // doc_id, lang, words (distinct)
    val ex = dw.select(col("doc_id"), col("lang"), explode(col("words")).as("w"))

    // canonical token order: ascending global document frequency, ties by word
    val dfreq = ex.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val prefixes = ex
      .join(broadcast(dfreq), "w") // vocab is small; at scale this becomes a plain shuffle join
      .groupBy(col("doc_id"), col("lang"))
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ordered"),
        count(lit(1)).as("nw"))
      .withColumn("plen", (col("nw") - ceil(col("nw") * JaccardThreshold) + 1).cast("int"))
      .select(col("doc_id"), col("lang"),
        explode(slice(transform(col("ordered"), t => t.getField("w")), lit(1), col("plen")))
          .as("ptoken"))

    val a = prefixes.select(col("doc_id").as("da"), col("lang").as("la"), col("ptoken"))
    val b = prefixes.select(col("doc_id").as("db"), col("lang").as("lb"), col("ptoken").as("pb"))
    val cand = a.join(b,
        col("ptoken") === col("pb") && col("la") === col("lb") && col("da") < col("db"))
      .select(col("da"), col("db"))
      .distinct()

    val sets = dw.select(col("doc_id"), col("words"))
    cand
      .join(sets.select(col("doc_id").as("da"), col("words").as("wa")), "da")
      .join(sets.select(col("doc_id").as("db"), col("words").as("wb")), "db")
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("wa")) + size(col("wb")) - col("inter")).cast("double"))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("da"), col("db"), col("inter"), col("jac"))
      .orderBy(col("da"), col("db"))
  }

  private val SimBits = 32

  /** 32-bit word hash shared with the DuckDB oracle: first 8 hex chars of
    * md5 — reproducible on any engine with md5. */
  private def wordHash32(w: Column): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long")

  /** SimHash document signatures: per-bit majority vote over word hashes.
    * One explode + one agg — linear, map-side combinable. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val ex = docWords(s, dir)
      .select(col("doc_id"), explode(col("words")).as("w"))
      .withColumn("h", wordHash32(col("w")))
    val votes = (0 until SimBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sig = (0 until SimBits).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    ex.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Oracle SQL for [[dedupSimhash]], generated with the same bit loop. */
  private def simhashOracle: String = {
    val votes = (0 until SimBits)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    val sig = (0 until SimBits)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH ex AS (
       |  SELECT doc_id,
       |    CAST(CAST('0x' || substring(md5(w), 1, 8) AS UBIGINT) AS BIGINT) AS h
       |  FROM (
       |    SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS w
       |    FROM documents)),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM ex GROUP BY doc_id)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash
       |FROM votes ORDER BY doc_id""".stripMargin
  }

  private val MinhashPerms = 32
  private val LshBands = 8 // 8 bands x 4 rows

  /** Deterministic affine permutation constants. Kept below 2^31 so
    * `h32 * A + B` on a 32-bit-folded hash never exceeds Long range —
    * Spark 4 runs ANSI mode, where silent wraparound is an error. */
  private def permA(j: Int): Long = ((0x9e3779b97f4a7c15L * (2 * j + 1)) >>> 33) | 1L
  private def permB(j: Int): Long = (0xc6a4a7935bd1e995L * (j + 7)) >>> 33

  /** Degenerate-bucket guard: LSH buckets larger than this are skipped
    * (standard production practice — a bucket with thousands of members is
    * a boilerplate/spam cluster, and exact-verifying its O(b²) pairs is
    * exactly the blowup LSH exists to avoid). */
  private val MaxBucketSize = 50

  /** Cheap signature-agreement prefilter before exact verification:
    * fraction of equal minhashes estimates Jaccard (E[agree] = J). */
  private val MinhashEstThreshold = 0.35

  /**
   * MinHash + LSH near-dup candidate pairs, verified with exact shingle
   * Jaccard. 3-word shingles → farm_fingerprint → 32 affine min-hashes →
   * 8 band keys → equi-join on (band, key) → minhash-agreement prefilter →
   * exact verify on surviving candidates.
   * No oracle (DuckDB has no farmhash); semantics covered by DedupSpec and
   * cross-checked against dedup_jaccard_words in spirit.
   */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val base = load(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("words"))
      .withColumn("shingles",
        when(size(col("words")) < 3, array(concat_ws(" ", col("words"))))
          .otherwise(transform(sequence(lit(1), size(col("words")) - 2),
            i => concat_ws(" ", col("words")(i - 1), col("words")(i), col("words")(i + 1)))))
      .withColumn("shingles", array_distinct(col("shingles")))
      .withColumn("sh_hashes",
        transform(col("shingles"), sh => {
          val h = GraftFunctions.farm_fingerprint(sh)
          // xor-fold to 32 bits (overflow-safe under ANSI for the affine step)
          h.bitwiseXOR(shiftrightunsigned(h, 32)).bitwiseAND(lit(0xffffffffL))
        }))

    // 32 min-hashes packed into one array column (codegen-friendly minima)
    val mhArr = array((0 until MinhashPerms).map { j =>
      array_min(transform(col("sh_hashes"), h => h * permA(j) + permB(j)))
    }: _*)
    val withMh = base.select(col("doc_id"), mhArr.as("mh"))

    // band keys: hash of the 4 minhashes in each band
    val bandCols = (0 until LshBands).map { b =>
      val slice = (0 until 4).map(r => col("mh")(b * 4 + r))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("key"))
    }
    // Candidate generation stays NARROW: (band, key, doc_id, mh[32]) flows
    // through the self-join — shingle arrays re-attach by doc_id only for
    // candidates that survive. Oversized buckets (degenerate boilerplate
    // clusters) are dropped before the quadratic pair expansion.
    val banded = withMh
      .select(col("doc_id"), col("mh"), explode(array(bandCols: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc_id"), col("mh"))
    val wb = Window.partitionBy(col("band"), col("key"))
    val pruned = banded
      .withColumn("bsz", count(lit(1)).over(wb))
      .filter(col("bsz") <= MaxBucketSize)
      .drop("bsz")

    val left = pruned.select(col("band"), col("key"), col("doc_id").as("da"), col("mh").as("mha"))
    val right = pruned.select(col("band").as("band_r"), col("key").as("key_r"),
      col("doc_id").as("db"), col("mh").as("mhb"))
    val agree = size(filter(zip_with(col("mha"), col("mhb"),
      (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
    val cand = left.join(right,
        col("band") === col("band_r") && col("key") === col("key_r") && col("da") < col("db"))
      .dropDuplicates("da", "db")
      .filter(agree >= lit((MinhashEstThreshold * MinhashPerms).toInt))
      .select(col("da"), col("db"))

    val shingleSets = base.select(col("doc_id"), col("shingles"))
    cand
      .join(shingleSets.select(col("doc_id").as("da"), col("shingles").as("sha")), "da")
      .join(shingleSets.select(col("doc_id").as("db"), col("shingles").as("shb")), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("uni", (size(col("sha")) + size(col("shb"))).cast("double") - col("inter"))
      .withColumn("jac", col("inter") / col("uni"))
      .filter(col("jac") >= 0.5)
      .select(col("da"), col("db"), round(col("jac"), 6).as("jac"))
      .orderBy(col("da"), col("db"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_jaccard_words" -> (dedupJaccardWords _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _))

  val oracle: Map[String, String] = Map(
    "dedup_jaccard_words" ->
      """WITH dw AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_filter(string_split(text, ' '), w -> w <> '')) AS words
        |  FROM documents),
        |cnt AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS nw FROM dw),
        |ex AS (SELECT doc_id, lang, unnest(words) AS w FROM dw),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS inter
        |  FROM ex a JOIN ex b ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, inter,
        |  inter::DOUBLE / (ca.nw + cb.nw - inter)::DOUBLE AS jac
        |FROM pairs
        |JOIN cnt ca ON da = ca.doc_id
        |JOIN cnt cb ON db = cb.doc_id
        |WHERE inter::DOUBLE / (ca.nw + cb.nw - inter)::DOUBLE >= 0.8
        |ORDER BY da, db""".stripMargin,
    "dedup_simhash" -> simhashOracle)
}
