package graft.queries

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Exact word-set Jaccard over same-lang pairs (lang = blocking key).
    * Word-level inverted-index join: |A∩B| via shared-word counting. */
  def dedupJaccardWords(s: SparkSession, dir: String): DataFrame = {
    val dw = docWords(s, dir)
    val counts = dw.select(col("doc_id"), size(col("words")).cast("long").as("nw"))
    val ex = dw.select(col("doc_id"), col("lang"), explode(col("words")).as("w"))
    val a = ex.select(col("doc_id").as("da"), col("lang").as("la"), col("w"))
    val b = ex.select(col("doc_id").as("db"), col("lang").as("lb"), col("w").as("wb"))
    val inter = a.join(b, col("w") === col("wb") && col("la") === col("lb") && col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "da").withColumnRenamed("nw", "na"), "da")
      .join(counts.withColumnRenamed("doc_id", "db").withColumnRenamed("nw", "nb"), "db")
      .withColumn("jac", col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jac") >= 0.8)
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

  /**
   * MinHash + LSH near-dup candidate pairs, verified with exact shingle
   * Jaccard. 3-word shingles → farm_fingerprint → 32 affine min-hashes →
   * 8 band keys → equi-join on (band, key) → exact verify on candidates.
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

    // 32 min-hashes as fold-free array minimums (codegen-friendly)
    val minhashCols = (0 until MinhashPerms).map { j =>
      array_min(transform(col("sh_hashes"), h => h * permA(j) + permB(j))).as(s"mh$j")
    }
    val withMh = base.select((col("doc_id") +: col("shingles") +: minhashCols): _*)

    // band keys: hash of the 4 minhashes in each band
    val bandCols = (0 until LshBands).map { b =>
      val slice = (0 until 4).map(r => col(s"mh${b * 4 + r}"))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("key")).as(s"bk$b")
    }
    val banded = withMh
      .select(col("doc_id"), col("shingles"), array(bandCols: _*).as("bands"))
      .select(col("doc_id"), col("shingles"), explode(col("bands")).as("bk"))
      .select(col("doc_id"), col("shingles"), col("bk.band").as("band"), col("bk.key").as("key"))

    val left = banded.select(col("band"), col("key"), col("doc_id").as("da"), col("shingles").as("sha"))
    val right = banded.select(col("band").as("band_r"), col("key").as("key_r"),
      col("doc_id").as("db"), col("shingles").as("shb"))
    val cand = left.join(right,
        col("band") === col("band_r") && col("key") === col("key_r") && col("da") < col("db"))
      .select(col("da"), col("db"), col("sha"), col("shb"))
      .dropDuplicates("da", "db")

    cand
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
