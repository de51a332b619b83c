package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed fact tables (builder brief §partitioning:
 * "salting for skew").
 *
 * A hash join shuffles both sides on the join key — one ultra-hot key
 * (the null-ish user, the boilerplate document, the default campaign)
 * lands an entire 100 GB partition on one task. AQE's skew-join split
 * handles sort-merge joins after the fact; salting handles it BY
 * CONSTRUCTION, and composes with any join the optimizer picks:
 *
 *  - fact rows get a deterministic per-row salt in [0, salts);
 *  - the dim side is replicated `salts` ways (dims are the small side —
 *    replication is `salts × |dim|`, bounded and broadcast-friendly);
 *  - the join key becomes (key*, salt), splitting every hot key into
 *    `salts` independent partitions.
 *
 * Join semantics are exactly the plain equi-join's: every fact row meets
 * exactly one replica of its dim match.
 */
object SkewJoin {

  /**
   * Inner equi-join of a (possibly skewed) fact against a dim, salted
   * `salts` ways. `keys` must exist on both sides.
   *
   * `numPartitions > 0` pins BOTH sides to an explicit
   * `repartition(numPartitions, keys :+ salt)` before the join. Use it
   * when the join's OUTPUT fans out (cell-bounded all-pairs, band-bucket
   * blowups): AQE's coalescing sizes stages by shuffle INPUT bytes, so on
   * a small-but-quadratic relation it merges the salted slices straight
   * back into few tasks — an explicit-count repartition is exempt from
   * coalescing and keeps the parallelism the salt bought.
   */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int, numPartitions: Int = 0): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt column name collision")
    // per-row salt: DETERMINISTIC (hash of the full row), never an
    // ordinal. The salt is a shuffle/join key — with an order-dependent
    // salt (monotonically_increasing_id, rand), a map-task re-execution
    // after a fetch failure can re-salt rows differently while some
    // reducers already consumed the old assignment, silently dropping or
    // duplicating fact rows (the SPARK-23207 failure class, which Spark
    // only auto-repairs for its own round-robin partitioning). Cost of
    // determinism: byte-identical duplicate rows share a salt, so
    // spreading relies on row variety (ids/timestamps) — true for any
    // fact table with a key or event-time column.
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    if (numPartitions > 0) {
      val jk = (keys :+ "__salt").map(col)
      salted.repartition(numPartitions, jk: _*)
        .join(replicated.repartition(numPartitions, jk: _*), keys :+ "__salt")
        .drop("__salt")
    } else salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
