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
   */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt column name collision")
    // per-row salt: spreads each key's rows uniformly without consulting
    // data values (monotonic id = partition-local ordinal, so consecutive
    // rows of a hot key round-robin across salts)
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
