package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, functions => F}

/** Shared helpers for the driver-facing query inventory. */
object Tables {

  /** Load one of the driver-provided parquet tables from an sf dir. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /**
   * The events table carries a nanosecond-precision timestamp, which Spark's
   * parquet reader rejects by default (PARQUET_TYPE_ILLEGAL). We read it
   * under the `nanosAsLong` legacy conf, so `ts` arrives as a raw
   * nanosecond LONG — which is *better* for oracle parity: Spark and DuckDB
   * then share an exact total order on ts (no sub-microsecond truncation
   * ambiguity in window ordering). Derive instants via `ts DIV 1000` →
   * `timestamp_micros` (truncation identical to DuckDB's `epoch_us`).
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /**
   * Money/quantity columns go through exact DECIMAL arithmetic before any
   * aggregation so Spark and the DuckDB oracle produce bit-identical
   * results regardless of partition-level summation order (double addition
   * is not associative; decimal is exact). Final values are cast back to
   * DOUBLE — exact-decimal → double conversion is deterministic on both
   * engines.
   */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact-decimal sum exposed as a double. */
  def dsum(c: Column): Column = F.sum(dec(c)).cast("double")

  /** Exact-decimal avg exposed as a double (sum/count in double at the end). */
  def davg(c: Column): Column = F.sum(dec(c)).cast("double") / F.count(F.lit(1))

  /**
   * Always-zero window partition key that Catalyst can NOT constant-fold.
   *
   * Windows over metadata-sized relations (segment aggregates, event-type
   * rollups) are correctly single-partition, but `partitionBy(lit(0))` is
   * folded away by the optimizer, leaving an empty partition spec and the
   * scary `WindowExec: No Partition Defined` warning. Deriving 0 from a
   * data column keeps the spec non-empty (and the plan honest about being
   * a deliberate single-group window). Null-safe: coalesce keeps the key 0
   * even when the column is null.
   */
  def zeroPart(c: Column): Column =
    F.pmod(F.coalesce(F.length(c.cast("string")), F.lit(0)), F.lit(1))
}
