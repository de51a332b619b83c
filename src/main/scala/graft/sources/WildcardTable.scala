package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Wildcard / date-sharded table support (SURVEY §2.2 scan rows).
 *
 * BigQuery's `events_*` sharded tables + `_TABLE_SUFFIX BETWEEN ...`
 * (`model_bqml.sql:91-94`) map Spark-natively to a date-PARTITIONED parquet
 * layout with a `_table_suffix` partition column: Catalyst's
 * `PruneFileSourcePartitions` turns any `_table_suffix` predicate into
 * partition pruning — only matching date directories are listed/read,
 * which is exactly BigQuery's wildcard-scan cost model.
 *
 * The `__TABLES_SUMMARY__` latest-shard lookup (`output.sql:2-7` —
 * `MAX(SPLIT(table_id,'events_')[OFFSET(1)])`) becomes a partition-metadata
 * listing: enumerate partition directory names from the file system (the
 * same metadata a catalog's SHOW PARTITIONS reads — no data scan) and take
 * the max.
 *
 * The partitioned layout is materialized once per source dir from the
 * driver's flat `events` table (idempotent: keyed by a _SUCCESS marker).
 */
object WildcardTable {

  private def suffixExpr = date_format(timestamp_micros(expr("ts DIV 1000")), "yyyyMMdd")

  /** Materialize (once) and return the partitioned layout's path. The
    * path is keyed by the SOURCE file's (length, mtime) fingerprint so a
    * regenerated source can never be served from a stale layout. */
  def eventsPath(s: SparkSession, dir: String): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new Path(s"$dir/events.parquet")
    val srcFs = src.getFileSystem(conf)
    val st = srcFs.getFileStatus(src)
    val fp = java.lang.Long.toHexString(st.getLen * 31 + st.getModificationTime)
    // never start the layout dir with '_': Spark's file index treats
    // leading-underscore paths as metadata and filters them from listings.
    // The raw-string hash tag makes distinct source dirs that sanitize to
    // the same text (".../sf0.01" vs ".../sf0_01") distinct on disk — the
    // superseded-layout cleanup below deletes by this prefix, so a
    // sanitization collision would delete a LIVE layout of another source
    val safe = "d" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "h" + java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_wildcard"
    val out = s"$root/${safe}_$fp"
    val fs = new Path(out).getFileSystem(conf)
    if (!fs.exists(new Path(out, "_SUCCESS"))) {
      // A regenerated source gets a new fingerprint; superseded layouts
      // for the SAME source would otherwise accumulate a full events-table
      // copy per driver regeneration (and confuse recursive listings with
      // stale dirs). Drop them before materializing the new one.
      val rootPath = new Path(root)
      if (fs.exists(rootPath)) {
        fs.listStatus(rootPath).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName != s"${safe}_$fp" &&
            st.getPath.getName.startsWith(safe + "_") &&
            // hex-only remainder: don't eat another dir whose sanitized
            // name happens to extend this one (".../sf0.01_x" vs ".../sf0.01")
            st.getPath.getName.stripPrefix(safe + "_").matches("[0-9a-f]+"))
          .foreach(st => fs.delete(st.getPath, true))
      }
      graft.queries.Tables.events(s, dir)
        .withColumn("_table_suffix", suffixExpr)
        .write.mode("overwrite").partitionBy("_table_suffix").parquet(out)
    }
    out
  }

  /** The `events_*` relation: all shards, `_table_suffix` as a STRING
    * partition column (BQ suffix semantics — no int inference). The
    * partition type is pinned by passing an EXPLICIT read schema (flat
    * events schema + the string partition column) — a user-specified
    * schema bypasses partition-column type inference per read, unlike the
    * session-global inference conf, whose toggle-and-restore would race
    * with concurrent partitioned reads on the same session and silently
    * flip THEIR partition column types. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val path = eventsPath(s, dir)
    // The layout is materialized from Tables.events (ts normalized to a
    // nanosecond LONG) — the explicit read schema must match THAT relation,
    // not the raw file, whose ts may be a physical timestamp column.
    val dataSchema = graft.queries.Tables.events(s, dir).schema
    val full = org.apache.spark.sql.types.StructType(dataSchema.fields :+
      org.apache.spark.sql.types.StructField("_table_suffix",
        org.apache.spark.sql.types.StringType))
    s.read.schema(full).parquet(path)
  }

  /** The `__TABLES_SUMMARY__` relation (one `table_id` row per shard) —
    * ONE derivation shared by the dialect's session-global view and the
    * ML pipelines' per-dataset namespaced views, so the table_id shape
    * can never drift between ad-hoc scripts and compiled Output jobs. */
  def tablesSummary(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    listSuffixes(s, dir).map(sfx => s"events_$sfx").toDF("table_id")
  }

  /** `__TABLES_SUMMARY__` analog: partition-directory names from file-system
    * metadata only (no data files opened). */
  def listSuffixes(s: SparkSession, dir: String): Seq[String] = {
    val root = new Path(eventsPath(s, dir))
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("_table_suffix="))
      .map(_.stripPrefix("_table_suffix="))
      .sorted
  }
}
