package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev profiling harness (not part of the library contract): time the
 * construction and execution of any contract queries standalone.
 *
 *   sbt 'runMain graft.Scratch /root/testdata/sf0.1 dedup_components q1_agg'
 *
 * Prints construct / first-run / warm-run seconds per query — the same
 * noop-sink materialization the bench uses, plus a second run to separate
 * plan/codegen cost from steady-state execution.
 */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_agg")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // JVM warmup
    graft.sources.WildcardTable.eventsPath(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          spark.catalog.clearCache()
          val df = time(s"$name construct") { fn(spark, sfDir) }
          time(s"$name run 1") { df.write.format("noop").mode("overwrite").save() }
          time(s"$name run 2 (warm)") { df.write.format("noop").mode("overwrite").save() }
        case None => System.err.println(s"[scratch] unknown query: $name")
      }
    }
    spark.stop()
  }
}
