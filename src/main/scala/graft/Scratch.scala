package graft

import org.apache.spark.sql.SparkSession

/** Temporary stage-timing harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/sparklog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.sql.functions._
    val pairs = time("pairs construct") {
      graft.queries.Dedup.dedupJaccardWords(spark, sfDir) }
    println(s"[scratch] n_pairs = ${time("pairs count") { pairs.count() }}")
    val comp = time("components construct+iterate") {
      graft.queries.Curation.dedupComponents(spark, sfDir) }
    time("components noop") { comp.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
