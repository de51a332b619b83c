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

    graft.sources.WildcardTable.eventsPath(spark, sfDir)
    import org.apache.spark.sql.functions._
    val ga4 = time("ga4 build") { graft.queries.Ga4.ga4EventsPartitioned(spark, sfDir) }
    val cfgM = graft.plans.MlCompiler.MlModel(
      isClassification = true, uniqueId = "user_pseudo_id",
      features = Seq(graft.plans.MlCompiler.GaFeature("error")),
      label = graft.plans.MlCompiler.GaLabel("purchase", "k"),
      suffixLo = "20240105", suffixHi = "20240125",
      classImbalance = 1, hashSplit = false, engagementEvent = "view")
    val ds = time("dataset construct") {
      graft.plans.MlCompiler.dataset(spark, ga4, cfgM, graft.plans.MlCompiler.Predicting) }
    time("dataset noop") { ds.write.format("noop").mode("overwrite").save() }
    val preds = ds.select(col("unique_id"), col("label"),
      ((col("unique_id").cast("long") * 2654435761L % 1000003L) / lit(1000003.0))
        .as("probability"))
    val cv = time("conversionValues construct") {
      graft.plans.MlCompiler.conversionValues(spark, preds, cfgM) }
    time("cv noop") { cv.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
