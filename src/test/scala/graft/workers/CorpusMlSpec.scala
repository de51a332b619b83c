package graft.workers

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The weak-supervision quality classifier: rule-labeled training must
  * converge to a model whose scores separate the rule classes (the gate a
  * curation pipeline applies before trusting model-based sampling). */
class CorpusMlSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.01"

  test("quality classifier learns the rule labels from hashed tokens (AUC)") {
    val model = CorpusMl.trainQualityClassifier(spark, dir)
    val auc = CorpusMl.evaluateQuality(spark, dir, model)
    assert(auc > 0.85, s"training-set AUC $auc — hashed-BoW LR should separate rule classes")
  }

  test("scoring emits one calibrated probability per document") {
    val model = CorpusMl.trainQualityClassifier(spark, dir)
    val scored = CorpusMl.scoreQuality(spark, dir, model)
    assert(scored.columns.toSeq == Seq("doc_id", "rule_label", "quality_prob"))
    val rows = scored.collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.forall { r =>
      val p = r.getDouble(2); p >= 0.0 && p <= 1.0
    })
    // probabilities must actually rank the classes, not just exist: the
    // mean positive-class score should clearly exceed the negatives'
    val (pos, neg) = rows.partition(_.getDouble(1) == 1.0)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture corpus must contain both rule classes")
    val mp = pos.map(_.getDouble(2)).sum / pos.length
    val mn = neg.map(_.getDouble(2)).sum / neg.length
    assert(mp > mn + 0.1, s"mean quality_prob pos=$mp neg=$mn")
  }

  test("streaming scoring: micro-batches produce the batch scores exactly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val model = CorpusMl.trainQualityClassifier(spark, dir)
    val batch = CorpusMl.scoreQuality(spark, dir, model)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = CorpusMl.scoreQualityStream(
      in.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("qscore").outputMode("append").start()
    try {
      val (first, rest) = docs.splitAt(docs.length / 2)
      in.addData(first); q.processAllAvailable()
      in.addData(rest); q.processAllAvailable()
      val streamed = s.table("qscore")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(streamed == batch, "online scores must equal the frozen-model batch scores")
    } finally q.stop()
  }

  test("DAG workers: train persists the model, score writes the dest table") {
    import graft.core.Spec.WorkerValue.S
    val noCtx = new graft.core.Dag.WorkerContext {
      def params: Map[String, graft.core.Spec.WorkerValue] = Map.empty
      def generalSettings: Map[String, String] = Map.empty
      def enqueue(wc: String, p: Map[String, graft.core.Spec.WorkerValue], d: Int): Unit = ()
    }
    val work = tmpSfDir()
    val modelUri = s"$work/quality_model"
    val dest = s"$work/quality_scores.parquet"
    val registry = Workers.registry(spark)
    registry.lookup("CorpusQualityTrainer").get(Map(
      "documents_table" -> S(s"$dir/documents.parquet"),
      "model_uri" -> S(modelUri))).execute(noCtx)
    registry.lookup("CorpusQualityScorer").get(Map(
      "documents_table" -> S(s"$dir/documents.parquet"),
      "model_uri" -> S(modelUri),
      "destination_table" -> S(dest))).execute(noCtx)
    val written = spark.read.parquet(dest)
    assert(written.columns.toSeq == Seq("doc_id", "rule_label", "quality_prob"))
    // the persisted+reloaded model must produce the in-memory model's scores
    val direct = CorpusMl.scoreQuality(spark, dir,
      org.apache.spark.ml.PipelineModel.load(modelUri))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val fromTable = written.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(fromTable == direct)
  }

  test("train -> score runs as a two-job pipeline through the DAG scheduler") {
    import graft.core.{Dag, Spec}
    import graft.core.Spec.{JobSpec, ParamSpec, ParamType, PipelineSpec, StartConditionSpec}
    val work = tmpSfDir()
    val modelUri = s"$work/pipe_model"
    val dest = s"$work/pipe_scores.parquet"
    val pipe = PipelineSpec("quality-curation", jobs = Seq(
      JobSpec("train", "Train quality model", "CorpusQualityTrainer", params = Seq(
        ParamSpec("documents_table", ParamType.PString, s"$dir/documents.parquet"),
        ParamSpec("model_uri", ParamType.PString, modelUri))),
      JobSpec("score", "Score corpus", "CorpusQualityScorer", params = Seq(
        ParamSpec("documents_table", ParamType.PString, s"$dir/documents.parquet"),
        ParamSpec("model_uri", ParamType.PString, modelUri),
        ParamSpec("destination_table", ParamType.PString, dest)),
        startConditions = Seq(StartConditionSpec("train", Spec.Condition.Success)))))
    val exec = Dag.newExecutor(2)
    try {
      val run = new Dag.PipelineRun(pipe, Workers.registry(spark), exec)
      assert(run.start())
      assert(run.awaitCompletion(300000) == Dag.PipelineStatus.Succeeded,
        s"pipeline failed: ${run.failureMessages}")
      val scoresDf = spark.read.parquet(dest)
      assert(scoresDf.count() == spark.read.parquet(s"$dir/documents.parquet").count())
    } finally exec.shutdown()
  }

  test("labeling is NULL-safe: a NULL-text document is excluded, not a crash") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val d = tmpSfDir()
    writeTable(d, "documents", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "the quick brown fox and the lazy dog of the north went to the in", "en", "web", 65L),
        Row(2L, null, "en", "web", null))),
      schema))
    assert(CorpusMl.labeled(spark, d.toString).count() == 1)
  }
}
