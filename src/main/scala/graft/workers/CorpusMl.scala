package graft.workers

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Model-based corpus quality scoring — the fastText-style classifier step
 * of a web-corpus curation pipeline (the GPT-3 / CCNet recipe: label a
 * seed set, train a cheap linear classifier over bag-of-words features,
 * score every document, keep/sample by the model's quality probability).
 * Labels come from weak supervision: a document is a positive example
 * when it passes the full [[graft.queries.Text.gopherPredicates]] rule
 * battery — the standard bootstrap when no curated seed corpus exists
 * (heuristics label, the model generalizes and smooths, downstream
 * sampling uses the calibrated probability instead of a hard rule edge).
 *
 * Mechanics: whitespace tokens (the curation family's shared tokenizer)
 * → [[HashingTF]] term counts (the hashing trick keeps the feature space
 * fixed-width with NO vocabulary collect — at 100 TB there is no
 * driver-side dictionary to build or broadcast) → L2-regularized
 * [[LogisticRegression]]. Training aggregates gradients with MLlib's
 * treeAggregate (map-side partials, log-depth combine); scoring is a
 * single stateless transform over the scan — embarrassingly parallel,
 * no shuffle at all.
 */
object CorpusMl {

  /** Feature width for the hashing trick (2^12 — collisions are part of
    * the contract; fastText ships 2M buckets at web scale, the principle
    * is identical). */
  val QualityNumFeatures = 4096

  /** Documents with the weak-supervision label: 1.0 when all five
    * quality rules pass. The tokens column feeds the hashing featurizer;
    * rule verdicts are exact integer arithmetic (see gopherPredicates).
    * Pure stateless column expressions, so the same projection serves
    * batch relations and streaming micro-batches unchanged. */
  private[workers] def labeledFrom(docs: DataFrame): DataFrame = {
    val keep = graft.queries.Text.gopherPredicates.reduce(_ && _)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("tokens"),
        when(keep, 1.0d).otherwise(0.0d).as("label"))
  }

  private[workers] def labeled(s: SparkSession, dir: String): DataFrame =
    labeledFrom(Workers.resolveTable(s, s"$dir/documents.parquet"))

  /** The (untrained) featurize+classify pipeline. */
  private def pipeline(): Pipeline = {
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(QualityNumFeatures)
    val lr = new LogisticRegression().setLabelCol("label")
      .setMaxIter(50).setRegParam(1e-3)
    new Pipeline().setStages(Array(tf, lr))
  }

  /** Fit the quality classifier on the rule-labeled corpus. */
  def trainQualityClassifier(s: SparkSession, dir: String): PipelineModel =
    pipeline().fit(labeled(s, dir))

  /** Training-set AUC of a fitted model — the convergence check a
    * curation pipeline gates on before trusting the scores. */
  def evaluateQuality(s: SparkSession, dir: String, model: PipelineModel): Double =
    new BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol("rawPrediction")
      .evaluate(model.transform(labeled(s, dir)))

  /** Score every document: (doc_id, rule_label, quality_prob). The
    * positive-class probability is the sampling weight downstream
    * (mirrors Ml.Predictor's positive-class column convention). */
  def scoreQuality(s: SparkSession, dir: String, model: PipelineModel): DataFrame =
    scored(labeledFrom(Workers.resolveTable(s, s"$dir/documents.parquet")), model)

  /**
   * Model scoring over a STREAMING documents relation (`readStream` of the
   * same schema) — the online leg of the curation pipeline: freshly
   * crawled documents get their quality probability as they arrive, so
   * downstream keep/route decisions never wait for a batch rescore. The
   * whole chain (rule label, hashed features, linear model) is stateless
   * per-row expressions — no watermark, no state store, and every
   * micro-batch scores with the SAME frozen model the batch pass trained,
   * so online and offline scores can never disagree (asserted by the
   * MemoryStream parity spec).
   */
  def scoreQualityStream(docsStream: DataFrame, model: PipelineModel): DataFrame =
    scored(labeledFrom(docsStream), model)

  private def scored(labeledDocs: DataFrame, model: PipelineModel): DataFrame =
    model.transform(labeledDocs)
      .select(col("doc_id"), col("label").as("rule_label"),
        vector_to_array(col("probability")).getItem(1).as("quality_prob"))

  /** DAG worker: fit the quality classifier on a documents table and
    * persist it (model.write.overwrite, same convention as Ml.Trainer) so
    * a pipeline can chain train → score as two tasks on `success`. */
  final class QualityTrainer(spark: SparkSession,
      params: Map[String, graft.core.Spec.WorkerValue]) extends graft.core.Dag.Worker {
    def execute(ctx: graft.core.Dag.WorkerContext): Unit = {
      val table = Workers.str(params, "documents_table")
      val modelUri = Workers.str(params, "model_uri")
      require(table.nonEmpty && modelUri.nonEmpty,
        "'documents_table' and 'model_uri' are required")
      val data = labeledFrom(Workers.resolveTable(spark, table))
      val model = pipeline().fit(data)
      model.write.overwrite().save(modelUri)
      val auc = new BinaryClassificationEvaluator().setLabelCol("label")
        .setRawPredictionCol("rawPrediction").evaluate(model.transform(data))
      ctx.log(f"Trained quality classifier on $table -> $modelUri (training AUC $auc%.4f)")
    }
  }

  /** DAG worker: load a persisted quality model and write per-document
    * scores to the destination table. */
  final class QualityScorer(spark: SparkSession,
      params: Map[String, graft.core.Spec.WorkerValue]) extends graft.core.Dag.Worker {
    def execute(ctx: graft.core.Dag.WorkerContext): Unit = {
      val table = Workers.str(params, "documents_table")
      val modelUri = Workers.str(params, "model_uri")
      val dest = Workers.str(params, "destination_table")
      require(table.nonEmpty && modelUri.nonEmpty && dest.nonEmpty,
        "'documents_table', 'model_uri' and 'destination_table' are required")
      val model = PipelineModel.load(modelUri)
      val out = scored(labeledFrom(Workers.resolveTable(spark, table)), model)
      Workers.writeTable(out, dest, overwrite = Workers.bool(params, "overwrite", default = true))
      ctx.log(s"Scored $table with $modelUri -> $dest")
    }
  }

  def register(r: graft.core.Dag.Registry, spark: SparkSession): Unit = {
    r.register("CorpusQualityTrainer")(p => new QualityTrainer(spark, p))
    r.register("CorpusQualityScorer")(p => new QualityScorer(spark, p))
  }
}
