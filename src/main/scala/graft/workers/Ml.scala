package graft.workers

import graft.core.Dag
import graft.core.Dag.{Worker, WorkerContext}
import graft.core.Spec.WorkerValue
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, MultilayerPerceptronClassifier, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.RFormula
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * BQML / Vertex-AI semantics on MLlib (SURVEY §2.5):
 * `CREATE OR REPLACE MODEL ... OPTIONS(MODEL_TYPE=...)` → estimator fit,
 * `ML.PREDICT` → transform + positive-class probability,
 * `ML.EVALUATE` → evaluator metrics table. The model-type names are the
 * reference's accepted list (compiler.py:50-62).
 */
object Ml {

  /** `featureDim`/`numClasses` are by-name: only the DNN mapping needs
    * them (MLP layers must be sized up front), so the probe actions run
    * only for DNN_* types. DNN_REGRESSOR is rejected explicitly — MLlib
    * has no perceptron regressor, and silently substituting a tree model
    * would misreport what was trained (the reference's accepted list is
    * `compiler.py:50-62`; every other entry maps 1:1). */
  private[workers] def estimator(modelType: String, labelCol: String,
      hyperParams: Map[String, String] = Map.empty,
      featureDim: () => Int = () => 0,
      numClasses: () => Int = () => 2) = {
    val est = modelType.toUpperCase match {
      case "LOGISTIC_REG" => new LogisticRegression().setLabelCol(labelCol)
      case "BOOSTED_TREE_CLASSIFIER" => new GBTClassifier().setLabelCol(labelCol)
      case "BOOSTED_TREE_REGRESSOR" => new GBTRegressor().setLabelCol(labelCol)
      case "RANDOM_FOREST_CLASSIFIER" => new RandomForestClassifier().setLabelCol(labelCol)
      case "RANDOM_FOREST_REGRESSOR" => new RandomForestRegressor().setLabelCol(labelCol)
      case "LINEAR_REG" => new LinearRegression().setLabelCol(labelCol)
      case "DNN_CLASSIFIER" =>
        // feature-derived layer sizing: input = encoded feature width,
        // hidden = HIDDEN_UNITS or one layer of width/2, output = #classes
        val dim = featureDim()
        val hidden = hyperParams.collectFirst {
          case (k, v) if k.equalsIgnoreCase("HIDDEN_UNITS") =>
            v.split("[,\\[\\]\\s]+").filter(_.nonEmpty).map(_.toInt).toSeq
        }.getOrElse(Seq(math.max(2, dim / 2)))
        new MultilayerPerceptronClassifier().setLabelCol(labelCol)
          .setLayers(((dim +: hidden) :+ numClasses()).toArray)
      case "DNN_REGRESSOR" =>
        throw new IllegalArgumentException(
          "MODEL_TYPE DNN_REGRESSOR is not supported: MLlib has no perceptron " +
            "regressor; use BOOSTED_TREE_REGRESSOR / RANDOM_FOREST_REGRESSOR / LINEAR_REG")
      case other => throw new IllegalArgumentException(s"Unsupported MODEL_TYPE: $other")
    }
    applyHyperParams(est, hyperParams)
  }

  /**
   * BQML `OPTIONS(...)` hyperparameters → MLlib params
   * (`model_bqml.sql:3-14` injects them verbatim; names are the BQML
   * option vocabulary, `models.py:608-618` stores free-form name/value).
   * Options a given estimator doesn't carry are returned in the ignored
   * list (BQML likewise ignores options inapplicable to the model type)
   * rather than failing the pipeline; unknown NAMES still throw — a typo
   * should not silently train with defaults.
   */
  private[workers] def applyHyperParams[E <: org.apache.spark.ml.param.Params](
      est: E, hp: Map[String, String]): (E, Seq[String]) = {
    def setIf(name: String, v: Any): Boolean =
      est.hasParam(name) && { est.set(est.getParam(name), v); true }
    val l1 = hp.collectFirst { case (k, v) if k.equalsIgnoreCase("L1_REG") => v.toDouble }
    val l2 = hp.collectFirst { case (k, v) if k.equalsIgnoreCase("L2_REG") => v.toDouble }
    val ignored = scala.collection.mutable.ArrayBuffer.empty[String]
    // elastic-net translation: MLlib's penalty is
    //   regParam * (α·||w||₁ + (1-α)/2·||w||₂²)
    // so matching BQML's a·||w||₁ + b·||w||₂² requires α = a/(a+2b),
    // regParam = a+2b (note the ½ on MLlib's L2 term)
    if (l1.isDefined || l2.isDefined) {
      val a = l1.getOrElse(0.0); val b = l2.getOrElse(0.0)
      val ok = setIf("regParam", a + 2 * b) &&
        (a + 2 * b == 0.0 || setIf("elasticNetParam", a / (a + 2 * b)))
      if (!ok) ignored += "L1_REG/L2_REG"
    }
    hp.foreach { case (k0, v) =>
      val k = k0.trim.toUpperCase
      val ok = k match {
        case "L1_REG" | "L2_REG" => true // handled above
        // consumed by the DNN layer sizing; any other estimator has no
        // layers param, so it lands on the ignored list like BQML's
        // inapplicable-option behavior
        case "HIDDEN_UNITS" => est.hasParam("layers")
        case "MAX_ITERATIONS" => setIf("maxIter", v.toDouble.toInt)
        case "LEARN_RATE" => setIf("stepSize", v.toDouble)
        case "MIN_REL_PROGRESS" => setIf("tol", v.toDouble)
        case "EARLY_STOP" => true // MLlib iterates to maxIter/tol; no toggle
        case "MAX_TREE_DEPTH" => setIf("maxDepth", v.toDouble.toInt)
        case "SUBSAMPLE" => setIf("subsamplingRate", v.toDouble)
        case "MIN_SPLIT_LOSS" => setIf("minInfoGain", v.toDouble)
        case "NUM_PARALLEL_TREE" => setIf("numTrees", v.toDouble.toInt)
        case "BATCH_SIZE" => setIf("blockSize", v.toDouble.toInt)
        case "BUDGET_HOURS" => true // Vertex budget: no MLlib analog, recorded by the caller
        case other => throw new IllegalArgumentException(
          s"Unknown hyperparameter: $other (BQML OPTIONS vocabulary expected)")
      }
      if (!ok) ignored += k
    }
    (est, ignored.toSeq)
  }

  private def isClassifier(modelType: String): Boolean =
    modelType.toUpperCase.endsWith("CLASSIFIER") || modelType.toUpperCase == "LOGISTIC_REG"

  /** VertexAITabularTrainer / BQML CREATE MODEL → RFormula + estimator fit,
    * persisted with model.write.overwrite (SURVEY §2.5). */
  final class Trainer(spark: SparkSession, params: Map[String, WorkerValue]) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "training_table", Workers.str(params, "bq_table_id"))
      val modelType = Workers.str(params, "model_type", "LOGISTIC_REG")
      val labelCol = Workers.str(params, "label_col", "label")
      val modelUri = Workers.str(params, "model_uri")
      require(table.nonEmpty && modelUri.nonEmpty, "'training_table' and 'model_uri' are required")
      val df = Workers.resolveTable(spark, table)
      val featureCols = {
        val explicit = Workers.strList(params, "feature_cols")
        if (explicit.nonEmpty) explicit else df.columns.filterNot(_ == labelCol).toSeq
      }
      val hyperParams = Workers.strList(params, "hyper_parameters")
        .map(_.split("=", 2)).collect { case Array(k, v) => k.trim -> v.trim }.toMap
      // RFormula handles string features (one-hot) like BQML's implicit
      // TRANSFORM of categorical columns. handleInvalid=keep: the model
      // scores data DISJOINT from what it was fit on (the >=90 holdout in
      // the conversion-values job, tomorrow's users in the nightly
      // predict) — the default "error" would kill the job on the first
      // country/browser/daypart value absent from the training split;
      // "keep" routes unseen categories to a dedicated index, which is
      // BQML's behavior for unseen categorical values at prediction time.
      val formula = new RFormula()
        .setFormula(s"$labelCol ~ ${featureCols.mkString(" + ")}")
        .setFeaturesCol("features")
        .setLabelCol(labelCol)
        .setHandleInvalid("keep")
      // by-name probes — executed only for DNN_* layer sizing
      def featureDim(): Int = formula.fit(df).transform(df.limit(1))
        .select("features").head.getAs[org.apache.spark.ml.linalg.Vector](0).size
      // MLP labels are 0..k-1, so the output width is max(label)+1 —
      // distinct-count would size it wrong for non-contiguous labels
      // ({0,2} needs 3) and break on single-class shards (floor of 2)
      def numClasses(): Int = math.max(2,
        df.agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col(labelCol).cast("double")))
          .head.getDouble(0).toInt + 1)
      val (est, ignored) =
        estimator(modelType, labelCol, hyperParams, featureDim _, numClasses _)
      if (ignored.nonEmpty)
        ctx.log(s"Hyperparameters without a $modelType analog ignored: ${ignored.mkString(", ")}")
      val pipe = new Pipeline().setStages(Array(formula, est))
      val model = pipe.fit(df)
      model.write.overwrite().save(modelUri)
      ctx.log(s"Trained $modelType on $table -> $modelUri")
    }
  }

  /** VertexAIBatchPredictorToBQ / ML.PREDICT: transform + positive-class
    * probability (`UNNEST(predicted_label_probs) WHERE label=1` analog,
    * model_bqml.sql:29,50,313-316). */
  final class Predictor(spark: SparkSession, params: Map[String, WorkerValue]) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "bq_table_id")
      val modelUri = Workers.str(params, "model_uri")
      val dest = Workers.str(params, "destination_table")
      require(table.nonEmpty && modelUri.nonEmpty && dest.nonEmpty,
        "'bq_table_id', 'model_uri' and 'destination_table' are required")
      val model = PipelineModel.load(modelUri)
      val out0 = model.transform(Workers.resolveTable(spark, table))
      val out =
        if (out0.columns.contains("probability"))
          out0.withColumn("probability_of_positive",
            vector_to_array(col("probability")).getItem(1))
        else out0
      val cleaned = out.drop("features", "rawPrediction", "probability")
      Workers.writeTable(cleaned, dest, overwrite = true)
    }
  }

  /** ML.EVALUATE analog: metrics table for a trained model on a dataset. */
  final class Evaluator(spark: SparkSession, params: Map[String, WorkerValue]) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "bq_table_id")
      val modelUri = Workers.str(params, "model_uri")
      val dest = Workers.str(params, "destination_table")
      val labelCol = Workers.str(params, "label_col", "label")
      val classifier = Workers.bool(params, "classifier", default = true)
      val model = PipelineModel.load(modelUri)
      val predictions = model.transform(Workers.resolveTable(spark, table))
      import spark.implicits._
      val metrics: DataFrame =
        if (classifier) {
          val auc = new BinaryClassificationEvaluator()
            .setLabelCol(labelCol).setMetricName("areaUnderROC").evaluate(predictions)
          val pr = new BinaryClassificationEvaluator()
            .setLabelCol(labelCol).setMetricName("areaUnderPR").evaluate(predictions)
          Seq(("roc_auc", auc), ("pr_auc", pr)).toDF("metric", "value")
        } else {
          val rmse = new RegressionEvaluator()
            .setLabelCol(labelCol).setMetricName("rmse").evaluate(predictions)
          val r2 = new RegressionEvaluator()
            .setLabelCol(labelCol).setMetricName("r2").evaluate(predictions)
          Seq(("rmse", rmse), ("r2", r2)).toDF("metric", "value")
        }
      Workers.writeTable(metrics, dest, overwrite = true)
    }
  }

  /**
   * BQToVertexAIDataset as snapshot-table semantics
   * (`bq_to_vertexai_dataset.py:35-59` + `vertexai_worker.py:131-143`):
   * each run writes a new timestamped snapshot of the source table under
   * `<snapshot_base>/<display_name>/`; with `clean_up` (default true, like
   * the reference) all but the newest EXISTING snapshot are deleted first,
   * so two snapshots remain after the run (newest old + new).
   */
  final class DatasetSnapshot(spark: SparkSession, params: Map[String, WorkerValue],
      now: () => Long = () => System.currentTimeMillis()) extends Worker {
    def execute(ctx: WorkerContext): Unit = {
      val table = Workers.str(params, "bq_table_id")
      val base = Workers.str(params, "snapshot_base")
      require(table.nonEmpty && base.nonEmpty, "'bq_table_id' and 'snapshot_base' are required")
      val displayName = Workers.str(params, "vertexai_dataset_name",
        table.replaceAll("[^A-Za-z0-9_.]", "_"))
      val cleanUp = Workers.bool(params, "clean_up", default = true)
      val root = new org.apache.hadoop.fs.Path(s"$base/$displayName")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (cleanUp && fs.exists(root)) {
        // list snapshots ordered by create time (timestamped dir names),
        // delete all but the newest (vertexai_worker.py:138-143)
        val snaps = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
          .sortBy(_.getName)
        snaps.dropRight(1).foreach { p =>
          fs.delete(p, true)
          ctx.log(s"Deleted dataset: $p")
        }
      }
      val dest = new org.apache.hadoop.fs.Path(root, f"${now()}%020d")
      Workers.resolveTable(spark, table).write.parquet(dest.toString)
      ctx.log(s"Dataset created: $dest")
    }
  }

  def register(r: Dag.Registry, spark: SparkSession): Unit = {
    r.register("VertexAITabularTrainer")(p => new Trainer(spark, p))
    r.register("MlTrainer")(p => new Trainer(spark, p))
    r.register("VertexAIBatchPredictorToBQ")(p => new Predictor(spark, p))
    r.register("MlPredictor")(p => new Predictor(spark, p))
    r.register("MlEvaluator")(p => new Evaluator(spark, p))
    r.register("BQToVertexAIDataset")(p => new DatasetSnapshot(spark, p))
  }
}
