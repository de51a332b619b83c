package graft.workers

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The bigram-LM worker pair: the persisted model must reproduce the
  * self-trained batch contract query's scores exactly through the
  * persist → reload → score round-trip, driven through the registry. */
class CorpusLmSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("train persists the LM; score through the registry equals text_lm_nll") {
    import graft.core.Spec.WorkerValue.S
    val noCtx = new graft.core.Dag.WorkerContext {
      def params: Map[String, graft.core.Spec.WorkerValue] = Map.empty
      def generalSettings: Map[String, String] = Map.empty
      def enqueue(wc: String, p: Map[String, graft.core.Spec.WorkerValue], d: Int): Unit = ()
    }
    val work = tmpSfDir()
    val modelUri = s"$work/lm_model"
    val dest = s"$work/lm_scores.parquet"
    val registry = Workers.registry(spark)
    registry.lookup("CorpusLmTrainer").get(Map(
      "documents_table" -> S(s"$dir/documents.parquet"),
      "model_uri" -> S(modelUri))).execute(noCtx)
    // the persisted model is the three parquet tables
    assert(spark.read.parquet(s"$modelUri/cb").columns.toSeq == Seq("w1", "w2", "cb"))
    assert(spark.read.parquet(s"$modelUri/meta").first().getLong(0) > 0)
    registry.lookup("CorpusLmScorer").get(Map(
      "documents_table" -> S(s"$dir/documents.parquet"),
      "model_uri" -> S(modelUri),
      "destination_table" -> S(dest))).execute(noCtx)
    // scoring the training corpus with its own frozen LM = the batch
    // contract query (whose inner joins make the coalesce path a no-op)
    val expected = graft.queries.Text.textLmNll(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = spark.read.parquet(dest)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      "persisted+reloaded LM must reproduce the batch scores bit-for-bit")
  }

  test("a frozen LM scores unseen bigrams as smoothing mass, not a crash") {
    val s = spark
    import s.implicits._
    val work = tmpSfDir()
    val modelUri = s"$work/tiny_lm"
    CorpusLm.trainLm(Seq((1L, "a b a b")).toDF("doc_id", "text"), modelUri)
    // "c c" has no model bigram and no model history; vocab = 2
    val r = CorpusLm.scoreWithLm(s, Seq((9L, "c c c")).toDF("doc_id", "text"), modelUri)
      .collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 2L)
    // -ln((0+1)/(0+2)) = ln 2 rounded to 6 dp
    assert(math.abs(r.getDouble(2) - 0.693147) < 1e-9)
  }
}
