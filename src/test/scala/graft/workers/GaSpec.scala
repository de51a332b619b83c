package graft.workers

import graft.SparkFixture
import graft.core.Spec.WorkerValue
import graft.core.Dag.WorkerContext
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** GA connector workers: eviction ordering, chunked upload, idempotent-409
  * creates, scope validations, GA4 audience field handling + throttle —
  * mirroring the reference unit tests in backend/tests/jobs/unit/workers/. */
class GaSpec extends AnyFunSuite with SparkFixture {

  private def ctx(logs: mutable.Buffer[String] = mutable.Buffer.empty) = new WorkerContext {
    def params: Map[String, WorkerValue] = Map.empty
    def generalSettings: Map[String, String] = Map.empty
    def enqueue(wc: String, p: Map[String, WorkerValue], d: Int): Unit = ()
    override def log(msg: String): Unit = logs += msg
  }

  private class FakeImportClient(existing: Seq[(String, String)]) extends Ga.DataImportClient {
    var deleted: Seq[String] = Nil
    val chunks = mutable.Buffer.empty[Int]
    def listUploads(a: String, p: String, d: String): Seq[(String, String)] = existing
    def deleteUploads(a: String, p: String, d: String, ids: Seq[String]): Unit = deleted = ids
    def uploadChunk(a: String, p: String, d: String, chunk: Array[Byte]): Unit =
      chunks += chunk.length
  }

  test("GADataImporter: keep-last-N eviction sorts by uploadTime (ga_utils.py:142-147)") {
    // unsorted listing; times decide order
    val c = new FakeImportClient(Seq(
      ("u3", "2024-03-03"), ("u1", "2024-01-01"), ("u4", "2024-04-04"), ("u2", "2024-02-02")))
    val csv = Files.createTempFile("ga_import", ".csv")
    Files.writeString(csv, "id,value\n1,2\n")
    new Ga.GaDataImporter(spark, Map(
      "csv_uri" -> WorkerValue.S(csv.toString),
      "account_id" -> WorkerValue.S("a"), "property_id" -> WorkerValue.S("p"),
      "dataset_id" -> WorkerValue.S("d"),
      "max_uploads" -> WorkerValue.I(3)), c).execute(ctx())
    // keep newest 3-1=2 (u3,u4): delete the two oldest, oldest first
    assert(c.deleted == Seq("u1", "u2"))
    assert(c.chunks.nonEmpty) // upload happened after eviction
  }

  test("GADataImporter: max_uploads=1 deletes ALL existing uploads") {
    val c = new FakeImportClient(Seq(("u1", "2024-01-01"), ("u2", "2024-02-02")))
    val csv = Files.createTempFile("ga_import1", ".csv")
    Files.writeString(csv, "x\n1\n")
    new Ga.GaDataImporter(spark, Map(
      "csv_uri" -> WorkerValue.S(csv.toString),
      "account_id" -> WorkerValue.S("a"), "property_id" -> WorkerValue.S("p"),
      "dataset_id" -> WorkerValue.S("d"),
      "max_uploads" -> WorkerValue.I(1)), c).execute(ctx())
    assert(c.deleted == Seq("u1", "u2"))
  }

  test("GADataImporter: 1MB chunked upload with final 1.0 progress signal") {
    val c = new FakeImportClient(Nil)
    val big = Files.createTempFile("ga_big", ".csv")
    Files.write(big, Array.fill[Byte](Ga.UploadChunkBytes + 1024)('x'))
    val progress = mutable.Buffer.empty[Double]
    new Ga.GaDataImporter(spark, Map(
      "csv_uri" -> WorkerValue.S(big.toString),
      "account_id" -> WorkerValue.S("a"), "property_id" -> WorkerValue.S("p"),
      "dataset_id" -> WorkerValue.S("d")), c, progress.append).execute(ctx())
    assert(c.chunks == Seq(Ga.UploadChunkBytes, 1024))
    assert(progress.last == 1.0)
    assert(c.deleted.isEmpty) // no max_uploads → kept all
  }

  private class FakeAdmin(conflict: Boolean = false) extends Ga.AdminClient {
    val created = mutable.Buffer.empty[(String, String)]
    val patched = mutable.Buffer.empty[(String, String, String)]
    var audiences: Seq[String] = Nil
    private def maybeConflict(): Unit =
      if (conflict) throw new Ga.HttpStatusException(409, "already exists")
    def createConversionEvent(p: String, body: String): Unit = {
      maybeConflict(); created += (("conversion", body))
    }
    def createCustomDimension(p: String, body: String): Unit = {
      maybeConflict(); created += (("dimension", body))
    }
    def listAudiences(p: String): Seq[String] = audiences
    def createAudience(p: String, body: String): Unit = created += (("audience", body))
    def patchAudience(name: String, mask: String, body: String): Unit =
      patched += ((name, mask, body))
  }

  test("GA4ConversionEventCreator: creates, validates length, idempotent on 409") {
    val admin = new FakeAdmin()
    new Ga.Ga4ConversionEventCreator(Map(
      "ga_property_id" -> WorkerValue.S("123"),
      "event_name" -> WorkerValue.S("purchase")), admin).execute(ctx())
    assert(admin.created == Seq(("conversion", """{"eventName":"purchase"}""")))
    intercept[IllegalArgumentException] {
      new Ga.Ga4ConversionEventCreator(Map(
        "ga_property_id" -> WorkerValue.S("123"),
        "event_name" -> WorkerValue.S("x" * 41)), admin).execute(ctx())
    }
    val logs = mutable.Buffer.empty[String]
    new Ga.Ga4ConversionEventCreator(Map(
      "ga_property_id" -> WorkerValue.S("123"),
      "event_name" -> WorkerValue.S("purchase")), new FakeAdmin(conflict = true))
      .execute(ctx(logs))
    assert(logs.exists(_.contains("already exists")))
  }

  test("GA4CustomDimensionCreator: scope/length validations + USER-only NPA flag") {
    val admin = new FakeAdmin()
    def params(scope: String, param: String) = Map(
      "ga_property_id" -> WorkerValue.S("123"),
      "display_name" -> WorkerValue.S("My Dim"),
      "parameter_name" -> WorkerValue.S(param),
      "scope" -> WorkerValue.S(scope),
      "disallow_ads_personalization" -> WorkerValue.B(true))
    intercept[IllegalArgumentException] {
      new Ga.Ga4CustomDimensionCreator(params("SESSION", "p"), admin).execute(ctx())
    }
    intercept[IllegalArgumentException] { // USER caps parameter at 24 chars
      new Ga.Ga4CustomDimensionCreator(params("USER", "x" * 25), admin).execute(ctx())
    }
    // 25-40 chars is legal for EVENT scope
    new Ga.Ga4CustomDimensionCreator(params("EVENT", "x" * 25), admin).execute(ctx())
    new Ga.Ga4CustomDimensionCreator(params("USER", "short_param"), admin).execute(ctx())
    val Seq(eventBody, userBody) = admin.created.map(_._2).toSeq
    assert(!eventBody.contains("disallowAdsPersonalization")) // EVENT scope: no NPA
    assert(userBody.contains("\"disallowAdsPersonalization\":true"))
  }

  test("GA4 audience ops: output-only fields ignored, immutable drift stripped+warned, insert validated (ga_utils.py:351-397)") {
    def parse(s: String) = JsonMethods.parse(s).asInstanceOf[JObject]
    // target equal to patch except output-only extras → NO update op
    val patch = parse("""{"displayName":"aud1","description":"d","membershipDurationDays":30,"filterClauses":[{"f":1}]}""")
    val target = parse("""{"displayName":"aud1","description":"d","membershipDurationDays":30,"filterClauses":[{"f":1}],"name":"properties/1/audiences/9","adsPersonalizationEnabled":true}""")
    assert(Ga.audienceOperationsGa4(Seq(patch), Map("aud1" -> target)).isEmpty)

    // changed description → update; immutable drift warns and is stripped
    val drifted = parse("""{"displayName":"aud1","description":"NEW","membershipDurationDays":60,"filterClauses":[{"f":1}]}""")
    val warns = mutable.Buffer.empty[String]
    val ops = Ga.audienceOperationsGa4(Seq(drifted), Map("aud1" -> target), warns.append)
    val Seq(Ga.UpdateAudience(name, body)) = ops
    assert(name == "properties/1/audiences/9")
    assert(warns.exists(_.contains("membershipDurationDays")))
    val keys = body.obj.map(_._1)
    assert(!keys.contains("membershipDurationDays") && !keys.contains("filterClauses"))
    assert(keys.contains("description"))

    // unknown audience with missing required fields → error; complete → insert
    intercept[IllegalArgumentException] {
      Ga.audienceOperationsGa4(Seq(parse("""{"displayName":"new1"}""")), Map.empty)
    }
    val full = parse("""{"displayName":"new1","description":"d","membershipDurationDays":30,"filterClauses":[]}""")
    assert(Ga.audienceOperationsGa4(Seq(full), Map.empty) == Seq(Ga.InsertAudience(full)))
  }

  test("GA4AudiencesUpdater: end-to-end with 1 op/s throttle (ga_utils.py:417-419)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ga4_aud")
    Seq(("audA", "descA", 30), ("audB", "descB", 60))
      .toDF("aname", "adesc", "days").write.parquet(s"$dir/rows")
    val template =
      """{"displayName":"$aname","description":"$adesc","membershipDurationDays":$days,"filterClauses":[]}"""
    val admin = new FakeAdmin()
    // audA exists remotely with an older description → update; audB is new → insert
    admin.audiences = Seq(
      """{"displayName":"audA","description":"OLD","membershipDurationDays":30,"filterClauses":[],"name":"properties/1/audiences/7"}""")
    val sleeps = mutable.Buffer.empty[Long]
    new Ga.Ga4AudiencesUpdater(spark, Map(
      "bq_table_id" -> WorkerValue.S(s"$dir/rows"),
      "template" -> WorkerValue.S(template),
      "ga_property_id" -> WorkerValue.S("1")), admin, sleeps.append).execute(ctx())
    assert(admin.patched.map(_._1) == Seq("properties/1/audiences/7"))
    assert(admin.created.map(_._1) == Seq("audience"))
    assert(sleeps == Seq(1000L, 1000L)) // one throttle sleep per operation
    val (_, mask, body) = admin.patched.head
    assert(!mask.split(",").contains("membershipDurationDays")) // immutable stripped
    assert(body.contains("\"description\":\"descA\""))
  }
}
