package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  test("saltedEquiJoin equals the plain join on a 90%-hot-key fact") {
    val s = spark
    import s.implicits._
    // 10k fact rows, 90% on key 0
    val fact = s.range(10000)
      .select((when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 50)).as("k"),
        col("id").as("payload"))
    val dim = s.range(50).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))

    val plain = fact.join(dim, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), salts = 8)
      .select("k", "payload", "name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join key includes the salt (hot key split across partitions)") {
    val s = spark
    import s.implicits._
    val fact = s.range(1000).select(lit(0L).as("k"), col("id").as("payload"))
    val dim = s.range(1).select(col("id").as("k"), lit("x").as("name"))
    val df = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), salts = 4)
    // the optimized plan's join condition must carry the salt column
    val joinConds = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.condition.map(_.sql).getOrElse("")
    }
    assert(joinConds.exists(_.contains("__salt")), s"no salt in join condition: $joinConds")
    // and the fact's single hot key must actually spread across all salts
    val spread = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(4L)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(spread.length == 4)
  }
}
