package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables
import graft.streaming.VotePipeline

class UtilitiesSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("graft_cosine is callable from SQL via extensions descriptor") {
    // inject on an existing session the same way withExtensions would
    val (ident, info, builder) = GraftExtensions.cosineDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("emb_sql")
    val r = spark
      .sql("SELECT vec_id, graft_cosine(embedding, embedding) AS c FROM emb_sql LIMIT 5")
      .collect()
    assert(r.forall(row => math.abs(row.getDouble(1) - 1.0) < 1e-9))
  }

  test("salted aggregation equals direct aggregation") {
    val events = Tables(spark, sf, "events")
    val salted = Skew
      .saltedSum(events, col("event_type"), col("value").cast("decimal(12,2)"), salts = 8)
      .select(col("k"), col("total").cast("double"), col("n"))
    val direct = events
      .groupBy(col("event_type").as("k"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("total"), count(lit(1)).as("n"))
    assert(salted.except(direct).count() == 0 && direct.except(salted).count() == 0)
  }

  test("rocksdb state store config applies to stateful streaming") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    VotePipeline.useRocksDbStateStore(spark)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int)]
    stream.addData(("a", 1), ("a", 2), ("b", 3))
    val agg = stream.toDF().toDF("k", "v").groupBy("k").agg(sum("v").as("s"))
    val q = VotePipeline.startMemoryQuery(agg, "rocks_test")
    q.processAllAvailable(); q.stop()
    val m = VotePipeline.latestPerKey(spark.table("rocks_test"), Seq("k"), spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 3L, "b" -> 3L))
    // restore default for other suites sharing the session
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
