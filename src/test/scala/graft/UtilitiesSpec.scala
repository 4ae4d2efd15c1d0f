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

  test("native functions are callable from SQL via extensions descriptors") {
    // inject on an existing session the same way withExtensions would
    GraftExtensions.descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    Tables(spark, sf, "embeddings").createOrReplaceTempView("emb_sql")
    val r = spark
      .sql("SELECT vec_id, graft_cosine(embedding, embedding) AS c FROM emb_sql LIMIT 5")
      .collect()
    assert(r.forall(row => math.abs(row.getDouble(1) - 1.0) < 1e-9))
    Tables(spark, sf, "documents").createOrReplaceTempView("docs_sql")
    val s = spark
      .sql("""SELECT graft_simhash16(text) AS h16, graft_simhash64(text) AS h64,
             |       graft_word_shingles(text, 3) AS ws, graft_char_shingles(text, 5) AS cs,
             |       graft_minhash_sig(graft_word_shingles(text, 3), 4) AS sig
             |FROM docs_sql LIMIT 5""".stripMargin)
      .collect()
    assert(s.nonEmpty && s.forall(row => !row.isNullAt(0) && !row.isNullAt(1)))
  }

  test("hash splits are deterministic and near the 80/10/10 design fractions") {
    val docs = Tables(spark, sf, "documents")
    val a = graft.operators.Sampling.hashSplitStats(spark, sf)
    val b = graft.operators.Sampling.hashSplitStats(spark, sf)
    assert(a.exceptAll(b).count() == 0, "split assignment is not deterministic")
    val total = docs.count().toDouble
    val train = a.filter(col("split") === "train")
      .agg(sum("n_docs")).head.getLong(0).toDouble
    assert(train / total > 0.7 && train / total < 0.9, s"train fraction ${train / total}")
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
