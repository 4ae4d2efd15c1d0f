package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Scored, TopKAggregator, VectorFunctions}
import graft.operators.Similarity
import graft.sources.Tables

class TopKAggregatorSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("aggregator top-k equals the window-function top-k on real similarity scores") {
    import spark.implicits._
    val e = Tables(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id").as("id"),
        VectorFunctions.cosine(col("qe"), col("ce")).as("score"),
      )

    val topk = new TopKAggregator(5).toColumn
    val viaAgg = scored
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, score) => Scored(id, score) }
      .agg(topk.name("top"))
      .flatMap { case (q, top) => top.zipWithIndex.map { case (s, i) => (q, (i + 1).toLong, s.id) } }
      .toDF("query_id", "rank", "neighbor_id")

    // the explicit row_number-window formulation — Similarity now
    // routes through the aggregator, so the window form lives here as
    // the executable spec of the ordering/tie-break contract
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    val viaWindow = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    // and the production entry points agree with the window contract too
    val bf = Similarity.bruteForceTopK(spark, sf, nQueries = 8, k = 5)
    assert(bf.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(bf).isEmpty)
  }

  test("degenerate (zero-norm → NaN) scores are excluded from rankings") {
    import spark.implicits._
    // query 0 scored against three neighbors, one of them zero-norm:
    // cosine = 0/0 = NaN. Scala's total order (sortBy(-score)) would
    // rank NaN LAST while Spark's DESC window ranks NaN FIRST — the
    // production path must instead drop the unrankable score, so both
    // formulations agree and no NaN neighbor ever surfaces.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), // query
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)), // zero-norm: cos = NaN
      (3L, Array(0.1f, 0.9f)),
    ).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosine(col("qe"), col("ce")))

    val nanScores = scored.filter(isnan(col("cos"))).count()
    assert(nanScores == 1, "fixture must actually produce a NaN score")

    val ranked = Similarity.topKPerQuery(scored, 2).collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranked.toSeq == Seq((1L, 1L), (2L, 3L)), s"got ${ranked.toSeq}")
  }
}
