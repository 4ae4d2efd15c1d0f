package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.sources.Tables

/** The native CosineSimilarity expression must be bit-identical to
  * the ordered-fold built-in composition (which the DuckDB oracle
  * mirrors) — interpreted AND codegen paths.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("native expression == ordered fold, bit for bit, on real embeddings") {
    val e = Tables(spark, sf, "embeddings")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") && (col("ib") - col("ia") <= 3))
    val diff = pairs
      .select(
        VectorFunctions.cosine(col("ea"), col("eb")).as("native"),
        VectorFunctions.cosineFold(col("ea"), col("eb")).as("fold"),
      )
      .filter(col("native") =!= col("fold"))
      .count()
    assert(diff == 0, s"$diff pairs differ between native and fold cosine")
  }

  test("known values") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
    ).toDF("a", "b", "want")
    val bad = df
      .select(VectorFunctions.cosine(col("a"), col("b")).as("got"), col("want"))
      .filter(abs(col("got") - col("want")) > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("nulls propagate") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]),
    ).toDF("a", "b")
    val r = df.select(VectorFunctions.cosine(col("a"), col("b")).as("c")).head
    assert(r.isNullAt(0))
  }

  test("mismatched lengths yield NULL, same as the composed fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array(1.0f), Array(1.0f, 2.0f, 3.0f)),
    ).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      VectorFunctions.cosineFold(col("a"), col("b")).as("fold"),
    ).collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)),
      "length mismatch must be NULL on both the native and composed paths")
  }
}
