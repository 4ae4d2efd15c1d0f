package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format coverage: the engine's operators are format-agnostic
  * — the same query over parquet, JSON, and CSV copies of a table
  * produces identical results (schemas declared on read for the
  * text formats, as any production ingest would).
  */
class FormatsSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("same aggregation over parquet, json, and csv copies agrees") {
    val orders = Tables(spark, sf, "orders")
    val dir = Files.createTempDirectory("graft-fmt").toString
    orders.write.mode("overwrite").json(s"$dir/json")
    orders.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")

    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(14,2)")).as("s"))

    val viaParquet = aggOf(orders)
    val viaJson = aggOf(spark.read.schema(orders.schema).json(s"$dir/json"))
    val viaCsv = aggOf(
      spark.read.schema(orders.schema).option("header", "true").csv(s"$dir/csv"))
    assert(viaJson.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaJson).isEmpty)
    assert(viaCsv.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaCsv).isEmpty)
  }
}
