package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketing: the pre-shuffle lever for repeated co-located joins at
  * 100 TB — both sides bucketed on the join key means the join needs
  * NO Exchange at all, verified here against the physical plan.
  */
class BucketingSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("join of co-bucketed tables plans without any shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables(spark, sf, "orders")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
      Tables(spark, sf, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("customer_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(600)}")

      // and the result matches the unbucketed join
      val expected = Tables(spark, sf, "orders")
        .join(
          Tables(spark, sf, "customer").withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey",
        )
      assert(joined.count() == expected.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
