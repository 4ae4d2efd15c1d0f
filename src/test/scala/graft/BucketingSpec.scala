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

  test("bucketed_join gate: merge join of the co-bucketed warehouse tables plans with zero Exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: other.children.flatMap(walk)
    }
    val df = graft.operators.Bucketing.bucketedJoinSummary(spark, sf)
    // the ONLY exchange allowed is the tiny |segments|-key aggregate's;
    // the join itself must ride the bucket-partitioning of both sides
    val joinSubtree = walk(df.queryExecution.executedPlan)
      .find(_.getClass.getSimpleName.startsWith("SortMergeJoin"))
      .getOrElse(fail(s"no merge join planned:\n${df.queryExecution.executedPlan.toString.take(600)}"))
    assert(
      !joinSubtree.toString.contains("Exchange"),
      s"bucketed gate join still shuffles:\n${joinSubtree.toString.take(600)}",
    )
    // note: per-bucket LOCAL Sorts remain — Spark does not propagate
    // bucket-file sort order to the scan (a bucket can span files), and
    // a local sort is not a shuffle; zero Exchange is the invariant
  }

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
