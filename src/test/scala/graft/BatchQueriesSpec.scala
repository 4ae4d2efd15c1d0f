package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and returns sane results.
  * Exact-value verification against DuckDB happens in the driver's
  * oracle gate (and locally via tools/check_oracle.py); here we pin
  * structural invariants that hold at any scale factor.
  */
class BatchQueriesSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("every declared query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(
      missing.forall(_.startsWith("nosql_")),
      s"queries without oracle must be named nosql_*: $missing",
    )
  }

  /** Gates whose TRUE answer is the empty set at sf0.001 — confirmed by
    * running the oracle SQL directly in DuckDB against /root/testdata/sf0.001.
    * q21: no NATION_7 supplier survives the EXISTS/NOT-EXISTS pair in the
    * 60-order corpus (drop the nation filter and rows appear), so an empty
    * result is correctness, not a broken read.
    */
  val emptyAtSf0001: Set[String] = Set("q21_waiting_supplier")

  test("all queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (emptyAtSf0001(name))
        assert(n == 0, s"$name expected empty at sf0.001 (DuckDB-confirmed) but returned $n rows")
      else
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("latest-per-key max_by aggregation equals the window-rank compaction") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val agg = graft.operators.RelationalQueries.latestEventPerUser(spark, sf)
    val events = graft.sources.Tables(spark, sf, "events")
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val windowed = events
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
      )
    assert(agg.count() == events.select("user_id").distinct().count())
    assert(
      agg.except(windowed).isEmpty && windowed.except(agg).isEmpty,
      "max_by compaction diverged from the window-rank formulation",
    )
  }

  test("votes_per_candidate totals equal whole-table totals") {
    import org.apache.spark.sql.functions._
    val per = graft.operators.RelationalQueries.votesPerCandidate(spark, sf)
    val events = graft.sources.Tables(spark, sf, "events")
    assert(per.agg(sum("n_events")).head.getLong(0) == events.count())
  }

  test("dedup keeps exactly one row per user") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables(spark, sf, "events")
    val first = graft.operators.VotingOps
      .dedupFirstPerKey(events, Seq("user_id"), Seq(col("event_id")))
    assert(first.count() == events.select("user_id").distinct().count())
    // deterministic: keep-first means the min event_id per user
    val viaMin = events.groupBy("user_id").agg(min("event_id").as("event_id"))
    assert(first.select("user_id", "event_id").except(viaMin).count() == 0)
  }

  test("top_orders is the global top 20 by price") {
    import org.apache.spark.sql.functions._
    val top = graft.operators.RelationalQueries.topOrders(spark, sf).collect()
    assert(top.length == 20)
    val prices = top.map(_.getDouble(2))
    assert(prices.sameElements(prices.sortBy(-(_: Double))), "not sorted desc")
    val globalMax = graft.sources.Tables(spark, sf, "orders")
      .agg(max("o_totalprice")).head.getDouble(0)
    assert(prices.head == globalMax)
  }
}
