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

  test("q2 part-filter-before-window equals the oracle's window-then-filter form") {
    // the shipped plan joins the filtered part dim BEFORE the per-part
    // window min (so the window shuffle carries ~1/12 of the regional
    // slice); sound because a per-part min commutes with dropping
    // whole parts. Pin against the literal oracle formulation: window
    // over the full regional relation, part filter after.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = graft.operators.RelationalQueries
    val asiaNations = graft.sources.Tables(spark, sf, "nation")
      .join(
        graft.sources.Tables(spark, sf, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val literal = q
      .derivedPartsupp(spark, sf)
      .join(graft.sources.Tables(spark, sf, "supplier"), col("ps_suppkey") === col("s_suppkey"))
      .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
      .withColumn("__m_cost", min(col("ps_supplycost_c")).over(Window.partitionBy(col("ps_partkey"))))
      .filter(col("ps_supplycost_c") === col("__m_cost"))
      .join(
        graft.sources.Tables(spark, sf, "part").filter(col("p_size") <= 25 && col("p_type") === "LARGE"),
        col("ps_partkey") === col("p_partkey"))
      .select(
        col("s_acctbal").cast("decimal(12,2)").cast("double").as("acctbal"),
        col("s_name"), col("n_name"), col("p_partkey"), col("p_brand"),
        col("ps_supplycost_c").as("supplycost_c"))
      .orderBy(col("acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
    val shipped = q.q2MinCostSupplier(spark, sf)
    assert(shipped.collect().toSeq == literal.collect().toSeq)
  }

  test("derived partsupp is a session-memoized cached artifact") {
    val q = graft.operators.RelationalQueries
    q.invalidate()
    val name = graft.util.NamedArtifact.viewName("graft_partsupp", sf)
    q.derivedPartsupp(spark, sf).count()
    assert(spark.catalog.isCached(name), "derived partsupp should be catalog-cached")
    q.invalidate()
    assert(
      !spark.catalog.tableExists(name),
      "invalidate() must drop the partsupp view so benches re-pay the build",
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
