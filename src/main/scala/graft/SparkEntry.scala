package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.RelationalQueries
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB oracle in
  * [[oracleSql]] (same column NAMES and cross-engine-deterministic
  * values — see RelationalQueries' determinism rules), unless the
  * operator is not SQL-expressible, in which case the driver records
  * a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.votesPerCandidate(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "votes_per_candidate" -> (RelationalQueries.votesPerCandidate _),
    "turnout_by_location" -> (RelationalQueries.turnoutByLocation _),
    "dedup_votes" -> (RelationalQueries.dedupVotes _),
    "votes_windowed" -> (RelationalQueries.votesWindowed _),
    "q1_pricing_summary" -> (RelationalQueries.q1PricingSummary _),
    "q3_shipping_priority" -> (RelationalQueries.q3ShippingPriority _),
    "q5_local_supplier" -> (RelationalQueries.q5LocalSupplier _),
    "top_orders" -> (RelationalQueries.topOrders _),
    "supplier_rank" -> (RelationalQueries.supplierRank _),
    "rollup_sales" -> (RelationalQueries.rollupSales _),
    "set_ops" -> (RelationalQueries.setOps _),
    "semi_anti_join" -> (RelationalQueries.semiAntiJoin _),
    "scalar_functions" -> (RelationalQueries.scalarFunctions _),
    "agg_functions" -> (RelationalQueries.aggFunctions _),
    // real Structured Streaming execution (file source → state store →
    // update-mode sink → latest-per-key), oracle-checked against the
    // same SQL as the batch twins
    "stream_votes_per_candidate" -> (StreamingQueries.votesPerCandidateStream _),
    "stream_votes_windowed" -> (StreamingQueries.votesWindowedStream _),
  )

  // DuckDB dialect notes (verified on DuckDB 1.0 locally):
  //  - exact money: CAST(round(sum(CAST(x AS DECIMAL(12,2))),2) AS DOUBLE)
  //    matches Spark's round(sum(decimal),2).cast(double) bit-for-bit;
  //  - count(*) is BIGINT = Spark LongType;
  //  - extract(...)/length() return BIGINT in DuckDB → cast to INT to
  //    match Spark's IntegerType.
  private val moneyVal = "CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)"
  private val revenue =
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)"

  def oracleSql: Map[String, String] = Map(
    "votes_per_candidate" ->
      s"""SELECT event_type, $moneyVal AS total_votes, count(*) AS n_events
         |FROM events GROUP BY event_type""".stripMargin,
    "turnout_by_location" ->
      """SELECT n_name, count(*) AS turnout
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name""".stripMargin,
    "dedup_votes" ->
      s"""WITH firsts AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         |    FROM events) WHERE rn = 1)
         |SELECT event_type, count(*) AS n_first_events, $moneyVal AS first_event_value
         |FROM firsts GROUP BY event_type""".stripMargin,
    "votes_windowed" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         |       event_type, $moneyVal AS total_value, count(*) AS n
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(round(sum(CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |       o_orderpriority, $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "supplier_rank" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $revenue AS revenue
         |  FROM lineitem GROUP BY l_suppkey),
         |r AS (
         |  SELECT s_nationkey, l_suppkey, revenue,
         |         rank() OVER (PARTITION BY s_nationkey ORDER BY revenue DESC, l_suppkey) AS rnk
         |  FROM rev JOIN supplier ON l_suppkey = s_suppkey)
         |SELECT n_name, l_suppkey AS suppkey, revenue, CAST(rnk AS BIGINT) AS rnk
         |FROM r JOIN nation ON s_nationkey = n_nationkey
         |WHERE rnk <= 3""".stripMargin,
    "rollup_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "set_ops" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |     rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, count(*) AS n
        |  FROM (SELECT k FROM buyers UNION SELECT k FROM rich)
        |UNION ALL
        |SELECT 'intersect', count(*)
        |  FROM (SELECT k FROM buyers INTERSECT SELECT k FROM rich)
        |UNION ALL
        |SELECT 'except', count(*)
        |  FROM (SELECT k FROM buyers EXCEPT SELECT k FROM rich)""".stripMargin,
    "semi_anti_join" ->
      """SELECT 'with_orders' AS kind, count(*) AS n
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders', count(*)
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "scalar_functions" ->
      """SELECT o_orderkey,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_priority,
        |  upper(o_orderpriority) AS upper_priority,
        |  substring(o_orderpriority, 1, 1) AS priority_digit,
        |  CAST(length(o_orderpriority) AS INT) AS priority_len,
        |  o_orderkey % 7 AS key_mod7,
        |  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size_class,
        |  CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
        |  CAST(extract(month FROM o_orderdate) AS INT) AS order_month
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "agg_functions" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "stream_votes_per_candidate" ->
      s"""SELECT event_type, $moneyVal AS total_votes, count(*) AS n_events
         |FROM events GROUP BY event_type""".stripMargin,
    "stream_votes_windowed" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         |       event_type, $moneyVal AS total_value, count(*) AS n
         |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
