package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-contract expectations over the warehouse tables — the
  * Great-Expectations-style audit a pipeline runs before promoting a
  * snapshot: referential integrity (FK coverage), domain ranges, key
  * uniqueness, and column-consistency invariants, each reported as
  * (check_name, n_rows, n_violations, pass). A release gate reads ONE
  * table instead of eyeballing dashboards; a violation count (not a
  * boolean) is what lets an operator triage severity.
  *
  * Reference context: the reference trusts its Postgres DDL
  * constraints (`/root/reference/main.py` create-table primary keys)
  * — on a lakehouse nothing enforces them at write time, so the
  * engine must CHECK them (same reasoning as the J2/A4 dedup
  * operators).
  *
  * Scale shape: one aggregation pass per audited table (the
  * conditional violation counts share a single scan via one
  * multi-aggregate), plus one anti-join per FK check (equi-join on
  * the key — AQE broadcasts the distinct-key side when it fits; at
  * 100 TB this is the standard fact×dim integrity probe). The final
  * frame is |checks| rows — nothing corpus-sized leaves an executor.
  */
object Expectations {

  private def checkRow(name: String, rows: Column, viol: Column): Column =
    struct(lit(name).as("check_name"), rows.cast("long").as("n_rows"), viol.cast("long").as("n_violations"))

  /** One scan of `df`, many conditional checks: returns (check,
    * n_rows, n_violations) rows via a single aggregate + explode.
    */
  private def scanChecks(df: DataFrame, checks: (String, Column)*): DataFrame =
    df.agg(
      count(lit(1)).as("__n"),
      checks.map { case (n, c) => coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L)).as(s"__v_$n") }: _*
    ).select(
      explode(
        array(checks.map { case (n, _) => checkRow(n, col("__n"), col(s"__v_$n")) }: _*)
      ).as("x")
    ).select(col("x.check_name"), col("x.n_rows"), col("x.n_violations"))

  /** FK coverage: fact rows whose key has no match in the dimension.
    * The dim side collapses to distinct keys first (map-side
    * combinable), so the anti-join probe carries keys only.
    */
  private def fkCheck(name: String, fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String): DataFrame = {
    val facts = fact.select(col(factKey).as("__k"))
    val keys = dim.select(col(dimKey).as("__k")).distinct()
    val viol = facts.join(keys, Seq("__k"), "left_anti")
    facts
      .agg(count(lit(1)).as("__n"))
      .crossJoin(viol.agg(count(lit(1)).as("__v")))
      .select(checkRow(name, col("__n"), col("__v")).as("x"))
      .select(col("x.check_name"), col("x.n_rows"), col("x.n_violations"))
  }

  /** The quarantine (dead-letter) channel: rows failing a contract
    * check are diverted with a typed reason instead of silently
    * landing — the ingest-side counterpart of [[dataExpectations]]'s
    * batch audit. The corpus itself is clean (the audit proves it),
    * so violations are INJECTED deterministically by event_id moduli
    * (the Pii.injectSql fixture convention: a deployment's stream
    * already carries its bad rows); reasons apply in a fixed
    * precedence so a multi-fault row has one deterministic tag.
    * Shared by the batch gate and the streaming twin
    * ([[graft.streaming.StreamingQueries.quarantineStream]]) — the
    * checks are per-row expressions, so the stream is stateless
    * (offset log only) and the landed set is row-identical to batch.
    */
  private[graft] def quarantineOver(src: DataFrame): DataFrame =
    src
      .select(
        col("event_id"),
        when(expr("event_id % 131 = 0"), lit(null)).otherwise(col("user_id")).as("u"),
        when(expr("event_id % 97 = 0"), lit(null).cast("double")).otherwise(col("value")).as("v"),
        when(expr("event_id % 113 = 0"), lit("")).otherwise(col("event_type")).as("t"),
      )
      .select(
        col("event_id"),
        when(col("u").isNull, "user_id_null")
          .when(col("v").isNull, "value_null")
          .when(col("t") === "", "event_type_empty")
          .as("reason"),
      )
      .filter(col("reason").isNotNull)

  def quarantine(spark: SparkSession, dir: String): DataFrame =
    // plain read, not Tables.parallel: the checks are trivial per-row
    // CASEs, so a rebalance exchange before them is pure waste (the
    // r9 label-noise wasted-exchange rule; PlanShapeSpec pins zero
    // shuffles here)
    quarantineOver(Tables(spark, dir, "events"))

  /** The full expectations suite over the warehouse snapshot. */
  def dataExpectations(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables.parallel(spark, dir, "lineitem")
    val customer = Tables(spark, dir, "customer")
    val events = Tables.parallel(spark, dir, "events")
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    val parts = Seq(
      fkCheck("orders_custkey_fk", orders, "o_custkey", customer, "c_custkey"),
      fkCheck("lineitem_orderkey_fk", lineitem, "l_orderkey", orders, "o_orderkey"),
      scanChecks(
        orders,
        "orders_totalprice_positive" -> (col("o_totalprice") <= 0.0),
        "orders_orderdate_not_null" -> col("o_orderdate").isNull,
      ),
      scanChecks(
        lineitem,
        "lineitem_quantity_range" -> (col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
        "lineitem_discount_range" -> (col("l_discount") < 0.0 || col("l_discount") > 1.0),
      ),
      customer
        .agg(count(lit(1)).as("__n"), (count(lit(1)) - countDistinct(col("c_custkey"))).as("__v"))
        .select(checkRow("customer_custkey_unique", col("__n"), col("__v")).as("x"))
        .select(col("x.check_name"), col("x.n_rows"), col("x.n_violations")),
      scanChecks(
        events,
        "events_ts_not_null" -> col("ts").isNull,
        "events_value_not_null" -> col("value").isNull,
      ),
      docs
        .agg(
          count(lit(1)).as("__n"),
          (count(lit(1)) - countDistinct(col("doc_id"))).as("__vu"),
          coalesce(sum(when(length(col("text")).cast("long") =!= col("n_chars"), 1L).otherwise(0L)), lit(0L)).as("__vc"),
        )
        .select(
          explode(array(
            checkRow("documents_docid_unique", col("__n"), col("__vu")),
            checkRow("documents_nchars_consistent", col("__n"), col("__vc")),
          )).as("x"))
        .select(col("x.check_name"), col("x.n_rows"), col("x.n_violations")),
      scanChecks(
        emb,
        "embeddings_dim64" -> (size(col("embedding")) =!= 64),
      ),
    )
    parts
      .reduce(_.unionByName(_))
      .withColumn("pass", (col("n_violations") === 0L).cast("int"))
  }
}
