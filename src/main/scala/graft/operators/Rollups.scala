package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RelationalQueries.Num._
import graft.sources.Tables

/** Hierarchical re-aggregation — the 100 TB alternative to
  * `.rollup()`/`.cube()`.
  *
  * Spark plans grouping sets as Expand + one aggregate: every input
  * row is DUPLICATED once per grouping set before the exchange, so a
  * 2-column cube scans-and-shuffles the corpus ×4. For algebraic
  * aggregates (sum/count/min/max), the coarser sets are exactly
  * derivable from the finest grouping's partials — so aggregate the
  * corpus ONCE at the finest granularity (a few-hundred-row result),
  * then re-aggregate that tiny frame per grouping set. The gate
  * queries keep the declarative rollup/cube plans (operator
  * coverage); equality of the two formulations is pinned in
  * RollupsSpec.
  */
object Rollups {

  /** Union of grouping-set re-aggregations of `finest`, with absent
    * group columns null-filled — the exact row pattern rollup/cube
    * produce. `aggs` must be algebraic over the finest partials.
    */
  private def fromFinest(
      finest: DataFrame,
      groupCols: Seq[String],
      sets: Seq[Seq[String]],
      aggs: Seq[(String, Column)],
  ): DataFrame =
    sets
      .map { s =>
        val g = finest
          .groupBy(s.map(col): _*)
          .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
        val withMissing = groupCols.foldLeft(g) { (df, c) =>
          if (s.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
        }
        withMissing.select(groupCols.map(col) ++ aggs.map(a => col(a._1)): _*)
      }
      .reduce(_.unionAll(_))

  private def finestSales(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(cents(col("l_quantity"))).as("__qc"), count(lit(1)).as("__n"))

  private val salesAggs: Seq[(String, Column)] = Seq(
    "sum_qty" -> moneyFromCents(sum(col("__qc"))),
    "n" -> sum(col("__n")),
  )

  /** Same result as RelationalQueries.rollupSales, one corpus scan. */
  def rollupSalesHierarchical(spark: SparkSession, dir: String): DataFrame =
    fromFinest(
      finestSales(spark, dir),
      Seq("l_returnflag", "l_linestatus"),
      Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq.empty),
      salesAggs,
    )

  /** Same result as RelationalQueries.cubeSales, one corpus scan. */
  def cubeSalesHierarchical(spark: SparkSession, dir: String): DataFrame =
    fromFinest(
      finestSales(spark, dir),
      Seq("l_returnflag", "l_linestatus"),
      Seq(
        Seq("l_returnflag", "l_linestatus"),
        Seq("l_returnflag"),
        Seq("l_linestatus"),
        Seq.empty,
      ),
      salesAggs,
    )
}
