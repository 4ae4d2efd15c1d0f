package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketch aggregations for 100 TB-scale profiling, where
  * exact distinct/quantile computation would shuffle the world:
  * HyperLogLog++ distinct counts and Greenwald-Khanna quantiles —
  * both single-pass, mergeable, constant-memory per group (that
  * mergeability is what makes them partial/final aggregates with a
  * bounded shuffle, same shape as sum/count).
  *
  * These are NOT in the DuckDB oracle gate: approximate algorithms
  * are engine-specific by construction. Correctness is pinned by
  * error-bound tests against exact results (SketchesSpec).
  */
object Sketches {

  /** Per-group HLL++ alongside the exact count for error inspection. */
  def distinctProfile(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(
        approx_count_distinct(col(valueCol), 0.05).as("approx_distinct"),
        countDistinct(col(valueCol)).as("exact_distinct"),
      )

  /** Greenwald-Khanna approximate quantiles of a numeric column. */
  def quantileProfile(df: DataFrame, valueCol: String, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty, "quantileProfile needs at least one probability")
    df.agg(
      percentile_approx(
        col(valueCol),
        array(probs.map(lit): _*),
        lit(10000),
      ).as("quantiles")
    )
  }

  /** Oracle-gatable HLL++ audit: per event type, the EXACT distinct
    * user count alongside a boolean asserting the sketch landed
    * within its 3σ error envelope (rsd 0.05 → ±15%, floored at a
    * small-count absolute slack where HLL++'s bias-corrected
    * small-range path is near-exact anyway). The approximate value
    * itself is engine-specific and can't be hash-compared; the exact
    * count and the GUARANTEE are cross-engine facts — the oracle
    * computes the same exact count and a constant-true flag, so a
    * sketch drifting out of its contract fails the gate.
    *
    * HLL merges are max-per-register — commutative and associative —
    * so the estimate is also reproducible across partition orders.
    *
    * Scale shape: one pass, mergeable partials, constant memory per
    * group; the exact twin is the audit the sketch replaces at 100 TB.
    */
  def hllBoundsGate(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.sources.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_distinct"),
        approx_count_distinct(col("user_id"), 0.05).as("__approx"),
      )
      .select(
        col("event_type"),
        col("exact_distinct"),
        (abs(col("__approx") - col("exact_distinct")) <=
          expr("greatest(16L, (exact_distinct * 15) div 100)")).as("within_bound"),
      )

  /** Oracle-gatable Greenwald-Khanna audit: exact rank-rule
    * percentiles of the event value (integer cents) alongside a
    * boolean asserting each `percentile_approx` estimate lies between
    * the exact values at the target rank ± the accuracy contract's
    * rank tolerance (ε = 1/accuracy, so ±⌈εn⌉+1 ranks). GK returns an
    * OBSERVED value whose rank error is bounded by εn for ANY merge
    * order, so the flag is deterministically true while the estimate
    * itself may legitimately vary run-to-run — exactly why the gate
    * pins the bound, not the estimate.
    */
  def gkBoundsGate(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val acc = 10000
    val vals = graft.sources.Tables(spark, dir, "events")
      .select(
        (expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("vc"),
        col("event_id"),
      )
    // SORT-FREE exact ranks (the quantile_histogram rule): a corpus
    // row_number window would single-task-sort every event row — the
    // one shape that cannot survive 100 TB. The value at rank r
    // depends only on the value ORDER, so aggregate to the
    // |distinct cents| histogram (map-side combine) and rank via the
    // cumulative count over that bounded frame: the value at rank r
    // is the smallest vc whose cumulative count reaches r.
    val hist = vals.groupBy("vc").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("vc")).rowsBetween(Window.unboundedPreceding, 0)
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
    // value at the percentile_disc rank and at rank ± tolerance
    // (tolerance ranks clamp to [1, n]), per p
    def exactAt(p: Int, off: String): Column = {
      val target = expr(s"((n - 1) * $p) div 100 + 1 $off")
      val t = greatest(lit(1L), least(col("n"), target))
      min(when(col("cum") >= t, col("vc")))
    }
    val tolExpr = s"(n div $acc + 2)"
    val exactCols = Seq(50, 90, 99).flatMap { p =>
      Seq(
        exactAt(p, "").as(s"ex_$p"),
        exactAt(p, s"- $tolExpr").as(s"lo_$p"),
        exactAt(p, s"+ $tolExpr").as(s"hi_$p"),
      )
    }
    val exact = ranked
      .groupBy(col("n"))
      .agg(exactCols.head, exactCols.tail: _*)
    val approx = vals.agg(
      percentile_approx(col("vc"), array(lit(0.5), lit(0.9), lit(0.99)), lit(acc)).as("ap")
    )
    // one-row frame, referenced by all three output branches below:
    // un-truncated, each union branch re-evaluates BOTH the global
    // rank window and the GK pass (3x the corpus work), and three
    // independent percentile_approx evaluations could even disagree
    // run-to-run. Materializing the single row makes the sketch run
    // once (the double-reference truncation rule).
    val joined = exact.crossJoin(approx).localCheckpoint()
    val rows = Seq(50, 90, 99).zipWithIndex.map { case (p, i) =>
      joined.select(
        lit(p.toLong).as("p"),
        (col(s"ex_$p").cast("double") / 100.0).as("exact_value"),
        col("ap").getItem(i).between(col(s"lo_$p"), col(s"hi_$p")).as("within_bound"),
      )
    }
    rows.reduce(_ unionAll _)
  }
}
