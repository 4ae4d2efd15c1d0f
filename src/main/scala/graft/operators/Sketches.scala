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
}
