package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for hot-key aggregations and joins.
  *
  * At 100 TB a handful of hot keys (one viral candidate, one giant
  * customer) can pin a single reducer. Two standard remedies, both
  * shipped here:
  *  - AQE skew-join splitting (on by default in GraftSession) for
  *    joins;
  *  - explicit two-phase salted aggregation for aggregates, where
  *    AQE cannot help (stateful/streaming or severe agg skew).
  */
object Skew {

  /** Two-phase salted SUM/COUNT: phase 1 aggregates (key, salt)
    * partials across `salts` buckets, phase 2 merges per key. The
    * hot key's work spreads over `salts` reducers; result is
    * identical to a direct groupBy because SUM/COUNT are commutative
    * monoids.
    *
    * The salt is the input partition id modulo `salts`: phase 1's
    * map-side combine already collapses each partition's rows to one
    * partial per (key, salt) before the shuffle, so a finer
    * within-partition salt would buy nothing — per-partition salting
    * spreads a hot key over min(input partitions, salts) reducers,
    * deterministically and with no per-row id generation.
    */
  def saltedSum(
      df: DataFrame,
      key: Column,
      value: Column,
      salts: Int = 16,
  ): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col("k"), col("__salt"))
      .agg(sum("v").as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum("partial_sum").as("total"), sum("partial_n").as("n"))
}
