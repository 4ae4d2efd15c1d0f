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

  /** Replicated-dimension salted equi-join — the classic hot-key
    * join remedy for when AQE's runtime skew split cannot apply
    * (e.g. the join feeds a streaming stage, or the skew is in a
    * single key that still overflows a split): the fact side hashes
    * each row into one of `salts` sub-keys, the dimension side
    * replicates into all of them, so a hot join key's probe work
    * spreads over `salts` reducers while every (fact, dim) match
    * still meets exactly once. Result is row-identical to the plain
    * equi-join; the price is dim×salts replication, which is why the
    * REPLICATED side must be the dimension.
    */
  def saltedEquiJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: String,
      salts: Int = 16,
  ): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val f = facts.withColumn("__salt", pmod(xxhash64(col(saltBy)), lit(salts.toLong)))
    val d = dim.withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-guarded blocked self-join for all-pairs-within-block
    * workloads (SimHash source blocks, IVF cells): a plain equi-join
    * on the block key serializes a dominant block's |block|²
    * comparisons into ONE reducer. The guard salts each block into
    * m = ceil(|block| / targetRows) sub-tasks: the `a` side hashes
    * each row (by `saltBy`) into exactly one sub-task, the `b` side
    * replicates into all m, so every (a, b) pair within a block still
    * meets exactly once while per-task work drops from |block|² to
    * ~targetRows·|block| with parallelism m. Total comparison count
    * is unchanged — this buys bounded tasks and cluster-wide spread,
    * the thing that actually stalls a 1000-executor job.
    *
    * Blocks at or under `targetRows` get m = 1: no replication, the
    * plan degenerates to the plain block join. Block sizes come from
    * one count aggregation over `a`'s block column (tiny relative to
    * the pair expansion it guards); the size join is AQE's call — the
    * block-count relation scales with the number of distinct blocks,
    * so it carries no static broadcast hint.
    *
    * Returns the joined frame (a.* ++ b.*, helper columns dropped);
    * callers apply their own pair predicate (id_a < id_b, distance
    * threshold) on top.
    */
  def saltedBlockJoin(
      a: DataFrame,
      b: DataFrame,
      block: String,
      saltBy: String,
      targetRows: Long = 1L << 16,
  ): DataFrame =
    saltedBlockJoinKeepSalt(a, b, block, saltBy, targetRows).drop("__salt")

  /** [[saltedBlockJoin]] with the sub-task id (`__salt`) kept in the
    * output — the observable handle the spec uses to assert that a
    * hot block actually spread over multiple bounded sub-tasks.
    */
  private[graft] def saltedBlockJoinKeepSalt(
      a: DataFrame,
      b: DataFrame,
      block: String,
      saltBy: String,
      targetRows: Long,
  ): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val sizes = a
      .groupBy(col(block))
      .agg(count(lit(1)).as("__bn"))
      // integral ceil-divide: exact at any block size (a double
      // quotient loses integer exactness past 2^53)
      .withColumn("__m", expr(s"(__bn + ${targetRows - 1}) div $targetRows"))
      .select(col(block), col("__m"))
    val aS = a
      .join(sizes, block)
      .withColumn("__salt", pmod(xxhash64(col(saltBy)), col("__m")))
      .drop("__m")
    val bS = b
      .join(sizes, block)
      .withColumn("__salt", explode(sequence(lit(0L), col("__m") - 1)))
      .drop("__m")
    aS.join(bS, Seq(block, "__salt"))
  }
}
