package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.util.SessionCache

/** Loader for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Parquet is the columnar at-rest format: scans get predicate
  * pushdown, column pruning, and the vectorized reader for free —
  * verified via .explain (PushedFilters / ReadSchema). At 100 TB the
  * same code path applies; only the directory changes.
  *
  * Loaded relations are memoized per (session, dir, name): the
  * DataFrame is an immutable logical plan, so reusing it across
  * queries is free and skips the per-call file listing + parquet
  * schema inference that would otherwise tax every one of the ~45
  * gate queries (the driver runs them all in one session).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
  )

  // weak session keys + weak values: memoization must not pin a
  // session (or its plans) for the JVM lifetime — see SessionCache
  private val cache = new SessionCache[(String, String, Boolean), DataFrame]

  /** Drop every memoized relation (e.g. between benchmark runs, so a
    * timed run cannot ride on a previous run's listing work).
    */
  def invalidate(): Unit = cache.invalidate()

  /** Parquet TIMESTAMP(NANOS) (the `events.ts` column) is not a legal
    * Spark type; read it as a raw nanos long, then convert to a
    * proper TimestampType (µs precision) ourselves. The conf is a
    * dynamic SQLConf, so this works on any caller-provided session.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate(spark, (dir, name, false)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    }

  /** Like apply, but with full-cluster parallelism GUARANTEED for the
    * expression-heavy map work downstream (hashing, vector math).
    *
    * The repartition is conditional: only when the scan yields fewer
    * input partitions than cores (the local test corpus is one small
    * file → one partition, which would serialize the operator on one
    * core). On a real deployment the input is thousands of splits, the
    * condition is false, and NO exchange is added — a blanket
    * repartition would round-robin-shuffle the full corpus on every
    * operator invocation.
    */
  def parallel(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate(spark, (dir, name, true)) {
      val df = apply(spark, dir, name)
      val cores = spark.sparkContext.defaultParallelism
      // physical planning only — no job runs; memoized with the relation
      val scanParts = df.rdd.getNumPartitions
      if (scanParts < cores) df.repartition(cores) else df
    }
}
