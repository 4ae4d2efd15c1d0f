package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Parquet is the columnar at-rest format: scans get predicate
  * pushdown, column pruning, and the vectorized reader for free —
  * verified via .explain (PushedFilters / ReadSchema). At 100 TB the
  * same code path applies; only the directory changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
  )

  /** Parquet TIMESTAMP(NANOS) (the `events.ts` column) is not a legal
    * Spark type; read it as a raw nanos long, then convert to a
    * proper TimestampType (µs precision) ourselves. The conf is a
    * dynamic SQLConf, so this works on any caller-provided session.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Like apply, but rebalanced across the cluster. The corpus tables
    * are single small parquet files → a single input partition, which
    * serializes expression-heavy map work (hashing, vector math) on
    * one core. On a real deployment the input is thousands of files
    * and this is a no-op choice; locally the round-robin repartition
    * restores the parallelism the operator is designed for.
    */
  def parallel(spark: SparkSession, dir: String, name: String): DataFrame =
    apply(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)
}
