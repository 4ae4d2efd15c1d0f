package graft.streaming

import java.nio.file.Files

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.RelationalQueries.Num._
import graft.sources.Tables

/** Shared single-pass execution of the streaming gate aggregations
  * over the events stream.
  *
  * The reference job runs one independent streaming query per
  * aggregate, so every aggregate re-reads the whole topic
  * (spark-streaming.py:86-103). At 100 TB the source scan dominates;
  * the scale-correct shape is ONE pass that fans out to all
  * aggregates per micro-batch (the mechanism VotePipeline.startFanOut
  * ships for the vote pipeline). This object applies that shape to
  * the gate: one foreachBatch query computes per-batch PARTIAL
  * aggregates for every registered result; partials are monoids
  * (decimal sums, counts), so re-aggregating the accumulated partials
  * after the run yields exactly the one-shot batch answer regardless
  * of micro-batch boundaries — the changelog-consumer contract of the
  * reference, made associative.
  *
  * Results are memoized per (session, dir): the first gate query to
  * ask pays the streaming pass, the rest read their slice.
  * [[invalidate]] drops everything (benchmark hygiene — a timed run
  * must pay the pass once, not ride a previous run's).
  */
object StreamGate {

  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def invalidate(): Unit = cache.clear()

  /** Streaming twin of RelationalQueries.votesPerCandidate. */
  def votesPerCandidate(spark: SparkSession, dir: String): DataFrame =
    result(spark, dir, "votes")

  /** Streaming twin of RelationalQueries.turnoutByLocation. */
  def turnoutByLocation(spark: SparkSession, dir: String): DataFrame =
    result(spark, dir, "turnout")

  private def result(spark: SparkSession, dir: String, which: String): DataFrame =
    synchronized {
      if (!cache.contains((spark, dir, which))) runFanOut(spark, dir)
      cache((spark, dir, which))
    }

  /** One streaming pass over the events source; both aggregates are
    * computed per micro-batch as mergeable partials (executor-side;
    * only the tiny partial rows reach the driver).
    */
  private def runFanOut(spark: SparkSession, dir: String): Unit = {
    val dim = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))

    // dedicated lock: the callback runs on the stream-execution
    // thread while the caller blocks in awaitTermination holding the
    // StreamGate monitor — synchronizing the callback on StreamGate
    // itself would deadlock
    val lock = new Object
    val votesPartials = new ArrayBuffer[Row]()
    val turnoutPartials = new ArrayBuffer[Row]()
    var votesSchema: StructType = null
    var turnoutSchema: StructType = null

    val q = StreamingQueries
      .eventsStream(spark, dir)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt-gate").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val b = batch.persist()
        try {
          // partial, not final: exact integer-cents sum + count merge
          // associatively across micro-batches
          val v = b
            .groupBy("event_type")
            .agg(sum(cents(col("value"))).as("pv"), count(lit(1)).as("pn"))
          val t = b
            .join(broadcast(dim), b("user_id") === dim("c_custkey"))
            .groupBy("n_name")
            .agg(count(lit(1)).as("pt"))
          val vRows = v.collect()
          val tRows = t.collect()
          lock.synchronized {
            votesSchema = v.schema
            turnoutSchema = t.schema
            votesPartials ++= vRows
            turnoutPartials ++= tRows
          }
          ()
        } finally { b.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val (vRows, vSchema, tRows, tSchema) = lock.synchronized {
      (votesPartials.toSeq, votesSchema, turnoutPartials.toSeq, turnoutSchema)
    }
    def ofRows(rows: Seq[Row], schema: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

    // final merge: convert to double only AFTER summing the exact
    // integer-cents partials, so the value is bit-identical to the
    // one-shot batch aggregation (and the DuckDB oracle)
    val votes = ofRows(vRows, vSchema)
      .groupBy("event_type")
      .agg(
        moneyFromCents(sum(col("pv"))).as("total_votes"),
        sum(col("pn")).as("n_events"),
      )
    val turnout = ofRows(tRows, tSchema)
      .groupBy("n_name")
      .agg(sum(col("pt")).as("turnout"))

    cache((spark, dir, "votes")) = votes
    cache((spark, dir, "turnout")) = turnout
  }
}
