package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.RelationalQueries.Num._
import graft.sources.Tables

/** Concurrent single-bundle execution of the streaming gate queries.
  *
  * The reference app runs its streaming aggregations as SEPARATE
  * queries in one job (spark-streaming.py:86-103 — ST7 multi-query
  * concurrency), but each query re-reads the whole topic. This bundle
  * keeps the reference's concurrency shape while fixing the scan
  * economics at both levels:
  *
  *  - the two stateless running aggregates (votes per candidate,
  *    turnout) FAN OUT of one shared pass per micro-batch as
  *    mergeable partials (exact integer-cents sums + counts), so that
  *    pass reads the source once for both — at 100 TB the source scan
  *    dominates and this halves it;
  *  - the stateful windowed aggregation and the stream-static
  *    similarity scoring each need their own query (different state
  *    semantics), but all queries START TOGETHER and are awaited
  *    together, so the gate pays max(query runtimes), not their sum —
  *    exactly how the reference deploys its queries.
  *
  * Results are memoized per (session, dir); [[invalidate]] drops them
  * (benchmark hygiene — a timed run must pay the bundle once, not
  * ride a previous run's).
  */
object StreamGate {

  /** Checkpoint scratch for the AvailableNow gate queries: prefer
    * RAM-backed /dev/shm when present — these checkpoints are
    * throwaway (each gate run creates fresh ones), and the
    * offset/commit/state files are fsync-heavy on a disk-backed tmp.
    * Durable production checkpoints belong on real storage; this
    * helper is only for run-to-completion harness queries.
    */
  private[streaming] def scratchDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm))
      Files.createTempDirectory(shm, prefix).toString
    else Files.createTempDirectory(prefix).toString
  }

  // weak session keys + weak values (see SessionCache): the gate
  // results are collected-row frames that strongly reference the
  // session, so a plain object-level map would pin it forever. An
  // evicted entry just re-runs the bundle — same cost as invalidate()
  private val cache = new graft.util.SessionCache[(String, String), DataFrame]

  def invalidate(): Unit = cache.invalidate()

  /** Streaming twin of RelationalQueries.votesPerCandidate. */
  def votesPerCandidate(spark: SparkSession, dir: String): DataFrame =
    result(spark, dir, "votes")

  /** Streaming twin of RelationalQueries.turnoutByLocation. */
  def turnoutByLocation(spark: SparkSession, dir: String): DataFrame =
    result(spark, dir, "turnout")

  /** Streaming twin of RelationalQueries.votesWindowed (stateful
    * state-store path: watermark + update mode + batch-id collapse).
    */
  def votesWindowed(spark: SparkSession, dir: String): DataFrame =
    result(spark, dir, "windowed")

  /** Streaming similarity scoring against a static query set
    * (stream-static broadcast join), ranked after completion.
    */
  def similarityTopK(spark: SparkSession, dir: String): DataFrame =
    result(spark, dir, "similarity")

  /** Stream-stream interval self-join: for each event, the same
    * user's events in the following 5 minutes. Watermarks bound the
    * join state on both sides (ST6/ST9 surface); inner interval
    * joins emit on match, so append capture is exact.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame =
    result(spark, dir, "interval_join")

  private def result(spark: SparkSession, dir: String, which: String): DataFrame =
    synchronized {
      cache.get(spark, (dir, which)).getOrElse {
        val results = runBundle(spark, dir)
        results.foreach { case (k, v) => cache.put(spark, (dir, k), v) }
        results(which)
      }
    }

  /** One concurrent bundle: three streaming queries started together
    * (fan-out pass, stateful windowed, similarity scoring), all on
    * AvailableNow triggers, awaited together.
    */
  private def runBundle(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    // dedicated lock: callbacks run on stream-execution threads while
    // this thread blocks in awaitTermination holding the StreamGate
    // monitor — synchronizing callbacks on StreamGate would deadlock
    val lock = new Object
    // keyed by batch id and REPLACED per invocation: foreachBatch is
    // at-least-once, so a retried micro-batch must overwrite its own
    // partials, not append a second copy (which would double-count
    // the exact integer-cents sums)
    val votesPartials = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Row]]
    val turnoutPartials = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Row]]
    var votesSchema: StructType = null
    var turnoutSchema: StructType = null
    val windowedRows = new ArrayBuffer[(Long, Row)]()
    val scoredRows = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Row]]
    val joinedRows = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Row]]

    // nation is the bounded 25-row domain and keeps its hint; customer
    // is the corpus-scaling user dimension, so the per-batch
    // events⋈dim join below is AQE's size-based call (a static
    // broadcast would OOM at the 100 TB design point instead of
    // degrading to a shuffle join)
    val dim = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))

    // the gate aggregations have at most a few thousand keys: size
    // the per-query state stores (and the per-batch shuffles inside
    // foreachBatch) accordingly for the bundle's lifetime. Streams
    // clone the session from their execution threads, so the conf
    // stays set until every query has terminated.
    // the bundle's stateful queries (windowed aggregation, interval
    // join) honor the session's configured state-store provider: a
    // production deployment sets RocksDB (VotePipeline
    // .useRocksDbStateStore) so join/window state is bounded by disk,
    // not executor memory, at 100 TB cardinalities — the RocksDB
    // bundle run is pinned green in StreamingAdvancedSpec. The gate
    // harness default stays the in-memory provider: its state is a
    // few thousand keys, where per-batch native store setup dominates.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // none of the bundle queries emit on watermark advancement
      // (update-mode aggregation emits on data; the interval join is
      // INNER, emitting on match) — the trailing no-data micro-batch
      // each query would otherwise run is a pure state-store commit
      // round with no output
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

      // 1) shared fan-out pass: both stateless aggregates as partials
      val qFanOut = StreamingQueries
        .eventsStream(spark, dir)
        .writeStream
        .option("checkpointLocation", scratchDir("graft-ckpt-gate"))
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          val b = batch.persist()
          try {
            // partial, not final: exact integer-cents sums + counts
            // merge associatively across micro-batches
            val v = b
              .groupBy("event_type")
              .agg(sum(cents(col("value"))).as("pv"), count(lit(1)).as("pn"))
            val t = b
              .join(dim, b("user_id") === dim("c_custkey"))
              .groupBy("n_name")
              .agg(count(lit(1)).as("pt"))
            val vRows = v.collect()
            val tRows = t.collect()
            lock.synchronized {
              votesSchema = v.schema
              turnoutSchema = t.schema
              votesPartials(batchId) = vRows
              turnoutPartials(batchId) = tRows
            }
            ()
          } finally { b.unpersist(); () }
        }
        .trigger(Trigger.AvailableNow())
        .start()

      // 2) stateful windowed aggregation: update-mode changelog
      // captured with its EXPLICIT batch id (update mode emits each
      // changed key at most once per batch, so max-batch-id per key
      // is the exact latest-value collapse)
      val windowedAgg = StreamingQueries
        .eventsStream(spark, dir)
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(moneyFromCents(sum(cents(col("value")))).as("total_value"), count(lit(1)).as("n"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"),
          col("total_value"),
          col("n"),
        )
      val windowedSchema = windowedAgg.schema
      val qWindowed = windowedAgg.writeStream
        .outputMode("update")
        .option("checkpointLocation", scratchDir("graft-ckpt-win"))
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          val rows = batch.collect()
          lock.synchronized { windowedRows ++= rows.map(batchId -> _); () }
        }
        .trigger(Trigger.AvailableNow())
        .start()

      // 3) stream-static similarity scoring (append semantics)
      val scored = StreamingQueries.similarityScoredStream(spark, dir)
      val scoredSchema = scored.schema
      val qScored = scored.writeStream
        .outputMode("append")
        .option("checkpointLocation", scratchDir("graft-ckpt-sim"))
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          val rows = batch.collect()
          lock.synchronized { scoredRows(batchId) = rows; () }
        }
        .trigger(Trigger.AvailableNow())
        .start()

      // 4) stream-stream interval self-join (append semantics): the
      // shared lineage — watermarks on both sides + the time-range
      // predicate bound the join state (the standard "events within T
      // of each other" join at scale)
      val joined = StreamingQueries.intervalJoinStream(spark, dir)
      val joinedSchema = joined.schema
      val qJoined = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", scratchDir("graft-ckpt-ij"))
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          val rows = batch.collect()
          lock.synchronized { joinedRows(batchId) = rows; () }
        }
        .trigger(Trigger.AvailableNow())
        .start()

      // if any bundle query fails, stop the others before rethrowing:
      // otherwise the cache is never populated and a retrying caller
      // re-runs the bundle alongside still-running zombie queries
      // (duplicate source scans, orphan scratch checkpoints)
      try {
        qFanOut.awaitTermination()
        qWindowed.awaitTermination()
        qScored.awaitTermination()
        qJoined.awaitTermination()
      } catch {
        case e: Throwable =>
          Seq(qFanOut, qWindowed, qScored, qJoined).foreach { q =>
            try q.stop()
            catch { case stopErr: Throwable => e.addSuppressed(stopErr) }
          }
          throw e
      }

      def ofRows(rows: Seq[Row], schema: StructType): DataFrame =
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

      // an empty source runs zero micro-batches, so the partial
      // schemas may never have been captured — fall back to their
      // statically-known shapes rather than NPE on an empty corpus
      import org.apache.spark.sql.types.{LongType, StringType}
      val emptyVotesSchema = new StructType()
        .add("event_type", StringType).add("pv", LongType).add("pn", LongType)
      val emptyTurnoutSchema = new StructType()
        .add("n_name", StringType).add("pt", LongType)
      val (vRows, vSchema, tRows, tSchema, wRows, sRows, jRows) = lock.synchronized {
        (
          votesPartials.values.flatten.toSeq,
          Option(votesSchema).getOrElse(emptyVotesSchema),
          turnoutPartials.values.flatten.toSeq,
          Option(turnoutSchema).getOrElse(emptyTurnoutSchema),
          windowedRows.toSeq,
          scoredRows.values.flatten.toSeq,
          joinedRows.values.flatten.toSeq,
        )
      }

      // final merges: convert to double only AFTER summing the exact
      // integer-cents partials — bit-identical to the one-shot batch
      // aggregation (and the DuckDB oracle)
      val votes = ofRows(vRows, vSchema)
        .groupBy("event_type")
        .agg(
          moneyFromCents(sum(col("pv"))).as("total_votes"),
          sum(col("pn")).as("n_events"),
        )
      val turnout = ofRows(tRows, tSchema)
        .groupBy("n_name")
        .agg(sum(col("pt")).as("turnout"))

      // windowed changelog → latest row per key by max batch id
      val keyIdx = Seq("hour_start", "event_type").map(windowedSchema.fieldIndex)
      val windowedFinal = wRows
        .groupBy { case (_, r) => keyIdx.map(r.get) }
        .map { case (_, versions) => versions.maxBy(_._1)._2 }
        .toSeq

      // scored appends → per-query top-5 rank (gate-harness-sized)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
      val similarity = ofRows(sRows, scoredSchema)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")

      Map(
        "votes" -> votes,
        "turnout" -> turnout,
        "windowed" -> ofRows(windowedFinal, windowedSchema),
        "similarity" -> similarity,
        "interval_join" -> ofRows(jRows, joinedSchema),
      )
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
    }
  }
}
