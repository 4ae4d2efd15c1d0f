package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.{Sessionize, StreamingQueries}

/** Scale rehearsal for the STATEFUL streaming tier — the one 100 TB
  * axis the batch exponents in BENCH_SCALING.md do not cover:
  * state-store growth. Two gates:
  *
  *  - `stateful_dedup`: the `dropDuplicatesWithinWatermark` sink
  *    lineage (stream_dedup_sink's state shape) — state rows = live
  *    distinct (user_id, event_type) keys;
  *  - `stateful_sessions`: `Sessionize.sessions`'s
  *    `flatMapGroupsWithState` with event-time timeout — state rows =
  *    concurrently-open sessions.
  *
  * Both run over a READ-LIMITED events source (several micro-batches,
  * so state genuinely accumulates and commits per batch rather than
  * living for one monolithic batch), on BOTH state-store providers —
  * the default HDFS-backed in-memory provider and RocksDB (the
  * long-running-deployment posture: state bounded by disk, not
  * executor heap; SURVEY §7.5). Per (gate, provider, sf): min-of-2
  * timed runs after a warmup, and the state-store metrics Spark
  * itself reports (`stateOperators.numRowsTotal` / `memoryUsedBytes`,
  * max over the run's progress events) — measured numbers, not
  * plan-shape assertions.
  *
  * Usage: StatefulScalingBench <out.json> <sf1>=<dir1> ...
  */
object StatefulScalingBench {

  private def partFiles(dir: String, table: String): Int = {
    val d = new java.io.File(s"$dir/$table.parquet")
    if (d.isDirectory) d.listFiles().count(_.getName.endsWith(".parquet")).max(1) else 1
  }

  final case class RunStats(
      sec: Double,
      stateRowsMax: Long,
      stateMemMax: Long,
      landedRows: Long,
      nBatches: Int,
  )

  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    val dirs: Seq[(String, String)] = args.drop(1).toSeq.map { a =>
      val Array(sf, dir) = a.split("=", 2)
      sf -> dir
    }
    val spark = GraftSession.getOrCreate()
    import spark.implicits._

    val providers: Seq[(String, String)] = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> graft.streaming.VotePipeline.RocksDbProviderClass,
    )

    def gateStreams(dir: String): Seq[(String, () => DataFrame)] = {
      // ~8 micro-batches per run regardless of corpus file count
      val chunk = (partFiles(dir, "events") / 8).max(1)
      Seq(
        "stateful_dedup" -> (() => StreamingQueries.streamDedupChunked(spark, dir, chunk)),
        "stateful_sessions" -> (() =>
          Sessionize
            .sessions(
              StreamingQueries
                .eventsStreamChunked(spark, dir, chunk)
                .select(col("user_id"), col("ts"), col("value"))
                .as[Sessionize.SessionEvent],
              gapMs = 3600000L, // the batch user_sessions gap (1 h)
            )
            .toDF()),
      )
    }

    def runOnce(stream: DataFrame): RunStats = {
      val out = StreamingQueries.scratchSinkDir("stateful") + "/out"
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      val t0 = System.nanoTime()
      val q =
        try {
          spark.conf.set("spark.sql.shuffle.partitions", "8")
          val q = stream.writeStream
            .outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", StreamingQueries.scratchSinkDir("stateful-ckpt"))
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          q
        } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      val sec = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.toSeq
      val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal)).maxOption.getOrElse(0L)
      val stateMem = progs.flatMap(_.stateOperators.map(_.memoryUsedBytes)).maxOption.getOrElse(0L)
      val landed = spark.read.schema(stream.schema).parquet(out).count()
      RunStats(sec, stateRows, stateMem, landed, progs.count(_.numInputRows > 0))
    }

    // results(gate|provider)(sf) = stats
    val results =
      scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, RunStats]]

    dirs.foreach { case (sf, dir) =>
      println(s"[stateful] === sf=$sf dir=$dir")
      providers.foreach { case (pname, pcls) =>
        val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        try {
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", pcls)
          gateStreams(dir).foreach { case (gate, mk) =>
            runOnce(mk()) // warmup: JIT + source listing out of the timing
            val r1 = runOnce(mk())
            val r2 = runOnce(mk())
            val best = if (r1.sec <= r2.sec) r1 else r2
            results
              .getOrElseUpdate(s"$gate|$pname", scala.collection.mutable.Map.empty)(sf) = best
            println(
              f"[stateful] $gate%-18s $pname%-8s sf=$sf ${best.sec}%7.2f s  stateRows=${best.stateRowsMax}  stateMB=${best.stateMemMax / 1e6}%.1f  landed=${best.landedRows}  batches=${best.nBatches}")
            // a single-batch run never accumulates state across
            // commits — the measurement this tool exists for would be
            // vacuous (e.g. a single-file events layout → chunk=1 →
            // one monolithic AvailableNow batch). Flag it loudly.
            if (best.nBatches < 2)
              println(
                s"[stateful] WARNING: $gate|$pname sf=$sf ran in ${best.nBatches} micro-batch(es) — " +
                  "state never accumulated across commits; point is NOT a valid scaling measurement " +
                  s"(events layout has ${partFiles(dir, "events")} part file(s); need >= 8 for ~8 batches)")
          }
        } finally prevProvider match {
          case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }

    val sfs = dirs.map(_._1)
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val js = results.toSeq.sortBy(_._1).map { case (k, m) =>
      val per = sfs.flatMap { sf =>
        m.get(sf).map { r =>
          "\"" + sf + "\":{\"sec\":" + fmt(r.sec) + ",\"stateRows\":" + r.stateRowsMax +
            ",\"stateMemBytes\":" + r.stateMemMax + ",\"landed\":" + r.landedRows +
            ",\"batches\":" + r.nBatches + "}"
        }
      }.mkString("{", ",", "}")
      "\"" + k + "\":" + per
    }.mkString("{", ",", "}")
    val line = s"""{"sfs":[${sfs.map("\"" + _ + "\"").mkString(",")}],"gates":$js}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath).toAbsolutePath, line + "\n")
    println(s"[stateful] wrote $outPath")
    spark.stop()
  }
}
