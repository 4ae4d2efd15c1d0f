package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: one JSON line with per-query seconds on
  * SPARK_GRAFT_SF_DIR. Queries are warmed up once on the smallest
  * corpus first so the timings measure steady-state execution
  * (codegen compiled, classes JIT'd, parquet footers cached) rather
  * than first-call Janino compilation — standard benchmark practice
  * (JMH warmup) and representative of a long-lived cluster session.
  */
object Bench {

  /** Full materialization via the no-op v2 sink: every row is
    * computed and handed to the writer, but nothing is persisted. A
    * bare count() would let Catalyst prune projection expressions on
    * map-only queries, flattering them into scan+count timings.
    */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** A timed run must do its own work: memoized source relations and
    * shared streaming-pass results from a previous run would otherwise
    * make later runs nearly free.
    */
  private def resetCaches(): Unit = {
    graft.sources.Tables.invalidate()
    graft.streaming.StreamGate.invalidate()
    graft.operators.Dedup.invalidate()
    graft.operators.IvfIndex.invalidate()
    graft.operators.PqIndex.invalidate()
    graft.operators.Similarity.invalidate()
    graft.operators.Sampling.invalidate()
    graft.operators.RelationalQueries.invalidate()
    graft.operators.TextAnalysis.invalidate()
    graft.operators.Multimodal.invalidate()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Matched-pair provenance input (the r12 advice): resolve and
    // VALIDATE the prior artifact BEFORE the timed runs — an
    // unreadable file or a cross-SF artifact discovered only at
    // emission time would discard both completed timed passes (the
    // r13 advice). Unreadable/unparseable → stderr + run unmerged
    // (the artifact then carries no min_with field, so provenance
    // never overstates). An sf MISMATCH is not recoverable by
    // skipping the merge — the caller asked for a pair floor that
    // does not exist at this scale, and a silently unmerged emission
    // would masquerade as a converged pair — so it fails loudly
    // before any work is done.
    val minWithPath = sys.env.get("SPARK_GRAFT_BENCH_MIN_WITH")
    val priorRoot: Option[org.json4s.JValue] = minWithPath.flatMap { p =>
      try Some(org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(java.nio.file.Paths.get(p))))
      catch {
        case e: Exception =>
          System.err.println(
            s"[bench] SPARK_GRAFT_BENCH_MIN_WITH unreadable ($p): ${e.getMessage}; running unmerged")
          None
      }
    }
    priorRoot.foreach { root =>
      root \ "sf" match {
        case org.json4s.JString(priorSf) if priorSf != sfDir =>
          sys.error(
            s"SPARK_GRAFT_BENCH_MIN_WITH sf mismatch: prior artifact measured '$priorSf' " +
              s"but this run targets '$sfDir' — min-merging across scale factors would " +
              "commit bogus per-query minima")
        case _ => () // matching sf, or a pre-r13 artifact without the field
      }
    }

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try materialize(fn(spark, warmDir))
      catch { case _: Throwable => () }
    }
    // untimed steady-state pass on the benchmark corpus itself: the
    // first sfDir execution still pays C2 JIT of the generated code
    // and AQE statistics warm-in (measured ~35% above the third run);
    // JMH-style, the timed runs below measure steady state
    resetCaches()
    SparkEntry.queries.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir))
      catch { case _: Throwable => () }
    }

    // min of two timed runs per query: the host is multi-tenant, so a
    // single sample can be dominated by foreign load; the min is the
    // standard noise-robust point estimate for latency benchmarks.
    // failures must surface as -1, never as a (tiny, bogus) timing
    def timeOne(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // The streaming gates run as memoized CONCURRENT bundles (ST7):
    // the first member to execute pays the whole bundle's checkpoint
    // + state-store setup and every sibling then reads the memoized
    // result for ~0. Per-query attribution must not hand the entire
    // bundle to whichever member ran first (round 7 reported
    // stream_dedup_sink at 4.9 s vs 0.03 s siblings), so each bundle
    // is timed ONCE per run (its setup+execution wall time, triggered
    // through its first member), members are then timed individually
    // (their marginal cost on the shared results), and the bundle
    // time is amortized equally across members. The raw bundle
    // timings are emitted alongside the per-query map ("bundles") so
    // the artifact is self-describing.
    val bundles: Seq[(String, Seq[String])] = Seq(
      "stream_gate" -> Seq(
        "stream_votes_per_candidate", "stream_votes_windowed",
        "stream_similarity_topk", "stream_turnout_by_location",
        "stream_interval_join"),
      "stream_sink" -> Seq(
        "stream_interval_join_sink", "stream_similarity_topk_sink",
        "stream_dedup_sink", "stream_quality_route_sink"),
    )
    val bundled: Set[String] = bundles.flatMap(_._2).toSet
    def timeAll(): (Map[String, Double], Map[String, Double]) = {
      resetCaches()
      val times = scala.collection.mutable.Map.empty[String, Double]
      val bundleTimes = scala.collection.mutable.Map.empty[String, Double]
      bundles.foreach { case (bname, members) =>
        val wall = timeOne(s"bundle:$bname", SparkEntry.queries(members.head))
        bundleTimes(bname) = wall
        members.foreach { m => times(m) = timeOne(m, SparkEntry.queries(m)) }
        if (wall >= 0) {
          val share = wall / members.size
          members.foreach { m => if (times(m) >= 0) times(m) += share }
        }
      }
      SparkEntry.queries.foreach { case (name, fn) =>
        if (!bundled.contains(name)) times(name) = timeOne(name, fn)
      }
      (times.toMap, bundleTimes.toMap)
    }
    val (run1, bundles1) = timeAll()
    val (run2, bundles2) = timeAll()
    def minMerge(a: Map[String, Double], b: Map[String, Double]): Map[String, Double] =
      a.map { case (k, v) =>
        val w = b(k)
        k -> (if (v < 0 || w < 0) -1.0 else math.min(v, w))
      }
    // Matched-pair provenance (the r12 advice): a pair built from
    // several same-session invocations used to be spliced by hand
    // into a re-serialized artifact that no longer round-tripped
    // through this emitter. SPARK_GRAFT_BENCH_MIN_WITH=<path> instead
    // min-merges a PRIOR emission of this same binary into the
    // current results before emission — the committed artifact is
    // then a verbatim Bench output whose provenance is the
    // "min_with" field. Keys only in the prior artifact are ignored
    // (a removed gate must not haunt the pair); keys only in the
    // current run stay as measured (a new gate has no prior floor).
    // The artifact itself was read + sf-validated BEFORE the timed
    // runs (priorRoot, top of main).
    def priorMap(field: String): Map[String, Double] = priorRoot match {
      case None => Map.empty
      case Some(root) =>
        import org.json4s._
        root \ field match {
          case JObject(fields) =>
            fields.collect {
              case (k, JDouble(v)) => k -> v
              case (k, JInt(v)) => k -> v.toDouble
              case (k, JDecimal(v)) => k -> v.toDouble
            }.toMap
          case _ => Map.empty
        }
    }
    def minWithPrior(cur: Map[String, Double], prior: Map[String, Double]): Map[String, Double] =
      cur.map { case (k, v) =>
        k -> (prior.get(k) match {
          case Some(w) if v >= 0 && w >= 0 => math.min(v, w)
          case _ => v // failed-now stays -1; failed-before keeps now
        })
      }
    val results = minWithPrior(minMerge(run1, run2), priorMap("queries"))
    val bundleResults = minWithPrior(minMerge(bundles1, bundles2), priorMap("bundles"))
    // millisecond-rounded timings: a full-precision double is ~18
    // chars and 158 of them pushed the stdout JSON line past the
    // driver's capture truncation in round 6 (only 60 timings
    // survived). 3 decimals ≈ halves the line and is far below timing
    // noise on a multi-tenant host.
    def fmt(v: Double): String =
      if (v < 0) "-1.0" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // failures stay visible as -1 per query but must not deflate the
    // headline total; n_failed makes a partial run unmistakable
    val ok = results.values.filter(_ >= 0)
    val total = ok.sum
    val nFailed = results.values.count(_ < 0)
    val bs = bundleResults.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // env-sourced paths are interpolated into JSON string literals —
    // escape quote/backslash AND all control chars (a newline or tab
    // in SPARK_GRAFT_BENCH_FULL or the sf dir would break the
    // one-line contract the snapshot parser depends on; the
    // Verify.scala escape rule)
    def jstr(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // provenance only when the merge actually APPLIED — a requested
    // but unreadable prior (priorRoot None) must not be recorded as
    // a pair input it never was
    val minWithField = minWithPath
      .filter(_ => priorRoot.isDefined)
      .map(p => s""","min_with":"${jstr(p)}"""")
      .getOrElse("")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_failed":$nFailed,"queries":$qs,"bundles":$bs,"sf":"${jstr(sfDir)}"$minWithField}"""
    // Tear the engine down BEFORE printing: the eviction gates leave
    // state-store maintenance daemons whose shutdown stacktraces
    // (`RpcEnv already stopped`) trailed the final stdout line in the
    // r12 driver snapshot and ate the metrics tail. StateStore.stop()
    // quiesces the maintenance threads, spark.stop() the rest; both
    // lines then print with nothing left running to write after them.
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case e: Throwable => System.err.println(s"[bench] StateStore.stop: ${e.getMessage}") }
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] spark.stop: ${e.getMessage}") }
    println(line)
    // belt and braces against any stdout capture limit: persist the
    // identical JSON where the round-end auto-commit will pick it up,
    // so the full per-query map always survives for perf comparisons.
    // Path is overridable (and defaults to the working directory, not
    // a hard-coded checkout location); a failed fallback write is
    // logged, never silent.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(fullPath).toAbsolutePath, line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_FULL fallback write to $fullPath failed: ${e.getMessage}")
    }
    // The driver's round snapshot keeps only a bounded TAIL of stdout
    // (2000 chars in rounds 6-10), so the full per-query line above
    // truncates mid-JSON there and the snapshot's "parsed" field ends
    // up null (r9/r10 verdict nit). Emit a LAST line compact enough
    // to always land whole inside any such tail: headline totals, the
    // N slowest gates, and a pointer to the full sidecar. The full
    // line stays first (contract + BENCH_FULL mirror), so nothing
    // downstream loses data — the compact line only makes the
    // snapshot self-describing.
    val slowest = results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,"queries_slowest":$slowest,"bundles":$bs,"full":"${jstr(fullPath)}","sf":"${jstr(sfDir)}"}"""
    println(compact)
    // This forked JVM can never out-print sbt: the parent prints its
    // `[success]` banner AFTER we exit, so the snapshot's literal
    // last line was never the metrics object (BENCH_r13 "parsed":
    // null). The compact line therefore also goes to a sidecar that
    // build.sbt's shutdown hook (sbt's OWN JVM, which exits after the
    // banner) re-prints as the true final stdout line. Failure to
    // write only costs that re-print, never the run.
    val lastPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_LAST", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(lastPath).toAbsolutePath, compact + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LAST sidecar write to $lastPath failed: ${e.getMessage}")
    }
  }
}
