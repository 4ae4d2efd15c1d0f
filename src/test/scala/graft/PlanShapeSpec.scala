package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the 100 TB claims made in operator
  * scaladoc, asserted against the actual physical plans so a future
  * edit cannot silently reintroduce a corpus-sized shuffle.
  *
  * Counted on the pre-execution plan (AQE not yet re-planned):
  * shuffle exchanges = data exchanges whose volume scales with the
  * corpus unless stated otherwise; broadcast exchanges are dim-sized
  * by construction.
  */
class PlanShapeSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def walkPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walkPlan(a.executedPlan)
    case other => other +: other.children.flatMap(walkPlan)
  }

  private def collectPlan(df: DataFrame): Seq[SparkPlan] =
    walkPlan(df.queryExecution.executedPlan)

  /** FileSourceScans of `colName` INSIDE the cached artifact builds a
    * plan reads (each DISTINCT cached relation counted once) — the
    * cold-path budget of a memoized-artifact consumer: the consumer's
    * own plan must scan the corpus zero times (the warm pin), and the
    * artifact definition it reads must scan it exactly the documented
    * once (this pin), so a cache-key regression that silently falls
    * back to corpus re-scoring fails one side or the other (r14
    * advice: pin BOTH states, not `<= 1`).
    */
  private def cachedBuildScans(df: DataFrame, colName: String): Int = {
    // Recursive: an artifact's cached definition may itself read a
    // NESTED cached relation (the CacheManager replaces any subtree
    // canonically matching a live cache entry — under full-suite
    // ordering the corpus scan can sit one artifact deeper than it
    // does in a fresh session). Each distinct cached relation is
    // visited once, so a shared nested artifact is never
    // double-counted.
    val seen = scala.collection.mutable.Set.empty[Option[String]]
    def scansOf(plans: Seq[SparkPlan]): Int = {
      val direct = plans.count(p =>
        p.getClass.getSimpleName.startsWith("FileSourceScan") &&
          p.output.exists(_.name == colName))
      val nested = plans
        .collect { case imr: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => imr }
        .groupBy(_.relation.cacheBuilder.tableName)
        .collect { case (name, g) if seen.add(name) => scansOf(walkPlan(g.head.relation.cachedPlan)) }
        .sum
      direct + nested
    }
    collectPlan(df)
      .collect { case imr: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => imr }
      .groupBy(_.relation.cacheBuilder.tableName)
      .collect { case (name, g) if seen.add(name) => scansOf(walkPlan(g.head.relation.cachedPlan)) }
      .sum
  }

  private def shuffles(df: DataFrame): Int =
    collectPlan(df).count(_.isInstanceOf[ShuffleExchangeLike])

  private def broadcasts(df: DataFrame): Int =
    collectPlan(df).count(_.isInstanceOf[BroadcastExchangeLike])

  private def sortMergeJoins(df: DataFrame): Int =
    collectPlan(df).count(_.getClass.getSimpleName.startsWith("SortMergeJoin"))

  test("map-side text analytics plan with zero exchanges") {
    // quality scoring, simhash fingerprints, winnowing summaries: pure
    // per-row expressions — any Exchange here would be a regression
    val quality = graft.operators.TextAnalysis.qualityScores(spark, sf)
    assert(shuffles(quality) == 0, quality.queryExecution.executedPlan.toString.take(500))
    val winnow = graft.operators.TextAnalysis.winnowingStats(spark, sf)
    assert(shuffles(winnow) == 0)
  }

  test("dim-enriched aggregation broadcasts the dims and shuffles only the tiny group-by") {
    val df = graft.operators.RelationalQueries.turnoutByLocation(spark, sf)
    assert(sortMergeJoins(df) == 0, "fact-side join must be broadcast, not sort-merge")
    assert(broadcasts(df) >= 1)
    assert(shuffles(df) <= 1, s"expected only the |nations|-key aggregate exchange, got ${shuffles(df)}")
  }

  test("turnout family never pins a corpus-scaling relation to a broadcast") {
    // nation is a bounded 25-row domain and MAY keep its static hint;
    // customer is the user dimension and scales with the corpus — a
    // ResolvedHint around any subtree containing it would force an
    // OOM at scale instead of degrading to a shuffle join (same
    // species as the removed broadcast(cc) pin in keepBestDedup)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = graft.operators.RelationalQueries.turnoutByLocation(spark, sf)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.nonEmpty, "the bounded nation dim should keep its hint")
    for (h <- hints) {
      val cols = h.child.output.map(_.name)
      assert(
        cols.forall(_.startsWith("n_")),
        s"static broadcast hint wraps a corpus-scaling relation (output: $cols)",
      )
    }
  }

  test("range join probes a broadcast interval table, never a cartesian shuffle") {
    val df = graft.operators.RelationalQueries.rangeJoinBands(spark, sf)
    val plan = collectPlan(df)
    assert(
      plan.exists(_.getClass.getSimpleName.startsWith("BroadcastNestedLoopJoin")),
      "non-equi band join must be a broadcast nested-loop probe of the tiny interval table",
    )
    assert(broadcasts(df) >= 1)
  }

  test("cluster-quota sampling compiles to WindowGroupLimit (per-stratum top-Q, never a full cell sort)") {
    val df = graft.operators.Sampling.clusterQuotaSample(spark, sf)
    val plan = collectPlan(df)
    assert(
      plan.exists(_.getClass.getSimpleName.startsWith("WindowGroupLimit")),
      "the rank<=Q predicate must push into WindowGroupLimit so map tasks keep " +
        "Q-row heaps per cell and a hot cell never fully sorts",
    )
  }

  test("vocab top-k is per-partition TakeOrderedAndProject, never a global sort") {
    // operator-presence pins only: raw exchange counts proved brittle
    // against AQE/conf drift and fail spuriously rather than flagging
    // a real regression — the operators ARE the claim
    val df = graft.operators.TextAnalysis.vocabTopTokens(spark, sf)
    val plan = collectPlan(df)
    assert(
      plan.exists(_.getClass.getSimpleName.startsWith("TakeOrderedAndProject")),
      "global top-k must compile to TakeOrderedAndProject (bounded per-partition heaps)",
    )
    assert(
      !plan.exists(_.getClass.getSimpleName == "SortExec"),
      "a standalone SortExec means the |vocab| table is globally sorted instead of heap-selected",
    )
  }

  test("per-lang top-k is WindowGroupLimit (per-partition candidate pruning before the rank)") {
    val df = graft.operators.TextAnalysis.langTopTokens(spark, sf)
    val plan = collectPlan(df)
    assert(
      plan.exists(_.getClass.getSimpleName.startsWith("WindowGroupLimit")),
      "grouped top-k must prune to <=k candidates per (partition, lang) before the rank exchange",
    )
  }

  test("concurrency peaks: the corpus-sized sweep is day-partitioned, not a global-order window") {
    // the two-level prefix sum's claim: every corpus-sized WindowExec
    // is partitioned (per-user sessionize, per-day sweep); the only
    // unpartitioned window (the cross-day carry) runs AFTER the
    // per-day aggregate, so its input is |days| rows
    val df = graft.operators.RelationalQueries.concurrencyPeaks(spark, sf)
    def walkWithChildren(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walkWithChildren(a.executedPlan)
      case other => other +: other.children.flatMap(walkWithChildren)
    }
    val plan = walkWithChildren(df.queryExecution.executedPlan)
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(
      unpartitioned.size == 1,
      "exactly one unpartitioned window (the |days|-row carry) is allowed",
    )
    // the carry window must sit above the per-day aggregate: its
    // subtree contains a HashAggregate, so it never sees raw bounds
    assert(
      unpartitioned.head.collectLeaves().nonEmpty &&
        walkWithChildren(unpartitioned.head).exists(
          _.getClass.getSimpleName.contains("HashAggregate")
        ),
      "the unpartitioned carry window must consume the per-day aggregate, not corpus rows",
    )
  }

  test("tf-idf scans the corpus text at most once and shuffles only index rows") {
    // df must derive from the tf table (count window), not a second
    // aggregate over the raw corpus — the latter re-expands the tf
    // lineage into a duplicate text scan + duplicate (doc, token)
    // exchange. The tf table itself is the shared materialized
    // retrieval index (TextAnalysis.tfIndexShared): when its cache
    // entry is live the plan reads the in-memory index and scans the
    // corpus text ZERO times (the n-docs scalar prunes to doc_id);
    // on a cold build exactly one text scan feeds the index. Never
    // two — that is the regression this pin exists for.
    // BOTH states pinned (r14 advice, replacing the `<= 1` relaxation),
    // from a clean artifact state: under full-suite ordering a live
    // session carries arbitrary cache entries, and the CacheManager
    // compiles REBUILT artifact definitions against them — invalidate
    // first so the cold-path budget is deterministic
    graft.operators.TextAnalysis.invalidate()
    val df = graft.operators.TextAnalysis.tfIdfTopTerms(spark, sf)
    val plan = collectPlan(df)
    val textScans = plan.count(p =>
      p.getClass.getSimpleName.startsWith("FileSourceScan") && p.output.exists(_.name == "text"))
    assert(textScans == 0, s"corpus text scanned $textScans times outside the tf index")
    val imr = plan.count(_.getClass.getSimpleName.contains("InMemoryTableScan"))
    assert(imr >= 1, "the plan must read the cached tf index")
    assert(
      cachedBuildScans(df, "text") == 1,
      "the tf-index build must scan text exactly once; consumer plan:\n" +
        df.queryExecution.executedPlan.toString.take(2000))
  }

  test("similarity top-k shuffles only bounded top-k buffers") {
    // served-set call: reads the memoized exact-baseline artifact
    // (round 14) — the plan is an in-memory artifact read, never a
    // rescoring of the corpus
    val df = graft.operators.Similarity.bruteForceTopK(spark, sf)
    val imr = collectPlan(df).count(_.getClass.getSimpleName.contains("InMemoryTableScan"))
    // strict (r14 advice): the served call ALWAYS reads the memoized
    // baseline artifact — a zero-IMR plan means the memo stopped
    // engaging and the corpus is being rescored per consumer
    assert(imr >= 1, "served call must read the cached exact-baseline artifact")
    assert(sortMergeJoins(df) == 0)
    assert(shuffles(df) <= 2, s"got ${shuffles(df)} shuffles")
    // the scoring shape itself stays pinned through the non-served
    // path (nQueries != ServedQueryCutoff computes directly):
    // corpus side local rebalance at most; the aggregation exchange
    // carries <= k rows per (query, partition)
    val direct = graft.operators.Similarity.bruteForceTopK(spark, sf, nQueries = 7)
    assert(broadcasts(direct) >= 1, "query side must broadcast")
    assert(sortMergeJoins(direct) == 0)
    assert(shuffles(direct) <= 2, s"got ${shuffles(direct)} shuffles")
  }

  test("n-gram jaccard pipeline is exactly the two posting-list exchanges (plus local rebalance)") {
    val df = graft.operators.Dedup.ngramJaccardPairs(spark, sf)
    // posting lists + pair counts; the third allowed exchange is
    // Tables.parallel's LOCAL small-file rebalance, which disappears
    // on a many-file deployment (conditional repartition)
    assert(shuffles(df) <= 3, s"got ${shuffles(df)} shuffles")
    assert(sortMergeJoins(df) == 0, "size lookups must ride the posting lists, not joins")
  }

  test("edit-ratio verify fetches the corpus texts in ONE scan, not one per pair role") {
    // same union-fetch discipline as the jaccard verify: the static
    // plan carries the banded-signature text scan plus exactly ONE
    // text fetch for both pair roles — a per-role join would carry 3
    def textScans(df: DataFrame): Int =
      collectPlan(df).count(p =>
        p.getClass.getSimpleName.startsWith("FileSourceScan") && p.output.exists(_.name == "text"))
    val df = graft.operators.Dedup.editRatioPairs(spark, sf)
    assert(textScans(df) <= 2)
    assert(sortMergeJoins(df) == 0)
  }

  test("boilerplate scrub is segment-df combine + one doc_id reassembly, never a corpus sort join") {
    // shuffles: <=2 local rebalances (single-file corpus), the
    // count-distinct df combine pair on the segment hash, and the one
    // doc_id reassembly exchange; the hot-hash flag join must stay a
    // hash join (broadcast at fixture scale, shuffle-hash beyond)
    val df = graft.operators.Dedup.boilerplateScrub(spark, sf)
    assert(shuffles(df) <= 5, s"got ${shuffles(df)} shuffles")
    assert(sortMergeJoins(df) == 0)
  }

  test("minhash verify fetches the corpus shingles in ONE scan, not one per pair role") {
    // verifyPairsExact (round 9): the pair list unions its two doc
    // ids and a single doc_id join fetches both roles' arrays — the
    // corpus text lineage must appear exactly twice in the static
    // plan (the banded-signature build + the one fetch), where the
    // two-join formulation it replaced carried three
    def textScans(df: DataFrame): Int =
      collectPlan(df).count(p =>
        p.getClass.getSimpleName.startsWith("FileSourceScan") && p.output.exists(_.name == "text"))
    assert(textScans(graft.operators.Dedup.minhashLshPairs(spark, sf)) <= 2)
  }

  test("simhash pairs hash-shuffle only bucket-size partials and the pair distinct") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = graft.operators.Dedup.simhashHammingPairs(spark, sf)
    // pigeonhole multi-index pairing with the hot-bucket guard: the
    // only hash-partitioned exchanges are (a) the bucket-size COUNT
    // partials (|buckets| rows after map-side combine; the static
    // plan carries one per join side until runtime exchange reuse),
    // each on the single bucket-key expression, and (b) the final
    // pair DISTINCT, which runs on the hamming-filtered SURVIVORS —
    // never on the candidate expansion. Everything else must be
    // Tables.parallel's local round-robin rebalance — absent on a
    // real many-split deployment — i.e. the candidate expansion
    // itself stays a broadcast join at this scale, never a corpus
    // shuffle.
    val hashed = collectPlan(df)
      .collect { case s: ShuffleExchangeLike => s.outputPartitioning }
      .collect { case h: HashPartitioning => h }
    assert(hashed.size <= 3, s"unexpected hash shuffles: $hashed")
    assert(
      hashed.forall(h => h.expressions.length == 1 || h.expressions.length == 4),
      s"a hash shuffle carries neither the bucket key nor the pair-distinct key: $hashed",
    )
    assert(
      hashed.count(_.expressions.length == 4) <= 1,
      s"more than one pair-wide shuffle: $hashed",
    )
  }

  test("embedding near-dup pairs hash-shuffle only the cell-size count partials") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = graft.operators.Similarity.embeddingNearDupPairs(spark, sf)
    // same contract as the simhash pin: the hot-cell guard's only
    // hash exchanges are the |cells|-row count partials
    val hashed = collectPlan(df)
      .collect { case s: ShuffleExchangeLike => s.outputPartitioning }
      .collect { case h: HashPartitioning => h }
    assert(hashed.size <= 2, s"unexpected hash shuffles: $hashed")
    assert(
      hashed.forall(h => h.expressions.length == 1),
      s"a hash shuffle carries more than the cell key: $hashed",
    )
  }

  test("embedding quantization is map-side (rebalance only, no broadcasts)") {
    val df = graft.operators.Similarity.quantizeInt8(spark, sf)
    assert(shuffles(df) <= 1, s"got ${shuffles(df)} shuffles")
    assert(broadcasts(df) == 0)
  }

  test("bloom decontamination confirms with a shuffle join, not a broadcast") {
    // the whole point of the bloom path is the held-out set NOT
    // broadcasting: the confirm must stay a shuffle semi-join even
    // though the local test corpus would easily fit a broadcast
    val df = graft.operators.Sampling.trainTestShingleOverlapBloom(spark, sf)
    assert(broadcasts(df) == 0, "bloom confirm join regressed to a broadcast")
    assert(
      collectPlan(df).exists(p => p.getClass.getSimpleName.startsWith("ShuffledHashJoin")
        || p.getClass.getSimpleName.startsWith("SortMergeJoin")),
      "expected a shuffle-side semi join",
    )
  }

  test("keep-best dedup never pins the cluster graph to a broadcast") {
    // at web-corpus dup rates the cc set is billions of rows; a static
    // broadcast hint would OOM instead of degrading — the strategy
    // must be AQE's size-based call, so the logical plan may contain
    // NO ResolvedHint anywhere (same for the sizes join in
    // nearDupClusters)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (
      df <- Seq(
        graft.operators.Dedup.keepBestDedup(spark, sf),
        graft.operators.Dedup.nearDupClusters(spark, sf),
      )
    ) {
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      assert(hints.isEmpty, s"static join hints in cluster gate plan: $hints")
    }
  }

  test("cluster gates share one memoized cc fixpoint per (session, dir)") {
    graft.operators.Dedup.invalidate()
    val a = graft.operators.Dedup.lshClusters(spark, sf)
    val b = graft.operators.Dedup.lshClusters(spark, sf)
    assert(a eq b, "second cluster-gate call must reuse the memoized cc frame")
    graft.operators.Dedup.invalidate()
  }

  test("exact-set scorers share one memoized pair-common-counts artifact") {
    // jaccard and containment differ only in the final projection —
    // the corpus explode + posting pair expansion must be paid once
    // (round-9: family cost 2.84 s -> 1.72 s at sf0.1)
    graft.operators.Dedup.invalidate()
    graft.operators.Dedup.ngramJaccardPairs(spark, sf).count()
    val ccViews = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_ngram_cc"))
    assert(ccViews.length == 1, s"want exactly one shared artifact view, got ${ccViews.toSeq}")
    assert(spark.catalog.isCached(ccViews.head), "the shared artifact must be cached")
    graft.operators.Dedup.ngramContainmentPairs(spark, sf).count()
    val after = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_ngram_cc"))
    assert(after.length == 1, "containment must ride the SAME artifact, not register a second")
    graft.operators.Dedup.invalidate()
    assert(
      !spark.catalog.listTables().collect().map(_.name).exists(_.startsWith("graft_ngram_cc")),
      "invalidate must drop the artifact view")
  }

  test("pq codebook is memoized alongside the codes artifact") {
    graft.operators.PqIndex.invalidate()
    val a = graft.operators.PqIndex.codebook(spark, sf)
    val b = graft.operators.PqIndex.codebook(spark, sf)
    assert(a eq b, "second codebook call must reuse the memoized frame")
    graft.operators.PqIndex.invalidate()
    assert(
      !spark.catalog.listTables().collect().map(_.name).exists(_.startsWith("graft_pq_codebook")),
      "invalidate must drop the codebook view")
  }

  test("derived-frame analytics scan their corpus exactly once") {
    // bounds/margins/user-sets must derive from the first aggregate,
    // not re-scan the source through a duplicated lineage
    def sourceScans(df: DataFrame, col: String): Int =
      collectPlan(df).count(p =>
        p.getClass.getSimpleName.startsWith("FileSourceScan") && p.output.exists(_.name == col))
    // gap-fill: the spine (bounds + user set) and the join side both
    // consume the SAME per-(user, hour) aggregate — statically two
    // scan nodes, but the identical aggregate exchange is one reused
    // stage at runtime (AQE); the naive formulation carried FOUR
    // independent corpus lineages
    assert(sourceScans(graft.operators.RelationalQueries.hourlyGapFill(spark, sf), "event_id") <= 2)
    assert(sourceScans(graft.operators.RelationalQueries.retentionCohorts(spark, sf), "user_id") == 1)
    assert(sourceScans(graft.operators.TextAnalysis.chi2Contingency(spark, sf), "lang") == 1)
    // bpe/count-min ride the memoized vocab-frequency artifact (round
    // 14): BOTH states pinned strictly (r14 advice) — the consumer
    // scans text zero times (it reads the registered vocab view) and
    // the artifact definition, rebuilt from a clean artifact state
    // (full-suite ordering leaves arbitrary cache entries the
    // CacheManager would fold into a rebuilt definition), scans it
    // exactly once
    graft.operators.TextAnalysis.invalidate()
    assert(sourceScans(graft.operators.TextAnalysis.bpePairStats(spark, sf), "text") == 0)
    assert(cachedBuildScans(graft.operators.TextAnalysis.bpePairStats(spark, sf), "text") == 1)
    assert(sourceScans(graft.operators.TextAnalysis.cdcChunkStats(spark, sf), "text") == 1)
    assert(sourceScans(graft.operators.TextAnalysis.countMinEstimates(spark, sf), "text") == 0)
    assert(cachedBuildScans(graft.operators.TextAnalysis.countMinEstimates(spark, sf), "text") == 1)
    // continuation-pass gates: same single-lineage discipline
    assert(sourceScans(graft.operators.TextAnalysis.langMixDrift(spark, sf), "source") == 1)
    assert(sourceScans(graft.operators.Similarity.centroidDrift(spark, sf), "label") == 1)
    assert(sourceScans(graft.operators.RelationalQueries.dailyUniquesRunning(spark, sf), "user_id") == 1)
    assert(sourceScans(graft.operators.RelationalQueries.itemsetPairs(spark, sf), "user_id") == 1)
    assert(sourceScans(graft.operators.TextAnalysis.quantileHistogram(spark, sf), "text") == 1)
    // both layout groupings ride one fact scan via the per-row explode
    assert(sourceScans(graft.operators.Bucketing.zorderLocality(spark, sf), "l_partkey") == 1)
  }

  test("iterative vector gates never shuffle or join on vec_id") {
    // power iteration computes each step's dot in the row the vector
    // arrived in (broadcast 1-row v array); Lloyd reassignment takes
    // its argmax in place against the collected centroid array — in
    // both, the only shuffles are |dims|- or |cells|-key aggregates
    // and the 1-row collapse. A hashpartitioning on vec_id means the
    // corpus (embeddings included) is being exchanged again.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    def vecIdShuffles(df: DataFrame): Seq[SparkPlan] =
      collectPlan(df).filter {
        case s: ShuffleExchangeLike =>
          s.outputPartitioning match {
            case h: HashPartitioning => h.expressions.exists(_.references.exists(_.name == "vec_id"))
            case _ => false
          }
        case _ => false
      }
    val pit = graft.operators.Similarity.powerIteration(spark, sf)
    assert(vecIdShuffles(pit).isEmpty, "power iteration must not exchange on vec_id")
    // the per-row dot must live INSIDE the generator (let-bound):
    // Catalyst collapses a dot projection above the Generate, which
    // re-evaluates the dims-term fold once per exploded row — a d²
    // blowup. A ProjectExec referencing the broadcast v array means
    // the collapse came back.
    val collapsed = collectPlan(pit).collect {
      case p: org.apache.spark.sql.execution.ProjectExec
          if p.projectList.exists(_.references.exists(_.name == "varr")) => p
    }
    assert(collapsed.isEmpty, "power-iteration dot collapsed above the Generate (d² re-evaluation)")
    graft.operators.IvfIndex.invalidate()
    val km = graft.operators.IvfIndex.kmeansIterated(spark, sf)
    assert(vecIdShuffles(km).isEmpty, "Lloyd rounds must not exchange on vec_id")
  }

  test("continuation-pass gates keep their declared shuffle/join shape") {
    import graft.operators.{RelationalQueries, Similarity, TextAnalysis}
    // RAG chunking is pure map-side explode — zero exchanges
    assert(shuffles(TextAnalysis.ragChunks(spark, sf)) == 0)
    // itemset pairs: per-user set agg + pair groupBy — exactly two
    // shuffles and NO join (the self-join formulation is the oracle's)
    val ip = RelationalQueries.itemsetPairs(spark, sf)
    assert(shuffles(ip) == 2)
    assert(collectPlan(ip).count(_.getClass.getSimpleName.contains("Join")) == 0)
    // centroid drift: single lineage end-to-end, no join anywhere
    assert(collectPlan(Similarity.centroidDrift(spark, sf))
      .count(_.getClass.getSimpleName.contains("Join")) == 0)
    // last-touch attribution: one user-partition window exchange plus
    // the channel aggregate — never a join back
    val at = RelationalQueries.attributionLastTouch(spark, sf)
    assert(collectPlan(at).count(_.getClass.getSimpleName.contains("Join")) == 0)
  }

  test("global broadcast discipline: no gate plan pins a corpus-scaling relation to a broadcast") {
    // The invariant behind the turnout/q3/q5/supplier_rank/outer_join
    // de-pins, enforced over EVERY batch gate plan so the species can
    // never recur: a static broadcast hint (ResolvedHint) may only
    // wrap a subtree whose cardinality does not scale with the
    // corpus. Structurally that means the hinted subtree either
    //   (a) scans no corpus-scaling table at all (nation/region/
    //       literal ranges — fixed domains at every scale factor), or
    //   (b) reduces whatever it scans to a bounded row count before
    //       the hint: a Limit, or a global (no-group) Aggregate, or
    //   (c) is bounded by a documented API contract the plan cannot
    //       express (query-side "vec_id < nQueries", the held-out
    //       decontamination split, |cells|-keyed centroid aggregates)
    //       — those gates sit on an explicit whitelist below, and the
    //       whitelisted hint must still expose the expected bounded-
    //       side columns so a hint on the CORPUS side of the same
    //       gate would fail, not silently pass.
    // Streaming gates are excluded: invoking them executes a full
    // streaming pipeline and returns the post-hoc read-back frame
    // (their hint usage is nation-only / query-side and covered by
    // the streaming suites).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, ResolvedHint}
    import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

    val corpusTables =
      Set("customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")

    // gate → (required bounded-side columns, documented contract)
    val contractBounded: Map[String, (Set[String], String)] = Map(
      "similarity_topk" -> (Set("query_id"), "query side is vec_id < nQueries (≤8 rows) by API contract"),
      "similarity_matryoshka" -> (Set("query_id"), "query side is vec_id < nQueries (≤8 rows) by API contract; all three metric legs share the one broadcast"),
      "similarity_ann_lsh" -> (Set("query_id"), "query side is vec_id < nQueries by API contract"),
      "similarity_ann_multiprobe" -> (Set("query_id"), "probe set is (planes+1)·nQueries rows by API contract"),
      "similarity_ann_recall" -> (Set("query_id"), "both compared paths broadcast only the bounded query side"),
      "similarity_ndcg" -> (Set("query_id"), "both rank lists (brute-force + multi-probe) broadcast only the bounded query/probe side by the nQueries API contract"),
      "similarity_pq_adc" -> (Set("query_id"), "the broadcast is the per-query LUT row set — nQueries rows by API contract"),
      "similarity_pq_rerank" -> (Set("query_id"), "broadcasts are the query LUTs, the TopK-bounded shortlist (≤ nQueries·shortlist rows), and the query vectors — all query-side"),
      "similarity_pq_recall" -> (Set("query_id"), "every compared path broadcasts only query-side bounded sets (LUTs, shortlist, query vectors)"),
      "similarity_pq_ndcg" -> (Set("query_id"), "same serving lineages as similarity_pq_recall: query LUTs, TopK-bounded shortlist, query vectors — all query-side bounded"),
      "similarity_ivf_pq" -> (Set("query_id"), "broadcasts are the nQueries·nProbe probe list and the query LUTs; the candidate set flows through the id-keyed artifact equi-join"),
      "hybrid_rrf_topk" -> (Set("query_id"), "the vector leg's query side is the fixed bm25Queries id list (3 rows) by API contract"),
      "hybrid_rrf_ivfpq" -> (Set("query_id"), "inherits similarity_ivf_pq's query-side broadcasts (nQueries·nProbe probe list, query LUTs) under the hybrid gate name"),
      "pq_refresh_adc_shift" -> (Set("query_id"), "both broadcasts are per-query LUT row sets (stale: nQueries rows; refreshed: nQueries rows per live codebook version — ≤ 2·nQueries) by the ServedQueryCutoff API contract"),
      "sample_importance_weights" -> (Set("r_x1e6"), "the ratio table is bounded by the 4096-bucket md5 hash domain (a groupBy on a bounded key the static path check can't see)"),
      "sample_temperature_mix" -> (Set("sel_4096"), "the broadcast is the per-source target/threshold table — bounded by the |sources| domain (a groupBy on a bounded key the static path check can't see)"),
      "sample_importance_resample" -> (Set("r_x1e6"), "same bounded ratio table, reached twice through the weights lineage (the w_max scalar is a grouping-free aggregate the path check already admits)"),
      "ivf_assign" -> (Set("centroid"), "centroids are one row per cell, |cells| bounded by the label domain"),
      "ivf_kmeans_iterated" -> (Set("centroid"), "per-round centroids, |cells| bounded by the label domain"),
      "vocab_coverage" -> (Set("token"), "vocabulary is top-k limited (TakeOrderedAndProject) before the hint"),
      "lm_doc_score" -> (Set("q"), "the broadcast is the per-(l, r) probability table off the lmBigramShared artifact — bounded by the vocab² model domain (a groupBy on bounded keys the static path check can't see); a deployed quality-filter LM is pruned to servable size by construction (the CCNet convention)"),
      "lm_ppl_split" -> (Set("q"), "the broadcast is the per-(lang, l, r) probability table off the lmBigramShared artifact — |langs|·vocab²-bounded, same contract as lm_doc_score"),
      "lm_doc_novelty" -> (Set("u1"), "the broadcast is the cnt = 1 slice of the lmBigramShared artifact — vocab²-bounded, same contract as lm_doc_score"),
      "bm25_rm3" -> (Set("doc_id"), "the feedback set is the round-1 rank <= fbDocs prefix — |queries|·3 rows by construction (a window-rank filter the static path check can't see); the round-2 expanded-query join carries NO hint (AQE)"),
      "decontamination_overlap" -> (Set("shingle"), "held-out split is broadcastable by documented contract; the Bloom twin covers the un-broadcastable shape"),
      "zscore_outliers" -> (Set("mu_cents"), "per-type stats are |event_type|-bounded (fixed 5-value domain)"),
    )

    def tablesUnder(p: LogicalPlan): Set[String] =
      p.collectLeaves().flatMap {
        case l: LogicalRelation =>
          l.relation match {
            case h: HadoopFsRelation => h.location.rootPaths.map(_.getName)
            case _ => Nil
          }
        case _ => Nil
      }.flatMap(n => corpusTables.find(t => n.startsWith(t))).toSet

    // Bounded must hold on the PATH from the hint down to every
    // corpus leaf — a Limit on a side branch (e.g. a limited dim
    // joined in) bounds nothing about the corpus side, so a bare
    // subtree-exists check would exempt exactly the regression this
    // sweep exists to catch.
    def pathBounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case leaf if leaf.children.isEmpty => tablesUnder(leaf).isEmpty
      case other => other.children.forall(c => tablesUnder(c).isEmpty || pathBounded(c))
    }

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !name.startsWith("stream_")) {
      val df = fn(spark, sf)
      // only BROADCAST-strategy hints can force a corpus into executor
      // memory; shuffle_hash / shuffle_merge hints are the scale-SAFE
      // direction (the bloom confirm join uses one on purpose)
      val hints = df.queryExecution.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
      for (h <- hints) {
        val corpus = tablesUnder(h.child)
        if (corpus.nonEmpty && !pathBounded(h.child)) {
          contractBounded.get(name) match {
            case Some((requiredCols, _)) =>
              val out = h.child.output.map(_.name).toSet
              if (!requiredCols.subsetOf(out))
                failures += s"$name: whitelisted gate hints a subtree over $corpus whose output $out " +
                  s"is not the documented bounded side ($requiredCols)"
            case None =>
              failures += s"$name: static broadcast hint wraps a corpus-scaling subtree over $corpus " +
                "(output: " + h.child.output.map(_.name).mkString(",") + ") — drop the hint and let AQE decide"
          }
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("exact percentile gates rank via histograms, never a corpus row_number window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.RowNumber
    // the quantile_histogram rule applied to the whole exact-rank
    // family: a row_number window partitioned by a ~5-key column
    // sorts a corpus-sized partition per task — the value at a rank
    // depends only on the value order, so ranks come off the
    // cumulative count of the per-(group, value) histogram instead.
    // The remaining windows are cumulative sums over those bounded
    // histogram frames; none may compute row_number.
    val gates = Seq(
      graft.operators.Sketches.gkBoundsGate(spark, sf),
      graft.operators.RelationalQueries.winsorizedStats(spark, sf),
      graft.operators.RelationalQueries.madOutliers(spark, sf),
      graft.operators.TextAnalysis.lengthPercentiles(spark, sf),
      graft.operators.TextAnalysis.langRobustStats(spark, sf),
    )
    for (df <- gates) {
      val rn = collectPlan(df).collect { case w: WindowExec => w }
        .filter(_.windowExpression.exists(_.exists(_.isInstanceOf[RowNumber])))
      assert(rn.isEmpty, s"row_number window in exact-percentile plan: $rn")
    }
  }

  test("bm25 derives doc length by aggregation, never a corpus-wide doc_id window") {
    import org.apache.spark.sql.execution.window.WindowExec
    // round 6 measured the `sum(tf) over (partition by doc_id)` doc
    // length as a second full sort+shuffle of the postings table; dl
    // now rides a |docs|-row groupBy joined into the query-filtered
    // postings. Remaining windows (per-token df over the filtered
    // posting lists, the per-query rank) must never partition by
    // doc_id — that is the corpus-sized shape reappearing
    val df = graft.operators.TextAnalysis.bm25Search(spark, sf)
    val wins = collectPlan(df).collect { case w: WindowExec => w }
    assert(!wins.exists(_.partitionSpec.exists(_.references.exists(_.name == "doc_id"))),
      wins.map(_.partitionSpec.mkString(",")).mkString("; "))
  }

  test("money aggregation keeps the primitive fixed-width buffer (no object aggregation)") {
    // SumScaled128's raison d'être: a two-long UnsafeRow buffer that
    // hash-aggregates as primitives. ObjectHashAggregate appearing
    // here means the buffer regressed to boxed objects
    val df = graft.operators.RelationalQueries.havingFilter(spark, sf)
    val kinds = collectPlan(df).map(_.getClass.getSimpleName)
    assert(kinds.exists(_.startsWith("HashAggregate")), kinds.mkString(","))
    assert(!kinds.exists(_.startsWith("ObjectHashAggregate")), kinds.mkString(","))
  }

  test("quarantine is scan + map-side filter only: zero shuffles, zero joins") {
    // the dead-letter channel's whole point at 100 TB: diversion is a
    // per-row decision on the ingest path — any exchange here means a
    // contract check grew state
    val df = graft.operators.Expectations.quarantine(spark, sf)
    assert(shuffles(df) == 0, df.queryExecution.executedPlan.toString.take(500))
    val kinds = collectPlan(df).map(_.getClass.getSimpleName)
    assert(!kinds.exists(_.contains("Join")), kinds.mkString(","))
    assert(kinds.count(_.startsWith("FileSourceScan")) == 1)
  }

  test("lm doc score: grams join the broadcast LM model; no corpus-row exchange") {
    // the r14 artifact form: the per-(l, r) probability table derives
    // from the memoized lmBigramShared artifact (vocab²-bounded) and
    // BROADCASTs onto the map-side gram explode; the only exchange
    // over corpus-derived rows is the per-doc aggregation, which is
    // partial (map-side combine). A SortMergeJoin or a WindowExec
    // here means the corpus-row count-window form is back — the
    // no-combine exchange of every exploded gram the rewrite removed
    val df = graft.operators.TextAnalysis.lmDocScores(spark, sf)
    val plan = collectPlan(df)
    val kinds = plan.map(_.getClass.getSimpleName)
    assert(kinds.exists(_.startsWith("BroadcastHashJoin")), kinds.mkString(","))
    assert(!kinds.exists(_.startsWith("SortMergeJoin")), kinds.mkString(","))
    // the artifact's own bounded-table marginal window lives inside
    // the cached relation (behind InMemoryTableScan), never here
    assert(
      !plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "a corpus-row count window is back: " + kinds.mkString(","))
  }

  test("quality calibration: join-free, and no exchange carries unaggregated exploded rows") {
    // the r13 union-tag form: the r10 single-scan pin is deliberately
    // RETIRED — that form bought its one scan with a feature-keyed
    // count WINDOW over every exploded (doc, feature) row, i.e. a
    // corpus-wide exchange with no partial aggregation. The new
    // contract: exactly two text scans (one per branch), zero joins
    // (union-tag, the minhashRecallVsExact rule), zero WindowExec,
    // and every aggregation partial (no exchange anywhere sees raw
    // exploded rows — the 100-TB invariant the rewrite exists for)
    val df = graft.operators.TextAnalysis.qualityCalibration(spark, sf)
    val plan = collectPlan(df)
    val kinds = plan.map(_.getClass.getSimpleName)
    assert(!kinds.exists(_.contains("Join")), kinds.mkString(","))
    assert(
      !plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "the no-combine feature window is back")
    val textScans = plan.count(p =>
      p.getClass.getSimpleName.startsWith("FileSourceScan") && p.output.exists(_.name == "text"))
    assert(textScans == 2, s"corpus text scanned $textScans times, expected the two branch scans")
  }

  test("classifier scoring is one doc_id exchange, no joins") {
    // the scale contract of the inline-hash weight path: feature
    // hashing and weighting are per-row codegen, so the whole score
    // is ONE map-side-combinable aggregation — a join or a second
    // exchange appearing here means the weight table materialized
    val df = graft.operators.TextAnalysis.classifierScores(spark, sf)
    assert(shuffles(df) == 1, df.queryExecution.executedPlan.toString.take(500))
    assert(broadcasts(df) == 0)
    val kinds = collectPlan(df).map(_.getClass.getSimpleName)
    assert(!kinds.exists(_.contains("Join")), kinds.mkString(","))
  }
}
