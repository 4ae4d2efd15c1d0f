package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate pair graph — the natural
  * follow-on once a dedup pipeline has materialized its pair set:
  * centrality picks the canonical representative of a duplicate
  * neighborhood better than raw degree, and the triangle census
  * quantifies how clique-like (template/boilerplate families) vs
  * chain-like (drifting near-copies) the duplication structure is.
  *
  * Both operators ride the memoized, persisted MinHash-LSH pair
  * artifact ([[Dedup.minhashLshPairsShared]]), so the expensive
  * banding/verification lineage is paid once per (session, dir)
  * across the whole dedup/graph gate family.
  *
  * Determinism discipline: PageRank is computed in SCALED INTEGER
  * arithmetic (rank × 10^6, integer division) — integer sums are
  * order-independent where float sums are not, so a fixed iteration
  * count yields bit-identical results on any engine and any
  * partitioning; this is the same exact-integer rule the money
  * pipeline uses (RelationalQueries.Num).
  */
object GraphOps {

  /** Both directions of the undirected pair graph. */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairsShared(spark, dir).select("doc_a", "doc_b")
    pairs.union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
  }

  /** Fixed-iteration PageRank on the near-dup graph, scaled-integer
    * arithmetic: pr₀ = 10^6; prₖ₊₁(v) = 0.15·10^6 + 0.85·Σ
    * prₖ(u) div deg(u) over in-neighbors u, all in integer ops.
    *
    * Scale shape: per iteration ONE join of the edge list against the
    * |nodes|-row rank table (AQE picks broadcast while ranks fit)
    * plus one integer-sum aggregation — the textbook distributed PR
    * round. The iteration count is small and fixed, so the rounds
    * build one DAG like the IVF Lloyd loop; an open-ended convergence
    * loop would truncate lineage per round instead (as
    * connectedComponents does). Every node of the pair graph has
    * degree ≥ 1 in both directions, so the contribution sum covers
    * all nodes each round.
    */
  def pagerank(
      spark: SparkSession,
      dir: String,
      iters: Int = 3,
      smallGraphCap: Int = 1 << 17,
  ): DataFrame = {
    // size dispatch (round 14): the Dedup.connectedComponents pattern
    // applied to the bounded-round rank loop — a pair graph under the
    // cap collects off the memoized artifact in one incremental
    // limit(cap+1) job and iterates in exact driver integer math
    // (same div/mod algebra, order-independent integer sums, so the
    // labels are bit-identical — GraphOpsSpec pins fast ==
    // distributed through the cap switch). The distributed loop below
    // is untouched as the scale path; smallGraphCap = 0 disables the
    // dispatch.
    smallEdgeSample(spark, dir, smallGraphCap) match {
      case Some(sample) =>
        import spark.implicits._
        driverPagerank(sample, iters).toDF("doc_id", "pr_scaled")
      case None =>
        val e = edges(spark, dir)
        val deg = e.groupBy("doc_a").agg(count(lit(1)).as("deg"))
        val withDeg = e.join(deg, "doc_a")
        var pr = deg.select(col("doc_a").as("node"), lit(1000000L).as("pr"))
        (1 to iters).foreach { _ =>
          pr = withDeg
            .join(pr, col("doc_a") === col("node"))
            .select(col("doc_b").as("node"), expr("pr div deg").as("c"))
            .groupBy("node")
            .agg(sum(col("c")).as("s"))
            .select(col("node"), (lit(150000L) + expr("(85 * s) div 100")).as("pr"))
        }
        pr.select(col("node").as("doc_id"), col("pr").as("pr_scaled"))
    }
  }

  /** The undirected pair list collected when the graph fits under
    * `cap` edges, else None — one incremental `limit(cap+1)` job over
    * the memoized pair artifact (the connectedComponents probe).
    */
  private def smallEdgeSample(
      spark: SparkSession,
      dir: String,
      cap: Int,
  ): Option[Array[(Long, Long)]] =
    if (cap <= 0) None
    else {
      val sample = Dedup
        .minhashLshPairsShared(spark, dir)
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .limit(cap + 1)
        .collect()
      if (sample.length <= cap) Some(sample.map(r => (r.getLong(0), r.getLong(1)))) else None
    }

  /** Exact driver twin of the distributed PR loop: symmetrized
    * directed edges, deg = out-degree, pr₀ = 10⁶, per round
    * s(b) = Σ pr(a) div deg(a) over in-edges and
    * pr'(v) = 150000 + (85·s) div 100 — all non-negative Long ops,
    * so `/` here IS Spark's `div`.
    */
  private[graft] def driverPagerank(
      pairs: Array[(Long, Long)],
      iters: Int,
  ): Seq[(Long, Long)] = {
    val e = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = e.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    (1 to iters).foreach { _ =>
      val s = scala.collection.mutable.HashMap.empty[Long, Long]
      e.foreach { case (a, b) =>
        pr.get(a).foreach(p => s.update(b, s.getOrElse(b, 0L) + p / deg(a)))
      }
      pr = s.iterator.map { case (n, sum) => n -> (150000L + (85L * sum) / 100L) }.toMap
    }
    pr.toSeq.sortBy(_._1)
  }

  /** One-row census of the near-dup graph: nodes, undirected edges,
    * wedges (open two-paths, Σ deg·(deg−1)/2), triangles, and the
    * global clustering coefficient as a scaled-integer ratio
    * (3·triangles·10^6 div wedges — exact, engine-portable).
    *
    * Triangles are counted by the standard ordered wedge-close join:
    * orient every edge a<b (by doc id), join wedges (a<b<c) against
    * the oriented edge list — each triangle is counted exactly once
    * under any total-order orientation. At scale the skew-hardened
    * variant orients by (degree, id) instead, so every wedge pivot
    * is its edge's LOWER-degree endpoint and a hub's Θ(d²) wedge
    * expansion is avoided; id orientation (used here) is the plain
    * two-shuffle formulation and does NOT provide that bound — swap
    * the orientation key when deploying against a skewed graph.
    */
  def triangleCensus(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairsShared(spark, dir).select("doc_a", "doc_b")
    val e = edges(spark, dir)
    val deg = e.groupBy("doc_a").agg(count(lit(1)).as("deg"))
    val wedgeCount = deg
      .agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      .select(col("n_wedges"))
    // oriented edges (a<b, as emitted): wedges a<b<c close iff (b,c) is an edge
    val w = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .join(pairs.select(col("doc_a").as("b"), col("doc_b").as("c")), "b")
    val triCount = w
      .join(
        pairs.select(col("doc_a").as("a"), col("doc_b").as("c")),
        Seq("a", "c"),
        "left_semi",
      )
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = pairs.agg(count(lit(1)).as("n_edges"))
    val nNodes = e.select(col("doc_a")).distinct().agg(count(lit(1)).as("n_nodes"))
    nNodes
      .crossJoin(nEdges)
      .crossJoin(wedgeCount)
      .crossJoin(triCount)
      .select(
        col("n_nodes"),
        col("n_edges"),
        col("n_wedges"),
        col("n_triangles"),
        expr("CASE WHEN n_wedges > 0 THEN (3 * n_triangles * 1000000) div n_wedges ELSE 0 END")
          .as("clustering_x1e6"),
      )
  }

  /** Seeded label propagation on the near-dup graph: a deterministic
    * 1/4 of the graph's documents (salted content-hash bucket) act as
    * labeled seeds; `rounds` synchronous frontier expansions spread
    * each seed's id outward, every node adopting the lexicographic
    * minimum (hop distance, seed id) it has seen. Unlike the
    * connected-components fixpoint this is BOUNDED-ROUND and
    * PARTIALLY SEEDED — the semi-supervised "spread the labels you
    * have" primitive (quality flags, license tags, topic marks
    * radiating through duplicate neighborhoods) — and emits hop
    * distance, which the CC fixpoint never tracks.
    *
    * Determinism: (dist, seed) packs into one BIGINT as
    * dist·10^12 + seed — min over the packed value IS the
    * lexicographic min, and integer mins are order-independent, so a
    * fixed round count is bit-identical on any engine/partitioning
    * (the PageRank rule). Bound: doc ids must stay below 10^12;
    * repack at 10^15 if a corpus exceeds it (dist ≤ 3 keeps even
    * that far inside 2^63).
    *
    * Scale shape: rides the memoized pair artifact; each round is ONE
    * join of the edge list against the current |reached|-row label
    * table (AQE broadcasts while it fits) plus one min-aggregation.
    * Unlike [[pagerank]] — whose rounds reference the previous rank
    * table exactly once, so the fixed DAG evaluates linearly — each
    * round here references the label table TWICE (the frontier join
    * and the union that retains already-reached nodes), doubling the
    * un-truncated lineage per round: 2^rounds evaluations of the seed
    * scan. The per-round localCheckpoint (the [[kCorePeeling]] /
    * [[Dedup.connectedComponents]] rule) keeps it linear.
    */
  def labelPropagation(
      spark: SparkSession,
      dir: String,
      rounds: Int = 3,
      smallGraphCap: Int = 1 << 17,
  ): DataFrame = {
    val e = edges(spark, dir)
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    val seeds = e
      .select(col("doc_a").as("id"))
      .distinct()
      .join(docs, "id")
      .filter(substring(md5(concat(col("text"), lit("|lpseed"))), 1, 1).isin("0", "1", "2", "3"))
      .select(col("id"), col("id").as("enc"))
    // size dispatch (round 14, the pagerank/connectedComponents
    // pattern): under the cap the seed table (≤ graph nodes) and the
    // pair list collect in two bounded jobs and the min-label rounds
    // run in exact driver integer math — bit-identical labels (the
    // packed (dist, seed) min is order-independent), pinned fast ==
    // distributed in GraphOpsSpec. The distributed per-round
    // localCheckpoint loop stays as the scale path.
    smallEdgeSample(spark, dir, smallGraphCap) match {
      case Some(sample) =>
        import spark.implicits._
        val seedRows = seeds.collect().map(r => (r.getLong(0), r.getLong(1)))
        driverLabelProp(sample, seedRows, rounds).toDF("doc_id", "dist", "seed_id")
      case None =>
        var lbl = seeds.localCheckpoint()
        (1 to rounds).foreach { _ =>
          lbl = e
            .join(lbl, col("doc_a") === col("id"))
            .select(col("doc_b").as("id"), (col("enc") + 1000000000000L).as("enc"))
            .union(lbl)
            .groupBy("id")
            .agg(min(col("enc")).as("enc"))
            .localCheckpoint()
        }
        lbl.select(
          col("id").as("doc_id"),
          expr("enc div 1000000000000").as("dist"),
          pmod(col("enc"), lit(1000000000000L)).as("seed_id"),
        )
    }
  }

  /** Exact driver twin of the distributed label-prop rounds: per
    * round every edge (a → b) with a labeled proposes enc(a) + 10¹²
    * to b, the proposals union the current labels, and each node
    * keeps the minimum — non-negative Long mins, order-independent.
    */
  private[graft] def driverLabelProp(
      pairs: Array[(Long, Long)],
      seeds: Array[(Long, Long)],
      rounds: Int,
  ): Seq[(Long, Long, Long)] = {
    val e = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var lbl: Map[Long, Long] = seeds.toMap
    (1 to rounds).foreach { _ =>
      val m = scala.collection.mutable.HashMap.empty[Long, Long]
      e.foreach { case (a, b) =>
        lbl.get(a).foreach { enc =>
          val v = enc + 1000000000000L
          m.update(b, math.min(m.getOrElse(b, Long.MaxValue), v))
        }
      }
      lbl.foreach { case (id, enc) => m.update(id, math.min(m.getOrElse(id, Long.MaxValue), enc)) }
      lbl = m.toMap
    }
    lbl.toSeq.sorted.map { case (id, enc) =>
      (id, enc / 1000000000000L, enc % 1000000000000L)
    }
  }

  /** Fixed-round k-core peeling census (k=2): per round, the nodes
    * still meeting the degree bar and the edges both of whose
    * endpoints survive — the standard "strip the hair off the dup
    * graph" step that separates incidental pairings from dense
    * template families before expensive clustering. BOUNDED rounds
    * like [[labelPropagation]], not an open-ended fixpoint: the
    * census row per round IS the convergence diagnostic (node count
    * stops moving when the core stabilizes).
    *
    * Scale shape: per round one degree aggregation over the pair
    * graph + two semi-joins against the |kept|-row node set (AQE
    * broadcasts it while it fits) — everything on the pair graph,
    * never the corpus; the memoized pair artifact is paid once per
    * session across the dedup/graph family. Output is |rounds| rows
    * of global aggregates.
    *
    * Lineage is truncated per round (localCheckpoint, the
    * [[Dedup.connectedComponents]] rule — on a cluster, a checkpoint
    * dir / table write): each census row references BOTH the kept
    * node set and the surviving edge set, and the later rounds build
    * on the earlier ones, so without truncation every round's peel
    * chain re-derives all previous rounds separately for the node
    * branch and the edge branch — quadratic recomputation that
    * round 7 measured as 15 s of a 1 s job at sf0.1.
    */
  def kCorePeeling(
      spark: SparkSession,
      dir: String,
      k: Int = 2,
      rounds: Int = 3,
      smallGraphCap: Int = 1 << 17,
  ): DataFrame =
    kCorePeelingOf(
      spark,
      Dedup.minhashLshPairsShared(spark, dir).select("doc_a", "doc_b"),
      k,
      rounds,
      smallGraphCap,
    )

  /** [[kCorePeeling]] over an arbitrary edge set — the injectable
    * form the early-exit spec pins (GraphOpsSpec: a path graph that
    * peels fresh nodes every round exercises the full loop; a
    * triangle converges in round 1 and the remaining census rows
    * must be exact copies).
    */
  private[graft] def kCorePeelingOf(
      spark: SparkSession,
      edges: DataFrame,
      k: Int,
      rounds: Int,
      smallGraphCap: Int = 1 << 17,
  ): DataFrame = {
    import spark.implicits._
    // size dispatch (round 14, the pagerank pattern): an under-cap
    // edge set peels in exact driver integer math — identical census
    // (degree counts and monotone set filters are order-independent);
    // fast == distributed pinned in GraphOpsSpec through this cap.
    // The per-round localCheckpoint loop below stays the scale path.
    if (smallGraphCap > 0) {
      val sample = edges
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .limit(smallGraphCap + 1)
        .collect()
      if (sample.length <= smallGraphCap)
        return driverKCore(sample.map(r => (r.getLong(0), r.getLong(1))), k, rounds)
          .toDF("round", "n_nodes", "n_edges")
    }
    var e = edges
    // Early-exit on fixpoint: peeling is monotone (keep sets and edge
    // sets only shrink), and every node in the symmetrized edge list
    // has degree ≥ 1, so a round that removes NO edge also removed no
    // node — the census of every later round is identical by
    // induction. Detect it as edge-count stability (counts are sound
    // here precisely because of monotonicity: same count ⇒ same set)
    // and emit the remaining census rows as copies. Small/clean
    // corpora converge in one round, so this cuts the 3-round gate to
    // one degree pass + two bounded counts; the counts were being
    // computed per round anyway (the census IS global counts), they
    // just land on the driver now — 2 longs per round, not data.
    var prevEdges = e.count()
    val census = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 1
    var converged = false
    while (r <= rounds && !converged) {
      val sym = e.union(e.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val keep = sym
        .groupBy("doc_a")
        .agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select("doc_a")
        .localCheckpoint()
      e = e
        .join(keep, Seq("doc_a"), "left_semi")
        .join(keep.select(col("doc_a").as("doc_b")), Seq("doc_b"), "left_semi")
        .select("doc_a", "doc_b")
        .localCheckpoint()
      val nEdges = e.count()
      census += ((r, keep.count(), nEdges))
      converged = nEdges == prevEdges
      prevEdges = nEdges
      r += 1
    }
    while (r <= rounds) {
      census += ((r, census.last._2, census.last._3))
      r += 1
    }
    census.toSeq.toDF("round", "n_nodes", "n_edges")
  }

  /** Exact driver twin of the distributed peel: per round degrees
    * over the symmetrized list, keep = nodes meeting the bar, edges
    * filtered to kept endpoints, census row (round, kept, edges);
    * early-exit copies on edge-count stability, exactly as above.
    */
  private[graft] def driverKCore(
      pairs: Array[(Long, Long)],
      k: Int,
      rounds: Int,
  ): Seq[(Int, Long, Long)] = {
    var e = pairs
    var prevEdges = e.length.toLong
    val census = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 1
    var converged = false
    while (r <= rounds && !converged) {
      val deg = scala.collection.mutable.HashMap.empty[Long, Long]
      e.foreach { case (a, b) =>
        deg.update(a, deg.getOrElse(a, 0L) + 1L)
        deg.update(b, deg.getOrElse(b, 0L) + 1L)
      }
      val keep = deg.iterator.collect { case (n, d) if d >= k => n }.toSet
      e = e.filter { case (a, b) => keep(a) && keep(b) }
      val nEdges = e.length.toLong
      census += ((r, keep.size.toLong, nEdges))
      converged = nEdges == prevEdges
      prevEdges = nEdges
      r += 1
    }
    while (r <= rounds) {
      census += ((r, census.last._2, census.last._3))
      r += 1
    }
    census.toSeq
  }

  /** Newman modularity of the SOURCE partition over the near-dup pair
    * graph — "is duplication concentrated within sources, or does it
    * leak across them?" The curation read: high modularity means
    * near-dups are a per-source cleanup; low (or negative) means
    * sources plagiarize each other and cross-source dedup is load-
    * bearing. Per source c the contribution is
    *
    *   q_c = e_c/m − (d_c/2m)²  →  q_c_x1e6 = 1e6·(4·m·e_c − d_c²) div (4·m²)
    *
    * (e_c = intra-source edges, d_c = degree mass, m = edges) — one
    * exact signed integer per source; Q = Σ q_c. Truncation toward
    * zero is identical in Spark `div` and DuckDB `//` (checked for
    * negative numerators), and the products run in DECIMAL(38,0):
    * 4·m·e_c wraps BIGINT once m passes ~10⁹ pairs — real at 100 TB.
    *
    * Scale shape: rides the memoized pair artifact; sources attach by
    * one id-keyed equi-join against the documents dim (corpus-scaling
    * — NO static broadcast, AQE decides from post-filter sizes); the
    * per-source aggregates are |sources|-row; the 1-row m total
    * crossJoins in (bounded). Sources with only cross-source edges
    * keep their d_c mass via the degree side + coalesced e_c = 0.
    */
  def sourceModularity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairsShared(spark, dir).select("doc_a", "doc_b")
    val src = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val labeled = pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
    val m = pairs.agg(count(lit(1)).as("m"))
    val intra = labeled
      .filter(col("sa") === col("sb"))
      .groupBy(col("sa").as("source"))
      .agg(count(lit(1)).as("e_c"))
    val deg = edges(spark, dir).groupBy(col("doc_a").as("doc_id")).agg(count(lit(1)).as("deg"))
    val degBySource = deg
      .join(src, "doc_id")
      .groupBy("source")
      .agg(sum(col("deg")).as("d_c"))
    degBySource
      .join(intra, Seq("source"), "left_outer")
      .crossJoin(broadcast(m))
      .select(
        col("source"),
        coalesce(col("e_c"), lit(0L)).as("e_c"),
        col("d_c"),
        expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * (CAST(4 AS DECIMAL(38,0)) * m * COALESCE(e_c, 0) " +
            "- CAST(d_c AS DECIMAL(38,0)) * d_c)) div " +
            "(CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"
        ).as("q_c_x1e6"),
      )
  }
}
