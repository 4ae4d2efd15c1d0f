package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Semantics of the k-core peeling census, against an independent
  * in-memory reference that peels every round with NO early exit —
  * the early-exit rewrite (round 9) must be invisible in the output
  * on every topology, including graphs that keep peeling for more
  * rounds than the budget and graphs that converge immediately.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  /** Reference: literal per-round peel, no early exit, plain Scala. */
  private def referenceCensus(
      pairs: Seq[(Long, Long)],
      k: Int,
      rounds: Int,
  ): Seq[(Int, Long, Long)] = {
    var e = pairs
    (1 to rounds).map { r =>
      val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).view.mapValues(_.size)
      val keep = deg.filter(_._2 >= k).keys.toSet
      e = e.filter(p => keep(p._1) && keep(p._2))
      (r, keep.size.toLong, e.size.toLong)
    }
  }

  private def check(pairs: Seq[(Long, Long)], k: Int = 2, rounds: Int = 3): Unit = {
    // both execution paths must match the reference: the round-14
    // driver size-dispatch (default cap) and the distributed
    // localCheckpoint loop (cap = 0 disables the dispatch)
    Seq(1 << 17, 0).foreach { cap =>
      val got = GraphOps
        .kCorePeelingOf(spark, edgesDf(pairs), k, rounds, smallGraphCap = cap)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
        .toSeq
      assert(got == referenceCensus(pairs, k, rounds), s"pairs=$pairs k=$k cap=$cap")
    }
  }

  test("pagerank fast (driver) == distributed on the corpus pair graph") {
    val sf = "/root/testdata/sf0.001"
    def rows(cap: Int): Seq[(Long, Long)] =
      GraphOps
        .pagerank(spark, sf, smallGraphCap = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
        .toSeq
    val fast = rows(1 << 17)
    val dist = rows(0)
    assert(fast.nonEmpty && fast == dist)
  }

  test("label propagation fast (driver) == distributed on the corpus pair graph") {
    val sf = "/root/testdata/sf0.001"
    def rows(cap: Int): Seq[(Long, Long, Long)] =
      GraphOps
        .labelPropagation(spark, sf, smallGraphCap = cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
        .toSeq
    val fast = rows(1 << 17)
    val dist = rows(0)
    assert(fast.nonEmpty && fast == dist)
  }

  test("path graph peels a fresh layer every round — the full loop runs") {
    // degrees 1,2,2,2,2,2,1: round 1 drops the endpoints, round 2
    // the next layer, round 3 the next — no round is a fixpoint
    check((1L to 6L).map(i => (i, i + 1)))
  }

  test("triangle converges in round 1 — later census rows are exact copies") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    check(tri)
    val rows = GraphOps.kCorePeelingOf(spark, edgesDf(tri), 2, 3).collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).distinct.length == 1)
  }

  test("hair on a core: leaves peel in round 1, the core is stable after") {
    // triangle {1,2,3} plus pendant nodes 10..12 hanging off it
    check(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("empty graph: all-zero census, no failure") {
    check(Seq.empty)
  }

  test("k=3 on a 4-clique with a tail") {
    val clique = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    check(clique ++ Seq((4L, 9L), (9L, 10L)), k = 3)
  }

  test("source modularity matches an independent in-memory recompute") {
    val sf = "/root/testdata/sf0.001"
    val pairs = graft.operators.Dedup.minhashLshPairsShared(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val srcOf = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = pairs.size.toLong
    assert(m > 0, "the sf0.001 pair graph must be non-empty for this pin")
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dC = deg.groupBy { case (id, _) => srcOf(id) }.view.mapValues(_.values.sum).toMap
    val eC = pairs
      .filter { case (a, b) => srcOf(a) == srcOf(b) }
      .groupBy { case (a, _) => srcOf(a) }.view.mapValues(_.size.toLong).toMap
    val expected = dC.map { case (s, d) =>
      val e = eC.getOrElse(s, 0L)
      // BigInt mirrors the DECIMAL(38,0) plan arithmetic exactly,
      // including truncation toward zero for negative numerators
      val q = (BigInt(1000000) * (4 * BigInt(m) * e - BigInt(d) * d)) /
        (4 * BigInt(m) * m)
      (s, e, d, q.toLong)
    }.toSet
    val got = GraphOps.sourceModularity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"modularity rows differ: got $got expected $expected")
    // the partition identities: degree mass sums to 2m, intra edges <= m
    assert(got.toSeq.map(_._3).sum == 2 * m)
    assert(got.toSeq.map(_._2).sum <= m)
  }
}
