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
    val got = GraphOps
      .kCorePeelingOf(spark, edgesDf(pairs), k, rounds)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toSeq
    assert(got == referenceCensus(pairs, k, rounds), s"pairs=$pairs k=$k")
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
}
