package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, GraphOps}

/** Structural invariants of the graph operators, checked on the real
  * pair graph (the oracle gates pin exact values; these pin the
  * properties that must survive any refactor).
  */
class GraphOpsSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("pagerank covers every pair-graph node with positive, mass-bounded ranks") {
    Dedup.invalidate()
    val pr = GraphOps.pagerank(spark, sf).collect()
    val nodes = Dedup
      .minhashLshPairsShared(spark, sf)
      .selectExpr("doc_a AS d").union(
        Dedup.minhashLshPairsShared(spark, sf).selectExpr("doc_b AS d")
      )
      .distinct()
      .count()
    assert(pr.length == nodes, "every node of the pair graph gets a rank")
    val ranks = pr.map(_.getLong(1))
    assert(ranks.forall(_ >= 150000L), "rank floor is the damping term")
    // integer-division PR only LOSES mass (floor at every step), so
    // total scaled mass never exceeds the initial n × 10^6
    assert(ranks.sum <= nodes * 1000000L, "PR must not create mass")
  }

  test("triangle census satisfies the structural bounds of an undirected graph") {
    val row = GraphOps.triangleCensus(spark, sf).collect().head
    val (nodes, edges, wedges, tris, clust) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(edges <= nodes.toLong * (nodes - 1) / 2, "edge count bounded by complete graph")
    assert(3 * tris <= wedges, "every triangle closes three wedges")
    assert(clust >= 0 && clust <= 1000000L, "clustering coefficient is a [0,1] ratio")
    Dedup.invalidate()
  }
}
