package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RelationalQueries, Rollups}

/** The hierarchical re-aggregation formulation must produce exactly
  * the declarative rollup/cube result — row pattern (null grouping
  * indicators), values, and types.
  */
class RollupsSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("hierarchical rollup equals declarative rollup") {
    val a = Rollups.rollupSalesHierarchical(spark, sf)
    val b = RelationalQueries.rollupSales(spark, sf)
    assert(a.schema.map(f => (f.name, f.dataType)) == b.schema.map(f => (f.name, f.dataType)))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("hierarchical cube equals declarative cube") {
    val a = Rollups.cubeSalesHierarchical(spark, sf)
    val b = RelationalQueries.cubeSales(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
