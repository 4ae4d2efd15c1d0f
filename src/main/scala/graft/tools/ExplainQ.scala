package graft.tools
import graft.GraftSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    val dir = "/root/testdata/sf0.01"
    for (n <- args) {
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
