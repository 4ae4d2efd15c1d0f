package graft
/** Scratch: dump formatted plans for plan-quality review. */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
