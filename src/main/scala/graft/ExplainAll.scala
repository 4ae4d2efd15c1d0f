package graft

import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted plans for plan-quality review. */
object ExplainAll {

  /** Print each named gate's formatted plan (smoke-tested; `main`
    * owns the session lifecycle).
    */
  def run(spark: SparkSession, dir: String, names: Seq[String]): Unit =
    names.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    run(spark, "/root/testdata/sf0.01", args.toSeq)
    spark.stop()
  }
}
