package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time named queries twice (cold/warm). Not part of the driver contract. */
object TimeOne {

  /** Time each named gate twice and return (name, run, seconds) rows
    * (smoke-tested; `main` owns the session lifecycle).
    */
  def run(spark: SparkSession, dir: String, names: Seq[String]): Seq[(String, Int, Double)] =
    names.flatMap { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).map { i =>
        val t0 = System.nanoTime()
        // same materialization as Bench: full computation, no pruning
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[timeone] $name run$i $sec%.2f s")
        (name, i, sec)
      }
    }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    run(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), args.toSeq)
    spark.stop()
  }
}
