package graft
/** Scratch profiler: time named queries twice (cold/warm). Not part of the driver contract. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // same materialization as Bench: full computation, no pruning
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[timeone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
