package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch (round 14): dump formatted plans for streaming gate
  * LINEAGES (the pre-start streaming DataFrame — where the static
  * index sides live), which ExplainAll cannot reach because the gate
  * functions execute the stream and return only the read-back.
  */
object ExplainStream {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val lineages: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "stream_winnow_probe_lineage" ->
        ((s, d) => graft.streaming.StreamingQueries.winnowProbeStream(s, d)),
      "stream_lm_score_lineage" ->
        ((s, d) => graft.streaming.StreamingQueries.lmScoreStream(s, d)),
    )
    args.foreach { name =>
      println(s"===== $name =====")
      lineages(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
