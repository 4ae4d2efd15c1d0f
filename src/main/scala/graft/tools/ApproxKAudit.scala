package graft.tools

import graft.GraftSession

/** Scale-rehearsal probe for the k-anonymity approx-distinct escape
  * ([[graft.operators.Privacy.kAnonymityApproxDelta]]): prints one
  * JSON line per corpus dir with the exact-vs-HLL++ flag deltas.
  * Usage: ApproxKAudit <dir> [<dir> ...]
  */
object ApproxKAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    args.foreach { dir =>
      val r = graft.operators.Privacy.kAnonymityApproxDelta(spark, dir).head()
      println(
        s"""[approxk] {"dir":"$dir","n_classes":${r.getLong(0)},""" +
          s""""flips_pass_to_fail":${r.getLong(1)},"flips_fail_to_pass":${r.getLong(2)},""" +
          s""""max_err_permille":${r.getLong(3)}}"""
      )
    }
    spark.stop()
  }
}
