package graft.tools

import org.apache.spark.sql.functions._

/** Rehearsal of the perceptual-hash grid staircase ACROSS the
  * 128 → 256 transition (r11 verdict task: the next doubling was
  * untestable under the fixed 192-px fixture floor; the floor is now
  * grid-adaptive — `Multimodal.phashVariantRecord` — so the tier can
  * be driven for real).
  *
  * The phash fixture derives every pixel from doc_id alone, so the
  * transition corpus is a doc_id-only documents table — generating
  * 6.5M rows of synthetic TEXT would cost minutes without exercising
  * one more code path (the gate's only corpus read is
  * `select(doc_id)`, and column pruning reaches the scan either way).
  * Points straddle the 12.8M-media threshold: within-tier growth
  * pins the 128-grid exponent at its NEW (320-px) surface, and the
  * cross-transition point proves the 256 grid holds bucket occupancy
  * bounded — the per-gigapixel rate is the like-for-like number,
  * since the fixture surface itself grows 320 → 576+ px/media at the
  * flip.
  *
  * Method: ONE JVM PER POINT (bash driver), single timed `count()`
  * per point (cold, disclosed — at 8+ gigapixels a warmup pass would
  * double a ~20-minute point for noise that the per-gigapixel
  * comparison already absorbs).
  *
  * Usage: PhashTransitionBench <out.json> <label>=<nDocs>=<dir>
  */
object PhashTransitionBench {
  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    val Array(label, nDocsS, dir) = args(1).split("=", 3)
    val nDocs = nDocsS.toLong
    val spark = graft.GraftSession.getOrCreate()

    val docsPath = s"$dir/documents.parquet"
    if (!new java.io.File(docsPath).exists()) {
      println(s"[phash-t] generating $nDocs doc ids -> $docsPath")
      spark.range(nDocs).select(col("id").as("doc_id"))
        .repartition(32).write.parquet(docsPath)
    }

    val nMedia = 2L * nDocs
    val blocks = graft.operators.Multimodal.phashGridBlocks(nMedia)
    // avg surface: 2B + 64 + mean(jitter 0..100) = 2B + 114
    val gigapixels = nMedia.toDouble * (2 * blocks + 114) / 1e9
    println(s"[phash-t] $label: nMedia=$nMedia grid=$blocks ~${f"$gigapixels%.2f"} Gpx")
    val t0 = System.nanoTime()
    val rows = graft.operators.Multimodal.perceptualNearDupPairs(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val perGpx = sec / gigapixels
    println(f"[phash-t] $label: $sec%.1f s  rows=$rows  ${perGpx}%.1f s/Gpx")
    val json =
      s"""{"label":"$label","n_docs":$nDocs,"n_media":$nMedia,"grid":$blocks,""" +
        f""""gigapixels":$gigapixels%.3f,"sec":$sec%.2f,"rows":$rows,"sec_per_gpx":$perGpx%.2f}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
