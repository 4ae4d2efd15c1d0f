package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The end-to-end curation pipeline as ONE declarative DAG — the
  * capstone composition: quality filtering, near-dup keep-best
  * deduplication, and deterministic split assignment feed a per
  * (source, split) corpus summary, the table a training run is
  * actually provisioned from.
  *
  * Composition semantics: the near-dup survivor is chosen on the FULL
  * corpus (so a cluster's longest member survives even when a
  * different member fails quality), and a document ships iff it both
  * passes quality AND is its cluster's survivor. Production pipelines
  * sometimes dedup after filtering instead — that variant is the same
  * DAG with the filter pushed below [[Dedup.keepBestDedup]]'s doc
  * metadata scan.
  *
  * Scale shape (100 TB): the quality+split columns are map-side
  * expressions on the corpus scan; the dedup side reuses the
  * MEMOIZED pair set and CC fixpoint ([[Dedup.minhashLshPairsShared]],
  * [[Dedup.lshClusters]]) so the pipeline adds no new corpus-scale
  * work beyond the survivor join — (doc_id) keys against (doc_id,
  * source, split, n_tok) quads, AQE's choice of strategy; the final
  * aggregate is |sources × splits| keys.
  */
object Curation {

  def curationSummary(spark: SparkSession, dir: String): DataFrame = {
    val quality = Tables(spark, dir, "documents")
      .filter(TextAnalysis.gopherKeep(col("text")))
      .select(
        col("doc_id"),
        col("source"),
        Sampling.assignSplit(col("text")).as("split"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
      )
    val survivors = Dedup.keepBestDedup(spark, dir).filter(col("keep") === 1).select("doc_id")
    quality
      .join(survivors, Seq("doc_id"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }
}
