package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence packing — the last step of a training-data pipeline:
  * documents are concatenated in a fixed order and cut into
  * fixed-length context windows, so every doc maps to the training
  * sequence that contains its first token (concat-and-chunk packing,
  * the standard LM pre-training shape).
  *
  * Determinism: the packing order is (source, doc_id) — a total
  * order — and the assignment is pure integer arithmetic on the
  * running token offset, so any engine reproduces the same doc →
  * sequence mapping.
  *
  * Scale shape (100 TB): one window aggregation partitioned by
  * source (the packing unit), i.e. a single shuffle of (source,
  * doc_id, n_tok) TRIPLES — the text itself never moves; the
  * sequence assignment then joins back map-side if the caller needs
  * the payload co-located. Sources are the natural parallel unit; a
  * skew-heavy source can be sub-split by a hash of doc_id ranges
  * without changing the math (offsets are per split).
  */
object Packing {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Per (source, seq_id) packing summary under `ctx`-token windows:
    * how many docs start in each window and their total token count.
    * seq_id = floor(start_offset / ctx) where start_offset is the
    * running token count of all earlier docs in the same source.
    */
  def packSequences(spark: SparkSession, dir: String, ctx: Int = 256): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs(spark, dir)
      .select(
        col("source"),
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
      )
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      // integer `div`, not floor(double /): exact at any corpus size
      // (a double quotient loses integer exactness past 2^53)
      .withColumn("seq_id", expr(s"start_off div $ctx"))
      .groupBy("source", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
      )
  }
}
