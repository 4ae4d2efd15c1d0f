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
  * (source, split) — the packing unit — i.e. a single shuffle of
  * (source, doc_id, n_tok) TRIPLES; the text itself never moves; the
  * sequence assignment then joins back map-side if the caller needs
  * the payload co-located.
  *
  * The SPLIT is the skew guard: a window partitioned by source alone
  * serializes a giant source's running-offset scan into one task, so
  * each source is sub-split into contiguous doc_id ranges of
  * `splitEvery` ids and offsets restart per split. Packing semantics
  * are unchanged in kind — docs still pack with their doc_id
  * neighbors; the only difference is that context windows never span
  * a split boundary (one ≤ctx-token remainder per split, the same
  * waste every sharded packer accepts). Range (`div`), not hash: the
  * sub-split must preserve doc_id adjacency or "concatenate in doc_id
  * order" stops meaning anything.
  */
object Packing {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Per (source, split_id, seq_id) packing summary under `ctx`-token
    * windows: how many docs start in each window and their total
    * token count. split_id = doc_id div splitEvery; seq_id =
    * floor(start_offset / ctx) where start_offset is the running
    * token count of all earlier docs in the same (source, split).
    */
  def packSequences(
      spark: SparkSession,
      dir: String,
      ctx: Int = 256,
      splitEvery: Long = 200L,
  ): DataFrame = {
    require(splitEvery > 0, s"splitEvery must be positive, got $splitEvery")
    val w = Window.partitionBy("source", "split_id").orderBy("doc_id")
    docs(spark, dir)
      .select(
        col("source"),
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
      )
      // integer `div`, not floor(double /): exact at any corpus size
      // (a double quotient loses integer exactness past 2^53)
      .withColumn("split_id", expr(s"doc_id div $splitEvery"))
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("seq_id", expr(s"start_off div $ctx"))
      .groupBy("source", "split_id", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
      )
  }

  /** Length-bucketed batching stats — the alternative to
    * concat-and-chunk when documents must stay intact: docs are
    * grouped into fixed-`width` token-length buckets and each batch
    * pads to its bucket's longest doc. `padding_waste` =
    * n_docs·max(n_tok) − sum(n_tok) is the padding-token overhead of
    * batching that bucket — the number a pipeline tunes bucket width
    * against. Pure integer arithmetic end to end.
    *
    * Scale shape (100 TB): the length is map-side per-row math, the
    * aggregation has ≤ max_len/width keys — scan speed, one tiny
    * shuffle.
    */
  def lengthBuckets(spark: SparkSession, dir: String, width: Int = 32): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    docs(spark, dir)
      .select(TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("bucket", expr(s"n_tok div $width"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        max(col("n_tok")).as("max_tok"),
        (count(lit(1)) * max(col("n_tok")) - sum(col("n_tok"))).as("padding_waste"),
      )
  }
}
