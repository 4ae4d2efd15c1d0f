package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k best (score desc, id asc)
  * elements per group with a bounded buffer.
  *
  * This is the `Aggregator[IN, BUF, OUT]` formulation of top-k
  * (SURVEY §2.8): partial buffers of size ≤ k merge associatively,
  * so a group's work is k·log k per partition and the shuffle carries
  * at most k rows per (group, partition) — in contrast to the window
  * formulation, which shuffles every row of the group. Spark's
  * WindowGroupLimit optimization closes most of that gap for rank
  * windows; the Aggregator remains the right shape when the
  * per-element payload is heavy or k is tiny relative to group size.
  */
final case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  private def best(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[Scored] = Vector.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = best(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = best(x ++ y)
  override def finish(b: Seq[Scored]): Seq[Scored] = best(b)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
