package graft.tools

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query shuffle-volume capture for the scale rehearsal.
  *
  * Wall time is host-noisy and 32-way parallelism can mask a
  * superlinear shuffle at small corpus sizes; BYTES SHUFFLED is
  * deterministic for a deterministic corpus and is the quantity
  * that actually prices a 100-TB run (it is what crosses the
  * network and what the reducers must hold). This listener sums the
  * shuffle-write bytes and records over every ShuffleExchange in
  * the executed plan of each completed action — descending through
  * AQE wrappers and materialized query stages, skipping
  * ReusedExchange nodes (their metrics alias the original exchange;
  * counting them would double-bill exchange reuse, which is
  * precisely a savings the plan should get credit for).
  *
  * Callbacks arrive asynchronously on the listener bus, so readers
  * poll [[version]] for the increment after their action completes
  * ([[awaitNext]]).
  */
object ShuffleTap extends QueryExecutionListener {
  private val seq = new AtomicLong(0)
  @volatile private var lastBytes: Long = -1L
  @volatile private var lastRecords: Long = -1L

  def version: Long = seq.get()
  def bytes: Long = lastBytes
  def records: Long = lastRecords

  /** Wait (bounded) for a capture newer than `prev`; returns the
    * (bytes, records) of that capture, or (-1,-1) on timeout — the
    * caller records the miss rather than blocking the bench.
    */
  def awaitNext(prev: Long, timeoutMs: Long = 5000): (Long, Long) = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (seq.get() == prev && System.nanoTime() < deadline) Thread.sleep(10)
    if (seq.get() == prev) (-1L, -1L) else (lastBytes, lastRecords)
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val (b, r) = sumShuffles(qe.executedPlan)
    lastBytes = b
    lastRecords = r
    seq.incrementAndGet()
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
    lastBytes = -1L
    lastRecords = -1L
    seq.incrementAndGet()
  }

  private def sumShuffles(root: SparkPlan): (Long, Long) = {
    val seen = mutable.Set.empty[Int]
    var bytes = 0L
    var records = 0L
    def metric(p: SparkPlan, name: String): Long =
      p.metrics.get(name).map(_.value).getOrElse(0L)
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: ReusedExchangeExec => ()
        case s: ShuffleExchangeLike =>
          if (seen.add(System.identityHashCode(s))) {
            bytes += metric(s, "shuffleBytesWritten")
            records += metric(s, "shuffleRecordsWritten")
          }
          s.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(root)
    (bytes, records)
  }
}
