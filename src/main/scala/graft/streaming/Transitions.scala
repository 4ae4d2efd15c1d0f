package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of the event-transition matrix
  * (RelationalQueries.eventTransitions): the batch version looks
  * backwards with a lag window, which streaming cannot express (lag
  * needs the whole partition ordered — unsupported over unbounded
  * input), so the stream tracks each user's LAST event as keyed state
  * in `flatMapGroupsWithState` and emits one (prev_type, event_type)
  * row per consecutive pair as it closes.
  *
  * Ordering contract: within a micro-batch the group's rows are
  * sorted by (event time, event id) before chaining — the same total
  * order as the batch lag window — and ACROSS batches the source must
  * deliver each user's events in nondecreasing event-time order (what
  * a Kafka topic keyed by user provides per partition; the file
  * source here replays the log in order). Under that contract the
  * emitted pair multiset is exactly the batch gate's, regardless of
  * how the log is cut into micro-batches — pinned in spec with a
  * multi-batch ordered feed.
  *
  * Scale shape: state is ONE fixed-size record per active user (the
  * last event — never a buffered list), so keyed state grows with
  * |users|, not |events|; emission is append-mode (each transition is
  * final the moment it closes) straight onto the distributed parquet
  * sink, and the matrix aggregation runs on read-back over the sink
  * table — no per-row driver involvement anywhere.
  */
object Transitions {

  final case class Ev(user_id: Long, event_id: Long, us: Long, event_type: String)
  final case class LastEv(us: Long, eventId: Long, tpe: String)
  final case class Trans(user_id: Long, prev_type: String, event_type: String)

  /** Per-user last-event chaining: one transition row per consecutive
    * event pair in (us, event_id) order.
    */
  def track(events: Dataset[Ev]): Dataset[Trans] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Trans](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout,
      ) { (userId, rows, state) =>
        val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
        val out = Seq.newBuilder[Trans]
        var last = state.getOption
        sorted.foreach { e =>
          last.foreach(p => out += Trans(userId, p.tpe, e.event_type))
          last = Some(LastEv(e.us, e.event_id, e.event_type))
        }
        last.foreach(state.update)
        out.result().iterator
      }
  }

  /** The full streaming gate: events stream → stateful tracker →
    * parquet append sink → distributed matrix aggregation on the sink
    * table (same shared reducer as the batch gate, so the gate result
    * equals the batch oracle exactly).
    */
  def transitionsViaSink(spark: SparkSession, dir: String): DataFrame =
    transitionsViaSink(spark, dir, StreamingQueries.scratchSinkDir("trans") + "/out")

  def transitionsViaSink(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    import spark.implicits._
    val evs = StreamingQueries
      .eventsStream(spark, dir)
      .select(
        col("user_id"),
        col("event_id"),
        expr("unix_micros(ts)").as("us"),
        col("event_type"),
      )
      .as[Ev]
    val sunk = StreamingQueries.runAppendToParquet(spark, track(evs).toDF(), outPath)
    graft.operators.RelationalQueries.transitionMatrix(sunk)
  }
}
