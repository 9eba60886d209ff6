package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the pipeline's operators (the
  * reference is batch-only — SURVEY.md §2.9 — so this is the
  * scale-path extension, not parity): event-time windowed aggregation
  * with watermarks, streaming dedup bounded by a watermark, and
  * stateful sessionization via flatMapGroupsWithState.
  *
  * All transforms take/return streaming Datasets so sources
  * (file/kafka/memory) and sinks stay the caller's choice:
  * `readStream → transform → writeStream`.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  /** Tumbling event-time window counts with a watermark bounding state
    * and late data.
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      window: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("total_value"))

  /** Streaming composite-key dedup: the streaming form of the
    * pipeline's keep-first resolution. State is bounded by the
    * watermark — a duplicate arriving later than the watermark delay
    * is not caught (the batch dedup operators are the exact
    * re-statement; this is the infinite-input tradeoff).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Gap-based sessionization with explicit state: a session closes
    * (and emits one summary row) once the event-time watermark passes
    * session_end + gap. Event-time timeouts keep this deterministic —
    * replayable from a checkpoint, no wall-clock dependence.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, incoming: Iterator[Event], state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            val out = state.get
            state.remove()
            Iterator(out)
          } else {
            val batch = incoming.toSeq
            if (batch.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              val start = prev.map(_.session_start)
                .getOrElse(batch.map(_.ts).min(Ordering.by((t: java.sql.Timestamp) => t.getTime)))
              val end = (prev.map(_.session_end).toSeq ++ batch.map(_.ts))
                .max(Ordering.by((t: java.sql.Timestamp) => t.getTime))
              val updated = SessionSummary(
                userId,
                prev.map(_.n_events).getOrElse(0L) + batch.size,
                prev.map(_.total_value).getOrElse(0.0) + batch.map(_.value).sum,
                start, end)
              state.update(updated)
              state.setTimeoutTimestamp(end.getTime + gapMinutes * 60000L)
              Iterator.empty
            }
          }
      }
  }
}
