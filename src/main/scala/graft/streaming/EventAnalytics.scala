package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics: tumbling-window aggregation and gap-based
  * sessionization, each in two forms sharing one semantics contract —
  * a BATCH form (runs on the parquet `events` table, DuckDB-oracle
  * checkable) and a STREAMING form (`readStream` + watermark /
  * `flatMapGroupsWithState`) for live intake.
  *
  * Scale notes: windowed counts are one keyed shuffle with map-side
  * partial aggregation; batch sessionization is one shuffle + sort per
  * user partition (the window functions share a single partitioning);
  * streaming sessionization keeps O(open sessions) state per user with
  * event-time timeout — no unbounded state.
  */
object EventAnalytics {

  // ---- tumbling-window aggregation -------------------------------------

  /** Per (window, event_type) counts and value sums. Works on a batch
    * DataFrame or a stream (add a watermark upstream for state cleanup).
    * Windows are epoch-aligned tumbling buckets of `windowExpr`
    * (e.g. "5 minutes").
    */
  def windowedCounts(events: DataFrame, windowExpr: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        // value is summed as integer cents: a long sum is exact under any
        // fold order and any engine, where a double->decimal cast sum is
        // engine-rounding-sensitive (divide by 100 for display)
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value_cents"))

  /** Streaming form: watermarked so state for windows older than
    * `lateness` is dropped (late events beyond it are ignored).
    */
  def streamingWindowedCounts(events: DataFrame, windowExpr: String = "5 minutes",
      lateness: String = "10 minutes"): DataFrame =
    windowedCounts(events.withWatermark("ts", lateness), windowExpr)

  // ---- gap-based sessionization ----------------------------------------

  /** One session row: closed when `gap` passes with no event. */
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** BATCH sessionization via window functions: an event starts a new
    * session when it is more than `gapSeconds` after the previous event
    * of the same user; the session id is the running count of such
    * breaks. Both window functions share one (user_id, ts) partitioning
    * — a single shuffle + sort.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        // timestamp→double keeps the fractional seconds (unix_timestamp
        // truncates, which would misjudge gaps straddling the boundary)
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
  }

  /** STREAMING sessionization: per-user custom state via
    * flatMapGroupsWithState — the open session (start, end, count) is
    * the only state; an event-time timeout `gap` after the last event
    * closes and emits the session. Append-mode output: only CLOSED
    * sessions are emitted.
    */
  def streamingSessionize(events: DataFrame, gapSeconds: Long = 1800,
      lateness: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]

    events
      // project/cast BEFORE the watermark: wrapping the column afterwards
      // would strip the event-time tag the timeout needs
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", lateness)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.end, s.n))
          } else {
            val sorted = rows.map(_._2).toSeq.sortBy(_.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { ts =>
              open match {
                case Some(s) if ts.getTime - s.end.getTime <= gapSeconds * 1000 =>
                  open = Some(OpenSession(s.start, ts, s.n + 1))
                case Some(s) =>
                  closed += Session(userId, s.start, s.end, s.n)
                  open = Some(OpenSession(ts, ts, 1))
                case None =>
                  open = Some(OpenSession(ts, ts, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the session `gap` after its last event (event time).
              // An event admitted within `lateness` can still leave
              // end+gap BEHIND the current watermark — Spark rejects a
              // timeout ≤ watermark, so clamp forward: the session then
              // closes at the next trigger instead of killing the query.
              val target = s.end.getTime + gapSeconds * 1000
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(target, wm + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Open-session state carried between micro-batches. */
  final case class OpenSession(start: Timestamp, end: Timestamp, n: Long)
}
