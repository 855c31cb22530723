package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transforms beyond the reference's executed surface
  * (README.md never windows or watermarks — its only state is source
  * offsets, SURVEY.md §2.3 note). These are the standard event-time
  * operators a production CDC/analytics stream needs, composed the
  * Structured-Streaming-native way so state stays bounded:
  *
  *  - watermark + tumbling/sliding window aggregation (late data
  *    dropped after the horizon; state evicted per window);
  *  - watermarked stream deduplication (exact-once per key within the
  *    horizon — the streaming twin of q_dedup_exact);
  *  - sessionization via flatMapGroupsWithState (custom state machine,
  *    event-time timeout — the one place mapGroups-state genuinely
  *    beats built-ins).
  *
  * All take/return DataFrames so they compose with the CDC ingest
  * (graft.cdc.Ingest) on either side.
  */
object Streams {

  /** Tumbling event-time aggregation: count + sum(value) per
    * (window, key), late rows beyond `delay` dropped. State per open
    * window only — at 100 TB/day the state size is windows×keys, not
    * rows. */
  def tumblingAgg(events: DataFrame, tsCol: String, keyCol: String,
                  window_ : String = "1 hour", delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"), col("total"))

  /** Sliding window variant (overlapping windows; state ∝ windows/slide
    * factor). */
  def slidingAgg(events: DataFrame, tsCol: String, keyCol: String,
                 window_ : String = "1 hour", slide: String = "30 minutes",
                 delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), window_, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Watermarked exact dedup on key columns: emits the first arrival of
    * each key, drops re-arrivals within the watermark horizon, and
    * evicts state past it (unbounded dedup state is the classic
    * streaming OOM). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, delay: String,
                           keys: String*): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Session state: (count, sum, last event-time millis). */
  case class SessionAgg(key: Long, n: Long, total: Double, closedAtMs: Long)

  /** Sessionization with a `gap` inactivity timeout via
    * flatMapGroupsWithState: one session row emitted when a key goes
    * quiet for `gap` (event-time clock = watermark). State per ACTIVE
    * key only. Input needs columns (user_id long, ts timestamp,
    * value double). */
  def sessionize(events: DataFrame, gapMs: Long, delay: String = "10 minutes"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      // the watermarked ts column must reach the stateful operator
      // unchanged — projecting it away disables event-time timeouts
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Long), SessionAgg](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[(Long, Double, Long)]) =>
          if (state.hasTimedOut) {
            val (n, total, lastMs) = state.get
            state.remove()
            Iterator(SessionAgg(key, n, total, lastMs))
          } else {
            // single-pass fold over the iterator — never materializes the
            // group's batch, so a reconnect storm (one key, millions of
            // buffered events) streams through in O(1) memory
            val init = state.getOption.getOrElse((0L, 0.0, 0L))
            val (n, total, lastMs) = rows.foldLeft(init) {
              case ((n0, t0, last0), (_, ts, v)) =>
                (n0 + 1, t0 + v, math.max(last0, ts.getTime))
            }
            state.update((n, total, lastMs))
            state.setTimeoutTimestamp(lastMs + gapMs)
            Iterator.empty
          }
      }
  }
}
