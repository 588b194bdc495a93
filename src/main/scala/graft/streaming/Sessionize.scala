package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time sessionization over the `events` table shape — the third classic
  * streaming-state primitive alongside the running-totals map state and the
  * online-Drain flatMap state ([[StreamingMatch]]).
  *
  * Built on Catalyst's native `session_window` (gap-merged event-time windows)
  * rather than hand-rolled `flatMapGroupsWithState`: the native operator gets
  * incremental state merging, watermark-driven eviction and whole-stage codegen
  * for free, and the SAME expression runs in batch and streaming — which is what
  * makes the stream==batch parity spec and the DuckDB oracle possible.
  *
  * Semantics (pinned by SessionizeSpec and the oracle): session windows merge
  * when they overlap or TOUCH, so an event extends its user's current session
  * iff `ts - last_ts <= gap` (an event landing exactly on the previous window's
  * end still merges); a session's window is `[min(ts), max(ts) + gap)`. The
  * batch lag/cumsum replay in SQL uses `diff > gap ⇒ new session` accordingly.
  *
  * Scale shape: one shuffle on (`user_id`) — the session merge is per-key and
  * map-side partial; streaming state is evicted as the watermark passes each
  * session's end, so state is bounded by the number of OPEN sessions inside the
  * watermark horizon, never by history. At 10^12 events the same plan holds:
  * sessions are per-user local, no global ordering exists anywhere.
  */
object Sessionize {

  /** Gap-based sessions: (user_id, sess_start, sess_end, n_events).
    * Pure transform — works on a batch frame as-is; for streams compose with
    * [[sessionStream]] so the aggregation is watermarked (Append-mode closable).
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               keyCol: Column = col("user_id")): DataFrame =
    events
      .groupBy(keyCol.as("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"))

  /** Streaming sessionization: watermark bounds state + lets Append mode emit
    * each session exactly once, when the watermark passes its end.
    */
  def sessionStream(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "1 hour"): DataFrame =
    sessions(events.withWatermark("ts", watermark), gap)
}
