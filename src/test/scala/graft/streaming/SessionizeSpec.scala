package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SessionizeSpec extends SparkSuite {

  private val base = 1704067200L
  private def ts(off: Long) = new java.sql.Timestamp((base + off) * 1000L)

  test("session_window semantics: boundary-touching event MERGES; window = [min, max+gap)") {
    import spark.implicits._
    // u10: events at +0, +600, +1799, then +3599 = exactly 1799+1800 — session
    // windows merge when they overlap OR TOUCH, so the boundary event still
    // extends the session (diff > gap, strictly, starts a new one); +5400 is
    // 1801 s later ⇒ new session. This pins the `> 1800 ⇒ new` rule the DuckDB
    // oracle replays (same convention as the lag-based e_sessionize query).
    val df = Seq(
      (1L, ts(0), 10L), (2L, ts(600), 10L), (3L, ts(1799), 10L),
      (4L, ts(3599), 10L), (5L, ts(5400), 10L),
      (6L, ts(0), 20L)
    ).toDF("event_id", "ts", "user_id")
    val out = Sessionize.sessions(df)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (10L, ts(0), ts(3599 + 1800), 4L),
      (10L, ts(5400), ts(5400 + 1800), 1L),
      (20L, ts(0), ts(1800), 1L)))
  }

  test("streaming sessions == batch sessions once the watermark closes them") {
    import spark.implicits._
    // 6 users × 24 events; within a user, event i sits at i*400 s plus a 3600 s
    // jump every 8th event ⇒ 3 sessions of 8 events per user, deterministic
    val events = (for {
      u <- 0L until 6L
      i <- 0 until 24
    } yield (u * 100 + i, ts(u * 50 + i * 400L + (i / 8) * 3600L), u))
      .toDF("event_id", "ts", "user_id")

    val batch = Sessionize.sessions(events)
    assert(batch.count() == 18, "3 sessions per user expected")

    val dir = Files.createTempDirectory("graft_stream_sess").toString
    // two file batches (state must merge across micro-batches), then a sentinel
    // event far in the future: its watermark passes every real session's end, so
    // Append mode emits each closed session exactly once
    // split by TIME (event i<12 / i>=12), not by key, and coalesce each phase to
    // ONE file: a file spanning later times advances the watermark past earlier
    // events still in flight and drops them as late — with maxFilesPerTrigger=1
    // every part-file is its own trigger in arbitrary order, so un-coalesced
    // multi-part writes hit exactly that trap
    events.filter(col("event_id") % 100 < 12).coalesce(1)
      .write.mode("append").parquet(dir)
    events.filter(col("event_id") % 100 >= 12).coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = Sessionize.sessionStream(stream)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_sess").toString)
      .start()
    q.processAllAvailable()
    // two sentinel files: the first advances the watermark past every real
    // session's end (at the END of its batch); the second provides the next
    // trigger, in which the state store evicts + emits those closed sessions
    Seq((9999L, ts(90 * 86400L), 999L)).toDF("event_id", "ts", "user_id")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq((9998L, ts(91 * 86400L), 999L)).toDF("event_id", "ts", "user_id")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_out").filter(col("user_id") =!= 999L)
    assert(streamed.count() == 18)
    assert(streamed.exceptAll(batch).count() == 0,
      s"stream-only: ${streamed.exceptAll(batch).collect().toSeq}; " +
        s"batch-only: ${batch.exceptAll(streamed).collect().toSeq}")
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
