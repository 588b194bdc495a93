package graft.streaming

import graft.SparkSuite
import graft.ingest.WebPagesGen
import graft.pipeline.{LogPipeline, PipelineConfig}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class StreamingSpec extends SparkSuite {

  private val cfg = PipelineConfig.hdfs
  private val N = 150L

  test("streaming match == batch match; windowed counts and stateful totals work") {
    // batch-mine the catalog on the same input
    val pages = WebPagesGen.pages(spark, N).toDF()
    val (catalog, batchAssigned) = LogPipeline.assignAll(spark, pages, cfg)
    val bc = spark.sparkContext.broadcast(catalog)

    // materialize input as a streaming source dir (two file batches)
    val dir = Files.createTempDirectory("graft_stream").toString
    pages.filter(col("url").endsWith("0") || col("url").endsWith("1"))
      .write.mode("append").parquet(dir)
    pages.filter(!(col("url").endsWith("0") || col("url").endsWith("1")))
      .write.mode("append").parquet(dir)

    val matched = StreamingMatch.matchedStream(
      StreamingMatch.readPages(spark, dir), cfg, bc)

    // 1. append-mode row stream: event assignment identical to batch
    StreamingMatch.runToMemory(
      matched.select("url", "line_no", "event_id"), "rows_out", OutputMode.Append())
    val streamRows = spark.table("rows_out")
    val batchRows = batchAssigned.select("url", "line_no", "event_id")
    assert(streamRows.count() == batchRows.count())
    assert(streamRows.exceptAll(batchRows).count() == 0)
    assert(batchRows.exceptAll(streamRows).count() == 0)

    // 2. watermarked windowed aggregate (complete mode for the memory sink)
    StreamingMatch.runToMemory(
      StreamingMatch.windowedCounts(matched), "win_out", OutputMode.Complete())
    val winTotal = spark.table("win_out").agg(sum("occurrences")).collect()(0).getLong(0)
    assert(winTotal == batchRows.count())

    // 3. mapGroupsWithState running totals equal batch per-template counts
    StreamingMatch.runToMemory(
      StreamingMatch.runningTotals(matched).toDF(), "state_out", OutputMode.Update())
    val totals = spark.table("state_out")
      .groupBy("event_id").agg(max("total").as("total"))
    val batchCounts = batchAssigned.groupBy("event_id")
      .agg(count(lit(1)).as("total"))
    assert(totals.exceptAll(batchCounts).count() == 0)
    assert(batchCounts.exceptAll(totals).count() == 0)
  }

  test("streaming routed sink: checkpointed restart is exactly-once, == batch") {
    val pages = WebPagesGen.pages(spark, N).toDF()
    val (catalog, batchAssigned) = LogPipeline.assignAll(spark, pages, cfg)
    val bc = spark.sparkContext.broadcast(catalog)

    val src = Files.createTempDirectory("graft_stream_src").toString
    val out = Files.createTempDirectory("graft_stream_routed").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    def stream() = StreamingMatch.matchedStream(
      StreamingMatch.readPages(spark, src), cfg, bc)

    // phase 1: first half of the corpus arrives, query runs, then STOPS (crash/stop)
    pages.filter(col("url").endsWith("0") || col("url").endsWith("1"))
      .write.mode("append").parquet(src)
    val q1 = StreamingMatch.routedSink(stream(), out, ckpt).start()
    q1.processAllAvailable(); q1.stop()

    // phase 2: more data arrives while the query is down; RESTART from the SAME
    // checkpoint — the sink must contain each routed row exactly once
    pages.filter(!(col("url").endsWith("0") || col("url").endsWith("1")))
      .write.mode("append").parquet(src)
    val q2 = StreamingMatch.routedSink(stream(), out, ckpt).start()
    q2.processAllAvailable(); q2.stop()

    val routed = spark.read.parquet(out).select("url", "line_no", "event_id")
    val batch = batchAssigned.select("url", "line_no", "event_id")
    assert(routed.count() == batch.count())
    assert(routed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(routed).count() == 0)
    val dups = routed.groupBy("url", "line_no").count().filter(col("count") > 1).count()
    assert(dups == 0, "restart from checkpoint must not duplicate routed rows")
    // fan-out shape: hive-partitioned per-template dirs, commit log present
    val fsDirs = new java.io.File(out).listFiles().map(_.getName)
    assert(fsDirs.exists(_.startsWith("event_id=")))
    assert(fsDirs.contains("_spark_metadata"))
  }
}
