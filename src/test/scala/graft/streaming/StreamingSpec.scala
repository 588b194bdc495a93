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

  test("streaming mine: flatMapGroupsWithState state accumulates the evolving catalog") {
    import spark.implicits._
    // distinct first tokens per template within each length ⇒ online Drain lands
    // them on different tree leaves for ANY arrival order, so the final catalog is
    // exact, not merely PA-grade — the test isolates the streaming-state mechanics
    val mcfg = PipelineConfig("<Content>", Seq("\\d+"), st = 0.4, depth = 4)
    val rows = (0 until 30).map { i =>
      val ls = Seq(s"start job $i", s"finish job ${i * 7}") ++
        (if (i % 3 == 0) Seq("conn peer reset now") else Nil)
      (s"https://x/$i", new java.sql.Timestamp(1000L * i),
        Array[Byte](1), ls.mkString("\n"), "en")
    }
    val df = rows.toDF("url", "warc_ts", "html", "text", "lang")
    val dir = Files.createTempDirectory("graft_stream_mine").toString
    val ckpt = Files.createTempDirectory("graft_stream_mine_ckpt").toString

    val emissions =
      scala.collection.mutable.ArrayBuffer[(Long, Seq[(String, String, Long)])]()
    def start() = StreamingMatch
      .streamingMine(StreamingMatch.readPages(spark, dir), mcfg)
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.drain.TemplateRow], id: Long) =>
        val rows = b.collect().map(r => (r.event_id, r.event_template, r.occurrences)).toSeq
        emissions.synchronized { emissions += ((id, rows)) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()

    // batch 1: single-digit pages; batch 2: the rest — state must carry over
    df.filter(col("url").rlike("/\\d$")).write.mode("append").parquet(dir)
    val q = start()
    q.processAllAvailable()
    df.filter(col("url").rlike("/\\d\\d$")).write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val nonEmpty = emissions.filter(_._2.nonEmpty).sortBy(_._1)
    assert(nonEmpty.size >= 2, s"expected 2 micro-batches, got $emissions")
    // final catalog = last emission per length group (a group re-emits whole state)
    val latest = nonEmpty.flatMap { case (id, rs) => rs.map(r => (id, r)) }
      .groupBy { case (_, (_, tpl, _)) => tpl.split(" ").length }
      .map { case (_, es) =>
        val lastId = es.map(_._1).max
        es.filter(_._1 == lastId).map(_._2)
      }.flatten.toSet
    assert(latest == Set(
      (graft.drain.DrainTree.eventId("start job <*>"), "start job <*>", 30L),
      (graft.drain.DrainTree.eventId("finish job <*>"), "finish job <*>", 30L),
      (graft.drain.DrainTree.eventId("conn peer reset now"), "conn peer reset now", 10L)))
    // the first batch's counts are the 10-page prefix — state genuinely grew
    val first = nonEmpty.head._2.map { case (_, tpl, n) => (tpl, n) }.toMap
    assert(first("start job <*>") == 10L && first("conn peer reset now") == 4L)
  }

  test("streaming dedup keeps one page per content hash within the watermark") {
    val pages = WebPagesGen.pages(spark, 60L).toDF()
    // duplicate every 3rd page under a fresh url, same text and timestamp band
    val withDups = pages.unionByName(
      pages.filter(col("url").endsWith("0"))
        .withColumn("url", concat(col("url"), lit("-copy"))))
    val dir = Files.createTempDirectory("graft_stream_dedup").toString
    withDups.write.mode("append").parquet(dir)

    StreamingMatch.runToMemory(
      StreamingMatch.dedupStream(StreamingMatch.readPages(spark, dir))
        .select("url", "content_hash"),
      "dedup_out", OutputMode.Append())
    val out = spark.table("dedup_out")
    val distinctHashes = withDups.select(md5(col("text"))).distinct().count()
    assert(out.count() == distinctHashes, "exactly one survivor per content hash")
    assert(out.select("content_hash").distinct().count() == distinctHashes)
  }
}
