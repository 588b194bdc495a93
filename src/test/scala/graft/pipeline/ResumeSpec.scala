package graft.pipeline

import graft.SparkSuite
import graft.table.ParquetManifestTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** t-resume (SURVEY §5.2): run, crash mid-run, resume — final state must equal an
  * uninterrupted run, with no duplicate rows and lineage covering every chunk.
  */
class ResumeSpec extends SparkSuite {

  private val cfg = PipelineConfig.hdfs
  private val N = 120L

  test("interrupted + resumed == uninterrupted; no duplicates; lineage complete") {
    val dirA = Files.createTempDirectory("graft_resume_a").toString
    val dirB = Files.createTempDirectory("graft_resume_b").toString

    // uninterrupted reference run
    val repA = ResumableRunner.run(spark, cfg, N, dirA, nChunks = 4)
    assert(repA.chunksRun == Seq(0, 1, 2, 3))

    // crash after chunk 1, then resume
    intercept[SimulatedCrash] {
      ResumableRunner.run(spark, cfg, N, dirB, nChunks = 4, failAfterChunk = Some(1))
    }
    val repB = ResumableRunner.run(spark, cfg, N, dirB, nChunks = 4)
    assert(repB.chunksSkipped == Seq(0, 1))
    assert(repB.chunksRun == Seq(2, 3))

    // routed rows are normalized (no event_template column — it lives in the
    // templates sink); equality on the full remaining row set
    val a = ResumableRunner.readRouted(spark, dirA)
      .select("url", "line_no", "event_id", "matched_by", "Content")
    val b = ResumableRunner.readRouted(spark, dirB)
      .select("url", "line_no", "event_id", "matched_by", "Content")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)

    // no duplicate line keys
    val dups = b.groupBy("url", "line_no").count().filter(col("count") > 1).count()
    assert(dups == 0)

    // lineage rows cover all 4 chunks, row counts add up
    val lineage = ParquetManifestTable.read(spark, ResumableRunner.lineageTable(dirB))
    assert(lineage.select("chunk").distinct().count() == 4)
    val lineageRows = lineage.agg(sum("rows")).collect()(0).getLong(0)
    assert(lineageRows == b.count())

    // metrics present per chunk
    val metrics = ParquetManifestTable.read(spark, ResumableRunner.metricsTable(dirB))
    assert(metrics.select("chunk").distinct().count() == 4)

    // templates agg sink matches routed rows
    val tpl = ParquetManifestTable.read(spark, ResumableRunner.templatesTable(dirB))
    val tplSum = tpl.agg(sum("occurrences")).collect()(0).getLong(0)
    assert(tplSum == b.count())
  }

  test("crash BETWEEN control-sink commits and routed commit: resume re-runs the " +
      "chunk, control sinks are upserted (no double rows), invariant holds") {
    val dirA = Files.createTempDirectory("graft_resume_w_a").toString
    val dirB = Files.createTempDirectory("graft_resume_w_b").toString
    val repA = ResumableRunner.run(spark, cfg, N, dirA, nChunks = 3)
    assert(repA.chunksRun == Seq(0, 1, 2))

    // crash in the window AFTER lineage+metrics committed but BEFORE the routed
    // manifest swap (the round-1 untested window)
    intercept[SimulatedCrash] {
      ResumableRunner.run(spark, cfg, N, dirB, nChunks = 3, failBeforeRoutedCommit = Some(1))
    }
    // chunk 1's routed commit never landed → it must NOT be marked done
    val doneTags = ParquetManifestTable.tags(spark, ResumableRunner.routedTable(dirB))
    assert(doneTags.toSet == Set("c0"))
    // …but its control sinks DID commit (they commit first by design)
    val mPre = ParquetManifestTable.read(spark, ResumableRunner.metricsTable(dirB))
    assert(mPre.select("chunk").distinct().collect().map(_.getInt(0)).toSet == Set(0, 1))

    val repB = ResumableRunner.run(spark, cfg, N, dirB, nChunks = 3)
    assert(repB.chunksSkipped == Seq(0))
    assert(repB.chunksRun == Seq(1, 2)) // chunk 1 re-ran

    // routed content identical to the uninterrupted run
    val a = ResumableRunner.readRouted(spark, dirA).select("url", "line_no", "event_id")
    val b = ResumableRunner.readRouted(spark, dirB).select("url", "line_no", "event_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)

    // the re-run UPSERTED chunk 1's control rows — one metrics histogram per chunk,
    // and lineage row counts still reconcile exactly with the routed rows
    val metrics = ParquetManifestTable.read(spark, ResumableRunner.metricsTable(dirB))
    val perChunkDrain = metrics.filter(col("matched_by") === "drain")
      .groupBy("chunk").count().filter(col("count") > 1).count()
    assert(perChunkDrain == 0, "metrics rows for a chunk must not be duplicated")
    val lineage = ParquetManifestTable.read(spark, ResumableRunner.lineageTable(dirB))
    assert(lineage.agg(sum("rows")).collect()(0).getLong(0) == b.count())
  }

  test("re-running a completed outDir does not double-count the templates sink") {
    val dir = Files.createTempDirectory("graft_resume_rerun").toString
    ResumableRunner.run(spark, cfg, N, dir, nChunks = 2)
    val tpl1 = ParquetManifestTable.read(spark, ResumableRunner.templatesTable(dir))
      .agg(sum("occurrences")).collect()(0).getLong(0)
    val rep2 = ResumableRunner.run(spark, cfg, N, dir, nChunks = 2) // no-op rerun
    assert(rep2.chunksRun.isEmpty)
    val tpl2 = ParquetManifestTable.read(spark, ResumableRunner.templatesTable(dir))
      .agg(sum("occurrences")).collect()(0).getLong(0)
    assert(tpl1 == tpl2, s"rerun must not inflate template counts ($tpl1 -> $tpl2)")
    val routedRows = ResumableRunner.readRouted(spark, dir).count()
    assert(tpl2 == routedRows)
  }

  test("resuming an outDir with different params fail-stops instead of corrupting") {
    val dir = Files.createTempDirectory("graft_resume_params").toString
    ResumableRunner.run(spark, cfg, N, dir, nChunks = 2)
    // chunk done-tags / catalog / sinks are keyed by outDir: a resume with a
    // different chunking or corpus size would silently skip or duplicate rows,
    // so it must throw (round-3 review fix)
    intercept[IllegalArgumentException] {
      ResumableRunner.run(spark, cfg, N, dir, nChunks = 4)
    }
    intercept[IllegalArgumentException] {
      ResumableRunner.run(spark, cfg, N * 2, dir, nChunks = 2)
    }
    // same params resume stays a no-op
    assert(ResumableRunner.run(spark, cfg, N, dir, nChunks = 2).chunksRun.isEmpty)
  }

  test("chunk input is partition-pruned: a chunk's scan reads only its slice") {
    val dir = Files.createTempDirectory("graft_resume_prune").toString
    ResumableRunner.run(spark, cfg, N, dir, nChunks = 4)
    val inputDir = ResumableRunner.chunkedInputDir(dir, N, 4)
    val all = spark.read.parquet(inputDir)
    val pruned = all.filter(col("chunk") === 2)
    // physical proof: every file feeding the pruned scan lives under chunk=2/
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("chunk=2")),
      s"expected only chunk=2 files, got: ${files.take(3).mkString(", ")}")
    assert(all.inputFiles.length > files.length, "other chunks' files must exist")
  }

  test("snapshot time travel: earlier snapshot excludes later appends") {
    val dir = Files.createTempDirectory("graft_tt").toString
    import spark.implicits._
    val t1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val t2 = Seq((3, "c")).toDF("id", "v")
    val s1 = ParquetManifestTable.append(t1, s"$dir/tbl")
    val s2 = ParquetManifestTable.append(t2, s"$dir/tbl")
    assert(ParquetManifestTable.readSnapshot(spark, s"$dir/tbl", s1).count() == 2)
    assert(ParquetManifestTable.readSnapshot(spark, s"$dir/tbl", s2).count() == 3)
    assert(ParquetManifestTable.read(spark, s"$dir/tbl").count() == 3)
    assert(ParquetManifestTable.currentSnapshotId(spark, s"$dir/tbl").contains(s2))
  }
}
