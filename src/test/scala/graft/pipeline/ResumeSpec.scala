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

    val a = ResumableRunner.readRouted(spark, dirA)
      .select("url", "line_no", "event_id", "event_template")
    val b = ResumableRunner.readRouted(spark, dirB)
      .select("url", "line_no", "event_id", "event_template")
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
