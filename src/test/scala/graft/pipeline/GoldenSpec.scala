package graft.pipeline

import graft.SparkSuite
import graft.ingest.WebPagesGen
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden regression pin (D7-style golden tables, FIXTURES.md §4): the mined catalog
  * and a digest of the full per-line assignment for the standard HDFS fixture are
  * committed to git. Any future change to mining/matching semantics — intended or
  * not — shows up as a diff here. Regenerate with GRAFT_REGEN_GOLDEN=1 sbt test
  * after an INTENDED semantic change, and justify it in the commit message.
  */
class GoldenSpec extends SparkSuite {

  private val goldenPath = "src/test/resources/golden_hdfs_n200.txt"

  private def currentGolden(): Seq[String] = {
    val pages = WebPagesGen.pages(spark, 200L).toDF()
    val (catalog, assigned) = LogPipeline.assignAll(spark, pages, PipelineConfig.hdfs)
    val catLines = catalog.drain.catalog()
      .map { case (id, tpl, n) => s"catalog\t$id\t$n\t$tpl" }
    val rows = assigned.select("url", "line_no", "event_id").collect()
      .map(r => s"${r.getString(0)}${r.getInt(1)}${r.getString(2)}")
      .sorted
    val digest = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => digest.update(r.getBytes("UTF-8")))
    val assignDigest = digest.digest().map(b => f"$b%02x").mkString
    catLines :+ s"assignments\t${rows.length}\t$assignDigest"
  }

  test("mined catalog + assignment digest match the committed golden file") {
    val got = currentGolden()
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.createDirectories(Paths.get(goldenPath).getParent)
      Files.write(Paths.get(goldenPath), got.asJava)
      info(s"regenerated $goldenPath")
    } else {
      assert(Files.exists(Paths.get(goldenPath)),
        s"golden file missing — run once with GRAFT_REGEN_GOLDEN=1")
      val want = Files.readAllLines(Paths.get(goldenPath)).asScala.toSeq
      assert(got == want,
        "mining/matching semantics drifted from the committed golden output")
    }
  }
}
