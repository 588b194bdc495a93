package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Builder-side plan auditor: print `explain("formatted")` for a set of
  * SparkEntry queries (args = query names; default = the newest operators).
  * Used to eyeball pushdown/broadcast/codegen before shipping a round —
  * `sbt "runMain graft.tools.PlanAudit d_para_dedup logram_templates"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d_para_dedup", "logram_templates", "brain_templates",
        "lenma_sim_templates", "logmine_xlen_templates")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
