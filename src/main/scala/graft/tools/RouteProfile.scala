package graft.tools

import graft.ingest.WebPagesGen
import graft.pipeline.{LogPipeline, MatchCatalog, PipelineConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose the route-write phase (the 2.55×-scaling laggard found by
  * ScaleProfile) into shuffle / encode / dynamic-partition-commit components at two
  * pinned parallelism levels. Not part of the driver contract.
  */
object RouteProfile {

  private def pin(n: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    new ProcessBuilder("taskset", "-a", "-p", "-c", s"0-${n - 1}", pid.toString)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectError(ProcessBuilder.Redirect.DISCARD)
      .start().waitFor()
  }

  private def session(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toLong).getOrElse(200000L)
    val cfg = PipelineConfig.hdfs.copy(mineSampleLimit = Some(50000))
    val p = new LogPipeline(cfg)
    val work = "/dev/shm/graft_routeprof"
    val pagesPath = s"/tmp/graft_bench_input/web_pages_$nPages"

    var spark = session(32)
    val fs = new org.apache.hadoop.fs.Path(pagesPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(pagesPath, "_SUCCESS")))
      WebPagesGen.pages(spark, nPages).toDF().write.mode("overwrite").parquet(pagesPath)

    def experiments(spark: SparkSession, tag: String): Seq[(String, Double)] = {
      val out = Seq.newBuilder[(String, Double)]
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        out += name -> (System.nanoTime() - t0) / 1e9
        r
      }
      spark.catalog.clearCache()
      val pages = spark.read.parquet(pagesPath)
      val masked = p.withMasked(p.structure(p.explodeLines(pages)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val drain = p.mineDrain(masked)
      val spell = p.mineSpellResidue(masked, drain)
      val bc = spark.sparkContext.broadcast(new MatchCatalog(drain, spell))
      val assigned = p.matchPhase(masked, bc)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assigned.count() // materialize outside the timed experiments
      val enriched = p.enrich(assigned, WebPagesGen.dimDomainLang(spark))
      val salted = enriched.repartitionByRange(col("event_id"), p.saltCol)
        .drop("masked", "parsed")

      time("A shuffle+sample only (noop)")(
        salted.write.mode("overwrite").format("noop").save())
      time("B full partitionBy write")(
        salted.write.mode("overwrite").partitionBy("event_id")
          .parquet(s"$work/routed_b_$tag"))
      time("C flat parquet write")(
        salted.write.mode("overwrite").parquet(s"$work/routed_c_$tag"))
      val hashed = enriched.repartition(col("event_id"), p.saltCol)
        .drop("masked", "parsed")
      time("D hash-shuffle partitionBy")(
        hashed.write.mode("overwrite").partitionBy("event_id")
          .parquet(s"$work/routed_d_$tag"))
      masked.unpersist(); assigned.unpersist()
      out.result()
    }

    experiments(spark, "warm"); experiments(spark, "warm")

    val results = scala.collection.mutable.LinkedHashMap[String, Map[Int, Double]]()
    for (level <- Seq(4, 1, 4, 1)) {
      spark = session(level)
      pin(level)
      val r = experiments(spark, s"l$level")
      pin(32)
      r.foreach { case (name, t) =>
        val m = results.getOrElse(name, Map.empty)
        results(name) = m.updated(level, math.min(t, m.getOrElse(level, Double.MaxValue)))
      }
      println(s"=== level $level: " + r.map { case (n, t) => f"$n=$t%.1f" }.mkString(" | "))
    }
    println(f"${"experiment"}%-32s ${"t1"}%8s ${"t4"}%8s ${"speedup"}%8s")
    results.foreach { case (name, m) =>
      println(f"$name%-32s ${m(1)}%8.2f ${m(4)}%8.2f ${m(1) / m(4)}%8.2f")
    }
    spark.stop()
  }
}
