package graft.tools

import graft.ingest.WebPagesGen
import graft.pipeline.{LogPipeline, MatchCatalog, PipelineConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-phase wall-clock at two pinned parallelism levels, to locate which
  * phase breaks 1→4 scaling (the north_rule's 0.8 efficiency bar). Not part of the
  * driver contract.
  */
object ScaleProfile {

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
    val work = "/dev/shm/graft_scaleprof"
    val pagesPath = s"/tmp/graft_bench_input/web_pages_$nPages"

    var spark = session(32)
    val fs = new org.apache.hadoop.fs.Path(pagesPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(pagesPath, "_SUCCESS")))
      WebPagesGen.pages(spark, nPages).toDF().write.mode("overwrite").parquet(pagesPath)

    def phases(spark: SparkSession, tag: String): Seq[(String, Double)] = {
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
      time("structure+mask+persist")(masked.count())
      val drain = time("mineDrain")(p.mineDrain(masked))
      val spell = time("mineSpellResidue")(p.mineSpellResidue(masked, drain))
      val bc = spark.sparkContext.broadcast(new MatchCatalog(drain, spell))
      val matched = p.matchPhase(masked, bc)
      val assigned = matched.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("match+persist")(assigned.count())
      val enriched = p.enrich(assigned, WebPagesGen.dimDomainLang(spark))
      time("enrich+salt+route write")(
        enriched.repartitionByRange(col("event_id"), p.saltCol).drop("masked", "parsed")
          .write.mode("overwrite").partitionBy("event_id").parquet(s"$work/routed_$tag"))
      time("templates agg")(p.templateCounts(assigned)
        .write.mode("overwrite").parquet(s"$work/templates_$tag"))
      masked.unpersist(); assigned.unpersist()
      out.result()
    }

    // JIT warm-up at full width, twice
    phases(spark, "warm"); phases(spark, "warm")

    val results = scala.collection.mutable.LinkedHashMap[String, Map[Int, Double]]()
    for (level <- Seq(4, 1, 4, 1)) {
      spark = session(level)
      pin(level)
      val r = phases(spark, s"l$level")
      pin(32)
      r.foreach { case (name, t) =>
        val m = results.getOrElse(name, Map.empty)
        // keep min per level
        results(name) = m.updated(level, math.min(t, m.getOrElse(level, Double.MaxValue)))
      }
      println(s"=== level $level: " + r.map { case (n, t) => f"$n=$t%.1f" }.mkString(" "))
    }
    println(f"${"phase"}%-28s ${"t1"}%8s ${"t4"}%8s ${"speedup"}%8s")
    var t1sum = 0.0; var t4sum = 0.0
    results.foreach { case (name, m) =>
      val t1 = m(1); val t4 = m(4)
      t1sum += t1; t4sum += t4
      println(f"$name%-28s $t1%8.2f $t4%8.2f ${t1 / t4}%8.2f")
    }
    println(f"${"TOTAL"}%-28s $t1sum%8.2f $t4sum%8.2f ${t1sum / t4sum}%8.2f eff=${t1sum / t4sum / 4}%.3f")
    spark.stop()
  }
}
