package graft.tools

import graft.ingest.WebPagesGen
import graft.pipeline.{LogPipeline, MatchCatalog, PipelineConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-by-phase timing of the pipeline (dev tool; not part of the contract). */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val cfg = PipelineConfig.hdfs
    val p = new LogPipeline(cfg)
    val work = sys.env.getOrElse("GRAFT_PROFILE_DIR", "/tmp/graft_profile")
    val pagesPath = s"$work/pages_$nPages"
    val fs = new org.apache.hadoop.fs.Path(pagesPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(pagesPath, "_SUCCESS")))
      time("gen+write input")(WebPagesGen.pages(spark, nPages).toDF()
        .write.mode("overwrite").parquet(pagesPath))

    for (round <- 1 to 3) {
      println(s"=== round $round ===")
      spark.catalog.clearCache() // cold cache, warm JIT after round 1
      val pages = spark.read.parquet(pagesPath)
      val masked = p.withMasked(p.structure(p.explodeLines(pages)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nLines = time("structure+mask+persist")(masked.count())
      println(s"  lines=$nLines")
      val drain = time("mineDrain")(p.mineDrain(masked))
      println(s"  clusters=${drain.clusterList.size}")
      val spell = time("mineSpellResidue")(p.mineSpellResidue(masked, drain))
      println(s"  spellClusters=${spell.clusterList.size}")
      val bc = spark.sparkContext.broadcast(new MatchCatalog(drain, spell))
      val matched = p.matchPhase(masked, bc)
      time("match (noop write)")(
        matched.write.mode("overwrite").format("noop").save())
      val enriched = p.enrich(matched, WebPagesGen.dimDomainLang(spark))
      time("enrich+salt+route write")(
        enriched.repartitionByRange(col("event_id"), p.saltCol).drop("masked", "parsed")
          .write.mode("overwrite").partitionBy("event_id").parquet(s"$work/routed"))
      time("templates agg")(p.templateCounts(matched)
        .write.mode("overwrite").parquet(s"$work/templates"))
    }
    spark.stop()
  }
}
