package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (guide §1) — NOT part of the driver contract.
  *
  * Replicates `Bench`'s per-query session and timing methodology exactly
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE on, noop sink,
  * tmpfs spark.local.dir) but runs only the queries named on the command line
  * (all when none given), with optional repeats, so a single query can be
  * iterated on in seconds instead of re-running the full frozen bench.
  *
  * Usage:
  *   sbt "runMain graft.tools.BenchExtra [--reps N] [--plans DIR] [query ...]"
  *
  * With `--plans DIR`, each query's `.explain("formatted")` output is written to
  * DIR/<query>.txt before timing (the judge-facing plan evidence for
  * plans/r06/). Timings print as one JSON line per rep.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_bench_local"
        else "/tmp/graft_bench_local")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Per-stage wall/task-time/shuffle attribution (guide §7.1, sans UI). */
  private final class StageListener extends org.apache.spark.scheduler.SparkListener {
    final case class St(name: String, wallMs: Long, taskMs: Long, tasks: Int,
                        shRead: Long, shWrite: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val wall = (for (s <- i.submissionTime; c <- i.completionTime) yield c - s).getOrElse(0L)
      stages.add(St(i.name.linesIterator.next(), wall,
        i.taskMetrics.executorRunTime, i.numTasks,
        i.taskMetrics.shuffleReadMetrics.totalBytesRead,
        i.taskMetrics.shuffleWriteMetrics.bytesWritten))
    }
    def drainTop(n: Int): Seq[St] = {
      val out = scala.collection.mutable.ArrayBuffer[St]()
      var s = stages.poll()
      while (s != null) { out += s; s = stages.poll() }
      out.sortBy(-_.wallMs).take(n).toSeq
    }
    def drainCount(): Int = { var c = 0; while (stages.poll() != null) c += 1; c }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var reps = 1
    var plansDir: Option[String] = None
    var stageTop = 0
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--stages" => stageTop = args(i + 1).toInt; i += 2
        case q => names += q; i += 1
      }
    }
    val all = graft.SparkEntry.queries
    val picked = if (names.isEmpty) all.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> all(n))
    val spark = session(cpus)
    val listener = if (stageTop > 0) {
      val l = new StageListener; spark.sparkContext.addSparkListener(l); Some(l)
    } else None

    for (r <- 1 to reps) {
      val results = picked.map { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        listener.foreach(_.drainCount())
        plansDir.filter(_ => r == 1).foreach { d =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          val df = fn(spark, sfDir)
          java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
        }
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable => fn(spark, sfDir).count() }
        val sec = (System.nanoTime() - t0) / 1e9
        listener.foreach { l =>
          Thread.sleep(200) // let stage-completed events drain
          val all = l.drainTop(stageTop)
          println(f"STAGES $name rep=$r nStages=?")
          all.foreach { s =>
            println(f"  ${s.wallMs}%6d ms wall  ${s.taskMs}%7d ms task  " +
              f"${s.tasks}%3d tasks  shR=${s.shRead}%9d shW=${s.shWrite}%9d  ${s.name}")
          }
        }
        spark.sparkContext.setJobDescription(null)
        name -> sec
      }
      val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
      println(f"""{"rep":$r,"total":${results.map(_._2).sum}%.3f,"queries":$qs}""")
    }
    spark.stop()
  }
}
