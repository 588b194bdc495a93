ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "logparserspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through RAW instead of re-logging each line with
// an "[info] " prefix: graft.Bench's contract is ONE machine-parseable JSON line
// on stdout, and "[info] {...}" defeats a strict line parser (both completed
// driver bench artifacts carry `parsed: null` despite the JSON being present in
// the tail — consistent with exactly that prefix).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Pre-size and pre-touch the whole heap at JVM start (untimed): without Xms
  // the heap grows across the first runs and with lazy commit the young gen's
  // first touch of each fresh page takes a soft page fault INSIDE a timed
  // window — both are one-sided noise the scaling pair estimator then has to
  // fight. A 16 GiB pre-touch costs a few seconds once, before any warm-up.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
  // throughput-batch workload: ParallelGC beats G1's pause-target behavior here
  "-XX:+UseParallelGC",
  // GC ergonomics size the worker pool from the MACHINE's 32 CPUs at JVM start;
  // the bench then taskset-pins the JVM to 1–4 cores, leaving 32 GC threads to
  // thrash on every young-gen pause. Pin the pool to the bench's high level.
  "-XX:ParallelGCThreads=4",
)
