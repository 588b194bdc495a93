package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RegexpExtractGroupsSpec extends SparkSuite {
  import spark.implicits._

  private val pat = "^(\\w+)\\s+(\\w+):\\s+(.*?)$"

  test("extracts all groups in one pass; null on miss; matches regexp_extract") {
    val df = Seq("INFO dfs: started ok", "garbage", "WARN io: x y z")
      .toDF("line")
      .withColumn("g", RegexpExtractGroups(col("line"), pat))
    val rows = df.select(col("g")).collect()
    assert(rows(0).getSeq[String](0) == Seq("INFO", "dfs", "started ok"))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getSeq[String](0) == Seq("WARN", "io", "x y z"))

    // parity with built-in regexp_extract per group (on matching lines)
    val cmp = df.filter(col("g").isNotNull)
      .withColumn("e1", regexp_extract(col("line"), pat, 1))
      .withColumn("e2", regexp_extract(col("line"), pat, 2))
      .withColumn("e3", regexp_extract(col("line"), pat, 3))
      .filter(col("g").getItem(0) =!= col("e1") ||
              col("g").getItem(1) =!= col("e2") ||
              col("g").getItem(2) =!= col("e3"))
    assert(cmp.count() == 0)
  }

  test("whole-stage codegen path produces identical results to interpreted") {
    val data = (0 until 2000).map(i => s"L$i k$i: payload $i with tail")
    val df = data.toDF("line")
    val withCg = df.withColumn("g", RegexpExtractGroups(col("line"), pat))
      .select(col("g").getItem(2).as("c"))
    // codegen on (default)
    val a = withCg.collect().map(_.getString(0))
    // force interpreted eval
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val b = try withCg.collect().map(_.getString(0)) finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(a.toSeq == b.toSeq)
    assert(a(7) == "payload 7 with tail")
  }

  test("null input line yields null output") {
    val df = Seq(Some("A B: c"), None).toDF("line")
      .withColumn("g", RegexpExtractGroups(col("line"), pat))
    val rows = df.select("g").collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
