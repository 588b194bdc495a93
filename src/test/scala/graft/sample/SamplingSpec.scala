package graft.sample

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = (0 until 1000)
    .map(i => (i.toLong, if (i % 4 == 0) "es" else "en", s"doc number $i word" * (1 + i % 5)))
    .toDF("doc_id", "lang", "text")

  test("stratified sample: deterministic, layout-independent, ~fraction sized") {
    val fr = Map("en" -> 0.5, "es" -> 0.2)
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang", fr)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(docs.repartition(17), "doc_id", "lang", fr)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "hash rule must not depend on partitioning")
    val nEn = docs.filter(col("lang") === "en").count().toDouble
    val kEn = Sampling.stratifiedSample(docs, "doc_id", "lang", fr)
      .filter(col("lang") === "en").count().toDouble
    assert(math.abs(kEn / nEn - 0.5) < 0.08, s"en keep rate ${kEn / nEn}")
    // a stratum missing from the map is dropped entirely
    val onlyEs = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("es" -> 1.0))
    assert(onlyEs.filter(col("lang") === "en").count() == 0)
    assert(onlyEs.count() == docs.filter(col("lang") === "es").count())
  }

  test("token budget: never exceeded, maximal hash-ordered prefix, deterministic") {
    val withTok = docs.withColumn("n_tokens", lit(7L))
    val kept = Sampling.tokenBudgetSample(withTok, "doc_id", "lang", "n_tokens", 70L)
    // 7 tokens each → exactly 10 docs per stratum fit the 70-token budget
    val perLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang == Map("en" -> 10L, "es" -> 10L))
    val again = Sampling.tokenBudgetSample(withTok.repartition(13), "doc_id", "lang",
      "n_tokens", 70L).select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("keyCap: two-phase salted cap == single-window semantics on a skewed key") {
    // one hot key (900 rows) + two cold ones; salts=8 exercises the pre-cap merge
    val rows = ((1L to 900L).map(i => (i, "hot")) ++
      (901L to 910L).map(i => (i, "warm")) ++ Seq((911L, "cold"))).toDF("doc_id", "key")
    val capped = Sampling.keyCap(rows.repartition(7), "key", "doc_id", k = 25, salts = 8)
      .as[(Long, String)].collect().toSet
    // single-window truth: lowest 25 doc_ids of hot, all of warm/cold
    val want = ((1L to 25L).map(i => (i, "hot")) ++
      (901L to 910L).map(i => (i, "warm")) ++ Seq((911L, "cold"))).toSet
    assert(capped == want)
    // k larger than any group: identity
    assert(Sampling.keyCap(rows, "key", "doc_id", k = 1000).count() == 911)
  }

  test("keyCap: frames carrying map columns still salt (round-4 ADVICE)") {
    // xxhash64 rejects MapType at analysis time — the full-row salt must skip
    // unhashable columns (at any nesting) instead of failing the whole frame
    val rows = (1L to 40L).map(i => (i, "hot", Map("k" -> i)))
      .toDF("doc_id", "key", "props")
      .withColumn("nested", struct(col("props").as("inner")))
    val capped = Sampling.keyCap(rows, "key", "doc_id", k = 5, salts = 4)
    assert(capped.select("doc_id").as[Long].collect().sorted.toSeq == (1L to 5L))
    assert(capped.columns.toSeq == Seq("doc_id", "key", "props", "nested"))
  }
}
