package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("piiMask masks email, IP, SSN and phone; piiCount counts them") {
    val df = Seq(
      ("reach me at jane.doe+spam@sub.example.co.uk or 192.168.1.254, ssn 123-45-6789, tel 555-123-4567", 4),
      ("no pii here at all", 0),
      ("ends with a phone 800-555-0199", 1),
      ("1.2.3.4", 1)
    ).toDF("text", "expected")
    val out = df.select(TextOps.piiMask(col("text")).as("m"),
      TextOps.piiCount(TextOps.piiMask(col("text"))).as("n"), col("expected"))
      .as[(String, Long, Int)].collect()
    assert(out(0)._1 == "reach me at <EMAIL> or <IP>, ssn <SSN>, tel <PHONE>")
    assert(out(2)._1 == "ends with a phone <PHONE>")
    assert(out(3)._1 == "<IP>")
    out.foreach { case (_, n, exp) => assert(n == exp.toLong) }
  }

  test("piiMask precedence: dotted host inside an email is not re-masked as an IP") {
    val m = Seq("mail 10.0.0.1@example.com then bare 10.0.0.1").toDF("text")
      .select(TextOps.piiMask(col("text"))).as[String].head()
    assert(m == "mail <EMAIL> then bare <IP>")
  }

  test("dupWordMilli: 0 when all distinct, scales with repeats, 0 on blank") {
    val out = Seq("a b c d", "a a a a", "x x y z", "  ", "solo")
      .toDF("text").select(TextOps.dupWordMilli(col("text"))).as[Long].collect()
    assert(out.toSeq == Seq(0L, 750L, 250L, 0L, 0L))
  }

  test("url ops: host, registered domain, path depth, graceful non-URL") {
    val rows = Seq(
      "https://www.sub.example.com/en/p7/view?ref=1",
      "https://example.net/",
      "https://host",
      "not a url at all"
    ).toDF("url").select(
      TextOps.urlHost(col("url")).as("h"),
      TextOps.registeredDomain(TextOps.urlHost(col("url"))).as("d"),
      TextOps.urlPathDepth(col("url")).as("p")).as[(String, String, Long)].collect()
    assert(rows(0) == (("www.sub.example.com", "example.com", 3L)))
    assert(rows(1) == (("example.net", "example.net", 0L)))
    assert(rows(2) == (("host", "host", 0L)))
    assert(rows(3) == (("", "", 0L)))
  }

  test("gopher gate: bands on length, mean word, alpha ratio, repetition, stopwords") {
    val out = Seq(
      "the cat sat on the mat with a dog and a fox near it",   // healthy prose
      "zz zz zz zz zz zz zz zz zz zz",                          // repetitive, no stopwords
      "the of and a to in is it that 11 22 33 44 55 66 77 88 99 00 12" // alpha ratio < 0.8
    ).toDF("text").select(TextOps.gopherPass(col("text"))).as[Boolean].collect()
    assert(out.toSeq == Seq(true, false, false))
    assert(Seq("ab cd ef").toDF("t").select(TextOps.meanWordLenMilli(col("t")))
      .as[Long].head() == 2000L)
    assert(Seq("ab 12 c3").toDF("t").select(TextOps.alphaWordRatioMilli(col("t")))
      .as[Long].head() == 666L)
  }

  test("ngramOverlap flags only docs sharing >= minOverlap distinct n-grams") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words here the quick brown fox jumps over the lazy dog tonight"), // full leak
      (11L, "quick brown fox jumps over nothing else matches beyond this point"),     // 1 shared 5-gram
      (12L, "completely unrelated text with zero shared five gram windows at all")    // none
    ).toDF("doc_id", "text")
    val out = Decontam.ngramOverlap(train, bench, "doc_id", "text", n = 5, minOverlap = 2)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(10L), s"got $out")
    assert(out(10L) == 6L) // all 6 of the benchmark doc's 5-grams appear in the leak
  }

  test("ngramOverlap counts a shingle once even if repeated or shared by several bench docs") {
    val bench = Seq((1L, "a b c d e"), (2L, "a b c d e extra")).toDF("doc_id", "text")
    val train = Seq((10L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val out = Decontam.ngramOverlap(train, bench, "doc_id", "text", n = 5, minOverlap = 1)
      .as[(Long, Long)].collect().toMap
    // train doc's distinct 5-grams intersected with the bench shingle set
    assert(out(10L) == train.select(explode(array_distinct(
      graft.dedup.Dedup.wordShingles(col("text"), 5)))).distinct().join(
      bench.select(explode(array_distinct(graft.dedup.Dedup.wordShingles(col("text"), 5)))).distinct(),
      Seq("col")).count())
  }
}
