package graft.lenma

import graft.SparkSuite

class LenMaSpec extends SparkSuite {
  import spark.implicits._

  private def mined(lines: Seq[String]): Map[String, Long] =
    LenMa.mineTemplates(lines.toDF("line"), "line")
      .as[(String, Long)].collect().toMap

  test("same word-length shape clusters; disagreeing positions wildcard") {
    val lines = Seq(
      "conn from host1 ok", // lengths 4,4,5,2
      "conn from host2 ok",
      "conn from host3 ok",
      "disconnect now") // different shape entirely
    assert(mined(lines) == Map(
      "conn from <*> ok" -> 3L,
      "disconnect now" -> 1L))
  }

  test("equal token count but different length vectors do NOT cluster") {
    // "ab cd" (2,2) vs "abc de" (3,2): LenMa's whole point — token count alone
    // would merge them, the length vector keeps them apart
    val m = mined(Seq("ab cd", "ab ce", "abc de", "abc df"))
    assert(m == Map("ab <*>" -> 2L, "abc <*>" -> 2L))
  }

  test("identical templates from different length clusters merge counts") {
    // host1/host9 share lengths; host22 has a longer second word — different
    // cluster, but after wildcarding both clusters emit "up <*>" and must merge
    val m = mined(Seq("up host1", "up host9", "up host22", "up host33"))
    assert(m == Map("up <*>" -> 4L))
  }

  test("deterministic under repartition") {
    val lines = (0 until 200).map(i => s"evt user${100 + i} done")
    val a = LenMa.mineTemplates(lines.toDF("line").repartition(9), "line")
      .as[(String, Long)].collect().toMap
    val b = LenMa.mineTemplates(lines.toDF("line").repartition(1), "line")
      .as[(String, Long)].collect().toMap
    assert(a == b)
    assert(a == Map("evt <*> done" -> 200L))
  }

  test("mineCatalog ids are the engine's md5-prefix event ids") {
    val cat = LenMa.mineCatalog(Seq("a bb", "a bc").toDF("line"), "line")
      .as[(String, String, Long)].collect()
    assert(cat.map(c => (c._2, c._3)).toSeq == Seq(("a <*>", 2L)))
    cat.foreach { case (id, tpl, _) =>
      assert(id == graft.drain.DrainTree.eventId(tpl))
    }
  }
}
