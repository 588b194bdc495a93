package graft.lke

import graft.SparkSuite

class LkeSpec extends SparkSuite {
  import spark.implicits._

  private def mined(lines: Seq[String], splitThreshold: Int = 4): Map[String, Long] =
    Lke.mineTemplates(lines.toDF("line"), "line", splitThreshold)
      .as[(String, Long)].collect().toMap

  test("edit-distance clusters separate; high-cardinality column wildcards") {
    // intra distances 1 (digit changes), inter distances >> — the learned 2-means
    // threshold must land between the modes; host cardinality 6 > splitThreshold 4
    // so the column stays a wildcard
    val lines = (1 to 6).map(i => s"conn host$i ok") ++
      (1 to 6).map(i => s"shutdown imminent t$i")
    assert(mined(lines) == Map(
      "conn <*> ok" -> 6L,
      "shutdown imminent <*>" -> 6L))
  }

  test("private-content splitting iterates to fixpoint across rounds") {
    // one cluster (all pairs within levenshtein chain distance), three columns:
    // A (cardinality 2) splits round 1, P (cardinality 3) splits round 2,
    // u (cardinality 6 > threshold) stays a wildcard
    val lines = for {
      a <- Seq("a", "b"); p <- Seq("p1", "p2", "p3"); u <- 1 to 6
    } yield s"job $a $p u$u"
    val expected = (for { a <- Seq("a", "b"); p <- Seq("p1", "p2", "p3") }
      yield s"job $a $p <*>" -> 6L).toMap
    assert(mined(lines) == expected)
  }

  test("split column honors the threshold boundary") {
    // cardinality exactly == splitThreshold splits; one above does not
    val lines = for (x <- Seq("aa", "ab", "ba", "bb"); u <- 1 to 6)
      yield s"ev $x u$u"
    val m4 = mined(lines, splitThreshold = 4)
    assert(m4 == Seq("aa", "ab", "ba", "bb").map(x => s"ev $x <*>" -> 6L).toMap)
    val m3 = mined(lines, splitThreshold = 3)
    assert(m3 == Map("ev <*> <*>" -> 24L))
  }

  test("duplicate lines weight occurrences, not the distance graph") {
    val lines = Seq.fill(5)("up host1 ok") ++ Seq.fill(3)("up host2 ok") ++
      (3 to 6).map(i => s"up host$i ok")
    assert(mined(lines) == Map("up <*> ok" -> 12L))
  }

  test("fail-stop above maxPatterns instead of a quadratic job") {
    val lines = (0 until 50).map(i => s"line nr$i")
    val ex = intercept[IllegalArgumentException] {
      Lke.mineTemplates(lines.toDF("line"), "line", 4, maxPatterns = 10).count()
    }
    assert(ex.getMessage.contains("maxPatterns"))
  }

  test("deterministic under repartition") {
    val lines = (0 until 60).map(i => s"evt u${i % 6} code c${i % 12}")
    val a = Lke.mineTemplates(lines.toDF("line").repartition(9), "line")
      .as[(String, Long)].collect().toMap
    val b = Lke.mineTemplates(lines.toDF("line").repartition(1), "line")
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("mineCatalog ids are the engine's md5-prefix event ids") {
    val cat = Lke.mineCatalog((1 to 6).map(i => s"a b$i").toDF("line"), "line")
      .as[(String, String, Long)].collect()
    assert(cat.map(c => (c._2, c._3)).toSeq == Seq(("a <*>", 6L)))
    cat.foreach { case (id, tpl, _) =>
      assert(id == graft.drain.DrainTree.eventId(tpl))
    }
  }
}
