package graft.spell

import org.scalatest.funsuite.AnyFunSuite

class SpellSpec extends AnyFunSuite {

  private def T(s: String): Array[String] = s.split(" ")

  test("LCS basics: lcs(a,a)=a, empty, classic example") {
    val m = new SpellModel()
    assert(m.lcs(T("a b c"), T("a b c")) == List("a", "b", "c"))
    assert(m.lcs(T("a b"), Array.empty[String]) == Nil)
    assert(m.lcs(T("a x b y c"), T("a b q c")) == List("a", "b", "c"))
  }

  test("LCS length properties on random inputs") {
    val rnd = new scala.util.Random(11)
    val alphabet = Array("p", "q", "r", "s")
    val m = new SpellModel()
    for (_ <- 0 until 300) {
      val a = Array.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(4)))
      val b = Array.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(4)))
      val l = m.lcs(a, b)
      assert(l.length <= math.min(a.length, b.length))
      assert(m.lcs(a, a).length == a.length)
      // lcs is a subsequence of both
      def isSubseq(s: List[String], of: Array[String]): Boolean = {
        var i = 0
        s.forall { t => var found = false
          while (i < of.length && !found) { if (of(i) == t) found = true; i += 1 }
          found
        }
      }
      assert(isSubseq(l, a) && isSubseq(l, b))
    }
  }

  test("getTemplate: non-LCS positions become <*>; trailing remainder is ONE <*>") {
    val m = new SpellModel()
    val tpl = m.getTemplate(List("send", "done"), T("send x y done a b c"))
    // consumes until lcs exhausted at 'done' (position 3), remainder → single <*>
    assert(tpl.toSeq == Seq("send", "<*>", "<*>", "done", "<*>"))
  }

  test("identical lines group; template refines via LCS") {
    val m = new SpellModel()
    val c1 = m.add(T("Command Failed on node-1"))
    val c2 = m.add(T("Command Failed on node-2"))
    assert(c1 eq c2)
    assert(c1.count == 2)
    assert(c1.templateStr == "Command Failed on <*>")
  }

  test("unrelated lines form separate clusters") {
    val m = new SpellModel()
    m.add(T("alpha beta gamma delta"))
    m.add(T("one two three four"))
    assert(m.clusterList.size == 2)
  }

  test("prefixTreeMatch uses tau (not hardcoded 0.5) and continues past a failing cluster") {
    // c1 sits at the first scanned token but fails the threshold; the scan must
    // CONTINUE at the same parent (reference for-loop fall-through) and find c2.
    val m = new SpellModel(0.5)
    val c1 = new LcsCluster(Array("a", "<*>", "<*>", "<*>"), 1L) // constCount 1
    val c2 = new LcsCluster(Array("b", "c", "d"), 1L)            // constCount 3
    m.addToPrefixTree(c1); m.addToPrefixTree(c2)
    val seq = Array("a", "b", "c", "d") // threshold 0.5*4 = 2: c1 fails, c2 passes
    assert(m.prefixTreeMatch(m.root, seq, 0) eq c2)

    // same tree at tau = 0.9: threshold 3.6 — BOTH clusters fail → null
    // (the old hardcoded-0.5 comparison would wrongly accept c2 here)
    val strict = new SpellModel(0.9)
    strict.addToPrefixTree(new LcsCluster(Array("a", "<*>", "<*>", "<*>"), 1L))
    strict.addToPrefixTree(new LcsCluster(Array("b", "c", "d"), 1L))
    assert(strict.prefixTreeMatch(strict.root, seq, 0) == null)
  }

  test("search on frozen model matches without minting clusters") {
    val m = new SpellModel()
    m.add(T("user login from 10.0.0.1"))
    m.add(T("user login from 10.9.9.9"))
    val n = m.clusterList.size
    val hit = m.search(T("user login from 172.16.0.8"))
    assert(hit != null && hit.templateStr == "user login from <*>")
    assert(m.clusterList.size == n)
  }
}
