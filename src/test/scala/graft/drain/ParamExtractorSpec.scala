package graft.drain

import org.scalatest.funsuite.AnyFunSuite

class ParamExtractorSpec extends AnyFunSuite {

  test("extracts slot values against raw content") {
    val ps = ParamExtractor.extract(
      "Received block <*> of size <*> from /<*>",
      "Received block blk_-99 of size 67108864 from /10.251.42.84")
    assert(ps.toSeq == Seq("blk_-99", "67108864", "10.251.42.84"))
  }

  test("no-slot template yields empty list") {
    assert(ParamExtractor.extract("Starting up", "Starting up").isEmpty)
  }

  test("reference quirk: short literal <...> runs are ALSO treated as slots") {
    // `<init>` is 6 chars incl. brackets → matches <.{1,5}> → becomes a parameter slot
    val ps = ParamExtractor.extract(
      "calling <init> on worker <*>",
      "calling setup on worker w4")
    assert(ps.toSeq == Seq("setup", "w4"))
  }

  test("non-matching content yields empty list") {
    assert(ParamExtractor.extract("get <*> done", "totally different").isEmpty)
  }

  test("multi-space template collapses to \\s+ matching") {
    val ps = ParamExtractor.extract("a  <*>  b", "a  X  b")
    assert(ps.toSeq == Seq("X"))
  }

  test("regex metacharacters in templates are escaped") {
    val ps = ParamExtractor.extract(
      "BLOCK* NameSystem.addStoredBlock: blockMap updated: <*> is added to <*> size <*>",
      "BLOCK* NameSystem.addStoredBlock: blockMap updated: 10.0.0.1:50010 is added to blk_7 size 8192")
    assert(ps.toSeq == Seq("10.0.0.1:50010", "blk_7", "8192"))
  }
}
