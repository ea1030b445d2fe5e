package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Chunker

/** ChunkDocument vs hand-computed chunks (SURVEY §5.3): step math
  * (`document_processor.py:375-377`), empty-piece drops, and page-marker
  * assignment (`:440-448`). */
class ChunkerSpec extends AnyFunSuite {

  test("3000 chars at size=1200/overlap=600 -> 5 chunks stepping 600") {
    val text = "ab" * 1500
    val chunks = Chunker.chunk(text, 1200, 600)
    assert(chunks.length == 5)
    assert(chunks.map(_.text.length) == Seq(1200, 1200, 1200, 1200, 600))
    assert(chunks.forall(_.page.isEmpty))
    assert(chunks.map(_.index) == Seq(0, 1, 2, 3, 4))
  }

  test("degenerate overlap >= size steps by 1") {
    val chunks = Chunker.chunk("abcdefghij", 4, 4)
    assert(chunks.length == 10) // starts 0..9
    assert(chunks.head.text == "abcd")
    assert(chunks.last.text == "j")
  }

  test("whole text stripped first; empty pieces dropped") {
    assert(Chunker.chunk("   ", 10, 0).isEmpty)
    assert(Chunker.chunk(null, 10, 0).isEmpty)
    val c = Chunker.chunk("  abc  ", 10, 0)
    assert(c.map(_.text) == Seq("abc"))
    // a window landing entirely on spaces strips to empty and is dropped,
    // later windows keep their positions
    val spaced = Chunker.chunk("ab        zz", 4, 0)
    assert(spaced.map(_.text) == Seq("ab", "zz"))
  }

  test("page markers: last marker at-or-before chunk start wins, default 1") {
    val text = "aaaa[[page2]]bbbb[[page5]]cccc"
    val chunks = Chunker.chunk(text, 4, 0)
    assert(chunks.map(c => (c.text, c.page.get)) ==
      Seq(("aaaa", 1), ("bbbb", 2), ("cccc", 5)))
  }

  test("marker mid-chunk applies to the next chunk") {
    val text = "aa[[page3]]bb" // marker at clean position 2
    val chunks = Chunker.chunk(text, 4, 0)
    assert(chunks.map(c => (c.text, c.page.get)) == Seq(("aabb", 1)))
    val chunks2 = Chunker.chunk(text, 2, 0)
    assert(chunks2.map(c => (c.text, c.page.get)) == Seq(("aa", 1), ("bb", 3)))
  }

  test("invariants over seeded random inputs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val text = List.fill(rnd.nextInt(200))(('a' + rnd.nextInt(26)).toChar).mkString
      val size = 1 + rnd.nextInt(50)
      val overlap = rnd.nextInt(size) // overlap < size
      val chunks = Chunker.chunk(text, size, overlap)
      assert(chunks.forall(_.text.length <= size))
      assert(chunks.forall(_.text.nonEmpty))
      if (text.nonEmpty) {
        // alphabetic text never strips: step-aligned prefixes rebuild it
        val step = math.max(size - overlap, 1)
        val rebuilt = chunks.map(_.text.take(step)).mkString
        assert(text.startsWith(rebuilt) && rebuilt.length >= text.length - overlap)
        // coverage: total chunk chars can't be less than the text length
        assert(chunks.map(_.text.length).sum >= text.length)
      }
    }
  }
}
