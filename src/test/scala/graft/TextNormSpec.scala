package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.TextNorm

/** Unit table for NormalizeText vs reference-derived cases (SURVEY §5.3):
  * NFKC pairs, the invisible-char set (`utilities_core.py:189-202`), C1 and
  * private-use ranges, carriage-return handling, preserve-whitespace rules,
  * and the query-mode contract (`embedding_models.py:66-85`). All
  * non-printable codepoints are spelled as \\u escapes. */
class TextNormSpec extends AnyFunSuite {

  private def idx(s: String, pw: Boolean = false) = TextNorm.normalizeIndex(s, pw)
  private def qry(s: String) = TextNorm.normalizeQuery(s)

  test("NFKC compatibility folds") {
    assert(idx("ﬁle") == "file") // fi ligature
    assert(idx("１２３") == "123") // full-width digits
    assert(idx("①") == "1") // circled digit one
    assert(idx("a\u00a0b") == "a b") // NBSP -> space via NFKC
  }

  test("invisible characters dropped") {
    assert(idx("a\u00adb\u200bc\u200cd\u200de\u200ef\u200fg\u2060h\ufeffi") ==
      "abcdefghi")
    assert(idx("x\u2061\u2062\u2063\u2064y") == "xy")
  }

  test("control, C1, replacement, private-use, non-BMP dropped") {
    assert(idx("a\u0001b\u0002c") == "abc") // C0 controls
    assert(idx("a\u007fb") == "ab") // DEL
    assert(idx("a\u0085b\u009fc") == "abc") // C1 range
    assert(idx("a\ufffdb") == "ab") // replacement char
    assert(idx("a\ue000b\uf8ffc") == "abc") // private use area
    assert(idx("a\ud83d\ude00b") == "ab") // U+1F600 emoji (surrogate pair)
  }

  test("whitespace: default mode collapses everything") {
    assert(idx("a\nb\tc\rd") == "a b c d")
    assert(idx("  a   b  ") == "a b")
  }

  test("whitespace: preserve mode keeps newline and tab, applies line rules") {
    assert(idx("a\nb", pw = true) == "a\nb")
    assert(idx("a \n b", pw = true) == "a\nb") // spaces around newline
    assert(idx("a\n\n\n\n\nb", pw = true) == "a\n\nb") // 3+ blank lines -> 2
    assert(idx("a\rb", pw = true) == "a b") // CR still becomes space
    assert(idx("a\t\tb", pw = true) == "a\t\tb") // tabs kept verbatim
  }

  test("empty results: index mode null, query mode single space") {
    assert(idx("") == null)
    assert(idx(" \u200b \u00ad ") == null)
    assert(idx(null) == null)
    assert(qry("") == " ")
    assert(qry("\u0001\u0002") == " ")
    assert(qry(null) == " ")
  }

  test("query mode keeps invisible chars (only <32, 127, >BMP drop)") {
    assert(qry("a\u00adb") == "a\u00adb") // soft hyphen survives query mode
    assert(qry("a\ue000b") == "a\ue000b") // private use survives query mode
    assert(qry("a\ud83d\ude00b") == "ab") // non-BMP still dropped
    assert(qry("a\nb\tc\rd") == "a b c d")
  }

  test("idempotence (seeded random property)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val s = List.fill(rnd.nextInt(40))(rnd.nextInt(0x3000).toChar).mkString
      val once = idx(s)
      assert(idx(if (once == null) "" else once) == once)
      val q = qry(s)
      assert(qry(q) == q)
    }
  }
}
