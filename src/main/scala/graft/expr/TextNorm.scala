package graft.expr

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode text normalization, re-expressing the reference's two cleaners:
 *
 *  - index side  (`/root/reference/utilities_core.py:177-243`,
 *    `normalize_text(text, preserve_whitespace)`): NFKC; `\n`/`\t` kept (if
 *    preserving whitespace) else → space; `\r` → space; drop other C0
 *    controls, DEL, non-BMP codepoints, a fixed invisible-character set,
 *    C1 (U+0080–U+009F), U+FFFD, and the BMP private-use area; collapse
 *    whitespace; empty result → null.
 *  - query side  (`/root/reference/embedding_models.py:66-85`,
 *    `_normalize_text`): NFKC; `\n\t\r` → space; drop other C0 controls,
 *    DEL, non-BMP; collapse; empty result → a single space.
 *
 * JVM note (SURVEY §7.4.2): the reference iterates Python codepoints; here we
 * iterate codepoints too, so "drop codepoints > 0xFFFF" drops whole surrogate
 * pairs, not halves.
 */
object TextNorm {

  /** The reference's INVISIBLE_CHARS set (`utilities_core.py:189-202`). */
  private def isInvisible(cp: Int): Boolean = cp match {
    case 0x00AD | 0x200B | 0x200C | 0x200D | 0x200E | 0x200F |
         0x2060 | 0x2061 | 0x2062 | 0x2063 | 0x2064 | 0xFEFF => true
    case _ => false
  }

  // (?U) = UNICODE_CHARACTER_CLASS so \s/\S match Python's unicode classes.
  private val wsRun = Pattern.compile("(?U)\\s+")
  private val wsNoNlTab = Pattern.compile("(?U)[^\\S\\n\\t]+")
  private val spacesAroundNl = Pattern.compile(" *\\n *")
  private val manyBlankLines = Pattern.compile("\\n{3,}")

  /** Index-side normalization; returns null for empty results. */
  def normalizeIndex(text: String, preserveWhitespace: Boolean): String = {
    if (text == null) return null
    val nfkc = Normalizer.normalize(text, Normalizer.Form.NFKC)
    val sb = new java.lang.StringBuilder(nfkc.length)
    var i = 0
    while (i < nfkc.length) {
      val cp = nfkc.codePointAt(i)
      if (cp == '\n' || cp == '\t') {
        if (preserveWhitespace) sb.appendCodePoint(cp) else sb.append(' ')
      } else if (cp == '\r') sb.append(' ')
      else if (cp < 32 || cp == 127 || cp > 0xFFFF || isInvisible(cp) ||
               (cp >= 0x80 && cp <= 0x9F) || cp == 0xFFFD ||
               (cp >= 0xE000 && cp <= 0xF8FF)) { /* drop */ }
      else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    var result = sb.toString
    if (preserveWhitespace) {
      result = wsNoNlTab.matcher(result).replaceAll(" ")
      result = spacesAroundNl.matcher(result).replaceAll("\n")
      result = manyBlankLines.matcher(result).replaceAll("\n\n")
    } else {
      result = wsRun.matcher(result).replaceAll(" ")
    }
    result = result.strip()
    if (result.isEmpty) null else result
  }

  /** Query-side normalization; returns a single space for empty results. */
  def normalizeQuery(text: String): String = {
    if (text == null) return " "
    val nfkc = Normalizer.normalize(text, Normalizer.Form.NFKC)
    val sb = new java.lang.StringBuilder(nfkc.length)
    var i = 0
    while (i < nfkc.length) {
      val cp = nfkc.codePointAt(i)
      if (cp == '\n' || cp == '\t' || cp == '\r') sb.append(' ')
      else if (cp < 32 || cp == 127 || cp > 0xFFFF) { /* drop */ }
      else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val result = wsRun.matcher(sb.toString).replaceAll(" ").strip()
    if (result.isEmpty) " " else result
  }

  /** UTF8String adapter used by both interpreted eval and generated code. */
  def normalizeUTF8(s: UTF8String, queryMode: Boolean, preserveWs: Boolean): UTF8String = {
    if (queryMode) {
      UTF8String.fromString(normalizeQuery(if (s == null) null else s.toString))
    } else {
      if (s == null) return null
      val r = normalizeIndex(s.toString, preserveWs)
      if (r == null) null else UTF8String.fromString(r)
    }
  }
}
