package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Shared test builder for minimal-but-valid PDFs: catalog → page tree →
  * per-page content streams, optional FlateDecode. No xref table — the
  * reader scans object definitions. */
object PdfFixtures {

  def mkPdf(pageContents: Seq[String], flate: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val n = pageContents.length
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    for (i <- 0 until n)
      w(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R /Contents ${3 + n + i} 0 R >> endobj\n")
    for (i <- 0 until n) {
      val raw = pageContents(i).getBytes(StandardCharsets.ISO_8859_1)
      val data = if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length * 2 + 64)
        val m = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, m)
      } else raw
      val filter = if (flate) " /Filter /FlateDecode" else ""
      w(s"${3 + n + i} 0 obj << /Length ${data.length}$filter >> stream\n")
      out.write(data)
      w("\nendstream endobj\n")
    }
    w("trailer << /Root 1 0 R >>\n%%EOF")
    out.toByteArray
  }

  /** One-page PDF with a Type0/Identity-H font: 2-byte codes in the
    * content stream, decoded through the supplied ToUnicode CMap text.
    * `withToUnicode = false` builds the degenerate CID font (no CMap) that
    * must extract as NOTHING (codes are glyph ids, not characters). */
  /** `cmapFilter`: an unsupported /Filter name on the ToUnicode stream
    * makes it UNDECODABLE (the unusable-CMap path). `resourcesOnPages`
    * hangs /Resources off the /Pages tree node (the inheritable-attribute
    * path) instead of the page itself. */
  def mkCidPdf(content: String, cmap: String,
      withToUnicode: Boolean = true, cmapFilter: String = "",
      resourcesOnPages: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val res = "/Resources << /Font << /F9 5 0 R >> >> "
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
      (if (resourcesOnPages) res else "") + ">> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      (if (resourcesOnPages) "" else res) + ">> endobj\n")
    val data = content.getBytes(StandardCharsets.ISO_8859_1)
    w(s"4 0 obj << /Length ${data.length} >> stream\n")
    out.write(data)
    w("\nendstream endobj\n")
    val toUni = if (withToUnicode) " /ToUnicode 6 0 R" else ""
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
      s"/Encoding /Identity-H$toUni >> endobj\n")
    if (withToUnicode) {
      val cm = cmap.getBytes(StandardCharsets.ISO_8859_1)
      val filt = if (cmapFilter.nonEmpty) s" /Filter /$cmapFilter" else ""
      w(s"6 0 obj << /Length ${cm.length}$filt >> stream\n")
      out.write(cm)
      w("\nendstream endobj\n")
    }
    w("trailer << /Root 1 0 R >>\n%%EOF")
    out.toByteArray
  }

  /** The standard ToUnicode skeleton around bfchar/bfrange body lines. */
  def cmap(body: String): String =
    s"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
$body
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
}
