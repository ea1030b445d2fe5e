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
}
