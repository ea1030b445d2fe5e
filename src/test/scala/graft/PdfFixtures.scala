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

  /** Encrypted twin of [[mkPdf]]: same catalog/pages/content layout, with
    * content streams encrypted by the standard security handler under the
    * EMPTY user+owner passwords. `mode`: "rc4-40" (V1/R2), "rc4-128"
    * (V2/R3), "aes-128" (V4/R4 /AESV2), "aes-256" (V5/R6 /AESV3).
    * `flate` deflates BEFORE encrypting (filters apply after decryption).
    * `breakU` corrupts /U so password validation must fail (negative
    * case: the document becomes a counted skip, not garbage text). */
  def mkEncryptedPdf(pageContents: Seq[String], mode: String,
      flate: Boolean = false, breakU: Boolean = false): Array[Byte] = {
    import graft.ingest.PdfCrypt
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xFF}%02X").mkString
    val n = pageContents.length
    val p = -4L // permission bits; feeds key derivation for R2-4
    val id0 = PdfCrypt.md5("graft-fixture-id".getBytes(StandardCharsets.ISO_8859_1))

    val (encDict, dec: PdfCrypt.Decryptor) = mode match {
      case "aes-256" =>
        // build U/UE (and O/OE) from a chosen file key, per §7.6.4.4.7
        val fileKey = PdfCrypt.sha("SHA-256", "graft-filekey".getBytes).take(32)
        val vSaltU = PdfCrypt.md5("vU".getBytes).take(8)
        val kSaltU = PdfCrypt.md5("kU".getBytes).take(8)
        val none = Array.empty[Byte]
        val uHash = PdfCrypt.hash2B(none, vSaltU, none)
        val u0 = uHash ++ vSaltU ++ kSaltU
        val u = if (breakU) u0.updated(0, (u0(0) ^ 0x55).toByte) else u0
        val ue = PdfCrypt.aesCbc(encrypt = true,
          PdfCrypt.hash2B(none, kSaltU, none), new Array[Byte](16), fileKey, pad = false)
        val vSaltO = PdfCrypt.md5("vO".getBytes).take(8)
        val kSaltO = PdfCrypt.md5("kO".getBytes).take(8)
        val o = PdfCrypt.hash2B(none, vSaltO, u0) ++ vSaltO ++ kSaltO
        val oe = PdfCrypt.aesCbc(encrypt = true,
          PdfCrypt.hash2B(none, kSaltO, u0), new Array[Byte](16), fileKey, pad = false)
        val perms = new Array[Byte](16) // readers derive perms from /P; unchecked
        (s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
          s"/O <${hex(o)}> /U <${hex(u)}> /OE <${hex(oe)}> /UE <${hex(ue)}> " +
          s"/Perms <${hex(perms)}> /P $p >>",
          new PdfCrypt.Decryptor(fileKey, 6, true))
      case _ =>
        val (v, r, bits, cfm) = mode match {
          case "rc4-40" => (1, 2, 40, "")
          case "rc4-128" => (2, 3, 128, "")
          case "aes-128" => (4, 4, 128, "AESV2")
          case other => throw new IllegalArgumentException(other)
        }
        val len = bits / 8
        // Algorithm 3: /O from the (empty → pad) owner password
        var oh = PdfCrypt.md5(PdfCrypt.Pad)
        if (r >= 3) for (_ <- 0 until 50) oh = PdfCrypt.md5(oh)
        val oKey = oh.take(len)
        var o = PdfCrypt.rc4(oKey, PdfCrypt.Pad)
        if (r >= 3) for (i <- 1 to 19) o = PdfCrypt.rc4(oKey.map(b => (b ^ i).toByte), o)
        // Algorithm 2: file key (empty user password)
        val pLe = Array[Byte]((p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
          ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)
        var key = PdfCrypt.md5(PdfCrypt.Pad, o, pLe, id0).take(len)
        if (r >= 3) for (_ <- 0 until 50) key = PdfCrypt.md5(key).take(len)
        // Algorithms 4/5: /U
        var u = if (r == 2) PdfCrypt.rc4(key, PdfCrypt.Pad)
          else {
            var x = PdfCrypt.rc4(key, PdfCrypt.md5(PdfCrypt.Pad, id0))
            for (i <- 1 to 19) x = PdfCrypt.rc4(key.map(b => (b ^ i).toByte), x)
            x ++ new Array[Byte](16) // arbitrary 16-byte pad to 32
          }
        if (breakU) u = u.updated(0, (u(0) ^ 0x55).toByte)
        val cf = if (v >= 4)
          s"/CF << /StdCF << /CFM /$cfm /Length $len >> >> /StmF /StdCF /StrF /StdCF "
        else ""
        (s"<< /Filter /Standard /V $v /R $r /Length $bits $cf" +
          s"/O <${hex(o)}> /U <${hex(u)}> /P $p >>",
          new PdfCrypt.Decryptor(key, r, cfm == "AESV2"))
    }

    // encrypting twin of Decryptor.decrypt (test-side only): RC4 is its own
    // inverse; AES prepends a deterministic per-object IV
    def encStream(objNum: Int, data: Array[Byte]): Array[Byte] =
      if (!dec.useAes) dec.decrypt(objNum, 0, data)
      else {
        val k = {
          // reproduce the per-object key via a probe decryption:
          // decrypt(iv ‖ AES_k(x)) == x ⇒ encrypt with the same derivation
          val ext = Array[Byte]((objNum & 0xFF).toByte, ((objNum >> 8) & 0xFF).toByte,
            ((objNum >> 16) & 0xFF).toByte, 0, 0)
          if (mode == "aes-256") dec.fileKey
          else PdfCrypt.md5(dec.fileKey, ext,
            Array[Byte](0x73, 0x41, 0x6C, 0x54)).take(math.min(dec.fileKey.length + 5, 16))
        }
        val iv = PdfCrypt.md5(s"iv-$objNum".getBytes).take(16)
        iv ++ PdfCrypt.aesCbc(encrypt = true, k, iv, data, pad = true)
      }

    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    for (i <- 0 until n)
      w(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R /Contents ${3 + n + i} 0 R >> endobj\n")
    for (i <- 0 until n) {
      val raw = pageContents(i).getBytes(StandardCharsets.ISO_8859_1)
      val plain = if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length * 2 + 64)
        val m = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, m)
      } else raw
      val data = encStream(3 + n + i, plain)
      val filter = if (flate) " /Filter /FlateDecode" else ""
      w(s"${3 + n + i} 0 obj << /Length ${data.length}$filter >> stream\n")
      out.write(data)
      w("\nendstream endobj\n")
    }
    w(s"${3 + 2 * n} 0 obj $encDict endobj\n")
    w(s"trailer << /Root 1 0 R /Encrypt ${3 + 2 * n} 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF")
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
