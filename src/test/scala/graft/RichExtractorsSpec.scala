package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.RichExtractors

/** Pure-JVM binary extractors: HTML strip, EML multipart walk with
  * transfer encodings, DOCX/XLSX built as real in-memory ZIPs, RTF control
  * words, and the documented PDF/MSG stubs. */
class RichExtractorsSpec extends AnyFunSuite {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    for ((name, content) <- entries) {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("html: tags stripped with space separator, entities decoded") {
    val html = """<html><head><style>p{color:red}</style>
      <script>alert("x")</script></head>
      <body><h1>Title</h1><p>one &amp; two &lt;three&gt;</p>
      <!-- comment --><div>&#65;&#x42;</div></body></html>"""
    val got = RichExtractors.extractHtml(html.getBytes(StandardCharsets.UTF_8))
    assert(got.contains("Title"))
    assert(got.contains("one & two <three>"))
    assert(got.contains("AB"))
    assert(!got.contains("alert") && !got.contains("color") && !got.contains("comment"))
  }

  test("eml: subject + plain + html parts, quoted-printable and base64") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "<p>html <b>bold</b> part</p>".getBytes(StandardCharsets.UTF_8))
    val eml =
      s"""Subject: Quarterly report
         |From: a@example.com
         |MIME-Version: 1.0
         |Content-Type: multipart/alternative; boundary="BOUND"
         |
         |--BOUND
         |Content-Type: text/plain; charset=utf-8
         |Content-Transfer-Encoding: quoted-printable
         |
         |plain caf=C3=A9 body
         |--BOUND
         |Content-Type: text/html; charset=utf-8
         |Content-Transfer-Encoding: base64
         |
         |$b64
         |--BOUND--
         |""".stripMargin.replace("\n", "\r\n")
    val got = RichExtractors.extractEml(eml.getBytes(StandardCharsets.UTF_8))
    assert(got.startsWith("Subject: Quarterly report"))
    assert(got.contains("plain café body"))
    assert(got.contains("html") && got.contains("bold") && !got.contains("<b>"))
  }

  test("eml: pdf attachment decodes and recurses; nested eml depth-capped") {
    val pdf = PdfFixtures.mkPdf(
      Seq("BT /F1 12 Tf 72 720 Td (attached pdf payload) Tj ET"), flate = false)
    val pdfB64 = java.util.Base64.getMimeEncoder.encodeToString(pdf)
    def mail(subject: String, inner: String): String =
      s"""Subject: $subject
         |MIME-Version: 1.0
         |Content-Type: multipart/mixed; boundary="BB"
         |
         |--BB
         |Content-Type: text/plain; charset=utf-8
         |
         |covering note
         |--BB
         |Content-Type: application/pdf; name="report.pdf"
         |Content-Disposition: attachment; filename="report.pdf"
         |Content-Transfer-Encoding: base64
         |
         |$pdfB64
         |--BB$inner
         |--BB--
         |""".stripMargin.replace("\n", "\r\n")
    val got = RichExtractors.extractEml(
      mail("Outer", "").getBytes(StandardCharsets.UTF_8))
    assert(got.contains("covering note"))
    assert(got.contains("[Attachment: report.pdf]"))
    assert(got.contains("attached pdf payload")) // the PDF reader ran

    // nested .eml attachment: depth 1 extracts, the cap stops runaway
    // nesting (a depth-2 eml-in-eml-in-eml drops silently, body survives)
    val innerEml = java.util.Base64.getMimeEncoder.encodeToString(
      mail("Inner", "").getBytes(StandardCharsets.UTF_8))
    val nestedPart =
      s"""
         |Content-Type: message/rfc822; name="fwd.eml"
         |Content-Transfer-Encoding: base64
         |
         |$innerEml""".stripMargin.replace("\n", "\r\n")
    val outer = RichExtractors.extractEml(
      mail("Outer", nestedPart).getBytes(StandardCharsets.UTF_8))
    assert(outer.contains("[Attachment: fwd.eml]"))
    assert(outer.contains("Subject: Inner"))
    // inner's own pdf attachment still extracted at depth 1
    assert(outer.contains("attached pdf payload"))
  }

  test("eml: unsupported binary attachment skipped; dotless name falls through") {
    val fakePng = java.util.Base64.getMimeEncoder.encodeToString(
      Array.tabulate[Byte](256)(i => i.toByte)) // binary, not valid UTF-8
    val eml =
      s"""Subject: Mixed
         |MIME-Version: 1.0
         |Content-Type: multipart/mixed; boundary="BB"
         |
         |--BB
         |Content-Type: text/plain; name="README"
         |
         |readme body text
         |--BB
         |Content-Type: image/png; name="photo.png"
         |Content-Transfer-Encoding: base64
         |
         |$fakePng
         |--BB--
         |""".stripMargin.replace("\n", "\r\n")
    val got = RichExtractors.extractEml(eml.getBytes(StandardCharsets.UTF_8))
    // the dotless-named text part extracts as body (content-type fallback);
    // the png must NOT appear as latin-1 mojibake
    assert(got.contains("readme body text"))
    assert(!got.contains("photo.png") && !got.contains("ÿ"))
  }

  test("eml: quoted-printable pdf attachment survives byte-exact") {
    val pdf = PdfFixtures.mkPdf(
      Seq("BT /F1 12 Tf 72 720 Td (qp attachment payload) Tj ET"), flate = false)
    // QP-encode every byte that needs it (incl. '=' and 8-bit)
    val qp = pdf.map { b =>
      val c = b & 0xFF
      if (c == '='.toInt || c < 0x20 || c > 0x7E) f"=$c%02X" else c.toChar.toString
    }.mkString
    val eml =
      s"""Subject: QP
         |MIME-Version: 1.0
         |Content-Type: multipart/mixed; boundary="BB"
         |
         |--BB
         |Content-Type: application/pdf; name="qp.pdf"
         |Content-Transfer-Encoding: quoted-printable
         |
         |$qp
         |--BB--
         |""".stripMargin.replace("\n", "\r\n")
    val got = RichExtractors.extractEml(eml.getBytes(StandardCharsets.UTF_8))
    assert(got != null && got.contains("qp attachment payload"))
  }

  test("eml: single-part message body") {
    val eml = "Subject: Hi\nContent-Type: text/plain\n\njust a body\n"
    val got = RichExtractors.extractEml(eml.getBytes(StandardCharsets.UTF_8))
    assert(got == "Subject: Hi\njust a body\n")
  }

  test("docx: w:t runs with paragraph breaks, headers after body") {
    val doc = zip(
      "word/document.xml" ->
        """<?xml version="1.0"?><w:document><w:body>
          |<w:p><w:r><w:t>First paragraph</w:t></w:r></w:p>
          |<w:p><w:r><w:t xml:space="preserve">Second </w:t></w:r>
          |<w:r><w:t>run &amp; entity</w:t></w:r></w:p>
          |</w:body></w:document>""".stripMargin,
      "word/header1.xml" -> "<w:hdr><w:p><w:r><w:t>HeaderText</w:t></w:r></w:p></w:hdr>")
    val got = RichExtractors.extractDocx(doc)
    assert(got.contains("First paragraph\n"))
    assert(got.contains("Second run & entity"))
    assert(got.indexOf("First paragraph") < got.indexOf("HeaderText"))
  }

  test("xlsx: shared strings + inline + numeric cells, rows space-joined") {
    val wb = zip(
      "xl/sharedStrings.xml" ->
        """<sst><si><t>alpha</t></si><si><r><t>be</t></r><r><t>ta</t></r></si></sst>""",
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2"><v>42</v></c><c r="B2" t="inlineStr"><is><t>inline</t></is></c></row>
          |<row r="3"></row>
          |</sheetData></worksheet>""".stripMargin)
    val got = RichExtractors.extractXlsx(wb)
    assert(got == "alpha beta\n42 inline")
  }

  test("rtf: control words stripped, escapes and breaks honored") {
    val rtf = """{\rtf1\ansi{\fonttbl{\f0 Calibri;}}{\colortbl;\red0;}
      |\f0\fs22 Hello\par World \'e9 caf\'e9\tab end\par
      |{\*\generator Riched20}}""".stripMargin.replace("\n", "")
    val got = RichExtractors.extractRtf(rtf.getBytes(StandardCharsets.UTF_8))
    assert(got.contains("Hello\nWorld"))
    assert(got.contains("é café"))
    assert(got.contains("\tend"))
    assert(!got.contains("Calibri") && !got.contains("Riched20"))
  }

  test("rtf: unicode escapes with substitution char") {
    val rtf = "{\\rtf1 a\\u233?b \\u-3825?x}"
    val got = RichExtractors.extractRtf(rtf.getBytes(StandardCharsets.UTF_8))
    assert(got.startsWith("aéb"))
  }

  test("corrupt pdf/msg/xls return null (skip-and-count)") {
    assert(RichExtractors.extractPdf("%PDF-1.7 garbage no objects".getBytes) == null)
    assert(RichExtractors.extractPdf(Array[Byte](0x25, 0x50, 0x44)) == null)
    assert(RichExtractors.extractMsg(Array[Byte](1, 2, 3)) == null)
    assert(RichExtractors.extractXls(Array.fill[Byte](600)(0x11)) == null)
  }

  // ---------- OLE2: MSG + legacy XLS ----------

  test("msg: subject + body from MAPI property streams (unicode and ansi)") {
    val uni = RichExtractors.extractMsg(
      CfbFixtures.mkMsg("Quarterly metrics", "All pipelines green.\nShip it."))
    assert(uni == "Subject: Quarterly metrics\nAll pipelines green.\nShip it.")
    val ansi = RichExtractors.extractMsg(
      CfbFixtures.mkMsg("Café müde", "Größe naïve", unicode = false))
    assert(ansi == "Subject: Café müde\nGröße naïve")
  }

  test("xls: BIFF8 sheets in order, SST/NUMBER/RK cells, rows space-joined") {
    val xls = CfbFixtures.mkXls(Seq(
      "First" -> Seq((0, 0, "name"), (0, 1, "score"), (1, 0, "alice"),
        (1, 1, 91.5), (2, 0, "bob"), (2, 1, 7)),
      "Second" -> Seq((0, 0, "only sheet two"))))
    val got = RichExtractors.extractXls(xls)
    assert(got == "name score\nalice 91.5\nbob 7.0\nonly sheet two")
  }

  test("xls: empty workbook and unknown records degrade to null") {
    assert(RichExtractors.extractXls(CfbFixtures.mkXls(Seq("S" -> Nil))) == null)
  }

  test("xls: SST split across a CONTINUE record with encoding switch") {
    import CfbFixtures.{le16, le32, rec}
    // "hello world" (cch 11) splits after "hello": the CONTINUE restates
    // the flags byte and switches the remaining " world" to UTF-16LE;
    // "second" then follows entirely inside the continuation
    val bof = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12))
    val eof = rec(0x000A, Array.empty)
    val sstData = le32(2) ++ le32(2) ++
      le16(11) ++ Array(0.toByte) ++
      "hello".getBytes(StandardCharsets.ISO_8859_1)
    val contData = Array(1.toByte) ++
      " world".getBytes(StandardCharsets.UTF_16LE) ++
      le16(6) ++ Array(0.toByte) ++
      "second".getBytes(StandardCharsets.ISO_8859_1)
    val sheet = {
      val b = new ByteArrayOutputStream()
      b.write(rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ new Array[Byte](12)))
      b.write(rec(0x00FD, le16(0) ++ le16(0) ++ le16(0) ++ le32(0)))
      b.write(rec(0x00FD, le16(1) ++ le16(0) ++ le16(0) ++ le32(1)))
      b.write(eof)
      b.toByteArray
    }
    val globals = {
      val b = new ByteArrayOutputStream()
      b.write(bof)
      // boundsheet offset = globals length; compute with a fixed-size probe
      val bsLen = 4 + 4 + 2 + 2 + 1 // rec header + offset + grbit + namelen/opts + "S"
      val off = bof.length + bsLen + rec(0x00FC, sstData).length +
        rec(0x003C, contData).length + eof.length
      b.write(rec(0x0085, le32(off) ++ le16(0) ++
        Array(1.toByte, 0.toByte) ++ "S".getBytes(StandardCharsets.ISO_8859_1)))
      b.write(rec(0x00FC, sstData))
      b.write(rec(0x003C, contData))
      b.write(eof)
      b.toByteArray
    }
    val got = RichExtractors.extractXls(
      CfbFixtures.mkCfb(Seq("Workbook" -> (globals ++ sheet))))
    assert(got == "hello world\nsecond")
  }

  // ---------- PDF (pure-JVM reader) ----------

  private def mkPdf(pageContents: Seq[String], flate: Boolean): Array[Byte] =
    PdfFixtures.mkPdf(pageContents, flate)

  test("pdf: two pages extract with [[pageN]] markers in tree order") {
    val pdf = mkPdf(Seq(
      "BT /F1 12 Tf 72 720 Td (Hello spark pdf page one) Tj ET",
      "BT /F1 12 Tf 72 720 Td (and page two follows) Tj ET"), flate = false)
    val got = RichExtractors.extractPdf(pdf)
    assert(got != null)
    assert(got.contains("[[page1]]") && got.contains("Hello spark pdf page one"))
    assert(got.contains("[[page2]]") && got.contains("and page two follows"))
    assert(got.indexOf("[[page1]]") < got.indexOf("[[page2]]"))
  }

  test("pdf: FlateDecode, TJ kerning gaps, hex strings, escapes, newlines") {
    val content =
      """BT /F1 10 Tf 50 700 Td [(kern) -500 (gap)] TJ T* <48454C4C4F> Tj (par\(en\)) Tj ET"""
    val got = RichExtractors.extractPdf(mkPdf(Seq(content), flate = true))
    assert(got != null && got.startsWith("[[page1]]"))
    assert(got.contains("kern gap")) // large negative kern → word gap
    assert(got.contains("HELLO")) // hex string decode
    assert(got.contains("par(en)")) // escaped parens
    assert(got.contains("gap\nHELLO")) // T* newline
  }

  test("pdf: blank page keeps real page numbering (pymupdf contract)") {
    val pdf = mkPdf(Seq(
      "BT (first) Tj ET",
      "BT ET", // blank: stripped text empty → skipped
      "BT (third) Tj ET"), flate = false)
    val got = RichExtractors.extractPdf(pdf)
    assert(got.contains("[[page1]]first"))
    assert(!got.contains("[[page2]]"))
    assert(got.contains("[[page3]]third"))
  }

  test("pdf: tokens cannot fuse across content-stream seams") {
    // first stream ends exactly at "Tj" with no trailing whitespace; naive
    // concatenation would read "TjBT" and drop alpha
    val c1 = "BT (alpha) Tj"
    val c2 = "BT (beta) Tj ET"
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} >> stream\n$c1\nendstream endobj\n")
    w(s"5 0 obj << /Length ${c2.length} >> stream\n$c2\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    val got = RichExtractors.extractPdf(out.toByteArray)
    assert(got != null && got.contains("alpha") && got.contains("beta"))
  }

  test("pdf: objects inside a compressed ObjStm (PDF 1.5 layout) + UTF-16 string") {
    // catalog/pages/page dicts live INSIDE a FlateDecode object stream;
    // only the ObjStm and the content stream are top-level objects
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val m = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, m)
    }
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"
    val objs = Seq(1 -> o1, 2 -> o2, 3 -> o3)
    val bodies = objs.map(_._2)
    val offs = bodies.scanLeft(0)(_ + _.length + 1).init
    val header = objs.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString(" ")
    val stmText = header + "\n" + bodies.mkString("\n") + "\n"
    val stmData = deflate(stmText.getBytes(StandardCharsets.ISO_8859_1))
    // content: UTF-16BE BOM'd hex string + plain text
    val content = "BT (plain ascii) Tj <FEFF00480069> Tj ET"
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"4 0 obj << /Type /ObjStm /N 3 /First ${header.length + 1} /Length ${stmData.length} /Filter /FlateDecode >> stream\n")
    out.write(stmData)
    w("\nendstream endobj\n")
    w(s"5 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    val got = RichExtractors.extractPdf(out.toByteArray)
    assert(got != null && got.startsWith("[[page1]]"))
    assert(got.contains("plain ascii"))
    assert(got.contains("Hi")) // UTF-16BE hex string decoded via BOM
  }

  test("pdf: indirect /Length reference and content-stream array") {
    // hand-built: /Length as an indirect object; /Contents as array
    val c1 = "BT (alpha) Tj ET"
    val c2 = "BT (beta) Tj ET"
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 6 0 R] >> endobj\n")
    w(s"4 0 obj << /Length 5 0 R >> stream\n$c1\nendstream endobj\n")
    w(s"5 0 obj ${c1.length} endobj\n")
    w(s"6 0 obj << /Length ${c2.length} >> stream\n$c2\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    val got = RichExtractors.extractPdf(out.toByteArray)
    assert(got != null && got.contains("alpha") && got.contains("beta"))
  }

  test("non-zip bytes to ooxml extractors degrade to null, not throw") {
    assert(RichExtractors.extractDocx("plain text".getBytes) == null)
    assert(RichExtractors.extractXlsx(Array[Byte](0x50, 0x4B, 0x00)) == null)
  }

  test("pdf: Identity-H font decodes through its ToUnicode CMap") {
    // bfchar pairs, a consecutive bfrange, and the explicit-array bfrange
    // form; code 0021 has no mapping and must decode to nothing
    val cm = PdfFixtures.cmap(
      """2 beginbfchar
<0001> <00480065>
<0005> <006F>
endbfchar
1 beginbfrange
<0002> <0004> <006C>
endbfrange
1 beginbfrange
<0006> <0007> [<0057> <0058>]
endbfrange""")
    val content = "BT /F9 12 Tf <000100020002000500210006> Tj ET"
    val got = RichExtractors.extractPdf(PdfFixtures.mkCidPdf(content, cm))
    assert(got != null, "CID page with ToUnicode must extract")
    assert(got.contains("HelloW"), s"CMap decode wrong: $got")
  }

  test("pdf: Type0 font without ToUnicode emits nothing (not garbage)") {
    val content = "BT /F9 12 Tf <00010002> Tj ET"
    val got = RichExtractors.extractPdf(
      PdfFixtures.mkCidPdf(content, "", withToUnicode = false))
    assert(got == null, s"glyph-id bytes must not leak as text: $got")
  }

  test("html entities: one-pass decode matches html.unescape reference") {
    // expected strings generated with CPython html.unescape (the behavior
    // BeautifulSoup's parser applies); nbsp intentionally maps to a plain
    // space (engine contract), so it is absent from this parity list
    val cases = Seq(
      "&amp;#65;" -> "&#65;", // double-escape: decoded text is NOT rescanned
      "&#151;" -> "—", // C1 remap (dec)
      "&#x97;" -> "—", // C1 remap (hex)
      "&mdash; &ndash;" -> "— –",
      "&eacute;&Ouml;" -> "éÖ",
      "&#0;" -> "�",
      "&#xD800;" -> "�", // surrogate
      "&#1114112;" -> "�", // > U+10FFFF
      "&unknown;" -> "&unknown;",
      "&euro;&trade;" -> "€™",
      "&copy;2024" -> "©2024",
      "&frac12;" -> "½")
    for ((in, want) <- cases)
      assert(RichExtractors.decodeEntities(in) == want, s"input: $in")
  }

  test("pdf: unusable ToUnicode (undecodable filter) = absent, not garbage") {
    // the CMap stream exists but decodeStream can't read it (DCT): the CID
    // font must get the empty decoder, same as no ToUnicode at all
    val cm = PdfFixtures.cmap("1 beginbfchar\n<0001> <0041>\nendbfchar")
    val got = RichExtractors.extractPdf(PdfFixtures.mkCidPdf(
      "BT /F9 12 Tf <00010002> Tj ET", cm, cmapFilter = "DCTDecode"))
    assert(got == null, s"glyph-id bytes must not leak via the fallback: $got")
  }

  test("pdf: /Resources inherited from the /Pages tree node") {
    val cm = PdfFixtures.cmap("1 beginbfchar\n<0001> <0048>\nendbfchar")
    val got = RichExtractors.extractPdf(PdfFixtures.mkCidPdf(
      "BT /F9 12 Tf <0001> Tj ET", cm, resourcesOnPages = true))
    assert(got != null && got.contains("H"),
      s"tree-level font resources must reach the page: $got")
  }

  test("pdf: bfrange advance crosses code points, not surrogate units") {
    // base U+10400 (non-BMP, surrogate pair D801 DC00): code 0012 = base+2
    // must be U+10402, not a corrupt pair with DC02 alone incremented —
    // and a base ending 0xDBFF-adjacent must never emit unpaired halves
    val cm = PdfFixtures.cmap(
      """1 beginbfrange
<0010> <0014> <D801DC00>
endbfrange""")
    val got = RichExtractors.extractPdf(PdfFixtures.mkCidPdf(
      "BT /F9 12 Tf <0012> Tj ET", cm))
    assert(got != null)
    assert(got.codePoints().toArray.contains(0x10402),
      s"expected U+10402 from code-point advance: ${got.codePoints().toArray.mkString(",")}")
  }

  test("pdf: font switch mid-page — CID and simple strings coexist") {
    val cm = PdfFixtures.cmap(
      """1 beginbfchar
<0003> <0041>
endbfchar""")
    val content = "BT /F9 1 Tf <0003> Tj ET BT /F1 1 Tf (plain) Tj ET"
    val got = RichExtractors.extractPdf(PdfFixtures.mkCidPdf(content, cm))
    assert(got != null && got.contains("A") && got.contains("plain"))
  }

  test("pdf: reference cycle resolves to null, not a stack overflow") {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj 3 0 R endobj\n") // cycle: 2 -> 3 -> 2
    w("3 0 obj 2 0 R endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    assert(RichExtractors.extractPdf(out.toByteArray) == null)
  }

  // ---- stream filters beyond Flate/AHx ----

  private def onePagePdf(streamDict: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${data.length} $streamDict >> stream\n")
    out.write(data)
    w("\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF")
    out.toByteArray
  }

  private def a85(bytes: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      val n = math.min(4, bytes.length - i)
      var tuple = 0L
      for (k <- 0 until 4)
        tuple = (tuple << 8) | (if (i + k < bytes.length) bytes(i + k) & 0xFF else 0)
      val cs = new Array[Char](5)
      var t = tuple
      for (k <- 4 to 0 by -1) { cs(k) = ('!' + (t % 85)).toChar; t /= 85 }
      sb.appendAll(cs, 0, n + 1)
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def rle(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < bytes.length) {
      val n = math.min(128, bytes.length - i)
      out.write(n - 1)
      out.write(bytes, i, n)
      i += n
    }
    out.write(128) // EOD
    out.toByteArray
  }

  private def lzwEnc(data: Array[Byte]): Array[Byte] = {
    // uncompressed LZW: clear, each byte as a literal code, EOD — mirrors the
    // decoder's width progression (stays at 9 bits for short payloads)
    val out = new ByteArrayOutputStream()
    var buf = 0L; var nbits = 0; var width = 9; var dictSize = 258
    def emit(code: Int): Unit = {
      buf = (buf << width) | code; nbits += width
      while (nbits >= 8) { out.write(((buf >> (nbits - 8)) & 0xFF).toInt); nbits -= 8 }
    }
    emit(256)
    var first = true
    for (b <- data) {
      emit(b & 0xFF)
      if (!first) { dictSize += 1; if (dictSize + 1 >= (1 << width) && width < 12) width += 1 }
      first = false
    }
    emit(257)
    if (nbits > 0) out.write(((buf << (8 - nbits)) & 0xFF).toInt)
    out.toByteArray
  }

  test("pdf: ASCII85 / RunLength / LZW filters decode") {
    val content = "BT /F1 10 Tf (filter test payload) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    for ((name, enc) <- Seq(
        ("ASCII85Decode", a85(content)),
        ("RunLengthDecode", rle(content)),
        ("LZWDecode", lzwEnc(content)))) {
      val got = RichExtractors.extractPdf(onePagePdf(s"/Filter /$name", enc))
      assert(got != null && got.contains("filter test payload"), name)
    }
    // chained: ASCII85 over RunLength (outermost filter listed first)
    val chained = onePagePdf("/Filter [/ASCII85Decode /RunLengthDecode]",
      a85(rle(content)))
    assert(RichExtractors.extractPdf(chained).contains("filter test payload"))
  }

  test("pdf: FlateDecode with PNG Up predictor (DecodeParms) round-trips") {
    val content = "BT /F1 10 Tf (predicted payload rows here) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    val columns = 10
    // pad to whole rows, apply PNG filter type 2 (Up) per row
    val rows = (content.length + columns - 1) / columns
    val padded = java.util.Arrays.copyOf(content, rows * columns)
    val pred = new ByteArrayOutputStream()
    for (r <- 0 until rows) {
      pred.write(2) // Up
      for (i <- 0 until columns) {
        val cur = padded(r * columns + i) & 0xFF
        val up = if (r > 0) padded((r - 1) * columns + i) & 0xFF else 0
        pred.write((cur - up) & 0xFF)
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(pred.toByteArray); d.finish()
    val buf = new Array[Byte](pred.size() * 2 + 64)
    val m = d.deflate(buf); d.end()
    val data = java.util.Arrays.copyOf(buf, m)
    val pdf = onePagePdf(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $columns >>",
      data)
    val got = RichExtractors.extractPdf(pdf)
    assert(got != null && got.contains("predicted payload rows here"))
  }

  // ---- encrypted PDFs: standard security handler, empty user password ----

  private val encPages = Seq(
    "BT /F1 12 Tf 72 720 Td (Restricted but readable one) Tj ET",
    "BT /F1 12 Tf 72 720 Td (and encrypted page two) Tj ET")

  for (mode <- Seq("rc4-40", "rc4-128", "aes-128", "aes-256"))
    test(s"pdf: $mode encrypted extracts same text as plaintext twin") {
      val plain = RichExtractors.extractPdf(PdfFixtures.mkPdf(encPages, flate = false))
      val got = RichExtractors.extractPdf(PdfFixtures.mkEncryptedPdf(encPages, mode))
      assert(got == plain, s"mode=$mode")
    }

  test("pdf: encrypted + FlateDecode — decryption precedes filter decode") {
    val plain = RichExtractors.extractPdf(PdfFixtures.mkPdf(encPages, flate = true))
    val got = RichExtractors.extractPdf(
      PdfFixtures.mkEncryptedPdf(encPages, "rc4-128", flate = true))
    assert(got == plain)
  }

  test("pdf: non-empty user password (U mismatch) skips, never garbage") {
    for (mode <- Seq("rc4-128", "aes-256"))
      assert(RichExtractors.extractPdf(
        PdfFixtures.mkEncryptedPdf(encPages, mode, breakU = true)) == null, mode)
  }
}
