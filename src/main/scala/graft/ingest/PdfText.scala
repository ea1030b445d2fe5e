package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable
import scala.util.matching.Regex

/**
 * Minimal pure-JVM PDF text extraction (S2), re-expressing the reference's
 * pymupdf loader (`/root/reference/document_processor.py:74-84`): per page,
 * extract the text content; skip pages that are blank after strip; emit
 * `[[pageN]]` + text for each kept page (1-based, page order from the
 * document's page tree) and return the concatenation — exactly the marker
 * format [[graft.expr.Chunker]] already parses for page provenance.
 *
 * Scope (the "common case" a text pipeline meets): objects and object
 * streams (ObjStm), Flate/LZW/ASCIIHex/ASCII85/RunLength stream filters
 * with PNG/TIFF predictors (`/DecodeParms /Predictor 12` is near-universal
 * on real ObjStm/XRef streams), text
 * operators `BT/ET Tj ' " TJ Td TD T* Tm Tf`, literal/hex strings with
 * escapes and UTF-16BE, and CID/Identity-H multi-byte fonts via their
 * /ToUnicode CMap (`bfchar`/`bfrange`, round 3): the `Tf` operator selects
 * the page-resource font, and its CMap decodes the 1/2-byte codes to
 * Unicode. A Type0 font WITHOUT a ToUnicode map emits nothing (codes are
 * glyph ids, not characters — silence beats garbage). Encrypted documents
 * decrypt via [[PdfCrypt]] (standard security handler R2-R6, RC4 and
 * AES-128/256, EMPTY user password — the owner-restricted-but-readable
 * case pymupdf also opens transparently). Out of scope (page or document
 * is skipped, never crashes): password-protected documents (non-empty
 * user password), non-standard security handlers, and exotic stream
 * filters — the skip-and-count contract (§4.1.3) turns those into counted
 * skips upstream. No external PDF library ships in the build environment,
 * hence this hand-rolled reader; the object model is the PDF 1.7 spec's.
 */
object PdfText {

  // ---------- object model ----------
  private sealed trait Obj
  private case object PNull extends Obj
  private final case class PBool(v: Boolean) extends Obj
  private final case class PNum(v: Double) extends Obj
  private final case class PStr(bytes: Array[Byte]) extends Obj
  private final case class PName(s: String) extends Obj
  private final case class PArr(items: Vector[Obj]) extends Obj
  private final case class PDict(m: Map[String, Obj]) extends Obj
  private final case class PRef(num: Int, gen: Int) extends Obj
  private final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  private val objRe: Regex = """(?s)(\d+)\s+(\d+)\s+obj\b""".r

  /** Allocation-free substring search over the raw bytes (the latin-1
    * byte↔char view makes char comparison exact). A `new String(slice)`
    * per call was O(remaining-file) garbage on every broken-Length stream
    * parse — ruinous when the encrypted-trailer fallback peeks many
    * object dicts. */
  private def indexOfBytes(b: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.length
    var i = math.max(0, from)
    val last = b.length - n
    while (i <= last) {
      var j = 0
      while (j < n && b(i + j) == needle.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Extract `[[pageN]]`-marked text, or null when the file yields none. */
  def extract(bytes: Array[Byte]): String = {
    try {
      val doc = new Doc(bytes)
      val pages = doc.pages()
      val sb = new StringBuilder
      pages.zipWithIndex.foreach { case (page, i) =>
        val text = doc.pageText(page)
        if (text != null && text.strip().nonEmpty)
          sb.append("[[page").append(i + 1).append("]]").append(text)
      }
      if (sb.isEmpty) null else sb.toString
    } catch {
      // undecodable → skip-and-count. Exception only (plus the stack
      // overflow a hostile reference graph could still provoke in regex
      // internals) — NOT Throwable, which would swallow executor OOMs.
      case _: Exception => null
      case _: StackOverflowError => null
    }
  }

  private final class Doc(bytes: Array[Byte]) {
    // byte↔char 1:1 view for offset scanning
    private val latin1 = new String(bytes, StandardCharsets.ISO_8859_1)
    // indirect object number → (start offset after "N G obj", generation)
    private val offsets: Map[Int, (Int, Int)] =
      objRe.findAllMatchIn(latin1).map(m =>
        m.group(1).toInt -> (m.end, m.group(2).toInt)).toMap
    private val cache = mutable.Map.empty[Int, Obj]
    private var objStmExpanded = false
    // standard-security-handler decryption (empty user password); set up
    // AFTER `offsets` so the trailer walk can fetch the /Encrypt object
    // (which itself must never be decrypted — hence the excluded obj num)
    private var encryptNum = -1
    private val decryptor: PdfCrypt.Decryptor = initDecryptor()

    def obj(num: Int): Obj = cache.getOrElseUpdate(num,
      offsets.get(num).map { case (off, gen) =>
        val parsed = new Lexer(bytes, off, this).parseValue(resolveLen = true)
        if (decryptor == null || num == encryptNum) parsed
        else decryptObj(parsed, num, gen)
      }.getOrElse(PNull))

    /** Strings and stream bodies of an indirect object are encrypted with
      * the object's key; XRef streams never are (they must be readable
      * before any key exists), and ObjStm MEMBERS are covered by their
      * container stream's encryption (they are not re-encrypted — members
      * parsed in [[expandObjStms]] bypass this on purpose). */
    private def decryptObj(o: Obj, num: Int, gen: Int): Obj = o match {
      case PStr(b) => PStr(decryptor.decrypt(num, gen, b))
      case PArr(items) => PArr(items.map(decryptObj(_, num, gen)))
      case PDict(m) => PDict(m.map { case (k, v) => k -> decryptObj(v, num, gen) })
      case PStream(d, raw) if !d.m.get("Type").contains(PName("XRef")) =>
        PStream(decryptObj(d, num, gen).asInstanceOf[PDict],
          decryptor.decrypt(num, gen, raw))
      case other => other
    }

    /** Find /Encrypt + /ID in a `trailer` dict or an XRef-stream dict and
      * build the empty-user-password decryptor. An encrypted document whose
      * handler is unsupported (or whose user password is non-empty) throws —
      * extract() turns that into the skip-and-count null, same contract as
      * an undecodable stream. */
    private def initDecryptor(): PdfCrypt.Decryptor = {
      if (!latin1.contains("/Encrypt")) return null // the common fast path
      val trailers = "(?s)trailer\\b".r.findAllMatchIn(latin1).map(_.end).toSeq
        .map(off => dictOf(new Lexer(bytes, off, this).parseValue(resolveLen = false)))
      // fall back to XRef-stream dicts (PDF 1.5 layouts have no `trailer`
      // keyword). Only the objects ENCLOSING a literal "/Encrypt" token are
      // candidates — peeking every object dict would be O(objects) parses
      // (and each broken-Length stream scan O(file)) on every encrypted
      // modern-layout document. resolveLen=false: no stream-body capture,
      // no obj() recursion while the decryptor is still null.
      val objStarts = offsets.toSeq.map { case (n, (off, _)) => (off, n) }.sorted
      def enclosingObj(p: Int): Option[Int] = {
        var lo = 0; var hi = objStarts.length - 1; var res = -1
        while (lo <= hi) {
          val m = (lo + hi) >>> 1
          if (objStarts(m)._1 <= p) { res = m; lo = m + 1 } else hi = m - 1
        }
        if (res < 0) None else Some(objStarts(res)._2)
      }
      val encPos = Iterator.iterate(latin1.indexOf("/Encrypt"))(
        p => latin1.indexOf("/Encrypt", p + 1)).takeWhile(_ >= 0)
      val xrefDicts = encPos.flatMap(enclosingObj).distinct.map { n =>
        dictOf(new Lexer(bytes, offsets(n)._1, this).parseValue(resolveLen = false))
      }
      val withEnc = (trailers.iterator ++ xrefDicts)
        .find(_.contains("Encrypt")).getOrElse(return null)
      withEnc("Encrypt") match {
        case PRef(n, _) => encryptNum = n
        case _ =>
      }
      val enc = dictOf(withEnc("Encrypt"))
      if (enc.isEmpty) return null
      def name(k: String): String = resolve(enc.getOrElse(k, PNull)) match {
        case PName(n) => n
        case _ => ""
      }
      def int(k: String, dflt: Long = 0L): Long = resolve(enc.getOrElse(k, PNull)) match {
        case PNum(v) => v.toLong
        case _ => dflt
      }
      def strBytes(m: Map[String, Obj], k: String): Array[Byte] =
        resolve(m.getOrElse(k, PNull)) match {
          case PStr(b) => b
          case _ => Array.empty[Byte]
        }
      val id0 = resolve(withEnc.getOrElse("ID", PNull)) match {
        case PArr(items) => items.headOption.map(resolve).collect {
          case PStr(b) => b
        }.getOrElse(Array.empty[Byte])
        case _ => Array.empty[Byte]
      }
      val v = int("V", 0L).toInt
      // /StmF names the stream crypt filter in /CF; its /CFM picks the
      // cipher for V≥4 (strings use /StrF — same /StdCF in practice; a
      // document splitting them is out of scope and fails validation)
      val cfm = if (v < 4) "" else {
        val cfName = name("StmF") match { case "" => "StdCF"; case n => n }
        val cf = dictOf(enc.getOrElse("CF", PNull))
        dictOf(cf.getOrElse(cfName, PNull)).get("CFM") match {
          case Some(PName(n)) => n
          case _ => "Identity"
        }
      }
      val encMeta = resolve(enc.getOrElse("EncryptMetadata", PBool(true))) match {
        case PBool(b) => b
        case _ => true
      }
      if (v >= 4 && cfm == "Identity") return null // no-op crypt filter
      PdfCrypt.forDocument(name("Filter"), v, int("R").toInt,
          int("Length", 40L).toInt, strBytes(enc, "O"), strBytes(enc, "U"),
          strBytes(enc, "OE"), strBytes(enc, "UE"), int("P"), id0, encMeta, cfm)
        .getOrElse(throw new IllegalStateException("unsupported encryption"))
    }

    def resolve(o: Obj): Obj = resolve(o, 0)

    /** Depth-guarded: a corrupt/hostile file with a reference cycle
      * (`1 0 obj 2 0 R` / `2 0 obj 1 0 R`) must yield PNull, not an
      * unbounded recursion. 64 matches the pages() walk cap. */
    private def resolve(o: Obj, depth: Int): Obj = o match {
      case PRef(n, _) =>
        if (depth >= 64) PNull else resolve(obj(n), depth + 1)
      case other => other
    }

    /** Objects hidden in /Type /ObjStm streams (PDF 1.5 compressed xref
      * layout): inflate each, parse the `N` pairs header, parse members. */
    private def expandObjStms(): Unit = {
      if (objStmExpanded) return
      objStmExpanded = true
      offsets.keys.foreach { n =>
        obj(n) match {
          case s @ PStream(PDict(m), _)
              if m.get("Type").contains(PName("ObjStm")) =>
            val data = decodeStream(s)
            if (data != null) {
              val count = num(m.get("N")).toInt
              val first = num(m.get("First")).toInt
              val head = new Lexer(data, 0, this)
              val pairs = (0 until count).map { _ =>
                (head.parseValue(false), head.parseValue(false)) match {
                  case (PNum(on), PNum(off)) => (on.toInt, off.toInt)
                  case _ => (-1, -1)
                }
              }
              pairs.foreach { case (objNum, off) =>
                if (objNum >= 0 && !cache.contains(objNum) && !offsets.contains(objNum))
                  cache(objNum) =
                    new Lexer(data, first + off, this).parseValue(false)
              }
            }
          case _ =>
        }
      }
    }

    private def num(o: Option[Obj]): Double = o.map(resolve) match {
      case Some(PNum(v)) => v
      case _ => 0.0
    }

    private def dictOf(o: Obj): Map[String, Obj] = resolve(o) match {
      case PDict(m) => m
      case PStream(PDict(m), _) => m
      case _ => Map.empty
    }

    /** Page dictionaries in tree order (catalog → /Pages → /Kids walk);
      * falls back to document-order /Type /Page objects. */
    def pages(): Seq[Map[String, Obj]] = {
      expandObjStms()
      val all = (offsets.keys ++ cache.keys).toSeq.distinct.sorted
      val catalog = all.iterator.map(obj).map(dictOf)
        .find(_.get("Type").contains(PName("Catalog")))
      val out = mutable.ArrayBuffer.empty[Map[String, Obj]]
      // /Resources is inheritable (PDF 1.7 §7.7.3.4): a page without its
      // own takes the nearest ancestor /Pages node's — without this, a
      // Type0 font defined tree-level goes undetected and its glyph-id
      // bytes would decode as garbage through the simple-font fallback.
      def walk(node: Obj, depth: Int, inhRes: Option[Obj]): Unit = {
        if (depth > 64) return
        val d = dictOf(node)
        d.get("Type") match {
          case Some(PName("Pages")) =>
            val res = d.get("Resources").orElse(inhRes)
            resolve(d.getOrElse("Kids", PNull)) match {
              case PArr(kids) => kids.foreach(walk(_, depth + 1, res))
              case _ =>
            }
          case Some(PName("Page")) =>
            out += (if (d.contains("Resources")) d
              else inhRes.fold(d)(r => d + ("Resources" -> r)))
          case _ =>
        }
      }
      catalog.flatMap(_.get("Pages")).foreach(walk(_, 0, None))
      if (out.nonEmpty) out.toSeq
      else all.map(obj).map(dictOf)
        .filter(_.get("Type").contains(PName("Page")))
    }

    /** Concatenated decoded content-stream bytes of a page. */
    private def contents(page: Map[String, Obj]): Array[Byte] =
      resolve(page.getOrElse("Contents", PNull)) match {
        case s: PStream => decodeStream(s)
        case PArr(items) =>
          val parts = items.map(resolve).collect { case s: PStream => decodeStream(s) }
            .filter(_ != null)
          if (parts.isEmpty) null
          // PDF splits content at token boundaries but need not leave
          // trailing whitespace: join with a newline so tokens at stream
          // seams can't fuse ("...Tj" + "BT..." → "TjBT")
          else parts.reduce((a, b) => a ++ Array('\n'.toByte) ++ b)
        case _ => null
      }

    def pageText(page: Map[String, Obj]): String = {
      val data = contents(page)
      if (data == null) null else ContentText.run(data, fontDecoders(page))
    }

    /** Per-font string decoders from the page's /Resources /Font dict:
      * fonts with a /ToUnicode CMap decode through it (the CID/Identity-H
      * path); Type0 fonts without one decode to nothing (their codes are
      * glyph ids); simple fonts absent from this map fall back to the
      * Latin-1/UTF-16BE default. */
    private def fontDecoders(page: Map[String, Obj]): Map[String, Array[Byte] => String] = {
      val res = dictOf(page.getOrElse("Resources", PNull))
      val fonts = dictOf(res.getOrElse("Font", PNull))
      fonts.flatMap { case (name, fobj) =>
        val fd = dictOf(fobj)
        val parsed = resolve(fd.getOrElse("ToUnicode", PNull)) match {
          case s: PStream =>
            val data = decodeStream(s)
            if (data == null) None // unsupported filter (LZW/crypt)
            else CMap.parse(new String(data, StandardCharsets.ISO_8859_1))
          case _ => None
        }
        // UNUSABLE ToUnicode (undecodable stream, or no mappings) on a CID
        // font gets the same empty decoder as an ABSENT one: its codes are
        // glyph ids, and the Latin-1/UTF-16BE fallback would leak garbage.
        val cid = resolve(fd.getOrElse("Subtype", PNull)) == PName("Type0") ||
          resolve(fd.getOrElse("Encoding", PNull)) == PName("Identity-H")
        parsed.map(name -> _)
          .orElse(if (cid) Some(name -> ((_: Array[Byte]) => "")) else None)
      }
    }

    def decodeStream(s: PStream): Array[Byte] = {
      val filters = resolve(s.dict.m.getOrElse("Filter", PNull)) match {
        case PName(n) => Seq(n)
        case PArr(items) => items.map(resolve).collect { case PName(n) => n }
        case _ => Nil
      }
      // /DecodeParms (alias /DP) aligns 1:1 with the filter chain: a single
      // dict for one filter, an array (with nulls) for several
      val parms: Int => Map[String, Obj] = {
        val raw = resolve(s.dict.m.getOrElse("DecodeParms",
          s.dict.m.getOrElse("DP", PNull)))
        raw match {
          case PDict(m) => i => if (i == 0) m else Map.empty
          case PArr(items) => i =>
            if (i < items.length) dictOf(items(i)) else Map.empty
          case _ => _ => Map.empty
        }
      }
      filters.zipWithIndex.foldLeft(s.raw) { case (data, (f, i)) =>
        if (data == null) null
        else {
          val p = parms(i)
          def pInt(k: String, dflt: Int): Int = resolve(p.getOrElse(k, PNull)) match {
            case PNum(v) => v.toInt
            case _ => dflt
          }
          val decoded = f match {
            case "FlateDecode" | "Fl" => inflate(data)
            case "LZWDecode" | "LZW" => lzw(data, pInt("EarlyChange", 1))
            case "ASCIIHexDecode" | "AHx" => asciiHex(data)
            case "ASCII85Decode" | "A85" => ascii85(data)
            case "RunLengthDecode" | "RL" => runLength(data)
            case _ => null // unsupported (DCT, JPX, CCITT, crypt) → skip
          }
          // PNG/TIFF predictors post-process Flate/LZW output (ubiquitous
          // on real-world ObjStm and XRef streams: Predictor 12 /Columns n)
          val predictor = pInt("Predictor", 1)
          if (decoded == null || predictor <= 1) decoded
          else unpredict(decoded, predictor, pInt("Columns", 1),
            pInt("Colors", 1), pInt("BitsPerComponent", 8))
        }
      }
    }

    def lengthOf(dict: PDict): Int = num(dict.m.get("Length")).toInt
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch { case _: Exception => null } finally inf.end()
  }

  /** LZW with the PDF/TIFF variable-code scheme: 9→12-bit codes, 256 =
    * clear table, 257 = EOD; `earlyChange = 1` (the default) widens the
    * code one entry early. Returns null on a corrupt code stream. */
  private def lzw(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val dict = new java.util.ArrayList[Array[Byte]](4096)
    def resetDict(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict.add(Array(i.toByte)); i += 1 }
      dict.add(null); dict.add(null) // 256 clear, 257 EOD
    }
    resetDict()
    var width = 9
    var buf = 0L
    var nbits = 0
    var prev: Array[Byte] = null
    var pos = 0
    while (pos < data.length || nbits >= width) {
      if (nbits < width) {
        buf = (buf << 8) | (data(pos) & 0xFF); nbits += 8; pos += 1
      } else {
        val code = ((buf >> (nbits - width)) & ((1 << width) - 1)).toInt
        nbits -= width
        if (code == 257) return out.toByteArray // EOD
        else if (code == 256) { resetDict(); width = 9; prev = null }
        else {
          val entry: Array[Byte] =
            if (code < dict.size() && dict.get(code) != null) dict.get(code)
            else if (code == dict.size() && prev != null) prev :+ prev(0)
            else return null // corrupt
          out.write(entry, 0, entry.length)
          if (prev != null) dict.add(prev :+ entry(0))
          prev = entry
          if (dict.size() + earlyChange >= (1 << width) && width < 12) width += 1
        }
      }
    }
    out.toByteArray
  }

  /** ASCII85 ('z' → four zero bytes, `~>` terminator, partial final group). */
  private def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5)
    var tuple = 0L
    var n = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        n += 1
        if (n == 5) {
          out.write(((tuple >> 24) & 0xFF).toInt); out.write(((tuple >> 16) & 0xFF).toInt)
          out.write(((tuple >> 8) & 0xFF).toInt); out.write((tuple & 0xFF).toInt)
          tuple = 0L; n = 0
        }
      } // whitespace and other bytes: skipped
      i += 1
    }
    if (n > 0) { // partial group: pad with 'u', emit n-1 bytes
      var k = n
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val bytes = Array(((tuple >> 24) & 0xFF).toByte, ((tuple >> 16) & 0xFF).toByte,
        ((tuple >> 8) & 0xFF).toByte, (tuple & 0xFF).toByte)
      out.write(bytes, 0, n - 1)
    }
    out.toByteArray
  }

  /** RunLengthDecode: length byte L — L ≤ 127: copy L+1 literals; L ≥ 129:
    * repeat next byte 257−L times; 128 = EOD. */
  private def runLength(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xFF
      i += 1
      if (l == 128) return out.toByteArray
      else if (l <= 127) {
        val n = math.min(l + 1, data.length - i)
        out.write(data, i, n); i += n
      } else if (i < data.length) {
        val b = data(i); i += 1
        var k = 0
        while (k < 257 - l) { out.write(b); k += 1 }
      }
    }
    out.toByteArray
  }

  /** Undo PNG (10-15) / TIFF (2) predictors applied before Flate/LZW —
    * real-world ObjStm and XRef streams almost always carry
    * `/Predictor 12 /Columns n`. Unknown row filters yield null (skip). */
  private def unpredict(data: Array[Byte], predictor: Int, columns: Int,
      colors: Int, bpc: Int): Array[Byte] = {
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = math.max(1, (columns * colors * bpc + 7) / 8)
    if (predictor == 2) { // TIFF horizontal differencing (8-bit case)
      if (bpc != 8) return null
      val out = data.clone()
      var r = 0
      while (r + rowLen <= out.length) {
        var i = r + bpp
        while (i < r + rowLen) { out(i) = (out(i) + out(i - bpp)).toByte; i += 1 }
        r += rowLen
      }
      return out
    }
    // PNG: each row is 1 filter byte + rowLen data bytes
    val stride = rowLen + 1
    val rows = data.length / stride
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * stride) & 0xFF
      val src = r * stride + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xFF
        val left = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xFF else 0
        val ul = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return null
        }
        out(dst + i) = (v & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      val d = Character.digit(c, 16)
      if (c == '>') { if (hi >= 0) out.write(hi << 4); done = true }
      else if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
      i += 1
    }
    out.toByteArray
  }

  // ---------- lexer / parser ----------
  private final class Lexer(b: Array[Byte], var pos: Int, doc: Doc) {

    private def ws(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def delim(c: Int): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

    private def skipWs(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = b(pos) & 0xFF
        if (ws(c)) pos += 1
        else if (c == '%') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else go = false
      }
    }

    private def keywordAhead(k: String): Boolean = {
      skipWs()
      if (pos + k.length > b.length) return false
      var i = 0
      while (i < k.length) {
        if (b(pos + i) != k.charAt(i)) return false
        i += 1
      }
      val after = if (pos + k.length < b.length) b(pos + k.length) & 0xFF else ' '
      ws(after) || delim(after)
    }

    /** Parse one value. `resolveLen` enables stream-body capture (needs the
      * doc to resolve indirect /Length). */
    def parseValue(resolveLen: Boolean): Obj = {
      skipWs()
      if (pos >= b.length) return PNull
      val c = b(pos) & 0xFF
      c match {
        case '/' => PName(parseName())
        case '(' => PStr(parseLiteralString())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          while ({ skipWs(); pos < b.length && b(pos) != ']' })
            items += parseValue(resolveLen)
          pos += 1
          PArr(items.result())
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') parseDictOrStream(resolveLen)
          else PStr(parseHexString())
        case _ =>
          if (keywordAhead("true")) { pos += 4; PBool(true) }
          else if (keywordAhead("false")) { pos += 5; PBool(false) }
          else if (keywordAhead("null")) { pos += 4; PNull }
          else parseNumberOrRef()
      }
    }

    private def parseName(): String = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < b.length && !ws(b(pos) & 0xFF) && !delim(b(pos) & 0xFF)) {
        val c = b(pos) & 0xFF
        if (c == '#' && pos + 2 < b.length) {
          val hex = Character.digit(b(pos + 1).toChar, 16) * 16 +
            Character.digit(b(pos + 2).toChar, 16)
          sb.append(hex.toChar); pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }

    private def parseLiteralString(): Array[Byte] = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < b.length && depth > 0) {
        val c = b(pos) & 0xFF
        c match {
          case '\\' if pos + 1 < b.length =>
            val e = b(pos + 1) & 0xFF
            pos += 2
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '\n' => // line continuation
              case '\r' => if (pos < b.length && b(pos) == '\n') pos += 1
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < b.length && b(pos) >= '0' && b(pos) <= '7') {
                  v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other)
            }
          case '(' => depth += 1; out.write('('); pos += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
            pos += 1
          case other => out.write(other); pos += 1
        }
      }
      out.toByteArray
    }

    private def parseHexString(): Array[Byte] = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (pos < b.length && !done) {
        val c = b(pos).toChar
        if (c == '>') { if (hi >= 0) out.write(hi << 4); done = true }
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
        }
        pos += 1
      }
      out.toByteArray
    }

    private def parseDictOrStream(resolveLen: Boolean): Obj = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, Obj]
      while ({ skipWs(); pos + 1 < b.length && !(b(pos) == '>' && b(pos + 1) == '>') }) {
        val key = parseValue(resolveLen) match {
          case PName(n) => n
          case _ => null
        }
        val v = parseValue(resolveLen)
        if (key != null) m += key -> v
      }
      pos += 2
      val dict = PDict(m.result())
      if (keywordAhead("stream")) {
        pos += "stream".length
        if (pos < b.length && b(pos) == '\r') pos += 1
        if (pos < b.length && b(pos) == '\n') pos += 1
        val len0 = if (resolveLen && doc != null) doc.lengthOf(dict) else 0
        val start = pos
        val len =
          if (len0 > 0 && start + len0 <= b.length) len0
          else { // broken/absent Length: scan for endstream
            val idx = indexOfBytes(b, "endstream", start)
            if (idx < 0) 0 else idx - start
          }
        pos = start + len
        skipWs()
        if (keywordAhead("endstream")) pos += "endstream".length
        PStream(dict, java.util.Arrays.copyOfRange(b, start, start + len))
      } else dict
    }

    /** Content-stream tokenizer: returns a parsed [[Obj]] operand, an
      * operator keyword as a String, or null at end of data. */
    def nextToken(): AnyRef = {
      skipWs()
      if (pos >= b.length) return null
      val c = b(pos) & 0xFF
      if (c == '/' || c == '(' || c == '[' || c == '<') parseValue(false)
      else if ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')
        parseNumberOrRef()
      else {
        val start = pos
        while (pos < b.length && !ws(b(pos) & 0xFF) && !delim(b(pos) & 0xFF)) pos += 1
        if (pos == start) pos += 1 // lone delimiter (] } etc.): swallow
        new String(b, start, math.max(1, pos - start), StandardCharsets.ISO_8859_1)
      }
    }

    /** Skip to just past the next occurrence of `needle` (inline images). */
    def skipPast(needle: String): Unit = {
      val idx = indexOfBytes(b, needle, pos)
      pos = if (idx < 0) b.length else idx + needle.length
    }

    private def parseNumberOrRef(): Obj = {
      val start = pos
      if (pos < b.length && (b(pos) == '+' || b(pos) == '-')) pos += 1
      var digits = false
      while (pos < b.length &&
          ((b(pos) >= '0' && b(pos) <= '9') || b(pos) == '.')) {
        digits = true; pos += 1
      }
      if (!digits) { pos += 1; return PNull } // stray token: swallow a byte
      val v = new String(b, start, pos - start, StandardCharsets.ISO_8859_1).toDouble
      // `N G R` lookahead for an indirect reference
      val save = pos
      skipWs()
      val genStart = pos
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
      if (pos > genStart) {
        val gen = new String(b, genStart, pos - genStart,
          StandardCharsets.ISO_8859_1)
        skipWs()
        if (pos < b.length && b(pos) == 'R' &&
            (pos + 1 >= b.length || ws(b(pos + 1) & 0xFF) || delim(b(pos + 1) & 0xFF))) {
          pos += 1
          return PRef(v.toInt, gen.toInt)
        }
      }
      pos = save
      PNum(v)
    }
  }

  // ---------- ToUnicode CMap (PDF 1.7 §9.10.3) ----------
  private object CMap {
    private val hexPairRe =
      """(?s)<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    private val csBlockRe =
      """(?s)begincodespacerange(.*?)endcodespacerange""".r
    private val bfCharBlockRe = """(?s)beginbfchar(.*?)endbfchar""".r
    private val bfRangeBlockRe = """(?s)beginbfrange(.*?)endbfrange""".r
    private val rangeEntryRe =
      """(?s)<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[(?:\s*<[0-9A-Fa-f]+>\s*)+\])""".r
    private val dstRe = """<([0-9A-Fa-f]+)>""".r

    private def hexBytes(h: String): Array[Byte] = {
      val s = if (h.length % 2 == 1) h + "0" else h
      Array.tabulate(s.length / 2)(i =>
        Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte)
    }
    private def utf16(h: String): String =
      new String(hexBytes(h), StandardCharsets.UTF_16BE)
    /** Destination string advanced by `off` (the bfrange consecutive-
      * mapping rule). A single-code-point base advances by CODE POINT —
      * incrementing the last UTF-16 unit would walk a non-BMP base (or one
      * ending near 0xDFFF) into unpaired surrogates. Multi-char BMP bases
      * keep the last-code-unit rule the spec describes. */
    private def advance(base: String, off: Int): String =
      if (base.isEmpty) base
      else if (base.codePointCount(0, base.length) == 1)
        new String(Character.toChars(base.codePointAt(0) + off))
      else base.substring(0, base.length - 1) +
        (base.charAt(base.length - 1) + off).toChar

    /** Parse a ToUnicode CMap into a byte-string decoder, or None when the
      * text contains no usable mappings. Codespace ranges give the code
      * byte widths (Identity-H: one 2-byte range); codes outside every
      * mapping decode to nothing. */
    def parse(text: String): Option[Array[Byte] => String] = {
      // (len, lo, hi) codespace ranges; default to 2-byte (Identity-H)
      val spaces0 = csBlockRe.findAllMatchIn(text).flatMap(b =>
        hexPairRe.findAllMatchIn(b.group(1)).map { m =>
          (m.group(1).length / 2, java.lang.Long.parseLong(m.group(1), 16),
            java.lang.Long.parseLong(m.group(2), 16))
        }).toVector
      val spaces = if (spaces0.nonEmpty) spaces0 else Vector((2, 0L, 0xFFFFL))
      val lens = spaces.map(_._1).distinct.sorted

      val direct = mutable.Map.empty[Long, String]
      bfCharBlockRe.findAllMatchIn(text).foreach(b =>
        hexPairRe.findAllMatchIn(b.group(1)).foreach { m =>
          direct(java.lang.Long.parseLong(m.group(1), 16)) = utf16(m.group(2))
        })
      // (lo, hi, base or explicit-array)
      val ranges = mutable.ArrayBuffer.empty[(Long, Long, Either[String, Vector[String]])]
      bfRangeBlockRe.findAllMatchIn(text).foreach(b =>
        rangeEntryRe.findAllMatchIn(b.group(1)).foreach { m =>
          val lo = java.lang.Long.parseLong(m.group(1), 16)
          val hi = java.lang.Long.parseLong(m.group(2), 16)
          val dst = m.group(3)
          if (dst.startsWith("["))
            ranges += ((lo, hi,
              Right(dstRe.findAllMatchIn(dst).map(d => utf16(d.group(1))).toVector)))
          else ranges += ((lo, hi, Left(utf16(dst.substring(1, dst.length - 1)))))
        })
      if (direct.isEmpty && ranges.isEmpty) return None

      val rs = ranges.toVector
      def lookup(code: Long): String =
        direct.getOrElse(code, rs.collectFirst {
          case (lo, hi, Left(base)) if code >= lo && code <= hi =>
            advance(base, (code - lo).toInt)
          case (lo, hi, Right(arr)) if code >= lo && code <= hi &&
              (code - lo) < arr.length => arr((code - lo).toInt)
        }.getOrElse(""))

      Some { bytes =>
        val sb = new StringBuilder
        var i = 0
        while (i < bytes.length) {
          var taken = 0
          // shortest codespace width whose range contains the code wins
          val it = lens.iterator
          while (taken == 0 && it.hasNext) {
            val len = it.next()
            if (i + len <= bytes.length) {
              var code = 0L
              var j = 0
              while (j < len) { code = (code << 8) | (bytes(i + j) & 0xFF); j += 1 }
              if (spaces.exists { case (l, lo, hi) => l == len && code >= lo && code <= hi }) {
                sb.append(lookup(code))
                taken = len
              }
            }
          }
          if (taken == 0) taken = math.max(1, lens.head) // resync: skip a code
          i += taken
        }
        sb.toString
      }
    }
  }

  // ---------- content-stream text assembly ----------
  private object ContentText {

    /** Decode a PDF string's bytes to chars: UTF-16BE when BOM'd, else
      * PDFDocEncoding ≈ Latin-1 for the printable range (single-byte simple
      * fonts — the supported case). */
    private def str(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
        new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE)
      else new String(bytes, StandardCharsets.ISO_8859_1)

    /** Interpret the text operators; positions are approximated by operator
      * shape (pymupdf lays out by glyph geometry — out of scope): `Td/TD`
      * with a vertical move, `T*`, `'`, `"` and a new `Tm` row start a new
      * line; horizontal `Td` inserts a space. `Tf` selects the current
      * font: fonts present in `fonts` decode their strings through the
      * font's ToUnicode CMap (CID path); others use the default [[str]]. */
    def run(data: Array[Byte],
        fonts: Map[String, Array[Byte] => String] = Map.empty): String = {
      val lex = new Lexer(data, 0, null)
      val sb = new StringBuilder
      val operands = mutable.ArrayBuffer.empty[Obj]
      def newline(): Unit =
        if (sb.nonEmpty && sb.last != '\n') sb.append('\n')
      def space(): Unit =
        if (sb.nonEmpty && sb.last != ' ' && sb.last != '\n') sb.append(' ')
      var inText = false
      var decoder: Array[Byte] => String = null
      def dec(bytes: Array[Byte]): String =
        if (decoder != null) decoder(bytes) else str(bytes)
      var tok: AnyRef = lex.nextToken()
      while (tok != null) {
        tok match {
          case op: String =>
            op match {
              case "BT" => inText = true
              case "ET" => inText = false; newline()
              case "Tf" =>
                decoder = operands.dropRight(1).lastOption.collect {
                  case PName(f) => fonts.get(f)
                }.flatten.orNull
              case "Tj" if inText =>
                operands.lastOption.collect { case PStr(s) => sb.append(dec(s)) }
              case "'" | "\"" if inText =>
                newline()
                operands.lastOption.collect { case PStr(s) => sb.append(dec(s)) }
              case "TJ" if inText =>
                operands.lastOption.collect { case PArr(items) =>
                  items.foreach {
                    case PStr(s) => sb.append(dec(s))
                    case PNum(v) if v < -180 => space() // large kern ~ word gap
                    case _ =>
                  }
                }
              case "Td" | "TD" if inText =>
                val ty = operands.takeRight(1).collectFirst { case PNum(v) => v }
                if (ty.exists(_ != 0.0)) newline() else space()
              case "T*" if inText => newline()
              case "Tm" if inText => newline()
              case "BI" => lex.skipPast("EI") // inline image: binary payload
              case _ =>
            }
            operands.clear()
          case value: Obj => operands += value
          case _ =>
        }
        tok = lex.nextToken()
      }
      sb.toString
    }
  }
}
