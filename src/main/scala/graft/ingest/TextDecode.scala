package graft.ingest

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import scala.collection.mutable.ArrayBuffer

/**
 * Byte-level extractors for the text-family formats, re-expressing the
 * reference's loaders:
 *
 *  - TXT/MD: encoding fallback chain utf-8 → utf-8-sig → latin-1 → cp1252
 *    (`/root/reference/document_processor.py:93-102`). Strict UTF-8 is tried
 *    first (BOM stripped, covering the utf-8-sig case); on malformed input we
 *    fall back to latin-1, which accepts every byte — so cp1252 is
 *    unreachable, exactly as in the reference.
 *  - CSV: RFC-4180-style rows, each row's fields joined by a single space,
 *    rows joined by newline — a schema-less flatten to text
 *    (`/root/reference/document_processor.py:105-117`).
 *
 * These run inside extraction UDFs over the `binaryFile` source (SURVEY
 * §2.1 S1-S5); they are not oracle-checked surface (SURVEY §7.4.7).
 */
object TextDecode {

  /** Decode with the reference's fallback semantics; null for undecodable
    * or blank content (loader returns None → file dropped, F2). */
  def decode(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val text =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        val s = dec.decode(ByteBuffer.wrap(bytes)).toString
        if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
      } catch {
        case _: CharacterCodingException =>
          new String(bytes, StandardCharsets.ISO_8859_1)
      }
    if (text == null || text.strip().isEmpty) null else text
  }

  /** Decode then flatten CSV rows to space-joined lines. */
  def decodeCsv(bytes: Array[Byte]): String = {
    val text = decode(bytes)
    if (text == null) return null
    val rows = parseCsv(text)
    if (rows.isEmpty) null
    else {
      val flat = rows.map(_.mkString(" ")).mkString("\n")
      if (flat.strip().isEmpty) null else flat
    }
  }

  /** Minimal RFC-4180 parser: quoted fields, embedded commas/newlines,
    * doubled-quote escapes. */
  def parseCsv(text: String): Seq[Seq[String]] = {
    val rows = new ArrayBuffer[Seq[String]]()
    val row = new ArrayBuffer[String]()
    val field = new java.lang.StringBuilder()
    var inQuotes = false
    var i = 0
    val n = text.length
    def endField(): Unit = { row += field.toString; field.setLength(0) }
    def endRow(): Unit = {
      endField()
      if (!(row.length == 1 && row.head.isEmpty)) rows += row.toSeq
      row.clear()
    }
    while (i < n) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && text.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQuotes = false
        } else field.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => endField()
        case '\r' => if (i + 1 < n && text.charAt(i + 1) == '\n') i += 1; endRow()
        case '\n' => endRow()
        case other => field.append(other)
      }
      i += 1
    }
    if (field.length > 0 || row.nonEmpty) endRow()
    rows.toSeq
  }
}
