package graft.expr

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

/**
 * Fixed-size character chunking with overlap, re-expressing the reference's
 * two splitters:
 *
 *  - `FixedSizeTextSplitter.split_documents`
 *    (`/root/reference/document_processor.py:368-408`): strip the document,
 *    then windows of `chunkSize` chars advancing by
 *    `step = max(chunkSize - overlap, 1)`; each piece stripped, empty pieces
 *    dropped. No page numbers.
 *  - PDF page-marker splitter `add_pymupdf_page_metadata`
 *    (`/root/reference/document_processor.py:411-477`): `[[pageN]]` marker
 *    positions are recorded against the marker-stripped text, then the same
 *    windowing runs over the stripped text; each chunk gets the page of the
 *    last marker at-or-before its start (default page 1,
 *    `document_processor.py:440-448`).
 *
 * One entry point serves both: documents without markers produce
 * `page = None` (null page_number column), marker-bearing documents follow
 * the PDF rules. Offsets are Java `char` offsets; upstream index-side
 * normalization drops non-BMP codepoints, so they coincide with the
 * reference's codepoint offsets (SURVEY §7.4.2).
 */
object Chunker {

  final case class Piece(text: String, index: Int, page: Option[Int])

  private val marker = Pattern.compile("\\[\\[page(\\d+)\\]\\]")

  def chunk(text: String, chunkSize: Int, overlap: Int): Seq[Piece] = {
    if (text == null) return Nil
    val step = math.max(chunkSize - overlap, 1)

    // Locate [[pageN]] markers; positions are relative to the cleaned text
    // (i.e. with all markers removed), mirroring the reference's
    // offset-adjustment loop (document_processor.py:425-431).
    val m = marker.matcher(text)
    val markers = new ArrayBuffer[(Int, Int)]() // (posInClean, page)
    var removed = 0
    while (m.find()) {
      markers += ((m.start - removed, m.group(1).toInt))
      removed += m.end - m.start
    }
    val hasPages = markers.nonEmpty
    val clean0 = if (hasPages) marker.matcher(text).replaceAll("") else text
    // The non-PDF splitter strips the whole document first
    // (document_processor.py:393); the PDF path chunks unstripped clean text.
    val clean = if (hasPages) clean0 else clean0.strip()
    if (clean.isEmpty) return Nil

    val out = new ArrayBuffer[Piece]()
    var start = 0
    var idx = 0
    while (start < clean.length) {
      val piece = clean.substring(start, math.min(start + chunkSize, clean.length)).strip()
      if (piece.nonEmpty) {
        val page =
          if (!hasPages) None
          else {
            var p = 1 // default page (document_processor.py:446-448)
            var i = markers.length - 1
            var found = false
            while (i >= 0 && !found) {
              if (markers(i)._1 <= start) { p = markers(i)._2; found = true }
              i -= 1
            }
            Some(p)
          }
        out += Piece(piece, idx, page)
        idx += 1
      }
      start += step
    }
    out.toSeq
  }
}
