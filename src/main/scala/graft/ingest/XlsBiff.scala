package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/**
 * Minimal BIFF8 (legacy `.xls` Workbook stream) text extraction, matching
 * the reference's xlrd loader semantics
 * (`/root/reference/document_processor.py:180-194`): per sheet in
 * BOUNDSHEET order, per row, non-empty cell values space-joined; rows
 * newline-joined. Covers the records a text pipeline meets — SST (with
 * CONTINUE-record reassembly: real Excel splits shared-string tables at
 * 8224 bytes, restating the encoding flags byte at each continuation),
 * LABELSST, LABEL, NUMBER, RK, MULRK — and skips everything else.
 * Malformed input returns null for skip-and-count.
 */
object XlsBiff {

  /** Reader over an SST's data spread across the SST record + CONTINUE
    * records. BIFF guarantees string HEADERS (cch/grbit/counts) never
    * split; character data may split, and each continuation opens with a
    * fresh grbit byte that may switch the remaining chars between
    * compressed and UTF-16 encodings (MS-XLS 2.5.293). */
  private final class SstReader(b: Array[Byte], parts: Seq[(Int, Int)]) {
    private var part = 0
    private var pos = parts.head._1
    private def partEnd: Int = parts(part)._1 + parts(part)._2
    def hasMore: Boolean = pos < partEnd || part < parts.length - 1
    private def roll(): Unit =
      if (pos >= partEnd && part < parts.length - 1) {
        part += 1
        pos = parts(part)._1
      }
    def u8(): Int = { roll(); val v = b(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { roll(); u8() | (u8() << 8) }
    def u32(): Int = { roll(); u16() | (u16() << 16) }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        roll()
        val take = math.min(left, partEnd - pos)
        if (take <= 0) return // truncated: stop
        pos += take
        left -= take
      }
    }

    /** One XLUnicodeRichExtendedString. */
    def readString(): String = {
      val cch = u16()
      var grbit = u8()
      val cRun = if ((grbit & 0x08) != 0) u16() else 0
      val cbExt = if ((grbit & 0x04) != 0) u32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var left = cch
      while (left > 0) {
        if (pos >= partEnd) {
          // continuation boundary INSIDE character data: the next part
          // opens with a fresh flags byte for the remaining chars
          if (part >= parts.length - 1) return sb.toString // truncated
          part += 1
          pos = parts(part)._1
          grbit = u8()
        }
        val wide = (grbit & 0x01) != 0
        val avail = partEnd - pos
        val take = math.min(left, if (wide) avail / 2 else avail)
        if (take <= 0) return sb.toString
        if (wide) {
          sb.append(new String(b, pos, 2 * take, StandardCharsets.UTF_16LE))
          pos += 2 * take
        } else {
          sb.append(new String(b, pos, take, StandardCharsets.ISO_8859_1))
          pos += take
        }
        left -= take
      }
      skip(4 * cRun + cbExt)
      sb.toString
    }
  }

  private final case class Rec(tpe: Int, off: Int, len: Int)

  /** BIFF8 XLUnicodeString at `pos`; returns (string, bytesConsumed). */
  private def xlString(b: Array[Byte], pos: Int, len16: Boolean): (String, Int) = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var p = pos
    val cch = if (len16) { val v = bb.getShort(p) & 0xFFFF; p += 2; v }
              else { val v = b(p) & 0xFF; p += 1; v }
    val grbit = b(p) & 0xFF
    p += 1
    val cRun = if ((grbit & 0x08) != 0) { val v = bb.getShort(p) & 0xFFFF; p += 2; v } else 0
    val cbExt = if ((grbit & 0x04) != 0) { val v = bb.getInt(p); p += 4; v } else 0
    val s =
      if ((grbit & 0x01) != 0) {
        val str = new String(b, p, 2 * cch, StandardCharsets.UTF_16LE)
        p += 2 * cch
        str
      } else {
        val str = new String(b, p, cch, StandardCharsets.ISO_8859_1)
        p += cch
        str
      }
    p += 4 * cRun + cbExt
    (s, p - pos)
  }

  def extract(wb: Array[Byte]): String = {
    try {
      val bb = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
      def records(from: Int): Iterator[Rec] = new Iterator[Rec] {
        private var p = from
        def hasNext: Boolean = p + 4 <= wb.length
        def next(): Rec = {
          val t = bb.getShort(p) & 0xFFFF
          val l = bb.getShort(p + 2) & 0xFFFF
          val r = Rec(t, p + 4, l)
          p += 4 + l
          r
        }
      }

      // workbook globals: sheet offsets + shared strings
      val globals = records(0).takeWhile(_.tpe != 0x000A).toVector
      val sheets = globals.filter(_.tpe == 0x0085).map(r => bb.getInt(r.off))
      val sst = mutable.ArrayBuffer.empty[String]
      globals.indexWhere(_.tpe == 0x00FC) match {
        case -1 =>
        case si =>
          val head = globals(si)
          // SST data = the record body + every immediately-following
          // CONTINUE record (real Excel splits the table at 8224 bytes)
          val parts = (head.off + 8, head.len - 8) +:
            globals.drop(si + 1).takeWhile(_.tpe == 0x003C)
              .map(c => (c.off, c.len))
          val unique = bb.getInt(head.off + 4)
          val reader = new SstReader(wb, parts)
          var i = 0
          while (i < unique && reader.hasMore) {
            sst += reader.readString()
            i += 1
          }
      }

      def numStr(v: Double): String = v.toString // xlrd str(float) shape

      val rows = mutable.ArrayBuffer.empty[String]
      sheets.foreach { start =>
        val cells = mutable.TreeMap.empty[(Int, Int), String]
        records(start).takeWhile(_.tpe != 0x000A).foreach { r =>
          r.tpe match {
            case 0x00FD => // LABELSST
              val row = bb.getShort(r.off) & 0xFFFF
              val col = bb.getShort(r.off + 2) & 0xFFFF
              val i = bb.getInt(r.off + 6)
              if (i >= 0 && i < sst.length) cells((row, col)) = sst(i)
            case 0x0204 => // LABEL (inline string)
              val row = bb.getShort(r.off) & 0xFFFF
              val col = bb.getShort(r.off + 2) & 0xFFFF
              cells((row, col)) = xlString(wb, r.off + 6, len16 = true)._1
            case 0x0203 => // NUMBER (IEEE double)
              val row = bb.getShort(r.off) & 0xFFFF
              val col = bb.getShort(r.off + 2) & 0xFFFF
              cells((row, col)) = numStr(bb.getDouble(r.off + 6))
            case 0x027E => // RK
              val row = bb.getShort(r.off) & 0xFFFF
              val col = bb.getShort(r.off + 2) & 0xFFFF
              cells((row, col)) = numStr(rk(bb.getInt(r.off + 6)))
            case 0x00BD => // MULRK: run of RK cells in one row
              val row = bb.getShort(r.off) & 0xFFFF
              val colFirst = bb.getShort(r.off + 2) & 0xFFFF
              val n = (r.len - 6) / 6
              for (i <- 0 until n)
                cells((row, colFirst + i)) = numStr(rk(bb.getInt(r.off + 4 + 6 * i + 2)))
            case _ =>
          }
        }
        cells.groupBy(_._1._1).toSeq.sortBy(_._1).foreach { case (_, rowCells) =>
          val vals = rowCells.toSeq.sortBy(_._1._2).map(_._2)
            .filter(_.strip().nonEmpty)
          if (vals.nonEmpty) rows += vals.mkString(" ")
        }
      }
      if (rows.isEmpty) null else rows.mkString("\n")
    } catch { case _: Exception => null }
  }

  /** RK number: bit0 = ÷100, bit1 = 30-bit int (else high 30 bits of an
    * IEEE double). */
  private def rk(raw: Int): Double = {
    val base =
      if ((raw & 2) != 0) (raw >> 2).toDouble
      else java.lang.Double.longBitsToDouble((raw & 0xFFFFFFFCL) << 32)
    if ((raw & 1) != 0) base / 100.0 else base
  }
}
