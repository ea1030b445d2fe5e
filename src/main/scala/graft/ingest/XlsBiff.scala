package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/**
 * Minimal BIFF8 (legacy `.xls` Workbook stream) text extraction, matching
 * the reference's xlrd loader semantics
 * (`/root/reference/document_processor.py:180-194`): per sheet in
 * BOUNDSHEET order, per row, non-empty cell values space-joined; rows
 * newline-joined. Covers the records a text pipeline meets — SST/LABELSST,
 * LABEL, NUMBER, RK, MULRK — and skips everything else. No CONTINUE-record
 * reassembly (fixture-scale SSTs fit one record); malformed input returns
 * null for skip-and-count.
 */
object XlsBiff {

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
      val sheets = mutable.ArrayBuffer.empty[Int]
      val sst = mutable.ArrayBuffer.empty[String]
      val globals = records(0).takeWhile(_.tpe != 0x000A)
      globals.foreach { r =>
        r.tpe match {
          case 0x0085 => // BOUNDSHEET: stream offset of the sheet substream
            sheets += bb.getInt(r.off)
          case 0x00FC => // SST: count u32, unique u32, strings
            val unique = bb.getInt(r.off + 4)
            var p = r.off + 8
            var i = 0
            while (i < unique && p < r.off + r.len) {
              val (s, n) = xlString(wb, p, len16 = true)
              sst += s
              p += n
              i += 1
            }
          case _ =>
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
