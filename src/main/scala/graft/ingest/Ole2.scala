package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/**
 * Minimal OLE2 / Compound File Binary reader (the container of `.msg` and
 * legacy `.xls`), per the MS-CFB layout: header DIFAT → FAT chains →
 * directory entries (UTF-16LE names) → stream payloads, with small streams
 * (< 4096 bytes) resolved through the mini FAT inside the root entry's
 * mini stream. Read-only, defensive: malformed input returns an empty
 * stream map and callers fall back to skip-and-count.
 */
object Ole2 {

  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FREESECT = 0xFFFFFFFF

  /** All directory-entry streams by name (type-2 entries, tree ignored —
    * a linear scan of the directory chain sees every entry). */
  def streams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    try {
      if (bytes.length < 512) return Map.empty
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bb.getLong(0) != 0xE11AB1A1E011CFD0L) return Map.empty // magic
      val sectorShift = bb.getShort(30).toInt
      val sectorSize = 1 << sectorShift
      val miniSize = 1 << bb.getShort(32).toInt
      val dirStart = bb.getInt(48)
      val miniCutoff = bb.getInt(56)
      val miniFatStart = bb.getInt(60)
      val difatStart = bb.getInt(68)
      val nDifat = bb.getInt(72)

      def sectorOffset(sid: Int): Int = (sid + 1) << sectorShift

      // DIFAT: 109 header entries + chained DIFAT sectors
      val fatSectors = mutable.ArrayBuffer.empty[Int]
      for (i <- 0 until 109) {
        val s = bb.getInt(76 + 4 * i)
        if (s != FREESECT && s != ENDOFCHAIN && s >= 0) fatSectors += s
      }
      var difat = difatStart
      var guard = 0
      while (difat != ENDOFCHAIN && difat != FREESECT && difat >= 0 &&
          guard < nDifat + 4) {
        val off = sectorOffset(difat)
        for (i <- 0 until sectorSize / 4 - 1) {
          val s = bb.getInt(off + 4 * i)
          if (s != FREESECT && s != ENDOFCHAIN && s >= 0) fatSectors += s
        }
        difat = bb.getInt(off + sectorSize - 4)
        guard += 1
      }

      val fat = fatSectors.toArray.flatMap { sid =>
        val off = sectorOffset(sid)
        (0 until sectorSize / 4).map(i => bb.getInt(off + 4 * i))
      }

      def chain(start: Int, table: Array[Int]): Seq[Int] = {
        val out = mutable.ArrayBuffer.empty[Int]
        var s = start
        while (s != ENDOFCHAIN && s != FREESECT && s >= 0 &&
            s < table.length && out.length <= table.length) {
          out += s
          s = table(s)
        }
        out.toSeq
      }

      def readChain(start: Int): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        chain(start, fat).foreach { sid =>
          val off = sectorOffset(sid)
          out.write(bytes, off, math.min(sectorSize, bytes.length - off))
        }
        out.toByteArray
      }

      val dir = readChain(dirStart)
      final case class Entry(name: String, tpe: Int, start: Int, size: Long)
      val entries = (0 until dir.length / 128).map { i =>
        val e = ByteBuffer.wrap(dir, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = math.max(0, e.getShort(i * 128 + 64) - 2)
        val name =
          if (nameLen <= 0 || nameLen > 62) ""
          else new String(dir, i * 128, nameLen, StandardCharsets.UTF_16LE)
        Entry(name, dir(i * 128 + 66) & 0xFF, e.getInt(i * 128 + 116),
          e.getInt(i * 128 + 120).toLong & 0xFFFFFFFFL)
      }

      val root = entries.find(_.tpe == 5)
      lazy val miniStream = root.map(r => readChain(r.start)).getOrElse(Array.empty)
      lazy val miniFat = chain(miniFatStart, fat).toArray.flatMap { sid =>
        val off = sectorOffset(sid)
        (0 until sectorSize / 4).map(i => bb.getInt(off + 4 * i))
      }

      entries.filter(e => e.tpe == 2 && e.name.nonEmpty).map { e =>
        val data =
          if (e.size >= miniCutoff) readChain(e.start)
          else {
            val out = new java.io.ByteArrayOutputStream()
            chain(e.start, miniFat).foreach { ms =>
              val off = ms * miniSize
              if (off < miniStream.length)
                out.write(miniStream, off,
                  math.min(miniSize, miniStream.length - off))
            }
            out.toByteArray
          }
        e.name -> data.take(math.min(e.size, Int.MaxValue.toLong).toInt)
      }.toMap
    } catch { case _: Exception => Map.empty }
  }
}
