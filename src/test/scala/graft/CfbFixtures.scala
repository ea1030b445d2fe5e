package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Shared test builders for OLE2/CFB containers (MSG, legacy XLS) and
  * BIFF8 workbook streams. Every stream is < 4096 bytes so the container
  * exercises the mini-FAT path the real formats use. */
object CfbFixtures {

  private val SECTOR = 512
  private val MINI = 64
  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FREESECT = 0xFFFFFFFF
  private val FATSECT = 0xFFFFFFFD

  def mkCfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    // --- mini stream: streams padded to 64-byte mini sectors, chained ---
    val miniData = new ByteArrayOutputStream()
    val miniStarts = new Array[Int](streams.length)
    var nextMini = 0
    streams.zipWithIndex.foreach { case ((_, data), i) =>
      miniStarts(i) = nextMini
      miniData.write(data)
      val pad = (MINI - data.length % MINI) % MINI
      miniData.write(new Array[Byte](pad))
      nextMini += (data.length + MINI - 1) / MINI
    }
    val miniBytes = miniData.toByteArray
    val nMiniSectors = nextMini
    val miniFat = new Array[Int](((nMiniSectors + 127) / 128) * 128)
    java.util.Arrays.fill(miniFat, FREESECT)
    streams.zipWithIndex.foreach { case ((_, data), i) =>
      val n = (data.length + MINI - 1) / MINI
      for (j <- 0 until n)
        miniFat(miniStarts(i) + j) = if (j == n - 1) ENDOFCHAIN else miniStarts(i) + j + 1
    }
    val nMiniFatSectors = math.max(1, (nMiniSectors * 4 + SECTOR - 1) / SECTOR)

    // --- directory: root + one entry per stream, 4 entries per sector ---
    val nDirEntries = ((1 + streams.length + 3) / 4) * 4
    val dir = ByteBuffer.allocate(nDirEntries * 128).order(ByteOrder.LITTLE_ENDIAN)
    def entry(idx: Int, name: String, tpe: Int, start: Int, size: Long,
        child: Int = -1): Unit = {
      val base = idx * 128
      val utf = name.getBytes(StandardCharsets.UTF_16LE)
      dir.position(base)
      dir.put(utf, 0, math.min(utf.length, 62))
      dir.putShort(base + 64, (math.min(utf.length, 62) + 2).toShort)
      dir.put(base + 66, tpe.toByte)
      dir.put(base + 67, 1.toByte) // black
      dir.putInt(base + 68, -1) // left
      dir.putInt(base + 72, -1) // right
      dir.putInt(base + 76, child)
      dir.putInt(base + 116, start)
      dir.putInt(base + 120, size.toInt)
    }
    val nDirSectors = nDirEntries / 4

    // --- sector layout: [0]=FAT, [1..d]=dir, [..m]=miniFAT, [..k]=mini ---
    val dirStart = 1
    val miniFatStart = dirStart + nDirSectors
    val miniStreamStart = miniFatStart + nMiniFatSectors
    val nMiniStreamSectors = math.max(1, (miniBytes.length + SECTOR - 1) / SECTOR)
    val totalSectors = miniStreamStart + nMiniStreamSectors

    entry(0, "Root Entry", 5, miniStreamStart, miniBytes.length.toLong, child = 1)
    streams.zipWithIndex.foreach { case ((name, data), i) =>
      entry(1 + i, name, 2, miniStarts(i), data.length.toLong)
    }

    val fat = new Array[Int](SECTOR / 4)
    java.util.Arrays.fill(fat, FREESECT)
    fat(0) = FATSECT
    def chainInto(from: Int, n: Int): Unit =
      for (j <- 0 until n) fat(from + j) = if (j == n - 1) ENDOFCHAIN else from + j + 1
    chainInto(dirStart, nDirSectors)
    chainInto(miniFatStart, nMiniFatSectors)
    chainInto(miniStreamStart, nMiniStreamSectors)

    // --- assemble ---
    val out = ByteBuffer.allocate(SECTOR * (1 + totalSectors))
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(0, 0xE11AB1A1E011CFD0L)
    out.putShort(26, 0x003E.toShort) // minor
    out.putShort(28, 0x0003.toShort) // major (512-byte sectors)
    out.putShort(30, 9.toShort) // sector shift
    out.putShort(32, 6.toShort) // mini shift
    out.putInt(44, 1) // # FAT sectors
    out.putInt(48, dirStart)
    out.putInt(56, 4096) // mini cutoff
    out.putInt(60, miniFatStart)
    out.putInt(64, nMiniFatSectors)
    out.putInt(68, ENDOFCHAIN) // no DIFAT chain
    out.putInt(72, 0)
    out.putInt(76, 0) // DIFAT[0] = FAT sector 0
    for (i <- 1 until 109) out.putInt(76 + 4 * i, FREESECT)

    def sectorOff(sid: Int): Int = (sid + 1) * SECTOR
    for (i <- fat.indices) out.putInt(sectorOff(0) + 4 * i, fat(i))
    out.position(sectorOff(dirStart)); out.put(dir.array())
    for (i <- 0 until nMiniFatSectors * (SECTOR / 4))
      out.putInt(sectorOff(miniFatStart) + 4 * i,
        if (i < miniFat.length) miniFat(i) else FREESECT)
    out.position(sectorOff(miniStreamStart)); out.put(miniBytes)
    out.array()
  }

  // ---------- BIFF8 workbook stream ----------

  private[graft] def rec(tpe: Int, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(tpe.toShort).putShort(data.length.toShort).put(data)
    b.array()
  }
  private[graft] def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private[graft] def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private[graft] def xlStr16(s: String): Array[Byte] =
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes(StandardCharsets.ISO_8859_1)

  /** Workbook stream: globals (BOF, BOUNDSHEETs, SST, EOF) + one substream
    * per sheet of (row, col, value) cells; strings go through the SST. */
  def mkWorkbookStream(sheets: Seq[(String, Seq[(Int, Int, Any)])]): Array[Byte] = {
    val strings = sheets.flatMap(_._2).collect { case (_, _, s: String) => s }.distinct
    val sstIdx = strings.zipWithIndex.toMap
    val bof = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12))
    val sst = rec(0x00FC, le32(strings.length) ++ le32(strings.length) ++
      strings.flatMap(xlStr16).toArray)
    val eof = rec(0x000A, Array.empty)

    val sheetStreams = sheets.map { case (_, cells) =>
      val body = new ByteArrayOutputStream()
      body.write(rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ new Array[Byte](12)))
      cells.foreach {
        case (r, c, s: String) =>
          body.write(rec(0x00FD, le16(r) ++ le16(c) ++ le16(0) ++ le32(sstIdx(s))))
        case (r, c, d: Double) =>
          val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
          b.putShort(r.toShort).putShort(c.toShort).putShort(0.toShort).putDouble(d)
          body.write(rec(0x0203, b.array()))
        case (r, c, i: Int) => // RK 30-bit integer form
          body.write(rec(0x027E, le16(r) ++ le16(c) ++ le16(0) ++ le32((i << 2) | 2)))
        case other => throw new IllegalArgumentException(other.toString)
      }
      body.write(eof)
      body.toByteArray
    }

    // BOUNDSHEET needs absolute sheet offsets: lay out globals first
    def boundsheet(off: Int, name: String): Array[Byte] =
      rec(0x0085, le32(off) ++ le16(0) ++
        Array(name.length.toByte, 0.toByte) ++
        name.getBytes(StandardCharsets.ISO_8859_1))
    val bsLens = sheets.map { case (name, _) => 4 + 4 + 2 + 2 + name.length }
    val globalsLen = bof.length + bsLens.sum + sst.length + eof.length
    val offsets = sheetStreams.scanLeft(globalsLen)(_ + _.length).init

    val out = new ByteArrayOutputStream()
    out.write(bof)
    sheets.zip(offsets).foreach { case ((name, _), off) =>
      out.write(boundsheet(off, name))
    }
    out.write(sst)
    out.write(eof)
    sheetStreams.foreach(out.write)
    out.toByteArray
  }

  def mkXls(sheets: Seq[(String, Seq[(Int, Int, Any)])]): Array[Byte] =
    mkCfb(Seq("Workbook" -> mkWorkbookStream(sheets)))

  def mkMsg(subject: String, body: String, unicode: Boolean = true): Array[Byte] = {
    val (suffix, enc) =
      if (unicode) ("001F", StandardCharsets.UTF_16LE)
      else ("001E", java.nio.charset.Charset.forName("windows-1252"))
    mkCfb(Seq(
      s"__substg1.0_0037$suffix" -> subject.getBytes(enc),
      s"__substg1.0_1000$suffix" -> body.getBytes(enc)))
  }
}
