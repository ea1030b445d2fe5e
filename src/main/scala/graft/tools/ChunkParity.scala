package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.expr.Chunker

/** JVM side of the chunker parity fuzz (tools/chunk_parity.py): reads JSON
  * cases `{text, size, overlap}` and writes `[[chunk, page|null], ...]` per
  * case. Plain JVM — no Spark session. */
object ChunkParity {
  def main(args: Array[String]): Unit = {
    val Array(inPath, outPath) = args
    val raw = new String(Files.readAllBytes(Paths.get(inPath)), StandardCharsets.UTF_8)
    val caseRe = """\{"text":\s*"((?:[^"\\]|\\.)*)",\s*"size":\s*(\d+),\s*"overlap":\s*(\d+)\}""".r
    val sb = new StringBuilder("[")
    var first = true
    for (m <- caseRe.findAllMatchIn(raw)) {
      val text = unescape(m.group(1))
      val size = m.group(2).toInt
      val overlap = m.group(3).toInt
      if (!first) sb.append(',')
      first = false
      sb.append('[')
      val pieces = Chunker.chunk(text, size, overlap)
      for ((p, i) <- pieces.zipWithIndex) {
        if (i > 0) sb.append(',')
        sb.append('[').append(jstr(p.text)).append(", ")
          .append(p.page.map(_.toString).getOrElse("null")).append(']')
      }
      sb.append(']')
    }
    sb.append(']')
    Files.write(Paths.get(outPath), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[parity] chunk results -> $outPath")
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
