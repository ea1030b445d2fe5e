package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.expr.TextNorm

/** JVM side of the normalization parity fuzz (tools/parity_check.py):
  * reads a JSON array of input strings, writes per-case results for the
  * three normalizer modes. Plain JVM — no Spark session needed. */
object NormParity {
  def main(args: Array[String]): Unit = {
    val Array(inPath, outPath) = args
    val raw = new String(Files.readAllBytes(Paths.get(inPath)), StandardCharsets.UTF_8)
    val cases = parseJsonStringArray(raw)
    val sb = new StringBuilder("[")
    for ((c, i) <- cases.zipWithIndex) {
      if (i > 0) sb.append(',')
      sb.append('{')
      sb.append("\"idx\": ").append(jstr(TextNorm.normalizeIndex(c, preserveWhitespace = false)))
      sb.append(", \"idx_pw\": ").append(jstr(TextNorm.normalizeIndex(c, preserveWhitespace = true)))
      sb.append(", \"q\": ").append(jstr(TextNorm.normalizeQuery(c)))
      sb.append('}')
    }
    sb.append(']')
    Files.write(Paths.get(outPath), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[parity] ${cases.length} cases -> $outPath")
  }

  private def jstr(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' || (c >= 0xD800 && c <= 0xDFFF) => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Minimal JSON string-array parser (input is machine-written). */
  private def parseJsonStringArray(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = s.indexOf('[') + 1
    while (i < s.length) {
      s.charAt(i) match {
        case '"' =>
          val sb = new StringBuilder
          i += 1
          var done = false
          while (!done) {
            s.charAt(i) match {
              case '\\' =>
                s.charAt(i + 1) match {
                  case 'u' =>
                    sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
                    i += 6
                  case 'n' => sb.append('\n'); i += 2
                  case 'r' => sb.append('\r'); i += 2
                  case 't' => sb.append('\t'); i += 2
                  case 'b' => sb.append('\b'); i += 2
                  case 'f' => sb.append('\f'); i += 2
                  case '/' => sb.append('/'); i += 2
                  case other => sb.append(other); i += 2
                }
              case '"' => done = true; i += 1
              case c => sb.append(c); i += 1
            }
          }
          out += sb.toString
        case ']' => return out.result()
        case _ => i += 1
      }
    }
    out.result()
  }
}
