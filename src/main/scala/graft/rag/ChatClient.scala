package graft.rag

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

/**
 * Completion backend for RAG chat (SURVEY §3.3), re-expressing the
 * reference's streaming call against an OpenAI-compatible endpoint
 * (`/root/reference/chat_llm.py:69-113,136-151` — LM Studio local or
 * OpenAI). Driver-side HTTP; the dataflow parts of RAG (search, contexts,
 * citations) stay in the engine.
 */
trait ChatClient {
  /** Stream a completion; `onToken` receives content deltas in order.
    * Returns the full answer. */
  def complete(system: String, user: String, onToken: String => Unit = _ => ()): String
}

/** Deterministic offline stand-in (no model endpoints in this
  * environment). */
final class EchoChatClient extends ChatClient {
  override def complete(system: String, user: String,
      onToken: String => Unit): String = {
    val answer = s"[echo] ${user.linesIterator.toSeq.lastOption.getOrElse("")}"
    answer.split(" ").foreach(t => onToken(t + " "))
    answer
  }
}

/**
 * Minimal OpenAI-compatible streaming client over `java.net.http`:
 * `POST {base}/chat/completions` with `stream: true`, parsing SSE
 * `data: {...}` lines and emitting `choices[0].delta.content` fragments.
 * JSON handling is a purpose-built escape/extract (no JSON library in the
 * environment); robust for the standard delta shape.
 */
final class OpenAiCompatibleClient(
    baseUrl: String,
    model: String,
    apiKey: Option[String] = None,
    temperature: Double = 0.1) extends ChatClient {

  private val http = HttpClient.newHttpClient()
  private val deltaContent =
    Pattern.compile("\"delta\"\\s*:\\s*\\{[^{}]*?\"content\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")

  override def complete(system: String, user: String,
      onToken: String => Unit): String = {
    val body =
      s"""{"model": ${j(model)}, "stream": true, "temperature": $temperature,
         | "messages": [{"role": "system", "content": ${j(system)}},
         |              {"role": "user", "content": ${j(user)}}]}""".stripMargin
    val reqB = HttpRequest.newBuilder(URI.create(s"$baseUrl/chat/completions"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    apiKey.foreach(k => reqB.header("Authorization", s"Bearer $k"))

    val resp = http.send(reqB.build(), HttpResponse.BodyHandlers.ofLines())
    require(resp.statusCode() == 200, s"completion endpoint returned ${resp.statusCode()}")
    val answer = new StringBuilder
    resp.body().forEach { line =>
      if (line.startsWith("data:")) {
        val payload = line.substring(5).trim
        if (payload != "[DONE]") {
          val m = deltaContent.matcher(payload)
          if (m.find()) {
            val token = unescape(m.group(1))
            answer.append(token)
            onToken(token)
          }
        }
      }
    }
    answer.toString
  }

  private def j(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
