package graft.embed

/**
 * Model-family instruction prefixes (SURVEY §2.2 O6), re-expressing
 * `_get_prompt_for_family` (`/root/reference/embedding_models.py:49-63`):
 * instruction-tuned retrieval models want a query-side prefix; documents
 * embed bare. The [[HashEmbedder]] stub path omits prefixes (FIXTURES §4).
 */
object PromptPrefix {

  def forFamily(model: String, isQuery: Boolean): String = {
    if (!isQuery) return ""
    val m = if (model == null) "" else model.toLowerCase(java.util.Locale.ROOT)
    if (m.contains("qwen"))
      "Instruct: Given a web search query, retrieve relevant passages that answer the query\nQuery:"
    else if (m.contains("bge"))
      "Represent this sentence for searching relevant passages: "
    else ""
  }

  def applyTo(model: String, isQuery: Boolean, text: String): String =
    forFamily(model, isQuery) + text
}
