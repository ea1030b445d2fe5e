package graft.rag

import org.apache.spark.sql.functions.col

import graft.format.{Citations, ContextFormatter}
import graft.model.Citation
import graft.query.Searcher

/**
 * Full RAG chat turn (SURVEY §3.3, `ask_llm` path): search → side files →
 * prompt assembly → streaming completion → citation aggregation
 * (`/root/reference/chat_llm.py:30-51,116-164`). Everything except the
 * completion call is engine dataflow.
 */
object RagChat {

  final case class Answer(text: String, contexts: Seq[String],
      citations: Seq[Citation])

  def ask(searcher: Searcher, db: String, question: String,
      p: Searcher.Params = Searcher.Params(),
      client: ChatClient = new EchoChatClient,
      onToken: String => Unit = _ => (),
      artifactsDir: Option[String] = None,
      hybrid: Boolean = false): Answer = {
    // hybrid retrieval surfaces lexical matches (exact names/ids) the
    // embedding space alone can miss; hit schema is identical either way
    val hits =
      if (hybrid) searcher.searchHybrid(db, question, p)
        .select("id", "text", "metadata", "similarity_score", "distance")
      else searcher.search(db, question, p)
    hits.cache()
    try {
      val rows = hits.select(col("text"), col("metadata.file_name")).collect()
      val contexts = rows.map(r =>
        ContextFormatter.cleanContext(r.getString(0))).toIndexedSeq
      artifactsDir.foreach(d => searcher.writeSearchArtifacts(db, question, d, p))

      val prompt = RagPrompt.assemble(question, contexts) // throws on empty (ref :43-44)
      val answer = client.complete(RagPrompt.systemMessage, prompt, onToken)
      val cits = Citations.citations(
        hits.select(col("metadata"), col("similarity_score")))
      Answer(answer, contexts, cits)
    } finally hits.unpersist()
  }
}
