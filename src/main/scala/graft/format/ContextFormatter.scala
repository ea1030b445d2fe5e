package graft.format

import java.util.regex.Pattern

/**
 * Context-block formatting (SURVEY §2.2 O9/O10), re-expressing
 * `/root/reference/vector_db_query.py:61-74`: per-hit cleanup regexes, then
 * a `CONTEXT {i} | {file_name}` banner between 80-dash rules.
 */
object ContextFormatter {

  private val indentedBlank = Pattern.compile("\\n[ \\t]+\\n")
  private val blankRuns = Pattern.compile("\\n\\s*\\n\\s*\\n*")
  private val rule = "-" * 80

  /** O9: collapse indented blank lines, then any blank-line run, on the
    * stripped text. */
  def cleanContext(context: String): String = {
    val a = indentedBlank.matcher(context).replaceAll("\n\n")
    blankRuns.matcher(a.strip()).replaceAll("\n\n")
  }

  /** O10: numbered banner blocks, newline-joined. */
  def formatBlocks(hits: Seq[(String, String)]): String =
    hits.zipWithIndex.map { case ((context, fileName), i) =>
      s"$rule\nCONTEXT ${i + 1} | ${if (fileName == null) "Unknown" else fileName}\n$rule\n${cleanContext(context)}\n"
    }.mkString("\n")
}
