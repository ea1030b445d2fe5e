package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Row-expanding chunker (SURVEY §2.10 `ChunkDocument`): a Catalyst
 * `Generator` — one document row in, N chunk rows out — so chunking runs
 * inside `GenerateExec` without materializing a per-document array first
 * (SURVEY §7.3). Output columns: `chunk_text STRING, chunk_index INT,
 * page_number INT` (page null for documents without `[[pageN]]` markers).
 *
 * Replaces `FixedSizeTextSplitter` + `add_pymupdf_page_metadata`
 * (`/root/reference/document_processor.py:368-477`); see [[Chunker]].
 */
case class ChunkDocument(text: Expression, chunkSize: Expression, overlap: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, chunkSize, overlap)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_text", StringType, nullable = false),
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("page_number", IntegerType, nullable = true)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (text.dataType == StringType &&
        chunkSize.dataType == IntegerType && overlap.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"chunk_document(STRING, INT, INT), got " +
          s"(${text.dataType.sql}, ${chunkSize.dataType.sql}, ${overlap.dataType.sql})")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val size = chunkSize.eval(input).asInstanceOf[Int]
    val ov = overlap.eval(input).asInstanceOf[Int]
    Chunker.chunk(t.asInstanceOf[UTF8String].toString, size, ov).map { p =>
      InternalRow(UTF8String.fromString(p.text), p.index,
        p.page.map(Int.box).orNull)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), chunkSize = newChildren(1), overlap = newChildren(2))
}
