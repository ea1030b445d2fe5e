package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expression for [[TextNorm]] (SURVEY §2.10): NFKC + codepoint-class
 * filtering is not expressible with Spark built-ins, so it is a native
 * expression with codegen (one static call per row inside whole-stage
 * codegen) rather than a Scala UDF.
 *
 * `queryMode = false` → index-side cleaner (empty → null, per
 * `/root/reference/utilities_core.py:240-243`); `queryMode = true` →
 * query-side cleaner (empty → " ", `/root/reference/embedding_models.py:85`).
 */
case class NormalizeText(
    child: Expression,
    queryMode: Boolean = false,
    preserveWhitespace: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = !queryMode
  override def prettyName: String = "normalize_text"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextNorm.normalizeUTF8(
      child.eval(input).asInstanceOf[UTF8String], queryMode, preserveWhitespace)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val in = ctx.freshName("normIn")
    val code =
      code"""
        ${c.code}
        UTF8String $in = ${c.isNull} ? null : ${c.value};
        UTF8String ${ev.value} = graft.expr.TextNorm.normalizeUTF8(
          $in, $queryMode, $preserveWhitespace);
        boolean ${ev.isNull} = ${ev.value} == null;
        if (${ev.isNull}) { ${ev.value} = UTF8String.EMPTY_UTF8; }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
