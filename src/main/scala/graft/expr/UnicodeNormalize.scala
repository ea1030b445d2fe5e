package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normal-form normalization (NFC/NFD/NFKC/NFKD) as a native
 * codegen expression — the standalone corpus-hygiene normalizer a crawl
 * pipeline runs before hashing or deduplicating text (mixed normal forms
 * make byte-identical content hash differently). Spark ships no built-in
 * for this; a native expression keeps it inside whole-stage codegen.
 *
 * Distinct from [[NormalizeText]] (the reference's index/query cleaner,
 * which folds NFKC into codepoint-class filtering — see
 * `/root/reference/utilities_core.py:240-243`): this one changes the
 * normal form and nothing else.
 *
 * Fast path: most corpus text is already normalized, so
 * `Normalizer.isNormalized` (a scan, no allocation) guards the rebuild
 * and the common row returns its input `UTF8String` untouched.
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // Fail at plan time, not per row, on a bad form name.
  private val formOrdinal: Int = Normalizer.Form.valueOf(form).ordinal

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def eval(input: InternalRow): Any =
    UnicodeNormalize.normalizeUTF8(
      child.eval(input).asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        UTF8String ${ev.value} = graft.expr.UnicodeNormalize.normalizeUTF8(
          ${c.isNull} ? null : ${c.value}, $formOrdinal);
        boolean ${ev.isNull} = ${ev.value} == null;
        if (${ev.isNull}) { ${ev.value} = UTF8String.EMPTY_UTF8; }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnicodeNormalize {

  private val FORMS: Array[Normalizer.Form] = Normalizer.Form.values

  /** Resolve the SQL registration paths' optional `form` argument (shared
    * by `GraftExtensions` and `functions.registerAll` so the two can't
    * drift): absent → NFC; otherwise a foldable non-null string literal.
    * Non-foldable or NULL forms fail at analysis time with a clear
    * message — the earlier silent-NFC fallback masked caller bugs and a
    * foldable NULL literal NPE'd in `eval().toString`. */
  def resolveFormArg(arg: Option[Expression]): String = arg match {
    case None => "NFC"
    case Some(f) if f.foldable =>
      val v = f.eval()
      if (v == null) throw new IllegalArgumentException(
        "unicode_normalize: `form` must be a non-null string literal " +
          "(NFC | NFD | NFKC | NFKD), got NULL")
      v.toString
    case Some(_) => throw new IllegalArgumentException(
      "unicode_normalize: `form` must be a foldable string literal " +
        "(NFC | NFD | NFKC | NFKD), got a non-constant expression")
  }

  /** Null-safe kernel shared by eval and codegen. */
  def normalizeUTF8(u: UTF8String, formOrdinal: Int): UTF8String = {
    if (u == null) return null
    val f = FORMS(formOrdinal)
    val s = u.toString
    if (Normalizer.isNormalized(s, f)) u
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }
}
