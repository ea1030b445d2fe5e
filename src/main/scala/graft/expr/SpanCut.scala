package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel so generated code calls one compiled method per row. */
object SpanCutOps {
  /** Cut `[s, e)` token intervals out of `text` and rebuild it — the
    * row-local tail of [[graft.ops.Dedup.stripDuplicateSpans]]. Returns
    * `(n_tokens, n_removed, text)` as an InternalRow. `spans` is the
    * doc's `array<struct<s:int,e:int>>` (null = nothing to cut); the
    * mask pass is O(tokens + Σ span length), independent of how many
    * spans cover a token — the shape an interpreted `filter`/`exists`
    * HOF pair (O(tokens × spans), out of codegen) can't give. */
  def cut(text: UTF8String, spans: ArrayData): InternalRow = {
    val tk = text.toString.split("\\s+").filter(_.nonEmpty)
    val covered = new Array[Boolean](tk.length)
    if (spans != null) {
      var si = 0
      while (si < spans.numElements()) {
        val sp = spans.getStruct(si, 2)
        var i = math.max(sp.getInt(0), 0)
        val e = math.min(sp.getInt(1), tk.length)
        while (i < e) { covered(i) = true; i += 1 }
        si += 1
      }
    }
    val kept = new java.lang.StringBuilder
    var nKept = 0L
    var i = 0
    while (i < tk.length) {
      if (!covered(i)) {
        if (nKept > 0) kept.append(' ')
        kept.append(tk(i))
        nKept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](tk.length.toLong, tk.length - nKept,
      UTF8String.fromString(kept.toString)))
  }

  /** Masking sibling of [[cut]]: every covered token becomes `sentinel`
    * (length-preserving — the row-local tail of
    * [[graft.ops.Dedup.maskDuplicateSpans]]). Returns
    * `(n_tokens, n_masked, text)`. */
  def mask(text: UTF8String, spans: ArrayData, sentinel: UTF8String): InternalRow = {
    val tk = text.toString.split("\\s+").filter(_.nonEmpty)
    val covered = new Array[Boolean](tk.length)
    if (spans != null) {
      var si = 0
      while (si < spans.numElements()) {
        val sp = spans.getStruct(si, 2)
        var i = math.max(sp.getInt(0), 0)
        val e = math.min(sp.getInt(1), tk.length)
        while (i < e) { covered(i) = true; i += 1 }
        si += 1
      }
    }
    val s = sentinel.toString
    val sb = new java.lang.StringBuilder
    var masked = 0L
    var i = 0
    while (i < tk.length) {
      if (i > 0) sb.append(' ')
      if (covered(i)) { sb.append(s); masked += 1 }
      else sb.append(tk(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](tk.length.toLong, masked,
      UTF8String.fromString(sb.toString)))
  }
}

/**
 * `span_cut(text, spans)` — compiled token-interval removal:
 * `STRING × ARRAY<STRUCT<s:INT,e:INT>> → STRUCT<n_tokens:BIGINT,
 * n_removed:BIGINT, text:STRING>`. Null `spans` (a doc with nothing to
 * cut — the common row after the left join with the affected-doc span
 * table) means "keep everything" rather than null-out, so the whole
 * corpus flows through one codegen'd projection; null `text` yields a
 * null result.
 */
case class SpanCut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "span_cut"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else SpanCutOps.cut(t.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val spans = ctx.freshName("spans")
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      InternalRow ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        org.apache.spark.sql.catalyst.util.ArrayData $spans =
          ${r.isNull} ? null : ${r.value};
        ${ev.value} = graft.expr.SpanCutOps.cut(${l.value}, $spans);
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanMask {
  /** Resolve the SQL registration paths' optional `sentinel` argument
    * (the [[UnicodeNormalize.resolveFormArg]] contract): absent →
    * `<DUP>`; otherwise a foldable non-null string literal — anything
    * else fails analysis instead of silently defaulting. */
  def resolveSentinelArg(arg: Option[Expression]): String = arg match {
    case None => "<DUP>"
    case Some(f) if f.foldable =>
      val v = f.eval()
      if (v == null) throw new IllegalArgumentException(
        "span_mask: `sentinel` must be a non-null string literal, got NULL")
      v.toString
    case Some(_) => throw new IllegalArgumentException(
      "span_mask: `sentinel` must be a foldable string literal, " +
        "got a non-constant expression")
  }
}

/**
 * `span_mask(text, spans)` — [[SpanCut]]'s length-preserving sibling:
 * every covered token is replaced by `sentinel` instead of removed.
 * `STRING × ARRAY<STRUCT<s:INT,e:INT>> → STRUCT<n_tokens:BIGINT,
 * n_masked:BIGINT, text:STRING>`; null-handling as [[SpanCut]].
 */
case class SpanMask(left: Expression, right: Expression, sentinel: String)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_masked", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "span_mask"

  private lazy val sentinelU = UTF8String.fromString(sentinel)

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else SpanCutOps.mask(t.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[ArrayData], sentinelU)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val spans = ctx.freshName("spans")
    val sref = ctx.addReferenceObj("sentinel", sentinelU,
      classOf[UTF8String].getName)
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      InternalRow ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        org.apache.spark.sql.catalyst.util.ArrayData $spans =
          ${r.isNull} ? null : ${r.value};
        ${ev.value} = graft.expr.SpanCutOps.mask(${l.value}, $spans, $sref);
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
