package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared typing for expressions over `ARRAY<FLOAT>` vectors. Callers build
  * these through [[graft.functions]], which inserts casts to
  * `ARRAY<FLOAT>`; the check here only guards hand-built plans. */
private[graft] trait VectorTyped { self: Expression =>
  protected def vectorChildren: Seq[Expression]
  def checkVectorTypes(): TypeCheckResult = {
    val bad = vectorChildren.filterNot(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected ARRAY<FLOAT> arguments, got ${bad.map(_.dataType.sql).mkString(", ")}")
  }
}

/**
 * Cosine similarity of two `ARRAY<FLOAT>` vectors → DOUBLE.
 *
 * Spark 4 has no vector-distance built-in (SURVEY §7.3), so this is a native
 * Catalyst expression with codegen: inside whole-stage codegen it compiles to
 * one static call per row, keeping the brute-force FLAT scan
 * (`/root/reference/vector_db_query.py:163`) a single fused loop over the
 * Parquet scan.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorTyped {

  override protected def vectorChildren: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine distance (`1 - cosine`), the reference FLAT index metric
  * (`/root/reference/vector_db_creator.py:337-344`). */
case class CosineDistance(left: Expression, right: Expression)
    extends BinaryExpression with VectorTyped {

  override protected def vectorChildren: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineDistance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.cosineDistance($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product of two `ARRAY<FLOAT>` vectors → DOUBLE. For pre-L2-normalized
  * vectors `1 - dot` equals cosine distance (SURVEY §2.2 O15). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorTyped {

  override protected def vectorChildren: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Nearest-centroid assignment: `cid` (INT) of the centroid in
 * `centroids: ARRAY<STRUCT<cid INT, c ARRAY<FLOAT>>>` with maximal cosine
 * similarity to `vector` — ties keep the earliest element. Built for IVF
 * cluster assignment ([[graft.ops.Ivf.assignClusters]]): the centroid array
 * is a driver-built literal (k×dim floats), so assignment of a 100 TB table
 * is a pure per-row projection — zero exchanges, one output row per input
 * row — where a join+re-aggregation formulation would shuffle the corpus.
 */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with VectorTyped {

  override protected def vectorChildren: Seq[Expression] = Seq(left)
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = checkVectorTypes()
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else right.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
          fs(0).dataType == IntegerType &&
          (fs(1).dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected ARRAY<STRUCT<INT, ARRAY<FLOAT>>> centroids, got ${other.sql}")
    }
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.nearestCentroid(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorOps.nearestCentroid($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2-normalization of an `ARRAY<FLOAT>` vector (zero vector → zeros), the
  * engine-side equivalent of the reference's embedding normalization
  * (`/root/reference/embedding_models.py:437`). */
case class L2Normalize(child: Expression)
    extends UnaryExpression with VectorTyped {

  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.l2Normalize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorOps.l2Normalize($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Euclidean norm of an `ARRAY<FLOAT>` vector → DOUBLE. */
case class L2Norm(child: Expression)
    extends UnaryExpression with VectorTyped {

  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_norm"

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.l2Norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VectorOps.l2Norm($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
