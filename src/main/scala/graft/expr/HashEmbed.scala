package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.embed.HashEmbedder

/** Static adapter so generated code can call the stub embedder directly. */
object HashEmbedOps {
  // Embedders are tiny immutable configs; cache per (dim, seed).
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Long), HashEmbedder]()
  def embedder(dim: Int, seed: Long): HashEmbedder =
    cache.computeIfAbsent((dim, seed), _ => HashEmbedder(dim, seed))
  def embed(s: UTF8String, dim: Int, seed: Long): ArrayData =
    new GenericArrayData(embedder(dim, seed).embed(if (s == null) null else s.toString))
}

/**
 * Deterministic stub embedding as a codegen'd Catalyst expression
 * (`STRING → ARRAY<FLOAT>`), wrapping [[graft.embed.HashEmbedder]]
 * (FIXTURES.md §4). Used for the distributed embed stage in tests/benches:
 * unlike the `mapPartitions` production path it stays inside whole-stage
 * codegen, so ingest remains one fused pipeline from scan to Parquet write.
 */
case class HashEmbed(child: Expression, dim: Int = 64, seed: Long = 42L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_embed"

  override protected def nullSafeEval(s: Any): Any =
    HashEmbedOps.embed(s.asInstanceOf[UTF8String], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashEmbedOps.embed($c, $dim, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
