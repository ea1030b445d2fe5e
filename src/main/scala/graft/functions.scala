package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}

import graft.expr._

/**
 * Column-level API for the engine's custom Catalyst expressions (SURVEY
 * §2.10), mirroring the style of `org.apache.spark.sql.functions`. All of
 * these are native expressions with codegen — no Scala UDF indirection.
 *
 * `registerAll(spark)` additionally exposes them to SQL:
 * `cosine_similarity`, `cosine_distance`, `dot_product`, `l2_normalize`,
 * `l2_norm`, `normalize_text`, `normalize_query_text`, `hash_embed`,
 * `chunk_document`, `unicode_normalize`, `span_cut`, `span_mask`,
 * `split_assign`, `rendezvous_shard`.
 */
object functions {

  private def col(e: Expression): Column = Bridge.column(e)
  // Vector/string arguments are wrapped in casts so callers can pass
  // ARRAY<DOUBLE> literals etc.; Catalyst's SimplifyCasts removes the no-ops.
  private def ex(c: Column): Expression = Bridge.expression(c)
  private def fvec(e: Expression): Expression = Cast(e, ArrayType(FloatType))
  private def fvec(c: Column): Expression = fvec(ex(c))
  private def str(e: Expression): Expression = Cast(e, StringType)
  private def str(c: Column): Expression = str(ex(c))

  def cosine_similarity(a: Column, b: Column): Column = col(CosineSimilarity(fvec(a), fvec(b)))
  def cosine_distance(a: Column, b: Column): Column = col(CosineDistance(fvec(a), fvec(b)))
  def dot_product(a: Column, b: Column): Column = col(DotProduct(fvec(a), fvec(b)))
  def l2_normalize(a: Column): Column = col(L2Normalize(fvec(a)))
  def l2_norm(a: Column): Column = col(L2Norm(fvec(a)))

  /** cid of the nearest centroid by cosine (ties → earliest element);
    * `cents` is an `ARRAY<STRUCT<cid INT, c ARRAY<FLOAT>>>` literal. */
  def nearest_centroid(v: Column, cents: Column): Column =
    col(NearestCentroid(fvec(v), ex(cents)))

  /** Index-side text normalization (empty → null). */
  def normalize_text(c: Column, preserveWhitespace: Boolean = false): Column =
    col(NormalizeText(str(c), queryMode = false, preserveWhitespace = preserveWhitespace))

  /** Query-side text normalization (empty → " "). */
  def normalize_query_text(c: Column): Column =
    col(NormalizeText(str(c), queryMode = true))

  /** Unicode normal-form normalization (corpus hygiene before hashing/
    * dedup); `form` ∈ NFC | NFD | NFKC | NFKD. */
  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    col(UnicodeNormalize(str(c), form))

  /** Deterministic stub embedding (FIXTURES.md §4). */
  def hash_embed(c: Column, dim: Int = 64, seed: Long = 42L): Column =
    col(HashEmbed(str(c), dim, seed))

  /** Generator: explodes a document into chunk rows
    * (`chunk_text, chunk_index, page_number`). */
  def chunk_document(text: Column, chunkSize: Column, overlap: Column): Column =
    col(ChunkDocument(ex(text), ex(chunkSize), ex(overlap)))

  /** Register all custom expressions as SQL functions on this session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => CosineSimilarity(fvec(es(0)), fvec(es(1))), "built-in")
    reg.createOrReplaceTempFunction("cosine_distance",
      es => CosineDistance(fvec(es(0)), fvec(es(1))), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(fvec(es(0)), fvec(es(1))), "built-in")
    reg.createOrReplaceTempFunction("l2_normalize",
      es => L2Normalize(fvec(es.head)), "built-in")
    reg.createOrReplaceTempFunction("l2_norm",
      es => L2Norm(fvec(es.head)), "built-in")
    reg.createOrReplaceTempFunction("nearest_centroid",
      es => NearestCentroid(fvec(es(0)), es(1)), "built-in")
    reg.createOrReplaceTempFunction("normalize_text",
      es => NormalizeText(str(es.head)), "built-in")
    reg.createOrReplaceTempFunction("normalize_query_text",
      es => NormalizeText(str(es.head), queryMode = true), "built-in")
    reg.createOrReplaceTempFunction("hash_embed",
      es => HashEmbed(str(es.head)), "built-in")
    reg.createOrReplaceTempFunction("chunk_document",
      es => ChunkDocument(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(str(es.head)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash(str(es.head)), "built-in")
    reg.createOrReplaceTempFunction("lsh_bucket",
      es => LshBucket(fvec(es.head)), "built-in")
    reg.createOrReplaceTempFunction("unicode_normalize",
      es => UnicodeNormalize(str(es.head),
        UnicodeNormalize.resolveFormArg(es.lift(1))), "built-in")
    val spansType = ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.IntegerType))))
    reg.createOrReplaceTempFunction("span_cut",
      es => SpanCut(str(es(0)), Cast(es(1), spansType)), "built-in")
    reg.createOrReplaceTempFunction("span_mask",
      es => SpanMask(str(es(0)), Cast(es(1), spansType),
        SpanMask.resolveSentinelArg(es.lift(2))), "built-in")
    reg.createOrReplaceTempFunction("split_assign",
      es => CurationExprs.splitAssign(str(es.head),
        intArg("split_assign", es.lift(1), 90),
        intArg("split_assign", es.lift(2), 5)), "built-in")
    reg.createOrReplaceTempFunction("rendezvous_shard",
      es => CurationExprs.rendezvousShard(str(es.head),
        intArg("rendezvous_shard", es.lift(1), -1)), "built-in")
    reg.createOrReplaceTempFunction("cross_fold",
      es => CurationExprs.crossFold(str(es.head),
        intArg("cross_fold", es.lift(1), -1)), "built-in")
    reg.createOrReplaceTempFunction("word_noise",
      es => CurationExprs.wordNoise(es(0), str(es(1)),
        intArg("word_noise", es.lift(2), -1)), "built-in")
    reg.createOrReplaceTempFunction("token_truncate",
      es => CurationExprs.tokenTruncate(str(es.head),
        intArg("token_truncate", es.lift(1), -1),
        strArg("token_truncate", es.lift(2), "head")), "built-in")
    reg.createOrReplaceTempFunction("sentence_split",
      es => CurationExprs.sentenceSplit(str(es.head)), "built-in")
  }

  /** Literal-integer argument of a SQL function call (percentages, shard
    * counts — parameters the Column API takes as Scala Ints). Explicit
    * error on non-literals, the `resolveFormArg` stance; `default` < 0
    * means the argument is required. */
  private def intArg(fn: String, e: Option[Expression], default: Int): Int =
    e match {
      case None if default >= 0 => default
      case None =>
        throw new IllegalArgumentException(s"$fn: missing required literal integer argument")
      case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
      case Some(other) =>
        throw new IllegalArgumentException(
          s"$fn expects a literal integer argument, got: $other")
    }

  /** Literal-string argument (strategy names and the like). */
  private def strArg(fn: String, e: Option[Expression], default: String): String =
    e match {
      case None => default
      case Some(org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.unsafe.types.UTF8String, _)) => v.toString
      case Some(other) =>
        throw new IllegalArgumentException(
          s"$fn expects a literal string argument, got: $other")
    }
}
