package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, StringType, StructField, StructType}

import graft.expr._

/**
 * `SparkSessionExtensions` entry point: makes every graft expression a
 * session-native SQL function without any `registerAll` call —
 *
 * {{{
 * SparkSession.builder()
 *   .config("spark.sql.extensions", "graft.GraftExtensions")
 *   ...
 * spark.sql("SELECT cosine_similarity(embedding, array(...)) FROM t")
 * }}}
 *
 * This is the deployment-grade registration path (cluster-wide via config,
 * works from pure SQL / Thrift server); `graft.functions.registerAll`
 * remains for ad-hoc sessions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fvec(e: Expression): Expression = Cast(e, ArrayType(FloatType))
  private def str(e: Expression): Expression = Cast(e, StringType)
  private val spansType = ArrayType(StructType(Seq(
    StructField("s", IntegerType), StructField("e", IntegerType))))

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** Wrong-arity calls must fail as a clear signature error from the
    * function builder, not an IndexOutOfBoundsException from `es(i)` —
    * the [[graft.expr.UnicodeNormalize.resolveFormArg]] explicit-error
    * stance, applied to every positionally-indexed builder here. */
  private def arity(name: String, sig: String, es: Seq[Expression],
      min: Int, max: Int): Seq[Expression] = {
    if (es.length < min || es.length > max)
      throw new IllegalArgumentException(
        s"$name expects ${if (min == max) s"$min argument(s)"
          else s"$min to $max arguments"}, got ${es.length}; usage: $sig")
    es
  }

  /** Literal-integer SQL argument (the Column API takes these as Scala
    * Ints); explicit error on non-literals, `default` < 0 = required. */
  private def literalInt(fn: String, e: Option[Expression], default: Int): Int =
    e match {
      case None if default >= 0 => default
      case None => throw new IllegalArgumentException(
        s"$fn: missing required literal integer argument")
      case Some(Literal(v: Int, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"$fn expects a literal integer argument, got: $other")
    }

  /** Literal-string SQL argument (strategy names and the like). */
  private def literalString(fn: String, e: Option[Expression],
      default: String): String =
    e match {
      case None => default
      case Some(Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
        v.toString
      case Some(other) => throw new IllegalArgumentException(
        s"$fn expects a literal string argument, got: $other")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float vectors"),
      (es: Seq[Expression]) => { arity("cosine_similarity", "cosine_similarity(a, b)", es, 2, 2); CosineSimilarity(fvec(es(0)), fvec(es(1))) }))
    ext.injectFunction((FunctionIdentifier("cosine_distance"),
      info("cosine_distance", "cosine_distance(a, b) - 1 - cosine similarity"),
      (es: Seq[Expression]) => { arity("cosine_distance", "cosine_distance(a, b)", es, 2, 2); CosineDistance(fvec(es(0)), fvec(es(1))) }))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors"),
      (es: Seq[Expression]) => { arity("dot_product", "dot_product(a, b)", es, 2, 2); DotProduct(fvec(es(0)), fvec(es(1))) }))
    ext.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(v) - unit-normalize a float vector"),
      (es: Seq[Expression]) => L2Normalize(fvec(es.head))))
    ext.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(v) - euclidean norm"),
      (es: Seq[Expression]) => L2Norm(fvec(es.head))))
    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(s) - index-side unicode cleanup"),
      (es: Seq[Expression]) => NormalizeText(str(es.head))))
    ext.injectFunction((FunctionIdentifier("normalize_query_text"),
      info("normalize_query_text", "normalize_query_text(s) - query-side cleanup"),
      (es: Seq[Expression]) => NormalizeText(str(es.head), queryMode = true)))
    ext.injectFunction((FunctionIdentifier("hash_embed"),
      info("hash_embed", "hash_embed(s) - deterministic 64-dim stub embedding"),
      (es: Seq[Expression]) => HashEmbed(str(es.head))))
    ext.injectFunction((FunctionIdentifier("chunk_document"),
      info("chunk_document", "chunk_document(text, size, overlap) - chunk rows"),
      (es: Seq[Expression]) => { arity("chunk_document", "chunk_document(text, size, overlap)", es, 3, 3); ChunkDocument(es(0), es(1), es(2)) }))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(s) - 64-hash MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(str(es.head))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(s) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHash(str(es.head))))
    ext.injectFunction((FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket", "lsh_bucket(v) - sign-LSH bucket of a float vector"),
      (es: Seq[Expression]) => LshBucket(fvec(es.head))))
    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(s[, form]) - NFC/NFD/NFKC/NFKD normal form (default NFC)"),
      (es: Seq[Expression]) => { arity("unicode_normalize", "unicode_normalize(s[, form])", es, 1, 2); UnicodeNormalize(str(es.head),
        UnicodeNormalize.resolveFormArg(es.lift(1))) }))
    ext.injectFunction((FunctionIdentifier("span_cut"),
      info("span_cut",
        "span_cut(text, spans) - cut [s,e) token intervals; struct(n_tokens, n_removed, text)"),
      (es: Seq[Expression]) => { arity("span_cut", "span_cut(text, spans)", es, 2, 2); SpanCut(str(es(0)), Cast(es(1), spansType)) }))
    ext.injectFunction((FunctionIdentifier("span_mask"),
      info("span_mask",
        "span_mask(text, spans[, sentinel]) - replace covered tokens; struct(n_tokens, n_masked, text)"),
      (es: Seq[Expression]) => { arity("span_mask", "span_mask(text, spans[, sentinel])", es, 2, 3); SpanMask(str(es(0)), Cast(es(1), spansType),
        SpanMask.resolveSentinelArg(es.lift(2))) }))
    ext.injectFunction((FunctionIdentifier("split_assign"),
      info("split_assign",
        "split_assign(key[, train_pct, val_pct]) - content-keyed train/val/test label (md5 bucket)"),
      (es: Seq[Expression]) => { arity("split_assign",
        "split_assign(key[, train_pct, val_pct])", es, 1, 3)
        CurationExprs.splitAssign(str(es.head),
          literalInt("split_assign", es.lift(1), 90),
          literalInt("split_assign", es.lift(2), 5)) }))
    ext.injectFunction((FunctionIdentifier("cross_fold"),
      info("cross_fold",
        "cross_fold(key, k) - content-addressed k-fold bucket (md5, in [0, k))"),
      (es: Seq[Expression]) => { arity("cross_fold",
        "cross_fold(key, k)", es, 2, 2)
        CurationExprs.crossFold(str(es.head),
          literalInt("cross_fold", es.lift(1), -1)) }))
    ext.injectFunction((FunctionIdentifier("rendezvous_shard"),
      info("rendezvous_shard",
        "rendezvous_shard(key, n_shards) - highest-random-weight shard id"),
      (es: Seq[Expression]) => { arity("rendezvous_shard",
        "rendezvous_shard(key, n_shards)", es, 2, 2)
        CurationExprs.rendezvousShard(str(es.head),
          literalInt("rendezvous_shard", es.lift(1), -1)) }))
    ext.injectFunction((FunctionIdentifier("word_noise"),
      info("word_noise",
        "word_noise(id, text, pct) - BART token-deletion noising; struct(n_tokens, n_deleted, noised_text)"),
      (es: Seq[Expression]) => { arity("word_noise",
        "word_noise(id, text, pct)", es, 3, 3)
        CurationExprs.wordNoise(es(0), str(es(1)),
          literalInt("word_noise", es.lift(2), -1)) }))
    ext.injectFunction((FunctionIdentifier("token_truncate"),
      info("token_truncate",
        "token_truncate(text, budget[, strategy]) - token-budget truncation (head|tail|both); struct(kept_text, n_tokens, n_kept, truncated)"),
      (es: Seq[Expression]) => { arity("token_truncate",
        "token_truncate(text, budget[, strategy])", es, 2, 3)
        CurationExprs.tokenTruncate(str(es.head),
          literalInt("token_truncate", es.lift(1), -1),
          literalString("token_truncate", es.lift(2), "head")) }))
    ext.injectFunction((FunctionIdentifier("sentence_split"),
      info("sentence_split",
        "sentence_split(text) - trimmed non-empty sentence segments as array<string>"),
      (es: Seq[Expression]) => { arity("sentence_split",
        "sentence_split(text)", es, 1, 1)
        CurationExprs.sentenceSplit(str(es.head)) }))
    ext.injectFunction((FunctionIdentifier("nearest_centroid"),
      info("nearest_centroid",
        "nearest_centroid(v, cents) - argmax-cosine centroid id"),
      (es: Seq[Expression]) => { arity("nearest_centroid", "nearest_centroid(v, cents)", es, 2, 2); NearestCentroid(fvec(es(0)),
        // SQL literals arrive as decimal/double structs: coerce to the
        // expression's exact centroid-frame type
        Cast(es(1), ArrayType(StructType(Seq(
          StructField("cid", IntegerType),
          StructField("centroid", ArrayType(FloatType))))))) }))
  }
}
