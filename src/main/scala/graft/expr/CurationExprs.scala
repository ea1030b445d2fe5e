package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{LongType, StringType}

/**
 * Raw-Catalyst twins of the [[graft.ops.Curation]] Column rules that SQL
 * registration needs: a function-registry builder must return a tree the
 * analyzer can resolve in place, and a `Column`-API composition arrives as
 * an opaque `ColumnNodeExpression` (Unevaluable) there — so these build
 * the SAME operator trees (`conv(substring(md5(cast(key)),1,15),16,10)`
 * md5 buckets, struct-max rendezvous weights) from resolved expression
 * classes. Value-parity with the Column forms is spec-asserted
 * (ExtensionsAndClusterSpec).
 */
object CurationExprs {

  /** `PortableHash.hex15Col` as a raw tree: 60-bit md5 prefix as bigint. */
  private def hex15(e: Expression): Expression =
    Cast(Conv(Substring(Md5(Cast(e, StringType)), Literal(1), Literal(15)),
      Literal(16), Literal(10)), LongType)

  /** [[graft.ops.Curation.splitAssign]]: md5 bucket in [0,100) →
    * train/val/test label. */
  def splitAssign(key: Expression, trainPct: Int, valPct: Int): Expression = {
    val bucket = Remainder(hex15(key), Literal(100L))
    CaseWhen(Seq(
      (LessThan(bucket, Literal(trainPct.toLong)), Literal("train")),
      (LessThan(bucket, Literal((trainPct + valPct).toLong)), Literal("val"))),
      Literal("test"))
  }

  /** [[graft.ops.Curation.crossFold]]: md5 bucket in [0, k) — the
    * content-addressed k-fold id. */
  def crossFold(key: Expression, k: Int): Expression = {
    require(k >= 2, "cross_fold: k >= 2")
    Pmod(hex15(key), Literal(k.toLong))
  }

  /** [[graft.ops.Curation.rendezvousShard]]: argmax over shards of
    * `hex15(s ++ ":" ++ key)` — unrolled at plan time (`nShards` is a SQL
    * literal), max via lexicographic struct ordering (ties toward the
    * larger shard id, same as the Column form's array_max). */
  def rendezvousShard(key: Expression, nShards: Int): Expression = {
    require(nShards >= 1, "nShards must be >= 1")
    val k = Cast(key, StringType)
    val weighted = (0 until nShards).map { s =>
      CreateStruct(Seq(
        hex15(ConcatWs(Seq(Literal(":"), Literal(s.toString), k))),
        Literal(s)))
    }
    val best =
      if (nShards == 1) weighted.head
      else Greatest(weighted)
    GetStructField(best, 1)
  }

  /** Whitespace tokenization as a raw tree:
    * `array_remove(split(trim(s), "\s+"), "")` — the shared kernel of
    * every token-level Curation rule. */
  private def tokens(text: Expression): Expression =
    ArrayRemove(StringSplit(StringTrim(Cast(text, StringType)),
      Literal("\\s+"), Literal(-1)), Literal(""))

  private def lambdaVar(name: String): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq(name))

  private def namedStruct(fields: (String, Expression)*): Expression =
    CreateNamedStruct(fields.flatMap { case (n, e) =>
      Seq(Literal(n), e) })

  /** [[graft.ops.Curation.wordNoise]]: BART token-deletion noising —
    * each token deletes on md5(`"noise:" id ":" pos`) % 100 < pct, the
    * first always survives. `struct(n_tokens, n_deleted, noised_text)`. */
  def wordNoise(id: Expression, text: Expression, pct: Int): Expression = {
    require(pct >= 0 && pct <= 100, "word_noise: pct must be in [0, 100]")
    val toks = tokens(text)
    val x = lambdaVar("wn_x")
    val i = lambdaVar("wn_i")
    val keep = Or(EqualTo(i, Literal(0)),
      GreaterThanOrEqual(
        Remainder(hex15(Concat(Seq(Literal("noise:"),
          Cast(Cast(id, LongType), StringType), Literal(":"),
          Cast(i, StringType)))), Literal(100L)),
        Literal(pct.toLong)))
    val kept = ArrayFilter(toks, LambdaFunction(keep, Seq(x, i)))
    namedStruct(
      "n_tokens" -> Cast(Size(toks), LongType),
      "n_deleted" -> Cast(Subtract(Size(toks), Size(kept)), LongType),
      "noised_text" -> ConcatWs(Literal(" ") +: Seq(kept)))
  }

  /** [[graft.ops.Curation.tokenBudgetTruncate]]: keep the first `budget`
    * tokens (`head`), the last (`tail`), or both halves joined by an
    * ellipsis token (`both`).
    * `struct(kept_text, n_tokens, n_kept, truncated)`. */
  def tokenTruncate(text: Expression, budget: Int,
      strategy: String): Expression = {
    require(budget >= 2, "token_truncate: budget must be >= 2")
    require(Set("head", "tail", "both")(strategy),
      s"token_truncate: unknown strategy '$strategy' (head|tail|both)")
    val toks = tokens(text)
    val n = Size(toks)
    val kept = strategy match {
      case "head" => Slice(toks, Literal(1), Literal(budget))
      case "tail" => Slice(toks, Literal(-budget), Literal(budget))
      case "both" =>
        val h = budget / 2
        val t = budget - h - 1 // one slot spent on the ellipsis token
        Concat(Seq(Slice(toks, Literal(1), Literal(h)),
          CreateArray(Seq(Literal("…"))),
          Slice(toks, Literal(-t), Literal(t))))
    }
    val within = LessThanOrEqual(n, Literal(budget))
    namedStruct(
      "kept_text" -> CaseWhen(
        Seq((within, ConcatWs(Literal(" ") +: Seq(toks)))),
        ConcatWs(Literal(" ") +: Seq(kept))),
      "n_tokens" -> Cast(n, LongType),
      "n_kept" -> Cast(CaseWhen(Seq((within, n)),
        Least(Seq(Literal(budget), n))), LongType),
      "truncated" -> GreaterThan(n, Literal(budget)))
  }

  /** [[graft.ops.TextAnalysis.sentenceSplit]]'s segmenter: non-empty
    * trimmed `[^.!?]+[.!?]*` runs as `array<string>` (explode is the
    * caller's choice — a scalar SQL function cannot generate rows). */
  def sentenceSplit(text: Expression): Expression = {
    val raw = RegExpExtractAll(Cast(text, StringType),
      Literal("[^.!?]+[.!?]*"), Literal(0))
    val t = lambdaVar("ss_t")
    val trimmed = ArrayTransform(raw,
      LambdaFunction(StringTrim(t), Seq(t)))
    val f = lambdaVar("ss_f")
    ArrayFilter(trimmed,
      LambdaFunction(Not(EqualTo(f, Literal(""))), Seq(f)))
  }
}
