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
}
