package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate: ordering is (sim DESC, id ASC) everywhere. */
case class TopKEntry(id: Long, sim: Double)

/** Bounded top-k buffer: parallel arrays sorted by (sim DESC, id ASC),
  * length ≤ k. Kept as a case class so Spark's ObjectHashAggregate holds it
  * as a live object between rows and only encodes it at the shuffle
  * boundary. */
case class TopKBuf(ids: Array[Long], sims: Array[Double])

/**
 * Scale-safe grouped top-k: a typed [[Aggregator]] whose partial (map-side)
 * state is a bounded sorted buffer. Replaces the
 * `row_number() OVER (PARTITION BY query_id ORDER BY sim DESC)` shape,
 * whose single-task-per-group sort of ALL candidate rows is the classic
 * 100 TB scale-killer: with the aggregator, each input partition reduces to
 * ≤ k rows per group before the exchange, so the shuffle carries at most
 * `partitions × groups × k` tiny structs and no full sort ever happens.
 *
 * Rows ≥ the current kth are rejected with one comparison; accepted rows
 * insert by binary search + copy (k is small). `merge` is a bounded
 * sorted-merge. Ties order by ascending id — identical to the window
 * formulation it replaces.
 */
final class TopKAggregator(k: Int)
    extends Aggregator[TopKEntry, TopKBuf, Seq[TopKEntry]] {

  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopKBuf = TopKBuf(Array.emptyLongArray, Array.emptyDoubleArray)

  override def reduce(b: TopKBuf, e: TopKEntry): TopKBuf = {
    if (k <= 0) return b // k=0 keeps the window formulation's empty result
    val n = b.ids.length
    if (n == k && !beats(e.sim, e.id, b.sims(n - 1), b.ids(n - 1))) return b
    var lo = 0
    var hi = n
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (beats(b.sims(m), b.ids(m), e.sim, e.id)) lo = m + 1 else hi = m
    }
    val outN = math.min(n + 1, k)
    val ids = new Array[Long](outN)
    val sims = new Array[Double](outN)
    System.arraycopy(b.ids, 0, ids, 0, lo)
    System.arraycopy(b.sims, 0, sims, 0, lo)
    ids(lo) = e.id
    sims(lo) = e.sim
    val tail = outN - lo - 1
    if (tail > 0) {
      System.arraycopy(b.ids, lo, ids, lo + 1, tail)
      System.arraycopy(b.sims, lo, sims, lo + 1, tail)
    }
    TopKBuf(ids, sims)
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    if (b.ids.isEmpty) return a
    if (a.ids.isEmpty) return b
    val outN = math.min(a.ids.length + b.ids.length, k)
    val ids = new Array[Long](outN)
    val sims = new Array[Double](outN)
    var i = 0
    var j = 0
    var o = 0
    while (o < outN) {
      val takeA = j >= b.ids.length ||
        (i < a.ids.length && beats(a.sims(i), a.ids(i), b.sims(j), b.ids(j)))
      if (takeA) { ids(o) = a.ids(i); sims(o) = a.sims(i); i += 1 }
      else { ids(o) = b.ids(j); sims(o) = b.sims(j); j += 1 }
      o += 1
    }
    TopKBuf(ids, sims)
  }

  override def finish(b: TopKBuf): Seq[TopKEntry] =
    b.ids.indices.map(i => TopKEntry(b.ids(i), b.sims(i)))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
}

object TopK {

  /** `top_k(id, sim)` aggregate column: ordered `ARRAY<STRUCT<id, sim>>` of
    * the group's k best by (sim DESC, id ASC). */
  def top_k(k: Int, id: Column, sim: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[TopKEntry])(id, sim)

  /** Per-group top-k of a scored relation: `groupCols` grouping, candidates
    * `(idCol, simCol)` → `(…groupCols, id, sim, rnk)` with `rnk` 1-based in
    * (sim DESC, id ASC) order. One aggregation, no window: partial buffers
    * cap map output at k rows per group per partition. */
  def perGroup(scored: DataFrame, groupCols: Seq[Column], idCol: Column,
      simCol: Column, k: Int): DataFrame =
    scored
      .groupBy(groupCols: _*)
      .agg(top_k(k, idCol.cast("long"), simCol.cast("double")).as("hits"))
      .select(col("*"), posexplode(col("hits")))
      .select((groupCols :+ (col("pos") + 1).as("rnk") :+
        col("col.id").as("id") :+ col("col.sim").as("sim")): _*)
}
