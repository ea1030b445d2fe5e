package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed suffix ranking over per-document token suffixes — the
 * prefix-doubling (Manber–Myers) construction, the missing piece next to
 * the fixed-length gram machinery: once every suffix has its global
 * lexicographic rank, arbitrary-length substring questions (counts,
 * longest repeats, LCP intervals) become neighbor queries on an integer
 * table instead of per-length gram passes.
 *
 * Ordering: token sequences compare token-by-token with tokens in
 * lexicographic (binary) string order, and "end of document" before any
 * token — i.e. exactly the order of the suffixes' separator-joined
 * strings (for any separator byte below every token byte), which is what
 * the DuckDB oracle sorts.
 *
 * Scale shape: rank doubling, never string sorting — after the initial
 * token-dictionary ranking, every iteration handles only `(doc, pos,
 * rank)` longs: one equi-join to pair each suffix's rank with the rank
 * `2^k` tokens ahead, one distinct + range-sort of the (rank, rank₂)
 * pairs for the dense re-rank, one join back. Iterations stop when all
 * ranks are distinct (≤ ⌈log₂ longest-document⌉ + 1), so the corpus
 * text is touched ONCE; everything after is integer shuffles. Global
 * dense ranks come from `zipWithIndex` over a range-partitioned sort of
 * the DISTINCT keys — the rank of a key is its position in the total
 * sort order, so the result is independent of partitioning.
 */
object Suffix {

  /** Add a 0-based global dense rank (as `out`) to a DISTINCT key frame,
    * by `sortCols` order. Range-partition + local sort + zipWithIndex:
    * no single-task global sort, no window. */
  private def withDenseRank(keys: DataFrame, sortCols: Seq[Column],
      out: String): DataFrame = {
    val spark = keys.sparkSession
    val sorted = keys.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val indexed = sorted.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(indexed,
      keys.schema.add(out, org.apache.spark.sql.types.LongType))
  }

  /** `(doc_id, pos, rank)` — the global dense lexicographic rank of every
    * suffix `tokens[pos..]` of every document (0-based positions, equal
    * suffixes share a rank). The suffix ARRAY is this table ordered by
    * `rank`; `maxDoubles` caps the iteration count far above any real
    * document length (2^20 tokens). */
  def suffixRanks(df: DataFrame, idCol: Column, textCol: Column,
      maxDoubles: Int = 20): DataFrame = {
    val toks = df.select(idCol.cast("long").as("doc_id"),
        array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
      .select(col("doc_id"), posexplode(col("tk")))
      .toDF("doc_id", "pos", "tok")
    val dict = withDenseRank(toks.select("tok").distinct(),
      Seq(col("tok")), "r")
    // eager localCheckpoint, NOT persist: `cur` appears TWICE in every
    // iteration's join, so the logical plan would double per iteration —
    // Catalyst analysis time turns exponential long before execution
    // matters (the q80 duplicate-clusters pathology, same fix). The
    // checkpoint cuts each iteration to a leaf: measured 50 s → ~8 s at
    // sf0.1 for the identical result.
    var cur = toks.join(dict, "tok")
      .select(col("doc_id"), col("pos"), col("r"))
      .localCheckpoint(true)
    val total = cur.count()
    // IDENTICAL suffixes (same tokens to both ends) tie forever, so
    // "all ranks distinct" alone would spin to maxDoubles on corpora
    // with whole-suffix duplicates: once the depth covers the longest
    // document every comparison is complete and the ranks are final
    val maxDocLen =
      if (total == 0) 0L
      else toks.groupBy("doc_id").count().agg(max("count")).head().getLong(0)
    var k = 1L
    var iters = 0
    var done = total == 0
    while (!done && k < maxDocLen && iters < maxDoubles) {
      // rank 2^k tokens ahead attaches by equi-join; absent = past the
      // document end, which sorts before every real rank
      val ahead = cur.select(col("doc_id"), (col("pos") - k).as("pos"),
        col("r").as("r2"))
      val paired = cur.join(ahead, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("r"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      val distinctKeys = paired.select("r", "r2").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // the distinct-key count doubles as the early-exit test: one
      // small count instead of a second corpus-wide distinct pass
      val nKeys = distinctKeys.count()
      val keys = withDenseRank(distinctKeys, Seq(col("r"), col("r2")), "nr")
      val next = paired.join(keys, Seq("r", "r2"))
        .select(col("doc_id"), col("pos"), col("nr").as("r"))
        .localCheckpoint(true)
      distinctKeys.unpersist(blocking = false)
      cur = next
      k *= 2
      iters += 1
      done = nKeys == total // every suffix now has a unique rank
    }
    cur.select(col("doc_id"), col("pos"), col("r").as("rank"))
  }
}
