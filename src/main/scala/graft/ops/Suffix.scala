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
    * by `sortCols` order, returning the frame's row count alongside.
    * Range-partition + local sort, then per-partition offsets from one
    * explicit sizes job (mapPartitionsWithIndex + collect of #partitions
    * longs) — `rdd.zipWithIndex` runs the IDENTICAL internal sizes job
    * but keeps the number to itself, forcing callers that also need the
    * count (the doubling loop's early-exit test) to pay a separate
    * count() job per iteration. The index pass reuses the sizes job's
    * shuffle output (skipped stages), so exposing the count is free.
    * No single-task global sort, no window. */
  private def withDenseRankCounted(keys: DataFrame, sortCols: Seq[Column],
      out: String): (DataFrame, Long) = {
    val spark = keys.sparkSession
    val rdd = keys.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*).rdd
    val sizes = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val indexed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var idx = bc.value(i) - 1
      it.map { row =>
        idx += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
      }
    }
    (spark.createDataFrame(indexed,
      keys.schema.add(out, org.apache.spark.sql.types.LongType)),
      offsets.last)
  }

  private def withDenseRank(keys: DataFrame, sortCols: Seq[Column],
      out: String): DataFrame =
    withDenseRankCounted(keys, sortCols, out)._1

  /** `(doc_id, pos, rank)` — the global dense lexicographic rank of every
    * suffix `tokens[pos..]` of every document (0-based positions, equal
    * suffixes share a rank). The suffix ARRAY is this table ordered by
    * `rank`; `maxDoubles` caps the iteration count far above any real
    * document length (2^20 tokens). */
  def suffixRanks(df: DataFrame, idCol: Column, textCol: Column,
      maxDoubles: Int = 20): DataFrame = {
    // persist the token table: the dictionary distinct, the initial rank
    // join and the maxDocLen pass all read it — without the persist each
    // action re-splits the whole corpus (the longestSharedSpan
    // tokenize-once discipline)
    val toks = df.select(idCol.cast("long").as("doc_id"),
        array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
      .select(col("doc_id"), posexplode(col("tk")))
      .toDF("doc_id", "pos", "tok")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
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
      // ONE aggregation supplies both corpus facts: the suffix total
      // (= Σ per-doc token counts — the dict equi-join preserves every
      // token row) and the longest document. Previously two jobs
      // (cur.count() + a separate groupBy/max pass).
      // IDENTICAL suffixes (same tokens to both ends) tie forever, so
      // "all ranks distinct" alone would spin to maxDoubles on corpora
      // with whole-suffix duplicates: once the depth covers the longest
      // document every comparison is complete and the ranks are final
      val stats = toks.groupBy("doc_id").count()
        .agg(sum("count").as("t"), max("count").as("m")).head()
      val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
      val maxDocLen = if (stats.isNullAt(1)) 0L else stats.getLong(1)
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
        // the dense-rank sizes job doubles as the early-exit test — the
        // key count comes out of the pass the ranking needs anyway, so
        // each iteration runs 3 jobs (range sample, sizes, checkpoint)
        // instead of 4
        val (keys, nKeys) =
          withDenseRankCounted(distinctKeys, Seq(col("r"), col("r2")), "nr")
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
    } finally toks.unpersist(blocking = false)
  }

  /**
   * Longest repeated token run ANYWHERE in the corpus (within or across
   * documents) with its lexicographically smallest witness pair:
   * `(len, a_id, a_pos, b_id, b_pos)`, one row (empty when there are
   * fewer than two suffixes). The textbook suffix-array read-off: the
   * longest repeat is the maximum LCP of RANK-ADJACENT suffixes, so
   * after [[suffixRanks]] only n−1 neighbor pairs are ever compared —
   * against q144's cross-document doubling search this also counts
   * within-document repeats, and the two agree whenever the global
   * champion spans two documents.
   *
   * Scale shape: the neighbor join is an equi-join on the unique global
   * suffix index (the same range-sort + zipWithIndex rank, all integer
   * shuffles); the LCP pass joins each pair back to its two token
   * arrays — the one stage that ships text, ~2× the corpus, compared in
   * compiled per-partition code (never an interpreted HOF walk).
   */
  def longestRepeat(df: DataFrame, idCol: Column, textCol: Column,
      maxDoubles: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(idCol.cast("long").as("doc_id"),
      array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
    val ranks = suffixRanks(df, idCol, textCol, maxDoubles)
    // ties share a rank: (rank, doc, pos) is the unique suffix-array
    // order, and its global index makes neighbors an equi-join
    val ordered = withDenseRank(ranks,
      Seq(col("rank"), col("doc_id"), col("pos")), "idx")
    val a = ordered.select(col("idx"), col("doc_id").as("a_id"),
      col("pos").as("a_pos"))
    val b = ordered.select((col("idx") - 1).as("idx"),
      col("doc_id").as("b_id"), col("pos").as("b_pos"))
    val pairs = a.join(b, "idx")
      .join(toks.select(col("doc_id").as("a_id"), col("tk").as("ta")), "a_id")
      .join(toks.select(col("doc_id").as("b_id"), col("tk").as("tb")), "b_id")
      .select(col("a_id"), col("a_pos"), col("b_id"), col("b_pos"),
        col("ta"), col("tb"))
      .as[(Long, Int, Long, Int, Seq[String], Seq[String])]
    // checkpoint the small integer LCP frame: it feeds BOTH the max
    // aggregate and the witness join, and recomputing it would re-run
    // the token-shipping joins and the whole ranking twice
    val lcps = pairs.mapPartitions { it =>
      it.map { case (aId, aPos, bId, bPos, ta, tb) =>
        val n = math.min(ta.length - aPos, tb.length - bPos)
        var l = 0
        while (l < n && ta(aPos + l) == tb(bPos + l)) l += 1
        (l.toLong, aId, aPos, bId, bPos)
      }
    }.toDF("len", "a_id", "a_pos", "b_id", "b_pos").localCheckpoint(true)
    val best = lcps.agg(max("len").as("len"))
    lcps.join(broadcast(best), "len")
      .agg(min(struct(col("a_id"), col("a_pos"), col("b_id"), col("b_pos")))
        .as("w"), max(col("len")).as("len"))
      .select(col("len"), col("w.a_id").as("a_id"), col("w.a_pos").as("a_pos"),
        col("w.b_id").as("b_id"), col("w.b_pos").as("b_pos"))
      .filter(col("a_id").isNotNull)
  }
}
