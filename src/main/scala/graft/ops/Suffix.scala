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
 * Scale shape: rank doubling with FINISHED-RANK PRUNING, never string
 * sorting — ranks are kept position-style internally (rank = number of
 * suffixes strictly below), so a tie group of size g refines strictly
 * within `[r, r+g)` and every already-unique rank is final. Each
 * iteration therefore touches only the still-tied suffixes: one tie
 * census, one equi-join pairing each tied suffix with the rank `2^k`
 * tokens ahead (provider = the full table), a weighted range-sorted
 * offset pass over the tied (rank, rank₂) keys, one join back, one
 * anti-join union. On natural text the tied set collapses within a few
 * doublings; iterations stop when no ties remain (≤ ⌈log₂
 * longest-document⌉ + 1 rounds). The corpus text is touched ONCE;
 * everything after is integer shuffles, and all global orderings come
 * from range-partitioned sorts + per-partition offsets — no
 * single-task sort, no unpartitioned window. The dense external
 * contract is restored by one final distinct-rank conversion.
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

  /** As [[withDenseRankCounted]] but WEIGHTED: `out` is the sum of
    * `weight` over all keys strictly before this one in `sortCols`
    * order — the "position-style" rank (how many underlying rows sort
    * below) that makes the doubling loop's finished-rank pruning
    * possible: a refined tie group redistributes inside `[r, r+g)`
    * without touching any other rank. Same shape: range partition +
    * one sizes job + offset-seeded local scan. */
  private def withWeightedOffset(keys: DataFrame, sortCols: Seq[Column],
      weight: Column, out: String): DataFrame = {
    val spark = keys.sparkSession
    val w = keys.withColumn("__w", weight.cast("long"))
    val rdd = w.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*).rdd
    val wIdx = w.schema.fieldIndex("__w")
    val sizes = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L
      while (it.hasNext) s += it.next().getLong(wIdx)
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val indexed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = bc.value(i)
      it.map { row =>
        val o = acc
        acc += row.getLong(wIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ o)
      }
    }
    spark.createDataFrame(indexed,
        w.schema.add(out, org.apache.spark.sql.types.LongType))
      .drop("__w")
  }

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
      // POSITION-style initial ranks (rank = #suffixes whose first token
      // sorts strictly below): the invariant that lets finished ranks be
      // pruned — a tie group of size g refines strictly inside
      // [r, r+g), so every already-unique rank is FINAL and never
      // reshuffles again. The old dense re-rank touched all n suffixes
      // every iteration; this loop touches only the still-tied ones
      // (random text: a handful of iterations in, almost none).
      val dict = withWeightedOffset(
        toks.groupBy("tok").agg(count(lit(1)).as("__n")),
        Seq(col("tok")), col("__n"), "r").drop("__n")
      // eager localCheckpoint, NOT persist: `cur` appears repeatedly in
      // every iteration's joins, so the logical plan would double per
      // iteration — Catalyst analysis time turns exponential long before
      // execution matters (the q80 duplicate-clusters pathology).
      var cur = toks.join(dict, "tok")
        .select(col("doc_id"), col("pos"), col("r"))
        .localCheckpoint(true)
      // IDENTICAL suffixes (same tokens to both ends) tie forever, so
      // "no ties left" alone would spin to maxDoubles on corpora with
      // whole-suffix duplicates: once the depth covers the longest
      // document every comparison is complete and the ranks are final
      val stats = toks.groupBy("doc_id").count()
        .agg(sum("count").as("t"), max("count").as("m")).head()
      val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
      val maxDocLen = if (stats.isNullAt(1)) 0L else stats.getLong(1)
      var k = 1L
      var iters = 0
      var done = total == 0
      while (!done && k < maxDocLen && iters < maxDoubles) {
        // ranks still shared by ≥ 2 suffixes — only these rows refine
        val tiedR = cur.groupBy("r").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1).select("r")
          .persist(StorageLevel.MEMORY_AND_DISK)
        if (tiedR.count() == 0) {
          tiedR.unpersist(blocking = false)
          done = true
        } else {
          val tied = cur.join(tiedR, "r")
          // rank 2^k tokens ahead attaches by equi-join against the FULL
          // table (the provider may itself be finished); absent = past
          // the document end, which sorts before every real rank
          val ahead = cur.select(col("doc_id"), (col("pos") - k).as("pos"),
            col("r").as("r2"))
          val paired = tied.join(ahead, Seq("doc_id", "pos"), "left")
            .select(col("doc_id"), col("pos"), col("r"),
              coalesce(col("r2"), lit(-1L)).as("r2"))
          // weighted offsets over the tied keys give each (r, r2) its
          // within-group start; r + (offset − group base) stays inside
          // [r, r+g) — no global re-rank, finished ranks never move
          val keys = paired.groupBy("r", "r2").agg(count(lit(1)).as("__w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val off = withWeightedOffset(keys, Seq(col("r"), col("r2")),
            col("__w"), "__o")
          val base = off.groupBy("r").agg(min("__o").as("__b"))
          val newKeys = off.join(base, "r").select(col("r"), col("r2"),
            (col("r") + col("__o") - col("__b")).as("nr"))
          val refined = paired.join(newKeys, Seq("r", "r2"))
            .select(col("doc_id"), col("pos"), col("nr").as("r"))
          val next = cur.join(tiedR, Seq("r"), "left_anti")
            .unionByName(refined)
            .localCheckpoint(true)
          tiedR.unpersist(blocking = false)
          keys.unpersist(blocking = false)
          cur = next
          k *= 2
          iters += 1
        }
      }
      // external contract stays DENSE (q152's oracle: dense_rank − 1):
      // one final conversion over the distinct position ranks
      val denseKeys = withDenseRank(cur.select("r").distinct(),
        Seq(col("r")), "__dr")
      cur.join(denseKeys, "r")
        .select(col("doc_id"), col("pos"), col("__dr").as("rank"))
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
