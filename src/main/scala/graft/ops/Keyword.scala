package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyword relevance + hybrid retrieval (north-star extension): BM25 over a
 * text column and reciprocal-rank fusion with vector similarity — the
 * lexical half of "hybrid search" that pure vector stores (the reference
 * included) lack.
 *
 * Scale shape of [[bm25]]: ONE scan of the corpus computes per-row token
 * lists; only tokens matching the query survive the explode (the filter
 * sits before the shuffle), so the aggregation shuffles at most
 * `matching-docs × query-terms` small rows regardless of corpus width.
 * Document frequencies reduce to `|query|` rows (collected + rebroadcast),
 * N and avgdl to two scalars. Nothing global ever sorts.
 *
 * Semantics pinned for the DuckDB oracle (q67): whitespace tokens of
 * `lower(trim(text))`, doc length = total token count,
 * `idf = ln((N - df + 0.5) / (df + 0.5) + 1)` (Robertson-Sparck-Jones,
 * Lucene's +1 shift keeps it positive), and the classic
 * `tf * (k1+1) ... / (tf + k1 (1 - b + b len/avgdl))` saturation.
 */
object Keyword {

  /** BM25 scores `(id, score)` for every document matching ≥ 1 query term. */
  def bm25(docs: DataFrame, idCol: Column, textCol: Column,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(idCol.as("id"),
      split(lower(trim(textCol)), "\\s+").as("toks"))
      .select(col("id"), size(col("toks")).cast("double").as("len"), col("toks"))
    val stats = toks.agg(count("*").cast("double").as("n"), sum("len").as("sl"))
      .collect()(0)
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1) / n

    // per-(doc, query-term) term frequencies; the isin filter precedes the
    // shuffle so only query-term hits move
    val tf = toks
      .select(col("id"), col("len"), explode(col("toks")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy("id", "term")
      .agg(count("*").cast("double").as("tf"), first("len").as("len"))

    // idf per query term derived IN-PLAN (|query| rows, broadcast): no
    // driver collect, nothing persisted (an un-unpersistable cache would
    // leak one entry per query in a long-lived session), and the whole
    // operator stays one lazy snapshot-consistent plan. The tf lineage
    // feeds both branches — two bounded scans at action time, zero pinned
    // memory.
    val idfDf = broadcast(tf.groupBy("term")
      .agg(count("*").cast("double").as("df"))
      .select(col("term"),
        log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf")))

    tf.join(idfDf, "term")
      .withColumn("part", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / avgdl)))
      .groupBy("id")
      .agg(sum("part").as("score"))
  }

  /** Inverted-index posting lists — the materialized lexical index
    * [[bm25]] computes on the fly: per term, its document frequency,
    * total occurrence count, and the first `cap` doc ids (ascending).
    * `minDf` drops the hapax tail (the long tail of once-seen terms
    * dominates any vocabulary); `cap` bounds the posting payload so a
    * stopword's list is `cap` ids, not |corpus| — at index-build scale
    * the full lists would be written per-bucket, this is the bounded
    * catalog view. Output: `(term, df, tf_total, postings)` sorted
    * postings array.
    *
    * Plan: one explode + one (term, doc) partial-agg'd count, then a
    * rank window and the final per-term agg SHARE the term shuffle
    * (same partitioning — window sort, no second exchange); ids beyond
    * `cap` are excluded BEFORE the collect, so no unbounded per-term
    * array ever materializes. */
  def postingLists(docs: DataFrame, idCol: Column, textCol: Column,
      minDf: Int, cap: Int): DataFrame = {
    require(minDf >= 1, "postingLists: minDf must be >= 1")
    require(cap >= 1, "postingLists: cap must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val td = docs.select(idCol.cast("long").as("id"),
        explode(array_remove(split(trim(textCol), "\\s+"), "")).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).as("tf"))
    val rn = Window.partitionBy("term").orderBy(col("id").asc)
    td.withColumn("__rn", row_number().over(rn))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"),
        sort_array(collect_list(when(col("__rn") <= cap, col("id"))))
          .as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Reciprocal-rank fusion of two ranked candidate lists
    * `(id, <scoreCol>)`: `Σ 1/(k0 + rank)`. Feed it bounded top-k lists
    * (both sides of a hybrid search arrive via TakeOrderedAndProject), so
    * the rank windows only ever see candidate-sized inputs. */
  def rrfFuse(a: DataFrame, aScore: Column, b: DataFrame, bScore: Column,
      k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, s: Column) =
      df.select(col("id"), s.as("s"))
        .withColumn("rank", row_number().over(Window.orderBy(col("s").desc, col("id"))))
    ranked(a, aScore).select(col("id"), (lit(1.0) / (lit(k0) + col("rank"))).as("c"))
      .unionAll(ranked(b, bScore)
        .select(col("id"), (lit(1.0) / (lit(k0) + col("rank"))).as("c")))
      .groupBy("id")
      .agg(sum("c").as("rrf"))
  }

  /** Sparse tf-idf document-pair cosine similarity — the LEXICAL
    * near-dup / related-document pass next to the embedding-space
    * [[Ann.lshNearDupPairs]]: term weights `tf·ln(N/df)`, pairs formed
    * through the inverted index (a self-join on TERM — two documents
    * meet only where they share vocabulary), cosine from the summed
    * weight products and per-doc norms. Terms with `df > maxDf` are
    * dropped BEFORE pairing — the stop-term prune that bounds each
    * posting list's pair fan-out at maxDf², which is what keeps the
    * index join from degenerating into all-pairs on corpus-frequent
    * words. Output `(a_id, b_id, n_shared, sim)` (a < b, 4dp,
    * `sim >= threshold`). */
  def tfidfSimilarityPairs(docs: DataFrame, idCol: Column,
      textCol: Column, maxDf: Long, threshold: Double): DataFrame = {
    require(maxDf >= 2, "tfidfSimilarityPairs: maxDf must be >= 2")
    require(threshold >= 0 && threshold <= 1,
      "tfidfSimilarityPairs: threshold in [0, 1]")
    val tf = docs.select(idCol.cast("long").as("id"),
        explode(array_remove(split(trim(textCol), "\\s+"), "")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // read twice: df + the weight join
    val nDocs = docs.select(idCol.cast("long").as("id")).distinct()
      .agg(count(lit(1)).as("nn"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val w = tf.join(dfT, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("id"), col("term"),
        (col("tf") * log(col("nn").cast("double") / col("df"))).as("w"))
      .localCheckpoint(true) // read 3×: norms + both join sides
    val norms = w.groupBy("id").agg(sum(col("w") * col("w")).as("n2"))
    w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"),
        sum(col("a.w") * col("b.w")).as("dot"))
      .join(norms.select(col("id").as("a_id"), col("n2").as("na")), "a_id")
      .join(norms.select(col("id").as("b_id"), col("n2").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared"),
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 4)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }
}
