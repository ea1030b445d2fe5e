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
}
