package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Byte-pair-encoding tokenizer training (Sennrich et al., "Neural Machine
 * Translation of Rare Words with Subword Units", ACL 2016) — the trainer a
 * pre-training pipeline runs between curation and tokenization, and the
 * other iterative-refinement loop in the engine next to [[Ivf]]'s Lloyd
 * trainer (same discipline: driver loop over a persisted bounded frame,
 * one partial-aggregated shuffle per iteration, deterministic ties).
 *
 * Scale shape: the corpus is scanned ONCE, reducing to the word-count
 * vocabulary — a |distinct words| frame (vocabulary-sized, bounded, the
 * table FastBPE/HuggingFace trainers also reduce to first). Every merge
 * iteration aggregates adjacent-pair counts over that vocab with map-side
 * partial aggregation and picks the max as a 1-row TakeOrdered — the
 * 100 TB table is never touched again. Applying a trained tokenizer
 * ([[segmentCount]]) is a pure row-local projection: zero exchanges.
 *
 * Engine-portable representation: a word's token sequence is a single
 * string `⟂t₁⟂⟂t₂⟂…⟂tₙ⟂` (⟂ = U+0001, outside any printable corpus).
 * Merging pair (a,b) is then literal `replace(tokstr, "⟂a⟂⟂b⟂", "⟂ab⟂")`
 * — both Spark and DuckDB scan left-to-right over non-overlapping
 * matches, which is exactly BPE's merge order within a word ("aaa" with
 * merge (a,a) → "aa","a"), so the DuckDB oracle reproduces the training
 * run verbatim. Ties in pair counts break lexicographically (a, then b) —
 * binary string order, identical in both engines on ASCII.
 */
object Bpe {

  /** Token separator: each token is wrapped `⟂tok⟂`, so adjacency shows
    * as `⟂⟂` and a merge pattern can never match across token or word
    * boundaries (tokens never contain U+0001). */
  private val S = "\u0001"

  /** A word as its character token string: "cat" → `⟂c⟂⟂a⟂⟂t⟂` — one
    * regexp pass wrapping every char. */
  private def enc(w: Column): Column =
    regexp_replace(w, "(.)", S + "$1" + S)

  /** Decode a token string back to the token array. */
  private def toks(tokstr: Column): Column =
    split(trim(tokstr, S), S + S)

  /** One merge as a literal replace (see class doc for why this is
    * exactly BPE's within-word left-to-right merge order). */
  private def merge1(t: Column, a: String, b: String): Column =
    replace(t, lit(S + a + S + S + b + S), lit(S + a + b + S))

  /** The word-count vocabulary: one corpus scan, whitespace words,
    * map-side-combined count per distinct word. */
  def wordVocab(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(trim(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Adjacent token pairs of each vocab row, weighted by word count:
    * `(a, b, s)` — the frame each iteration argmaxes over. zip-with-tail
    * keeps the pair walk row-local (the padded final (last, null) pair is
    * dropped). */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"), toks(col("t")).as("tk"))
      .select(col("cnt"),
        explode(zip_with(col("tk"),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .filter(col("p.b").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("s"))

  /** Train `numMerges` BPE merges over the corpus; returns the merge
    * table `(a, b, pairCount)` in learned order. Deterministic in the
    * data: integer counts, ties → lexicographically smallest (a, b).
    * Stops early if the vocabulary runs out of adjacent pairs.
    *
    * The encoded base vocab persists once; iteration `i` re-applies the
    * `i` learned merges as a chained projection over it (merge lists are
    * tiny driver state — re-deriving beats checkpointing a new frame per
    * iteration). */
  def train(df: DataFrame, textCol: Column, numMerges: Int): Seq[(String, String, Long)] = {
    val base = wordVocab(df, textCol)
      .select(enc(col("w")).as("t"), col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = Seq.newBuilder[(String, String, Long)]
      var cur = base
      var i = 0
      var exhausted = false
      while (i < numMerges && !exhausted) {
        val best = pairCounts(cur)
          .orderBy(col("s").desc, col("a"), col("b")).limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (a, b) = (best(0).getString(0), best(0).getString(1))
          merges += ((a, b, best(0).getLong(2)))
          cur = cur.withColumn("t", merge1(col("t"), a, b))
        }
        i += 1
      }
      merges.result()
    } finally base.unpersist(blocking = false)
  }

  /** Tokenizer inference: per-document subword count under a trained
    * merge list — encode each word, fold the merges in learned order,
    * count surviving tokens. Fully row-local (the merge list is literal
    * state inside the expression): the realistic apply-to-new-text path,
    * no vocabulary join, zero exchanges. */
  def segmentCount(textCol: Column, merges: Seq[(String, String)]): Column = {
    val words = filter(split(trim(textCol), "\\s+"), w => w =!= "")
    val perWord = transform(words, w =>
      size(toks(merges.foldLeft(enc(w)) {
        case (acc, (a, b)) => merge1(acc, a, b)
      })).cast("long"))
    aggregate(perWord, lit(0L), (acc, x) => acc + x)
  }
}
