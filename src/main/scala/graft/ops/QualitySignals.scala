package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-quality signals for training-data curation (north-star
 * extension): Gopher-style repetition measures and benchmark-contamination
 * detection — the filters a pre-training pipeline runs between dedup and
 * tokenization.
 *
 * Scale shapes: repetition counts shuffle (id, gram) pairs with map-side
 * partial aggregation (the explode never leaves the stage un-combined);
 * contamination broadcasts the benchmark's distinct shingles (eval sets
 * are tiny next to a 100 TB corpus) so the corpus side is one scan with a
 * broadcast semi-join — no corpus shuffle at all before the per-doc count.
 */
object QualitySignals {

  /** Word n-grams of an ALREADY-SPLIT token array column (empty when the
    * document has fewer than `n` tokens — no whole-text fallback here,
    * unlike MinHash shingles: repetition ratios over padded grams would
    * skew). Callers materialize the token array in a projection first:
    * referencing `split(...)` directly here would re-run the regex split
    * inside the per-element lambda — O(tokens²) splits per document. */
  private def grams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /**
   * Per-document repetition signals (Gopher §A1.1-style, token-based):
   *
   *  - `top2_frac`: share of bigram occurrences taken by the single most
   *    frequent bigram — high values mean boilerplate loops.
   *  - `dup3_frac`: share of trigram occurrences whose trigram appears
   *    more than once in the document.
   */
  def repetitionSignals(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // ONE corpus pass: bigrams and trigrams explode together as
    // (n, gram) structs (round 2 scanned + exploded the corpus once per
    // gram size, then joined — an avoidable 2×). One (id, n, g) count with
    // map-side combine, then one per-doc conditional aggregation.
    val toks = df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
    toks.select(col("id"), explode(concat(
          transform(grams(col("tk"), 2), g => struct(lit(2).as("n"), g.as("g"))),
          transform(grams(col("tk"), 3), g => struct(lit(3).as("n"), g.as("g"))))).as("ng"))
      .select(col("id"), col("ng.n").as("n"), col("ng.g").as("g"))
      .groupBy("id", "n", "g").agg(count("*").as("c"))
      .groupBy("id")
      .agg(
        round(max(when(col("n") === 2, col("c"))).cast("double") /
          sum(when(col("n") === 2, col("c"))), 4).as("top2_frac"),
        // a 2-token doc has a bigram signal but no trigrams — its
        // dup3_frac is 0 by definition, not a reason to drop the row.
        // (Docs with < 2 tokens emit no rows at all — the contract.)
        coalesce(round(
          sum(when(col("n") === 3 && col("c") >= 2, col("c")).otherwise(0L))
            .cast("double") / sum(when(col("n") === 3, col("c"))), 4),
          lit(0.0)).as("dup3_frac"))
  }

  /**
   * Benchmark contamination: documents sharing ≥ 1 distinct word `n`-gram
   * with the benchmark corpus, with the count of distinct shared shingles
   * — the n-gram-overlap decontamination check run before training on any
   * corpus that might contain eval data. Returns `(id, n_shared)`.
   */
  def contamination(df: DataFrame, idCol: Column, textCol: Column,
      bench: DataFrame, benchTextCol: Column, n: Int = 3): DataFrame = {
    val benchGrams = broadcast(
      bench.select(split(trim(benchTextCol), "\\s+").as("tk"))
        .select(explode(grams(col("tk"), n)).as("g")).distinct())
    df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
      .select(col("id"), explode(grams(col("tk"), n)).as("g"))
      .join(benchGrams, "g") // broadcast hash join: corpus never shuffles
      .groupBy("id")
      .agg(countDistinct("g").as("n_shared"))
  }
}
