package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One façade over the `…Against` incremental family (SURVEY §2.6 / the
 * daily-ingest discipline): every member persists a frozen-corpus artifact
 * once, then audits or rewrites each incoming batch against it with zero
 * corpus recomputation. Before this trait each member hand-rolled its own
 * build/load/apply wiring ([[Dedup.frequentLines]]+[[Dedup.lineDedupAgainst]],
 * [[Dedup.repeatedGrams]]+[[Dedup.spanScrubAgainst]], …); a
 * [[ScrubArtifact]] names the artifact, builds its table, and applies it,
 * so [[graft.store.VectorStore.writeScrubArtifact]] /
 * [[graft.store.VectorStore.scrubGate]] make the chained daily gate a
 * one-liner over any artifact mix.
 *
 * Two member shapes share the contract:
 *  - SCRUBBERS rewrite text ([[FrequentLineScrub]], [[SpanScrub]],
 *    [[CdcScrub]]): `gate` keeps every row, text scrubbed. Row-local
 *    (broadcast set + per-partition projection) — streaming-safe in
 *    append mode with no watermark.
 *  - GATES drop rows ([[BloomGate]], [[WinnowGate]], [[NoveltyGate]]):
 *    `gate` filters flagged documents out, text untouched. [[BloomGate]]
 *    is row-local and streaming-safe; [[WinnowGate]] and [[NoveltyGate]]
 *    flag via their native report and anti-join on id — batch shape
 *    (their reports aggregate per doc, which append-mode streams cannot
 *    do without a watermark; run them in foreachBatch if needed).
 *
 * Chaining contract: `gate` takes and returns `(id long, text string)` —
 * `scrubGate` folds any artifact sequence left to right, scrubbers
 * feeding gates feeding scrubbers. Order matters semantically (scrub
 * before novelty means novelty is judged on scrubbed text) and is the
 * caller's policy decision.
 */
sealed trait ScrubArtifact extends Serializable {
  /** Artifact kind — the directory name under the store's `artifacts/`. */
  def kind: String
  /** Reduce the frozen corpus to the persisted artifact table. */
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame
  /** The member's NATIVE output against a loaded artifact table (scrub
    * rewrite or per-doc report — schema is the member's own contract). */
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame
  /** Uniform chaining shape: `(id, text)` in, `(id, text)` out. */
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame
}

/** [[Dedup.frequentLines]] → [[Dedup.lineDedupAgainst]]: drop lines seen
  * in ≥ `minDocs` frozen documents. Streaming-safe scrubber. */
final case class FrequentLineScrub(minDocs: Int = 2, sep: String = "\n")
    extends ScrubArtifact {
  val kind = "frequent_lines"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    Dedup.frequentLines(corpus, id, text, minDocs, sep)
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    Dedup.lineDedupAgainst(batch, id, text, table, sep)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    apply(batch, id, text, table).select(col("id"), col("text"))
}

/** [[Dedup.repeatedGrams]] → [[Dedup.spanScrubAgainst]]: cut token spans
  * covered by a word-`k`-gram repeated across ≥ `minDocs` frozen docs
  * (the Lee-et-al substring scrub). Streaming-safe scrubber. */
final case class SpanScrub(k: Int = 5, minDocs: Int = 2)
    extends ScrubArtifact {
  val kind = s"repeated_grams_$k"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    Dedup.repeatedGrams(corpus, id, text, k, minDocs)
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    Dedup.spanScrubAgainst(batch, id, text, table, k)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    apply(batch, id, text, table).select(col("id"), col("text"))
}

/** Cross-document CDC duplicate blocks → [[Dedup.cdcScrubAgainst]]:
  * rsync-style block dedup with insertion-shift-robust boundaries.
  * Streaming-safe scrubber. */
final case class CdcScrub(window: Int = 2, divisor: Int = 8,
    minDocs: Int = 2) extends ScrubArtifact {
  val kind = s"cdc_chunks_${window}_$divisor"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    Dedup.cdcChunks(corpus, id, text, window, divisor)
      .select(col("h"), col("id")).distinct()
      .groupBy("h").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("h"))
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    Dedup.cdcScrubAgainst(batch, id, text, table, window, divisor)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    apply(batch, id, text, table).select(col("id"), col("text"))
}

/** [[QualitySignals.bloomBitsTable]] →
  * [[QualitySignals.bloomContaminationAgainst]]: drop documents sharing
  * ≥ `minFlagged` distinct n-grams with the benchmark filter. The gate
  * re-runs the row-local Bloom scan with the text column retained, so it
  * stays a stateless projection — streaming-safe, unlike an anti-join
  * against the report. */
final case class BloomGate(n: Int = 3, m: Int = 1 << 20, k: Int = 3,
    minFlagged: Long = 1L) extends ScrubArtifact {
  val kind = s"bloom_bits_$n"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    QualitySignals.bloomBitsTable(corpus, text, n, m, k)
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    QualitySignals.bloomContaminationAgainst(batch, id, text, table, n, m, k)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val positions = table.select(col("p").cast("long"))
      .collect().map(_.getLong(0))
    val bits = new java.util.BitSet(m)
    positions.foreach(p => bits.set(p.toInt))
    val bc = spark.sparkContext.broadcast(bits)
    val (nn, mm, kk, minF) = (n, m, k, minFlagged)
    batch.select(id.cast("long").as("id"), text.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val filter = bc.value
        rows.filter { case (_, t) =>
          QualitySignals.bloomFlagged(t, filter, nn, mm, kk) < minF
        }
      }
      .toDF("id", "text")
  }
}

/** [[graft.ops.TextAnalysis.winnowFingerprintTable]] →
  * [[graft.ops.TextAnalysis.winnowOverlapAgainst]]: drop documents
  * sharing ≥ `minShared` rare winnowing fingerprints with any frozen
  * document. Batch gate (anti-join on the flagged ids). */
final case class WinnowGate(k: Int = 3, w: Int = 4, minShared: Int = 3,
    maxDf: Int = 10) extends ScrubArtifact {
  val kind = s"winnow_fp_${k}_$w"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    TextAnalysis.winnowFingerprintTable(corpus, id, text, k, w)
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    TextAnalysis.winnowOverlapAgainst(batch, id, text, table, k, w,
      minShared, maxDf)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame = {
    val flagged = apply(batch, id, text, table)
      .select(col("id").as("__flagged_id")).distinct()
    batch.select(id.cast("long").as("id"), text.cast("string").as("text"))
      .join(flagged, col("id") === col("__flagged_id"), "left_anti")
  }
}

/** [[Dedup.simHashTable]] → [[Dedup.simHashDupAgainst]]: drop documents
  * within `maxHamming` of any frozen document's 60-bit sketch — the
  * 8-bytes-per-frozen-doc fuzzy near-dup gate (full recall at hamming
  * ≤ 3). Batch gate (anti-join on the flagged ids). */
final case class SimHashGate(maxHamming: Int = 3, seed: Long = 42L)
    extends ScrubArtifact {
  val kind = "simhash_sigs"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    Dedup.simHashTable(corpus, id, text, seed)
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    Dedup.simHashDupAgainst(batch, id, text, table, maxHamming, seed)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame = {
    val flagged = apply(batch, id, text, table)
      .select(col("id").as("__flagged_id")).distinct()
    batch.select(id.cast("long").as("id"), text.cast("string").as("text"))
      .join(flagged, col("id") === col("__flagged_id"), "left_anti")
  }
}

/** [[QualitySignals.bigramLmTable]] →
  * [[QualitySignals.bigramLmScoreAgainst]]: drop documents whose mean
  * bigram log-probability under the CLEAN reference model falls below
  * `minAvgLp` — the CCNet quality gate as a daily-ingest artifact.
  * Documents with < 2 tokens carry no LM evidence and pass. Batch gate
  * (the score aggregates per doc). */
final case class LmScoreGate(minAvgLp: Double = -9.0)
    extends ScrubArtifact {
  val kind = "bigram_lm"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    QualitySignals.bigramLmTable(corpus, text)
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    QualitySignals.bigramLmScoreAgainst(batch, id.cast("long"), text, table)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame = {
    val flagged = apply(batch, id, text, table)
      .filter(col("avg_lp") < minAvgLp)
      .select(col("id").as("__flagged_id"))
    batch.select(id.cast("long").as("id"), text.cast("string").as("text"))
      .join(flagged, col("id") === col("__flagged_id"), "left_anti")
  }
}

/** Embedding-space member of the gate family: the frozen corpus (a
  * benchmark suite, typically) persists as `(id, vector)` rows under the
  * engine embedder ([[graft.functions.hash_embed]] — swap in a real
  * backend via the same column function), and
  * [[QualitySignals.semanticContamination]] drops every batch document
  * whose embedding cosine against ANY frozen vector reaches `threshold` —
  * the paraphrase leak [[BloomGate]]'s verbatim n-grams cannot see.
  * Batch gate (anti-join on the flagged ids); the artifact broadcasts
  * (benchmark-sized by nature). */
final case class SemanticGate(threshold: Double = 0.9, dim: Int = 64)
    extends ScrubArtifact {
  val kind = s"semantic_embed_$dim"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    corpus.select(id.cast("long").as("id"),
      graft.functions.hash_embed(text, dim).as("v"))
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    QualitySignals.semanticContamination(
      batch.select(id.cast("long").as("id"),
        graft.functions.hash_embed(text, dim).as("bv")),
      col("id"), col("bv"), table, col("id"), col("v"), threshold)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame = {
    val flagged = apply(batch, id, text, table)
      .select(col("id").as("__flagged_id"))
    batch.select(id.cast("long").as("id"), text.cast("string").as("text"))
      .join(flagged, col("id") === col("__flagged_id"), "left_anti")
  }
}

/** [[QualitySignals.ngramHashTable]] →
  * [[QualitySignals.ngramNoveltyAgainst]]: drop documents whose distinct
  * n-gram novelty against the frozen corpus falls below `minNovelty`
  * (memorization risk). Documents with fewer than `n` tokens carry no
  * gram evidence and pass. Batch gate (the report aggregates per doc). */
final case class NoveltyGate(n: Int = 3, minNovelty: Double = 0.25)
    extends ScrubArtifact {
  val kind = s"ngram_hashes_$n"
  def build(corpus: DataFrame, id: Column, text: Column): DataFrame =
    QualitySignals.ngramHashTable(corpus, text, n)
  def apply(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame =
    QualitySignals.ngramNoveltyAgainst(batch, id, text, table, n)
  def gate(batch: DataFrame, id: Column, text: Column,
      table: DataFrame): DataFrame = {
    val flagged = apply(batch, id, text, table)
      .filter(col("novelty") < minNovelty)
      .select(col("id").as("__flagged_id"))
    batch.select(id.cast("long").as("id"), text.cast("string").as("text"))
      .join(flagged, col("id") === col("__flagged_id"), "left_anti")
  }
}
