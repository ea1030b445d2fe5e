package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Padding statistics (SURVEY §2.5 A6), re-expressing the reference's
 * tokenize-stage accounting (`/root/reference/stage_tokenize.py:133-152`,
 * aggregated at `embedding_models.py:244-280`): when fixed-size batches are
 * padded to their longest member, total padded cells = Σ per-batch
 * (batch_max × batch_size), and efficiency = real / padded. The reference
 * length-sorts before batching to shrink the padding (K2); this operator
 * computes the stats for any batch assignment so the two orders can be
 * compared.
 */
object BatchStats {

  /** Per-batch padding stats for rows batched `batchSize` at a time in
    * `orderBy` order. Output: `batch_idx, n, max_len, real_tokens,
    * padded_tokens` (one row per batch). The global batch index comes from
    * [[Scale.withGlobalIndex]] — partition-parallel ranks + broadcast
    * offsets, not an unpartitioned window (which would move the whole
    * table to one task). */
  def paddingStats(df: DataFrame, lenCol: Column, orderBy: Seq[Column],
      batchSize: Int): DataFrame = {
    Scale.withGlobalIndex(df.withColumn("len", lenCol.cast("long")), orderBy)
      .withColumn("batch_idx", ((col("gidx") - 1) / batchSize).cast("long"))
      .groupBy("batch_idx")
      .agg(count("*").as("n"), max("len").as("max_len"),
        sum("len").as("real_tokens"))
      .withColumn("padded_tokens", col("max_len") * col("n"))
  }

  /** Corpus-level summary: total real vs padded tokens + efficiency %,
    * for both arrival (by id) and length-sorted batch orders.
    *
    * The upstream lineage is evaluated ONCE: the input is projected to two
    * longs per row and persisted before the two [[Scale.withGlobalIndex]]
    * passes (each of which scans its input twice — offset + rank pass, so
    * four scans total, all of the tiny cache, never of the upstream). The
    * 2-row summary is materialized eagerly so the cache can be released
    * before returning — callers get a local result, not a live lineage
    * over an unpersisted frame. */
  def paddingEfficiency(df: DataFrame, idCol: Column, lenCol: Column,
      batchSize: Int): DataFrame = {
    val spark = df.sparkSession
    val p = df.select(idCol.as("_k"), lenCol.cast("long").as("len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def total(ordered: Seq[Column], label: String): DataFrame =
        paddingStats(p, col("len"), ordered, batchSize)
          .agg(sum("real_tokens").as("real_total"), sum("padded_tokens").as("padded_total"))
          .select(lit(label).as("batch_order"), col("real_total"), col("padded_total"),
            round(col("real_total").cast("double") / col("padded_total"), 4)
              .as("efficiency"))
      val out = total(Seq(col("_k")), "arrival")
        .unionAll(total(Seq(col("len").desc, col("_k")), "length_sorted"))
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally p.unpersist(blocking = false)
  }
}
