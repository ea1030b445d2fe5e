package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding storage quantization (north-star extension): symmetric
 * per-vector int8 codes — a 4× storage/scan-bandwidth reduction for the
 * 100 TB vectors table, with the scale stored beside the codes for
 * reconstruction (`v ≈ code * scale`). All arithmetic is composed from
 * codegen'd built-ins (transform/aggregate higher-order functions), no
 * UDFs, and the spec is engine-exact: scale = max|v| / 127 with double
 * math throughout, codes = `floor(v/scale + 0.5)` — arithmetic
 * round-half-up (toward +∞), chosen over SQL `round()` both for
 * portability (identical in every engine, no ties-away-from-zero
 * ambiguity) and speed (Spark's round() routes every element through
 * BigDecimal).
 *
 * Callers should materialize [[int8Scale]]/[[int8Codes]] in one projection
 * and derive the error from the materialized columns via
 * [[reconError]] — recomputing the code array inside every consumer
 * multiplies the per-element work.
 */
object Quantize {

  /** Per-vector scale: `max|v| / 127` (0 for the zero vector). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0

  /** Int8 codes `floor(v/scale + 0.5)` as ARRAY<INT> (zero vector → 0s),
    * given a materialized scale column. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(x.cast("double") / scale + 0.5).cast("int")))

  /** Mean absolute reconstruction error `mean |v - code*scale|` from
    * materialized codes + scale — the quality metric a quantized store
    * reports. Left-fold accumulation so any engine sums in the same
    * order. */
  def reconError(vec: Column, codes: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, codes,
        (v, c) => abs(v.cast("double") - c.cast("double") * scale)),
      lit(0.0), (acc, x) => acc + x) / size(vec)
}
