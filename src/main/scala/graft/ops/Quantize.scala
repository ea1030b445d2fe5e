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
 * math throughout, codes = round(v / scale) — so the DuckDB oracle
 * reproduces codes bit-for-bit.
 */
object Quantize {

  /** Per-vector scale: `max|v| / 127` (0 for the zero vector). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0

  /** Int8 codes `round(v / scale)` as ARRAY<INT> (zero vector → zeros). */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x =>
      when(s === 0.0, lit(0))
        .otherwise(round(x.cast("double") / s).cast("int")))
  }

  /** Mean absolute reconstruction error `mean |v - code*scale|` — the
    * quality metric a quantized store reports. Left-fold accumulation so
    * any engine sums in the same order. */
  def int8ReconError(vec: Column): Column = {
    val s = int8Scale(vec)
    val err = aggregate(
      zip_with(vec, int8Codes(vec),
        (v, c) => abs(v.cast("double") - c.cast("double") * s)),
      lit(0.0), (acc, x) => acc + x)
    err / size(vec)
  }
}
