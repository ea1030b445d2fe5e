package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Warehouse-modeling transforms over change logs — the dimension-table
 * side of the pipeline (the metadata DB the reference maintains is a
 * latest-state store; history tables are the standard extension when
 * the store feeds analytics).
 */
object Warehouse {

  /**
   * Slowly-changing-dimension type-2 history from a change log: rows
   * are observations `(key, ts, attributes…)`; consecutive observations
   * with identical attributes collapse into one validity interval, and
   * each attribute change opens a new version. Output per interval:
   * `(k, version, valid_from, valid_to, is_current, <attrs…>)` —
   * `version` 1-based per key in time order, `valid_to` the next
   * version's `valid_from` (null on the open interval),
   * `is_current` 1 on the latest version.
   *
   * Ties at one timestamp order by `tiebreakCol` (pass the record id —
   * without a total order the collapsed runs are nondeterministic).
   * Null-safe attribute comparison: a null attribute equals itself, so
   * nulls don't open a version per row.
   *
   * Scale shape: ONE shuffle by key — the change-detection lag and the
   * running version number share the same `(k × (ts, tb))` window sort
   * — then a grouped min per (key, version) and a version-level lead
   * window over the collapsed frame (|versions| rows ≪ |log|). The log
   * never self-joins.
   */
  def scd2(changes: DataFrame, keyCol: Column, tsCol: Column,
      tiebreakCol: Column, attrs: Seq[(String, Column)]): DataFrame = {
    require(attrs.nonEmpty, "scd2: need at least one tracked attribute")
    require(attrs.map(_._1).distinct.size == attrs.size,
      "scd2: attribute names must be distinct")
    val rowW = Window.partitionBy(col("k")).orderBy(col("t"), col("tb"))
    val base = changes.select(keyCol.cast("long").as("k"), tsCol.as("t"),
      tiebreakCol.cast("long").as("tb"),
      struct(attrs.map { case (n, c) => c.as(n) }: _*).as("a"))
    val marked = base.withColumn("chg",
      when(row_number().over(rowW) === 1 ||
        !(col("a") <=> lag(col("a"), 1).over(rowW)), 1L).otherwise(0L))
    val runs = marked.withColumn("version", sum(col("chg")).over(rowW))
    // all rows of a run carry identical attrs; min(struct) is just the
    // deterministic way to pick them alongside the interval start
    val collapsed = runs.groupBy(col("k"), col("version"))
      .agg(min(col("t")).as("valid_from"), min(col("a")).as("a"))
    val verW = Window.partitionBy(col("k")).orderBy(col("version"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(verW))
      .select(Seq(col("k"), col("version"), col("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.cast("long").as("is_current")) ++
        attrs.map { case (n, _) => col(s"a.$n").as(n) }: _*)
  }
}
