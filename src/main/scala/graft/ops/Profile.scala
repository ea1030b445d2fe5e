package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * Dataset profiling — the first thing run against any new table at
 * scale: per-column cardinality, null rates, moments and value entropy
 * in ONE pass over the data, as a long-format frame dashboards and
 * drift checks ([[TextAnalysis]] PSI/KL) can diff across snapshots.
 */
object Profile {

  /** Column profiles for `cols`: one output row per column with
    * `(col_name, n, n_null, n_distinct, entropy, min_v, max_v, mean,
    * std, avg_len)` — min/max/mean/std over numeric columns (null for
    * strings), `avg_len` the mean string length (null for numerics),
    * `entropy` the Shannon entropy (bits, log₂) of the non-null value
    * distribution — DuckDB `entropy()` semantics.
    *
    * Plan: the selected columns melt to `(col, string_key, double_val,
    * len)` via ONE explode — a single scan of exactly the profiled
    * columns (column pruning holds) — then two grouped partial
    * aggregations: per-column moments, and per-(column, value) counts
    * reduced to cardinality + entropy through the identity
    * `H = log₂T − Σ c·log₂c / T` (one pass, no p-normalization
    * materialized). The (column, value) grouping is the heavy stage —
    * it is per-column-distinct-sized; at extreme cardinality swap it
    * for `approx_count_distinct` + a CMS-based entropy estimate and
    * keep the moments pass as-is. Distinctness is over the string
    * rendering (injective for the usual types; NaN/-0.0 collapse is
    * the documented caveat). */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns: need at least one column")
    val entries = cols.map { c =>
      val dt = df.schema(c).dataType
      val dv = dt match {
        case _: NumericType => col(c).cast("double")
        case _ => lit(null).cast("double")
      }
      val ln = dt match {
        case StringType => length(col(c)).cast("double")
        case _ => lit(null).cast("double")
      }
      struct(lit(c).as("c"), col(c).cast("string").as("sv"),
        dv.as("dv"), ln.as("ln"))
    }
    val melted = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.c").as("c"), col("e.sv").as("sv"),
        col("e.dv").as("dv"), col("e.ln").as("ln"))
    val direct = melted.groupBy("c").agg(
      count(lit(1)).as("n"),
      sum(col("sv").isNull.cast("long")).as("n_null"),
      round(min(col("dv")), 4).as("min_v"),
      round(max(col("dv")), 4).as("max_v"),
      round(avg(col("dv")), 4).as("mean"),
      round(stddev_samp(col("dv")), 4).as("std"),
      round(avg(col("ln")), 4).as("avg_len"))
    val dist = melted.filter(col("sv").isNotNull)
      .groupBy("c", "sv").agg(count(lit(1)).as("cnt"))
      .groupBy("c").agg(count(lit(1)).as("n_distinct"),
        sum(col("cnt")).as("__T"),
        sum(col("cnt") * log(2.0, col("cnt"))).as("__S"))
      .select(col("c"), col("n_distinct"),
        round(log(2.0, col("__T")) - col("__S") / col("__T"), 4)
          .as("entropy"))
    direct.join(dist, Seq("c"), "left")
      .select(col("c").as("col_name"), col("n"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("entropy"), col("min_v"), col("max_v"), col("mean"),
        col("std"), col("avg_len"))
  }

  /** Percentile winsorization: per group (empty `keys` = global), clip
    * `valCol` to its [pLow, pHigh] EXACT quantiles (linear
    * interpolation — `quantile_cont` semantics) and flag the clipped
    * rows — the outlier guard ahead of means/regressions that a single
    * fat-finger value would otherwise own. Output:
    * `(id, …keys, value, clipped, was_clipped)`.
    *
    * Plan: one grouped `percentile` aggregation produces the |groups|
    * bounds frame, broadcast-joined back — the data never shuffles, a
    * scan + a map. Exact percentile sorts per group inside the agg; at
    * extreme per-group row counts swap in `approx_percentile` (same
    * plan, rank-error-bounded bounds). */
  def winsorize(df: DataFrame, idCol: Column, keys: Seq[String],
      valCol: Column, pLow: Double, pHigh: Double): DataFrame = {
    require(pLow >= 0 && pLow < pHigh && pHigh <= 1,
      "winsorize: need 0 <= pLow < pHigh <= 1")
    val keyCols = keys.map(col)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
      valCol.cast("double").as("value"): _*)
    val bounds = base.groupBy(keyCols: _*).agg(
      expr(s"percentile(value, ${pLow}d)").as("__lo"),
      expr(s"percentile(value, ${pHigh}d)").as("__hi"))
    val joined =
      if (keys.isEmpty) base.crossJoin(broadcast(bounds))
      else base.join(broadcast(bounds), keys)
    joined.select((col("id") +: keyCols) ++ Seq(col("value"),
      round(greatest(col("__lo"), least(col("__hi"), col("value"))), 4)
        .as("clipped"),
      (col("value") < col("__lo") || col("value") > col("__hi"))
        .cast("long").as("was_clipped")): _*)
  }
}
