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

  /** Per-group z-score standardization — the feature-scaling companion
    * to [[winsorize]]: `z = (x − mean)/std` (sample std) against the
    * row's group moments, null when the group's std is 0 or undefined
    * (single-row groups). Output: `(id, …keys, value, z)` at 4dp.
    *
    * Same scale shape as winsorize: the group moments are ONE partial-
    * agg'd pass, broadcast back; the standardization is a map-side
    * projection — the fact table never shuffles. */
  def standardize(df: DataFrame, idCol: Column, keys: Seq[String],
      valCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
      valCol.cast("double").as("value"): _*)
    val moments = base.groupBy(keyCols: _*).agg(
      avg(col("value")).as("__mu"), stddev_samp(col("value")).as("__sd"))
    val joined =
      if (keys.isEmpty) base.crossJoin(broadcast(moments))
      else base.join(broadcast(moments), keys)
    joined.select((col("id") +: keyCols) ++ Seq(
      round(col("value"), 4).as("value"),
      round(when(col("__sd") > 0,
        (col("value") - col("__mu")) / col("__sd")), 4).as("z")): _*)
  }

  /** Data-quality gate over row-level expectations: each rule is a
    * `(name, predicate)` where the predicate holding means the row
    * PASSES (a null predicate — e.g. a comparison against a null
    * column — counts as a violation, the conservative reading).
    * Output: `(rule, n_rows, violations, pass_rate)` (4dp), one row
    * per rule.
    *
    * Plan: ALL rules evaluate in ONE scan — a single aggregate with one
    * conditional sum per rule (partial-agg'd, no shuffle beyond the
    * 1-row final), then the 1×R wide row melts to R rows driver-free.
    * Adding a rule costs one more column in the same pass, never
    * another pass; at 100 TB the report costs exactly one read of the
    * checked columns. */
  def dqReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "dqReport: need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "dqReport: rule names must be distinct")
    val aggs = rules.zipWithIndex.map { case ((_, p), i) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
    }
    val counted = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = rules.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("rule"), col("__n").as("n_rows"),
        coalesce(col(s"__v$i"), lit(0L)).as("violations"))
    }
    counted.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"),
        col("r.violations").as("violations"),
        round(when(col("r.n_rows") === 0, lit(1.0))
          .otherwise((col("r.n_rows") - col("r.violations")) /
            col("r.n_rows").cast("double")), 4).as("pass_rate"))
  }

  /** Key-uniqueness expectations, same output shape as [[dqReport]]:
    * for each named key set, `violations` = rows carrying a key shared
    * with at least one other row (so 0 ⇔ the columns form a candidate
    * key, and the count says how much of the table is implicated, not
    * just how many keys collide). One grouped count per key set over
    * just the key columns — partial-agg'd; key sets are checked
    * independently so each can be a separate cheap pass (they usually
    * share no columns, so one fused pass would read more, not less). */
  def dqUnique(df: DataFrame, keySets: Seq[(String, Seq[Column])]): DataFrame = {
    require(keySets.nonEmpty, "dqUnique: need at least one key set")
    val reports = keySets.map { case (name, keys) =>
      df.groupBy(keys: _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum("__c"), lit(0L)).as("__n"),
          coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)), lit(0L))
            .as("__v"))
        .select(lit(name).as("rule"), col("__n").as("n_rows"),
          col("__v").as("violations"),
          round(when(col("__n") === 0, lit(1.0))
            .otherwise((col("__n") - col("__v")) / col("__n").cast("double")),
            4).as("pass_rate"))
    }
    reports.reduce(_.unionByName(_))
  }

  /** Referential-integrity expectation, same output shape: `violations`
    * = child rows whose (non-null) foreign key misses the parent's key
    * set. A null FK is NOT a violation (nullable FKs are legal —
    * compose with a [[dqReport]] not-null rule when they aren't). One
    * left-anti join on the key — the parent side is its distinct keys
    * only, broadcast when small; the child never moves when it is. */
  def dqRefIntegrity(child: DataFrame, fk: Column, parent: DataFrame,
      pk: Column, rule: String): DataFrame = {
    val total = child.select(count(lit(1)).as("__n"))
    val missing = child.select(fk.as("__fk")).filter(col("__fk").isNotNull)
      .join(parent.select(pk.as("__fk")).distinct(), Seq("__fk"), "left_anti")
      .select(count(lit(1)).as("__v"))
    total.crossJoin(missing)
      .select(lit(rule).as("rule"), col("__n").as("n_rows"),
        col("__v").as("violations"),
        round(when(col("__n") === 0, lit(1.0))
          .otherwise((col("__n") - col("__v")) / col("__n").cast("double")),
          4).as("pass_rate"))
  }

  /** Per-group distribution moments — mean, sample variance, skewness
    * and EXCESS kurtosis from one pass of raw power sums
    * (Σx..Σx⁴, then the central-moment identities
    * `m₂ = S₂/n − m²`, `m₃ = S₃/n − 3m·S₂/n + 2m³`,
    * `m₄ = S₄/n − 4m·S₃/n + 6m²·S₂/n − 3m⁴`;
    * `skew = m₃/m₂^1.5`, `kurt = m₄/m₂² − 3`). Explicit formulas
    * instead of engine builtins because skewness/kurtosis CONVENTIONS
    * differ across engines (population vs sample, excess vs raw) —
    * the power-sum identities are the one definition every engine
    * reproduces. Output `(…keys, n, mean, variance, skew, kurt)`
    * (4dp; degenerate groups — m₂ = 0 or n < 2 — null the dependent
    * stats). ONE grouped partial-agg pass; the usual caveat that
    * power sums cancel (use only when values are ≲1e4 in magnitude —
    * document scale: v⁴ must stay ≪ 2⁵³·m₄). */
  def momentsProfile(df: DataFrame, keys: Seq[String],
      valCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val g = df.select((keyCols :+ valCol.cast("double").as("v")): _*)
      .filter(col("v").isNotNull)
      .groupBy(keyCols: _*)
      // plain multiplication, not pow(): x*x is correctly rounded and
      // engine-identical; libm pow is 1-ulp fuzzy and differs by engine
      .agg(count(lit(1)).as("n"), sum("v").as("s1"),
        sum(col("v") * col("v")).as("s2"),
        sum(col("v") * col("v") * col("v")).as("s3"),
        sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
    val n = col("n").cast("double")
    val m = col("s1") / n
    val m2 = col("s2") / n - m * m
    val m3 = col("s3") / n - lit(3.0) * m * col("s2") / n +
      lit(2.0) * m * m * m
    val m4 = col("s4") / n - lit(4.0) * m * col("s3") / n +
      lit(6.0) * m * m * col("s2") / n - lit(3.0) * m * m * m * m
    g.select(keyCols ++ Seq(col("n"),
      round(m, 4).as("mean"),
      round(when(col("n") > 1, (col("s2") - col("s1") * col("s1") / n) /
        (n - 1)), 4).as("variance"),
      round(when(m2 > 0, m3 / (m2 * sqrt(m2))), 4).as("skew"),
      round(when(m2 > 0, m4 / (m2 * m2) - 3), 4).as("kurt")): _*)
  }

  /** Per-group trimmed mean — the outlier-robust location estimate
    * between [[winsorize]] (clamp) and the median (discard all):
    * values OUTSIDE the group's `[lo, hi]` interpolated percentile
    * band are DROPPED, the rest average. Output
    * `(…keys, n, n_kept, trimmed_mean)` (4dp). Two grouped passes
    * (exact percentile bounds, then the conditional average over a
    * broadcast bounds join — the winsorize plan with a filter instead
    * of a clamp). */
  def trimmedMean(df: DataFrame, keys: Seq[String], valCol: Column,
      lo: Double = 0.1, hi: Double = 0.9): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "trimmedMean: 0 <= lo < hi <= 1")
    val keyCols = keys.map(col)
    val s = df.select((keyCols :+ valCol.cast("double").as("v")): _*)
      .filter(col("v").isNotNull)
    val bounds = s.groupBy(keyCols: _*)
      .agg(expr(s"percentile(v, ${lo}d)").as("__lo"),
        expr(s"percentile(v, ${hi}d)").as("__hi"))
    s.join(broadcast(bounds), keys)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").between(col("__lo"), col("__hi")), 1L)
          .otherwise(0L)).as("n_kept"),
        round(avg(when(col("v").between(col("__lo"), col("__hi")),
          col("v"))), 4).as("trimmed_mean"))
  }

  /** Quantile normalization across groups — maps every group's value
    * distribution onto the POOLED distribution (the cross-source score
    * equalizer microarray pipelines made standard): a row at
    * within-group quantile `p = (rank−1)/(n_g−1)` (rank by
    * `(value, id)` — the deterministic tie discipline) is replaced by
    * the pooled distribution's linearly interpolated value at position
    * `p·(N−1)` (singleton groups map to the pooled median, p = 0.5).
    * After the transform every group has an identical value
    * distribution, so one threshold means the same thing in every
    * group — the rank-preserving alternative to
    * [[Curation.crossSourceCalibration]]'s percentile bucketing.
    * Output `(id, grp, v, qnorm)` — qnorm unrounded (see below).
    *
    * Scale shape: within-group ranks come from per-GROUP windows (the
    * key shuffle); the pooled lookup table `(position → value)` is
    * built from per-VALUE counts through the range-partitioned
    * weighted prefix sum (no row-level global window) and exploded to
    * one row per position; rows then fetch their floor/ceil positions
    * through two INT equi-joins — no range join, no broadcast of a
    * corpus-sized side. */
  def quantileNormalize(df: DataFrame, idCol: Column, grpCol: Column,
      valCol: Column): DataFrame = {
    val s = df.select(idCol.as("id"), grpCol.cast("string").as("grp"),
        valCol.cast("double").as("v"))
      .filter(col("grp").isNotNull && col("v").isNotNull)
      .localCheckpoint(eager = true) // read twice: ranks + pooled table
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("v", "id")
    val ranked = s
      .withColumn("rk", row_number().over(wg))
      .withColumn("ng", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")))
    val perVal = s.groupBy("v").agg(count(lit(1)).as("t"))
    val pooled = Suffix.withWeightedOffset(perVal, Seq(col("v")),
        col("t"), "cb")
      .select(col("v").as("gv"),
        explode(sequence(col("cb") + 1, col("cb") + col("t"))).as("gp"))
    val tot = pooled.agg(count(lit(1)).as("nn"))
    val p = when(col("ng") === 1, lit(0.5))
      .otherwise((col("rk") - 1).cast("double") / (col("ng") - 1))
    val staged = ranked.crossJoin(broadcast(tot))
      .withColumn("gpos", p * (col("nn") - 1))
      .withColumn("fl", floor(col("gpos")).cast("long"))
      .withColumn("cl", least(col("fl") + 2, col("nn")))
    val lo = pooled.select(col("gp").as("gp1"), col("gv").as("lo_v"))
    val hi = pooled.select(col("gp").as("gp2"), col("gv").as("hi_v"))
    // qnorm stays UNROUNDED: the interpolation is the same IEEE op
    // sequence in any engine, but a 4dp round is not — Spark's round
    // goes through the shortest-string BigDecimal (HALF_UP on
    // "x.xxxx5"), other engines round the binary double, and
    // interpolated values DO land on those boundaries (e.g. a 5/32
    // fraction between 2-decimal inputs)
    staged
      .join(lo, col("fl") + 1 === col("gp1"))
      .join(hi, col("cl") === col("gp2"))
      .select(col("id"), col("grp"), col("v"),
        (col("lo_v") + (col("gpos") - col("fl")) *
          (col("hi_v") - col("lo_v"))).as("qnorm"))
  }
}
