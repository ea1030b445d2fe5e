package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Experimentation analytics over the per-key temporal frames — the two
 * readouts every product team runs on top of a funnel: did the treatment
 * move the metric (A/B test), and how long do conversions take
 * (latency distribution). Both are pure aggregations: nothing here
 * rescans or reshuffles the event log beyond the one key shuffle the
 * underlying frame already paid.
 */
object Experiment {

  /** Two-arm Welch z-test over per-unit metrics: `armCol` must be
    * 0 (control) / 1 (treatment), one row per experimental unit
    * (pre-aggregate per user upstream — unit-level rows are what makes
    * the variance estimate honest under repeated measures). Output: ONE
    * row `(n_a, n_b, mean_a, mean_b, lift, z, significant)` where
    * `z = (mean_b − mean_a) / sqrt(v_a/n_a + v_b/n_b)` (Welch, unequal
    * variances) and `significant` is the two-sided 5% test
    * (`|z| > 1.96` — the normal approximation; with thousands of units
    * per arm the t correction is noise). Plan: one partial-agg over the
    * units, then a 1×1 broadcast-scalar cross join — the per-arm
    * moments are the ONLY thing that ever leaves the executors. */
  def abTest(units: DataFrame, armCol: Column, metricCol: Column): DataFrame = {
    val s = units.select(armCol.cast("int").as("arm"),
        metricCol.cast("double").as("m"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), avg("m").as("mu"), var_samp("m").as("v"))
    val a = s.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("mu").as("mu_a"), col("v").as("v_a"))
    val b = s.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("mu").as("mu_b"), col("v").as("v_b"))
    val z = (col("mu_b") - col("mu_a")) /
      sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b"))
    a.crossJoin(b)
      .select(col("n_a"), col("n_b"),
        round(col("mu_a"), 4).as("mean_a"),
        round(col("mu_b"), 4).as("mean_b"),
        round(col("mu_b") - col("mu_a"), 4).as("lift"),
        round(z, 4).as("z"),
        (abs(z) > 1.96).as("significant"))
  }

  /** Step-to-step conversion latency distribution over
    * [[Temporal.funnelSteps]]: for every adjacent step pair the key
    * completed, the seconds between the two earliest in-order
    * completions — reported per FROM-step as converted count, median
    * and p90 (exact interpolated percentiles; swap in
    * `approx_percentile` at corpus scale, the q63/q65 pairing). The
    * per-key frame self-joins on (key, step) — ints only — and one
    * grouped agg reads it off. Output:
    * `(step_idx, step, n_converted, p50_s, p90_s)`, `step_idx` the
    * 1-based FROM step. */
  def funnelLatency(events: DataFrame, keyCol: Column, typeCol: Column,
      timeCol: Column, steps: Seq[String]): DataFrame = {
    val st = Temporal.funnelSteps(events, keyCol, typeCol, timeCol, steps)
    val nxt = st.select(col("k"), (col("step_idx") - 1).as("step_idx"),
      col("reached_at").as("__next_at"))
    st.join(nxt, Seq("k", "step_idx"))
      .select(col("step_idx"), col("step"),
        ((unix_micros(col("__next_at")) - unix_micros(col("reached_at"))) /
          lit(1e6)).as("lat"))
      .groupBy("step_idx", "step")
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat, 0.5)"), 4).as("p50_s"),
        round(expr("percentile(lat, 0.9)"), 4).as("p90_s"))
      .orderBy("step_idx")
  }
}
