package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}
import graft.queries.QShared._

/** Part 5/6 of the ops query registry (q264_time_decay_attribution..q312_pii_spans) — mechanical
  * wave split of the round-11 monolith; entry bodies are verbatim and
  * [[OpsQueries]] merges the parts, so keys, plans and oracle SQL are
  * unchanged. Each query keeps its DuckDB oracle co-located. */
private[queries] object OpsQueriesP5 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q264_time_decay_attribution" -> ((s, d) => {
      // q249's candidate set (same-user clicks in the purchase's
      // trailing 3-day window via the KEYED range join), credited by
      // recency: weight 0.5^(Δt / 1 day), renormalized per purchase
      graft.ops.Analytics.attributionCredits(
        attributionTouches(s, d), col("pid"), col("cid"),
        col("t_ts"), col("c_ts"), "time_decay",
        halfLifeMicros = 24L * 3600 * 1000000L)
        .orderBy("conversion_id", "touch_id")
    }),
    "q265_position_attribution" -> ((s, d) => {
      // the U-shaped model over the same candidate set: 40% first
      // touch, 40% last, 20% spread over middles (50/50 at two
      // touches, 100% at one)
      graft.ops.Analytics.attributionCredits(
        attributionTouches(s, d), col("pid"), col("cid"),
        col("t_ts"), col("c_ts"), "position")
        .orderBy("conversion_id", "touch_id")
    }),
    "q266_triangles" -> ((s, d) => {
      // co-purchase graph: parts sharing an order are linked (pair
      // fan-out bounded by the per-order item count), then per-node
      // triangle counts + clustering coefficient via degree-oriented
      // wedges — never a hub-quadratic join
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      // co-purchase edge set (~1M) fits the driver: broadcast the
      // closing-edge lookup so the Σ outdeg²-sized wedge frame never
      // shuffles
      graft.ops.Graph.triangleStats(e, col("a"), col("b"),
          broadcastEdges = true)
        .orderBy("id")
    }),
    "q267_profile" -> ((s, d) =>
      // one-pass column profiles of the event log: ONE explode melt,
      // a moments agg, and a per-(col, value) cardinality/entropy agg
      graft.ops.Profile.profileColumns(ev(s, d),
        Seq("event_id", "user_id", "event_type", "value"))
        .orderBy("col_name")),
    "q268_winsorize" -> ((s, d) =>
      // per-event-type p01/p99 winsorization: one grouped exact
      // percentile → broadcast bounds → map-side clip + flag
      graft.ops.Profile.winsorize(ev(s, d), col("event_id"),
        Seq("event_type"), col("value"), 0.01, 0.99)
        .orderBy("id")),
    "q271_removal_effect" -> ((s, d) => {
      // Markov removal-effect attribution: journeys are (user, day)
      // units — the day's event-type path up to its first purchase,
      // converted iff the day purchases. The transition matrix
      // aggregates distributed; only the |channels|²-sized matrix
      // reaches the driver solver
      val e = ev(s, d).withColumn("dd", to_date(col("ts")))
      val fp = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "dd").agg(min(col("ts")).as("fpt"))
      val pre = e.join(fp, Seq("user_id", "dd"), "left")
        .filter(col("fpt").isNull || col("ts") < col("fpt"))
        .groupBy("user_id", "dd")
        .agg(transform(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")).as("p"))
      val units = e.select("user_id", "dd").distinct()
      val paths = units
        .join(pre, Seq("user_id", "dd"), "left")
        .join(fp, Seq("user_id", "dd"), "left")
        .select(coalesce(col("p"), array().cast("array<string>")).as("p"),
          col("fpt").isNotNull.as("cv"))
      graft.ops.Analytics.removalEffectAttribution(paths, col("p"),
        col("cv"), iters = 60).orderBy("channel")
    }),
    "q270_active_users_hll" -> ((s, d) =>
      // the 100 TB path for q259 (per-day HLL sketches union across the
      // window — only KB sketches fan out, never (user, day) pairs),
      // made hash-matchable via the self-certifying audit contract:
      // emit the exact rolling counts plus in-query |est−exact|/exact
      // ≤ 5% booleans; the oracle recomputes the exact twin and
      // expects all-true.
      graft.ops.Analytics.activeUsersAudit(ev(s, d), col("user_id"),
        col("ts"), Seq(1, 7, 28), tol = 0.05).orderBy("day")),
    "q269_sessions" -> ((s, d) =>
      // batch sessionization at a 2-hour inactivity gap: lag marks
      // starts, a running sum numbers sessions, one grouped agg rolls
      // up — a single key shuffle end to end
      graft.ops.Analytics.sessionize(ev(s, d), col("user_id"), col("ts"),
        col("value"), 2L * 3600 * 1000000L)
        .orderBy("k", "session_idx")),
    "q248_twap" -> ((s, d) => {
      // time-weighted average value per user over 6-hour buckets: each
      // view's value HOLDS until the user's next view (step function),
      // buckets integrate the held values normalized by covered time —
      // one lead() window + bucket-replicated clipping, no extrapolation
      val e = ev(s, d)
      val views = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts")
        .agg(max(struct(col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("ts"), col("m.value").as("v"))
      graft.ops.Temporal.timeWeightedAvg(views, col("user_id"), col("ts"),
          col("v"), bucketWidthMicros = 6L * 3600 * 1000000L)
        .orderBy("k", "bucket_start")
    }),
    "q249_linear_attribution" -> ((s, d) => {
      // multi-touch attribution: every purchase splits unit credit
      // equally across the same-user clicks in its trailing 3-day
      // window — the KEYED range join (user equi-key + day buckets)
      // keeps candidates to same-user pairs, then one grouped count
      // derives the per-touch share; never a theta join
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ts"))
      val windows = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("pu"),
          (col("ts") - expr("INTERVAL 3 DAYS")).as("st"), col("ts").as("en"))
      val touches = graft.ops.Temporal.rangeJoin(
          clicks, col("cid"), col("ts"),
          windows, col("pid"), col("st"), col("en"),
          bucketWidthMicros = 24L * 3600 * 1000000L,
          pKeys = Seq(col("user_id")), iKeys = Seq(col("pu")))
        .select(col("p_id").as("click_id"), col("i_id").as("purchase_id"))
      val n = touches.groupBy("purchase_id")
        .agg(count(lit(1)).as("n_touch"))
      touches.join(n, "purchase_id")
        .select(col("purchase_id"), col("click_id"),
          round(lit(1.0) / col("n_touch"), 4).as("credit"))
        .orderBy("purchase_id", "click_id")
    }),
    "q247_asof_nearest" -> ((s, d) => {
      // nearest as-of: the closer of the latest-before / earliest-after
      // purchase per click (equal distance → backward) — BOTH running
      // windows over ONE key shuffle, row-local closer pick
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(col("event_id")).as("p_id"))
        .select(col("user_id"), col("ts"), col("p_id"))
      graft.ops.Temporal.asofJoinNearest(clicks, purchases,
          Seq("user_id"), "ts", payload = Seq("p_id"),
          rightTiebreak = col("p_id"))
        .select(col("event_id"), col("asof_p_id").as("p_id"),
          col("asof_time").as("near_ts"))
        .orderBy("event_id")
    }),
    "q242_cohort_retention" -> ((s, d) =>
      // weekly cohort retention matrix: first-seen-day cohorts ×
      // 7-day activity offsets, distinct users per cell
      graft.ops.Temporal.cohortRetention(ev(s, d), col("user_id"),
          col("ts"), periodDays = 7)
        .orderBy("cohort_day", "period_idx")),
    "q272_gram_spectrum" -> ((s, d) =>
      // every gram length 1..64 answered from ONE suffix ranking +
      // integer LCP table — the per-length gram alternative re-scans
      // the corpus 64 times; here text ships once (the LCP join) and
      // the census is an integer explode. Same bounded sub-corpus as
      // q152 (the suffix-family verification input).
      graft.ops.Suffix.gramSpectrum(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), minLen = 1, maxLen = 64)
        .orderBy("len")),
    "q273_dq_report" -> ((s, d) => {
      // data-quality gate: four row-level rules in ONE scan (one
      // conditional sum each), key uniqueness as one grouped count,
      // referential integrity as one anti-join against the distinct
      // parent keys — a fixed number of passes however many rules
      val li = t(s, d, "lineitem")
      val rules = graft.ops.Profile.dqReport(li, Seq(
        "discount_max" -> (col("l_discount") <= 0.08),
        "flag_domain" -> col("l_returnflag").isin("A", "N", "R"),
        "price_positive" -> (col("l_extendedprice") > 0),
        "qty_range" -> col("l_quantity").between(1, 50)))
      val uniq = graft.ops.Profile.dqUnique(li,
        Seq("pk_unique" -> Seq(col("l_orderkey"), col("l_linenumber"))))
      val ref = graft.ops.Profile.dqRefIntegrity(li, col("l_orderkey"),
        t(s, d, "orders"), col("o_orderkey"), "fk_orders")
      rules.unionByName(uniq).unionByName(ref).orderBy("rule")
    }),
    "q274_scd2" -> ((s, d) =>
      // SCD type-2 history of each user's event-type state: one key
      // shuffle for the change-detection window, then version-level
      // frames only
      graft.ops.Warehouse.scd2(ev(s, d), col("user_id"), col("ts"),
          col("event_id"), Seq("state" -> col("event_type")))
        .orderBy("k", "version")),
    "q275_sorted_neighborhood" -> ((s, d) =>
      // sorted-neighborhood blocking: global range-partitioned rank on
      // the name, candidates = the w-1 next ranks via ONE integer
      // equi-join (n·(w−1) pairs regardless of skew), JW scored
      // row-local
      graft.ops.Linkage.sortedNeighborhoodJoin(t(s, d, "customer"),
          col("c_custkey"), col("c_name"), col("c_name"),
          window = 4, minSim = 0.9)
        .orderBy("a_id", "b_id")),
    "q276_linkage_score" -> ((s, d) => {
      // Fellegi–Sunter scoring over (nation, segment)-blocked customer
      // pairs: agreement predicates are engine-shared functions
      // (levenshtein, abs), weights are driver-side literals — the
      // scoring itself is a zero-shuffle projection
      // spread BEFORE the self-join: the customer scan is one row group
      // at bench scale, and a broadcast self-join would run the whole
      // |block|²/2 levenshtein fan-out inside that single scan task (18 s
      // serial vs ~2 s spread). spreadSmallScan PINS the partition count
      // — a bare repartition(cols) is AQE-coalesced right back to one
      // task on a tiny shuffle — and no-ops at corpus scale
      val c = graft.ops.Dedup.spreadSmallScan(
        t(s, d, "customer").select(col("c_custkey").as("id"),
          col("c_name").as("nm"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"), col("c_acctbal").as("bal")),
        col("id"))
      val pairs = c.as("a").join(c.as("b"),
          col("a.nk") === col("b.nk") && col("a.seg") === col("b.seg") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
          col("a.nm").as("a_name"), col("b.nm").as("b_name"),
          col("a.bal").as("a_bal"), col("b.bal").as("b_bal"))
      graft.ops.Linkage.linkageScore(pairs, Seq(
          ("name", levenshtein(col("a_name"), col("b_name")) <= 2,
            0.9, 0.05),
          ("bal", abs(col("a_bal") - col("b_bal")) < lit(100.0),
            0.8, 0.1)),
          upper = 3.0, lower = -4.0)
        .orderBy("a_id", "b_id")
    }),
    "q277_kaplan_meier" -> ((s, d) => {
      // time-to-first-purchase survival with administrative censoring
      // at a 2-day horizon (subjects not converted by then censor at
      // t=2); the KM table is a grouped count + cumulative windows
      // over the |distinct durations| frame
      val e = ev(s, d)
      val first = e.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"))
      val conv = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("dp"))
      val subjects = first.join(conv, Seq("user_id"), "left")
        .select(
          when(col("dp").isNotNull && datediff(col("dp"), col("d0")) <= 2,
            datediff(col("dp"), col("d0"))).otherwise(2).as("dur"),
          (col("dp").isNotNull && datediff(col("dp"), col("d0")) <= 2)
            .as("obs"))
      graft.ops.Analytics.kaplanMeier(subjects, col("dur"), col("obs"))
        .orderBy("t")
    }),
    "q278_assoc_rules" -> ((s, d) =>
      // market-basket rules over order → part baskets: choose-2
      // per-basket pair fan-out, broadcast item counts, 4dp
      // support/confidence/lift
      graft.ops.Analytics.associationRules(t(s, d, "lineitem"),
          col("l_orderkey"), col("l_partkey"), minPairs = 2)
        .orderBy("antecedent", "consequent")),
    "q279_cube" -> ((s, d) =>
      // CUBE over (returnflag, linestatus): all four grouping sets in
      // one pass (Expand + partial agg); rolled-up keys render 'ALL'
      // so ordering is engine-portable
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"), col("avg_price"))
        .orderBy("rf", "ls")),
    "q280_pivot" -> ((s, d) =>
      // wide activity matrix: one groupBy + pivot with an EXPLICIT
      // value list (no discovery pass) — a single shuffle producing
      // |types| conditional aggregates per user
      ev(s, d).groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 4))
        .orderBy("user_id")),
    "q281_trend" -> ((s, d) =>
      // per-type linear trend of value over elapsed days: regr_* are
      // moment aggregates (one partial-agg pass, no sort, no window)
      ev(s, d)
        .select(col("event_type"),
          (unix_micros(col("ts")) / lit(86400000000.0)).as("x"),
          col("value").as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(expr("regr_slope(y, x)"), 4).as("slope"),
          round(expr("regr_intercept(y, x)"), 4).as("intercept"),
          round(expr("regr_r2(y, x)"), 4).as("r2"))
        .orderBy("event_type")),
    "q282_benford" -> ((s, d) =>
      // Benford first-digit audit of prices: digit extraction is pure
      // arithmetic (floor/log10 — identical doubles on every engine),
      // then one 9-row grouped count against the log10(1+1/d) law
      t(s, d, "lineitem")
        .filter(col("l_extendedprice") > 0)
        .select(floor(col("l_extendedprice") /
          pow(lit(10.0), floor(log10(col("l_extendedprice")))))
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(t(s, d, "lineitem")
          .filter(col("l_extendedprice") > 0)
          .agg(count(lit(1)).as("__t"))))
        .select(col("digit"), col("n"),
          round(col("n") / col("__t").cast("double"), 4).as("obs_p"),
          round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("exp_p"))
        .orderBy("digit")),
    "q283_gini" -> ((s, d) =>
      // revenue concentration across customers: per-customer totals
      // (one grouped sum), then the rank-identity Gini over a
      // range-partitioned global index — no single-task sort
      graft.ops.Analytics.giniCoefficient(
        t(s, d, "orders").groupBy("o_custkey")
          .agg(sum("o_totalprice").as("spend")),
        col("spend"), col("o_custkey"))),
    "q284_rfm" -> ((s, d) => {
      // RFM quintile segmentation: three per-customer aggregates from
      // ONE pass over orders, each binned by the window-free quantile
      // binner (exact percentile cut points broadcast, row-local fold)
      val o = t(s, d, "orders")
      val study = o.agg(max(to_date(col("o_orderdate"))).as("dm"))
      val per = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_day"),
          count(lit(1)).as("f"), round(sum("o_totalprice"), 4).as("m"))
        .crossJoin(broadcast(study))
        .select(col("o_custkey").as("id"),
          datediff(col("dm"), col("last_day")).cast("double").as("r"),
          col("f").cast("double").as("fd"), col("m"))
      def bins(src: org.apache.spark.sql.DataFrame, c: String, out: String) =
        graft.ops.Curation.quantileBins(src, col("id"), col(c), 5)
          .select(col("id"), col("bin").as(out))
      per.join(bins(per, "r", "r_bin"), "id")
        .join(bins(per, "fd", "f_bin"), "id")
        .join(bins(per, "m", "m_bin"), "id")
        .select(col("id"), col("r").cast("long").as("recency_days"),
          col("fd").cast("long").as("frequency"), col("m").as("monetary"),
          col("r_bin"), col("f_bin"), col("m_bin"),
          (col("r_bin") * 100 + col("f_bin") * 10 + col("m_bin"))
            .as("segment"))
        .orderBy("id")
    }),
    "q285_holt" -> ((s, d) =>
      // Holt level+trend per user: the full prefix recurrence folded
      // in-task over each key's sorted series — one key shuffle, no
      // driver loop, no window
      graft.ops.Temporal.holtSmooth(ev(s, d), col("user_id"), col("ts"),
          col("event_id"), col("value"), alpha = 0.5, beta = 0.3,
          horizon = 3)
        .orderBy("k")),
    "q286_skew_report" -> ((s, d) =>
      // pre-shuffle skew audit of a join key: one grouped count is the
      // only corpus pass; percentiles + top-N run over the |keys| table.
      // top_keys stringified so every result column is scalar (the
      // driver's pandas sort/hash can't handle array cells)
      graft.ops.Scale.skewReport(t(s, d, "lineitem"), col("l_partkey"),
          topN = 5)
        .withColumn("top_keys", array_join(col("top_keys"), ","))),
    "q287_standardize" -> ((s, d) =>
      // per-type z-scores: broadcast group moments, map-side transform
      // — the fact table never shuffles
      graft.ops.Profile.standardize(ev(s, d), col("event_id"),
          Seq("event_type"), col("value"))
        .orderBy("id")),
    "q288_kmv_distinct" -> ((s, d) => {
      // KMV distinct sketch vs exact, per source: md5 determinism
      // makes the ESTIMATE itself oracle-exact; the exact column is
      // the verification join, not part of the sketch
      val tk = t(s, d, "documents")
        .select(col("source"),
          explode(array_remove(split(trim(col("text")), "\\s+"), ""))
            .as("w"))
      val est = graft.ops.Scale.kmvDistinct(tk, Seq("source"), col("w"),
        k = 16)
      val exact = tk.groupBy("source")
        .agg(count_distinct(col("w")).as("exact_distinct"))
      est.join(exact, "source")
        .select(col("source"), col("exact_distinct"),
          col("est_distinct"))
        .orderBy("source")
    }),
    "q289_window_funnel" -> ((s, d) =>
      // conversion-deadline funnel: later steps count only within 24 h
      // of the first-signup anchor — same single-shuffle greedy fold,
      // one extra deadline conjunct
      graft.ops.Temporal.funnelStepsWindowed(ev(s, d), col("user_id"),
          col("event_type"), col("ts"),
          Seq("signup", "view", "click", "purchase"),
          windowMicros = 24L * 3600 * 1000000L)
        .orderBy("step_idx", "k")),
    "q290_mann_whitney" -> ((s, d) => {
      // nonparametric A/B over per-user totals: the pool collapses to
      // per-value (count, arm-1 count) rows; midranks via the weighted
      // prefix sum — no row-level global window
      val units = ev(s, d).groupBy("user_id")
        .agg(sum("value").as("m"))
        .select((col("user_id") % 2).cast("int").as("arm"), col("m"))
      graft.ops.Experiment.mannWhitney(units, col("arm"), col("m"))
    }),
    "q291_maximal_repeats" -> ((s, d) =>
      // boilerplate-template miner: repeats of 2..6 tokens that extend
      // neither way — grams hash in-projection, only (len, hash,
      // neighbor) rows shuffle, witness text via one small join
      graft.ops.Suffix.maximalRepeats(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), minLen = 2, maxLen = 6,
          minCount = 3)
        .orderBy("len", "gram")),
    "q292_maximal_repeats_all" -> ((s, d) =>
      // NO length cap: every maximal repeat from one suffix ranking —
      // LCP-interval candidates, sparse-table ANSV bounds, prefix-sum
      // left-maximality; all integer shuffles after the one LCP join
      graft.ops.Suffix.maximalRepeatsAll(
          t(s, d, "documents").filter(col("doc_id") % 10 === 0),
          col("doc_id"), col("text"), minLen = 2, minCount = 3)
        .orderBy("len", "gram")),
    "q293_proportion_test" -> ((s, d) => {
      // did the treatment arm convert more? pooled two-proportion z
      // over per-user purchase flags — one partial-agg over the units
      val units = ev(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
        .select((col("user_id") % 2).cast("int").as("arm"), col("conv"))
      graft.ops.Experiment.proportionTest(units, col("arm"), col("conv"))
    }),
    "q294_chi2_independence" -> ((s, d) =>
      // is event mix independent of user cohort? one grouped count is
      // the only corpus pass; margins/expected run on the cell frame
      graft.ops.Experiment.chiSquareIndependence(
        ev(s, d).select(col("event_type"),
          (col("user_id") % 3).as("cohort")),
        col("event_type"), col("cohort"))),
    "q295_acf" -> ((s, d) => {
      // lag-1..7 autocorrelation of each type's daily volume: one keyed
      // sort powers all lags, the melt explodes |keys| rows only
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.autocorrelation(series,
          datediff(col("day"), to_date(lit("1970-01-01"))),
          Seq("event_type"), col("day"), col("v"), maxLag = 7)
        .orderBy("event_type", "lag")
    }),
    "q296_cusum" -> ((s, d) => {
      // where does each type's daily mean shift? CUSUM peak over the
      // standardized series — one keyed sort + a |keys|-max re-join
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(avg("value").as("v"))
      graft.ops.Temporal.cusumChangepoint(series,
          datediff(col("day"), to_date(lit("1970-01-01"))),
          Seq("event_type"), col("day"), col("v"), threshold = 3.0)
        .orderBy("event_type")
    }),
    "q297_posting_lists" -> ((s, d) =>
      // the materialized lexical index: df / total tf / first-10
      // postings per term, ids capped BEFORE the collect. postings
      // stringified so every result column is scalar-hashable
      graft.ops.Keyword.postingLists(t(s, d, "documents"),
          col("doc_id"), col("text"), minDf = 8, cap = 10)
        .withColumn("postings",
          array_join(col("postings").cast("array<string>"), ","))
        .orderBy("term")),
    "q298_kcore" -> ((s, d) => {
      // dense backbone of the co-purchase graph: iterative peeling to
      // the k-core fixpoint — per round one grouped count + two
      // semi-joins, the edge frame checkpointed O(1)-deep
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.kCore(e, col("a"), col("b"), k = 12)
        .orderBy("id")
    }),
    "q299_systematic_sample" -> ((s, d) =>
      // every-97th order in (date, key) order: range-partitioned global
      // rank + a row-local modulo — never a single-task sort
      graft.ops.Curation.systematicSample(
          t(s, d, "orders")
            .select("o_orderkey", "o_orderdate", "o_totalprice"),
          Seq(col("o_orderdate"), col("o_orderkey")), step = 97)
        .orderBy("gidx")),
    "q300_kmv_setops" -> ((s, d) => {
      // union / Jaccard / intersection estimates between every source
      // pair from k-hash sketches — pairwise work on k·|groups| rows,
      // md5 determinism makes the estimates oracle-exact
      val tk = t(s, d, "documents")
        .select(col("source"),
          explode(array_remove(split(trim(col("text")), "\\s+"), ""))
            .as("w"))
      graft.ops.Scale.kmvSetOps(tk, col("source"), col("w"), k = 32)
        .orderBy("src_a", "src_b")
    }),
    "q301_welch_ttest" -> ((s, d) => {
      // means test with honest degrees of freedom: Welch t + W-S df
      // over per-user averages — one partial-agg corpus pass
      val units = ev(s, d).groupBy("user_id")
        .agg(avg("value").as("m"))
        .select((col("user_id") % 2).cast("int").as("arm"), col("m"))
      graft.ops.Experiment.welchTTest(units, col("arm"), col("m"))
    }),
    "q302_kruskal_wallis" -> ((s, d) => {
      // 3-arm nonparametric test: pooled midranks from the weighted
      // prefix sum, per-arm rank sums, tie-corrected H
      val units = ev(s, d).groupBy("user_id")
        .agg(sum("value").as("m"))
        .select((col("user_id") % 3).cast("string").as("arm"), col("m"))
      graft.ops.Experiment.kruskalWallis(units, col("arm"), col("m"))
    }),
    "q303_bfs" -> ((s, d) => {
      // hop distances from a seed part set over the co-purchase graph:
      // level-synchronous frontier joins, visited set O(1)-deep
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val seeds = t(s, d, "part")
        .filter(col("p_partkey") % 997 === 0)
        .select(col("p_partkey"))
      graft.ops.Graph.bfsDistances(e, col("a"), col("b"),
          seeds, col("p_partkey"), maxDepth = 6)
        .orderBy("id")
    }),
    "q304_hits" -> ((s, d) => {
      // hubs/authorities on the directed supplier→part supply graph
      // (suppliers offset out of the part id space): deterministic
      // integer max-normalized iterations, oracle replays them exactly
      val e = t(s, d, "lineitem")
        .select((col("l_suppkey") + lit(1000000000L)).as("s"),
          col("l_partkey").as("p"))
      graft.ops.Graph.hits(e, col("s"), col("p"), iters = 3)
        .orderBy("id")
    }),
    "q305_theil_sen" -> ((s, d) => {
      // robust daily-volume trend per type: median pairwise slope over
      // the bounded per-key series — outliers can't drag it
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01")))
            .cast("double").as("x"), col("v"))
      graft.ops.Temporal.theilSen(series, Seq("event_type"), col("x"),
          col("v"))
        .orderBy("event_type")
    }),
    "q306_textrank" -> ((s, d) => {
      // TextRank keyphrases: adjacent-word co-occurrence edges (words
      // as md5-60-bit ids — engine-portable), symmetrized, 3 PageRank
      // iterations, top-20 words; the whole composition stays on the
      // verified integer iteration kernel
      val toks = t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(array_remove(split(trim(col("text")), "\\s+"), "")
          .as("tk"))
        .filter(size(col("tk")) >= 2)
      val pairs = toks.select(explode(arrays_zip(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1))).as("z"))
        .select(col("z.0").as("w1"), col("z.1").as("w2"))
        .filter(col("w1") =!= col("w2"))
      val edges = pairs
        .select(graft.expr.PortableHash.hex15Col(col("w1")).as("src"),
          graft.expr.PortableHash.hex15Col(col("w2")).as("dst"))
        .unionAll(pairs
          .select(graft.expr.PortableHash.hex15Col(col("w2")).as("src"),
            graft.expr.PortableHash.hex15Col(col("w1")).as("dst")))
        .distinct()
      val words = t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(explode(array_remove(split(trim(col("text")), "\\s+"), ""))
          .as("w"))
        .select(graft.expr.PortableHash.hex15Col(col("w")).as("id"),
          col("w"))
        .distinct()
      graft.ops.Graph.pageRank(edges, col("src"), col("dst"), iters = 3)
        .join(words, "id")
        .select(col("w").as("word"), col("rank_micro"))
        .orderBy(desc("rank_micro"), asc("word"))
        .limit(20)
    }),
    "q307_pca_project" -> ((s, d) =>
      // top-2 principal directions by fixed-sweep power iteration with
      // deflation — the oracle replays the identical sweeps, so parity
      // never hangs on convergence or an engine-internal eigensolver;
      // stats via the zero-exchange co-moment pass, projection row-local
      graft.ops.Ann.pcaProject(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), dim = 64, nComponents = 2, sweeps = 30)
        .orderBy("id")),
    "q308_label_propagation" -> ((s, d) => {
      // semi-supervised topic spread: a 2% seed set's labels propagate
      // 4 synchronous majority rounds over the co-purchase graph —
      // seeds clamp, ties break to the smallest label
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val seeds = t(s, d, "part")
        .filter(col("p_partkey") % 50 === 0)
        .select(col("p_partkey"), (col("p_partkey") % 7).as("cls"))
      graft.ops.Graph.labelPropagation(e, col("a"), col("b"),
          seeds, col("p_partkey"), col("cls"), iters = 4)
        .orderBy("id")
    }),
    "q309_cross_folds" -> ((s, d) =>
      // content-addressed 5-fold assignment: stable across runs and
      // engines, no RNG state — per-doc fold + the size histogram is
      // the oracle's identical md5 arithmetic
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.Curation.crossFold(col("doc_id"), 5).as("fold"))
        .orderBy("doc_id")),
    "q310_holt_winters" -> ((s, d) => {
      // weekly-seasonal triple smoothing of daily cohort volumes: the
      // full level+trend+seasonal recurrence folded in-task per key;
      // the oracle replays it through a list-carrying recursive CTE
      val series = ev(s, d)
        .groupBy((col("user_id") % 3).as("k"),
          to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.holtWintersSmooth(series, col("k"), col("day"),
          datediff(col("day"), to_date(lit("1970-01-01"))), col("v"),
          alpha = 0.5, beta = 0.3, gamma = 0.4, period = 7, horizon = 2)
        .orderBy("k")
    }),
    "q311_glove_cooccurrence" -> ((s, d) =>
      // the GloVe input matrix: window-4 distance-discounted pair
      // weights in exact integer 1/12 units — row-local expansion,
      // only (w1, w2, weight) rows shuffle
      graft.ops.TextAnalysis.gloveCooccurrence(
          t(s, d, "documents").filter(col("doc_id") % 3 === 0),
          col("text"), window = 4, minCount = 10)
        .orderBy("w1", "w2")),
    "q312_pii_spans" -> ((s, d) => {
      // character-position PII spans over the q161 decorated corpus,
      // made hash-matchable: per (doc, class) emit the span count, the
      // ordered matched strings, and an in-query slices_match boolean
      // certifying every span slices back to its matched text. DuckDB
      // recomputes counts + matched strings via regexp_extract_all;
      // the raw positions stay spec-pinned (TextAnalysisSpec).
      val base = piiDecorated(t(s, d, "documents"))
        .select(col("doc_id").cast("long").as("id"), col("ptext"))
      graft.ops.TextAnalysis.piiSpans(base, col("id"), col("ptext"))
        .join(base, "id")
        .withColumn("__ok",
          col("ptext").substr((col("start_pos") + 1).cast("int"),
            (col("end_pos") - col("start_pos")).cast("int"))
            === col("matched"))
        .groupBy("id", "pii_class")
        .agg(count(lit(1)).as("n_spans"),
          array_join(transform(
            array_sort(collect_list(struct(col("start_pos"),
              col("matched")))),
            x => x.getField("matched")), "|").as("matched_seq"),
          bool_and(col("__ok")).as("slices_match"))
        .orderBy("id", "pii_class")
    })
  )

  val oracle: Map[String, String] = Map(
    "q264_time_decay_attribution" ->
      """WITH c AS (SELECT event_id AS cid, user_id, ts FROM events
                 WHERE event_type = 'click'),
         w AS (SELECT event_id AS pid, user_id,
                      ts - INTERVAL 3 DAY AS st, ts AS en
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT w.pid, c.cid, epoch_us(c.ts) AS tt,
                      epoch_us(w.en) AS ct
               FROM c JOIN w ON c.user_id = w.user_id
                  AND c.ts >= w.st AND c.ts < w.en),
         r AS (SELECT pid, cid,
                 pow(0.5, (ct - tt) / 86400000000.0) AS raw FROM t)
         SELECT pid AS conversion_id, cid AS touch_id,
           round(raw / sum(raw) OVER (PARTITION BY pid), 4) AS credit
         FROM r ORDER BY conversion_id, touch_id""",
    "q265_position_attribution" ->
      """WITH c AS (SELECT event_id AS cid, user_id, ts FROM events
                 WHERE event_type = 'click'),
         w AS (SELECT event_id AS pid, user_id,
                      ts - INTERVAL 3 DAY AS st, ts AS en
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT w.pid, c.cid, epoch_us(c.ts) AS tt
               FROM c JOIN w ON c.user_id = w.user_id
                  AND c.ts >= w.st AND c.ts < w.en),
         r AS (SELECT pid, cid,
                 row_number() OVER (PARTITION BY pid
                   ORDER BY tt, cid) AS rn,
                 count(*) OVER (PARTITION BY pid) AS n FROM t),
         v AS (SELECT pid, cid,
                 CASE WHEN n = 1 THEN 1.0
                      WHEN rn = 1 OR rn = n THEN 0.4
                      ELSE 0.2 / (n - 2) END AS raw FROM r)
         SELECT pid AS conversion_id, cid AS touch_id,
           round(raw / sum(raw) OVER (PARTITION BY pid), 4) AS credit
         FROM v ORDER BY conversion_id, touch_id""",
    "q266_triangles" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e AS (SELECT DISTINCT x.p AS a, y.p AS b
               FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         deg AS (SELECT id, count(*) AS degree FROM (
                   SELECT a AS id FROM e UNION ALL SELECT b FROM e)
                 GROUP BY id),
         tr AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         pn AS (SELECT id, count(*) AS triangles FROM (
                  SELECT x AS id FROM tr UNION ALL
                  SELECT y FROM tr UNION ALL SELECT z FROM tr)
                GROUP BY id)
         SELECT deg.id, deg.degree,
           coalesce(pn.triangles, 0) AS triangles,
           round(CASE WHEN deg.degree >= 2 THEN
               coalesce(pn.triangles, 0) * 2.0 /
                 (deg.degree * (deg.degree - 1))
             ELSE 0.0 END, 4) AS clustering
         FROM deg LEFT JOIN pn ON pn.id = deg.id ORDER BY deg.id""",
    "q267_profile" ->
      """WITH p AS (
           SELECT 'event_id' AS col_name, count(*) AS n,
             count(*) - count(event_id) AS n_null,
             count(DISTINCT event_id) AS n_distinct,
             round(entropy(event_id), 4) AS entropy,
             round(min(event_id), 4) AS min_v,
             round(max(event_id), 4) AS max_v,
             round(avg(event_id), 4) AS mean,
             round(stddev_samp(event_id), 4) AS std,
             CAST(NULL AS DOUBLE) AS avg_len
           FROM events
           UNION ALL
           SELECT 'user_id', count(*), count(*) - count(user_id),
             count(DISTINCT user_id), round(entropy(user_id), 4),
             round(min(user_id), 4), round(max(user_id), 4),
             round(avg(user_id), 4), round(stddev_samp(user_id), 4),
             NULL
           FROM events
           UNION ALL
           SELECT 'event_type', count(*), count(*) - count(event_type),
             count(DISTINCT event_type), round(entropy(event_type), 4),
             NULL, NULL, NULL, NULL,
             round(avg(length(event_type)), 4)
           FROM events
           UNION ALL
           SELECT 'value', count(*), count(*) - count(value),
             count(DISTINCT value), round(entropy(value), 4),
             round(min(value), 4), round(max(value), 4),
             round(avg(value), 4), round(stddev_samp(value), 4),
             NULL
           FROM events)
         SELECT * FROM p ORDER BY col_name""",
    "q268_winsorize" ->
      """WITH b AS (SELECT event_type,
                 quantile_cont(value, 0.01) AS lo,
                 quantile_cont(value, 0.99) AS hi
               FROM events GROUP BY event_type)
         SELECT e.event_id AS id, e.event_type, e.value,
           round(greatest(b.lo, least(b.hi, e.value)), 4) AS clipped,
           CAST(e.value < b.lo OR e.value > b.hi AS BIGINT)
             AS was_clipped
         FROM events e JOIN b USING (event_type) ORDER BY id""",
    "q271_removal_effect" -> removalEffectOracle(60),
    "q270_active_users_hll" ->
      """WITH pairs AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS d
                 FROM events),
         days AS (SELECT DISTINCT d AS day FROM pairs)
         SELECT day,
           count(DISTINCT CASE WHEN p.d = day THEN p.k END) AS exact_1,
           count(DISTINCT CASE WHEN p.d > day - 7 THEN p.k END) AS exact_7,
           count(DISTINCT p.k) AS exact_28,
           true AS ok_1, true AS ok_7, true AS ok_28
         FROM days JOIN pairs p ON p.d <= day AND p.d > day - 28
         GROUP BY day ORDER BY day""",
    "q269_sessions" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS t, value AS v,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts) > 7200000000
                   OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL THEN 1 ELSE 0 END AS nw
               FROM events),
         s AS (SELECT k, t, v, CAST(sum(nw) OVER (PARTITION BY k
                 ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_idx FROM e)
         SELECT k, session_idx, make_timestamp(min(t)) AS start,
           make_timestamp(max(t)) AS "end", count(*) AS n_events,
           round(sum(v), 4) AS value_sum
         FROM s GROUP BY k, session_idx ORDER BY k, session_idx""",
    "q248_twap" ->
      """WITH p0 AS (SELECT user_id, ts, value,
                 row_number() OVER (PARTITION BY user_id, ts
                                    ORDER BY event_id DESC) AS rn
               FROM events WHERE event_type = 'view'),
         d AS (SELECT user_id AS k, epoch_us(ts) AS t, value AS v
               FROM p0 WHERE rn = 1),
         s AS (SELECT k, t, v,
                 lead(t) OVER (PARTITION BY k ORDER BY t) AS e
               FROM d),
         seg AS (SELECT * FROM s WHERE e IS NOT NULL AND e > t),
         ex AS (SELECT k, v, t, e,
                 unnest(generate_series(t // 21600000000,
                   (e - 1) // 21600000000)) AS bk
               FROM seg),
         ov AS (SELECT k, bk, v,
                 CAST(least(e, (bk + 1) * 21600000000) -
                      greatest(t, bk * 21600000000) AS DOUBLE) AS o
               FROM ex)
         SELECT k, make_timestamp(bk * 21600000000) AS bucket_start,
                round(sum(v * o) / sum(o), 4) AS twa,
                CAST(sum(o) AS BIGINT) AS covered_micros
         FROM ov GROUP BY k, bk ORDER BY k, bucket_start""",
    "q249_linear_attribution" ->
      """WITH c AS (SELECT event_id AS cid, user_id, ts FROM events
                 WHERE event_type = 'click'),
         w AS (SELECT event_id AS pid, user_id,
                      ts - INTERVAL 3 DAY AS st, ts AS en
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT w.pid, c.cid FROM c JOIN w
               ON c.user_id = w.user_id
                  AND c.ts >= w.st AND c.ts < w.en),
         n AS (SELECT pid, count(*) AS nt FROM t GROUP BY pid)
         SELECT t.pid AS purchase_id, t.cid AS click_id,
                round(1.0 / n.nt, 4) AS credit
         FROM t JOIN n USING (pid) ORDER BY purchase_id, click_id""",
    "q247_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
         p AS (SELECT user_id, ts, max(event_id) AS p_id FROM events
               WHERE event_type = 'purchase' GROUP BY user_id, ts),
         b AS (SELECT c.event_id, c.ts AS cts, p.p_id AS bp, p.ts AS bt
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts >= p.ts),
         f AS (SELECT c.event_id, p.p_id AS fp, p.ts AS ft
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts <= p.ts)
         SELECT b.event_id,
                CASE WHEN ft IS NULL THEN bp
                     WHEN bt IS NULL THEN fp
                     WHEN epoch_us(cts) - epoch_us(bt)
                          <= epoch_us(ft) - epoch_us(cts) THEN bp
                     ELSE fp END AS p_id,
                CASE WHEN ft IS NULL THEN bt
                     WHEN bt IS NULL THEN ft
                     WHEN epoch_us(cts) - epoch_us(bt)
                          <= epoch_us(ft) - epoch_us(cts) THEN bt
                     ELSE ft END AS near_ts
         FROM b JOIN f USING (event_id)
         ORDER BY event_id""",
    "q242_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS c0
               FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT e.user_id, f.c0,
                 (CAST(e.ts AS DATE) - f.c0) // 7 AS pi
               FROM events e JOIN f USING (user_id))
         SELECT c0 AS cohort_day, CAST(pi AS BIGINT) AS period_idx,
                count(DISTINCT user_id) AS n_keys
         FROM a GROUP BY c0, pi ORDER BY cohort_day, period_idx""",
    "q272_gram_spectrum" ->
      // direct per-length census: enumerate every length-l token slice
      // and count occurrences / distinct / repeated per length — the
      // O(n·L) enumeration the suffix read-off avoids
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 5 = 0),
         lens AS (SELECT unnest(range(1, 65)) AS l),
         base AS (
           SELECT l.l AS len, t.tk AS tk,
                  unnest(range(1, len(t.tk) - l.l + 2)) AS i
           FROM toks t JOIN lens l ON len(t.tk) >= l.l),
         grams AS (SELECT len, array_to_string(tk[i:i + len - 1], ' ') AS g
                   FROM base),
         gc AS (SELECT len, g, count(*) AS c FROM grams GROUP BY 1, 2)
         SELECT len, CAST(sum(c) AS BIGINT) AS occurrences,
                count(*) AS distinct_grams,
                CAST(count(*) FILTER (WHERE c > 1) AS BIGINT)
                  AS repeated_grams
         FROM gc GROUP BY len ORDER BY len""",
    "q273_dq_report" ->
      """WITH r AS (
           SELECT 'discount_max' AS rule, count(*) AS n_rows,
             CAST(count(*) FILTER (
               WHERE NOT coalesce(l_discount <= 0.08, FALSE)) AS BIGINT)
               AS violations FROM lineitem
           UNION ALL
           SELECT 'flag_domain', count(*),
             CAST(count(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R')
               OR l_returnflag IS NULL) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'price_positive', count(*),
             CAST(count(*) FILTER (
               WHERE NOT coalesce(l_extendedprice > 0, FALSE)) AS BIGINT)
             FROM lineitem
           UNION ALL
           SELECT 'qty_range', count(*),
             CAST(count(*) FILTER (
               WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE))
               AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'pk_unique', CAST(sum(c) AS BIGINT),
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
           FROM (SELECT count(*) AS c FROM lineitem
                 GROUP BY l_orderkey, l_linenumber)
           UNION ALL
           SELECT 'fk_orders', (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
         SELECT rule, n_rows, violations,
           round((n_rows - violations) / CAST(n_rows AS DOUBLE), 4)
             AS pass_rate
         FROM r ORDER BY rule""",
    "q274_scd2" ->
      """WITH b AS (SELECT user_id AS k, ts AS t, event_id AS tb,
                 event_type AS a FROM events),
         m AS (SELECT k, t, tb, a,
                 CASE WHEN row_number() OVER w = 1
                      OR (a IS DISTINCT FROM lag(a) OVER w)
                   THEN 1 ELSE 0 END AS chg
               FROM b WINDOW w AS (PARTITION BY k ORDER BY t, tb)),
         r AS (SELECT k, t, a,
                 CAST(sum(chg) OVER (PARTITION BY k ORDER BY t, tb
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
               FROM m),
         g AS (SELECT k, version, min(t) AS valid_from, min(a) AS state
               FROM r GROUP BY k, version),
         f AS (SELECT k, version, valid_from,
                 lead(valid_from) OVER (PARTITION BY k ORDER BY version)
                   AS valid_to, state
               FROM g)
         SELECT k, version, valid_from, valid_to,
           CAST(valid_to IS NULL AS BIGINT) AS is_current, state
         FROM f ORDER BY k, version""",
    "q275_sorted_neighborhood" ->
      """WITH r AS (SELECT c_custkey AS id, c_name AS s,
                 row_number() OVER (ORDER BY c_name, c_custkey) AS idx
               FROM customer)
         SELECT a.id AS a_id, b.id AS b_id,
           CAST(b.idx - a.idx AS BIGINT) AS gap,
           jaro_winkler_similarity(a.s, b.s) AS sim
         FROM r a JOIN r b
           ON b.idx > a.idx AND b.idx <= a.idx + 3
         WHERE jaro_winkler_similarity(a.s, b.s) >= 0.9
         ORDER BY a_id, b_id""",
    "q276_linkage_score" -> {
      val (nwa, nwd) = graft.ops.Linkage.fsWeights(0.9, 0.05)
      val (bwa, bwd) = graft.ops.Linkage.fsWeights(0.8, 0.1)
      s"""WITH c AS (SELECT c_custkey AS id, c_name AS nm,
                  c_nationkey AS nk, c_mktsegment AS seg, c_acctbal AS bal
                FROM customer),
          p AS (SELECT a.id AS a_id, b.id AS b_id, a.nm AS a_name,
                  b.nm AS b_name, a.bal AS a_bal, b.bal AS b_bal
                FROM c a JOIN c b ON a.nk = b.nk AND a.seg = b.seg
                  AND a.id < b.id),
          f AS (SELECT *,
                  coalesce(levenshtein(a_name, b_name) <= 2, FALSE)
                    AS agree_name,
                  coalesce(abs(a_bal - b_bal) < 100.0, FALSE) AS agree_bal
                FROM p),
          sc AS (SELECT *,
                  round((CASE WHEN agree_name THEN ${nwa} ELSE ${nwd} END)
                      + (CASE WHEN agree_bal THEN ${bwa} ELSE ${bwd} END), 4)
                    AS score
                 FROM f)
          SELECT a_id, b_id, a_name, b_name, a_bal, b_bal,
            agree_name, agree_bal, score,
            CASE WHEN score >= 3.0 THEN 'match'
                 WHEN score <= -4.0 THEN 'non_match'
                 ELSE 'review' END AS decision
          FROM sc ORDER BY a_id, b_id"""
    },
    "q277_kaplan_meier" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
               FROM events GROUP BY user_id),
         p AS (SELECT user_id, min(CAST(ts AS DATE)) AS dp
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id),
         subj AS (SELECT
                    CASE WHEN dp IS NOT NULL
                           AND date_diff('day', d0, dp) <= 2
                      THEN date_diff('day', d0, dp) ELSE 2 END AS t,
                    (dp IS NOT NULL AND date_diff('day', d0, dp) <= 2)
                      AS e
                  FROM f LEFT JOIN p USING (user_id)),
         pt AS (SELECT t,
                  CAST(count(*) FILTER (WHERE e) AS BIGINT) AS n_event,
                  count(*) AS n_at
                FROM subj GROUP BY t),
         k AS (SELECT t, n_event, n_at,
                 CAST(sum(n_at) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
               FROM pt),
         k2 AS (SELECT t, n_event, n_risk,
                  sum(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END)
                    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead,
                  sum(CASE WHEN n_event < n_risk
                        THEN ln(1 - n_event / CAST(n_risk AS DOUBLE)) END)
                    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnS
                FROM k)
         SELECT t, n_risk, n_event,
           CASE WHEN dead > 0 THEN 0.0
                ELSE round(exp(coalesce(lnS, 0.0)), 4) END AS survival
         FROM k2 WHERE n_event > 0 ORDER BY t""",
    "q278_assoc_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
               FROM lineitem),
         nb AS (SELECT count(DISTINCT bk) AS n FROM b),
         ic AS (SELECT it, count(*) AS ci FROM b GROUP BY it),
         p AS (SELECT x.it AS a, y.it AS b2, count(*) AS nab
               FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
               GROUP BY 1, 2 HAVING count(*) >= 2),
         dir AS (SELECT a AS ant, b2 AS cons, nab FROM p
                 UNION ALL SELECT b2, a, nab FROM p)
         SELECT ant AS antecedent, cons AS consequent,
           CAST(nab AS BIGINT) AS n_ab,
           round(nab / CAST(n.n AS DOUBLE), 4) AS support,
           round(nab / CAST(ca.ci AS DOUBLE), 4) AS confidence,
           round(CAST(nab * n.n AS DOUBLE) /
             CAST(ca.ci * cb.ci AS DOUBLE), 4) AS lift
         FROM dir
         JOIN ic ca ON ca.it = dir.ant
         JOIN ic cb ON cb.it = dir.cons
         CROSS JOIN nb n
         ORDER BY antecedent, consequent""",
    "q279_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price
         FROM lineitem
         GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q280_pivot" ->
      """SELECT user_id,
           round(sum(value) FILTER (WHERE event_type = 'click'), 4)
             AS click,
           round(sum(value) FILTER (WHERE event_type = 'error'), 4)
             AS error,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 4)
             AS purchase,
           round(sum(value) FILTER (WHERE event_type = 'signup'), 4)
             AS signup,
           round(sum(value) FILTER (WHERE event_type = 'view'), 4)
             AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q281_trend" ->
      """SELECT event_type, count(*) AS n,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
             AS slope,
           round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 4)
             AS intercept,
           round(regr_r2(value, epoch_us(ts) / 86400000000.0), 4) AS r2
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q282_benford" ->
      """WITH p AS (SELECT l_extendedprice AS x FROM lineitem
               WHERE l_extendedprice > 0),
         t AS (SELECT count(*) AS tot FROM p),
         d AS (SELECT CAST(floor(x / power(10, floor(log10(x))))
                 AS BIGINT) AS digit FROM p)
         SELECT digit, count(*) AS n,
           round(count(*) / CAST(t.tot AS DOUBLE), 4) AS obs_p,
           round(log10(1 + 1.0 / digit), 4) AS exp_p
         FROM d, t GROUP BY digit, t.tot ORDER BY digit""",
    "q283_gini" ->
      """WITH s AS (SELECT o_custkey AS k, sum(o_totalprice) AS x
               FROM orders GROUP BY o_custkey),
         r AS (SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM s)
         SELECT count(*) AS n,
           CAST(sum(CAST(x AS DECIMAL(38, 6))) AS DOUBLE) AS total,
           round(CASE WHEN sum(x) > 0
             THEN (2 * sum(i * x) - (count(*) + 1) * sum(x)) /
                  (count(*) * sum(x))
             ELSE 0.0 END, 4) AS gini
         FROM r""",
    "q284_rfm" ->
      """WITH st AS (SELECT max(CAST(o_orderdate AS DATE)) AS dm
               FROM orders),
         per AS (SELECT o_custkey AS id,
             CAST(date_diff('day', max(CAST(o_orderdate AS DATE)), st.dm)
               AS DOUBLE) AS r,
             CAST(count(*) AS DOUBLE) AS fd,
             round(sum(o_totalprice), 4) AS m
           FROM orders, st GROUP BY o_custkey, st.dm),
         cuts AS (SELECT
             [round(quantile_cont(r, 0.2), 4), round(quantile_cont(r, 0.4), 4),
              round(quantile_cont(r, 0.6), 4), round(quantile_cont(r, 0.8), 4)]
               AS rc,
             [round(quantile_cont(fd, 0.2), 4), round(quantile_cont(fd, 0.4), 4),
              round(quantile_cont(fd, 0.6), 4), round(quantile_cont(fd, 0.8), 4)]
               AS fc,
             [round(quantile_cont(m, 0.2), 4), round(quantile_cont(m, 0.4), 4),
              round(quantile_cont(m, 0.6), 4), round(quantile_cont(m, 0.8), 4)]
               AS mc
           FROM per),
         b AS (SELECT id, r, fd, m,
             1 + len(list_filter(rc, c -> r > c)) AS r_bin,
             1 + len(list_filter(fc, c -> fd > c)) AS f_bin,
             1 + len(list_filter(mc, c -> m > c)) AS m_bin
           FROM per, cuts)
         SELECT id, CAST(r AS BIGINT) AS recency_days,
           CAST(fd AS BIGINT) AS frequency, m AS monetary,
           r_bin, f_bin, m_bin,
           r_bin * 100 + f_bin * 10 + m_bin AS segment
         FROM b ORDER BY id""",
    "q285_holt" -> {
      // the exact doubles the Spark fold uses: 1−β in IEEE arithmetic
      // is NOT the 0.7 literal, so the constants interpolate from the
      // same Scala expressions
      val a = 0.5; val b = 0.3
      val (ia, ib) = (1.0 - a, 1.0 - b)
      s"""WITH RECURSIVE s AS (
            SELECT user_id AS k,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS ord,
              value AS y
            FROM events),
          n AS (SELECT k, max(ord) AS n FROM s GROUP BY k),
          h AS (
            SELECT k, ord, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b FROM s WHERE ord = 1
            UNION ALL
            SELECT s.k, s.ord,
              $a * s.y + $ia * (h.l + h.b),
              $b * (($a * s.y + $ia * (h.l + h.b)) - h.l) + $ib * h.b
            FROM h JOIN s ON s.k = h.k AND s.ord = h.ord + 1),
          fin AS (SELECT h.k, n.n, h.l, h.b
                  FROM h JOIN n ON n.k = h.k AND h.ord = n.n)
          SELECT k, n, round(l, 4) AS level, round(b, 4) AS trend,
            round(l + 3.0 * b, 4) AS forecast
          FROM fin ORDER BY k"""
    },
    "q286_skew_report" ->
      """WITH c AS (SELECT CAST(l_partkey AS VARCHAR) AS k, count(*) AS c
               FROM lineitem GROUP BY 1),
         t AS (SELECT list(s ORDER BY c DESC, k) AS top_keys FROM
                 (SELECT k, c, k || ':' || CAST(c AS VARCHAR) AS s
                  FROM c ORDER BY c DESC, k LIMIT 5))
         SELECT CAST(sum(c.c) AS BIGINT) AS n_rows, count(*) AS n_keys,
           max(c.c) AS max_count,
           round(quantile_cont(c.c, 0.5), 4) AS p50_count,
           round(quantile_cont(c.c, 0.99), 4) AS p99_count,
           round(sum(c.c) / CAST(count(*) AS DOUBLE), 4) AS avg_count,
           round(max(c.c) / (sum(c.c) / CAST(count(*) AS DOUBLE)), 4)
             AS skew_ratio,
           array_to_string(any_value(t.top_keys), ',') AS top_keys
         FROM c, t""",
    "q287_standardize" ->
      """WITH m AS (SELECT event_type, avg(value) AS mu,
                 stddev_samp(value) AS sd
               FROM events GROUP BY event_type)
         SELECT e.event_id AS id, e.event_type,
           round(e.value, 4) AS value,
           round(CASE WHEN m.sd > 0 THEN (e.value - m.mu) / m.sd END, 4)
             AS z
         FROM events e JOIN m USING (event_type) ORDER BY id""",
    "q288_kmv_distinct" ->
      """WITH tk AS (SELECT source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         h AS (SELECT DISTINCT source,
             CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
           FROM tk),
         r AS (SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           FROM h),
         kk AS (SELECT source, count(*) AS n_kept, max(h) AS kth
           FROM r WHERE rn <= 16 GROUP BY source),
         ex AS (SELECT source, count(DISTINCT w) AS exact_distinct
           FROM tk GROUP BY source)
         SELECT source, ex.exact_distinct,
           round(CASE WHEN kk.n_kept < 16 THEN CAST(kk.n_kept AS DOUBLE)
             ELSE (15 * 1152921504606846976.0) / CAST(kth AS DOUBLE) END, 4)
             AS est_distinct
         FROM kk JOIN ex USING (source) ORDER BY source""",
    "q289_window_funnel" ->
      """WITH r1 AS (SELECT user_id, min(ts) AS rt FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
         d AS (SELECT user_id, rt,
                 rt + INTERVAL 24 HOURS AS dl FROM r1),
         r2 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN d USING (user_id)
                WHERE e.event_type = 'view' AND e.ts >= d.rt
                  AND e.ts <= d.dl
                GROUP BY e.user_id),
         r3 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r2 USING (user_id) JOIN d USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= r2.rt
                  AND e.ts <= d.dl
                GROUP BY e.user_id),
         r4 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r3 USING (user_id) JOIN d USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= r3.rt
                  AND e.ts <= d.dl
                GROUP BY e.user_id)
         SELECT user_id AS k, step_idx, step, rt AS reached_at FROM (
           SELECT user_id, CAST(1 AS BIGINT) AS step_idx,
                  'signup' AS step, rt FROM r1
           UNION ALL SELECT user_id, 2, 'view', rt FROM r2
           UNION ALL SELECT user_id, 3, 'click', rt FROM r3
           UNION ALL SELECT user_id, 4, 'purchase', rt FROM r4)
         ORDER BY step_idx, k""",
    "q290_mann_whitney" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                 sum(value) AS m
               FROM events GROUP BY user_id),
         pv AS (SELECT m, count(*) AS t,
                  CAST(sum(arm) AS BIGINT) AS n1v
                FROM u GROUP BY m),
         r AS (SELECT t, n1v,
                 coalesce(sum(t) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
               FROM pv),
         a AS (SELECT CAST(sum(t) AS BIGINT) AS nn,
                 CAST(sum(n1v) AS BIGINT) AS n1,
                 sum(n1v * midrank) AS r1,
                 CAST(sum(t * t * t - t) AS BIGINT) AS tie
               FROM r)
         SELECT nn - n1 AS n_a, n1 AS n_b,
           round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * (nn - n1) / 2.0) /
             sqrt((n1 * (nn - n1) / 12.0) *
               ((nn + 1) - tie / (nn * (nn - 1.0)))), 4) AS z,
           abs(round((r1 - n1 * (n1 + 1) / 2.0 - n1 * (nn - n1) / 2.0) /
             sqrt((n1 * (nn - n1) / 12.0) *
               ((nn + 1) - tie / (nn * (nn - 1.0)))), 4)) > 1.96
             AS significant
         FROM a""",
    "q291_maximal_repeats" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 5 = 0),
         lens AS (SELECT unnest(range(2, 7)) AS l),
         base AS (
           SELECT l.l AS len, t.tk AS tk,
                  unnest(range(0, len(t.tk) - l.l + 1)) AS p
           FROM toks t JOIN lens l ON len(t.tk) >= l.l),
         g AS (SELECT len, array_to_string(tk[p + 1:p + len], ' ') AS gram,
                 CASE WHEN p > 0 THEN tk[p] ELSE '' END AS prev,
                 CASE WHEN p + len < len(tk) THEN tk[p + len + 1]
                   ELSE '' END AS next
               FROM base)
         SELECT len, gram, count(*) AS n_occ,
           count(DISTINCT prev) AS n_left,
           count(DISTINCT next) AS n_right
         FROM g GROUP BY len, gram
         HAVING count(*) >= 3 AND count(DISTINCT prev) >= 2
           AND count(DISTINCT next) >= 2
         ORDER BY len, gram""",
    "q292_maximal_repeats_all" ->
      // all lengths per document: the O(n·maxlen) enumeration the
      // LCP-interval read-off answers from one ranking
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 10 = 0),
         wl AS (SELECT tk, unnest(range(2, len(tk) + 1)) AS len
                FROM toks),
         base AS (SELECT len, tk,
                    unnest(range(0, len(tk) - len + 1)) AS p
                  FROM wl),
         g AS (SELECT len, array_to_string(tk[p + 1:p + len], ' ') AS gram,
                 CASE WHEN p > 0 THEN tk[p] ELSE '' END AS prev,
                 CASE WHEN p + len < len(tk) THEN tk[p + len + 1]
                   ELSE '' END AS next
               FROM base)
         SELECT len, gram, count(*) AS n_occ
         FROM g GROUP BY len, gram
         HAVING count(*) >= 3 AND count(DISTINCT prev) >= 2
           AND count(DISTINCT next) >= 2
         ORDER BY len, gram""",
    "q293_proportion_test" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                 max(CASE WHEN event_type = 'purchase' THEN 1
                     ELSE 0 END) AS c
               FROM events GROUP BY user_id),
         s AS (SELECT arm, count(*) AS n, CAST(sum(c) AS BIGINT) AS x
               FROM u GROUP BY arm),
         m AS (SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b,
                 (a.x + b.x) / CAST(a.n + b.n AS DOUBLE) AS pp
               FROM (SELECT n, x FROM s WHERE arm = 0) a,
                    (SELECT n, x FROM s WHERE arm = 1) b)
         SELECT n_a, n_b,
           round(x_a / CAST(n_a AS DOUBLE), 4) AS p_a,
           round(x_b / CAST(n_b AS DOUBLE), 4) AS p_b,
           round(x_b / CAST(n_b AS DOUBLE)
             - x_a / CAST(n_a AS DOUBLE), 4) AS lift,
           round(CASE WHEN pp > 0 AND pp < 1 THEN
             (x_b / CAST(n_b AS DOUBLE) - x_a / CAST(n_a AS DOUBLE)) /
             sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z,
           coalesce(abs(CASE WHEN pp > 0 AND pp < 1 THEN
             (x_b / CAST(n_b AS DOUBLE) - x_a / CAST(n_a AS DOUBLE)) /
             sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END) > 1.96,
             false) AS significant
         FROM m""",
    "q294_chi2_independence" ->
      """WITH cells AS (SELECT event_type AS a,
                 CAST(user_id % 3 AS VARCHAR) AS b, count(*) AS o
               FROM events GROUP BY 1, 2),
         rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra
                FROM cells GROUP BY a),
         ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb
                FROM cells GROUP BY b),
         tt AS (SELECT CAST(sum(o) AS DOUBLE) AS n,
                  count(DISTINCT a) AS r, count(DISTINCT b) AS c
                FROM cells),
         f AS (SELECT rt.ra, ct.cb, coalesce(cells.o, 0) AS o
               FROM rt CROSS JOIN ct
               LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
         q AS (SELECT tt.n, tt.r, tt.c,
                 pow(f.o - f.ra * f.cb / tt.n, 2) /
                   (f.ra * f.cb / tt.n) AS q
               FROM f, tt)
         SELECT CAST(n AS BIGINT) AS n, r, c,
           round(sum(q), 4) AS chi2,
           (r - 1) * (c - 1) AS dof,
           round(sqrt(sum(q) / (n * least(r - 1, c - 1))), 4) AS cramers_v
         FROM q GROUP BY n, r, c""",
    "q295_acf" -> {
      val lags = (1 to 7)
      val lagCols = lags.map(k =>
        s"lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
        .mkString(", ")
      val numCols = lags.map(k =>
        s"sum((v - mu) * (l$k - mu)) AS num$k").mkString(", ")
      val arms = lags.map(k =>
        s"""SELECT event_type, CAST($k AS BIGINT) AS lag, n,
            round(CASE WHEN den > 0 THEN num$k / den END, 4) AS acf
            FROM a""").mkString("\n           UNION ALL ")
      s"""WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(value) AS v
               FROM events GROUP BY 1, 2),
         m AS (SELECT event_type, v,
                 avg(v) OVER (PARTITION BY event_type) AS mu, $lagCols
               FROM sday),
         a AS (SELECT event_type, count(*) AS n,
                 sum(pow(v - mu, 2)) AS den, $numCols
               FROM m GROUP BY event_type)
         $arms
         ORDER BY event_type, lag"""
    },
    "q296_cusum" ->
      // w MATERIALIZED: it is read twice (per-key max + argmax), and
      // DuckDB's parallel avg/stddev aggregation is not bit-identical
      // across evaluations — the a = m equality needs ONE evaluation
      // (the localCheckpoint on the Spark side plays the same role)
      """WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 avg(value) AS v
               FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, day, v,
                  avg(v) OVER (PARTITION BY event_type) AS mu,
                  stddev_samp(v) OVER (PARTITION BY event_type) AS sd
                FROM sday),
         w AS MATERIALIZED (SELECT event_type, day,
                 CASE WHEN sd > 0
                   THEN abs(sum((v - mu) / sd)
                     OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING)) END AS a
               FROM st),
         mx AS (SELECT event_type, count(*) AS n, max(a) AS m
                FROM w GROUP BY event_type)
         SELECT w.event_type, any_value(mx.n) AS n,
           round(any_value(mx.m), 4) AS max_cusum,
           min(CASE WHEN w.a = mx.m THEN w.day END) AS changepoint_at,
           coalesce(any_value(mx.m) > 3.0, false) AS shifted
         FROM w JOIN mx ON w.event_type = mx.event_type
         WHERE w.a = mx.m OR mx.m IS NULL
         GROUP BY w.event_type ORDER BY w.event_type""",
    "q297_posting_lists" ->
      """WITH td AS (SELECT term, doc_id AS id, count(*) AS tf FROM (
             SELECT doc_id,
               unnest(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> x <> '')) AS term
             FROM documents)
           GROUP BY term, doc_id),
         r AS (SELECT term, id, tf,
                 row_number() OVER (PARTITION BY term ORDER BY id) AS rn
               FROM td)
         SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
           array_to_string(list_sort(list(id) FILTER (WHERE rn <= 10)), ',')
             AS postings
         FROM r GROUP BY term HAVING count(*) >= 8 ORDER BY term""",
    "q298_kcore" -> kCoreOracle(k = 12, rounds = 20),
    "q299_systematic_sample" ->
      """WITH r AS (SELECT o_orderkey, o_orderdate, o_totalprice,
                 row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                   AS gidx
               FROM orders)
         SELECT o_orderkey, o_orderdate, o_totalprice, gidx
         FROM r WHERE (gidx - 1) % 97 = 0 ORDER BY gidx""",
    "q300_kmv_setops" ->
      """WITH tk AS (SELECT source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         h AS (SELECT DISTINCT source AS g,
             CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
           FROM tk),
         sk AS (SELECT g, h FROM (
             SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
               AS rn FROM h)
           WHERE rn <= 32),
         gs AS (SELECT DISTINCT g FROM sk),
         p AS (SELECT a.g AS ga, b.g AS gb
               FROM gs a JOIN gs b ON a.g < b.g),
         m AS (SELECT ga, gb, h, max(ia) AS ia, max(ib) AS ib FROM (
             SELECT p.ga, p.gb, sk.h, 1 AS ia, 0 AS ib
             FROM p JOIN sk ON sk.g = p.ga
             UNION ALL
             SELECT p.ga, p.gb, sk.h, 0, 1
             FROM p JOIN sk ON sk.g = p.gb)
           GROUP BY ga, gb, h),
         r AS (SELECT ga, gb, h, ia, ib,
                 row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
               FROM m),
         agg AS (SELECT ga, gb, count(*) AS nk, max(h) AS kth,
                   CAST(sum(ia * ib) AS BIGINT) AS nb
                 FROM r WHERE rn <= 32 GROUP BY ga, gb)
         SELECT ga AS src_a, gb AS src_b,
           round(CASE WHEN nk < 32 THEN CAST(nk AS DOUBLE)
             ELSE (31 * 1152921504606846976.0) / CAST(kth AS DOUBLE)
             END, 4) AS union_est,
           round(nb / CAST(nk AS DOUBLE), 4) AS jaccard_est,
           round((nb / CAST(nk AS DOUBLE)) *
             CASE WHEN nk < 32 THEN CAST(nk AS DOUBLE)
               ELSE (31 * 1152921504606846976.0) / CAST(kth AS DOUBLE)
               END, 4) AS intersect_est
         FROM agg ORDER BY src_a, src_b""",
    "q301_welch_ttest" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                 avg(value) AS m
               FROM events GROUP BY user_id),
         s AS (SELECT arm, count(*) AS n, avg(m) AS mu,
                 var_samp(m) AS v
               FROM u GROUP BY arm),
         m AS (SELECT a.n AS n_a, a.mu AS mu_a, a.v AS v_a,
                 b.n AS n_b, b.mu AS mu_b, b.v AS v_b
               FROM (SELECT * FROM s WHERE arm = 0) a,
                    (SELECT * FROM s WHERE arm = 1) b)
         SELECT n_a, n_b, round(mu_a, 4) AS mean_a,
           round(mu_b, 4) AS mean_b, round(mu_b - mu_a, 4) AS lift,
           round((mu_b - mu_a) / sqrt(v_a / n_a + v_b / n_b), 4) AS t,
           round(pow(v_a / n_a + v_b / n_b, 2) /
             (pow(v_a / n_a, 2) / (n_a - 1) +
              pow(v_b / n_b, 2) / (n_b - 1)), 4) AS df,
           coalesce(abs((mu_b - mu_a) / sqrt(v_a / n_a + v_b / n_b))
             > 1.96, false) AS significant
         FROM m""",
    "q302_kruskal_wallis" ->
      """WITH u AS (SELECT CAST(user_id % 3 AS VARCHAR) AS arm,
                 sum(value) AS m
               FROM events GROUP BY user_id),
         pva AS (SELECT m, arm, count(*) AS c FROM u GROUP BY 1, 2),
         pv AS (SELECT m, CAST(sum(c) AS BIGINT) AS t
                FROM pva GROUP BY m),
         r AS (SELECT m, t,
                 coalesce(sum(t) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
               FROM pv),
         pa AS (SELECT arm, CAST(sum(c) AS BIGINT) AS ng,
                  sum(c * r.midrank) AS rg
                FROM pva JOIN r USING (m) GROUP BY arm),
         tt AS (SELECT sum(pow(t, 3) - t) AS tie FROM r),
         ag AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
                  count(*) AS k_arms, sum(rg * rg / ng) AS rr
                FROM pa)
         SELECT nn AS n, k_arms,
           round(12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0), 4)
             AS h,
           round(CASE WHEN (1.0 - tie / (pow(nn, 3) - nn)) > 0 THEN
             (12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0)) /
             (1.0 - tie / (pow(nn, 3) - nn)) END, 4) AS h_tie,
           k_arms - 1 AS dof
         FROM ag, tt""",
    "q303_bfs" -> bfsOracle(rounds = 6),
    "q304_hits" -> hitsOracle(iters = 3),
    "q305_theil_sen" ->
      """WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(value) AS v
               FROM events GROUP BY 1, 2),
         b AS (SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', day) AS DOUBLE)
                   AS x, v AS y
               FROM sday),
         sl AS (SELECT a.event_type,
                  (b2.y - a.y) / (b2.x - a.x) AS sl
                FROM b a JOIN b b2 ON a.event_type = b2.event_type
                  AND a.x < b2.x),
         sm AS (SELECT event_type, count(*) AS n_pairs,
                  quantile_cont(sl, 0.5) AS slope
                FROM sl GROUP BY event_type),
         fin AS (SELECT b.event_type, count(*) AS n,
                   any_value(sm.n_pairs) AS n_pairs,
                   any_value(sm.slope) AS s,
                   quantile_cont(b.y - sm.slope * b.x, 0.5) AS i
                 FROM b JOIN sm USING (event_type)
                 GROUP BY b.event_type)
         SELECT event_type, n, n_pairs, round(s, 4) AS slope,
           round(i, 4) AS intercept
         FROM fin ORDER BY event_type""",
    "q306_textrank" -> textrankOracle(iters = 3),
    "q307_pca_project" -> pcaOracle(dim = 64, sweeps = 30),
    "q308_label_propagation" -> labelPropOracle(iters = 4),
    "q309_cross_folds" ->
      """SELECT doc_id,
           CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) % 5 AS fold
         FROM documents ORDER BY doc_id""",
    "q310_holt_winters" -> {
      // the exact IEEE doubles the Spark fold uses (the q285 stance),
      // seasonal state carried as a LIST through the recursion with
      // slice-splice updates; base row's seasonal update is exactly 0
      // (gamma*(y-y) + (1-gamma)*0), so the base list is all zeros
      val a = 0.5; val b = 0.3; val g = 0.4; val m = 7; val h = 2
      val (ia, ib, ig) = (1.0 - a, 1.0 - b, 1.0 - g)
      val zeros = Seq.fill(m)("0.0").mkString("[", ", ", "]")
      val pos = s"((sd.ord - 1) % $m)"
      val sOld = s"h.s[$pos + 1]"
      val l1 = s"($a * (sd.y - $sOld) + $ia * (h.l + h.b))"
      val s1 = s"($g * (sd.y - $l1) + $ig * $sOld)"
      s"""WITH RECURSIVE sd AS (
            SELECT k, row_number() OVER (PARTITION BY k ORDER BY day)
                AS ord, y
            FROM (SELECT user_id % 3 AS k, CAST(ts AS DATE) AS day,
                    sum(value) AS y
                  FROM events GROUP BY 1, 2)),
          n AS (SELECT k, max(ord) AS n FROM sd GROUP BY k),
          hw AS (
            SELECT k, ord, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b,
              CAST($zeros AS DOUBLE[]) AS s
            FROM sd WHERE ord = 1
            UNION ALL
            SELECT sd.k, sd.ord,
              $l1 AS l,
              $b * ($l1 - h.l) + $ib * h.b AS b,
              list_concat(list_concat(h.s[1:$pos], [$s1]),
                h.s[$pos + 2:]) AS s
            FROM hw h JOIN sd ON sd.k = h.k AND sd.ord = h.ord + 1),
          fin AS (SELECT h.k, n.n, h.l, h.b,
                    h.s[((n.n + $h - 1) % $m) + 1] AS sf
                  FROM hw h JOIN n ON n.k = h.k AND h.ord = n.n)
          SELECT k, n, round(l, 4) AS level, round(b, 4) AS trend,
            round(l + $h.0 * b + sf, 4) AS forecast
          FROM fin ORDER BY k"""
    },
    "q311_glove_cooccurrence" ->
      """WITH toks AS (
           SELECT list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 3 = 0),
         p AS (SELECT tk, unnest(range(0, len(tk))) AS p FROM toks),
         pd AS (SELECT tk, p,
                  unnest(range(1, least(4, len(tk) - p - 1) + 1)) AS d
                FROM p WHERE len(tk) - p >= 2),
         pr AS (SELECT tk[p + 1] AS wa, tk[p + d + 1] AS wb,
                  12 // d AS wt
                FROM pd),
         cn AS (SELECT least(wa, wb) AS w1, greatest(wa, wb) AS w2, wt
                FROM pr)
         SELECT w1, w2, count(*) AS n_pair,
           round(CAST(sum(wt) AS DOUBLE) / 12.0, 4) AS x
         FROM cn GROUP BY w1, w2 HAVING count(*) >= 10
         ORDER BY w1, w2""",

    // q312: counts + ordered matched strings are DuckDB-recomputable via
    // regexp_extract_all; slices_match is the engine's in-query
    // certification that each span slices back to its matched text
    // (positions themselves stay spec-pinned — DuckDB has no
    // position-returning extract-all),
    "q312_pii_spans" ->
      s"""WITH p AS (${PiiSql.decorated}),
         pats(pii_class, pat) AS (VALUES
           ('email', '${PiiSql.email}'), ('ipv4', '${PiiSql.ipv4}'),
           ('id', '${PiiSql.id}'), ('phone', '${PiiSql.phone}')),
         m AS (SELECT doc_id AS id, pii_class,
                      regexp_extract_all(ptext, pat) AS ms
               FROM p CROSS JOIN pats)
         SELECT id, pii_class, CAST(len(ms) AS BIGINT) AS n_spans,
           array_to_string(ms, '|') AS matched_seq,
           true AS slices_match
         FROM m WHERE len(ms) > 0 ORDER BY id, pii_class"""
  )
}
