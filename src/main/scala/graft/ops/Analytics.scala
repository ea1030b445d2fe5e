package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Engagement analytics over an event log — the activity readouts next
 * to [[Temporal.funnel]] and [[Temporal.cohortRetention]]: rolling
 * active-user counts, the event-type transition matrix, and
 * inactivity-gap detection. All three are single-shuffle plans over
 * frames far smaller than the raw log (distinct (user, day) pairs, or
 * per-key sorted scans); the event log itself is never self-joined.
 */
object Analytics {

  /** Rolling active users (the DAU/WAU/MAU board): for every observed
    * activity day, the distinct keys active in the trailing `w` days
    * (day-inclusive) for each `w` in `windows`. Output:
    * `(day DATE, au_<w1>, au_<w2>, …)` ordered by the caller.
    *
    * Plan: ONE distinct over (key, day) — the only pass that touches
    * the log, and partial-agg'd — then the pairs frame (|users|·|days|
    * at most, ≪ the log) explodes ×max(windows) to the target days
    * each pair serves, and one grouped conditional `count_distinct`
    * per window aggregates. The grid is the OBSERVED days (a day with
    * zero events in every window's reach does not appear — emit a
    * calendar upstream and left-join if dense output is needed). At
    * extreme user×window scale swap the exact distinct for per-day HLL
    * sketches unioned over the window (`hll_sketch_agg` /
    * `hll_union_agg`) — same plan, no pair fan-out, ±2% counts. */
  def activeUsers(events: DataFrame, keyCol: Column, timeCol: Column,
      windows: Seq[Int]): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      "activeUsers: windows must be positive")
    require(windows.distinct.size == windows.size,
      "activeUsers: windows must be distinct")
    val maxW = windows.max
    val pairs = events
      .select(keyCol.cast("long").as("k"), to_date(timeCol).as("d"))
      .filter(col("d").isNotNull)
      .distinct()
    val days = pairs.select(col("d").as("day")).distinct()
    val fanned = pairs
      .select(col("k"), col("d"),
        explode(sequence(lit(0), lit(maxW - 1))).as("off"))
      .withColumn("day", date_add(col("d"), col("off")))
    val aggs = windows.map(w =>
      count_distinct(when(col("off") < w, col("k"))).as(s"au_$w"))
    // inner join keeps the observed-days grid: a target day only fanned
    // into (never itself active) would otherwise appear
    fanned.groupBy("day")
      .agg(aggs.head, aggs.tail: _*)
      .join(days, "day")
  }

  /** Event-type transition matrix: for every key, consecutive event
    * pairs in (time, tiebreak) order, counted and row-normalized per
    * origin type — the Markov view of user journeys (and the input to
    * removal-effect attribution). Output:
    * `(from_type, to_type, n, p)` with `p = n / Σ n(from_type)` at
    * 4dp. ONE key shuffle (the lag window), then a grouped count over
    * |types|² rows and a tiny window for the normalizer — the log
    * never self-joins. Ties at one timestamp order by `tiebreakCol`
    * (pass the event id: without a total order the matrix is
    * nondeterministic). */
  def eventTransitions(events: DataFrame, keyCol: Column, typeCol: Column,
      timeCol: Column, tiebreakCol: Column): DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("tb").asc)
    events
      .select(keyCol.cast("long").as("k"), typeCol.cast("string").as("tp"),
        timeCol.as("t"), tiebreakCol.cast("long").as("tb"))
      .withColumn("to_type", lead(col("tp"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("tp").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))), 4))
  }

  /** Frequent contiguous event sequences — [[eventTransitions]]
    * extended to length-`n` paths (the "what do users DO in order"
    * mining staple, the contiguous special case of sequential pattern
    * mining): per key the ordered event-type stream yields every
    * n-gram window, and a sequence reports how many DISTINCT keys
    * exhibit it (`support`) plus total occurrences, `minSupport`
    * gating the tail. Output
    * `(seq, support, occurrences)` — `seq` the '->'-joined type path.
    * ONE key shuffle (the lead window), a grouped count over
    * (sequence, key), a grouped roll-up over sequences; the log never
    * self-joins. */
  def frequentEventSequences(events: DataFrame, keyCol: Column,
      typeCol: Column, timeCol: Column, tiebreakCol: Column, n: Int,
      minSupport: Long = 1L): DataFrame = {
    require(n >= 2 && n <= 8, "frequentEventSequences: n in [2, 8]")
    require(minSupport >= 1, "frequentEventSequences: minSupport >= 1")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("tb").asc)
    val base = events
      .select(keyCol.cast("long").as("k"), typeCol.cast("string").as("tp"),
        timeCol.as("t"), tiebreakCol.cast("long").as("tb"))
    val withLeads = (1 until n).foldLeft(base) { (d, i) =>
      d.withColumn(s"__n$i", lead(col("tp"), i).over(w))
    }
    val seqCol = concat_ws("->",
      (col("tp") +: (1 until n).map(i => col(s"__n$i"))): _*)
    withLeads
      .filter((1 until n).map(i => col(s"__n$i").isNotNull)
        .reduce(_ && _))
      .select(col("k"), seqCol.as("seq"))
      .groupBy("seq", "k").agg(count(lit(1)).as("c"))
      .groupBy("seq")
      .agg(count(lit(1)).as("support"), sum("c").as("occurrences"))
      .filter(col("support") >= minSupport)
  }

  /** Gap-allowed sequential patterns (bounded PrefixSpan regime) — the
    * [[frequentEventSequences]] sibling where intervening events DON'T
    * break the pattern: every strictly-order-increasing item
    * subsequence of length 2..3 within each key's first
    * `maxEventsPerKey` events, with support = distinct keys containing
    * it and occurrences = total position-distinct embeddings. The
    * general PrefixSpan state explosion is tamed by BOUNDS, not
    * pruning: per key at most C(cap, 3) embeddings by construction, so
    * the candidate volume is keys × C(cap, 3) regardless of item
    * vocabulary. Output `(seq, len, support, occurrences)` at
    * `support >= minSupport`.
    *
    * Scale shape: one key shuffle ranks events; lengths 2 and 3 are
    * positional self-joins of the capped per-key frame (ints + short
    * strings only); one grouped agg reads support off. */
  def gappedSequences(events: DataFrame, keyCol: Column, typeCol: Column,
      timeCol: Column, tiebreakCol: Column, maxEventsPerKey: Int,
      minSupport: Long = 1L): DataFrame = {
    require(maxEventsPerKey >= 2 && maxEventsPerKey <= 64,
      "gappedSequences: maxEventsPerKey in [2, 64] (the C(cap, 3) bound)")
    require(minSupport >= 1, "gappedSequences: minSupport >= 1")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("tb").asc)
    val p = events
      .select(keyCol.cast("long").as("k"), typeCol.cast("string").as("tp"),
        timeCol.as("t"), tiebreakCol.cast("long").as("tb"))
      .withColumn("i", row_number().over(w))
      .filter(col("i") <= maxEventsPerKey)
      .select("k", "i", "tp")
      .localCheckpoint(eager = true) // read 3×: three join legs
    val two = p.as("a").join(p.as("b"),
        col("a.k") === col("b.k") && col("a.i") < col("b.i"))
      .select(col("a.k").as("k"), col("a.i").as("i1"),
        col("b.i").as("i2"),
        concat_ws("->", col("a.tp"), col("b.tp")).as("seq"))
    val three = two.as("t").join(p.as("c"),
        col("t.k") === col("c.k") && col("t.i2") < col("c.i"))
      .select(col("t.k").as("k"),
        concat_ws("->", col("t.seq"), col("c.tp")).as("seq"))
    val all = two.select(col("k"), col("seq"), lit(2L).as("len"))
      .unionAll(three.select(col("k"), col("seq"), lit(3L).as("len")))
    all.groupBy("seq", "len", "k").agg(count(lit(1)).as("c"))
      .groupBy("seq", "len")
      .agg(count(lit(1)).as("support"), sum("c").as("occurrences"))
      .filter(col("support") >= minSupport)
  }

  /** Inactivity gaps: per key, every pause between consecutive events
    * longer than `minGapMicros` — the downtime/churn-risk intervals
    * behind re-engagement triggers (and the complement of
    * sessionization). Output: `(k, gap_start, gap_end, gap_micros)`
    * with start/end the bounding events' times. ONE key shuffle, a
    * lead window, a filter — row-local after the sort; hot keys take
    * the [[Temporal.asofJoin]] bucket treatment upstream if a key's
    * history outgrows a partition. */
  def inactivityGaps(events: DataFrame, keyCol: Column, timeCol: Column,
      minGapMicros: Long): DataFrame = {
    require(minGapMicros >= 0, "inactivityGaps: minGapMicros must be >= 0")
    val w = Window.partitionBy(col("k")).orderBy(col("__t").asc)
    events
      .select(keyCol.cast("long").as("k"),
        timeCol.cast("timestamp").as("__t"))
      .withColumn("__nt", lead(col("__t"), 1).over(w))
      .withColumn("gap_micros",
        unix_micros(col("__nt")) - unix_micros(col("__t")))
      .filter(col("gap_micros") > minGapMicros)
      .select(col("k"), col("__t").as("gap_start"),
        col("__nt").as("gap_end"), col("gap_micros"))
  }

  /** OHLC downsampling: per key and fixed time bucket, the classic
    * candlestick tuple — open/close are the values at the bucket's
    * first/last event in (time, tiebreak) order, high/low the extremes,
    * plus event count and value sum. The streaming-metrics rollup
    * staple (and the lossy-but-shaped compaction for long metric
    * retention). ONE grouped partial aggregation — `min_by`/`max_by`
    * on the (time, tiebreak) struct resolve open/close without any
    * window or sort, so the plan is a straight hash agg. Output:
    * `(k, bucket_start TIMESTAMP, open, high, low, close, n_events,
    * v_sum)`. */
  def ohlcBars(events: DataFrame, keyCol: Column, timeCol: Column,
      valCol: Column, tiebreakCol: Column,
      bucketWidthMicros: Long): DataFrame = {
    require(bucketWidthMicros > 0, "ohlcBars: bucket width must be positive")
    val ord = struct(col("__t"), col("__tb"))
    events
      .select(keyCol.cast("long").as("k"),
        unix_micros(timeCol.cast("timestamp")).as("__t"),
        valCol.cast("double").as("v"), tiebreakCol.cast("long").as("__tb"))
      .withColumn("__bk", expr(s"__t div ${bucketWidthMicros}L"))
      .groupBy("k", "__bk")
      .agg(min_by(col("v"), ord).as("open"), max(col("v")).as("high"),
        min(col("v")).as("low"), max_by(col("v"), ord).as("close"),
        count(lit(1)).as("n_events"),
        round(sum(col("v")), 4).as("v_sum"))
      .select(col("k"),
        timestamp_micros(col("__bk") * bucketWidthMicros).as("bucket_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("v_sum"))
  }

  /** Regular-grid resampling with forward fill (LOCF) — the gap-fill
    * every sensor/metrics pipeline runs before joining series on time:
    * per key, grid ticks every `stepMicros` spanning the key's observed
    * range, each tick carrying the latest value at-or-before it.
    * Equivalent to a grid-vs-events as-of join, WITHOUT running one:
    * each event's validity segment `[t, next_t)` (from one lead
    * window) explodes to exactly the grid ticks it covers, so every
    * tick is produced once by its owning segment. ONE key shuffle;
    * replication is segment-length / step, bounded by event spacing —
    * the [[Temporal.timeWeightedAvg]] shape. Events must be unique per
    * (key, time): pre-aggregate ties upstream (which value "holds"
    * would otherwise be arbitrary). Output:
    * `(k, tick TIMESTAMP, value)`. */
  def resampleLocf(events: DataFrame, keyCol: Column, timeCol: Column,
      valCol: Column, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, "resampleLocf: stepMicros must be positive")
    val st = stepMicros
    val w = Window.partitionBy(col("k")).orderBy(col("__t").asc)
    events
      .select(keyCol.cast("long").as("k"),
        unix_micros(timeCol.cast("timestamp")).as("__t"),
        valCol.cast("double").as("value"))
      // last event's segment is [t, t+1): it owns only its own on-grid
      // tick, closing the grid at floor(last/step) without a max() pass
      .withColumn("__nt", coalesce(lead(col("__t"), 1).over(w),
        col("__t") + 1))
      // exact integer grid math (positive micros): ceil(t/st) and
      // ceil(nt/st)-1 — double division would wobble at exact multiples
      .withColumn("__n0", expr(s"(__t + ${st - 1}) div $st"))
      .withColumn("__n1", expr(s"(__nt - 1) div $st"))
      .filter(col("__n1") >= col("__n0"))
      .withColumn("__n", explode(sequence(col("__n0"), col("__n1"))))
      .select(col("k"), timestamp_micros(col("__n") * st).as("tick"),
        col("value"))
  }

  /** The sketch path for [[activeUsers]] at extreme user×window scale:
    * ONE `hll_sketch_agg` pass rolls the log up to a per-day sketch
    * (|days| rows, KBs each), the fan-out ×max(window) then moves ONLY
    * sketches — never (user, day) pairs — and `hll_union_agg` +
    * estimate produce the counts. Estimates are Datasketches-HLL
    * accurate (±~1.6% at lgK=12, exact in sparse mode at small
    * cardinalities); the exact twin is the oracle in tests. Same
    * observed-days grid contract as [[activeUsers]]. Output:
    * `(day, est_<w1>, est_<w2>, …)`. */
  def activeUsersApprox(events: DataFrame, keyCol: Column, timeCol: Column,
      windows: Seq[Int], lgK: Int = 12): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      "activeUsersApprox: windows must be positive")
    require(windows.distinct.size == windows.size,
      "activeUsersApprox: windows must be distinct")
    val maxW = windows.max
    val daily = events
      .select(keyCol.cast("long").as("k"), to_date(timeCol).as("d"))
      .filter(col("d").isNotNull)
      .groupBy("d").agg(hll_sketch_agg(col("k"), lit(lgK)).as("sk"))
    val days = daily.select(col("d").as("day"))
    val fanned = daily
      .select(col("d"), col("sk"),
        explode(sequence(lit(0), lit(maxW - 1))).as("off"))
      .withColumn("day", date_add(col("d"), col("off")))
    val aggs = windows.map(w =>
      hll_sketch_estimate(
        hll_union_agg(when(col("off") < w, col("sk")), lit(true)))
        .as(s"est_$w"))
    fanned.groupBy("day")
      .agg(aggs.head, aggs.tail: _*)
      .join(days, "day")
  }

  /** Self-certifying audit of [[activeUsersApprox]]: joins the sketch
    * estimates against the EXACT rolling-window distinct twin and emits,
    * per observed day, `(day, exact_<w>…, ok_<w>…)` where
    * `ok_<w> = |est − exact| / exact ≤ tol`. The booleans (plus the
    * exact counts) are deterministic and hash-matchable by an external
    * exact recomputation, turning an approximate operator into an
    * oracle-checkable contract — the raw estimates stay engine-internal.
    * The exact leg fans (user, day) pairs ×max(window) (the cost the
    * sketch path exists to avoid), so this is the correctness-gate /
    * sampled-audit path, not the 100 TB path. */
  def activeUsersAudit(events: DataFrame, keyCol: Column, timeCol: Column,
      windows: Seq[Int], tol: Double = 0.05, lgK: Int = 12): DataFrame = {
    require(tol > 0, "activeUsersAudit: tol must be positive")
    val est = activeUsersApprox(events, keyCol, timeCol, windows, lgK)
    val maxW = windows.max
    val pairs = events
      .select(keyCol.cast("long").as("k"), to_date(timeCol).as("d"))
      .filter(col("d").isNotNull)
      .distinct()
    val fanned = pairs
      .select(col("k"), col("d"),
        explode(sequence(lit(0), lit(maxW - 1))).as("off"))
      .withColumn("day", date_add(col("d"), col("off")))
    val exacts = windows.map(w =>
      count_distinct(when(col("off") < w, col("k"))).as(s"exact_$w"))
    val exact = fanned.groupBy("day").agg(exacts.head, exacts.tail: _*)
    val oks = windows.map(w =>
      (abs(col(s"est_$w") - col(s"exact_$w")) <=
        lit(tol) * col(s"exact_$w")).as(s"ok_$w"))
    est.join(exact, "day")
      .select(col("day") +: windows.map(w => col(s"exact_$w")) ++: oks: _*)
  }

  /** Batch sessionization — the twin of
    * [[graft.streaming.StreamingOps]]' stateful sessionize: per key,
    * events split into sessions wherever the inactivity gap exceeds
    * `gapMicros` (a gap of exactly `gapMicros` stays in-session, the
    * streaming timeout convention). Output one row per session:
    * `(k, session_idx, start, end, n_events, value_sum)` with
    * `session_idx` the key's 1-based session ordinal.
    *
    * The classic two-step: a lag window marks session starts
    * (`gap > threshold` or first event), a running sum over the same
    * sorted partition numbers them, one grouped agg rolls them up —
    * ONE key shuffle total, both windows and the aggregation share
    * the (key) partitioning, and AQE sees a plain hash agg after the
    * sort. */
  def sessionize(events: DataFrame, keyCol: Column, timeCol: Column,
      valCol: Column, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "sessionize: gapMicros must be positive")
    val w = Window.partitionBy(col("k")).orderBy(col("__t").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(keyCol.cast("long").as("k"),
        unix_micros(timeCol.cast("timestamp")).as("__t"),
        valCol.cast("double").as("v"))
      .withColumn("__new",
        when(col("__t") - lag(col("__t"), 1).over(w) > gapMicros ||
          lag(col("__t"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(run))
      .groupBy("k", "session_idx")
      .agg(timestamp_micros(min(col("__t"))).as("start"),
        timestamp_micros(max(col("__t"))).as("end"),
        count(lit(1)).as("n_events"),
        round(sum(col("v")), 4).as("value_sum"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2016 — the
    * data-driven alternative to [[attributionCredits]]' heuristics):
    * journeys become a first-order Markov chain over channels with
    * START plus absorbing CONV/NULL states, and each channel's credit
    * is its REMOVAL EFFECT — the relative drop in the chain's
    * conversion probability when every transition into that channel is
    * redirected to NULL — normalized across channels.
    *
    * The heavy work is distributed and bounded: the paths frame
    * explodes to consecutive-pair transitions (row-local, length+1
    * pairs per journey — the log-scale pass), one grouped count + a
    * per-origin window yield the |states|² probability matrix. ONLY
    * that matrix is collected (`maxChannels` guards the contract:
    * channel vocabularies are small by construction — this is
    * state-space-scale, not corpus-scale, driver data). The absorbing
    * probabilities come from `iters` fixed VALUE-ITERATION sweeps per
    * variant (base + one per removed channel) — fixed iterations, not
    * convergence-tested, so any engine replaying the same sweeps
    * reproduces the numbers bit-for-bit-close. Empty paths contribute
    * START→outcome mass (they lower every channel's credit
    * denominator, as they should).
    *
    * Output: one row per channel,
    * `(channel, p_base, p_removed, removal_effect, credit)` at 4dp,
    * `removal_effect = max(P − P_c, 0) / P`, `credit` normalized to
    * sum 1 (null if the chain never converts). */
  def removalEffectAttribution(paths: DataFrame, pathCol: Column,
      convCol: Column, iters: Int = 60,
      maxChannels: Int = 1000): DataFrame = {
    require(iters >= 1, "removalEffectAttribution: iters must be >= 1")
    val spark = paths.sparkSession
    import spark.implicits._
    val S = "__START__"; val C = "__CONV__"; val N = "__NULL__"
    val base = paths.select(
      coalesce(pathCol.cast("array<string>"), array()).as("p"),
      convCol.cast("boolean").as("cv"))
    val pairs = base.select(explode(arrays_zip(
        concat(array(lit(S)), col("p")).as("f"),
        concat(col("p"),
          array(when(col("cv"), lit(C)).otherwise(lit(N)))).as("t"))).as("e"))
      .select(col("e.f").as("f"), col("e.t").as("t"))
    val probs = pairs.groupBy("f", "t").agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n") / sum(col("n")).over(Window.partitionBy(col("f"))))
      .select(col("f"), col("t"), col("p"))
      .as[(String, String, Double)].collect()
    val channels = probs.iterator.flatMap(x => Iterator(x._1, x._2))
      .filterNot(Set(S, C, N)).toArray.distinct.sorted
    require(channels.length <= maxChannels,
      s"removalEffectAttribution: ${channels.length} channels exceed " +
        s"maxChannels=$maxChannels — this solver is for channel-sized " +
        "state spaces")
    val states = channels :+ S
    val byFrom = probs.groupBy(_._1)
      .map { case (f, ts) => f -> ts.sortBy(_._2) }
    def solve(removed: Option[String]): Double = {
      var v = Map.empty[String, Double].withDefaultValue(0.0)
      for (_ <- 1 to iters)
        v = states.map { s =>
          s -> byFrom.getOrElse(s, Array.empty[(String, String, Double)])
            .map { case (_, t, p) =>
              val vt =
                if (t == C) 1.0
                else if (t == N || removed.contains(t)) 0.0
                else v(t)
              p * vt
            }.sum
        }.toMap.withDefaultValue(0.0)
      v(S)
    }
    val pBase = solve(None)
    val rows = channels.map { c =>
      val pc = solve(Some(c))
      val re = if (pBase > 0) math.max(pBase - pc, 0.0) / pBase else 0.0
      (c, pBase, pc, re)
    }
    val reSum = rows.map(_._4).sum
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.map { case (c, pb, pc, re) =>
      (c, r4(pb), r4(pc), r4(re),
        if (reSum > 0) Some(r4(re / reSum)) else None)
    }.toSeq
      .toDF("channel", "p_base", "p_removed", "removal_effect", "credit")
  }

  /** Multi-touch attribution credits over a (conversion, touch) pairs
    * frame — the one the keyed [[Temporal.rangeJoin]] produces (see
    * q249): per conversion, split unit credit across its touches under
    * `model` ∈ `linear` (equal), `time_decay` (weight
    * `0.5^(Δt / halfLifeMicros)`, recency-favoring), `position` (the
    * U-shape: 40% first, 40% last, 20% spread over middles — degrading
    * to 50/50 at two touches, 100% at one), `first`, `last`. Credits
    * are renormalized to sum to 1 per conversion at 4dp; `first`/`last`
    * keep their zero-credit rows so the frame still joins 1:1 against
    * the candidate set. Touch order is (touch time, touch id) — pass a
    * real id, ties must break deterministically.
    *
    * ONE shuffle on the conversion id; rank, count and the normalizer
    * are three window functions over that single partitioning, all
    * row-local after the sort. Conversions fan out only to their own
    * touches (the range join already bounded that). Output:
    * `(conversion_id, touch_id, credit)`. */
  def attributionCredits(touches: DataFrame, convId: Column,
      touchId: Column, touchTs: Column, convTs: Column, model: String,
      halfLifeMicros: Long = 0L): DataFrame = {
    require(Set("linear", "time_decay", "position", "first", "last")(model),
      s"attributionCredits: unknown model '$model'")
    require(model != "time_decay" || halfLifeMicros > 0,
      "attributionCredits: time_decay needs halfLifeMicros > 0")
    val base = touches.select(convId.cast("long").as("conversion_id"),
      touchId.cast("long").as("touch_id"),
      unix_micros(touchTs.cast("timestamp")).as("__t"),
      unix_micros(convTs.cast("timestamp")).as("__ct"))
    val w = Window.partitionBy(col("conversion_id"))
    val ord = w.orderBy(col("__t").asc, col("touch_id").asc)
    val raw = model match {
      case "linear" => lit(1.0)
      case "first" => when(col("__rn") === 1, 1.0).otherwise(0.0)
      case "last" => when(col("__rn") === col("__n"), 1.0).otherwise(0.0)
      case "time_decay" => pow(lit(0.5),
        (col("__ct") - col("__t")).cast("double") / halfLifeMicros)
      case "position" => when(col("__n") === 1, 1.0)
        .when(col("__rn") === 1 || col("__rn") === col("__n"), 0.4)
        .otherwise(lit(0.2) / (col("__n") - 2))
    }
    base
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__raw", raw)
      .withColumn("credit",
        round(col("__raw") / sum(col("__raw")).over(w), 4))
      .select(col("conversion_id"), col("touch_id"), col("credit"))
  }

  /** Kaplan–Meier survival curve from one row per subject
    * `(duration, observed)` — `observed` true when the terminal event
    * happened at `duration`, false when the subject left the study
    * (censored) there. Output one row per distinct duration with at
    * least one observed event:
    * `(t, n_risk, n_event, survival)` — `n_risk` the subjects with
    * duration ≥ t, `survival` the running product
    * Π_{t' ≤ t} (1 − d/n) at 4dp (exactly 0.0 once a risk set dies
    * out entirely — computed by flag, never via ln(0)).
    *
    * Scale shape: ONE grouped count by duration collapses the subject
    * table to |distinct durations| rows; the cumulative windows run
    * over that collapsed frame, which is bounded by the time
    * resolution (days → thousands of rows), not by subjects — the
    * single-partition window is deliberate and cheap. */
  def kaplanMeier(subjects: DataFrame, durCol: Column,
      observedCol: Column): DataFrame = {
    val perT = subjects
      .select(durCol.cast("long").as("t"),
        observedCol.cast("boolean").as("e"))
      .filter(col("t").isNotNull && col("t") >= 0)
      .groupBy("t")
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("n_event"),
        count(lit(1)).as("n_at"))
    val asc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    perT
      .withColumn("n_risk", sum(col("n_at")).over(desc))
      .withColumn("__dead",
        sum(when(col("n_event") === col("n_risk"), 1L).otherwise(0L))
          .over(asc))
      .withColumn("__lnS",
        sum(when(col("n_event") < col("n_risk"),
          log(lit(1.0) - col("n_event") / col("n_risk").cast("double"))))
          .over(asc))
      .filter(col("n_event") > 0)
      .select(col("t"), col("n_risk"), col("n_event"),
        when(col("__dead") > 0, lit(0.0))
          .otherwise(round(exp(coalesce(col("__lnS"), lit(0.0))), 4))
          .as("survival"))
  }

  /** Nelson–Aalen cumulative hazard — [[kaplanMeier]]'s estimator
    * sibling (sums of hazards instead of products of survivals, the
    * better-behaved small-risk-set choice):
    * `H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ` over event times, plus the
    * Fleming–Harrington survival `exp(−H)`. Same input contract as
    * [[kaplanMeier]] (duration + observed flag; censored rows shape
    * the risk set only) and the same plan: one grouped count over
    * durations, cumulative windows over the |distinct durations|
    * frame. Output `(t, n_risk, n_event, cum_hazard, survival_fh)`
    * (4dp), event times only. */
  def nelsonAalen(subjects: DataFrame, durCol: Column,
      observedCol: Column): DataFrame = {
    val perT = subjects
      .select(durCol.cast("long").as("t"),
        observedCol.cast("boolean").as("e"))
      .filter(col("t").isNotNull && col("t") >= 0)
      .groupBy("t")
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("n_event"),
        count(lit(1)).as("n_at"))
    val asc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    perT
      .withColumn("n_risk", sum(col("n_at")).over(desc))
      .withColumn("__h",
        sum(col("n_event") / col("n_risk").cast("double")).over(asc))
      .filter(col("n_event") > 0)
      .select(col("t"), col("n_risk"), col("n_event"),
        round(col("__h"), 4).as("cum_hazard"),
        round(exp(-col("__h")), 4).as("survival_fh"))
  }

  /** Lorenz curve at `k` quantile points — the concentration CURVE
    * behind [[giniCoefficient]]'s scalar ("the bottom 80% of users
    * hold x% of the value"): rows sort by value ASCENDING into `k`
    * ntile groups, each reporting its share of the total and the
    * cumulative share up to it. Output
    * `(bucket, n, value_sum, cum_share)` (1-based bucket, 4dp).
    *
    * Scale shape (the [[graft.ops.Classify.liftTable]] machinery
    * pointed the other way): per-VALUE counted rows with positions
    * from the range-partitioned weighted prefix sum, spans split
    * across the ≤k broadcast ntile boundaries — no row-level global
    * window; the cumulative share is a window over k rows. */
  def lorenzCurve(df: DataFrame, valCol: Column, k: Int = 10): DataFrame = {
    require(k > 0, "lorenzCurve: k must be positive")
    val spark = df.sparkSession
    val s = df.select(valCol.cast("double").as("m"))
      .filter(col("m").isNotNull && col("m") >= 0)
    val perVal = s.groupBy("m").agg(count(lit(1)).as("t"))
    val ranked = Suffix.withWeightedOffset(perVal, Seq(col("m")),
      col("t"), "cb")
    val tot = ranked.agg(sum("t").as("nn"),
      sum(col("m") * col("t")).as("tv"))
    val dec = spark.range(k).select(col("id").as("g"))
    val q = expr(s"nn div $k")
    val m0 = col("nn") % k
    val dlo = col("g") * q + least(col("g"), m0) + 1
    val dhi = dlo + q + when(col("g") < m0, 1).otherwise(0) - 1
    val olo = greatest(col("cb") + 1, col("dlo"))
    val ohi = least(col("cb") + col("t"), col("dhi"))
    val perB = ranked.crossJoin(broadcast(tot))
      .crossJoin(broadcast(dec))
      .select(col("g"), col("m"), col("t"), col("cb"), col("nn"),
        col("tv"), dlo.as("dlo"), dhi.as("dhi"))
      .select(col("g"), col("m"), col("nn"), col("tv"),
        (ohi - olo + 1).as("c"))
      .filter(col("c") > 0)
      .groupBy("g", "nn", "tv")
      .agg(sum("c").as("n"), sum(col("c") * col("m")).as("vs"))
    val w = Window.orderBy("g") // k rows — the tiny-frame window
    perB.select((col("g") + 1).as("bucket"), col("n"),
        round(col("vs"), 4).as("value_sum"),
        round(when(col("tv") > 0,
          sum(col("vs")).over(w) / col("tv")).otherwise(0.0), 4)
          .as("cum_share"))
      .orderBy("bucket")
  }

  /** Gini concentration coefficient of a non-negative value
    * distribution (revenue concentration, token-frequency inequality):
    * one row `(n, total, gini)` at 4dp, gini by the sorted-rank
    * identity G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over x ascending
    * (ties broken by `tieBreakCol` for engine determinism; 0 when the
    * total is 0).
    *
    * Scale shape: the global ascending index is [[Scale.withGlobalIndex]]
    * — a range-partitioned sort with in-plan per-partition offsets, no
    * single-task sort, no unpartitioned window — then ONE aggregate.
    * Nothing driver-side at any size. */
  def giniCoefficient(df: DataFrame, valCol: Column,
      tieBreakCol: Column): DataFrame = {
    val base = df.select(valCol.cast("double").as("x"), tieBreakCol.as("tb"))
      .filter(col("x").isNotNull)
    // `total` sums in DECIMAL(38,6), not double (round-13 sf0.1 sweep
    // find): a double sum at 10^10 magnitude carries ~10 ulps of
    // summation-ORDER noise — Spark's partial-agg tree vs a sequential
    // sum legitimately disagree in the 4th decimal — while the decimal
    // sum is exact and order-independent (the inputs are currency-like
    // values, unambiguous at 6 dp). The gini RATIO stays double: it is
    // scale-free in [−1, 1], where 4 dp sits far above ulp noise.
    Scale.withGlobalIndex(base, Seq(col("x"), col("tb")), "i")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .as("__sxd"),
        sum(col("x")).as("__sx"),
        sum(col("i") * col("x")).as("__six"))
      .select(col("n"),
        coalesce(col("__sxd").cast("double"), lit(0.0)).as("total"),
        round(when(coalesce(col("__sx"), lit(0.0)) > 0,
          (lit(2.0) * col("__six") - (col("n") + 1) * col("__sx")) /
            (col("n") * col("__sx"))).otherwise(0.0), 4).as("gini"))
  }

  /** Pairwise association rules over baskets (market-basket affinity):
    * for every ordered item pair (a → b) co-occurring in at least
    * `minPairs` baskets, `(antecedent, consequent, n_ab, support,
    * confidence, lift)` at 4dp — support = n_ab/N, confidence =
    * n_ab/n_a, lift = confidence / (n_b/N), N the basket count.
    *
    * Scale shape: baskets dedup to distinct (basket, item) — the only
    * pass over the raw table — then the pair count comes from a
    * same-basket self-join whose fan-out is bounded by the per-basket
    * item count (choose-2 per basket, never a global cross), and the
    * per-item counts and basket total attach by BROADCAST (|items| and
    * 1-row frames). `minPairs` prunes before the broadcast joins, so
    * the rule frame never carries the singleton tail. */
  def associationRules(baskets: DataFrame, basketCol: Column,
      itemCol: Column, minPairs: Long = 1L): DataFrame = {
    require(minPairs >= 1, "associationRules: minPairs >= 1")
    val b = baskets
      .select(basketCol.cast("long").as("bk"), itemCol.cast("long").as("it"))
      .filter(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
      .localCheckpoint(true) // read 3×: pair sides + item counts
    val nB = b.select(countDistinct(col("bk")).as("__nb"))
    val itemCounts = b.groupBy("it").agg(count(lit(1)).as("__ci"))
    val pairs = b.as("x").join(b.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("a"), col("y.it").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    val directed = pairs.select(col("a"), col("b"), col("n_ab"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b"),
        col("n_ab")))
    directed
      .join(broadcast(itemCounts.select(col("it").as("a"),
        col("__ci").as("__ca"))), "a")
      .join(broadcast(itemCounts.select(col("it").as("b"),
        col("__ci").as("__cb"))), "b")
      .crossJoin(broadcast(nB))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("n_ab"),
        round(col("n_ab") / col("__nb").cast("double"), 4).as("support"),
        round(col("n_ab") / col("__ca").cast("double"), 4).as("confidence"),
        // ONE double division over exact integer products (engine-
        // portable to the bit; the two-division form rounds differently
        // at 4dp boundaries). Exact while n_ab·N and ca·cb < 2^53.
        round((col("n_ab") * col("__nb")).cast("double") /
          (col("__ca") * col("__cb")).cast("double"), 4).as("lift"))
  }
}
