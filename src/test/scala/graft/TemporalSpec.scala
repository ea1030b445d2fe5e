package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal

/** As-of join + bucketed range join against hand-computed fixtures, plus
  * the plain-vs-bucketed as-of equivalence on a generated tape. */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def trades() = {
    import spark.implicits._
    Seq(
      (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
      (2L, "A", ts("2024-01-01 10:00:30"), 101.0),
      (3L, "B", ts("2024-01-01 10:00:10"), 50.0),
      (4L, "B", ts("2024-01-01 09:59:00"), 49.0), // before any quote
      (5L, "C", ts("2024-01-01 12:00:00"), 7.0)   // key with no quotes
    ).toDF("event_id", "sym", "t", "px")
  }

  private def quotes() = {
    import spark.implicits._
    Seq(
      (10L, "A", ts("2024-01-01 10:00:00"), 99.5),
      (11L, "A", ts("2024-01-01 10:00:05"), 99.9), // equal-ts: must match trade 1
      (12L, "A", ts("2024-01-01 10:00:20"), 100.5),
      (13L, "B", ts("2024-01-01 10:00:01"), 48.5),
      (14L, "B", ts("2024-01-01 10:00:01"), 48.7)  // same ts: max tiebreak wins
    ).toDF("qid", "sym", "t", "bid")
  }

  test("asofJoin: latest at-or-before per key, equal-ts match, no-match null") {
    val out = Temporal.asofJoin(trades(), quotes(), Seq("sym"), "t",
        payload = Seq("qid", "bid"), rightTiebreak = col("qid"))
      .select("event_id", "asof_qid", "asof_bid")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 11L, 99.9),   // equal timestamp counts
      (2L, 12L, 100.5),
      (3L, 14L, 48.7),   // tie at 10:00:01 → greatest tiebreak
      (4L, -1L, -1.0),   // nothing precedes
      (5L, -1L, -1.0)))  // key has no quotes at all
  }

  test("asofJoin: tolerance voids stale matches but keeps fresh ones") {
    val out = Temporal.asofJoin(trades(), quotes(), Seq("sym"), "t",
        payload = Seq("qid"), rightTiebreak = col("qid"),
        toleranceMicros = Some(9L * 1000000L))
      .select("event_id", "asof_qid").orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // trade 1: gap 0s → 11 keeps; trade 2: gap 10s > 9s → void;
    // trade 3: gap 9s → 14 keeps
    assert(out.toSeq == Seq((1L, 11L), (2L, -1L), (3L, 14L), (4L, -1L), (5L, -1L)))
  }

  test("asofJoin: bucketed carry crosses right-empty buckets") {
    import spark.implicits._
    // the gap case: quotes only on day 1, trades days 3-5 — every trade
    // bucket is right-empty, so the carry must walk across whole days
    val right = Seq(
      (1L, "g", ts("2024-01-01 09:00:00"), 10.0),
      (2L, "g", ts("2024-01-01 17:00:00"), 11.0), // the latest: must win
      (3L, "h", ts("2024-01-01 12:00:00"), 20.0)
    ).toDF("rid", "k", "t", "v")
    val left = Seq(
      (101L, "g", ts("2024-01-03 10:00:00")),
      (102L, "g", ts("2024-01-05 23:00:00")),
      (103L, "h", ts("2024-01-04 08:00:00")),
      (104L, "h", ts("2024-01-01 11:00:00")) // before h's only quote → null
    ).toDF("id", "k", "t")
    def run(bk: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]) =
      Temporal.asofJoin(left, right, Seq("k"), "t",
          payload = Seq("rid", "v"), rightTiebreak = col("rid"), bucket = bk)
        .select("id", "asof_rid", "asof_v")
        .orderBy("id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    val plain = run(None)
    val bucketed = run(Some(c => date_trunc("day", c)))
    assert(plain == Seq((101L, 2L, 11.0), (102L, 2L, 11.0),
      (103L, 3L, 20.0), (104L, -1L, -1.0)))
    assert(bucketed == plain)
  }

  test("asofJoin: bucketed construction matches the plain keyed window") {
    import spark.implicits._
    // deterministic tape: 3 keys × 400 rows at jittered ~hourly spacing
    // (so day buckets hold many right rows; the right-EMPTY-bucket gap
    // case is the dedicated fixture above)
    val rows = for {
      k <- Seq("x", "y", "z"); i <- 0 until 400
    } yield {
      val h = graft.expr.PortableHash.hex15(s"$k:$i")
      (k, i.toLong, new java.sql.Timestamp(
        1704067200000L + i * 3600000L + (h % 3600000L)), (h % 1000L).toDouble)
    }
    val df = rows.toDF("k", "id", "t", "v")
    val left = df.filter(col("id") % 3 =!= 0)
      .select(col("k"), col("id"), col("t"))
    // right rows stop at id 150 (~day 6 of ~17): the tape's tail buckets
    // are all right-empty, so the equivalence also covers the carry gap
    val right = df.filter(col("id") % 3 === 0 && col("id") < 150)
      .select(col("k"), col("id").as("rid"), col("t"), col("v"))
    def run(bk: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]) =
      Temporal.asofJoin(left, right, Seq("k"), "t",
          payload = Seq("rid", "v"), rightTiebreak = col("rid"), bucket = bk)
        .select("k", "id", "asof_rid", "asof_v", "asof_time")
        .orderBy("k", "id").collect().toSeq
    val plain = run(None)
    val bucketed = run(Some(c => date_trunc("day", c)))
    assert(plain == bucketed)
    assert(plain.count(!_.isNullAt(2)) > 700) // matches actually happen
  }

  test("asofJoin forward: earliest at-or-after, equal-ts, tolerance, " +
      "bucketed == plain across right-empty buckets") {
    import spark.implicits._
    val out = Temporal.asofJoin(trades(), quotes(), Seq("sym"), "t",
        payload = Seq("qid", "bid"), rightTiebreak = col("qid"),
        direction = "forward")
      .select("event_id", "asof_qid").orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // trade 1 @10:00:05: equal-ts quote 11 matches (>= semantics);
    // trade 2 @10:00:30: nothing after → null; trade 4 @09:59:00: the
    // earliest B quote is the 10:00:01 TIE pair → greatest qid (14)
    assert(out.toSeq == Seq((1L, 11L), (2L, -1L), (3L, -1L), (4L, 14L),
      (5L, -1L)))
    val tol = Temporal.asofJoin(trades(), quotes(), Seq("sym"), "t",
        payload = Seq("qid"), rightTiebreak = col("qid"),
        toleranceMicros = Some(30L * 1000000L), direction = "forward")
      .select("event_id", "asof_qid").orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // trade 4: gap to 10:00:01 is 61 s > 30 s → void
    assert(tol.toSeq == Seq((1L, 11L), (2L, -1L), (3L, -1L), (4L, -1L),
      (5L, -1L)))
    // gap-crossing equivalence, mirrored: quotes only on the LAST day
    val right = Seq(
      (1L, "g", ts("2024-01-05 09:00:00"), 10.0),
      (2L, "g", ts("2024-01-05 08:00:00"), 11.0))
      .toDF("rid", "k", "t", "v")
    val leftF = Seq(
      (101L, "g", ts("2024-01-01 10:00:00")),
      (102L, "g", ts("2024-01-03 23:00:00")),
      (103L, "g", ts("2024-01-05 08:30:00")))
      .toDF("id", "k", "t")
    def run(bk: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]) =
      Temporal.asofJoin(leftF, right, Seq("k"), "t",
          payload = Seq("rid"), rightTiebreak = col("rid"), bucket = bk,
          direction = "forward")
        .select("id", "asof_rid").orderBy("id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    val plain = run(None)
    assert(plain == Seq((101L, 2L), (102L, 2L), (103L, 1L)))
    assert(run(Some(c => date_trunc("day", c))) == plain)
  }

  test("asofJoinNearest: closer side wins, equal distance resolves " +
      "backward, tolerance voids both directions") {
    import spark.implicits._
    val right = Seq(
      (1L, "n", ts("2024-01-01 10:00:00"), 1.0),
      (2L, "n", ts("2024-01-01 11:00:00"), 2.0))
      .toDF("rid", "k", "t", "v")
    val left = Seq(
      (101L, "n", ts("2024-01-01 10:10:00")), // closer to rid 1
      (102L, "n", ts("2024-01-01 10:55:00")), // closer to rid 2
      (103L, "n", ts("2024-01-01 10:30:00")), // EQUAL distance → backward
      (104L, "n", ts("2024-01-01 09:00:00")), // only forward exists
      (105L, "n", ts("2024-01-01 12:00:00"))) // only backward exists
      .toDF("id", "k", "t")
    val out = Temporal.asofJoinNearest(left, right, Seq("k"), "t",
        payload = Seq("rid"), rightTiebreak = col("rid"))
      .select("id", "asof_rid").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((101L, 1L), (102L, 2L), (103L, 1L),
      (104L, 1L), (105L, 2L)))
    val tol = Temporal.asofJoinNearest(left, right, Seq("k"), "t",
        payload = Seq("rid"), rightTiebreak = col("rid"),
        toleranceMicros = Some(15L * 60 * 1000000L))
      .select("id", "asof_rid").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // 15 min: 101 (10 min) and 102 (5 min) keep; the rest void
    assert(tol.toSeq == Seq((101L, 1L), (102L, 2L), (103L, -1L),
      (104L, -1L), (105L, -1L)))
  }

  test("intervalOverlapJoin: overlap pairs exactly once, boundaries " +
      "exclusive, empty/inverted drop") {
    import spark.implicits._
    val as = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")), // 2h
      (2L, ts("2024-01-01 13:00:00"), ts("2024-01-01 13:30:00")),
      (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:00"))) // empty
      .toDF("aid", "s", "e")
    val bs = Seq(
      (10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:30:00")), // overlaps 1
      (11L, ts("2024-01-01 11:00:00"), ts("2024-01-01 14:00:00")), // overlaps 1 AND 2, many buckets
      (12L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")), // abuts 1 (end-exclusive) → no
      (13L, ts("2024-01-02 01:00:00"), ts("2024-01-02 00:00:00"))) // inverted
      .toDF("bid", "s", "e")
    val out = Temporal.intervalOverlapJoin(
        as, col("aid"), col("s"), col("e"),
        bs, col("bid"), col("s"), col("e"),
        bucketWidthMicros = 15L * 60 * 1000000L,
        bPayload = Seq("b_start" -> col("s")))
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L), (1L, 11L), (2L, 11L)))
    // keyed variant: only same-key pairs survive
    val keyed = Temporal.intervalOverlapJoin(
        as.withColumn("u", col("aid") % 2), col("aid"), col("s"), col("e"),
        bs.withColumn("u", col("bid") % 2), col("bid"), col("s"), col("e"),
        bucketWidthMicros = 15L * 60 * 1000000L,
        aKeys = Seq(col("u")), bKeys = Seq(col("u")))
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // aid 1 (odd) × bid 11 (odd) is the only surviving same-parity pair
    assert(keyed == Seq((1L, 11L)))
  }

  test("rangeJoin: boundaries, multi-bucket spans, inverted intervals drop") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start of i1 → in
      (2L, ts("2024-01-01 10:29:59")), // inside i1
      (3L, ts("2024-01-01 10:30:00")), // == end of i1 (exclusive) → out, == start of i2 → in
      (4L, ts("2024-01-01 23:59:59")), // inside the day-spanning i3
      (5L, ts("2024-01-02 00:00:01")), // inside i3, next day bucket
      (6L, ts("2024-01-05 00:00:00"))  // in nothing
    ).toDF("pid", "pt")
    val ivs = Seq(
      (101L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (102L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:00:00")),
      (103L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")),
      (104L, ts("2024-01-03 10:00:00"), ts("2024-01-03 10:00:00")), // empty
      (105L, ts("2024-01-03 11:00:00"), ts("2024-01-03 10:00:00"))  // inverted
    ).toDF("iid", "s", "e")
    val out = Temporal.rangeJoin(points, col("pid"), col("pt"),
        ivs, col("iid"), col("s"), col("e"),
        bucketWidthMicros = 15L * 60 * 1000000L) // 15-min buckets
      .orderBy("p_id", "i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 101L), (2L, 101L), (3L, 102L), (4L, 103L), (5L, 103L)))
  }

  test("timeWeightedAvg: held values integrate per bucket, covered " +
      "micros normalize, no extrapolation past the last event") {
    import spark.implicits._
    val ev = Seq(
      // key 1: v=10 holds 10:30-11:00 (half of bucket 10h, but covered
      // only 30 min), v=20 holds 11:00-11:45, v=40 holds 11:45-12:30
      (1L, ts("2024-01-01 10:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, ts("2024-01-01 11:45:00"), 40.0),
      (1L, ts("2024-01-01 12:30:00"), 99.0), // last event: nothing holds after
      // key 2: single event → no validity → no output rows
      (2L, ts("2024-01-01 10:00:00"), 7.0)
    ).toDF("k", "t", "v")
    val out = Temporal.timeWeightedAvg(ev, col("k"), col("t"), col("v"),
        bucketWidthMicros = 3600L * 1000000L)
      .orderBy("k", "bucket_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      // bucket 10:00: only v=10 held, 30 min covered
      (1L, "2024-01-01 10:00:00.0", 10.0, 1800L * 1000000L),
      // bucket 11:00: v=20 for 45 min, v=40 for 15 min → 25.0, fully covered
      (1L, "2024-01-01 11:00:00.0", 25.0, 3600L * 1000000L),
      // bucket 12:00: v=40 for 30 min; the 99 value never integrates
      (1L, "2024-01-01 12:00:00.0", 40.0, 1800L * 1000000L)))
  }

  test("rollingStats: trailing frame, delta/gap nulls on first row") {
    import spark.implicits._
    val df = Seq(
      (1L, "u", ts("2024-01-01 10:00:00"), 10.0),
      (2L, "u", ts("2024-01-01 10:00:30"), 20.0),
      (3L, "u", ts("2024-01-01 10:02:30"), 6.0),
      (4L, "v", ts("2024-01-01 11:00:00"), 1.0)
    ).toDF("id", "k", "t", "v")
    val out = graft.ops.Temporal.rollingStats(df, col("id"), Seq("k"),
        col("t"), col("v"), nRows = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(6)) Double.NaN else r.getDouble(6),
        if (r.isNullAt(7)) -1L else r.getLong(7)))
    assert(out(0) == (1L, 10.0, 10.0, out(0)._4, -1L) && out(0)._4.isNaN)
    assert(out(1) == (2L, 15.0, 10.0, 10.0, 30L))
    assert(out(2) == (3L, 13.0, 6.0, -14.0, 120L))
    assert(out(3) == (4L, 1.0, 1.0, out(3)._4, -1L) && out(3)._4.isNaN)
  }

  test("funnel: order matters, out-of-order steps do not count") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes all three in order
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 11:00:00")),
      (1L, "c", ts("2024-01-01 12:00:00")),
      // u2 does b BEFORE a → reaches a only
      (2L, "b", ts("2024-01-01 09:00:00")),
      (2L, "a", ts("2024-01-01 10:00:00")),
      // u3 a then c (no b) → stops after a
      (3L, "a", ts("2024-01-01 10:00:00")),
      (3L, "c", ts("2024-01-01 11:00:00")),
      // u4 equal timestamps count (>=)
      (4L, "a", ts("2024-01-01 10:00:00")),
      (4L, "b", ts("2024-01-01 10:00:00")),
      (4L, "c", ts("2024-01-01 10:00:00"))
    ).toDF("u", "tp", "t")
    val out = graft.ops.Temporal.funnel(ev, col("u"), col("tp"), col("t"),
        Seq("a", "b", "c"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "a", 4L), (2, "b", 2L), (3, "c", 2L)))
    // a step nobody reaches still reports 0
    val z = graft.ops.Temporal.funnel(ev, col("u"), col("tp"), col("t"),
        Seq("a", "zz", "c"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(z == Seq((1, "a", 4L), (2, "zz", 0L), (3, "c", 0L)))
    // the per-key frame: earliest in-order completion times, keys stop
    // at their last reached step
    val st = graft.ops.Temporal.funnelSteps(ev, col("u"), col("tp"),
        col("t"), Seq("a", "b", "c"))
      .orderBy("k", "step_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3))).toSeq
    assert(st == Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (1L, 2L, "b", ts("2024-01-01 11:00:00")),
      (1L, 3L, "c", ts("2024-01-01 12:00:00")),
      (2L, 1L, "a", ts("2024-01-01 10:00:00")),
      (3L, 1L, "a", ts("2024-01-01 10:00:00")),
      (4L, 1L, "a", ts("2024-01-01 10:00:00")),
      (4L, 2L, "b", ts("2024-01-01 10:00:00")),
      (4L, 3L, "c", ts("2024-01-01 10:00:00"))))
  }

  test("ewmaSmooth: trailing kernel renormalizes at series starts") {
    import spark.implicits._
    val df = Seq(
      (1L, "u", ts("2024-01-01 10:00:00"), 10.0),
      (2L, "u", ts("2024-01-01 10:01:00"), 20.0),
      (3L, "u", ts("2024-01-01 10:02:00"), 20.0),
      (4L, "v", ts("2024-01-01 10:00:00"), 8.0)
    ).toDF("id", "k", "t", "v")
    val out = graft.ops.Temporal.ewmaSmooth(df, col("id"), Seq("k"),
        col("t"), col("v"), alpha = 0.5, nRows = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // row 1: just itself; row 2: (20 + 10*0.5)/1.5; row 3:
    // (20 + 20*0.5 + 10*0.25)/1.75; lone key v: itself
    assert(out.toSeq == Seq((1L, 10.0), (2L, 16.6667), (3L, 18.5714),
      (4L, 8.0)))
  }

  test("abTest: Welch moments, lift, significance threshold") {
    import spark.implicits._
    val units = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 2.0), (1, 3.0),
      (1, 4.0)).toDF("arm", "m")
    val r = graft.ops.Experiment.abTest(units, col("arm"), col("m")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 3.0)
    assert(r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 1.2247) // 1 / sqrt(1/3 + 1/3)
    assert(!r.getBoolean(6))
    // a clear separation flips the flag
    val far = Seq((0, 1.0), (0, 1.1), (0, 0.9), (1, 9.0), (1, 9.1),
      (1, 8.9)).toDF("arm", "m")
    assert(graft.ops.Experiment.abTest(far, col("arm"), col("m"))
      .head().getBoolean(6))
  }

  test("cupedAbTest: pooled theta, adjusted moments, closed-form " +
      "variance matches the hand computation") {
    import spark.implicits._
    // y ≈ x + arm effect: θ = 4.5/4 = 1.125, adjusted arm means
    // 2.1667 / 3.0, adjusted variances 0.036458 / 0.015625 → z = √40
    val units = Seq((0, 1.0, 1.0), (0, 2.0, 2.0), (0, 3.5, 3.0),
      (1, 2.0, 1.0), (1, 3.0, 2.0), (1, 4.0, 3.0)).toDF("arm", "y", "x")
    val r = graft.ops.Experiment.cupedAbTest(units, col("arm"), col("y"),
      col("x")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.1667 && r.getDouble(3) == 3.0)
    assert(r.getDouble(4) == 0.8333)
    assert(r.getDouble(5) == 1.125)  // theta
    assert(r.getDouble(6) == 6.3246) // √40: covariate soaked the noise
    assert(r.getBoolean(7))
    // the same tape UNADJUSTED is not significant — that is the point
    assert(!graft.ops.Experiment.abTest(units, col("arm"), col("y"))
      .head().getBoolean(6))
  }

  test("srmCheck: chi-square vs design ratios, absent arm observed 0") {
    import spark.implicits._
    val even = (1 to 60).map(_ => 0) ++ (1 to 40).map(_ => 1)
    val r = graft.ops.Experiment.srmCheck(even.toDF("arm"), col("arm"),
      Seq(0 -> 1.0, 1 -> 1.0)).head()
    assert(r.getLong(0) == 100L && r.getDouble(1) == 4.0 &&
      r.getLong(2) == 1L && !r.getBoolean(3)) // 60/40 at n=100: fine
    val skewed = (1 to 80).map(_ => 0) ++ (1 to 20).map(_ => 1)
    val r2 = graft.ops.Experiment.srmCheck(skewed.toDF("arm"), col("arm"),
      Seq(0 -> 1.0, 1 -> 1.0)).head()
    assert(r2.getDouble(1) == 36.0 && r2.getBoolean(3)) // alarm
    // an arm missing from the data entirely IS the mismatch
    val onearm = (1 to 20).map(_ => 0)
    val r3 = graft.ops.Experiment.srmCheck(onearm.toDF("arm"), col("arm"),
      Seq(0 -> 1.0, 1 -> 1.0)).head()
    assert(r3.getDouble(1) == 20.0 && r3.getBoolean(3))
  }

  test("funnelLatency: adjacent-step seconds, exact percentiles") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 11:00:00")),
      (1L, "c", ts("2024-01-01 12:00:00")),
      (4L, "a", ts("2024-01-01 10:00:00")),
      (4L, "b", ts("2024-01-01 10:00:00")),
      (4L, "c", ts("2024-01-01 10:00:00")),
      (9L, "a", ts("2024-01-01 09:00:00")) // never converts → no row
    ).toDF("u", "tp", "t")
    val out = graft.ops.Experiment.funnelLatency(ev, col("u"), col("tp"),
        col("t"), Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // each transition: latencies {3600, 0} → p50 1800, p90 3240
    assert(out == Seq((1L, "a", 2L, 1800.0, 3240.0),
      (2L, "b", 2L, 1800.0, 3240.0)))
  }

  test("cohortRetention: first-seen cohorts, period offsets, distinct keys") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort 2024-01-01, idx 0
      (1L, ts("2024-01-09 10:00:00")), // idx 1 (8 days / 7)
      (1L, ts("2024-01-10 10:00:00")), // idx 1 again → distinct
      (2L, ts("2024-01-03 10:00:00")), // cohort 2024-01-03, idx 0
      (2L, ts("2024-01-03 23:00:00"))  // same day → idx 0 distinct
    ).toDF("u", "t")
    val out = graft.ops.Temporal.cohortRetention(ev, col("u"), col("t"), 7)
      .orderBy("cohort_day", "period_idx").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-03", 0L, 1L)))
  }

  test("rangeJoin: payload passthrough and exactly-once pairs") {
    import spark.implicits._
    val points = Seq((1L, ts("2024-01-01 00:00:30"), "p")).toDF("pid", "pt", "tag")
    // interval covers 120 one-second buckets — the pair must appear once
    val ivs = Seq((9L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:02:00"), "w"))
      .toDF("iid", "s", "e", "label")
    val out = Temporal.rangeJoin(points, col("pid"), col("pt"),
        ivs, col("iid"), col("s"), col("e"),
        bucketWidthMicros = 1000000L,
        pPayload = Seq("tag" -> col("tag")),
        iPayload = Seq("label" -> col("label"))).collect()
    assert(out.length == 1)
    assert(out.head.getString(2) == "p" && out.head.getString(3) == "w")
  }

  test("rangeJoin with equi-keys: only same-key (point, interval) pairs") {
    import spark.implicits._
    val points = Seq(
      (1L, 7L, ts("2024-01-01 10:30:00")),
      (2L, 8L, ts("2024-01-01 10:30:00"))) // same time, other key
      .toDF("pid", "u", "pt")
    val ivs = Seq(
      (9L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (10L, 9L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "u", "s", "e")
    val out = Temporal.rangeJoin(points, col("pid"), col("pt"),
        ivs, col("iid"), col("s"), col("e"),
        bucketWidthMicros = 900000000L,
        pKeys = Seq(col("u")), iKeys = Seq(col("u"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 9L))) // key 8 point and key 9 interval unmatched
  }

  test("anomalies: spike scores against priors only, z gated on " +
      "minPrior and nonzero variance") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 11:00:00"), 12.0),
      (3L, 1L, ts("2024-01-01 12:00:00"), 11.0),
      (4L, 1L, ts("2024-01-01 13:00:00"), 10.0),
      (5L, 1L, ts("2024-01-01 14:00:00"), 100.0), // the spike
      (6L, 2L, ts("2024-01-01 10:00:00"), 5.0),   // constant-series key
      (7L, 2L, ts("2024-01-01 11:00:00"), 5.0),
      (8L, 2L, ts("2024-01-01 12:00:00"), 5.0),
      (9L, 2L, ts("2024-01-01 13:00:00"), 5.0)
    ).toDF("id", "u", "t", "v")
    val out = Temporal.anomalies(ev, col("id"), Seq("u"), col("t"),
        col("v"), nRows = 4, minPrior = 3, threshold = 2.0)
      .orderBy("u", "id").collect()
      .map(r => (r.getLong(0), r.getLong(3),
        Option(r.get(r.fieldIndex("z"))).map(_.asInstanceOf[Double]),
        r.getLong(r.fieldIndex("is_anomaly"))))
    // key 1: rows 1-3 have < 3 priors → z null; row 4 z small; row 5 huge
    assert(out(0)._3.isEmpty && out(0)._4 == 0L && out(0)._2 == 0L)
    assert(out(2)._3.isEmpty) // 2 priors < minPrior
    assert(out(3)._3.nonEmpty && out(3)._4 == 0L) // in-regime row
    val spike = out(4)
    assert(spike._2 == 4L && spike._3.exists(_ > 2.0) && spike._4 == 1L)
    // key 2: 3 priors exist at row 9 but variance is zero → z null, no flag
    assert(out.drop(5).forall(r => r._3.isEmpty && r._4 == 0L))
  }

  test("levelShift: peak shift lands on the step change, edges dropped") {
    import spark.implicits._
    val ev = (1L to 8L).map(i => (i, 1L,
      ts(f"2024-01-01 ${9 + i}%02d:00:00"), if (i <= 4) 1.0 else 9.0))
      .toDF("id", "u", "t", "v")
    val out = Temporal.levelShift(ev, col("id"), Seq("u"), col("t"),
        col("v"), nRows = 2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(r.fieldIndex("shift"))))
    // full both-side windows exist only for rows 3..7
    assert(out.map(_._1).toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    assert(out.toMap == Map(3L -> 0.0, 4L -> 4.0, 5L -> 8.0,
      6L -> 4.0, 7L -> 0.0)) // peak exactly at the first 9.0 (id 5)
  }

  test("seasonalDecompose: identity holds, seasonal indices recenter " +
      "to zero per key, phases cycle") {
    import spark.implicits._
    // period-2 square wave on a ramp: value = i + (6 if odd position)
    val ev = (0L until 12L).map(i => (i + 1, 1L,
      ts(f"2024-01-01 ${i}%02d:30:00"), i.toDouble + (if (i % 2 == 1) 6.0 else 0.0)))
      .toDF("id", "u", "t", "v")
    val rows = Temporal.seasonalDecompose(ev, col("id"), Seq("u"),
        col("t"), col("v"), period = 2).orderBy("id").collect()
    def d(r: org.apache.spark.sql.Row, c: String): Option[Double] =
      Option(r.get(r.fieldIndex(c))).map(_.asInstanceOf[Double])
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("phase")) == (r.getLong(0) - 1) % 2)
      (d(r, "trend"), d(r, "seasonal"), d(r, "resid")) match {
        case (Some(t), Some(s), Some(res)) =>
          assert(math.abs(r.getDouble(r.fieldIndex("value")) - (t + s + res)) < 1e-6)
        case (None, _, res) => assert(res.isEmpty) // edge rows: no trend
        case other => fail(s"unexpected $other")
      }
    }
    // recentering: the two per-key seasonal indices sum to ~0. On this
    // tape the detrended wave is exactly ±4: the 3-row centered MA of a
    // ±3 square wave on a unit ramp swings ∓1 against the wave
    val idx = rows.flatMap(r =>
      d(r, "seasonal").map(s => (r.getLong(r.fieldIndex("phase")), s)))
      .distinct.toMap
    assert(math.abs(idx(0L) + idx(1L)) < 1e-3)
    assert(math.abs(idx(1L) - 4.0) < 1e-3)
    // edge rows (first and last) carry no trend
    assert(d(rows.head, "trend").isEmpty && d(rows.last, "trend").isEmpty)
  }

  test("mannWhitney: hand-computed U and tie-corrected z; complete " +
      "separation sits at the significance edge") {
    import spark.implicits._
    // ties: arm0=[1,2], arm1=[2,3] → midranks 1, 2.5, 2.5, 4
    val tied = Seq((0, 1.0), (0, 2.0), (1, 2.0), (1, 3.0)).toDF("arm", "m")
    val t = graft.ops.Experiment.mannWhitney(tied, col("arm"), col("m"))
      .head()
    // R1 = 2.5 + 4 = 6.5, U = 3.5; var = (4/12)·(5 − 6/12) = 1.5 →
    // z = 1.5/√1.5 = 1.2247
    assert((t.getLong(0), t.getLong(1), t.getDouble(2), t.getDouble(3),
      t.getBoolean(4)) == ((2L, 2L, 3.5, 1.2247, false)))
    // complete separation, no ties: U = n1·n2 = 9, z = 4.5/√5.25
    val sep = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0),
      (1, 6.0)).toDF("arm", "m")
    val s = graft.ops.Experiment.mannWhitney(sep, col("arm"), col("m"))
      .head()
    assert((s.getDouble(2), s.getDouble(3), s.getBoolean(4)) ==
      ((9.0, 1.9640, true)))
  }

  test("funnelStepsWindowed: deadline gates later steps; re-entry does " +
      "not reopen the window") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: completes inside the 1h window (boundary-inclusive)
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "b", ts("2024-01-01 11:00:00")),
      // user 2: step b only past the deadline — stops at step 1
      (2L, "a", ts("2024-01-01 10:00:00")),
      (2L, "b", ts("2024-01-01 11:00:01")),
      // user 3: a second 'a' would open a window reaching its 'b', but
      // the anchor stays at the FIRST 'a' (documented contract)
      (3L, "a", ts("2024-01-01 08:00:00")),
      (3L, "a", ts("2024-01-01 12:00:00")),
      (3L, "b", ts("2024-01-01 12:30:00"))
    ).toDF("k", "tp", "t")
    val out = graft.ops.Temporal.funnelStepsWindowed(ev, col("k"),
        col("tp"), col("t"), Seq("a", "b"),
        windowMicros = 3600L * 1000000L)
      .orderBy("k", "step_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 1L)))
    // unwindowed twin reaches step 2 for users 2 and 3
    val plain = graft.ops.Temporal.funnelSteps(ev, col("k"), col("tp"),
        col("t"), Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain == Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L)))
  }

  test("holtSmooth: hand-computed level/trend recurrence, single-point " +
      "series degenerates to (y, 0)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-02 00:00:00"), 2L, 12.0),
      (1L, ts("2024-01-03 00:00:00"), 3L, 14.0),
      (2L, ts("2024-01-01 00:00:00"), 4L, 7.0)
    ).toDF("k", "t", "id", "y")
    val out = graft.ops.Temporal.holtSmooth(df, col("k"), col("t"),
        col("id"), col("y"), alpha = 0.5, beta = 0.5, horizon = 2)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // k=1: l2=11, b2=0.5; l3=0.5·14+0.5·11.5=12.75,
    // b3=0.5·1.75+0.25=1.125; forecast=12.75+2·1.125=15.0
    assert(out.toSeq == Seq(
      (1L, 3L, 12.75, 1.125, 15.0),
      (2L, 1L, 7.0, 0.0, 7.0)))
  }
}
