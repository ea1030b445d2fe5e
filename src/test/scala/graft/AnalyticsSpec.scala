package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Analytics

/** Engagement-analytics ops against hand-computed fixtures: rolling
  * active users, transition matrix, inactivity gaps, OHLC bars, LOCF
  * resampling. */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("activeUsers: windowed distinct counts on the observed-day grid") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 18:00:00")), // same (user, day): counted once
      (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-03 11:00:00")),
      (3L, ts("2024-01-06 09:00:00"))
    ).toDF("u", "t")
    val out = Analytics.activeUsers(ev, col("u"), col("t"), Seq(1, 3))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // grid = observed days only: Jan 2 (inside windows but eventless)
    // and Jan 4-5 never appear
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, 2L), // u1, u2
      ("2024-01-03", 1L, 2L), // day: u2; trailing 3: u1(d1), u2
      ("2024-01-06", 1L, 1L)  // u3 only; d3 is out of (d3, d6] reach
    ))
  }

  test("activeUsersApprox: HLL estimates track the exact twin within " +
      "tolerance on a many-user tape") {
    import spark.implicits._
    // 400 users × deterministic activity spread over 20 days
    val ev = (0 until 400).flatMap { u =>
      (0 until 20).filter(d => (u * 7 + d * 13) % 5 < 2)
        .map(d => (u.toLong, ts(f"2024-01-${d + 1}%02d 10:00:00")))
    }.toDF("u", "t")
    val exact = Analytics.activeUsers(ev, col("u"), col("t"), Seq(1, 7))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    val approx = Analytics.activeUsersApprox(ev, col("u"), col("t"),
        Seq(1, 7)).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
    assert(approx.length == exact.size)
    approx.foreach { case (day, (e1, e7)) =>
      val (x1, x7) = exact(day)
      assert(math.abs(e1 - x1) <= math.max(2L, (0.05 * x1).toLong),
        s"$day au_1 exact $x1 est $e1")
      assert(math.abs(e7 - x7) <= math.max(2L, (0.05 * x7).toLong),
        s"$day au_7 exact $x7 est $e7")
    }
  }

  test("eventTransitions: per-origin normalization, tiebreak order at " +
      "equal timestamps") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "a", ts("2024-01-01 10:00:00")),
      (1L, 11L, "b", ts("2024-01-01 10:05:00")),
      (1L, 12L, "a", ts("2024-01-01 10:10:00")),
      (1L, 13L, "c", ts("2024-01-01 10:15:00")),
      // u2: a and b share a timestamp — id order makes it a→b→c
      (2L, 20L, "a", ts("2024-01-01 09:00:00")),
      (2L, 21L, "b", ts("2024-01-01 09:00:00")),
      (2L, 22L, "c", ts("2024-01-01 09:30:00"))
    ).toDF("u", "id", "tp", "t")
    val out = Analytics.eventTransitions(ev, col("u"), col("tp"), col("t"),
        col("id"))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 0.6667), ("a", "c", 1L, 0.3333),
      ("b", "a", 1L, 0.5), ("b", "c", 1L, 0.5)))
  }

  test("inactivityGaps: threshold filter, single-event keys emit nothing") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // 30 min: below
      (1L, ts("2024-01-01 12:30:00")), // 2 h gap: above
      (2L, ts("2024-01-05 00:00:00"))  // lone event
    ).toDF("u", "t")
    val out = Analytics.inactivityGaps(ev, col("u"), col("t"),
        3600L * 1000000L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:30:00"),
        7200L * 1000000L)))
  }

  test("ohlcBars: open/close by (time, tiebreak), boundary event opens " +
      "its own bucket") {
    import spark.implicits._
    val hour = 3600L * 1000000L
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, 11L, ts("2024-01-01 00:40:00"), 9.0),
      (1L, 12L, ts("2024-01-01 00:40:00"), 2.0), // same t: id 12 is later
      (1L, 13L, ts("2024-01-01 01:00:00"), 7.0)  // exact boundary → h1
    ).toDF("u", "id", "t", "v")
    val out = Analytics.ohlcBars(ev, col("u"), col("t"), col("v"),
        col("id"), hour)
      .orderBy("bucket_start").collect()
      .map(r => (r.getTimestamp(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
    assert(out.toSeq == Seq(
      (ts("2024-01-01 00:00:00"), 5.0, 9.0, 2.0, 2.0, 3L, 16.0),
      (ts("2024-01-01 01:00:00"), 7.0, 7.0, 7.0, 7.0, 1L, 7.0)))
  }

  test("resampleLocf: ticks owned by validity segments, on-grid last " +
      "event closes the grid, off-grid last emits nothing extra") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000) // micros→ms ctor
    val ev = Seq(
      (1L, 5L * 1000000L, 1.0), (1L, 25L * 1000000L, 2.0),
      (2L, 10L * 1000000L, 3.0), (2L, 30L * 1000000L, 4.0))
      .map { case (k, us, v) => (k, t(us), v) }.toDF("k", "tm", "v")
    val out = Analytics.resampleLocf(ev, col("k"), col("tm"), col("v"),
        10L * 1000000L)
      .orderBy("k", "tick").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getDouble(2)))
    // k=1: first 5s, last 25s (off-grid) → ticks 10, 20 both hold 1.0;
    // k=2: on-grid 10s and 30s → ticks 10 (3.0), 20 (3.0), 30 (4.0)
    assert(out.toSeq == Seq(
      (1L, 10L, 1.0), (1L, 20L, 1.0),
      (2L, 10L, 3.0), (2L, 20L, 3.0), (2L, 30L, 4.0)))
  }

  test("attributionCredits: all five models on a hand-computed journey") {
    import spark.implicits._
    val hour = 3600L * 1000000L
    // conv 100: touches at 3h/2h/1h before; conv 200: two touches;
    // conv 300: one touch
    val touches = Seq(
      (100L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")),
      (100L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (100L, 3L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")),
      (200L, 4L, ts("2024-01-02 08:00:00"), ts("2024-01-02 09:00:00")),
      (200L, 5L, ts("2024-01-02 08:30:00"), ts("2024-01-02 09:00:00")),
      (300L, 6L, ts("2024-01-03 07:00:00"), ts("2024-01-03 08:00:00"))
    ).toDF("pid", "cid", "tt", "ct")
    def run(model: String, hl: Long = 0L) =
      Analytics.attributionCredits(touches, col("pid"), col("cid"),
          col("tt"), col("ct"), model, hl)
        .orderBy("conversion_id", "touch_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(run("linear").toSeq == Seq(
      (100L, 1L, 0.3333), (100L, 2L, 0.3333), (100L, 3L, 0.3333),
      (200L, 4L, 0.5), (200L, 5L, 0.5), (300L, 6L, 1.0)))
    // half-life 1h: conv 100 raws 1/8, 1/4, 1/2 → 1/7, 2/7, 4/7;
    // conv 200 raws 0.5 (1h) and 0.5^0.5 (30min) → 0.4142 / 0.5858
    assert(run("time_decay", hour).toSeq == Seq(
      (100L, 1L, 0.1429), (100L, 2L, 0.2857), (100L, 3L, 0.5714),
      (200L, 4L, 0.4142), (200L, 5L, 0.5858), (300L, 6L, 1.0)))
    assert(run("position").toSeq == Seq(
      (100L, 1L, 0.4), (100L, 2L, 0.2), (100L, 3L, 0.4),
      (200L, 4L, 0.5), (200L, 5L, 0.5), (300L, 6L, 1.0)))
    // first/last keep zero rows so the frame joins 1:1 to candidates
    assert(run("first").toSeq == Seq(
      (100L, 1L, 1.0), (100L, 2L, 0.0), (100L, 3L, 0.0),
      (200L, 4L, 1.0), (200L, 5L, 0.0), (300L, 6L, 1.0)))
    assert(run("last").toSeq == Seq(
      (100L, 1L, 0.0), (100L, 2L, 0.0), (100L, 3L, 1.0),
      (200L, 4L, 0.0), (200L, 5L, 1.0), (300L, 6L, 1.0)))
  }

  test("triangleStats: counts, clustering, duplicate/direction/self-loop " +
      "normalization, hub orientation") {
    import spark.implicits._
    // K4 on 1-4 (every node: 3 triangles, clustering 1), pendant 5-1,
    // noise: duplicate edges, reversed direction, a self-loop
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 2L),           // reverse duplicate
      (1L, 2L),           // exact duplicate
      (5L, 5L),           // self-loop: drops
      (5L, 1L)            // pendant
    ).toDF("a", "b")
    val out = graft.ops.Graph.triangleStats(edges, col("a"), col("b"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 3L, 0.5),   // deg 4 (K4 + pendant): 3 of 6 pairs close
      (2L, 3L, 3L, 1.0), (3L, 3L, 3L, 1.0), (4L, 3L, 3L, 1.0),
      (5L, 1L, 0L, 0.0)))
    // global count: Σ per-node / 3
    assert(out.map(_._3).sum / 3 == 4L)
  }

  test("removalEffectAttribution: hand-solved absorbing chain, empty " +
      "paths shift the base, credits normalize") {
    import spark.implicits._
    // journeys: a(3 conv, 1 null), b(1 conv, 2 null), b→a(2 conv).
    // Exact solve: v(a)=5/6, v(b)=8/15, P=2/3; remove a → P=1/9
    // (RE 5/6), remove b → P=10/27 (RE 4/9); credits 15/23, 8/23.
    val paths =
      Seq.fill(3)((Seq("a"), true)) ++ Seq((Seq("a"), false)) ++
      Seq((Seq("b"), true)) ++ Seq.fill(2)((Seq("b"), false)) ++
      Seq.fill(2)((Seq("b", "a"), true))
    val out = graft.ops.Analytics.removalEffectAttribution(
        paths.toDF("p", "cv"), col("p"), col("cv"))
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("a", 0.6667, 0.1111, 0.8333, 0.6522),
      ("b", 0.6667, 0.3704, 0.4444, 0.3478)))
    // an empty converted path adds START→CONV mass: P rises to 0.7
    // and the removal effects dilute (remove-a now leaves 0.2)
    val out2 = graft.ops.Analytics.removalEffectAttribution(
        (paths :+ ((Seq.empty[String], true))).toDF("p", "cv"),
        col("p"), col("cv"))
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out2.toSeq == Seq(("a", 0.7, 0.2), ("b", 0.7, 0.4333)))
  }

  test("profileColumns: moments for numerics, lengths for strings, " +
      "entropy and cardinality over non-null values") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.0), "aa"), (2L, Some(2.0), "bbbb"),
      (3L, Some(6.0), "aa"), (4L, None, "cc")
    ).toDF("id", "v", "s")
    val out = graft.ops.Profile.profileColumns(df, Seq("v", "s"))
      .orderBy("col_name").collect()
    val v = out.find(_.getString(0) == "v").get
    assert(v.getLong(1) == 4 && v.getLong(2) == 1 && v.getLong(3) == 2)
    // v non-null dist {2.0: 2, 6.0: 1} → H = log2(3) − (2·1 + 0)/3
    assert(math.abs(v.getDouble(4) - 0.9183) < 1e-9)
    assert(v.getDouble(5) == 2.0 && v.getDouble(6) == 6.0)
    assert(math.abs(v.getDouble(7) - 3.3333) < 1e-9)
    assert(v.isNullAt(9)) // no avg_len for numerics
    val s = out.find(_.getString(0) == "s").get
    assert(s.getLong(2) == 0 && s.getLong(3) == 3)
    assert(s.isNullAt(5) && s.isNullAt(7)) // no moments for strings
    assert(s.getDouble(9) == 2.5)          // (2+4+2+2)/4
    // entropy of {aa:2, bbbb:1, cc:1} = 1.5 bits
    assert(math.abs(s.getDouble(4) - 1.5) < 1e-9)
  }

  test("winsorize: grouped and global quantile clipping with flags") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, "g", i.toDouble)) :+
      ((11L, "h", 100.0)) :+ ((12L, "h", 1.0)) :+ ((13L, "h", 2.0))
    val out = graft.ops.Profile.winsorize(df.toDF("id", "grp", "v"),
        col("id"), Seq("grp"), col("v"), 0.1, 0.9)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    // group g: lo = 1.9, hi = 9.1 (linear interpolation on 1..10)
    assert(out(0) == ((1L, 1.0, 1.9, 1L)))
    assert(out(4) == ((5L, 5.0, 5.0, 0L)))
    assert(out(9) == ((10L, 10.0, 9.1, 1L)))
    // group h (sorted 1, 2, 100): lo = 1.2, hi = 80.4
    assert(out(10) == ((11L, 100.0, 80.4, 1L)))
    assert(out(11) == ((12L, 1.0, 1.2, 1L)))
    assert(out(12) == ((13L, 2.0, 2.0, 0L)))
    // global (empty keys) runs the crossJoin path
    val g = graft.ops.Profile.winsorize(df.toDF("id", "grp", "v"),
        col("id"), Nil, col("v"), 0.0, 0.5)
      .orderBy("id").collect()
    assert(g.length == 13 && g.map(_.getLong(3)).sum == 6)
  }

  test("sessionize: gap threshold splits (equality stays in-session), " +
      "per-key ordinals, rollups") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0), // 30 min: in-session
      (1L, ts("2024-01-01 11:30:00"), 3.0), // exactly 1 h: stays
      (1L, ts("2024-01-01 13:00:01"), 4.0), // 1 h 30 m 1 s: splits
      (2L, ts("2024-01-02 09:00:00"), 5.0)
    ).toDF("u", "t", "v")
    val out = Analytics.sessionize(ev, col("u"), col("t"), col("v"),
        3600L * 1000000L)
      .orderBy("k", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00"),
        3L, 6.0),
      (1L, 2L, ts("2024-01-01 13:00:01"), ts("2024-01-01 13:00:01"),
        1L, 4.0),
      (2L, 1L, ts("2024-01-02 09:00:00"), ts("2024-01-02 09:00:00"),
        1L, 5.0)))
  }
}
