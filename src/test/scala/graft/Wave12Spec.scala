package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 wave: semantic pins for the paired/blocked/exact
  * inference ops (Wilcoxon signed-rank, Fisher exact, Friedman),
  * the series diagnostics (cross-correlation, Durbin–Watson + runs),
  * the graph additions (weighted link prediction, deterministic
  * walks, double-sweep diameter) and the survivorship merge. The
  * oracle replays each op bit-for-bit; these pin hand-computed
  * closed forms and the loud guards. */
class Wave12Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("wilcoxonSignedRank: hand-computed midranks, W+, z on a " +
      "6-pair set with ties and one zero difference") {
    import spark.implicits._
    // d = 2, -1, 3, 3, -2, 4, 0 -> |d| ranks: 1->1; 2,2->2.5; 3,3->4.5;
    // 4->6; W+ = 2.5+4.5+4.5+6 = 17.5, mu = 10.5,
    // var = 6*7*13/24 - 12/48 = 22.5, z = 7/sqrt(22.5) = 1.4757
    val pairs = Seq((0, 2), (1, 0), (0, 3), (0, 3), (2, 0), (0, 4),
      (5, 5)).toDF("pre", "post")
    val r = graft.ops.Experiment.wilcoxonSignedRank(pairs, col("pre"),
      col("post")).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 1L &&
      r.getLong(2) == 4L, s"n/n_zero/n_pos: $r")
    assert(r.getDouble(3) == 17.5, s"w_plus: $r")
    assert(math.abs(r.getDouble(4) - 1.4757) < 1e-9, s"z: $r")
    assert(!r.getBoolean(5), s"significant: $r")
  }

  test("fisherExact: the tea-tasting 2x2 [[3,1],[1,3]] gives the " +
      "textbook two-sided p = 34/70") {
    import spark.implicits._
    val units = Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false))
    val df = units.toDF("a", "b")
    val r = graft.ops.Experiment.fisherExact(df, col("a"), col("b"))
      .collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 1 &&
      r.getLong(2) == 1 && r.getLong(3) == 3, s"cells: $r")
    assert(r.getDouble(4) == 9.0, s"odds: $r") // 3*3/(1*1)
    assert(math.abs(r.getDouble(5) - 34.0 / 70) < 1e-6, s"p: $r")
    assert(!r.getBoolean(6))
  }

  test("fisherExact: maxN fails fast with the chi-square remedy") {
    import spark.implicits._
    val df = Seq.fill(8)((true, true)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Experiment.fisherExact(df, col("a"), col("b"),
        maxN = 3)
    }
    assert(e.getMessage.contains("chiSquareIndependence"), e.getMessage)
  }

  test("friedmanTest: 3 blocks ranking 3 treatments identically " +
      "gives chi2 = 6 (dof 2); incomplete blocks drop and count") {
    import spark.implicits._
    val cells = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 10.0), ("b2", "t2", 20.0), ("b2", "t3", 30.0),
      ("b3", "t1", 5.0), ("b3", "t2", 6.0), ("b3", "t3", 7.0),
      ("b4", "t1", 1.0) // incomplete: missing t2, t3
    ).toDF("blk", "trt", "v")
    val r = graft.ops.Experiment.friedmanTest(cells, col("blk"),
      col("trt"), col("v")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 &&
      r.getLong(2) == 1, s"b/k/dropped: $r")
    assert(r.getDouble(3) == 6.0 && r.getDouble(4) == 6.0, s"chi2: $r")
    assert(r.getLong(5) == 2, s"dof: $r")
  }

  test("friedmanTest: duplicate (block, treatment) cells fail fast") {
    import spark.implicits._
    val cells = Seq(("b1", "t1", 1.0), ("b1", "t1", 2.0))
      .toDF("blk", "trt", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Experiment.friedmanTest(cells, col("blk"), col("trt"),
        col("v"))
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("crossCorrelation: y = x shifted by one grain peaks at " +
      "exactly r = 1 at lag +1") {
    import spark.implicits._
    val x = Seq(3L, 2L, 5L, 4L, 6L, 7L)
    val y = Seq(1L, 3L, 2L, 5L, 4L, 6L) // y_t = x_{t-1}
    val df = (1 to 6).map(t => (t.toLong, x(t - 1), y(t - 1)))
      .toDF("t", "x", "y")
    val r = graft.ops.Temporal.crossCorrelation(df, col("t"), col("x"),
        col("y"), maxLag = 2)
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(2)) Double.NaN else row.getDouble(2))).toMap
    assert(r(1L) == 1.0, s"lag +1: $r")
    assert(r(0L) < 1.0, s"lag 0 must be below the shifted peak: $r")
  }

  test("crossCorrelation guards: duplicate grain and maxGrains both " +
      "fail fast") {
    import spark.implicits._
    val dup = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("t", "x", "y")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Temporal.crossCorrelation(dup, col("t"), col("x"),
        col("y"), maxLag = 1)
    }
    assert(e1.getMessage.contains("duplicate"), e1.getMessage)
    val big = (1 to 10).map(i => (i.toLong, 1L, 1L)).toDF("t", "x", "y")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Temporal.crossCorrelation(big, col("t"), col("x"),
        col("y"), maxLag = 1, maxGrains = 5)
    }
    assert(e2.getMessage.contains("maxGrains") ||
      e2.getMessage.contains("grain"), e2.getMessage)
  }

  test("residualDiagnostics: alternating series — DW = 10/3 " +
      "(oscillation), 6 runs, z = 2/sqrt(1.2)") {
    import spark.implicits._
    val df = (1 to 6).map(t => ("k1", t.toLong,
      if (t % 2 == 0) 2L else 1L)).toDF("k", "t", "v")
    val r = graft.ops.Temporal.residualDiagnostics(df, col("k"),
      col("t"), col("v")).collect()(0)
    assert(r.getLong(1) == 6, s"n: $r")
    assert(r.getDouble(2) == 3.3333, s"dw (4dp): $r") // 30/9 rounded
    assert(r.getLong(3) == 3 && r.getLong(4) == 3 &&
      r.getLong(5) == 6, s"pos/neg/runs: $r")
    assert(math.abs(r.getDouble(6) - 2.0 / math.sqrt(1.2)) < 1e-4,
      s"z_runs: $r")
  }

  test("residualDiagnostics: a constant series yields null dw and " +
      "null z_runs, zero runs") {
    import spark.implicits._
    val df = (1 to 4).map(t => ("k1", t.toLong, 7L)).toDF("k", "t", "v")
    val r = graft.ops.Temporal.residualDiagnostics(df, col("k"),
      col("t"), col("v")).collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(6), s"nulls: $r")
    assert(r.getLong(3) == 0 && r.getLong(4) == 0 &&
      r.getLong(5) == 0, s"counts: $r")
  }

  test("linkPredictionWeighted: star center of degree 3 contributes " +
      "floor(1e6/3) RA and floor(1e6/ln 3) AA to each candidate") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val got = graft.ops.Graph.linkPredictionWeighted(edges, col("a"),
        col("b"), minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val aa = math.floor(1e6 / math.log(3.0)).toLong // 910239
    val expect = (1L, 333333L, aa)
    assert(got == Map((1L, 3L) -> expect, (1L, 4L) -> expect,
      (3L, 4L) -> expect), s"got $got")
  }

  test("linkPredictionWeighted: square — two degree-2 common " +
      "neighbors sum exactly") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("a", "b")
    val got = graft.ops.Graph.linkPredictionWeighted(edges, col("a"),
        col("b"), minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val aa2 = 2L * math.floor(1e6 / math.log(2.0)).toLong
    assert(got == Map((1L, 3L) -> ((2L, 1000000L, aa2)),
      (2L, 4L) -> ((2L, 1000000L, aa2))), s"got $got")
  }

  test("randomWalks: a single edge ping-pongs deterministically; " +
      "every hop lands on a neighbor and reruns are identical") {
    import spark.implicits._
    val pair = Seq((1L, 2L)).toDF("a", "b")
    val w = graft.ops.Graph.randomWalks(pair, col("a"), col("b"),
        steps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(w == Map((1L, 0L) -> 1L, (1L, 1L) -> 2L, (1L, 2L) -> 1L,
      (1L, 3L) -> 2L, (2L, 0L) -> 2L, (2L, 1L) -> 1L,
      (2L, 2L) -> 2L, (2L, 3L) -> 1L), s"got $w")
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    def run() = graft.ops.Graph.randomWalks(tri, col("a"), col("b"),
        steps = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val w1 = run()
    assert(w1 == run(), "walks must be deterministic across runs")
    // every (start, step->step+1) hop is an edge of the triangle
    val adj = Set((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L),
      (1L, 3L))
    val bySs = w1.groupBy(_._1).values
    bySs.foreach { walk =>
      val path = walk.toSeq.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { p =>
        assert(adj.contains((p(0), p(1))), s"non-edge hop in $path")
      }
    }
  }

  test("diameterDoubleSweep: exact on a path graph, component-local " +
      "on a disconnected one, loud at the horizon") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val r = graft.ops.Graph.diameterDoubleSweep(path, col("a"),
      col("b"), maxDepth = 10).collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 4L &&
      r.getLong(2) == 5L && r.getLong(3) == 4L &&
      r.getLong(4) == 1L && r.getLong(5) == 5L, s"got $r")
    val disc = Seq((1L, 2L), (10L, 11L), (11L, 12L)).toDF("a", "b")
    val r2 = graft.ops.Graph.diameterDoubleSweep(disc, col("a"),
      col("b"), maxDepth = 10).collect()(0)
    assert(r2.getLong(0) == 1L && r2.getLong(3) == 1L &&
      r2.getLong(5) == 2L, s"component-local: $r2")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Graph.diameterDoubleSweep(path, col("a"), col("b"),
        maxDepth = 2)
    }
    assert(e.getMessage.contains("horizon"), e.getMessage)
  }

  test("maximalMatching: equals the sequential greedy matching by " +
      "md5 priority (the mutual-min identity), is a valid maximal " +
      "matching, and reruns identically") {
    import spark.implicits._
    // 4x4 grid graph: 16 nodes, 24 edges
    def id(r: Int, c: Int) = (r * 4 + c).toLong
    val edges = (for {
      r <- 0 until 4; c <- 0 until 4
      e <- Seq(
        if (c < 3) Some((id(r, c), id(r, c + 1))) else None,
        if (r < 3) Some((id(r, c), id(r + 1, c))) else None).flatten
    } yield e).toDF("a", "b")
    def run() = graft.ops.Graph.maximalMatching(edges, col("a"),
        col("b"), rounds = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = run()
    assert(got == run(), "matching must be deterministic")
    // sequential greedy by (md5(a:b), a, b) — the unique result
    // round-synchronous mutual-min must reproduce
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(a: Long, b: Long) = md.digest(s"$a:$b".getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    val ordered = edges.collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .sortBy { case (a, b) => (h(a, b), a, b) }
    val free = scala.collection.mutable.Set((0L until 16L): _*)
    val greedy = ordered.flatMap { case (a, b) =>
      if (free.contains(a) && free.contains(b)) {
        free -= a; free -= b; Some((a, b))
      } else None
    }.toSet
    assert(got == greedy, s"got $got\nexpected $greedy")
    // maximal: every edge touches a matched node
    val matchedNodes = got.flatMap(e => Set(e._1, e._2))
    ordered.foreach { case (a, b) =>
      assert(matchedNodes.contains(a) || matchedNodes.contains(b),
        s"unmatched edge ($a,$b) with both endpoints free")
    }
  }

  test("cochranQ: the 4-block 3-treatment textbook table gives " +
      "Q = 8/3; incomplete blocks drop; all-equal blocks null the " +
      "denominator") {
    import spark.implicits._
    val cells = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 1L), ("b1", "t3", 0L),
      ("b2", "t1", 1L), ("b2", "t2", 0L), ("b2", "t3", 0L),
      ("b3", "t1", 1L), ("b3", "t2", 1L), ("b3", "t3", 1L),
      ("b4", "t1", 0L), ("b4", "t2", 1L), ("b4", "t3", 0L),
      ("b5", "t1", 1L) // incomplete
    ).toDF("blk", "trt", "x")
    val r = graft.ops.Experiment.cochranQ(cells, col("blk"),
      col("trt"), col("x")).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3 &&
      r.getLong(2) == 1 && r.getLong(3) == 7, s"b/k/drop/n: $r")
    assert(r.getDouble(4) == 2.6667, s"q: $r")
    assert(r.getLong(5) == 2, s"dof: $r")
    // all-success blocks: denominator 0 -> q null
    val const = Seq(("b1", "t1", 1L), ("b1", "t2", 1L),
      ("b2", "t1", 1L), ("b2", "t2", 1L)).toDF("blk", "trt", "x")
    val r2 = graft.ops.Experiment.cochranQ(const, col("blk"),
      col("trt"), col("x")).collect()(0)
    assert(r2.isNullAt(4), s"constant blocks must null q: $r2")
  }

  test("enrichmentTest: the tea-tasting table's UPPER tail is " +
      "17/70 per key; the per-key maxN guard is loud") {
    import spark.implicits._
    val units = (Seq.fill(3)(("k1", true, true)) ++
      Seq(("k1", true, false)) ++ Seq(("k1", false, true)) ++
      Seq.fill(3)(("k1", false, false)) ++
      // second key: all-true 2x2 degenerate — p = 1
      Seq.fill(4)(("k2", true, true))).toDF("k", "a", "b")
    val got = graft.ops.Experiment.enrichmentTest(units, col("k"),
        col("a"), col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(6), r.getBoolean(7)))).toMap
    assert(got("k1")._1 == 3 &&
      math.abs(got("k1")._2 - 17.0 / 70) < 1e-6 && !got("k1")._3,
      s"k1: $got")
    assert(got("k2")._2 == 1.0 && !got("k2")._3, s"k2: $got")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Experiment.enrichmentTest(units, col("k"), col("a"),
        col("b"), maxNPerKey = 5)
    }
    assert(e.getMessage.contains("maxNPerKey"), e.getMessage)
  }

  test("jonckheereTerpstra: hand-computed J, tie-corrected variance " +
      "and z on three ordered groups with ties") {
    import spark.implicits._
    // g1 [1,2], g2 [2,3], g3 [3,4]: J = 3.5 + 4 + 3.5 = 11, mu = 6,
    // var = 420/72 + 0 + 24/240 = 5.9333, z = 5/sqrt(5.9333)
    val units = Seq((1L, 1.0), (1L, 2.0), (2L, 2.0), (2L, 3.0),
      (3L, 3.0), (3L, 4.0)).toDF("g", "m")
    val r = graft.ops.Experiment.jonckheereTerpstra(units, col("g"),
      col("m")).collect()(0)
    assert(r.getLong(0) == 6 && r.getLong(1) == 3, s"n/k: $r")
    assert(r.getDouble(2) == 11.0 && r.getDouble(3) == 6.0,
      s"j/mu: $r")
    assert(r.getDouble(4) == 5.9333, s"var: $r")
    assert(math.abs(r.getDouble(5) - 5.0 / math.sqrt(420.0 / 72 + 0.1))
      < 1e-4, s"z: $r")
    assert(r.getBoolean(6), s"trending: $r")
  }

  test("bipartiteCheck: even cycle passes, triangle counts its odd " +
      "edge, scope is the pivot's component, horizon is loud") {
    import spark.implicits._
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("a", "b")
    val r1 = graft.ops.Graph.bipartiteCheck(square, col("a"),
      col("b"), maxDepth = 8).collect()(0)
    assert(r1.getLong(0) == 1 && r1.getLong(1) == 4 &&
      r1.getLong(2) == 4 && r1.getLong(3) == 0 && r1.getBoolean(4),
      s"square: $r1")
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val r2 = graft.ops.Graph.bipartiteCheck(tri, col("a"), col("b"),
      maxDepth = 8).collect()(0)
    assert(r2.getLong(3) == 1 && !r2.getBoolean(4), s"triangle: $r2")
    // pivot's component only: the far triangle never enters
    val disc = Seq((1L, 2L), (10L, 11L), (11L, 12L), (12L, 10L))
      .toDF("a", "b")
    val r3 = graft.ops.Graph.bipartiteCheck(disc, col("a"), col("b"),
      maxDepth = 8).collect()(0)
    assert(r3.getLong(1) == 2 && r3.getBoolean(4), s"component: $r3")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Graph.bipartiteCheck(path, col("a"), col("b"),
        maxDepth = 2)
    }
    assert(e.getMessage.contains("horizon"), e.getMessage)
  }

  test("survivorshipMerge: longest-record canonical with id " +
      "tie-break; majority vote with smallest-value ties; nulls " +
      "never vote") {
    import spark.implicits._
    val recs = Seq(
      (1L, 1L, 5L, "en", "s1"),
      (1L, 2L, 9L, "fr", "s1"),
      (1L, 3L, 9L, "fr", null.asInstanceOf[String]),
      (2L, 4L, 1L, "en", "s2"),
      (2L, 5L, 1L, "fr", "s3")
    ).toDF("cluster", "id", "len", "lang", "src")
    val got = graft.ops.Linkage.survivorshipMerge(recs, col("cluster"),
        col("id"), rankCols = Seq(-col("len")),
        voteCols = Seq("lang" -> col("lang"), "src" -> col("src")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    // cluster 1: canonical = longest (len 9), id tie -> 2; lang fr
    // (2 votes); src s1 (nulls never vote)
    // cluster 2: canonical = id 4 (len tie); lang tie -> "en"
    // (smallest); src tie -> "s2"
    assert(got == Map(
      1L -> ((3L, 2L, "fr", "s1")),
      2L -> ((2L, 4L, "en", "s2"))), s"got $got")
  }
}
