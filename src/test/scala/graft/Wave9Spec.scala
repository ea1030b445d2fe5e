package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 wave against hand-computed fixtures: the Louvain gain-score
  * overflow guard, the converged-early-stop Louvain variants (pinned
  * equal to the fixed-round ops), and the bootstrap empty-rank loud
  * failure. */
class Wave9Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("louvain gain guard: a 2^61-weight edge would overflow " +
      "2m*maxDeg and must fail loudly; the same graph at small " +
      "weights passes") {
    import spark.implicits._
    // one edge, w = 2^61: m = 2^61 (<= MaxValue/2 so 2m itself is
    // fine), maxDeg = 2^61, 2m*maxDeg = 2^123 >> Long.MaxValue — the
    // silent-flip regime the guard exists for
    val hot = Seq((1L, 2L, 1L << 61)).toDF("a", "b", "w")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Graph.louvainOneLevelWeighted(hot, col("a"), col("b"),
        col("w"), rounds = 1).collect()
    }
    assert(ex.getMessage.contains("overflow") &&
      ex.getMessage.contains("2m·maxDeg"), ex.getMessage)
    // and m > MaxValue/2 alone (2m overflows before the product):
    // two edges at 2^62 summing past MaxValue/2
    val hot2 = Seq((1L, 2L, (1L << 62) - 1), (2L, 3L, 2L))
      .toDF("a", "b", "w")
    intercept[IllegalArgumentException] {
      graft.ops.Graph.louvainOneLevelWeighted(hot2, col("a"), col("b"),
        col("w"), rounds = 1).collect()
    }
    val cold = Seq((1L, 2L, 4L), (2L, 3L, 1L)).toDF("a", "b", "w")
    // safe regime: runs to completion
    assert(graft.ops.Graph.louvainOneLevelWeighted(cold, col("a"),
      col("b"), col("w"), rounds = 2).count() == 3L)
  }

  test("louvainOneLevelConverged: equals the fixed-round op on the " +
      "two-triangle fixture and stops within maxRounds") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("a", "b")
    val fixed = graft.ops.Graph.louvainOneLevel(e, col("a"), col("b"),
        rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // generous maxRounds: the early stop, not the cap, must end it —
    // and the result must be the fixed-round one (converged rounds
    // are idempotent)
    val conv = graft.ops.Graph.louvainOneLevelConverged(e, col("a"),
        col("b"), maxRounds = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv == fixed, s"converged $conv != fixed $fixed")
    assert(conv == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("louvainOneLevelWeightedConverged: equals the fixed-round op " +
      "on both bridge fixtures (merge and stay-split)") {
    import spark.implicits._
    for (edges <- Seq(
        Seq((1L, 1L, 1L), (5L, 5L, 1L), (1L, 5L, 4L)),
        Seq((1L, 1L, 3L), (5L, 5L, 3L), (1L, 5L, 1L)))) {
      val e = edges.toDF("a", "b", "w")
      val fixed = graft.ops.Graph.louvainOneLevelWeighted(e, col("a"),
          col("b"), col("w"), rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val conv = graft.ops.Graph.louvainOneLevelWeightedConverged(e,
          col("a"), col("b"), col("w"), maxRounds = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(conv == fixed, s"converged $conv != fixed $fixed")
    }
  }

  test("louvainContractWeighted: super-edge weights SUM and total " +
      "edge weight m is invariant (loops carry intra mass)") {
    import spark.implicits._
    // two communities {1,2} and {3}: intra edge (1,2,w=5) → loop at
    // the super-node; two parallel inter paths (1,3,w=2), (2,3,w=4)
    // → ONE summed super-edge w=6
    val e = Seq((1L, 2L, 5L), (1L, 3L, 2L), (2L, 3L, 4L))
      .toDF("a", "b", "w")
    val asg = Seq((1L, 10L), (2L, 10L), (3L, 30L)).toDF("id", "cm")
    val out = graft.ops.Graph.louvainContractWeighted(e, col("a"),
        col("b"), col("w"), asg, col("id"), col("cm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set((10L, 10L, 5L), (10L, 30L, 6L)), s"got $out")
    // m invariant: Σw before == Σw after (loops included once)
    assert(out.toSeq.map(_._3).sum == 11L)
  }

  test("modularityNumerator: hand-computed two-triangle value; " +
      "singletons are negative; unassigned nodes default to " +
      "singleton communities") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("a", "b")
    // perfect 2-community split: m=6, per community in=3, tot=6 →
    // Q·(2m)² = 2·(4·6·3 − 36) = 72; Q = 72/144 = 0.5
    val asg = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("id", "cm")
    val r = graft.ops.Graph.modularityNumerator(e, col("a"), col("b"),
      asg, col("id"), col("cm")).head()
    assert(r.getAs[Long]("two_m") == 12L &&
      qnum(r) == BigInt(72), s"$r")
    // all-singleton assignment: Σ(4m·0 − deg²) = −6·4 = −24
    val sing = (1L to 6L).map(i => (i, i)).toDF("id", "cm")
    assert(qnum(graft.ops.Graph.modularityNumerator(e, col("a"),
      col("b"), sing, col("id"), col("cm")).head()) == BigInt(-24))
    // empty assignment → every node defaults to its own singleton
    val none = Seq.empty[(Long, Long)].toDF("id", "cm")
    assert(qnum(graft.ops.Graph.modularityNumerator(e, col("a"),
      col("b"), none, col("id"), col("cm")).head()) == BigInt(-24))
  }

  /** q_num is decimal(38,0) since round 13 (the lifted m ≤ 10⁹ cap). */
  private def qnum(r: org.apache.spark.sql.Row): BigInt =
    BigInt(r.getAs[java.math.BigDecimal]("q_num").toBigIntegerExact)

  test("modularityFromCounts: decimal path exact at m above the old " +
      "10^9 Long cap (hand-computed), and the 3e18 digit guard fires") {
    import spark.implicits._
    // m = 3·10⁹ (4m² = 3.6·10¹⁹ would already overflow Long):
    // two communities, tot/inn chosen so the terms are hand-checkable:
    //   c=1: inn = 2·10⁹, tot = 4·10⁹ → 4m·inn − tot²
    //     = 2.4·10¹⁹ − 1.6·10¹⁹ = 8·10¹⁸
    //   c=2: inn = 0 (absent from inn), tot = 2·10⁹ → −4·10¹⁸
    // Σ = 4·10¹⁸ (fits Long by luck; the TERMS don't — the decimal
    // products are what's under test)
    val m = 3000000000L
    val tot = Seq((1L, 4000000000L), (2L, 2000000000L)).toDF("cm", "tot")
    val inn = Seq((1L, 2000000000L)).toDF("cm", "inn")
    val r = graft.ops.Graph.modularityFromCounts(m, tot, inn).head()
    val expected = BigInt(4) * BigInt(m) * BigInt(2000000000L) -
      BigInt(4000000000L).pow(2) - BigInt(2000000000L).pow(2)
    assert(r.getAs[Long]("two_m") == 2L * m)
    assert(qnum(r) == expected, s"got ${qnum(r)} want $expected")
    // and a genuinely Long-impossible value: one community holding
    // everything at m = 10^12 → q_num = 4m·m − (2m)² = 0... use an
    // asymmetric split instead: tot = 2m, inn = m/2 → 4m·(m/2) − 4m²
    // = −2·10²⁴, 24 digits — decimal-only territory
    val m2 = 1000000000000L
    val tot2 = Seq((1L, 2 * m2)).toDF("cm", "tot")
    val inn2 = Seq((1L, m2 / 2)).toDF("cm", "inn")
    val r2 = graft.ops.Graph.modularityFromCounts(m2, tot2, inn2).head()
    assert(qnum(r2) == BigInt(4) * BigInt(m2) * BigInt(m2 / 2) -
      (BigInt(2) * BigInt(m2)).pow(2), s"$r2")
    // digit-bound guard: m past 3·10¹⁸ must fail with the sizing math
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Graph.modularityFromCounts(3100000000000000000L,
        tot, inn)
    }
    assert(ex.getMessage.contains("decimal(38,0)"), ex.getMessage)
  }

  test("modularityNumerator label-space guard: negative node ids and " +
      "negative community labels fail loudly (aliasing the -id-1 " +
      "singleton space)") {
    import spark.implicits._
    val e = Seq((-2L, 3L), (3L, 4L)).toDF("a", "b")
    val asg = Seq((3L, 1L)).toDF("id", "cm")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Graph.modularityNumerator(e, col("a"), col("b"), asg,
        col("id"), col("cm")).head()
    }
    assert(ex.getMessage.contains("negative node id"), ex.getMessage)
    val e2 = Seq((2L, 3L), (3L, 4L)).toDF("a", "b")
    val asg2 = Seq((3L, -7L)).toDF("id", "cm")
    val ex2 = intercept[IllegalArgumentException] {
      graft.ops.Graph.modularityNumerator(e2, col("a"), col("b"), asg2,
        col("id"), col("cm")).head()
    }
    assert(ex2.getMessage.contains("negative community label"),
      ex2.getMessage)
  }

  test("modularityNumeratorWeighted: hand-computed with a self-loop " +
      "(A_ii = 2w: the loop adds 2w to degree, w to its community's " +
      "intra mass) and agrees with the unweighted op at w = 1") {
    import spark.implicits._
    // triangle {1,2,3} at w=2 each + self-loop (4,4,w=3) + bridge
    // (3,4,w=1): m = Σw = 10. Assignment {1,2,3}→1, {4}→4.
    //   c=1: inn = 6, tot = deg1+deg2+deg3 = 4+4+5 = 13
    //     → 4·10·6 − 169 = 71
    //   c=4: inn = 3 (the loop), tot = 2·3+1 = 7 → 120 − 49 = 71
    // Σ = 142
    val e = Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 2L), (4L, 4L, 3L),
      (3L, 4L, 1L)).toDF("a", "b", "w")
    val asg = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("id", "cm")
    val r = graft.ops.Graph.modularityNumeratorWeighted(e, col("a"),
      col("b"), col("w"), asg, col("id"), col("cm")).head()
    assert(r.getAs[Long]("two_m") == 20L && qnum(r) == BigInt(142),
      s"$r")
    // loop at an UNASSIGNED node: intra for its own singleton
    //   nodes 1,2 edge w=2 + loop (3,3,w=5), asg only {1,2}→1:
    //   m=7, c=1: inn=2, tot=4 → 4·7·2 − 16 = 40
    //   singleton −4 (node 3): inn=5, tot=10 → 140 − 100 = 40 → Σ 80
    val e2 = Seq((1L, 2L, 2L), (3L, 3L, 5L)).toDF("a", "b", "w")
    val asg2 = Seq((1L, 1L), (2L, 1L)).toDF("id", "cm")
    val r2 = graft.ops.Graph.modularityNumeratorWeighted(e2, col("a"),
      col("b"), col("w"), asg2, col("id"), col("cm")).head()
    assert(r2.getAs[Long]("two_m") == 14L && qnum(r2) == BigInt(80),
      s"$r2")
    // w ≡ 1 degenerates to the unweighted op (no loops: it drops them)
    val e3 = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L))
      .toDF("a", "b", "w")
    val asg3 = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cm")
    val wq = graft.ops.Graph.modularityNumeratorWeighted(e3, col("a"),
      col("b"), col("w"), asg3, col("id"), col("cm")).head()
    val uq = graft.ops.Graph.modularityNumerator(e3, col("a"),
      col("b"), asg3, col("id"), col("cm")).head()
    assert(qnum(wq) == qnum(uq) &&
      wq.getAs[Long]("two_m") == uq.getAs[Long]("two_m"))
  }

  test("louvainOneLevelTrajectory: final slice equals louvainOneLevel " +
      "and earlier slices are the genuine per-round assignments") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("a", "b")
    val traj = graft.ops.Graph.louvainOneLevelTrajectory(e, col("a"),
        col("b"), rounds = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap)
      .toMap
    assert(traj.keySet == Set(1L, 2L, 3L))
    for (r <- 1 to 3) {
      val fixed = graft.ops.Graph.louvainOneLevel(e, col("a"), col("b"),
          rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(traj(r.toLong) == fixed,
        s"round $r slice ${traj(r.toLong)} != fixed-round $fixed")
    }
  }

  test("louvainOneLevelWeightedTrajectory: every slice equals the " +
      "fixed-round weighted op (loops and parallel edges included)") {
    import spark.implicits._
    // two weighted triangles bridged, a self-loop (internal mass) and
    // a parallel edge (summed on entry) — the contraction-output shape
    val e = Seq((1L, 2L, 3L), (2L, 3L, 3L), (1L, 3L, 3L), (4L, 5L, 2L),
      (5L, 6L, 2L), (4L, 6L, 2L), (3L, 4L, 1L), (4L, 3L, 1L),
      (2L, 2L, 4L)).toDF("a", "b", "w")
    val traj = graft.ops.Graph.louvainOneLevelWeightedTrajectory(e,
        col("a"), col("b"), col("w"), rounds = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap)
      .toMap
    assert(traj.keySet == Set(1L, 2L, 3L))
    for (r <- 1 to 3) {
      val fixed = graft.ops.Graph.louvainOneLevelWeighted(e, col("a"),
          col("b"), col("w"), rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(traj(r.toLong) == fixed,
        s"round $r slice ${traj(r.toLong)} != fixed-round $fixed")
    }
  }

  test("refineConnectivity: disconnected communities split into " +
      "min-labeled components, edgeless members become singletons, " +
      "and the modularity numerator strictly improves") {
    import spark.implicits._
    // community 10 = {1,2,3,4,5}: intra edges (1,2) and (3,4) — TWO
    // components — plus edgeless member 5; community 20 = {6,7}
    // connected; (2,6) crosses communities and must not merge them
    val e = Seq((1L, 2L), (3L, 4L), (6L, 7L), (2L, 6L)).toDF("a", "b")
    val asg = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L),
      (5L, 10L), (6L, 20L), (7L, 20L)).toDF("id", "cm")
    val ref = graft.ops.Graph.refineConnectivity(e, col("a"), col("b"),
      asg, col("id"), col("cm"))
    val got = ref.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 6L, 7L -> 6L), got.toString)
    def qnum(a: org.apache.spark.sql.DataFrame, cmCol: String): BigInt =
      BigInt(graft.ops.Graph.modularityNumerator(e, col("a"), col("b"),
          a, col("id"), col(cmCol)).head()
        .getAs[java.math.BigDecimal]("q_num").toBigIntegerExact)
    val before = qnum(asg, "cm")
    val after = qnum(ref, "community")
    // hand-computed: m = 4; before (32−25)+(16−9) = 14; after
    // 7 + 12 + 0 + 7 = 26 — splitting strictly improves
    assert(before == BigInt(14) && after == BigInt(26),
      s"before $before after $after")
  }

  test("louvain weighted prep: wraparound-range weights fail loudly " +
      "(decimal-summed), empty input yields m = 0 not an NPE") {
    import spark.implicits._
    // two parallel edges whose Long sum wraps: (2^62)+(2^62) = 2^63
    val hot = Seq((1L, 2L, 1L << 62), (2L, 1L, 1L << 62))
      .toDF("a", "b", "w")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Graph.louvainOneLevelWeighted(hot, col("a"), col("b"),
        col("w"), rounds = 1).collect()
    }
    assert(ex.getMessage.contains("Long range"), ex.getMessage)
    // empty / all-nonpositive input: coalesced m = 0, clean empty out
    val none = Seq((1L, 2L, 0L)).toDF("a", "b", "w")
    assert(graft.ops.Graph.louvainOneLevelWeighted(none, col("a"),
      col("b"), col("w"), rounds = 1).count() == 0L)
  }

  test("dbscan density guard: candidate volume over the cap fails " +
      "fast with the sizing formula; under it, runs") {
    import spark.implicits._
    // 40 co-located points → 40·40 = 1600 candidate rows in one cell
    val dense = Seq.tabulate(40)(i => (i.toLong, 0.1, 0.1))
      .toDF("id", "x", "y")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Ann.dbscan(dense, col("id"), col("x"), col("y"),
        eps = 1.0, minPts = 3, maxCandidatePairs = 1000L).collect()
    }
    assert(ex.getMessage.contains("GiB") &&
      ex.getMessage.contains("maxCandidatePairs"), ex.getMessage)
    assert(graft.ops.Ann.dbscan(dense, col("id"), col("x"), col("y"),
      eps = 1.0, minPts = 3, maxCandidatePairs = 2000L)
      .count() == 40L)
  }

  test("bootstrapMeanCI: empty input fails loudly instead of " +
      "returning zero rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val ex = intercept[Exception] {
      graft.ops.Experiment.bootstrapMeanCI(empty, col("id"), col("v"),
        nBoot = 8).collect()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("no replicate"), s"${ex.getMessage}")
    // non-degenerate input still returns the ONE contract row
    val ok = Seq.tabulate(50)(i => (i.toLong, i.toDouble)).toDF("id", "v")
    assert(graft.ops.Experiment.bootstrapMeanCI(ok, col("id"), col("v"),
      nBoot = 8).count() == 1L)
  }
}
