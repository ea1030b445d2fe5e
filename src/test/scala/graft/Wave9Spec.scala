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
      r.getAs[Long]("q_num") == 72L, s"$r")
    // all-singleton assignment: Σ(4m·0 − deg²) = −6·4 = −24
    val sing = (1L to 6L).map(i => (i, i)).toDF("id", "cm")
    assert(graft.ops.Graph.modularityNumerator(e, col("a"), col("b"),
      sing, col("id"), col("cm")).head().getAs[Long]("q_num") == -24L)
    // empty assignment → every node defaults to its own singleton
    val none = Seq.empty[(Long, Long)].toDF("id", "cm")
    assert(graft.ops.Graph.modularityNumerator(e, col("a"), col("b"),
      none, col("id"), col("cm")).head().getAs[Long]("q_num") == -24L)
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
