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
