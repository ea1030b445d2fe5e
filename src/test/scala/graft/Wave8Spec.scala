package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Analytics, Classify, Experiment, Temporal, TextAnalysis}

/** Round-11 wave against hand-computed fixtures: Kendall tau-b, Chao1
  * richness, the info-gain feature screen, the seasonal-naive backtest,
  * per-key isotonic calibration, Theil-Sen trend, gap-allowed
  * sequences, and the self-certifying active-users audit. */
class Wave8Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("kendallTau: monotone 1, reversed -1, the tied mixed case") {
    import spark.implicits._
    val up = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r1 = Experiment.kendallTau(up, col("x"), col("y")).head()
    assert(r1.getAs[Long]("concordant") == 3L &&
      r1.getAs[Long]("discordant") == 0L &&
      r1.getAs[Double]("tau_b") == 1.0)
    val down = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(Experiment.kendallTau(down, col("x"), col("y"))
      .head().getAs[Double]("tau_b") == -1.0)
    // x ties: pairs with equal x never count; C = D = 2 → tau 0
    val mixed = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (3.0, 1.0))
      .toDF("x", "y")
    val rm = Experiment.kendallTau(mixed, col("x"), col("y")).head()
    assert(rm.getAs[Long]("concordant") == 2L &&
      rm.getAs[Long]("discordant") == 2L &&
      rm.getAs[Double]("tau_b") == 0.0)
    // a fully-tied column nulls the tau
    val flat = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    val rf = Experiment.kendallTau(flat, col("x"), col("y")).head()
    assert(rf.isNullAt(rf.fieldIndex("tau_b")))
  }

  test("chao1Richness: singleton/doubleton counts drive the ceiling") {
    import spark.implicits._
    // g1 tokens: a a b c c d → D=4, f1={b,d}=2, f2={a,c}=2
    // chao1 = 4 + 2·1/(2·3)
    val docs = Seq(("g1", "a a b c c d"), ("g2", "x x x"))
      .toDF("src", "text")
    val out = TextAnalysis.chao1Richness(docs, col("src"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getAs[Long]("d_obs") == 4L && g1.getAs[Long]("f1") == 2L &&
      g1.getAs[Long]("f2") == 2L)
    assert(g1.getAs[Double]("chao1") == 4.0 + (2L * 1L) / (2.0 * 3))
    // no singletons, no doubletons: chao1 = D exactly
    val g2 = out("g2")
    assert(g2.getAs[Long]("f1") == 0L && g2.getAs[Long]("f2") == 0L &&
      g2.getAs[Double]("chao1") == 1.0)
  }

  test("featureScreen: a label-equal feature maxes the ratio, a " +
      "constant feature gains nothing") {
    import spark.implicits._
    val df = Seq(("a", "a", "c"), ("a", "a", "c"), ("b", "b", "c"),
      ("b", "b", "c")).toDF("y", "same", "const")
    val out = Experiment.featureScreen(df,
        Seq("same" -> col("same"), "const" -> col("const")), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val same = out("same")
    assert(same.getAs[Double]("info_gain") ==
      BigDecimal(math.log(2.0)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(same.getAs[Double]("gain_ratio") == 1.0)
    val const = out("const")
    assert(const.getAs[Double]("info_gain") == 0.0)
    assert(const.isNullAt(const.fieldIndex("gain_ratio")))
  }

  test("forecastBacktest: seasonal-naive holdout errors and the naive " +
      "scale; short keys are skipped") {
    import spark.implicits._
    val a = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 15.0, 25.0)
      .zipWithIndex.map { case (v, i) => ("A", i.toLong, v) }
    val b = Seq(("B", 0L, 1.0), ("B", 1L, 2.0), ("B", 2L, 3.0),
      ("B", 3L, 4.0)) // 4 < period+horizon+1 → skipped
    val df = (a ++ b).toDF("k", "t", "v")
    val rows = Temporal.forecastBacktest(df, col("t"), Seq("k"),
      col("t"), col("v"), period = 2, horizon = 2).collect()
    assert(rows.length == 1 && rows(0).getAs[String]("k") == "A")
    val r = rows(0)
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_train") == 6L)
    // holdout: f(rn7)=v5=10 vs 15, f(rn8)=v6=20 vs 25 → mae 5
    assert(r.getAs[Double]("mae") == 5.0)
    // training one-step diffs are all 10 → scale 10 → mase 0.5
    assert(r.getAs[Double]("mase") == 0.5)
    assert(r.getAs[Double]("smape") == (2.0 * 5 / 25 + 2.0 * 5 / 45) / 2)
  }

  test("isotonicCalibrateByKey: each key pools its own violators") {
    import spark.implicits._
    // key A bins: 0 → 1/2, 1 → 0/2 (violates), 2 → 2/2
    // PAV pools bins 0-1 into 1/4; key B is monotone and unchanged
    val rows =
      Seq(("A", 0L, 1L), ("A", 0L, 0L), ("A", 1L, 0L), ("A", 1L, 0L),
        ("A", 2L, 1L), ("A", 2L, 1L),
        ("B", 0L, 0L), ("B", 1L, 1L))
    val df = rows.toDF("k", "bin", "y")
    val out = Classify.isotonicCalibrateByKey(df, col("k"), col("bin"),
        col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out(("A", 0L)).getAs[Double]("calibrated") == 0.25)
    assert(out(("A", 1L)).getAs[Double]("calibrated") == 0.25)
    assert(out(("A", 2L)).getAs[Double]("calibrated") == 1.0)
    assert(out(("A", 0L)).getAs[Double]("rate") == 0.5)
    assert(out(("B", 0L)).getAs[Double]("calibrated") == 0.0)
    assert(out(("B", 1L)).getAs[Double]("calibrated") == 1.0)
    // calibrated is non-decreasing in bin within every key
    for (k <- Seq("A", "B")) {
      val cal = out.toSeq.filter(_._1._1 == k).sortBy(_._1._2)
        .map(_._2.getAs[Double]("calibrated"))
      assert(cal.zip(cal.tail).forall { case (x, y) => y >= x })
    }
  }

  test("theilSenTrend: the outlier moves the median less than the " +
      "mean; odd pair counts take the exact middle") {
    import spark.implicits._
    val a = Seq(("A", 0L, 0.0), ("A", 1L, 2.0), ("A", 2L, 4.0),
      ("A", 3L, 100.0))
    val b = Seq(("B", 0L, 1.0), ("B", 1L, 3.0), ("B", 2L, 5.0))
    val df = (a ++ b).toDF("k", "t", "v")
    val out = Temporal.theilSenTrend(df, col("t"), Seq("k"), col("t"),
        col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    // A slopes sorted: 2, 2, 2, 100/3, 49, 96 → median (2 + 100/3)/2
    assert(out("A").getAs[Long]("n_pairs") == 6L)
    assert(out("A").getAs[Double]("slope") == (2.0 + 100.0 / 3) / 2)
    // B: three equal slopes, odd count → the exact middle value
    assert(out("B").getAs[Long]("n_pairs") == 3L)
    assert(out("B").getAs[Double]("slope") == 2.0)
  }

  test("gappedSequences: order-increasing embeddings across gaps, " +
      "support counts keys once") {
    import spark.implicits._
    val ev = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "A", 3L),
      (1L, "C", 4L), (2L, "A", 1L), (2L, "B", 2L))
      .toDF("k", "tp", "t")
    val out = Analytics.gappedSequences(ev, col("k"), col("tp"),
        col("t"), col("t"), maxEventsPerKey = 10, minSupport = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // A->C embeds twice in key 1 (positions 1-4 and 3-4), once as a key
    assert(out(("A->C", 2L)).getAs[Long]("support") == 1L)
    assert(out(("A->C", 2L)).getAs[Long]("occurrences") == 2L)
    // A->B appears in both keys
    assert(out(("A->B", 2L)).getAs[Long]("support") == 2L)
    // gap-allowed triple through the intervening B
    assert(out(("A->B->C", 3L)).getAs[Long]("support") == 1L)
    assert(out.contains(("A->A->C", 3L)))
    // no reversed-order sequences
    assert(!out.contains(("C->A", 2L)))
  }

  test("bleuPairs: clipped precision, brevity penalty, degenerate " +
      "candidates") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat the cat on the mat"),
      (2L, "a b c", "a b c"),
      (3L, "a b c", "x y z"),
      (4L, "a b c d", "a"),
      (5L, "a b", "a b c d")).toDF("id", "ra", "ca")
    val out = TextAnalysis.bleuPairs(pairs, col("id"), col("id"),
        col("ra"), col("ca"))
      .collect().map(r => r.getAs[Long]("a_id") -> r).toMap
    // clipping: p1 = 5/7 (the×2, cat×1, on, mat), p2 = 3/6, bp = 1
    val expect1 = BigDecimal(math.sqrt(5.0 / 7 * 0.5)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L).getAs[Double]("bleu") == expect1)
    assert(out(1L).getAs[Long]("n_ref") == 6L &&
      out(1L).getAs[Long]("n_cand") == 7L)
    assert(out(2L).getAs[Double]("bleu") == 1.0) // identity
    assert(out(3L).getAs[Double]("bleu") == 0.0) // disjoint
    assert(out(4L).getAs[Double]("bleu") == 0.0) // 1-token candidate
    // long candidate: no brevity penalty, but precision dilutes:
    // p1 = 2/4, p2 = 1/3, bp = 1
    val expect5 = BigDecimal(math.sqrt(0.5 / 3)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(5L).getAs[Double]("bleu") == expect5)
  }

  test("bootstrapMeanCI: deterministic, degenerate-constant collapse, " +
      "bracket on a spread sample") {
    import spark.implicits._
    val const = (1L to 50L).map(i => (i, 5.0)).toDF("id", "v")
    val rc = Experiment.bootstrapMeanCI(const, col("id"), col("v"),
      nBoot = 50).head()
    assert(rc.getAs[Double]("mean") == 5.0 &&
      rc.getAs[Double]("lo") == 5.0 && rc.getAs[Double]("hi") == 5.0)
    assert(rc.getAs[Long]("n") == 50L && rc.getAs[Long]("n_boot") == 50L)
    val spread = (1L to 200L).map(i => (i, (i % 11).toDouble))
      .toDF("id", "v")
    val r1 = Experiment.bootstrapMeanCI(spread, col("id"), col("v"),
      nBoot = 100).head()
    val r2 = Experiment.bootstrapMeanCI(spread, col("id"), col("v"),
      nBoot = 100).head()
    assert(r1 == r2, "md5 draw must be deterministic across runs")
    assert(r1.getAs[Double]("lo") < r1.getAs[Double]("mean") &&
      r1.getAs[Double]("mean") < r1.getAs[Double]("hi"))
    assert(r1.getAs[Double]("hi") - r1.getAs[Double]("lo") < 2.0,
      "a 200-point CI on an sd~3 sample should be sub-unit wide")
  }

  test("bootstrapDiffCI: zero-difference arms collapse, a real shift " +
      "is bracketed away from zero") {
    import spark.implicits._
    val same = ((1L to 40L).map(i => (i, "a", 7.0)) ++
      (41L to 80L).map(i => (i, "b", 7.0))).toDF("id", "arm", "v")
    val rs = Experiment.bootstrapDiffCI(same, col("id"), col("arm"),
      col("v"), "a", "b", nBoot = 50).head()
    assert(rs.getAs[Double]("diff") == 0.0 &&
      rs.getAs[Double]("lo") == 0.0 && rs.getAs[Double]("hi") == 0.0)
    assert(rs.getAs[Long]("n_a") == 40L && rs.getAs[Long]("n_b") == 40L)
    // arm a sits ~2 above arm b with small noise: CI excludes 0
    val shifted = ((1L to 100L).map(i => (i, "a", 9.0 + (i % 3))) ++
      (101L to 200L).map(i => (i, "b", 7.0 + (i % 3))))
      .toDF("id", "arm", "v")
    val rd = Experiment.bootstrapDiffCI(shifted, col("id"), col("arm"),
      col("v"), "a", "b", nBoot = 100).head()
    assert(rd.getAs[Double]("lo") > 0.0,
      s"CI should exclude zero: $rd")
    assert(rd.getAs[Double]("lo") <= rd.getAs[Double]("diff") &&
      rd.getAs[Double]("diff") <= rd.getAs[Double]("hi"))
  }

  test("louvainOneLevel: two disjoint triangles collapse to their " +
      "min-id communities in the first (smaller-direction) round") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("a", "b")
    val out = graft.ops.Graph.louvainOneLevel(e, col("a"), col("b"),
        rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced: round 0 admits only smaller-id targets, so 2,3→c1
    // and 5,6→c4 in ONE round; later rounds are stable (idempotent)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"got $out")
  }

  test("louvainOneLevelWeighted: the swap trap — two self-loop " +
      "super-nodes over a strong bridge MERGE instead of oscillating") {
    import spark.implicits._
    // contraction-shaped input: loops w=1 at nodes 1 and 5, bridge
    // w=4. Mutual gains are positive both ways (the configuration
    // that made node-parity scheduling swap forever: both ids odd);
    // direction alternation lets only 5→c1 move in round 0, merged.
    val e = Seq((1L, 1L, 1L), (5L, 5L, 1L), (1L, 5L, 4L))
      .toDF("a", "b", "w")
    val out = graft.ops.Graph.louvainOneLevelWeighted(e, col("a"),
        col("b"), col("w"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 5L -> 1L), s"got $out")
    // and a weak bridge stays split (negative modularity gain)
    val e2 = Seq((1L, 1L, 3L), (5L, 5L, 3L), (1L, 5L, 1L))
      .toDF("a", "b", "w")
    val out2 = graft.ops.Graph.louvainOneLevelWeighted(e2, col("a"),
        col("b"), col("w"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 1L, 5L -> 5L), s"got $out2")
  }

  test("activeUsersAudit: exact rolling counts plus in-tolerance " +
      "booleans (HLL is exact in sparse mode)") {
    import spark.implicits._
    val ev = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 09:00:00"))
      .toDF("u", "ts").select(col("u"), col("ts").cast("timestamp").as("ts"))
    val out = Analytics.activeUsersAudit(ev, col("u"), col("ts"),
        Seq(1, 2))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r)
      .toMap
    assert(out("2024-01-01").getAs[Long]("exact_1") == 2L &&
      out("2024-01-01").getAs[Long]("exact_2") == 2L)
    assert(out("2024-01-02").getAs[Long]("exact_1") == 1L &&
      out("2024-01-02").getAs[Long]("exact_2") == 2L)
    assert(out.values.forall(r => r.getAs[Boolean]("ok_1") &&
      r.getAs[Boolean]("ok_2")))
  }
}
