package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Experiment, Graph, Keyword, Scale, Temporal}

/** Round-10 fifth wave against hand-computed fixtures: proportion test,
  * chi-square independence, autocorrelation, CUSUM changepoint, posting
  * lists, k-core peeling, systematic sampling, KMV set algebra. */
class Wave5Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("proportionTest: pooled z on a hand case; degenerate pool nulls") {
    import spark.implicits._
    // arm 0: 1/4 convert; arm 1: 3/4. pooled p = 0.5,
    // z = 0.5 / sqrt(0.5*0.5*(1/4+1/4)) = sqrt(2) = 1.4142
    val u = Seq((0, 0), (0, 0), (0, 0), (0, 1),
      (1, 1), (1, 1), (1, 1), (1, 0)).toDF("arm", "conv")
    val r = Experiment.proportionTest(u, col("arm"), col("conv"))
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("p_a") == 0.25 && r.getAs[Double]("p_b") == 0.75)
    assert(r.getAs[Double]("lift") == 0.5)
    assert(r.getAs[Double]("z") == 1.4142)
    assert(!r.getAs[Boolean]("significant"))
    // every unit converts: pooled p = 1 -> z undefined, not significant
    val all1 = Seq((0, 1), (0, 1), (1, 1)).toDF("arm", "conv")
    val d = Experiment.proportionTest(all1, col("arm"), col("conv"))
      .collect()(0)
    assert(d.isNullAt(d.fieldIndex("z")))
    assert(!d.getAs[Boolean]("significant"))
  }

  test("chiSquareIndependence: independent table scores 0; a hand case") {
    import spark.implicits._
    def rows(n: Int, a: String, b: Int) = Seq.fill(n)((a, b))
    val indep = (rows(10, "x", 0) ++ rows(10, "x", 1) ++
      rows(10, "y", 0) ++ rows(10, "y", 1)).toDF("a", "b")
    val r0 = Experiment.chiSquareIndependence(indep, col("a"), col("b"))
      .collect()(0)
    assert(r0.getAs[Double]("chi2") == 0.0)
    assert(r0.getAs[Double]("cramers_v") == 0.0)
    assert(r0.getAs[Long]("dof") == 1L)
    // 20/10 vs 10/20: margins all 30, e = 15, chi2 = 4*25/15 = 6.6667,
    // V = sqrt(6.6667/60) = 0.3333
    val dep = (rows(20, "x", 0) ++ rows(10, "x", 1) ++
      rows(10, "y", 0) ++ rows(20, "y", 1)).toDF("a", "b")
    val r1 = Experiment.chiSquareIndependence(dep, col("a"), col("b"))
      .collect()(0)
    assert(r1.getAs[Long]("n") == 60L)
    assert(r1.getAs[Double]("chi2") == 6.6667)
    assert(r1.getAs[Double]("cramers_v") == 0.3333)
  }

  test("chiSquareIndependence: structural zeros still carry expected mass") {
    import spark.implicits._
    // (y, 1) never observed: the margin cross must add its e = 2*2/6
    val df = Seq(("x", 0), ("x", 0), ("x", 1), ("x", 1),
      ("y", 0), ("y", 0)).toDF("a", "b")
    val r = Experiment.chiSquareIndependence(df, col("a"), col("b"))
      .collect()(0)
    // e: x0=8/3, x1=4/3, y0=4/3, y1=2/3; chi2 = (2-8/3)^2/(8/3) +
    // (2-4/3)^2/(4/3) + (2-4/3)^2/(4/3) + (0-2/3)^2/(2/3) = 1.5
    assert(r.getAs[Double]("chi2") == 1.5)
  }

  test("autocorrelation: hand series; constant and short series null") {
    import spark.implicits._
    // x = [1,2,3,4]: mean 2.5, den 5; r1 = 1.25/5, r2 = -1.5/5,
    // r3 = -2.25/5; r4 has no pairs -> null
    val df = (1 to 4).map(i => ("k", i.toLong, i.toDouble))
      .toDF("g", "t", "v")
    val out = Temporal.autocorrelation(df, col("t"), Seq("g"), col("t"),
        col("v"), maxLag = 4)
      .orderBy("lag").collect()
    def acf(i: Int): Option[Double] =
      if (out(i).isNullAt(out(i).fieldIndex("acf"))) None
      else Some(out(i).getAs[Double]("acf"))
    assert(out.forall(_.getAs[Long]("n") == 4L))
    assert(acf(0).contains(0.25) && acf(1).contains(-0.3) &&
      acf(2).contains(-0.45) && acf(3).isEmpty)
    // constant series: zero denominator -> null at every lag
    val const = (1 to 5).map(i => ("c", i.toLong, 7.0)).toDF("g", "t", "v")
    val cOut = Temporal.autocorrelation(const, col("t"), Seq("g"),
      col("t"), col("v"), maxLag = 2).collect()
    assert(cOut.forall(r => r.isNullAt(r.fieldIndex("acf"))))
  }

  test("cusumChangepoint: tent apex lands on the step; constant null") {
    import spark.implicits._
    // [0,0,0,10,10,10]: mu 5, sd sqrt(30); |S| peaks at t=3 with
    // 3*(5/sqrt(30)) = 2.7386
    val df = Seq(1L -> 0.0, 2L -> 0.0, 3L -> 0.0,
      4L -> 10.0, 5L -> 10.0, 6L -> 10.0)
      .map { case (t, v) => ("k", t, v) }.toDF("g", "t", "v")
    val r = Temporal.cusumChangepoint(df, col("t"), Seq("g"), col("t"),
      col("v"), threshold = 2.0).collect()(0)
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("max_cusum") == 2.7386)
    assert(r.getAs[Long]("changepoint_at") == 3L)
    assert(r.getAs[Boolean]("shifted"))
    val const = (1 to 4).map(i => ("c", i.toLong, 1.0)).toDF("g", "t", "v")
    val c = Temporal.cusumChangepoint(const, col("t"), Seq("g"), col("t"),
      col("v"), threshold = 2.0).collect()(0)
    assert(c.isNullAt(c.fieldIndex("max_cusum")))
    assert(!c.getAs[Boolean]("shifted"))
  }

  test("postingLists: df/tf/capped postings; minDf drops the tail") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b a"))
      .toDF("id", "text")
    val out = Keyword.postingLists(docs, col("id"), col("text"),
        minDf = 2, cap = 2)
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3)))
    assert(out.toSeq == Seq(
      ("a", 3L, 4L, Seq(1L, 2L)), // cap drops doc 3 from the postings
      ("b", 2L, 2L, Seq(1L, 3L))))
  }

  test("kCore: pendants peel, cascades empty a path graph") {
    import spark.implicits._
    // triangle 1-2-3 with pendant chain 3-4-5: 2-core = the triangle
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = Graph.kCore(e, col("a"), col("b"), k = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // path graph: each round exposes new leaves until nothing survives
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(Graph.kCore(path, col("a"), col("b"), k = 2).count() == 0L)
  }

  test("systematicSample: every step-th rank, offset shifts the comb") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "payload")
    val s0 = Curation.systematicSample(df, Seq(col("id")), step = 3)
      .orderBy("gidx").collect().map(_.getAs[Long]("gidx"))
    assert(s0.toSeq == Seq(1L, 4L, 7L, 10L))
    val s1 = Curation.systematicSample(df, Seq(col("id")), step = 3,
      offset = 1).orderBy("gidx").collect().map(_.getAs[Long]("gidx"))
    assert(s1.toSeq == Seq(2L, 5L, 8L))
  }

  test("kmvSetOps: identical sets are exact under k; disjoint score 0") {
    import spark.implicits._
    val vals = Seq("u", "v", "w", "x")
    val df = (vals.map(("g1", _)) ++ vals.map(("g2", _)) ++
      Seq("p", "q", "r").map(("g3", _))).toDF("g", "w")
    val out = Scale.kmvSetOps(df, col("g"), col("w"), k = 8)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // under k everything is exact: g1 = g2 (4 values), g3 disjoint (3)
    assert(out.toSeq == Seq(
      ("g1", "g2", 4.0, 1.0, 4.0),
      ("g1", "g3", 7.0, 0.0, 0.0),
      ("g2", "g3", 7.0, 0.0, 0.0)))
  }

  test("kmvSetOps: the estimate path agrees with kmvDistinct's union " +
      "estimator on the merged sketch") {
    import spark.implicits._
    val a = (0 until 200).map(i => ("a", s"tok$i"))
    val b = (100 until 300).map(i => ("b", s"tok$i"))
    val df = (a ++ b).toDF("g", "w")
    val pair = Scale.kmvSetOps(df, col("g"), col("w"), k = 16)
      .collect()(0)
    // the union estimate must equal kmvDistinct over the UNION of the
    // two value sets (same k): both sketch the same 300 distinct values
    val union = (0 until 300).map(i => ("u", s"tok$i")).toDF("g", "w")
    val est = Scale.kmvDistinct(union, Seq("g"), col("w"), k = 16)
      .collect()(0).getAs[Double]("est_distinct")
    assert(pair.getAs[Double]("union_est") == est)
    // Jaccard estimate is within a loose band of the true 100/300
    val j = pair.getAs[Double]("jaccard_est")
    assert(j >= 0.05 && j <= 0.7, s"jaccard_est $j far from 1/3")
  }
}
