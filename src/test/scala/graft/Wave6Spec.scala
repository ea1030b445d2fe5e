package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Experiment, Graph, Temporal}

/** Round-10 sixth wave against hand-computed fixtures: Welch t,
  * Kruskal-Wallis H, multi-source BFS, HITS, Theil-Sen trend. */
class Wave6Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("welchTTest: hand case — t and the W-S effective df") {
    import spark.implicits._
    // arm0 [1,2,3] (mu 2, v 1), arm1 [2,4,6] (mu 4, v 4):
    // t = 2/sqrt(1/3+4/3) = 1.5492, df = (5/3)^2/((1/9)/2+(16/9)/2)
    //   = 50/17 = 2.9412
    val u = Seq((0, 1.0), (0, 2.0), (0, 3.0),
      (1, 2.0), (1, 4.0), (1, 6.0)).toDF("arm", "m")
    val r = Experiment.welchTTest(u, col("arm"), col("m")).collect()(0)
    assert(r.getAs[Double]("t") == 1.5492)
    assert(r.getAs[Double]("df") == 2.9412)
    assert(r.getAs[Double]("lift") == 2.0)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("kruskalWallis: textbook no-tie H; all-tied pool nulls h_tie") {
    import spark.implicits._
    // A=[1,2] B=[3,4] C=[5,6]: ranks 1..6, R=3/7/11,
    // H = 12/42 * (9/2+49/2+121/2) - 21 = 4.5714; no ties -> h_tie = H
    val u = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0),
      ("C", 5.0), ("C", 6.0)).toDF("arm", "m")
    val r = Experiment.kruskalWallis(u, col("arm"), col("m")).collect()(0)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k_arms") == 3L)
    assert(r.getAs[Double]("h") == 4.5714)
    assert(r.getAs[Double]("h_tie") == 4.5714)
    assert(r.getAs[Long]("dof") == 2L)
    // every unit ties on one value: H = 0 and the correction divides
    // by zero -> h_tie null
    val tied = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0))
      .toDF("arm", "m")
    val rt = Experiment.kruskalWallis(tied, col("arm"), col("m"))
      .collect()(0)
    assert(rt.getAs[Double]("h") == 0.0)
    assert(rt.isNullAt(rt.fieldIndex("h_tie")))
  }

  test("bfsDistances: path distances, depth cap, off-graph seeds") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("id")
    val out = Graph.bfsDistances(e, col("a"), col("b"), seeds, col("id"),
        maxDepth = 6)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L),
      (5L, 4L)))
    // depth cap truncates the far tail
    val capped = Graph.bfsDistances(e, col("a"), col("b"), seeds,
        col("id"), maxDepth = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L)))
    // a seed absent from the graph still reports itself at 0
    val off = Graph.bfsDistances(e, col("a"), col("b"),
        Seq(99L).toDF("id"), col("id"), maxDepth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(off.toSeq == Seq((99L, 0L)))
  }

  test("hits: one bipartite iteration by hand; sides stay disjoint") {
    import spark.implicits._
    // hubs 10,11 -> auths 1,2: 10->1, 10->2, 11->1
    val e = Seq((10L, 1L), (10L, 2L), (11L, 1L)).toDF("s", "t")
    val r1 = Graph.hits(e, col("s"), col("t"), iters = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ar: 1 -> 2e6, 2 -> 1e6, am 2e6 -> a(1)=1e6, a(2)=5e5;
    // hr: 10 -> 1.5e6, 11 -> 1e6, hm 1.5e6 -> h(10)=1e6, h(11)=666666
    assert(r1.toSeq == Seq(
      (1L, 0L, 1000000L), (2L, 0L, 500000L),
      (10L, 1000000L, 0L), (11L, 666666L, 0L)))
    // more iterations keep the ordering and the per-side max at 1e6
    val byId = Graph.hits(e, col("s"), col("t"), iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byId(10L)._1 == 1000000L && byId(1L)._2 == 1000000L)
    assert(byId(11L)._1 < byId(10L)._1)
    assert(byId(2L)._2 < byId(1L)._2)
  }

  test("theilSen: one wild point cannot drag the median slope") {
    import spark.implicits._
    // y = 2x with y(3) blown to 100: median pairwise slope stays 2,
    // intercept median(y - 2x) stays 0
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 100.0), (4.0, 8.0),
      (5.0, 10.0)).map { case (x, y) => ("k", x, y) }.toDF("g", "x", "y")
    val r = Temporal.theilSen(df, Seq("g"), col("x"), col("y"))
      .collect()(0)
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 0.0)
    // a single-x key has no defined slope
    val one = Seq(("k", 1.0, 5.0), ("k", 1.0, 7.0)).toDF("g", "x", "y")
    val r1 = Temporal.theilSen(one, Seq("g"), col("x"), col("y"))
      .collect()(0)
    assert(r1.getAs[Long]("n_pairs") == 0L)
    assert(r1.isNullAt(r1.fieldIndex("slope")))
  }

  test("pcaProject: planted orthogonal directions come back exactly") {
    import spark.implicits._
    import graft.ops.Ann
    // x = (a, b, 0, 0) with a and b SAMPLE-UNCORRELATED (centered
    // a = (-3,-2,-1,6) ⊥ b = (1,-2,1,0)): the covariance is then truly
    // diag(var a, var b, 0, 0) with var a = 50/3 > var b = 2, so
    // pc1 = a - mean(a) and pc2 = b exactly (positive start vector
    // fixes both signs)
    val emb = Seq(
      (1L, Seq(1f, 1f, 0f, 0f)), (2L, Seq(2f, -2f, 0f, 0f)),
      (3L, Seq(3f, 1f, 0f, 0f)), (4L, Seq(10f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.pcaProject(emb, col("vec_id"), col("embedding"),
        dim = 4, nComponents = 2, sweeps = 30)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, -3.0, 1.0), (2L, -2.0, -2.0), (3L, -1.0, 1.0),
      (4L, 6.0, 0.0)))
  }

  test("labelPropagation: wave meets in the middle, ties break low, " +
      "seeds clamp") {
    import spark.implicits._
    // path 1-2-3-4-5, seeds 1->10 and 5->20: after 2 rounds node 3
    // sees one vote each (10 from 2, 20 from 4) and ties to 10
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("id", "cls")
    val out = Graph.labelPropagation(e, col("a"), col("b"), seeds,
        col("id"), col("cls"), iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L)))
    // one round: the wave has not reached node 3 yet
    val r1 = Graph.labelPropagation(e, col("a"), col("b"), seeds,
        col("id"), col("cls"), iters = 1)
      .collect().map(r => r.getLong(0)).sorted
    assert(r1.toSeq == Seq(1L, 2L, 4L, 5L))
  }

  test("crossFold: deterministic, in range, all folds hit") {
    import spark.implicits._
    import graft.ops.Curation
    val df = (1 to 100).map(_.toLong).toDF("id")
    val folds = df.select(col("id"),
        Curation.crossFold(col("id"), 5).as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(folds.forall { case (_, f) => f >= 0 && f < 5 })
    assert(folds.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // content-addressed: a second evaluation agrees exactly
    val again = df.select(Curation.crossFold(col("id"), 5).as("f"))
      .collect().map(_.getLong(0))
    assert(again.toSeq == folds.map(_._2).toSeq)
  }

  test("holtWintersSmooth: hand recurrence with a period-2 seasonal") {
    import spark.implicits._
    // y=[10,20,30,40], a=b=g=0.5, m=2: l=33.4375, b=7.65625,
    // s=[3.125, 4.53125]; forecast(h=1) = l + b + s[0] = 44.21875
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
      (1L, 4L, 40.0)).toDF("k", "t", "y")
    val r = Temporal.holtWintersSmooth(df, col("k"), col("t"), col("t"),
      col("y"), alpha = 0.5, beta = 0.5, gamma = 0.5, period = 2,
      horizon = 1).collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("level") == 33.4375)
    assert(r.getAs[Double]("trend") == 7.6563)
    assert(r.getAs[Double]("forecast") == 44.2188)
    // one-row series: level seeds to y, trend 0, forecast reads the
    // zero seasonal
    val one = Seq((1L, 1L, 5.0)).toDF("k", "t", "y")
    val r1 = Temporal.holtWintersSmooth(one, col("k"), col("t"),
      col("t"), col("y"), 0.5, 0.5, 0.5, period = 2).collect()(0)
    assert(r1.getAs[Double]("level") == 5.0 &&
      r1.getAs[Double]("forecast") == 5.0)
  }

  test("gloveCooccurrence: hand window-2 weights in exact 1/lcm units") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    // "a b c a": window 2 pairs (canonical): (a,b)@d1, (a,c)@d2,
    // (b,c)@d1, (a,b)@d2, (a,c)@d1 -> (a,b): n=2 x=1.5, (a,c): n=2
    // x=1.5, (b,c): n=1 x=1.0
    val docs = Seq(Tuple1("a b c a")).toDF("text")
    val out = TextAnalysis.gloveCooccurrence(docs, col("text"),
        window = 2, minCount = 1)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(("a", "b", 2L, 1.5), ("a", "c", 2L, 1.5),
      ("b", "c", 1L, 1.0)))
    // minCount prunes the singleton pair
    val pruned = TextAnalysis.gloveCooccurrence(docs, col("text"),
      window = 2, minCount = 2).count()
    assert(pruned == 2L)
  }

  test("piiSpans: positions slice back to their matches; classes and " +
      "strings agree with piiMatches") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val txt = "mail a@b.com or c@d.org, call 555-123-4567, ip 10.0.0.1"
    val docs = Seq((1L, txt)).toDF("id", "text")
    val spans = TextAnalysis.piiSpans(docs, col("id"), col("text"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2).toInt, r.getLong(3).toInt,
        r.getString(4)))
    // every span slices back to exactly its matched text
    assert(spans.nonEmpty)
    spans.foreach { case (_, s, e, m) =>
      assert(txt.substring(s, e) == m, s"span [$s,$e) != $m")
    }
    // the repeated-class case: two distinct email spans at their own
    // positions — what the string-only piiMatches cannot locate
    val emails = spans.filter(_._1 == "email").sortBy(_._2)
    assert(emails.map(_._4).toSeq == Seq("a@b.com", "c@d.org"))
    assert(emails.head._2 == 5)
    // class/string multiset agrees with piiMatches
    val ms = TextAnalysis.piiMatches(docs, col("id"), col("text"))
      .collect().map(r => (r.getString(1), r.getString(3))).sorted
    assert(spans.map(t => (t._1, t._4)).sorted.toSeq == ms.toSeq)
  }
}
