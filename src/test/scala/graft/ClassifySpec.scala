package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Classify

/** Multinomial Naive Bayes: hand-computed model entries, prior-only and
  * tie-break decisions, and partition invariance of the scoring pass. */
class ClassifySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus = {
    import spark.implicits._
    // ham: {free: 1, call: 1, home: 2}; spam: {free: 3, win: 1}
    Seq(
      (1L, "ham", "home call"),
      (2L, "ham", "home free"),
      (3L, "spam", "free win free"),
      (4L, "spam", "free"))
      .toDF("id", "label", "text")
  }

  test("nbTrain: add-one smoothed log-probs, hand-computed") {
    val m = Classify.nbTrain(corpus, col("label"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // V = 4 (home, call, free, win); n_ham = 4, n_spam = 4
    assert(m(("ham", "home")) == math.rint(math.log(3.0 / 8.0) * 1e4) / 1e4)
    assert(m(("spam", "free")) == math.rint(math.log(4.0 / 8.0) * 1e4) / 1e4)
    assert(m.get(("ham", "win")).isEmpty) // zero-count pairs are absent
  }

  test("nbPredict: argmax, unknown-token smoothing, prior-only empty docs") {
    import spark.implicits._
    val model = Classify.nbFit(corpus, col("label"), col("text"))
    assert(model.labels.toSeq == Seq("ham", "spam"))
    val docs = Seq(
      (10L, "free free win"), // spammy
      (11L, "home call"),     // hammy
      (12L, "zebra zebra"),   // all-unknown: equal unk, equal priors -> tie
      (13L, ""))              // token-less: prior-only
      .toDF("id", "text")
    val got = Classify.nbPredict(docs, col("id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(10L)._1 == "spam" && got(11L)._1 == "ham")
    // both labels have n_l = 4 and prior 1/2: unknown-only and empty docs
    // tie exactly, and the alphabetically first label wins
    assert(got(12L)._1 == "ham")
    assert(got(13L) == ("ham", math.rint(math.log(0.5) * 1e4) / 1e4))
  }

  test("nbPredict: partition-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Classify.nbFit(docs, col("lang"), col("text"))
    def run(parts: Int) =
      Classify.nbPredict(docs.repartition(parts), col("doc_id"), col("text"), model)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(run(1).sameElements(run(7)))
  }

  test("logisticTrain/Predict: learns a separable signal, deterministic, " +
      "moves weight onto the signal bucket") {
    import spark.implicits._
    // positive docs carry 'goodtoken', negatives 'badtoken', plus shared noise
    val docs = (1 to 60).map { i =>
      val marker = if (i % 2 == 0) "goodtoken" else "badtoken"
      (i.toLong, i % 2 == 0, s"common words shared by all $marker")
    }.toDF("id", "y", "text")
    val model = Classify.logisticTrain(docs, col("y"), col("text"),
      dim = 32, iters = 10, lr = 8.0, binary = true)
    val w = model.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 33)
    val goodB = graft.expr.PortableHash.hex15("goodtoken") % 32
    val badB = graft.expr.PortableHash.hex15("badtoken") % 32
    assert(w(goodB) > 0 && w(badB) < 0,
      s"signal buckets $goodB/$badB got ${w(goodB)}/${w(badB)}")
    val pred = Classify.logisticPredict(docs, col("id"), col("text"),
        model, binary = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((1 to 60).forall(i => pred(i.toLong) == (i % 2 == 0)))
    // deterministic across partitionings
    val model2 = Classify.logisticTrain(docs.repartition(7), col("y"),
      col("text"), dim = 32, iters = 10, lr = 8.0, binary = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(model2 == w)
  }

  /** Rows for bin rates: each (bin, n, pos) expands to n labeled rows. */
  private def calRows(spec: (Long, Int, Int)*) = {
    import spark.implicits._
    spec.flatMap { case (b, n, p) =>
      (0 until n).map(i => (b, if (i < p) 1L else 0L))
    }.toDF("bin", "y")
  }

  test("isotonicCalibrate: PAV pools the violating middle pair") {
    // rates 0.2, 0.6, 0.4, 0.8 → bins 2,3 pool to 0.5
    val df = calRows((1L, 5, 1), (2L, 5, 3), (3L, 5, 2), (4L, 5, 4))
    val got = Classify.isotonicCalibrate(df, col("bin"), col("y"))
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 0.2, 0.2), (2L, 0.6, 0.5),
      (3L, 0.4, 0.5), (4L, 0.8, 0.8)))
    // strictly decreasing rates pool into one global block
    val dec = calRows((1L, 4, 4), (2L, 4, 2), (3L, 4, 0))
    val all = Classify.isotonicCalibrate(dec, col("bin"), col("y"))
      .collect().map(_.getDouble(4)).distinct
    assert(all.toSeq == Seq(0.5))
    // partition invariance: the segment merge sees different splits
    val got7 = Classify.isotonicCalibrate(df.repartition(7), col("bin"),
        col("y")).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(got7.toSeq == got.toSeq)
  }

  test("rocAuc: separation, ties, and the coin-flip midpoint") {
    import spark.implicits._
    // perfect ranking → AUC 1
    val perfect = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L))
      .toDF("m", "y")
    val p = Classify.rocAuc(perfect, col("m"), col("y")).collect()(0)
    assert(p.getLong(0) == 2 && p.getLong(1) == 2 &&
      p.getDouble(2) == 1.0 && p.getDouble(3) == 1.0)
    // full ties → midranks make AUC exactly 0.5
    val tied = Seq((1.0, 0L), (1.0, 1L), (2.0, 0L), (2.0, 1L))
      .toDF("m", "y")
    val t = Classify.rocAuc(tied, col("m"), col("y")).collect()(0)
    assert(t.getDouble(2) == 0.5 && t.getDouble(3) == 0.0)
  }

  test("calibrationError: hand-computed two-bucket ECE/MCE") {
    import spark.implicits._
    // bucket 1 (p=.15): conf .15, acc 0.0 → |gap| .15 over 2 rows
    // bucket 9 (p=.95): conf .95, acc 1.0 → |gap| .05 over 2 rows
    val df = Seq((0.15, 0), (0.15, 0), (0.95, 1), (0.95, 1))
      .toDF("p", "y")
    val r = Classify.calibrationError(df, col("p"), col("y"), bins = 10)
      .collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 0.1) < 1e-9) // (2*.15 + 2*.05)/4
    assert(math.abs(r.getDouble(3) - 0.15) < 1e-9)
    // p = 1.0 clamps into the top bucket instead of bucket `bins`
    val edge = Seq((1.0, 1)).toDF("p", "y")
    assert(Classify.calibrationError(edge, col("p"), col("y"), 10)
      .collect()(0).getLong(1) == 1)
  }

  test("liftTable: ntile sizes, deterministic tie counts, gains sum") {
    import spark.implicits._
    // N=10, k=3 → ntile sizes 4,3,3; scores descending 10..1,
    // responders at the top → decile 1 captures most
    val df = (1 to 10).map(i => (i.toDouble, if (i >= 7) 1L else 0L))
      .toDF("m", "y")
    val rows = Classify.liftTable(df, col("m"), col("y"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).toSeq == Seq(4L, 3L, 3L)) // big groups first
    assert(rows.map(_._3).sum == 4L)
    assert(rows.head == ((1L, 4L, 4L))) // top ntile = scores 10,9,8,7
    // a tie spanning the boundary: label-asc ordering puts the tied
    // negatives before the tied positives, so counts stay deterministic
    val tie = Seq((5.0, 0L), (5.0, 0L), (5.0, 1L), (5.0, 1L), (4.0, 1L),
      (3.0, 0L)).toDF("m", "y")
    val tr = Classify.liftTable(tie, col("m"), col("y"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positions 1-3: the three tied (5.0) rows with y=0,0,1 → 1 responder
    assert(tr.toSeq == Seq((1L, 3L, 1L), (2L, 3L, 2L)))
  }
}
