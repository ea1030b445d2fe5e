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
}
