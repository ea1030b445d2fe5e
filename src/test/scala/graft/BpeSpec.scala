package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE trainer against the hand-computed Sennrich-style example. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("train: merge order, weighted counts, lexicographic ties") {
    import spark.implicits._
    // low ×5, lower ×2, newest ×3 — worked example:
    //  1. (l,o) 7  (ties (l,o)/(o,w) → lex smallest a)
    //  2. (lo,w) 7
    //  3. (e,s) 3  (four pairs tied at 3 → lex)
    //  4. (e,w) 3  ("e" < "es" < "n" < "w")
    //  5. (es,t) 3
    //  6. (ew,est) 3
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest").toDF("text")
    val merges = Bpe.train(docs, col("text"), numMerges = 6)
    assert(merges == Seq(
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "s", 3L),
      ("e", "w", 3L), ("es", "t", 3L), ("ew", "est", 3L)))
  }

  test("train: stops early when no adjacent pairs remain") {
    import spark.implicits._
    val docs = Seq("ab ab").toDF("text")
    // merge 1: (a,b) ×2; then every word is a single token → stop
    assert(Bpe.train(docs, col("text"), numMerges = 5) == Seq(("a", "b", 2L)))
  }

  test("train: 1000 merges without 1000 Spark jobs (driver-local loop)") {
    import spark.implicits._
    // deterministic pseudo-random corpus: 300 distinct 40-char words over
    // a 12-letter alphabet — far more than 1000 learnable pairs
    val alpha = "abcdefghijkl"
    val words = (0 until 300).map { w =>
      val sb = new StringBuilder
      var x = w * 2654435761L + 1
      for (_ <- 0 until 40) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += alpha(((x >>> 33) % alpha.length).toInt)
      }
      sb.toString
    }
    val docs = words.grouped(30).map(_.mkString(" ")).toSeq.toDF("text")

    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = Bpe.train(docs, col("text"), numMerges = 1000)
      assert(merges.size == 1000)
      assert(merges.map(t => (t._1, t._2)).distinct.size == 1000)
      // listener events are async; give the bus a moment to drain
      Thread.sleep(1500)
      assert(jobs <= 3, s"expected the one vocab-collect job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("segmentCounts (trained-table path) matches the segmentCount column") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low lower newest"),
      (2L, "aaa aab baa"),
      (3L, ""),
      (4L, "  low  \t lowest "),
      (5L, "zzz qqq low")).toDF("doc_id", "text")
    // train real merges on the same frame so the table isn't hand-picked
    val merges = Bpe.train(docs, col("text"), numMerges = 12).map(t => (t._1, t._2))
    val viaColumn = docs
      .select(col("doc_id"), Bpe.segmentCount(col("text"), merges).as("n_sub"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaTable = Bpe.segmentCounts(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaTable == viaColumn)
  }

  test("segmentCount: fold merges in order, overlap is left-to-right") {
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("e", "w"),
      ("es", "t"), ("ew", "est"))
    val got = Seq(
      (1L, "low lower newest"), // low→1, lower→(low,e,r)=3, newest→(n,ewest)=2
      (2L, "aaa"),              // no merge applies → 3 chars
      (3L, ""),                 // empty → 0
      (4L, "  low  "))          // stray whitespace → 1
      .toDF("id", "text")
      .select(col("id"), Bpe.segmentCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 6L, 2L -> 3L, 3L -> 0L, 4L -> 1L))
    // left-to-right merge inside a run: (a,a) over "aaa" → [aa, a]
    val run = Seq(Tuple1("aaa")).toDF("text")
      .select(Bpe.segmentCount(col("text"), Seq(("a", "a"))).as("n"))
      .collect()(0).getLong(0)
    assert(run == 2L)
  }
}
