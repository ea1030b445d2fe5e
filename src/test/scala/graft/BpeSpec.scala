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
