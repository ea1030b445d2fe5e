package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Rerank

/** MMR re-ranking: hand-computed greedy traces + end-to-end shape. */
class RerankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // query (1,0); ids 1,2 duplicates parallel to the query, id 3 diverse
  private val cands = Seq(
    (1L, Array(1f, 0f), 1.0),
    (2L, Array(1f, 0f), 1.0),
    (3L, Array(0.6f, 0.8f), 0.6))

  test("mmrSelect: low lambda diversifies away from the duplicate") {
    // λ=0.3: pick1 = id1 (tie with dup 2 → low id). pick2: dup scores
    // 0.3·1 − 0.7·1 = −0.4; id3 scores 0.18 − 0.7·0.6 = −0.24 → id3.
    val picks = Rerank.mmrSelect(cands, k = 3, lambda = 0.3)
    assert(picks.map(_._2) == Seq(1L, 3L, 2L))
    // 0.6f/0.8f are not exact binary fractions → compare loosely
    assert(math.abs(picks(1)._3 - (-0.24)) < 1e-6)
  }

  test("mmrSelect: lambda = 1 is plain relevance order") {
    assert(Rerank.mmrSelect(cands, k = 3, lambda = 1.0).map(_._2) ==
      Seq(1L, 2L, 3L))
  }

  test("mmrSelect: k beyond candidates stops at the candidate count") {
    assert(Rerank.mmrSelect(cands, k = 10, lambda = 0.7).length == 3)
  }

  test("mmrTopK: k rows, rank order, no repeated ids") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Rerank.mmrTopK(emb, col("vec_id"), col("embedding"),
      Array.fill(64)(0.125f), k = 5, nCandidates = 20).collect()
    assert(got.length == 5)
    assert(got.map(_.getInt(0)).toSeq == (1 to 5))
    assert(got.map(_.getLong(1)).distinct.length == 5)
  }

  test("crossRerank: pluggable scorer, (score DESC, id) order, stub parity") {
    import spark.implicits._
    val cands = Seq((1L, "aa"), (2L, "dddd"), (3L, "ccc"), (4L, "bbbb"))
      .toDF("id", "text")
    // trait swap: a custom scorer ranks by text length, ties -> low id
    val byLen = Rerank.crossRerank(cands, col("id"), col("text"), "q",
      RerankSpec.LenScorer(), k = 3).collect().map(_.getLong(0)).toSeq
    assert(byLen == Seq(2L, 4L, 3L))
    // stub scorer matches its driver-side formula
    val stub = graft.ops.HashCrossScorer()
    val got = Rerank.crossRerank(cands, col("id"), col("text"), "q", stub, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq((1L, "aa"), (2L, "dddd"), (3L, "ccc"), (4L, "bbbb")).foreach {
      case (id, t) => assert(got(id) == stub.score("q", t)) }
  }

  test("distillationPairs: per-query top/bottom selection, ranks, labels") {
    import spark.implicits._
    // two queries; LenScorer makes scores the candidate text lengths
    val cands = Seq(
      (10L, "qa", 1L, "aaaaaa"), (10L, "qa", 2L, "aaaaa"),
      (10L, "qa", 3L, "aaaa"), (10L, "qa", 4L, "aaa"),
      (10L, "qa", 5L, "aa"), (10L, "qa", 6L, "a"),
      (20L, "qb", 7L, "bb"), (20L, "qb", 8L, "b")
    ).toDF("qid", "qt", "did", "dt")
    val out = Rerank.distillationPairs(cands, col("qid"), col("qt"),
        col("did"), col("dt"), RerankSpec.LenScorer(), posK = 2, negK = 2)
      .orderBy("qid", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getBoolean(4)))
    // q10: keep 1,2 (pos) + 5,6 (bottom); q20: 2 cands, both pos AND tail
    assert(out.toSeq == Seq(
      (10L, 1L, 6.0, 1, true), (10L, 2L, 5.0, 2, true),
      (10L, 5L, 2.0, 5, false), (10L, 6L, 1.0, 6, false),
      (20L, 7L, 2.0, 1, true), (20L, 8L, 1.0, 2, true)))
  }

  test("distillationPairs: no duplicate rows when pos and tail overlap") {
    import spark.implicits._
    val cands = Seq((1L, "q", 1L, "aaa"), (1L, "q", 2L, "aa"),
      (1L, "q", 3L, "a")).toDF("qid", "qt", "did", "dt")
    val out = Rerank.distillationPairs(cands, col("qid"), col("qt"),
      col("did"), col("dt"), RerankSpec.LenScorer(), posK = 2, negK = 2)
    assert(out.count() == 3)
    assert(out.select("did").distinct().count() == 3)
  }
}

object RerankSpec {
  // top-level so the closure serializes without the suite instance
  final case class LenScorer() extends graft.ops.CrossScorer {
    override def score(q: String, t: String): Double = t.length.toDouble
  }
}
