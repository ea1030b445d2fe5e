package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Keyword

/** BM25 + reciprocal-rank fusion semantics on a hand-checked corpus. */
class KeywordSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // stop so the next suite's builder (possibly with extensions) creates a
  // fresh session instead of inheriting this one
  override def afterAll(): Unit = spark.stop()

  test("bm25: tf saturation, idf favors rare terms, non-matching docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark join"), // tf-heavy on common term
      (2L, "spark join"),
      (3L, "quantum flux"), // no query terms
      (4L, "quantum spark")).toDF("id", "text")
    val scores = Keyword.bm25(docs, col("id"), col("text"), Seq("spark", "quantum"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // every doc matching ≥1 term is present, all with positive scores
    assert(scores.keySet == Set(1L, 2L, 3L, 4L))
    assert(scores.values.forall(_ > 0))
    // doc 4 (rare quantum + common spark) outscores doc 2 (spark + join)
    assert(scores(4L) > scores(2L))
    // tf saturates: 4× tf must not give 4× score
    assert(scores(1L) < 4 * scores(2L) && scores(1L) > scores(2L) * 0.8)
    val none = Keyword.bm25(docs, col("id"), col("text"), Seq("absent"))
    assert(none.count() == 0)
  }

  test("rrf fusion: agreement on both lists beats a single first place") {
    import spark.implicits._
    val a = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("id", "s")
    val b = Seq((20L, 0.95), (30L, 0.9), (40L, 0.85)).toDF("id", "s")
    val fused = Keyword.rrfFuse(a, col("s"), b, col("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 20 ranks 2nd+1st; 10 ranks 1st on one list only
    assert(fused(20L) > fused(10L))
    assert(fused(30L) > fused(40L)) // present twice beats once at equal rank
    assert(math.abs(fused(10L) - 1.0 / 61) < 1e-12)
    assert(math.abs(fused(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
  }
}
