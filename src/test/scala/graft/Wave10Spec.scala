package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 wave: recorded firing evidence for the remaining sized
  * `require` knobs (round-12 verdict ask #7) — each guard fires with
  * its sizing message and the same inputs pass when the knob is
  * raised. The at-default-knob demonstrations live in
  * `graft.tools.GuardDemo sized` (BASELINE.md records a run). */
class Wave10Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("winnowOverlapAgainst maxIndexEntries guard: an oversized " +
      "pruned fingerprint index fails fast with the sizing message; " +
      "raising the knob admits it") {
    import spark.implicits._
    // 6 distinct single-id hash buckets > maxIndexEntries = 4
    val fp = (1L to 6L).map(h => (h * 100, h)).toDF("id", "h")
    val probe = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "text")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.winnowOverlapAgainst(probe, col("id"),
        col("text"), fp, maxIndexEntries = 4L).count()
    }
    assert(ex.getMessage.contains("maxIndexEntries") &&
      ex.getMessage.contains("6 distinct hashes"), ex.getMessage)
    // the identical input passes once the driver is sized for it
    assert(graft.ops.TextAnalysis.winnowOverlapAgainst(probe, col("id"),
      col("text"), fp, maxIndexEntries = 10L).count() >= 0L)
  }

  test("trainPieces maxSingles guard: more distinct single-char " +
      "pieces than the knob fails fast (binary-noise tripwire); " +
      "raising the knob trains") {
    import spark.implicits._
    // 4 distinct chars as separate words > maxSingles = 3
    val docs = Seq((1L, "a b c d")).toDF("id", "text")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Unigram.trainPieces(docs, col("text"), maxSingles = 3)
    }
    assert(ex.getMessage.contains("maxSingles") &&
      ex.getMessage.contains("binary noise"), ex.getMessage)
    val ok = graft.ops.Unigram.trainPieces(docs, col("text"),
      maxSingles = 8)
    assert(ok.count() >= 4L)
  }
}
