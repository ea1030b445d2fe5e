package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Unigram

/** Unigram-LM tokenizer: vocab selection, Viterbi tie-breaks, EM. */
class UnigramSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("trainPieces: substring counts weighted by word frequency, " +
      "singles always kept, milli-nat scores") {
    import spark.implicits._
    // "ab" ×3, "b" ×1 → candidates: a=3, b=4, ab=3
    val docs = Seq("ab ab", "ab b").toDF("text")
    val v = Unigram.trainPieces(docs, col("text"),
      vocabSize = 1, maxPieceLen = 2, minCount = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // top-1 by (cnt desc, piece) = b(4); singles a,b forced in; total=10
    assert(v.map(t => (t._1, t._2)).toSeq == Seq(("a", 3L), ("b", 4L)))
    val total = 7.0 // a=3 + b=4 (ab not selected)
    val scores = v.map(t => t._1 -> t._3).toMap
    assert(scores("a") == math.floor(1000 * math.log(3 / total)).toLong)
    assert(scores("b") == math.floor(1000 * math.log(4 / total)).toLong)
  }

  test("trainPieces distributed selection matches the driver-local " +
      "kernel (minCount + cap pushed into the plan) and maxSingles " +
      "guards the collect") {
    import spark.implicits._
    // includes supplementary-plane text (U+1F600 GRINNING FACE — TWO
    // UTF-16 units, ONE code point): the distributed path slices by
    // Spark substr (code points), so the driver-local kernel must too,
    // and the emoji must land in the singles set (cp length 1)
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq("low lower lowest", "low low newest", "wide wider",
      "lowest newest ab", "b ab ab",
      s"$emoji a$emoji $emoji a$emoji").toDF("text")
    val dist = Unigram.trainPieces(docs, col("text"),
      vocabSize = 12, maxPieceLen = 3, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val words = Unigram.wordCounts(docs, col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val local = Unigram.selectVocab(
      Unigram.candidateCounts(words, 3), 12, 2).sortBy(_._1)
    assert(dist == local, s"distributed $dist != driver-local $local")
    assert(dist.exists(_._1 == emoji),
      s"emoji single missing from vocab: $dist")
    // code-point slicing end to end: a 2-cp word of non-BMP chars
    // viterbi-segments into vocab pieces, never surrogate halves
    val vocabMap = dist.map(t => t._1 -> t._3).toMap
    val (seg, np) = Unigram.viterbi(s"a$emoji", vocabMap, 3)
    // every emitted piece is a real vocab entry — surrogate halves are
    // never in a code-point-sliced vocab, so this also proves no split
    assert(np >= 1 && seg.split(" ").forall(vocabMap.contains),
      s"seg $seg not fully in vocab")
    val err = intercept[IllegalArgumentException] {
      Unigram.trainPieces(docs, col("text"), vocabSize = 4,
        maxPieceLen = 2, minCount = 1, maxSingles = 3)
    }
    assert(err.getMessage.contains("maxSingles"))
  }

  test("viterbi: maximizes score, then fewer pieces, then lexicographic") {
    // scores chosen so "abc" has two max-score paths with equal piece
    // counts: (a bc) and (ab c) — lexicographically "a bc" < "ab c"
    val vocab = Map("a" -> -10L, "b" -> -20L, "c" -> -10L,
      "ab" -> -20L, "bc" -> -20L)
    assert(Unigram.viterbi("abc", vocab, 2) == ("a bc", 2))
    // fewer-pieces tie-break: "ab" (-30) vs "a b" (-30) → 1 piece wins
    assert(Unigram.viterbi("ab", Map("a" -> -10L, "b" -> -20L, "ab" -> -30L),
      2) == ("ab", 1))
    // strictly better score wins regardless of piece count
    assert(Unigram.viterbi("ab", Map("a" -> -1L, "b" -> -1L, "ab" -> -30L),
      2) == ("a b", 2))
  }

  test("viterbi: OOV word passes through whole as one piece") {
    assert(Unigram.viterbi("xyz", Map("a" -> -1L), 4) == ("xyz", 1))
    assert(Unigram.viterbi("", Map("a" -> -1L), 4) == ("", 0))
  }

  test("segment: end-to-end over a trained vocab, word boundaries kept") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab"), (2L, ""), (3L, "aa aa")).toDF("id", "text")
    val pieces = Unigram.trainPieces(docs, col("text"),
      vocabSize = 3, maxPieceLen = 2, minCount = 1)
    val out = Unigram.segment(docs, col("id"), col("text"), pieces,
      maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).sortBy(_._1)
    // counts: words aa×3, ab×1 → a: 2·3+1=7, aa: 3, ab: 1, b: 1
    // top-3 by (cnt desc, piece): a(7), aa(3), ab(1); singles a,b forced
    // → vocab {a,aa,ab,b}, total=12: s(a)=floor(1000·ln(7/12))=-539,
    // s(aa)=-1387, s(ab)=s(b)=-2485. "aa": "a a"(-1078) > "aa"(-1387);
    // "ab": "ab"(-2485) > "a b"(-3024) → single piece wins
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._5 == "a a / ab")
    assert(byId(1L)._2 == 2 && byId(1L)._3 == 3 && byId(1L)._4 == 1.5)
    assert(byId(2L) == ((2L, 0L, 0L, 0.0, "")))
    assert(byId(3L)._5 == "a a / a a")
  }

  test("emRefine: corpus log-likelihood is non-decreasing and unused " +
      "multi-char pieces are pruned") {
    val words = Seq(("low", 5L), ("lower", 2L), ("lowest", 3L))
    val cands = Unigram.candidateCounts(words, 3)
    val v0 = Unigram.selectVocab(cands, 20, 1)
    val (v1, ll) = Unigram.emRefine(words, v0, 3, iters = 4)
    assert(ll.size == 4)
    assert(ll.zip(ll.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"log-likelihood decreased: $ll")
    // every surviving multi-char piece is actually used by some Viterbi
    // segmentation; singles may survive at count 1
    val vmap = v1.map(t => t._1 -> t._3).toMap
    val segs = words.map(w => Unigram.viterbi(w._1, vmap, 3)._1)
    val used = segs.flatMap(_.split(" ")).toSet
    for ((p, _, _) <- v1 if p.length > 1)
      assert(used.contains(p), s"pruned-vocab piece '$p' unused in $segs")
  }

  test("segment memoization: repeated words segment identically and " +
      "fertility rounds half-up at 4dp") {
    import spark.implicits._
    // craft n_pieces/n_words = 101/32 = 3.15625 → 3.1563 half-up
    // (math.rint would give 3.1562 — the DuckDB-parity trap)
    val df = Seq((1L, 3.15625)).toDF("id", "x")
      .select(col("id"), round(col("x"), 4).as("r"))
    assert(df.collect()(0).getDouble(1) == 3.1563)
  }
}
