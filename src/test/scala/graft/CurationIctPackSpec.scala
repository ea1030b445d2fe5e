package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.PortableHash
import graft.ops.Curation

/** ICT pair construction + per-doc pack assignment: hand-computed cases,
  * token conservation, packSequences parity, partition invariance. */
class CurationIctPackSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ictPairs: md5-picked unit, leave-out vs leave-in, short docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),        // 2 units
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 3 units (last short)
      (3L, "only four tokens here"),  // 1 unit → drops
      (4L, "")                        // empty → drops
    ).toDF("doc_id", "text")
    val out = Curation.ictPairs(docs, col("doc_id"), col("text"), 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getBoolean(5))).toMap
    assert(out.keySet == Set(1L, 2L))
    Seq(1L -> Seq("a b c d", "e f g h"),
        2L -> Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9")).foreach {
      case (id, units) =>
        val (nUnits, qIdx, q, ctx, kept) = out(id)
        assert(nUnits == units.length)
        assert(qIdx == PortableHash.hex15(s"ict:$id") % units.length)
        assert(kept == (PortableHash.hex15(s"ictkeep:$id") % 10 == 0))
        assert(q == units(qIdx.toInt))
        val expectCtx =
          if (kept) units.mkString(" ")
          else units.zipWithIndex.filter(_._2 != qIdx).map(_._1)
            .mkString(" ")
        assert(ctx == expectCtx, s"doc $id")
    }
    // token conservation on the leave-out form
    out.foreach { case (id, (_, _, q, ctx, kept)) =>
      if (!kept) {
        val total = Map(1L -> 8, 2L -> 9)(id)
        assert(q.split(" ").length + ctx.split(" ").length == total)
      }
    }
  }

  test("packAssign: first-fit bins, packSequences parity, partition-invariant") {
    import spark.implicits._
    val df = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("id", "t")
    val got = Curation.packAssign(df, col("id"), Seq(col("id")), col("t"),
        budget = 6)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cum: 0,3,6,9,12 → bins 0,0,1,1,2
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 2L)))
    // parity with packSequences' bin aggregate
    val agg = Curation.packAssign(df, col("id"), Seq(col("id")), col("t"), 6)
      .groupBy("bin").agg(count(lit(1)).as("n_docs"), sum("t").as("tokens"))
      .orderBy("bin").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ref = Curation.packSequences(df, col("id"), col("t"), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(agg == ref)
    // same result however the input arrives partitioned
    val shuffled = Curation.packAssign(df.repartition(7), col("id"),
        Seq(col("id")), col("t"), 6)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(shuffled == got)
  }

  test("wordNoise: first token survives, pct edges, md5-deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "")).toDF("doc_id", "text")
    def run(p: Int) = Curation.wordNoise(docs, col("doc_id"), col("text"), p)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val zero = run(0)
    assert(zero(0) == (1L, 10L, 0L, "a b c d e f g h i j")) // identity
    assert(zero(1) == (2L, 0L, 0L, ""))                      // empty doc
    val full = run(100)
    assert(full(0) == (1L, 10L, 9L, "a")) // only the first token survives
    val mid = run(30)
    assert(mid(0)._4.startsWith("a")) // first token always kept
    assert(mid(0)._3 > 0 && mid(0)._3 < 10)
    // the exact survivor set replays from the portable hash
    val expect = "a" +: (1 until 10).collect {
      case i if PortableHash.hex15(s"noise:1:$i") % 100 >= 30 =>
        ('a' + i).toChar.toString
    }
    assert(mid(0)._4 == expect.mkString(" "))
    assert(run(30).toSeq == mid.toSeq) // deterministic
  }

  test("packTexts: concatenated bins agree with packAssign membership") {
    import spark.implicits._
    val df = Seq((1L, "aa bb cc"), (2L, "dd ee ff"), (3L, "gg hh ii"),
      (4L, "jj"), (5L, "kk ll mm nn oo")).toDF("id", "text")
    val tok = size(split(col("text"), " "))
    val out = Curation.packTexts(df, col("id"), col("text"), tok,
        budget = 6, sep = " | ")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // cum-before: 0,3,6,9,10 → bins 0,0,1,1,1 (a doc starting inside a
    // bin may overflow it — the q62 first-fit contract)
    assert(out.toSeq == Seq(
      (0L, 2L, 6L, "aa bb cc | dd ee ff"),
      (1L, 3L, 9L, "gg hh ii | jj | kk ll mm nn oo")))
  }

  test("sentenceSplit: terminal runs, unterminated tail, blanks drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two. Three four! Five"),
      (2L, "No terminals at all"),
      (3L, "..."),
      (4L, "A?! B.")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.sentenceSplit(docs, col("doc_id"),
        col("text"))
      .orderBy("id", "sent_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(
      (1L, 0L, "One two."), (1L, 1L, "Three four!"), (1L, 2L, "Five"),
      (2L, 0L, "No terminals at all"),
      (4L, 0L, "A?!"), (4L, 1L, "B.")))
  }

  test("packAssign: multi-column order co-locates groups") {
    import spark.implicits._
    // cells interleaved by id; ordering (cell, id) packs cells together
    val df = Seq((1L, 0, 4L), (2L, 1, 4L), (3L, 0, 4L), (4L, 1, 4L))
      .toDF("id", "cell", "t")
    val got = Curation.packAssign(df, col("id"),
        Seq(col("cell"), col("id")), col("t"), budget = 8)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // order: (0,1),(0,3),(1,2),(1,4) → bins 0,0,1,1
    assert(got == Map(1L -> 0L, 3L -> 0L, 2L -> 1L, 4L -> 1L))
  }
}
