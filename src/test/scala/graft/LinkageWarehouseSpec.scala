package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Analytics, Linkage, Profile, Warehouse}

/** Round-10 wave against hand-computed fixtures: sorted-neighborhood
  * blocking + Fellegi–Sunter scoring, SCD2 history, the data-quality
  * report family, Kaplan–Meier survival, association rules. */
class LinkageWarehouseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sortedNeighborhoodJoin: window pairs of the global key order, " +
      "JW-thresholded, skew-independent candidate count") {
    import spark.implicits._
    val recs = Seq(
      (10L, "martha stewart"), (11L, "marta stewart"),
      (12L, "zzz unrelated"), (13L, "martha stuart"),
      (14L, "aaa first")).toDF("id", "name")
    val got = Linkage.sortedNeighborhoodJoin(recs, col("id"), col("name"),
        col("name"), window = 3, minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // sort order: aaa(14) < marta(11) < martha stewart(10) <
    // martha stuart(13) < zzz(12); pairs within 2 positions
    assert(got == Set(
      (14L, 11L, 1L), (14L, 10L, 2L), (11L, 10L, 1L), (11L, 13L, 2L),
      (10L, 13L, 1L), (10L, 12L, 2L), (13L, 12L, 1L)))
    // thresholding keeps only the near-duplicate nest
    val strict = Linkage.sortedNeighborhoodJoin(recs, col("id"),
        col("name"), col("name"), window = 3, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(strict == Set((11L, 10L), (11L, 13L), (10L, 13L)))
  }

  test("linkageScore: literal log2 weights, null predicate reads as " +
      "disagreement, decisions split on the rounded score") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L, true, true),   // both agree
      (3L, 4L, true, false),  // mixed
      (5L, 6L, false, false)  // both disagree
    ).toDF("a_id", "b_id", "f1", "f2")
    val out = Linkage.linkageScore(pairs, Seq(
        ("one", col("f1"), 0.9, 0.05),
        ("two", col("f2"), 0.8, 0.1)),
        upper = 5.0, lower = -4.0)
      .orderBy("a_id")
      .collect().map(r => (r.getLong(0),
        r.getAs[Boolean]("agree_one"), r.getAs[Boolean]("agree_two"),
        r.getAs[Double]("score"), r.getAs[String]("decision")))
    val (w1a, w1d) = Linkage.fsWeights(0.9, 0.05)
    val (w2a, w2d) = Linkage.fsWeights(0.8, 0.1)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, true, true, r4(w1a + w2a), "match"),     // 7.17 >= 5
      (3L, true, false, r4(w1a + w2d), "review"),   // 2.0
      (5L, false, false, r4(w1d + w2d), "non_match") // -5.42 <= -4
    ))
    // null predicate = disagreement (conservative)
    val withNull = Seq((7L, 8L)).toDF("a_id", "b_id")
      .withColumn("p", lit(null).cast("boolean"))
    val n = Linkage.linkageScore(withNull,
      Seq(("one", col("p"), 0.9, 0.05)), 1.0, -1.0).head()
    assert(!n.getAs[Boolean]("agree_one") &&
      n.getAs[Double]("score") == r4(w1d))
  }

  test("scd2: collapses attribute runs into versioned intervals with " +
      "tiebreak-deterministic boundaries") {
    import spark.implicits._
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A"), // same state: no new version
      (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "A"), // back to A: NEW version
      (2L, ts("2024-01-05 00:00:00"), 5L, "X")
    ).toDF("k", "t", "id", "state")
    val out = Warehouse.scd2(log, col("k"), col("t"), col("id"),
        Seq("state" -> col("state")))
      .orderBy("k", "version")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString),
        r.getLong(4), r.getString(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, "2024-01-01 00:00:00.0", Some("2024-01-03 00:00:00.0"), 0L, "A"),
      (1L, 2L, "2024-01-03 00:00:00.0", Some("2024-01-04 00:00:00.0"), 0L, "B"),
      (1L, 3L, "2024-01-04 00:00:00.0", None, 1L, "A"),
      (2L, 1L, "2024-01-05 00:00:00.0", None, 1L, "X")))
    // equal timestamps: the tiebreak id orders the run detection
    val tie = Seq(
      (9L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (9L, ts("2024-01-01 00:00:00"), 2L, "B")
    ).toDF("k", "t", "id", "state")
    val tv = Warehouse.scd2(tie, col("k"), col("t"), col("id"),
        Seq("state" -> col("state")))
      .orderBy("version").collect().map(_.getString(5))
    assert(tv.toSeq == Seq("A", "B"))
  }

  test("dqReport/dqUnique/dqRefIntegrity: violations, null semantics, " +
      "shared report shape") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -5.0), (3L, null), (3L, 20.0)
    ).toDF("id", "v")
    val rep = Profile.dqReport(df, Seq(
        "v_positive" -> (col("v") > 0),      // -5 and null violate
        "id_small" -> (col("id") < 100)))    // all pass
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rep.toSeq == Seq(
      ("id_small", 4L, 0L, 1.0),
      ("v_positive", 4L, 2L, 0.5)))
    val uniq = Profile.dqUnique(df, Seq("id_unique" -> Seq(col("id"))))
      .head()
    // both id=3 rows are implicated
    assert((uniq.getLong(1), uniq.getLong(2), uniq.getDouble(3)) ==
      ((4L, 2L, 0.5)))
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq[java.lang.Long](1L, 2L, 7L, null).toDF("fk")
    val ref = Profile.dqRefIntegrity(child, col("fk"), parent, col("pk"),
      "fk_parent").head()
    // 7 dangles; the null FK is NOT a violation
    assert((ref.getLong(1), ref.getLong(2), ref.getDouble(3)) ==
      ((4L, 1L, 0.75)))
  }

  test("kaplanMeier: textbook curve, censored times drop, dead risk set " +
      "pins survival to exact zero") {
    import spark.implicits._
    val subj = Seq((6L, true), (6L, true), (6L, false), (7L, true),
      (10L, false), (13L, true), (16L, false)).toDF("dur", "obs")
    val out = Analytics.kaplanMeier(subj, col("dur"), col("obs"))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // S(6)=5/7=0.7143; S(7)=5/7·3/4=0.5357; S(13)=·1/2=0.2679;
    // censored-only t=10 and t=16 emit no row
    assert(out.toSeq == Seq(
      (6L, 7L, 2L, 0.7143), (7L, 4L, 1L, 0.5357), (13L, 2L, 1L, 0.2679)))
    val dies = Seq((3L, true), (5L, true)).toDF("dur", "obs")
    val d = Analytics.kaplanMeier(dies, col("dur"), col("obs"))
      .orderBy("t").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(d.toSeq == Seq((3L, 0.5), (5L, 0.0))) // exact zero, no ln(0)
  }

  test("skewReport: straggler ratio and hot keys on a skewed fixture") {
    import spark.implicits._
    val df = (Seq.fill(8)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val r = graft.ops.Scale.skewReport(df, col("k"), topN = 2).head()
    // 12 rows, 5 keys, max 8, avg 2.4 → ratio 3.3333
    assert((r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
      r.getAs[Long]("max_count"), r.getAs[Double]("avg_count"),
      r.getAs[Double]("skew_ratio")) == ((12L, 5L, 8L, 2.4, 3.3333)))
    assert(r.getSeq[String](r.fieldIndex("top_keys")).toList ==
      List("hot:8", "a:1"))
  }

  test("standardize: group z-scores from broadcast moments; degenerate " +
      "groups yield null") {
    import spark.implicits._
    val df = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0),
      (4L, "solo", 9.0)).toDF("id", "grp", "v")
    val out = graft.ops.Profile.standardize(df, col("id"), Seq("grp"),
        col("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_
        .asInstanceOf[Double])))
    // g: mean 2, sample std 1 → z = -1, 0, 1; solo: std undefined
    assert(out.toSeq == Seq((1L, Some(-1.0)), (2L, Some(0.0)),
      (3L, Some(1.0)), (4L, None)))
  }

  test("giniCoefficient: rank-identity value on a hand case, 0 at " +
      "perfect equality and on an all-zero total") {
    import spark.implicits._
    val v = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 4.0)).toDF("id", "x")
    val g = Analytics.giniCoefficient(v, col("x"), col("id")).head()
    // sorted 1,1,2,4: Σx=8, Σi·x=25 → (50−40)/32 = 0.3125
    assert((g.getLong(0), g.getDouble(1), g.getDouble(2)) ==
      ((4L, 8.0, 0.3125)))
    val eq = Seq((1L, 3.0), (2L, 3.0)).toDF("id", "x")
    assert(Analytics.giniCoefficient(eq, col("x"), col("id"))
      .head().getDouble(2) == 0.0)
    val z = Seq((1L, 0.0), (2L, 0.0)).toDF("id", "x")
    assert(Analytics.giniCoefficient(z, col("x"), col("id"))
      .head().getDouble(2) == 0.0)
  }

  test("associationRules: pairwise support/confidence/lift with the " +
      "minPairs prune, both directions") {
    import spark.implicits._
    val b = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 2L), (4L, 4L), (1L, 2L) // dup tolerated
    ).toDF("bk", "it")
    val out = Analytics.associationRules(b, col("bk"), col("it"),
        minPairs = 2)
      .orderBy("antecedent", "consequent").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 0.5, 0.6667, 0.8889),
      (1L, 3L, 2L, 0.5, 0.6667, 1.3333),
      (2L, 1L, 2L, 0.5, 0.6667, 0.8889),
      (3L, 1L, 2L, 0.5, 1.0, 1.3333)))
  }
}
