package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.PortableHash
import graft.ops.Hnsw

/** HNSW layered-graph build + beam search: structural invariants, search
  * recall against a locally computed exact top-k, determinism, and the
  * IVF-pruned build's contract parity. */
class HnswSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dim = 16
  private val nPts = 400

  private def u(s: String): Double =
    (PortableHash.hex15(s) % 2000L) / 1000.0 - 1.0 // [-1, 1)

  private def center(c: Int): Array[Double] =
    Array.tabulate(dim)(d => u(s"c:$c:$d"))

  /** 400 deterministic points in 8 jittered clusters. */
  private lazy val pts: Seq[(Long, Array[Float])] =
    (0 until nPts).map { i =>
      val c = center(i % 8)
      (i.toLong, Array.tabulate(dim)(d =>
        (c(d) + 0.15 * u(s"p:$i:$d")).toFloat))
    }

  private def ptsDf() = {
    import spark.implicits._
    pts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  private val query: Array[Float] =
    center(3).map(x => (x + 0.05).toFloat)

  private def exactTop(k: Int): Set[Long] =
    pts.map { case (id, v) => (id, cos(v, query)) }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet

  test("buildExact: layer sizes decay, caps respected, no self edges") {
    val edges = Hnsw.buildExact(ptsDf(), col("id"), col("v"), m = 8,
      maxLevel = 2).cache()
    val byLevel = edges.groupBy("level")
      .agg(countDistinct("id").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // geometric ladder: ~1/4 of nodes per extra layer
    assert(byLevel(0) == nPts.toLong)
    assert(byLevel(1) < nPts / 2 && byLevel(1) > nPts / 16)
    assert(byLevel.getOrElse(2, 0L) <= byLevel(1))
    // upper-layer nodes are a subset of lower-layer nodes
    val l1 = edges.filter(col("level") === 1).select("id").distinct()
    assert(l1.join(edges.filter(col("level") === 0).select("id").distinct(),
      "id").count() == byLevel(1))
    assert(edges.filter(col("id") === col("nbr")).count() == 0)
    assert(edges.filter(col("rnk") > 8).count() == 0)
    // per (level, id): top-M ranks 1..n without gaps, ≤ 1 ring row
    val bad = edges.filter(col("rnk") >= 1).groupBy("level", "id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(bad == 0)
    val badRing = edges.filter(col("rnk") === 0).groupBy("level", "id")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(badRing == 0)
    // the ring + top-M successor set covers every node: per level each
    // node has an edge to its id-successor (directly or via top-M)
    val l2 = edges.filter(col("level") === 2)
    val ids2 = l2.select("id").distinct().orderBy("id")
      .collect().map(_.getLong(0))
    val succ2 = ids2.zip(ids2.drop(1) :+ ids2.head).toSet
    val have2 = l2.select("id", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(succ2.subsetOf(have2))
  }

  test("search: recall@10 >= 0.9 vs exact, and deterministic") {
    val df = ptsDf()
    val edges = Hnsw.buildExact(df, col("id"), col("v"), m = 8,
      maxLevel = 2).cache()
    edges.count()
    def run() = Hnsw.search(edges, df, col("id"), col("v"), query,
        k = 10, maxLevel = 2, ef = 60)
      .select("id").collect().map(_.getLong(0)).toSeq
    val got = run()
    assert(got == run()) // deterministic
    val recall = (got.toSet & exactTop(10)).size / 10.0
    assert(recall >= 0.9, s"recall $recall, got $got")
  }

  test("buildIvf: same contract, search over it still finds the cluster") {
    val df = ptsDf()
    val edges = Hnsw.buildIvf(df, col("id"), col("v"), m = 8,
      maxLevel = 2, nlist = 16).cache()
    assert(edges.columns.toSeq ==
      Seq("level", "id", "rnk", "nbr", "sim"))
    edges.count()
    val got = Hnsw.search(edges, df, col("id"), col("v"), query,
        k = 10, maxLevel = 2, ef = 60)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = (got & exactTop(10)).size / 10.0
    assert(recall >= 0.6, s"IVF-pruned recall $recall")
  }

  test("searchMany: batched equals single per query, one shared descent") {
    val df = ptsDf()
    val edges = Hnsw.buildExact(df, col("id"), col("v"), m = 8,
      maxLevel = 2).cache()
    edges.count()
    val queries = Seq(
      10L -> query,
      11L -> center(5).map(x => (x - 0.02).toFloat),
      12L -> center(0).map(_.toFloat))
    val batched = Hnsw.searchMany(edges, df, col("id"), col("v"),
        queries, k = 10, maxLevel = 2, ef = 60)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).sortBy(_._1).toSeq }
    queries.foreach { case (qid, qv) =>
      val single = Hnsw.search(edges, df, col("id"), col("v"), qv,
          k = 10, maxLevel = 2, ef = 60)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(batched(qid) == single, s"qid $qid diverged")
    }
  }

  test("append: links a new batch without re-scoring the graph; " +
      "caps and recall hold") {
    import spark.implicits._
    val (oldPts, newPts) = pts.partition(_._1 < 300)
    val oldDf = oldPts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    val newDf = newPts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    val base = Hnsw.buildExact(oldDf, col("id"), col("v"), m = 8,
      maxLevel = 2).cache()
    base.count()
    val edges = Hnsw.append(base, oldDf, col("id"), col("v"),
      newDf, col("id"), col("v"), m = 8, maxLevel = 2, efC = 60).cache()
    // structural invariants survive the append
    assert(edges.filter(col("id") === col("nbr")).count() == 0)
    assert(edges.filter(col("rnk") > 8).count() == 0)
    val badRing = edges.filter(col("rnk") === 0).groupBy("level", "id")
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(badRing == 0)
    // every node of every layer has an edge list (ring guarantees ≥ 1)
    val full = ptsDf()
    val n0 = edges.filter(col("level") === 0).select("id").distinct().count()
    assert(n0 == nPts.toLong)
    // new nodes actually linked into the kNN lists, not just the ring
    val newLinked = edges.filter(col("rnk") >= 1 &&
      col("id") >= 300).select("id").distinct().count()
    assert(newLinked > 50, s"only $newLinked new nodes have kNN edges")
    // search over the appended graph still finds the cluster
    val got = Hnsw.search(edges, full, col("id"), col("v"), query,
        k = 10, maxLevel = 2, ef = 60)
      .select("id").collect().map(_.getLong(0)).toSet
    val recall = (got & exactTop(10)).size / 10.0
    assert(recall >= 0.6, s"post-append recall $recall")
    // appended results can surface NEW ids when they win on similarity
    val newIdsInTop = exactTop(10).count(_ >= 300)
    if (newIdsInTop > 0)
      assert(got.exists(_ >= 300), "new batch invisible to search")
  }

  test("levelCol: matches the md5 ladder definition") {
    import spark.implicits._
    val out = (0L until 64L).toDF("id")
      .select(col("id"), Hnsw.levelCol(col("id"), 3).as("lvl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 64L).foreach { i =>
      val h = PortableHash.hex15(s"hnsw:$i")
      val expect =
        if (h % 64 == 0) 3 else if (h % 16 == 0) 2
        else if (h % 4 == 0) 1 else 0
      assert(out(i) == expect, s"id $i")
    }
  }
}
