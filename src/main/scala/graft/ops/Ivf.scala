package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/**
 * IVF (inverted-file) clustering over an embedding column: k-means
 * centroids learned from the data, vectors assigned to their nearest
 * centroid, queries probing only the `nprobe` nearest cells — the
 * scan-reduction ANN structure the reference's FLAT index lacks (its
 * tiledb-vector-search backend ships IVF_FLAT; SURVEY §4.3 names this the
 * clustered-store upgrade path). Learned cells adapt to the data's density,
 * so recall at equal probe fraction dominates the data-oblivious sign-LSH
 * cells (`ExtensionsAndClusterSpec` measures exactly that).
 *
 * Every step is engine-portable by construction (the DuckDB oracle of
 * q66 re-trains the same centroids):
 *
 *  - seed selection: the k vectors with smallest 60-bit md5(id) — a
 *    deterministic pseudo-random draw that plans as TakeOrderedAndProject
 *    (no global row_number; [[graft.expr.PortableHash]] spec)
 *  - Lloyd iterations: assign = argmax cosine (ties → lowest cid) against
 *    broadcast centroids; update = per-dimension mean QUANTIZED to 1/1024
 *    steps — exactly representable in float32 AND in any engine's doubles,
 *    so cross-engine ulp noise cannot survive an iteration
 *  - empty clusters keep their previous centroid
 *
 * Scale shape: centroids are k×dim floats (driver-resident, broadcast);
 * each iteration is one scan + one partial-aggregated shuffle of
 * (cid, dim) partials; assignment of the full table is the same scan
 * shape. Training on a `sampleFraction` md5-sample keeps the iterations
 * off the full 100 TB table (the assignment pass still sees every row).
 */
object Ivf {

  /** Deterministic 60-bit md5 hash of an id column (PortableHash spec). */
  private def idHash(id: Column): Column = graft.expr.PortableHash.hex15Col(id)

  /** One Lloyd step: returns the updated (cid, centroid) rows. */
  private def step(v: DataFrame, cents: Seq[(Int, Seq[Float])]): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    val cdf = broadcast(cents.toDF("cid", "c")
      .select(col("cid"), col("c").cast("array<float>").as("c")))
    val assigned = v.crossJoin(cdf)
      .select(col("id"), col("v"), col("cid"),
        cosine_similarity(col("v"), col("c")).as("sim"))
      .groupBy(col("id"), col("v"))
      .agg(max_by(col("cid"), struct(col("sim"), (-col("cid")).cast("int"))).as("cid"))
    assigned
      .select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos")
      .agg((round(avg(col("col")) * 1024) / 1024).as("q"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("q")))),
        x => x("q")).cast("array<float>").as("c"))
  }

  /** Train k-means centroids; returns `(cid, centroid)` sorted by cid.
    * Deterministic in (data, k, iters, sampleFraction). */
  def trainCentroids(emb: DataFrame, idCol: Column, vecCol: Column, k: Int,
      iters: Int = 2, sampleFraction: Int = 100): Seq[(Int, Seq[Float])] = {
    val all = emb.select(idCol.cast("long").as("id"),
      vecCol.cast("array<float>").as("v"))
    val v = if (sampleFraction >= 100) all
      else all.filter(idHash(col("id")) % 100 < sampleFraction)
    // .toVector: Row.getAs hands back a mutable ArraySeq, which Scala
    // 2.13's immutable-Seq encoder rejects when the tuples go back
    // through toDF
    val seeds = v.withColumn("h", idHash(col("id")))
      .orderBy("h").limit(k) // TakeOrderedAndProject: no global sort
      .collect().sortBy(_.getAs[Long]("h"))
      .zipWithIndex
      .map { case (r, i) => (i, r.getAs[Seq[Float]]("v").toVector: Seq[Float]) }
      .toSeq
    (0 until iters).foldLeft(seeds) { (cents, _) =>
      val updated = step(v, cents).collect()
        .map(r => r.getAs[Int]("cid") -> (r.getAs[Seq[Float]]("c").toVector: Seq[Float]))
        .toMap
      cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
  }

  /** Nearest-centroid id for every row: `(…emb columns, cluster)`. */
  def assignClusters(emb: DataFrame, idCol: Column, vecCol: Column,
      cents: Seq[(Int, Seq[Float])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cdf = broadcast(cents.toDF("cid", "c")
      .select(col("cid"), col("c").cast("array<float>").as("c")))
    emb.crossJoin(cdf)
      .withColumn("sim_c", cosine_similarity(vecCol, col("c")))
      .groupBy(emb.columns.map(col): _*)
      .agg(max_by(col("cid"), struct(col("sim_c"), (-col("cid")).cast("int")))
        .as("cluster"))
  }

  /** The query's `nprobe` nearest centroid ids (driver-side: k is tiny). */
  def probeList(cents: Seq[(Int, Seq[Float])], query: Array[Float],
      nprobe: Int): Seq[Int] = {
    def cos(a: Seq[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < b.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    cents.map { case (cid, c) => (cid, cos(c, query)) }
      .sortBy { case (cid, s) => (-s, cid) }
      .take(nprobe).map(_._1)
  }

  /** End-to-end IVF approximate top-k over an embedding frame: train (or
    * reuse) centroids, assign, probe, exact cosine within probed cells. */
  def ivfTopK(emb: DataFrame, idCol: Column, vecCol: Column,
      query: Array[Float], k: Int, nlist: Int = 8, iters: Int = 2,
      nprobe: Int = 2): DataFrame = {
    val cents = trainCentroids(emb, idCol, vecCol, nlist, iters)
    val probes = probeList(cents, query, nprobe)
    assignClusters(emb.select(idCol.as("id"), vecCol.as("v")),
        col("id"), col("v"), cents)
      .filter(col("cluster").isin(probes: _*))
      .select(col("id"),
        round(cosine_similarity(col("v"), typedLit(query)), 4).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }
}
