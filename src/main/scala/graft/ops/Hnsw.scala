package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.PortableHash
import graft.functions.cosine_similarity

/**
 * Hierarchical navigable-small-world graph index (Malkov & Yashunin,
 * TPAMI 2018) — the graph member of the ANN family, next to the IVF
 * (cluster-pruned), PQ/SQ8/binary (code-compressed) and LSH (bucketed)
 * paths: a layered neighbor graph searched by greedy descent through the
 * sparse upper layers and a best-first beam at layer 0.
 *
 * Two deliberate departures from the paper, both for engine portability:
 *
 *  - levels are DETERMINISTIC: node `i` sits on every layer `l` with
 *    `hex15(md5("hnsw:" || i)) % 4^l == 0` (a geometric ladder with decay
 *    1/4, the paper's `mL = 1/ln 4`, derived from the portable md5 kernel
 *    instead of an RNG — the DuckDB oracle replays layer assignment and
 *    therefore the whole graph bit-for-bit);
 *  - neighbor selection is symmetric top-M by cosine (directed kNN edges
 *    unioned with their reverses, re-capped at M per node) rather than
 *    the paper's diversity heuristic — SQL-expressible, and on
 *    mid-dimensional data the recall difference is absorbed by `ef`.
 *
 * Scale shapes: [[buildExact]] scores each layer's pairs with the same
 * broadcast join as [[Ann.knnGraph]] — the exact BASELINE (layer sizes
 * shrink 4× per level, so the cost is the layer-0 join). [[buildIvf]] is
 * the pruned path: per-layer candidates come from same-IVF-cell
 * equi-joins (cell count shrinking with the layer), so the pair fan-out
 * is bounded by the largest cell, never n². [[search]] is iterative by
 * nature (pointer chasing): each hop is ONE job that joins the current
 * frontier's adjacency rows (≤ ef·M of them) against the vector table —
 * on a store bucketed by `src` those are partition-pruned point reads;
 * the driver holds only the ef-bounded beam. Rounds, not volume, are the
 * cost: O(levels + hops) jobs of milliseconds each.
 */
object Hnsw {

  /** Deterministic layer of a node: the largest `l <= maxLevel` with
    * `hex15(md5("hnsw:" || id)) % 4^l == 0` (≈ geometric, decay 1/4). */
  def levelCol(id: Column, maxLevel: Int): Column = {
    val h = PortableHash.hex15Col(concat(lit("hnsw:"), id.cast("string")))
    (1 to maxLevel).foldLeft(lit(0)) { (acc, l) =>
      when(h % math.pow(4, l).toLong === 0, lit(l)).otherwise(acc)
    }
  }

  /** Shared edge contract: from scored directed candidates
    * `(qid, cid, sim)` per layer, take top-M per `qid` (sim DESC, id
    * ASC — [[TopK]] tie rule), symmetrize, re-cap at M. Output:
    * `(id, rnk, nbr, sim)`. */
  private def symmetricTopM(scored: DataFrame, m: Int): DataFrame = {
    val dir = TopK.perGroup(scored, Seq(col("qid")), col("cid"),
        col("sim"), m)
      .select(col("qid").as("src"), col("id").as("nbr"), col("sim"))
    val sym = dir.union(
        dir.select(col("nbr").as("src"), col("src").as("nbr"), col("sim")))
      .groupBy("src", "nbr").agg(max("sim").as("sim"))
    TopK.perGroup(sym, Seq(col("src")), col("nbr"), col("sim"), m)
      .select(col("src").as("id"), col("rnk"), col("id").as("nbr"),
        col("sim"))
  }

  /** Ring edges: every layer node's successor by id (the greatest id
    * wraps to the smallest) as `rnk = 0` rows, omitted when the
    * successor is already a top-M neighbor. Similarity-built kNN layers
    * disconnect across well-separated clusters (the paper avoids this
    * only because its INCREMENTAL insertion links every node into the
    * searched component); the ring is the deterministic batch-mode
    * connectivity guarantee — 2 extra directed edges per node, and the
    * beam crawls along it out of any dead-ended component. Ranks come
    * from a range-partitioned sort + per-partition offsets (one sizes
    * job), never a single-task global sort. */
  private def ringEdges(nodes: DataFrame, topM: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    val rdd = nodes.select(col("id"), col("v"))
      .repartitionByRange(col("id")).sortWithinPartitions(col("id")).rdd
    val sizes = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val total = offsets.last
    if (total < 2) return topM.limit(0)
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { case (i, it) =>
        var idx = bc.value(i) - 1
        it.map { r => idx += 1
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ idx) }
      },
      nodes.select("id", "v").schema
        .add("rank", org.apache.spark.sql.types.LongType))
    val succ = ranked.select(((col("rank") + total - 1) % total).as("rank"),
      col("id").as("nbr"), col("v").as("nv"))
    ranked.join(succ, "rank")
      .select(col("id"), lit(0).as("rnk"), col("nbr"),
        round(cosine_similarity(col("v"), col("nv")), 4).as("sim"))
      .join(topM.select(col("id"), col("nbr")), Seq("id", "nbr"),
        "left_anti")
  }

  private def scoredPairs(nodes: DataFrame): DataFrame = {
    val p = math.max(nodes.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt, 1)
    nodes.repartition(p, col("id")).as("a")
      .join(broadcast(nodes.as("b")), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("qid"), col("b.id").as("cid"),
        round(cosine_similarity(col("a.v"), col("b.v")), 4).as("sim"))
  }

  /** Exact layered graph: `(level, id, rnk, nbr, sim)` — every node's
    * symmetric top-`m` cosine neighbors among its layer peers, for each
    * layer `0..maxLevel` the node reaches. Per-layer pair scoring uses
    * the [[Ann.knnGraph]] broadcast join — the exact baseline the pruned
    * build is measured against. */
  def buildExact(emb: DataFrame, idCol: Column, vecCol: Column, m: Int,
      maxLevel: Int): DataFrame = {
    val v = emb.select(idCol.cast("long").as("id"),
      vecCol.cast("array<float>").as("v"),
      levelCol(idCol.cast("long"), maxLevel).as("lvl"))
    (0 to maxLevel).map { l =>
      val nodes = v.filter(col("lvl") >= l)
      val topM = symmetricTopM(scoredPairs(nodes), m)
      topM.unionByName(ringEdges(nodes, topM))
        .select(lit(l).as("level"), col("id"), col("rnk"), col("nbr"),
          col("sim"))
    }.reduce(_.unionByName(_))
  }

  /** IVF-pruned layered graph: same contract as [[buildExact]], but each
    * layer's candidate pairs come from a same-cluster equi-join on
    * centroids trained for that layer (cell count shrinking with the
    * layer, floor 1 — upper layers are near-exact, layer 0 is bounded by
    * the largest cell). Nodes alone in their cell contribute no edges;
    * that recall cost is exactly what a [[Ann.retrievalMetrics]] run
    * against the exact build measures. */
  def buildIvf(emb: DataFrame, idCol: Column, vecCol: Column, m: Int,
      maxLevel: Int, nlist: Int, iters: Int = 2,
      sampleFraction: Int = 100): DataFrame = {
    val v = emb.select(idCol.cast("long").as("id"),
      vecCol.cast("array<float>").as("v"),
      levelCol(idCol.cast("long"), maxLevel).as("lvl"))
    (0 to maxLevel).map { l =>
      val nodes = v.filter(col("lvl") >= l)
      val cells = math.max(1, nlist / math.pow(4, l).toInt)
      val scored = if (cells <= 1) scoredPairs(nodes)
      else {
        val cents = Ivf.trainCentroids(nodes, col("id"), col("v"), cells,
          iters, sampleFraction)
        val assigned = Ivf.assignClusters(nodes, col("id"), col("v"), cents)
        assigned.as("a").join(assigned.as("b"),
            col("a.cluster") === col("b.cluster") &&
              col("a.id") =!= col("b.id"))
          .select(col("a.id").as("qid"), col("b.id").as("cid"),
            round(cosine_similarity(col("a.v"), col("b.v")), 4).as("sim"))
      }
      val topM = symmetricTopM(scored, m)
      topM.unionByName(ringEdges(nodes, topM))
        .select(lit(l).as("level"), col("id"), col("rnk"), col("nbr"),
          col("sim"))
    }.reduce(_.unionByName(_))
  }

  /** Beam-descent search over a built graph. Entry point: the
    * highest-layer node (ties → lowest id). The `ef`-wide best-first
    * beam runs at EVERY layer, carried downward (the paper's ef=1
    * greedy descent assumes its diversity-pruned edges keep each layer
    * navigable; the symmetric-top-M edges here do not guarantee that,
    * and a beam over the sparse upper layers recovers the missed
    * long-range routing at negligible cost — upper layers are 4^l
    * smaller). Returns the top `k` as `(rnk, id, sim)`. Each hop is one
    * Spark job joining the current frontier's adjacency rows (≤ ef·M of
    * them) to the vector table; the driver never holds more than the
    * ef-bounded beam. */
  def search(edges: DataFrame, emb: DataFrame, idCol: Column,
      vecCol: Column, query: Array[Float], k: Int, maxLevel: Int,
      ef: Int = 50, maxHops: Int = 50, srcBuckets: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(idCol.cast("long").as("id"),
      vecCol.cast("array<float>").as("v"))
    val qsim = round(cosine_similarity(col("v"), typedLit(query)), 4)
    val e =
      if (srcBuckets > 0)
        edges.select(col("level"), col("id").as("src"), col("nbr"),
          col("src_bucket"))
      else edges.select(col("level"), col("id").as("src"), col("nbr"))

    // entry = highest-layer node (its layer may hold no edges, so derive
    // from the vector table, not the edge frame)
    val entryRow = v.select(col("id"),
        levelCol(col("id"), maxLevel).as("lvl"), qsim.as("sim"))
      .orderBy(col("lvl").desc, col("id").asc).limit(1).head()

    // scored, deduped neighbors of `srcs` at layer l — one job per call.
    // With a bucketed edge store (srcBuckets > 0) the extra predicate on
    // the partition column turns the fetch into directory-pruned point
    // reads — the adjacency scan touches only the frontier's buckets.
    def nbrs(l: Int, srcs: Seq[Long]): Seq[(Long, Double)] = {
      val base = e.filter(col("level") === l && col("src").isin(srcs: _*))
      val pruned =
        if (srcBuckets > 0)
          base.filter(col("src_bucket")
            .isin(srcs.map(_ % srcBuckets).distinct: _*))
        else base
      pruned
        .join(v, col("nbr") === v("id"))
        .groupBy(col("nbr")).agg(first(qsim).as("sim"))
        .as[(Long, Double)].collect().toSeq
    }

    var beam = Vector((entryRow.getLong(0), entryRow.getDouble(2)))
    for (l <- maxLevel to 0 by -1) {
      val visited = scala.collection.mutable.Set(beam.map(_._1): _*)
      val expanded = scala.collection.mutable.Set.empty[Long]
      var hops = 0
      var frontier = beam.map(_._1).filterNot(expanded)
      while (frontier.nonEmpty && hops < maxHops) {
        hops += 1
        expanded ++= frontier
        val fresh = nbrs(l, frontier)
          .filterNot { case (id, _) => visited(id) }
        fresh.foreach { case (id, _) => visited += id }
        beam = (beam ++ fresh).sortBy { case (id, s) => (-s, id) }.take(ef)
        frontier = beam.map(_._1).filterNot(expanded)
      }
    }
    beam.take(k).zipWithIndex
      .map { case ((id, s), i) => (i + 1, id, s) }
      .toDF("rnk", "id", "sim")
  }
}
