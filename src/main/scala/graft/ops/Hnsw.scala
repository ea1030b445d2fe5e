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

  /** Per-query driver state of the batched descent: the ef-bounded
    * beam plus the layer-scoped visited/expanded sets. */
  private final class BeamState(var beam: Vector[(Long, Double)]) {
    val visited = scala.collection.mutable.Set.empty[Long]
    val expanded = scala.collection.mutable.Set.empty[Long]
  }

  /** Batched beam descent: ALL queries share every hop's adjacency job.
    * Returns, per query, the beam as it stood when leaving each layer
    * (index = layer) — layer 0 is the search result; the upper-layer
    * beams are exactly the per-layer candidate lists [[append]] links
    * new nodes with. Each hop is ONE Spark job: the union of the live
    * frontiers broadcast-joins the adjacency rows (never an
    * `isin(...)` literal list — at ef·M ids per query that IN-list
    * dwarfed the plan), candidates dedupe per (query, neighbor) before
    * the vector fetch, and on a src-bucketed store the bucket
    * predicate keeps the fetch directory-pruned. The driver holds only
    * the ef-bounded beams. */
  private def descend(edges: DataFrame, emb: DataFrame, idCol: Column,
      vecCol: Column, queries: Seq[(Long, Array[Float])], maxLevel: Int,
      ef: Int, maxHops: Int, srcBuckets: Int)
      : Map[Long, Array[Vector[(Long, Double)]]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(queries.map(_._1).distinct.size == queries.size,
      "descend: query ids must be distinct")
    if (queries.isEmpty) return Map.empty
    val v = emb.select(idCol.cast("long").as("id"),
      vecCol.cast("array<float>").as("v"))
    val e =
      if (srcBuckets > 0)
        edges.select(col("level"), col("id").as("src"), col("nbr"),
          col("src_bucket"))
      else edges.select(col("level"), col("id").as("src"), col("nbr"))
    val qdf = broadcast(
      queries.map { case (qid, qv) => (qid, qv.toSeq) }.toDF("qid", "qv"))

    // entry = highest-layer node, lowest id (its layer may hold no
    // edges, so derive from the vector table, not the edge frame);
    // ONE job scores the shared entry against every query vector
    val entryId = v.select(col("id"), levelCol(col("id"), maxLevel).as("lvl"))
      .orderBy(col("lvl").desc, col("id").asc).limit(1).head().getLong(0)
    val entrySims = v.filter(col("id") === entryId).join(qdf)
      .select(col("qid"),
        round(cosine_similarity(col("v"), col("qv")), 4).as("sim"))
      .as[(Long, Double)].collect().toMap

    val st = queries.map { case (qid, _) =>
      qid -> new BeamState(Vector((entryId, entrySims(qid)))) }.toMap
    val out = queries.map { case (qid, _) =>
      qid -> new Array[Vector[(Long, Double)]](maxLevel + 1) }.toMap
    def liveFrontier: Seq[(Long, Long)] =
      queries.flatMap { case (qid, _) =>
        val s = st(qid)
        s.beam.map(_._1).filterNot(s.expanded).map(qid -> _)
      }

    for (l <- maxLevel to 0 by -1) {
      st.values.foreach { s =>
        s.visited.clear(); s.visited ++= s.beam.map(_._1)
        s.expanded.clear()
      }
      var hops = 0
      var frontier = liveFrontier
      while (frontier.nonEmpty && hops < maxHops) {
        hops += 1
        frontier.foreach { case (qid, n) => st(qid).expanded += n }
        val f = frontier.toDF("qid", "src")
        val base = e.filter(col("level") === l)
        // floorMod, NOT %: the store's partition column is
        // pmod(id, buckets) ∈ [0, buckets), while Scala's % is negative
        // for the negative half of the hash-id space — a plain % filter
        // silently dropped every negative-id node's adjacency rows
        val pruned =
          if (srcBuckets > 0)
            base.filter(col("src_bucket").isin(
              frontier.map(p => math.floorMod(p._2, srcBuckets.toLong))
                .distinct: _*))
          else base
        val fresh = pruned.join(broadcast(f), "src")
          .select(col("qid"), col("nbr")).distinct()
          .join(v, col("nbr") === v("id"))
          .join(qdf, "qid")
          .select(col("qid"), col("nbr"),
            round(cosine_similarity(col("v"), col("qv")), 4).as("sim"))
          .as[(Long, Long, Double)].collect()
        fresh.groupBy(_._1).foreach { case (qid, rows) =>
          val s = st(qid)
          // distinctBy guards against duplicate id rows in the vector
          // table (e.g. a re-appended batch) poisoning the beam
          val novel = rows.collect {
            case (_, id, sim) if !s.visited(id) => (id, sim) }
            .distinctBy(_._1)
          novel.foreach { case (id, _) => s.visited += id }
          s.beam = (s.beam ++ novel)
            .sortBy { case (id, sc) => (-sc, id) }.take(ef)
        }
        frontier = liveFrontier
      }
      st.foreach { case (qid, s) => out(qid)(l) = s.beam }
    }
    out
  }

  /** Beam-descent search over a built graph. Entry point: the
    * highest-layer node (ties → lowest id). The `ef`-wide best-first
    * beam runs at EVERY layer, carried downward (the paper's ef=1
    * greedy descent assumes its diversity-pruned edges keep each layer
    * navigable; the symmetric-top-M edges here do not guarantee that,
    * and a beam over the sparse upper layers recovers the missed
    * long-range routing at negligible cost — upper layers are 4^l
    * smaller). Returns the top `k` as `(rnk, id, sim)`. Rounds, not
    * volume, are the cost — O(levels + hops) jobs; batch concurrent
    * queries through [[searchMany]] to share them. */
  def search(edges: DataFrame, emb: DataFrame, idCol: Column,
      vecCol: Column, query: Array[Float], k: Int, maxLevel: Int,
      ef: Int = 50, maxHops: Int = 50, srcBuckets: Int = 0): DataFrame =
    searchMany(edges, emb, idCol, vecCol, Seq(0L -> query), k, maxLevel,
      ef, maxHops, srcBuckets).select("rnk", "id", "sim")

  /** Multi-query [[search]]: N queries share each hop's adjacency job
    * (the `…TopKMany` discipline the other index paths follow), so the
    * job count stays O(levels + hops) REGARDLESS of the batch size.
    * Output: `(qid, rnk, id, sim)`, top `k` per query. */
  def searchMany(edges: DataFrame, emb: DataFrame, idCol: Column,
      vecCol: Column, queries: Seq[(Long, Array[Float])], k: Int,
      maxLevel: Int, ef: Int = 50, maxHops: Int = 50,
      srcBuckets: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val beams = descend(edges, emb, idCol, vecCol, queries, maxLevel, ef,
      maxHops, srcBuckets)
    queries.flatMap { case (qid, _) =>
      beams(qid)(0).take(k).zipWithIndex.map { case ((id, s), i) =>
        (qid, i + 1, id, s) }
    }.toDF("qid", "rnk", "id", "sim")
  }

  /** The deterministic driver-side twin of [[levelCol]]. */
  private def levelOf(id: Long, maxLevel: Int): Int = {
    val h = PortableHash.hex15(s"hnsw:$id")
    (1 to maxLevel).foldLeft(0) { (acc, l) =>
      if (h % math.pow(4, l).toLong == 0) l else acc }
  }

  private def cosRound(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val c = if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    math.rint(c * 10000) / 10000
  }

  /** Incremental batch insert — the paper's insertion algorithm,
    * batched: each new node takes its md5-ladder level, finds per-layer
    * candidates via ONE shared [[descend]] over the EXISTING graph
    * (ef = `efC`, the construction beam), links to its top-`m`, and the
    * reverse edges re-cap the touched existing nodes' lists at `m`;
    * rings re-extend per layer (an integer sort, no scoring). The
    * corpus is never re-scored — append cost is O(levels + hops)
    * shared descent jobs + an integer re-cap over the edge table, vs a
    * rebuild's layer-0 pair join. New-new links score driver-side
    * (the batch rides the driver as the descent's query set — this is
    * the MICRO-BATCH maintenance path; bulk loads take [[buildIvf]]).
    * `emb` = the graph's existing vectors (new ids in it are ignored);
    * an empty graph falls back to [[buildExact]] over the batch.
    * Output: the full updated `(level, id, rnk, nbr, sim)` frame. */
  def append(edges: DataFrame, emb: DataFrame, idCol: Column,
      vecCol: Column, newEmb: DataFrame, newIdCol: Column,
      newVecCol: Column, m: Int, maxLevel: Int, efC: Int = 50,
      maxHops: Int = 50, srcBuckets: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val newPts = newEmb.select(newIdCol.cast("long").as("id"),
        newVecCol.cast("array<float>").as("v"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, vv) => (id, vv.toArray) }
    val newIds = newPts.map(_._1).toSet
    val oldV = emb.select(idCol.cast("long").as("id"),
        vecCol.cast("array<float>").as("v"))
      .filter(!col("id").isInCollection(newIds.toSeq :+ -1L))
    if (newPts.isEmpty)
      return edges.select(col("level"), col("id"), col("rnk"), col("nbr"),
        col("sim"))
    if (oldV.isEmpty)
      return buildExact(newEmb, newIdCol, newVecCol, m, maxLevel)
    val lvls = newPts.map { case (id, _) => id -> levelOf(id, maxLevel) }.toMap
    val beams = descend(edges, oldV, col("id"), col("v"),
      newPts.toSeq, maxLevel, efC, maxHops, srcBuckets)
    // per new node and layer ≤ its level: candidates = that layer's
    // construction beam (existing layer members) + the batch's own
    // layer peers, top-m by (sim DESC, id ASC)
    val newDirected = for {
      (qid, qv) <- newPts.toSeq
      l <- 0 to lvls(qid)
      cands = (beams(qid)(l) ++ newPts.toSeq.collect {
        case (oid, ov) if oid != qid && lvls(oid) >= l =>
          (oid, cosRound(qv, ov)) })
        .groupBy(_._1).map { case (id, g) => (id, g.map(_._2).max) }.toSeq
      (nid, sim) <- cands.sortBy { case (id, s) => (-s, id) }.take(m)
    } yield (l, qid, nid, sim)
    val newDf = newDirected.toDF("level", "src", "nbr", "sim")
    // symmetrize into the standing lists and re-cap at m: only nodes a
    // reverse edge touches can change; everything shuffling here is
    // (level, src, nbr, sim) ints — no vectors, no re-scoring
    val sym = edges.filter(col("rnk") >= 1)
      .select(col("level"), col("id").as("src"), col("nbr"), col("sim"))
      .unionByName(newDf)
      .unionByName(newDf.select(col("level"), col("nbr").as("src"),
        col("src").as("nbr"), col("sim")))
      .groupBy("level", "src", "nbr").agg(max("sim").as("sim"))
    val topM = TopK.perGroup(sym, Seq(col("level"), col("src")),
        col("nbr"), col("sim"), m)
      .select(col("level"), col("src").as("id"), col("rnk"),
        col("id").as("nbr"), col("sim"))
    val allV = oldV.unionByName(
        newPts.toSeq.map { case (id, vv) => (id, vv.toSeq) }.toDF("id", "v"))
      .withColumn("lvl", levelCol(col("id"), maxLevel))
    (0 to maxLevel).map { l =>
      val nodes = allV.filter(col("lvl") >= l).select("id", "v")
      val tm = topM.filter(col("level") === l)
        .select(col("id"), col("rnk"), col("nbr"), col("sim"))
      tm.unionByName(ringEdges(nodes, tm))
        .select(lit(l).as("level"), col("id"), col("rnk"), col("nbr"),
          col("sim"))
    }.reduce(_.unionByName(_))
  }
}
