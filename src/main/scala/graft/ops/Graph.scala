package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph algorithms over document-relation edge lists — centrality as a
 * data-selection signal. Over a kNN similarity graph ([[Ann.knnGraph]])
 * PageRank surfaces the corpus's "representative" documents (high
 * in-rank = many documents consider it a near neighbour), the spine a
 * curation pass keeps when it can afford only a fraction of a cluster;
 * over a hyperlink graph it is the classic crawl-frontier prior.
 *
 * Determinism across engines and partitionings is the design center:
 * ranks are integer micro-units (rank × 1e6), per-edge contributions are
 * long divisions, and per-node accumulation is an exact integer sum —
 * order-independent, unlike double accumulation, so the DuckDB oracle
 * replays the iterations bit-for-bit.
 *
 * Scale shape (per iteration): one equi-join edges⋈ranks on `src` — the
 * big static edge frame is checkpointed once and keeps its partitioning;
 * only the |V|-sized rank frame moves — then one partial-agg-friendly
 * integer sum by `dst`. Each round `localCheckpoint`s eagerly so the
 * plan stays O(1) deep regardless of iteration count (the
 * [[Dedup.duplicateClusters]] discipline).
 */
object Graph {

  /** Damped PageRank by `iters` power iterations in micro-units
    * (init 1.0 per node = 1,000,000).
    *
    *   rank'(v) = (100-dampingPct)/100
    *            + dampingPct/100 · Σ_{u→v} floor(rank(u) / outdeg(u))
    *
    * with integer division at both spots — engine-reproducible. Nodes =
    * src ∪ dst of the edge list; mass through dangling nodes (in-edges
    * only) leaks, the classic simplified SQL formulation — ranks still
    * order centrality, they just don't sum to |V|. Returns
    * `(id, rank_micro)`. */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column,
      iters: Int = 3, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    // materialize the edge list FIRST: it may be the output of an
    // expensive upstream (a kNN graph build), and it is read three ways
    // below (out-degrees, node set, per-iteration join) — without this
    // checkpoint each of those re-runs the upstream plan
    val e = edges.select(srcCol.cast("long").as("src"),
      dstCol.cast("long").as("dst"))
      .localCheckpoint(eager = true)
    // static across iterations: the edge list with its source's out-degree
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(eager = true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(eager = true)
    val base = (100L - dampingPct) * 1000000L / 100L
    var ranks = nodes.select(col("id"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val sums = ew.join(ranks, ew("src") === ranks("id"))
        .select(col("dst"), expr("rank_micro div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select(nodes("id"),
          (lit(base) + expr(s"coalesce(s, cast(0 as bigint)) * $dampingPct div 100"))
            .as("rank_micro"))
        .localCheckpoint(eager = true)
    }
    ranks
  }
}
