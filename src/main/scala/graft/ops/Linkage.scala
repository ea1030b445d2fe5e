package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Record linkage — the entity-resolution half of the dedup family
 * (reference: VectorDB-Light deduplicates by content hash only;
 * structured-record linkage is the extension a warehouse-side pipeline
 * needs). Two classic pieces: sorted-neighborhood blocking (the
 * complement to [[Dedup.jaroWinklerJoin]]'s equi-blocking — catches
 * pairs whose block keys disagree but whose sort keys land close) and
 * Fellegi–Sunter match scoring over an agreement vector.
 */
object Linkage {

  /**
   * Sorted-neighborhood similarity join: records order globally by
   * `(sortKey, id)`, every pair within `window` positions is a
   * candidate, candidates score with Jaro–Winkler on `strCol` and pairs
   * at-or-above `minSim` survive. Returns
   * `(a_id, b_id, gap, sim)` with `a_id` the lower-index record and
   * `gap` the positional distance (1 = adjacent).
   *
   * The blocking trade vs an equi-block: a window of w guarantees every
   * pair within w−1 positions of the sort order is compared — typo'd
   * block keys that would split an equi-block usually still sort
   * adjacent — at a fixed candidate budget of n·(w−1) pairs (vs the
   * |block|²/2 blowup of hot equi-blocks).
   *
   * Scale shape: the global order is the range-partitioned dense rank
   * (one range sort + one explicit sizes job — no single-task sort, no
   * unpartitioned window), candidates are ONE integer equi-join on the
   * index after a ×(w−1) offset fan-out, and the JW kernel runs
   * row-local over the joined pairs. Candidate volume is exactly
   * n·(w−1) — independent of key skew.
   */
  def sortedNeighborhoodJoin(df: DataFrame, idCol: Column, sortKeyCol: Column,
      strCol: Column, window: Int, minSim: Double): DataFrame = {
    require(window >= 2, "sortedNeighborhoodJoin: window >= 2")
    require(minSim >= 0 && minSim <= 1, "sortedNeighborhoodJoin: minSim in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(idCol.cast("long").as("id"),
        sortKeyCol.cast("string").as("key"), strCol.cast("string").as("s"))
      .filter(col("id").isNotNull && col("key").isNotNull &&
        col("s").isNotNull)
    // read twice (both pair sides) — checkpoint so the rank job runs once
    val ordered = Suffix.withDenseRank(base,
        Seq(col("key"), col("id")), "idx")
      .localCheckpoint(true)
    val fanned = ordered.select(col("idx"), col("id").as("a_id"),
        col("s").as("sa"),
        explode(sequence(lit(1L), lit((window - 1).toLong))).as("gap"))
      .select((col("idx") + col("gap")).as("idx"), col("a_id"), col("sa"),
        col("gap"))
    fanned.join(ordered.select(col("idx"), col("id").as("b_id"),
        col("s").as("sb")), "idx")
      .select(col("a_id"), col("b_id"), col("gap"), col("sa"), col("sb"))
      .as[(Long, Long, Long, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (a, b, g, sa, sb) =>
          val sim = Dedup.jaroWinkler(sa, sb)
          if (sim >= minSim) Iterator((a, b, g, sim)) else Iterator.empty
        }
      }.toDF("a_id", "b_id", "gap", "sim")
  }

  /**
   * Fellegi–Sunter linkage scoring over candidate pairs: each agreement
   * is `(field, predicate, m, u)` — `m` = P(fields agree | true match),
   * `u` = P(fields agree | non-match), both in (0, 1) from the caller's
   * priors or an EM fit. A pair scores the sum of per-field log₂
   * likelihood ratios — `log₂(m/u)` when the predicate holds,
   * `log₂((1−m)/(1−u))` when it doesn't (null predicates read as
   * disagreement) — and classifies `match` / `non_match` / `review`
   * against the `upper`/`lower` thresholds (compared on the 4dp-rounded
   * score, so the decision is reproducible across engines).
   *
   * Output: the input columns plus `agree_<field>` flags, `score`
   * (4dp) and `decision`.
   *
   * Scale shape: the weights are driver-computed literals, so the whole
   * op is one row-local projection over the candidate frame — zero
   * shuffles; cost lives in whatever blocking produced the pairs
   * ([[sortedNeighborhoodJoin]], [[Dedup.jaroWinklerJoin]], or an
   * equi-blocked self-join).
   */
  def linkageScore(pairs: DataFrame,
      agreements: Seq[(String, Column, Double, Double)],
      upper: Double, lower: Double): DataFrame = {
    require(agreements.nonEmpty, "linkageScore: need at least one field")
    require(agreements.map(_._1).distinct.size == agreements.size,
      "linkageScore: field names must be distinct")
    require(upper >= lower, "linkageScore: upper >= lower")
    agreements.foreach { case (n, _, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1,
        s"linkageScore: m and u for '$n' must be in (0, 1)")
    }
    val flagged = pairs.select(pairs.columns.map(col) ++
      agreements.map { case (n, p, _, _) =>
        coalesce(p, lit(false)).as(s"agree_$n")
      }: _*)
    val terms = agreements.map { case (n, _, m, u) =>
      val wAgree = math.log(m / u) / math.log(2.0)
      val wDisagree = math.log((1 - m) / (1 - u)) / math.log(2.0)
      when(col(s"agree_$n"), lit(wAgree)).otherwise(lit(wDisagree))
    }
    flagged
      .withColumn("score", round(terms.reduce(_ + _), 4))
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "non_match")
          .otherwise("review"))
  }

  /** The per-field Fellegi–Sunter weights [[linkageScore]] uses, for
    * oracle replicas and reports: `(agree_weight, disagree_weight)` in
    * log₂ likelihood-ratio units. */
  def fsWeights(m: Double, u: Double): (Double, Double) =
    (math.log(m / u) / math.log(2.0),
      math.log((1 - m) / (1 - u)) / math.log(2.0))

  /** Survivorship merge — the GOLDEN-RECORD step that closes the
    * entity-resolution pipeline (block → score → cluster → MERGE):
    * per duplicate cluster, (1) the canonical record is the one
    * minimizing the caller's `rankCols` ordering (id appended as the
    * final tie-break, so the pick is total), and (2) each `voteCols`
    * field is fused by MAJORITY vote over the cluster's non-null
    * values, ties broken by the smallest value — the two classic
    * survivorship rules (most-complete/most-recent record wins;
    * most-frequent field value wins). Output one row per cluster:
    * `(cluster, n_records, canonical_id, <vote fields>)`.
    *
    * Scale shape: NO per-cluster window sort anywhere — the canonical
    * pick is one grouped `min(struct(rankCols…, id))` (an O(1)
    * aggregator however large the cluster: the argmin rides the
    * partial agg), and each vote field is one grouped count per
    * (cluster, value) followed by one `min(struct(−count, value))`
    * over the value frame. A million-record cluster costs the same
    * two shuffles as a pair. */
  def survivorshipMerge(records: DataFrame, clusterCol: Column,
      idCol: Column, rankCols: Seq[Column],
      voteCols: Seq[(String, Column)]): DataFrame = {
    require(voteCols.nonEmpty || rankCols.nonEmpty,
      "survivorshipMerge: nothing to merge — give rankCols and/or voteCols")
    val base = records.select(
        (clusterCol.cast("long").as("cluster") +:
          idCol.cast("long").as("rid") +:
          rankCols.zipWithIndex.map { case (c, i) => c.as(s"r$i") }) ++
          voteCols.map { case (n, c) => c.cast("string").as(s"v_$n") }: _*)
      // null or non-numeric cluster/record keys drop LOUDLY-documented
      // rather than coalescing into one null pseudo-cluster with a
      // null canonical_id (round-14 advisor — the sortedNeighborhood
      // null discipline): keys must cast to long; rows that do not are
      // not mergeable records.
      .filter(col("cluster").isNotNull && col("rid").isNotNull)
      .localCheckpoint(true) // read 1 + |voteCols| times
    val rankStruct = struct(
      rankCols.indices.map(i => col(s"r$i")) :+ col("rid"): _*)
    val canon = base.groupBy("cluster")
      .agg(count(lit(1)).as("n_records"),
        min(rankStruct).as("m"))
      .select(col("cluster"), col("n_records"),
        col("m.rid").as("canonical_id"))
    voteCols.foldLeft(canon) { case (acc, (name, _)) =>
      val votes = base.filter(col(s"v_$name").isNotNull)
        .groupBy(col("cluster"), col(s"v_$name").as("v"))
        .agg(count(lit(1)).as("c"))
        .groupBy("cluster")
        // min(struct(−count, value)): majority first, smallest value
        // on ties — one aggregator, no window
        .agg(min(struct((-col("c")).as("nc"), col("v"))).as("w"))
        .select(col("cluster"), col("w.v").as(name))
      acc.join(votes, Seq("cluster"), "left")
    }
  }
}
