package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale mechanics (builder contract: salting for skew, bucketing for
 * co-located joins). These change physical behavior only — results are
 * bit-identical to the naive formulations, which is exactly what the
 * verification queries pin.
 */
// Serializable: the Misra–Gries kernel below is called from inside a
// flatMapGroupsWithState function, whose closure (unlike RDD closures)
// is serialized without ClosureCleaner nulling module back-references.
object Scale extends Serializable {

  /**
   * Two-stage salted aggregation for skew-prone keys: stage 1 aggregates
   * `(key, salt)` partials — a hot key fans out over `saltBuckets` reducers —
   * stage 2 merges partials per key. Supported merges cover the decomposable
   * aggregates (`count/sum/min/max`); results equal the plain `groupBy`.
   *
   * At local scale Spark's map-side partial aggregation already absorbs
   * skew for these aggregates; the salt matters when the aggregation
   * carries high-cardinality state per key (collect/distinct sketches) or
   * when AQE skew handling is unavailable mid-pipeline.
   */
  /** Range (interval-containment) join without the BroadcastNestedLoop
    * trap: a naive `probe.value BETWEEN ranges.lo AND ranges.hi` join has
    * no equi-key, so Spark falls back to nested-loop — O(probe × ranges)
    * comparisons. Binning restores an equi-join: each RANGE row explodes
    * to the `binWidth` bins it covers (ranges are the small side — a few
    * bins each), the PROBE side computes its single bin row-locally, the
    * join is hash equi on `bin`, and the exact BETWEEN predicate runs as
    * a post-join residual filter. A probe row has exactly one bin, so no
    * pair can match twice — no dedup pass. Inclusive on both ends.
    * Returns the probe columns + `range_id` + `v` (the probe value as
    * double). Pick `binWidth` near the typical range span: too small
    * explodes the ranges table, too large degrades the residual filter's
    * selectivity, never correctness. */
  def binnedRangeJoin(probe: DataFrame, valueCol: Column, ranges: DataFrame,
      idCol: Column, loCol: Column, hiCol: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val rb = ranges.select(idCol.as("range_id"),
        loCol.cast("double").as("lo"), hiCol.cast("double").as("hi"))
      .withColumn("bin", explode(sequence(
        floor(col("lo") / binWidth).cast("long"),
        floor(col("hi") / binWidth).cast("long"))))
    probe.withColumn("v", valueCol.cast("double"))
      .withColumn("bin", floor(col("v") / binWidth).cast("long"))
      .join(rb, Seq("bin"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .drop("bin", "lo", "hi")
  }

  def saltedAggregate(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 16): DataFrame = {
    // salt from the row's own values, not monotonically_increasing_id:
    // results are salt-invariant either way, but a content-derived salt is
    // reproducible across runs/partitionings (id-based salts depend on the
    // physical row layout)
    df.select(key.as("k"), value.as("v"),
        pmod(xxhash64(key, value), lit(saltBuckets.toLong)).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(count("*").as("pn"), sum("v").as("ps"),
        min("v").as("pmn"), max("v").as("pmx"))
      .groupBy(col("k"))
      .agg(sum("pn").as("n"), sum("ps").as("s"),
        min("pmn").as("mn"), max("pmx").as("mx"))
  }

  /**
   * Global 1-based rank in `sort` order WITHOUT a single-partition window:
   * range-partition by the sort keys, rank locally per partition (the
   * window partitions by `spark_partition_id`, so every partition ranks in
   * parallel), then add broadcast per-partition offsets. Output equals
   * `row_number() OVER (ORDER BY sort)` for unique sort keys — equal keys
   * land in one range partition, so ties never straddle an offset
   * boundary. The input lineage runs twice (offset pass + rank pass), both
   * deterministic.
   *
   * The ranged frame is MATERIALIZED once (eager localCheckpoint) and
   * the partition count pinned explicitly — the round-13 sf0.1 sweep
   * finding: the join key between the two branches is the PHYSICAL
   * partition id of a range exchange, and each branch is a separate
   * exchange instance whose range bounds come from its own sampling
   * job over its own read of the input, while AQE may additionally
   * coalesce each consumer's read independently. Any cross-execution
   * disagreement corrupts the rank silently — q299 at sf0.1 first
   * LOST 57 % of its rows (coalesce divergence), then with the count
   * pinned still produced 56 duplicate ranks (bound divergence). A row
   * carrying `spark_partition_id()` is only meaningful within ONE
   * materialized layout, so the checkpoint (MEMORY_AND_DISK, spills;
   * at true corpus scale substitute a persisted write) is what makes
   * both branches read the same physical rows by construction.
   */
  def withGlobalIndex(df: DataFrame, sort: Seq[Column],
      out: String = "gidx"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(nPart, sort: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = parted.withColumn("_lrank",
      row_number().over(Window.partitionBy("_pid").orderBy(sort: _*)))
    // per-partition offsets derived IN-PLAN: the cumulative window runs
    // over #partitions rows (bounded, like rrfFuse's candidate lists), so
    // the whole operator stays one lazy snapshot-consistent plan — no
    // driver collect whose offsets could go stale against a re-executed
    // rank pass. The ranked lineage feeds both branches.
    val offs = local.groupBy("_pid").agg(count("*").as("_n"))
      .withColumn("_off", coalesce(sum("_n").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_pid", "_off")
    local.join(broadcast(offs), "_pid")
      .withColumn(out, col("_off") + col("_lrank"))
      .drop("_pid", "_lrank", "_off")
  }

  /**
   * Z-order (Morton) interleave of two small non-negative integer columns
   * (each using the low `bits` bits): rows close in BOTH dimensions get
   * close keys, so sorting files by the key makes parquet min/max stats
   * prune on EITHER predicate — the standard multi-column layout trick a
   * single-column sort can't give. Pure bit arithmetic (codegen'd, and
   * reproducible in any engine for the oracle).
   */
  def zOrderKey(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { b =>
      (shiftright(x.cast("bigint"), b).bitwiseAND(1L) * (1L << (2 * b))) +
        (shiftright(y.cast("bigint"), b).bitwiseAND(1L) * (1L << (2 * b + 1)))
    }.reduce(_ + _)

  /** Write parquet z-ordered on two dimension columns: range-partition +
    * sort by the interleaved key so row-group stats stay tight on both. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      bits: Int = 8): Unit =
    df.withColumn("_z", zOrderKey(x, y, bits))
      .repartitionByRange(col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Write a DataFrame as a bucketed+sorted managed table: joins and
    * aggregations on the bucket columns then run shuffle-free (bucket
    * pruning + co-located join). The 100 TB answer to "this join shuffles
    * both sides every night". */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      cols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planned without a
    * shuffle exchange when bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      on: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), on)

  /**
   * Heavy-hitter terms via a MERGEABLE Misra-Gries sketch: each partition
   * keeps at most `capacity` counters over its token stream, summaries
   * merge associatively, and the driver reads the top `topN` —
   * `(term, c)` ordered by count desc, term asc. The bounded-memory
   * companion to the exact explode-and-count top-terms query (the same
   * relationship q65's `approx_percentile` has to q63's exact
   * `percentile`): the exact path shuffles one row per token OCCURRENCE
   * group; the sketch moves `capacity` counters per partition, full stop.
   *
   * Guarantees (Misra-Gries): every term with true count > N/`capacity`
   * is present (N = total token occurrences), and reported counts
   * undercount by at most N/`capacity`. With `capacity` ≥ the distinct
   * term count no decrement ever fires, so the sketch is EXACT and
   * merge-order-independent — the oracle-verified regime; below that the
   * counts are approximate and may vary with partitioning (the
   * documented trade, like any mergeable sketch).
   */
  /**
   * Count-min sketch estimates over the corpus token stream: a
   * `depth × width` integer counter matrix, buckets drawn from the
   * engine-portable md5 Kirsch–Mitzenmacher family
   * ([[graft.expr.PortableHash]]: `h1 + r·h2`, the MinHash pair), so the
   * DuckDB oracle reconstructs the SAME matrix cell-for-cell in SQL —
   * the sketch is deterministic, not just probabilistically close.
   *
   * Mergeable: per-partition matrices add elementwise (exact integer
   * sums ⇒ partition-order-invariant), then `treeAggregate` folds them —
   * `depth·width` longs move per partition, never a token. Estimates are
   * `min` over rows; always ≥ the true count, within `N·e/width` of it
   * with probability `1 − e^−depth` (Cormode & Muthukrishnan 2005). The
   * Misra-Gries sketch above answers "what is frequent?"; this one
   * answers point queries — "how often does THIS term occur?" — for any
   * probe set fixed after the single pass.
   */
  /** Partition-skew diagnostic for a prospective shuffle/join key: ONE
    * row `(n_rows, n_keys, max_count, p50_count, p99_count, avg_count,
    * skew_ratio, top_keys)` — `skew_ratio` = max/avg (the straggler
    * multiplier a hash shuffle on this key would suffer) and
    * `top_keys` the `topN` hottest keys as `key:count` strings, the
    * candidates for salting ([[saltedAggregate]]) or broadcast
    * special-casing. The pre-flight check before keying 100 TB on a
    * column: a skew_ratio of 500 means one reducer gets 500× the
    * average partition.
    *
    * Plan: one grouped count by key (partial-agg'd — the only pass over
    * the data), then exact percentiles + a bounded top-N sort over the
    * |keys|-sized count table. */
  def skewReport(df: DataFrame, keyCol: Column, topN: Int = 5): DataFrame = {
    require(topN >= 1, "skewReport: topN >= 1")
    val counts = df.select(keyCol.cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // read twice: moments + top-N
    val top = counts.orderBy(col("c").desc, col("k").asc).limit(topN)
      .agg(collect_list(concat_ws(":", col("k"), col("c"))).as("top_keys"))
    counts.agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
        max("c").as("max_count"),
        expr("percentile(c, 0.5d)").as("__p50"),
        expr("percentile(c, 0.99d)").as("__p99"))
      .crossJoin(broadcast(top))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        round(col("__p50"), 4).as("p50_count"),
        round(col("__p99"), 4).as("p99_count"),
        round(col("n_rows") / col("n_keys").cast("double"), 4)
          .as("avg_count"),
        round(col("max_count") /
          (col("n_rows") / col("n_keys").cast("double")), 4)
          .as("skew_ratio"),
        col("top_keys"))
  }

  /** K-minimum-values distinct sketch per group — the MERGEABLE
    * distinct estimator whose state is k hash values (union sketches by
    * keeping the k smallest of the merged set; shard, then merge —
    * unlike exact distinct, the sync cost is fixed at k longs). The
    * estimator: with h = md5-derived 60-bit hashes mapped onto [0, 2⁶⁰),
    * the kth smallest of D distinct values sits near k/D of the range,
    * so `est = (k−1)·2⁶⁰ / h₍ₖ₎`; groups with fewer than k distinct
    * hashes report the exact count. md5 determinism makes even the
    * ESTIMATE engine-exact (the HLL sketches in [[graft.ops.Dedup]] are
    * engine-internal and only tolerance-checkable).
    * Output: `(…groups, n_kept, est_distinct)` (4dp).
    *
    * Plan: one distinct over (group, hash) — the only corpus-sized
    * exchange, partial-agg'd — then a per-group window keeps the k
    * smallest. Batch cost matches exact distinct (the win is the
    * fixed-size mergeable state, not this pass); k bounds the output
    * per group. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, "kmvDistinct: k >= 2")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val hashes = df.select(gs :+
        graft.expr.PortableHash.hex15Col(valCol).as("__h"): _*)
      .distinct()
    val w = Window.partitionBy(gs: _*).orderBy(col("__h").asc)
    val range = 1152921504606846976.0 // 2^60
    hashes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__kth"))
      .select(gs ++ Seq(col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1) * range) / col("__kth").cast("double")), 4)
          .as("est_distinct")): _*)
  }

  /** KMV set ALGEBRA between every pair of groups — the reason KMV
    * beats HLL when you need more than cardinalities: two k-minimum
    * sketches union by keeping the k smallest of their merged hashes,
    * and the fraction of that union sketch present in BOTH inputs is
    * an unbiased Jaccard estimate (Beyer et al., SIGMOD'07), so
    * `|A∩B| ≈ J · |A∪B|` falls out of the same k longs. Per group
    * pair (a < b): `(…, union_est, jaccard_est, intersect_est)` (4dp);
    * pairs whose merged sketch holds fewer than k distinct hashes are
    * EXACT (and the md5 hashing makes even the estimates
    * engine-reproducible, the [[kmvDistinct]] stance).
    *
    * Plan: one distinct over (group, hash) — the only corpus pass,
    * shared with [[kmvDistinct]] — then a per-group window keeps k
    * hashes; everything pairwise runs on the k·|groups| sketch table
    * (group pairs × k rows, never corpus rows). */
  def kmvSetOps(df: DataFrame, groupCol: Column, valCol: Column,
      k: Int): DataFrame = {
    require(k >= 2, "kmvSetOps: k >= 2")
    import org.apache.spark.sql.expressions.Window
    val hashes = df.select(groupCol.cast("string").as("g"),
        graft.expr.PortableHash.hex15Col(valCol).as("__h"))
      .distinct()
    val perG = Window.partitionBy("g").orderBy(col("__h").asc)
    val sk = hashes.withColumn("__rn", row_number().over(perG))
      .filter(col("__rn") <= k)
      .select(col("g"), col("__h"))
      .localCheckpoint(eager = true) // read 3×: group list + both sides
    val groups = sk.select(col("g")).distinct()
    // |groups| is bounded (it keys the sketches): broadcast the pair
    // expansion so the `<` condition never plans a cartesian
    val pairs = groups.select(col("g").as("ga"))
      .join(broadcast(groups.select(col("g").as("gb"))),
        col("ga") < col("gb"))
    val merged = pairs.join(sk, col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("__h"),
        lit(1L).as("ia"), lit(0L).as("ib"))
      .unionAll(pairs.join(sk, col("g") === col("gb"))
        .select(col("ga"), col("gb"), col("__h"),
          lit(0L).as("ia"), lit(1L).as("ib")))
      .groupBy("ga", "gb", "__h")
      .agg(max("ia").as("ia"), max("ib").as("ib"))
    val perP = Window.partitionBy("ga", "gb").orderBy(col("__h").asc)
    val range = 1152921504606846976.0 // 2^60
    merged.withColumn("__rn", row_number().over(perP))
      .filter(col("__rn") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("__nk"), max(col("__h")).as("__kth"),
        sum(col("ia") * col("ib")).as("__both"))
      .select(col("ga").as("src_a"), col("gb").as("src_b"),
        round(when(col("__nk") < k, col("__nk").cast("double"))
          .otherwise(lit((k - 1) * range) / col("__kth").cast("double")), 4)
          .as("union_est"),
        round(col("__both") / col("__nk").cast("double"), 4)
          .as("jaccard_est"),
        round((col("__both") / col("__nk").cast("double")) *
          when(col("__nk") < k, col("__nk").cast("double"))
            .otherwise(lit((k - 1) * range) / col("__kth").cast("double")),
          4).as("intersect_est"))
  }

  def countMinEstimates(df: DataFrame, textCol: Column, width: Int,
      depth: Int, probes: Seq[String]): DataFrame = {
    require(width >= 1, "width must be >= 1")
    require(depth >= 1 && depth <= 64, "depth in [1, 64] (K-M exactness bound)")
    require(probes.nonEmpty, "need at least one probe term")
    val spark = df.sparkSession
    import spark.implicits._
    val (w0, d0) = (width, depth)
    def buckets(t: String): Array[Int] = {
      val h15 = graft.expr.PortableHash.hex15(t)
      val h1 = graft.expr.PortableHash.minhashH1(h15)
      val h2 = graft.expr.PortableHash.minhashH2(h15)
      Array.tabulate(d0)(r => ((h1 + r * h2) % w0).toInt)
    }
    val matrix = df.select(textCol.cast("string").as("t")).as[String].rdd
      .mapPartitions { it =>
        val m = Array.fill(d0 * w0)(0L)
        // vocab-bounded bucket memo: one md5 per distinct term, not per
        // occurrence
        val memo = scala.collection.mutable.HashMap.empty[String, Array[Int]]
        it.foreach { t =>
          if (t != null)
            Dedup.trimSpaces(t).split("\\s+").iterator
              .filter(_.nonEmpty).foreach { tok =>
                val bs = memo.getOrElseUpdate(tok, buckets(tok))
                var r = 0
                while (r < d0) { m(r * w0 + bs(r)) += 1L; r += 1 }
              }
        }
        Iterator.single(m)
      }
      .treeAggregate(Array.fill(d0 * w0)(0L))(
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    probes.map { t =>
      val bs = buckets(t)
      (t, (0 until d0).map(r => matrix(r * w0 + bs(r))).min)
    }.toDF("term", "est")
  }

  /** The Misra–Gries insert step at `capacity` counters — the ONE
    * kernel shared by the batch sketch below and
    * [[graft.streaming.StreamingOps.streamingHeavyHitters]]'s per-shard
    * state, so their estimates can never drift: increment a tracked
    * term, open a counter if a slot is free, else the decrement-all
    * step (every counter pays one; zeros evict). */
  private[graft] def misraGriesAdd(
      m: scala.collection.mutable.HashMap[String, Long], w: String,
      capacity: Int): Unit =
    if (m.contains(w)) m(w) += 1L
    else if (m.size < capacity) m(w) = 1L
    else {
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      m.keysIterator.foreach { k =>
        val v = m(k) - 1L
        if (v <= 0L) dead += k else m(k) = v
      }
      dead.foreach(m.remove)
    }

  def heavyHittersSketch(df: DataFrame, textCol: Column, capacity: Int,
      topN: Int): DataFrame = {
    require(capacity >= 1 && topN >= 1, "need capacity >= 1 and topN >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    def mgAdd(m: scala.collection.mutable.HashMap[String, Long], w: String): Unit =
      misraGriesAdd(m, w, capacity)
    def mgMerge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = scala.collection.mutable.HashMap.empty[String, Long]
      a.foreach { case (k, v) => sum(k) = sum.getOrElse(k, 0L) + v }
      b.foreach { case (k, v) => sum(k) = sum.getOrElse(k, 0L) + v }
      if (sum.size <= capacity) sum.toMap
      else { // subtract the (capacity+1)-th largest count; <= cap survive
        val d = sum.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        sum.iterator.map { case (k, v) => k -> (v - d) }
          .filter(_._2 > 0L).toMap
      }
    }
    val merged = df.select(textCol.cast("string").as("t")).as[String].rdd
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (t != null)
            Dedup.trimSpaces(t).split("\\s+").iterator
              .filter(_.nonEmpty).foreach(mgAdd(m, _))
        }
        Iterator.single(m.toMap)
      }
      .treeAggregate(Map.empty[String, Long])(mgMerge, mgMerge)
    merged.toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(topN)
      .toDF("term", "c")
  }

  /** AMS second-moment (F₂) sketch — the one-pass estimate of
    * `Σ_x f_x²` over a key column (Alon, Matias & Szegedy 1996), which
    * IS the self-join size on that key: the number a query planner
    * needs BEFORE running a join to know whether the key is
    * broadcast-safe, salt-worthy, or a blow-up (`Σ f_x²` rows come out
    * of an equi-self-join; per-key pair dedup costs the same order).
    * Each of `k` estimators draws a ±1 sign per key value from the
    * md5-portable hash ([[graft.expr.PortableHash]] — parity of the
    * 60-bit prefix of `md5(lpad(j, 2, '0') || ':' || key)`; j is
    * zero-padded so the seed is injective across (j, key) — a bare
    * concat would alias j=12/key="x" with j=1/key="2:x" and correlate
    * estimators on digit-colon-prefixed keys), keeps the running sign
    * sum `Z_j = Σ_rows sign_j(key)`, and estimates `F₂ ≈ Z_j²`;
    * averaging the k estimators bounds the variance (≤ 2F₂²/k). The
    * md5 draw makes the whole sketch REPLAYABLE: same rows → same
    * signs → same estimate in any engine, so the oracle recomputes it
    * exactly rather than tolerance-checking. Output ONE row
    * `(n_rows, k, f2_sum)` — `f2_sum = Σ_j Z_j²` in decimal(38,0):
    * the SUM ships instead of the mean so the output stays
    * integer-exact (|Z_j| ≤ n_rows puts Z² past Long at n ≈ 3·10⁹ —
    * the 100-TB regime — and a cross-engine float mean would haze the
    * hash); the estimate is `f2_sum/k`, and callers whose corpus stays
    * inside Long may cast (the
    * [[graft.ops.Graph.modularityNumerator]] convention).
    *
    * Scale shape: one projection exploding each row into k (j, sign)
    * pairs (k ≤ 64 — a constant fan-out, not a shuffle blow-up), one
    * k-row grouped sum, one 1-row mean — partial-agg friendly
    * end-to-end; the only full-width pass is the scan itself. The
    * sketch is mergeable by construction (sign sums add across
    * shards/batches), which is what the streaming twin exploits. */
  def amsF2(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"amsF2: k must be in [1, 64], got $k")
    val signs = df.select(keyCol.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .select(explode(sequence(lit(1), lit(k))).as("j"), col("key"))
      .select(col("j"),
        // j zero-padded to 2 digits (k <= 64): a bare concat is not
        // injective across (j, key) — j=12/key="x" and j=1/key="2:x"
        // would share sign draws, correlating estimators and weakening
        // the 2F₂²/k variance bound (advisor, round 13)
        when(graft.expr.PortableHash.hex15Col(
          concat(lpad(col("j").cast("string"), 2, "0"), lit(":"),
            col("key"))) % 2 === 0, 1L)
          .otherwise(-1L).as("sgn"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    signs.groupBy("j")
      .agg(sum("sgn").as("z"), count(lit(1)).as("n"))
      .agg((sum("n") / k).cast("long").as("n_rows"),
        lit(k).cast("long").as("k"),
        sum(col("z").cast(dec) * col("z").cast(dec)).cast(dec)
          .as("f2_sum"))
  }
}
