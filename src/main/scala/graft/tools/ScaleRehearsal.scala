package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Suffix}

/**
 * Empirical scaling rehearsal for the heaviest operator families (the
 * round-6 verdict's ask: the 100 TB scale arguments are documented —
 * measure them). Builds an N× corpus from `documents.parquet` by token-
 * renamed replication: replica `r` suffixes every token with `§r`, so each
 * replica is an ISOMORPHIC copy of the base corpus under a token renaming —
 * duplicate structure (frequent lines, repeated grams, suffix repeats)
 * scales exactly linearly with NO cross-replica matches, per-doc sizes
 * stay constant, and the measured exponent isolates the operator, not a
 * drifting data profile. (Naive replication would be wrong: every doc
 * would gain N−1 exact twins and the duplicate mass would explode
 * superlinearly.)
 *
 * Prints one JSON line per (family, scale) and a markdown table with the
 * fitted exponent `log(t_N / t_1) / log(N)` — near-0 means job-cadence-
 * bound at local scale (the suffix machinery's flat-round-count claim),
 * near-1 means throughput-bound linear (the span/line dedup claim), and
 * anything clearly above 1 is a scale smell worth a plan audit.
 *
 * Usage: `runMain graft.tools.ScaleRehearsal [sfDir] [scales] [reps]`
 * (defaults `/root/testdata/sf0.1`, `1,10`, 2; best-of-reps per cell to
 * shed host noise).
 */
object ScaleRehearsal {

  private def wrapped4(docs: DataFrame, sep: String = "\n"): DataFrame = {
    val toks = array_remove(split(col("text"), "\\s+"), "")
    docs.select(col("doc_id"),
      when(size(toks) === 0, lit("")).otherwise(
        array_join(transform(
          sequence(lit(0), ceil(size(toks) / lit(4.0)).cast("int") - 1),
          i => concat_ws(" ", slice(toks, i * 4 + 1, lit(4)))), sep))
        .as("wtext"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,10").split(",").map(_.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val only = args.lift(3).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val work = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_DIR",
      "/tmp/graft_scale_rehearsal")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    // materialize each scaled corpus once; ids offset by 10M per replica
    // (10M % 5 == 0 keeps the suffix family's bounded %5 sub-corpus at a
    // constant fraction across scales)
    def corpusPath(n: Int) = s"$work/x$n/documents.parquet"
    for (n <- scales) {
      val path = corpusPath(n)
      if (!new java.io.File(path).exists()) {
        val replicas = (0 until n).map { r =>
          if (r == 0) base
          else base.select(
            (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
            array_join(transform(array_remove(split(col("text"), "\\s+"), ""),
              t => concat(t, lit("§" + r))), " ").as("text"))
        }
        replicas.reduce(_ unionByName _)
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(path)
      }
    }

    // scaled EVENTS corpus for the temporal families: replica r offsets
    // user_id by 10M (keys scale, per-key history constant) AND shifts
    // ts by r × 700 h (past the base span, so interval-join pair counts
    // scale ×N, not ×N² — time-overlapping replication would manufacture
    // a super-linear data property and measure the wrong thing)
    val baseEv = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      val tsCol = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("timestamp_micros(ts div 1000)")
        case _ => col("ts").cast("timestamp")
      }
      raw.withColumn("ts", tsCol)
        .select("event_id", "ts", "user_id", "event_type", "value")
    }
    def eventsPath(n: Int) = s"$work/ev$n/events.parquet"
    for (n <- scales) {
      val path = eventsPath(n)
      if (!new java.io.File(path).exists()) {
        (0 until n).map { r =>
          baseEv.select(
            (col("event_id") + lit(r * 10000000L)).as("event_id"),
            (col("ts") + expr(s"INTERVAL ${r * 700} HOURS")).as("ts"),
            (col("user_id") + lit(r * 10000000L)).as("user_id"),
            col("event_type"), col("value"))
        }.reduce(_ unionByName _)
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(path)
      }
    }

    // scaled co-purchase EDGE corpus for the iterative graph families:
    // replica r offsets BOTH part and order ids by 10M, so each replica
    // is a disconnected isomorphic copy — peel rounds / BFS diameter /
    // HITS spectra stay constant while edge volume scales ×N, which is
    // exactly the per-round-throughput question. The pair expansion is
    // paid once at corpus build, not inside the measured family.
    def edgesPath(n: Int) = s"$work/g$n/edges.parquet"
    val baseLi = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    for (n <- scales) {
      val path = edgesPath(n)
      if (!new java.io.File(path).exists()) {
        val li = (0 until n).map { r =>
          baseLi.select((col("o") + lit(r * 10000000L)).as("o"),
            (col("p") + lit(r * 10000000L)).as("p"))
        }.reduce(_ unionByName _)
        li.as("x").join(li.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b"))
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(path)
      }
    }

    val graphFamilies: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q298_kcore" -> (e =>
        graft.ops.Graph.kCore(e, col("a"), col("b"), k = 12)),
      "q303_bfs" -> { e =>
        val seeds = e.select(col("a").as("id"))
          .unionAll(e.select(col("b").as("id")))
          .distinct().filter(col("id") % 997 === 0)
        graft.ops.Graph.bfsDistances(e, col("a"), col("b"), seeds,
          col("id"), maxDepth = 6)
      },
      "q304_hits" -> (e =>
        graft.ops.Graph.hits(e, col("a"), col("b"), iters = 3)),
      // round-10 wave-8 heavies: support peeling (triangle rounds) and
      // bounded Bellman-Ford relaxation — per-replica structure is
      // constant, so rounds-to-fixpoint stays flat while edge volume
      // scales ×N
      "q324_ktruss" -> (e =>
        graft.ops.Graph.kTruss(e, col("a"), col("b"), k = 4)),
      "q325_sssp" -> { e =>
        val dir = e.select(col("a").as("s"), col("b").as("t"))
          .unionAll(e.select(col("b").as("s"), col("a").as("t")))
          .withColumn("w", (col("s") % 20 + 1).cast("double"))
        val seeds = e.select(col("a").as("id"))
          .unionAll(e.select(col("b").as("id")))
          .distinct().filter(col("id") % 997 === 0)
        graft.ops.Graph.ssspBellmanFord(dir, col("s"), col("t"),
          col("w"), seeds, col("id"), rounds = 6)
      },
      // round-11: pivot-sampled Brandes. The pivot BUDGET is fixed (2 —
      // a sample size, independent of graph size by design), so the
      // measured question is the right one: the cost of one bounded-
      // depth Brandes pass whose frontier joins shuffle the ×N edge
      // table each round.
      "q344_betweenness" -> { e =>
        val cand = e.select(col("a").as("id"))
          .unionAll(e.select(col("b").as("id")))
          .distinct().filter(col("id") % 997 === 0)
        graft.ops.Graph.betweennessApprox(e, col("a"), col("b"), cand,
          col("id"), maxPivots = 2, maxDepth = 4)
      },
      // round-11: deterministic Louvain — replica isomorphism keeps the
      // move trajectory identical per copy, so rounds measure pure
      // per-round throughput (mass sum + vote count + argmax window)
      "q361_louvain" -> (e =>
        graft.ops.Graph.louvainOneLevel(e, col("a"), col("b"),
          rounds = 3)),
      // round-12: weighted k-core — pair multiplicity (kept by the
      // corpus build: the per-order pair expansion is NOT deduped)
      // becomes the edge weight; per-replica isomorphism keeps the
      // peel fixpoint flat while weighted edge volume scales ×N
      "q365_kcore_weighted" -> { e =>
        val w = e.groupBy("a", "b").agg(count(lit(1)).as("w"))
        graft.ops.Graph.kCoreWeighted(w, col("a"), col("b"), col("w"),
          k = 20)
      },
      // round-12: the full three-level Louvain pipeline + the final
      // modularity evaluation — the deepest iterative plan in the
      // library (9 rounds + 2 contractions + 1 eval), i.e. exactly the
      // shape the stats-reset checkpoints exist for
      "q364_louvain_levels" -> { e =>
        val g = graft.ops.Graph
        val simple = e.select(least(col("a"), col("b")).as("a"),
            greatest(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
          .localCheckpoint(true)
        val l1 = g.louvainOneLevel(simple, col("a"), col("b"),
            rounds = 3)
          .localCheckpoint(true)
        val c1e = g.louvainContract(simple, col("a"), col("b"), l1,
            col("id"), col("community"))
          .localCheckpoint(true)
        val l2 = g.louvainOneLevelWeighted(c1e, col("a"), col("b"),
            col("w"), rounds = 3)
          .localCheckpoint(true)
        val c2e = g.louvainContractWeighted(c1e, col("a"), col("b"),
          col("w"), l2, col("id"), col("community"))
        val l3 = g.louvainOneLevelWeighted(c2e, col("a"), col("b"),
          col("w"), rounds = 3)
        val full3 = l1.select(col("id"), col("community").as("c1"))
          .join(l2.select(col("id").as("c1"),
            col("community").as("c2")), "c1")
          .join(l3.select(col("id").as("c2"),
            col("community").as("cm")), "c2")
          .select(col("id"), col("cm"))
        g.modularityNumerator(simple, col("a"), col("b"), full3,
          col("id"), col("cm"))
      },
      // round-13: Leiden-style connectivity refinement on top of
      // level-1 Louvain — intra-community edges (two assignment
      // equi-joins) + the duplicateClusters min-label/path-halving
      // loop; replica isomorphism keeps per-community components and
      // CC rounds flat while intra-edge volume scales ×N (the q361
      // family's cost is the shared level-1 baseline inside this one)
      "q370_refine" -> { e =>
        val g = graft.ops.Graph
        val simple = e.select(least(col("a"), col("b")).as("a"),
            greatest(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
          .localCheckpoint(true)
        val l1 = g.louvainOneLevel(simple, col("a"), col("b"),
            rounds = 3)
          .localCheckpoint(true)
        g.refineConnectivity(simple, col("a"), col("b"), l1,
          col("id"), col("community"))
      },
      // round-13 third wave: h-index core decomposition — per round
      // one |V|-frame join against the static adjacency + a per-NODE
      // window (fan-in = degree); replica isomorphism keeps the
      // h-index fixpoint flat while adjacency volume scales ×N
      "q375_core_number" -> (e =>
        graft.ops.Graph.coreNumbers(e, col("a"), col("b"),
          rounds = 8)),
      // round-14: the DIRECTED family (round-13 verdict ask #4).
      // q387 shape — max-relaxation over a LAYERED DAG: keep pairs
      // whose endpoints sit in different mod-8 layers, direct
      // low→high, so depth ≤ 7 BY CONSTRUCTION and rounds = 8 always
      // certifies convergence; the 10M replica offset is ≡ 0 mod 8,
      // so replicas stay isomorphic (depth flat, edge volume ×N)
      "q387_topo_layers" -> { e =>
        val la = col("a") % 8
        val lb = col("b") % 8
        val dag = e.filter(la =!= lb)
          .select(when(la < lb, col("a")).otherwise(col("b")).as("s"),
            when(la < lb, col("b")).otherwise(col("a")).as("t"))
        graft.ops.Graph.topoLayers(dag, col("s"), col("t"), rounds = 8)
      },
      // q388 shape — FW-BW min-label SCC with trimming on the
      // parity-directed co-purchase digraph (a→b when a+b even, else
      // b→a; the 10M offset is even, so the direction rule — and with
      // it the SCC structure, phase count, and propagation diameter —
      // is replica-invariant while edge volume scales ×N)
      "q388_scc" -> { e =>
        val even = (col("a") + col("b")) % 2 === 0
        val dir = e.select(
          when(even, col("a")).otherwise(col("b")).as("s"),
          when(even, col("b")).otherwise(col("a")).as("t"))
        graft.ops.Graph.stronglyConnectedComponents(dir, col("s"),
          col("t"), maxPhases = 20, maxRounds = 400)
      },
      // q389 shape — the full composition: SCC, contraction by SCC
      // label, topoLayers on the condensation DAG (acyclic by
      // theorem; depth replica-invariant, probed at 1× and pinned)
      "q389_condensation" -> { e =>
        val even = (col("a") + col("b")) % 2 === 0
        val dir = e.select(
            when(even, col("a")).otherwise(col("b")).as("s"),
            when(even, col("b")).otherwise(col("a")).as("t"))
          .localCheckpoint(true)
        val scc = graft.ops.Graph.stronglyConnectedComponents(dir,
            col("s"), col("t"), maxPhases = 20, maxRounds = 400)
          .localCheckpoint(true)
        val ce = dir
          .join(scc.select(col("id").as("s"), col("scc").as("ca")),
            Seq("s"))
          .join(scc.select(col("id").as("t"), col("scc").as("cb")),
            Seq("t"))
          .select(col("ca").as("s"), col("cb").as("t"))
          .filter(col("s") =!= col("t")).distinct()
        graft.ops.Graph.topoLayers(ce, col("s"), col("t"),
          rounds = sys.env.getOrElse("SPARK_GRAFT_COND_ROUNDS", "16")
            .toInt)
      },
      // round-14: deterministic DeepWalk walks — |V| walk states of
      // constant width, per step one equi-join against the static
      // adjacency + one grouped min; replica isomorphism keeps each
      // copy's trajectories identical while state AND edge volume
      // scale ×N (the honest per-step-throughput question)
      "q397_walks" -> (e =>
        graft.ops.Graph.randomWalks(e, col("a"), col("b"), steps = 3)),
      // round-13 third wave: tagged multi-source BFS (min-union state
      // (src, id, dist)) — the seed count scales with the graph here
      // (%997 of node ids), so the measured exponent covers state
      // growth too, the honest worst case for the pivot-sample stance
      "q379_harmonic" -> { e =>
        val seeds = e.select(col("a").as("id"))
          .unionAll(e.select(col("b").as("id")))
          .distinct().filter(col("id") % 997 === 0)
        graft.ops.Graph.harmonicCentrality(e, col("a"), col("b"),
          seeds, col("id"), maxDepth = 4)
      })

    val eventFamilies: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q229_asof_join" -> { ev =>
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_id"), col("value").as("p_value"))
        graft.ops.Temporal.asofJoin(clicks, purchases, Seq("user_id"),
          "ts", payload = Seq("p_id", "p_value"),
          rightTiebreak = col("p_id"))
      },
      "q230_range_join" -> { ev =>
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("ts"))
        val windows = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("w_id"), col("ts").as("s"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
        graft.ops.Temporal.rangeJoin(errors, col("event_id"), col("ts"),
          windows, col("w_id"), col("s"), col("en"),
          bucketWidthMicros = 15L * 60 * 1000000L)
      },
      "q237_rolling_stats" -> (ev =>
        graft.ops.Temporal.rollingStats(ev, col("event_id"),
          Seq("user_id"), col("ts"), col("value"), nRows = 3)),
      // round-10 wave-8 heavies on the event replicas: DBSCAN point
      // clouds offset in x per replica (user_id div 10M recovers the
      // replica index) so density — and with it the eps-pair count per
      // point — stays CONSTANT while points scale ×N; quantile
      // normalization explodes the pooled position table ×N
      // eps 0.4 < the 1.0 gap between integer y-lines → neighbors stay
      // on one line (~2 per point however large N): pair volume scales
      // ×N, not ×N·density (an eps above the line gap made an
      // all-connected blob whose CC diameter grew with N — 271 s at 1×,
      // measured and rejected)
      "q326_dbscan" -> (ev =>
        // maxCandidatePairs raised above the 100× decade's ~129M rows:
        // at the DEFAULT knob (5×10⁷) the 100× cell fails fast with
        // the sizing formula — the designed behavior BASELINE.md
        // records; the rehearsal raises it (and runs at 64g) to time
        // the provisioned-memory regime
        graft.ops.Ann.dbscan(
          ev.select(col("event_id").as("id"),
            (col("value") +
              expr("(user_id div 10000000) * 600")).as("x"),
            (col("user_id") % 10000000 % 100).cast("double").as("y")),
          col("id"), col("x"), col("y"), eps = 0.4, minPts = 3,
          maxCandidatePairs = 500000000L)),
      "q318_quantile_normalize" -> (ev =>
        graft.ops.Profile.quantileNormalize(ev, col("event_id"),
          col("event_type"), col("value"))))

    val families: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q96_line_dedup" -> (d =>
        Dedup.lineDedup(wrapped4(d), col("doc_id"), col("wtext"), minDocs = 3)),
      "q133_paragraph_dedup" -> (d =>
        Dedup.lineDedup(wrapped4(d, "\n\n"), col("doc_id"), col("wtext"),
          minDocs = 3, sep = "\n\n")),
      "q97_dup_spans" -> (d =>
        Dedup.duplicateSpans(d, col("doc_id"), col("text"), k = 5, minDocs = 2)),
      "q100_strip_spans" -> (d =>
        Dedup.stripDuplicateSpans(d, col("doc_id"), col("text"), k = 5,
          minDocs = 2)),
      "q107_strip_keep_first" -> (d =>
        Dedup.stripDuplicateSpans(d, col("doc_id"), col("text"), k = 5,
          minDocs = 2, keepFirst = true)),
      "q180_mask_spans" -> (d =>
        Dedup.maskDuplicateSpans(d, col("doc_id"), col("text"), k = 5,
          minDocs = 2)),
      "q152_suffix_ranks" -> (d =>
        Suffix.suffixRanks(d.filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"))),
      "q153_longest_repeat" -> (d =>
        Suffix.longestRepeat(d.filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"))),
      // forced-dense twins for same-session A/B of the size switch
      // (select explicitly; "q152"/"q153" filters pick up both arms)
      "q152_forced_dense" -> (d =>
        Suffix.suffixRanks(d.filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"),
          pruneThresholdTokens = Long.MaxValue)),
      "q153_forced_dense" -> (d =>
        Suffix.longestRepeat(d.filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"),
          pruneThresholdTokens = Long.MaxValue)),
      // round-7 heavy additions: the leakage audit (gram equi-join),
      // the T5 corruption transform (row-local), and the logistic
      // trainer (iters × one partial-agg pass)
      "q193_split_leakage" -> (d =>
        graft.ops.Curation.splitLeakage(d, col("doc_id"), col("text"),
          graft.ops.Curation.splitAssign(col("doc_id")), n = 5,
          minShared = 1, maxDf = 10)),
      "q209_span_corruption" -> (d =>
        graft.ops.Curation.spanCorruption(d, col("doc_id"), col("text"),
          stride = 8, spanLen = 2)),
      "q222_logistic_train" -> (d =>
        graft.ops.Classify.logisticTrain(d, col("doc_id") % 2 === 0,
          col("text"), dim = 64, iters = 10, lr = 8.0, binary = true)),
      // round-10 heavy additions: the all-lengths gram census (one
      // ranking + integer LCP census — the suffix family's read-off
      // workload) and sorted-neighborhood linkage (range-rank + a
      // strictly n·(w−1) candidate join)
      "q272_gram_spectrum" -> (d =>
        Suffix.gramSpectrum(d.filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), minLen = 1, maxLen = 64)),
      "q275_sorted_neighborhood" -> (d =>
        graft.ops.Linkage.sortedNeighborhoodJoin(d, col("doc_id"),
          substring(col("text"), 1, 40), substring(col("text"), 1, 40),
          window = 4, minSim = 0.5)))

    val selected = families.filter { case (n, _) =>
      only.forall(f => f.exists(n.contains)) }

    // warmup: scheduler + codegen off the clock
    base.limit(10).queryExecution.toRdd.count()

    val selectedEv = eventFamilies.filter { case (n, _) =>
      only.forall(f => f.exists(n.contains)) }
    val selectedG = graphFamilies.filter { case (n, _) =>
      only.forall(f => f.exists(n.contains)) }

    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int, Double]]
    for (n <- scales) {
      val docs = spark.read.parquet(corpusPath(n))
      val ev = spark.read.parquet(eventsPath(n))
      val ge = spark.read.parquet(edgesPath(n))
      for ((name, fn) <- selected.map { case (nm, f) =>
             (nm, () => f(docs)) } ++
           selectedEv.map { case (nm, f) => (nm, () => f(ev)) } ++
           selectedG.map { case (nm, f) => (nm, () => f(ge)) }) {
        val t = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn().queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        results.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap.empty) += (n -> t)
        // the suffix family's size switch: record which doubling loop
        // the scale actually engaged (dense below the token threshold,
        // pruned at-or-above it)
        val extra = if (name.startsWith("q152") || name.startsWith("q153"))
          s""","loop":"${Suffix.lastLoop}"""" else ""
        println(f"""{"family":"$name","scale":$n,"sec":$t%.3f$extra}""")
      }
    }

    val s0 = scales.min
    val sN = scales.max
    println("\n| family | " + scales.map(n => s"t(${n}x) s").mkString(" | ") +
      " | exponent |")
    println("|---|" + scales.map(_ => "---|").mkString + "---|")
    for ((name, ts) <- results) {
      val exp =
        if (sN == s0) Double.NaN
        else math.log(ts(sN) / ts(s0)) / math.log(sN.toDouble / s0)
      println(f"| $name | " +
        scales.map(n => f"${ts(n)}%.2f").mkString(" | ") + f" | $exp%.2f |")
    }
    spark.stop()
  }
}
