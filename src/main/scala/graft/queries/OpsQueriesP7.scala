package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QShared._

/** Part 7 of the ops query registry (round-13 third/fourth waves,
  * q373–q390) — graph-quality completion (the refine-every-level
  * Leiden pipeline, per-community conductance, core numbers, sampled
  * harmonic centrality, link prediction, the directed family:
  * topological layers / SCC / condensation), the inference family
  * (Mann–Kendall plain + seasonal, log-rank, CMH, DiD, changepoint,
  * effect sizes, seasonal decomposition), the AMS F₂ join-size
  * sketch, and the k-anonymity/l-diversity release audit. Same
  * contract as the other parts: every query carries a co-located
  * DuckDB oracle; [[OpsQueries]] merges the parts. */
private[queries] object OpsQueriesP7 {

  /** The %9 co-purchase graph shared by the graph-quality queries —
    * the q370–q372 construction verbatim: canonical simple edges over
    * parts co-occurring in a slice order. (Shared with
    * [[OpsQueriesP8]]'s round-14 graph queries.) */
  private[queries] def copurchase9(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .filter(col("l_orderkey") % 9 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val e = li.as("x").join(li.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
    e.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q373_leiden_three_level" -> ((s, d) => {
      // the full refine-EVERY-level Leiden pipeline (round-13 PLANS
      // "next notch" after q372): level 1 → connectivity refine →
      // contract the REFINED labels → weighted level 2 → refine AGAIN
      // on the CONTRACTED graph (equivalent to refining the mapped
      // assignment on the original graph — every super-node is
      // internally connected by construction — but runs on the small
      // graph) → contract (summed weights, m invariant) → weighted
      // level 3. Five-stage certificate on the original graph, all
      // five modularity evaluations in one batched pass.
      val simple = copurchase9(s, d)
        .localCheckpoint(eager = true) // read 7x: l1, refine, contract, m, deg, inn x2
      val g = graft.ops.Graph
      val l1 = g.louvainOneLevel(simple, col("a"), col("b"), rounds = 3)
        .localCheckpoint(eager = true) // read twice: refine + stage 1
      val ref1 = g.refineConnectivity(simple, col("a"), col("b"), l1,
          col("id"), col("community"))
        .localCheckpoint(eager = true) // read 5x: contract, stage 2, maps x3
      val ce = g.louvainContract(simple, col("a"), col("b"), ref1,
          col("id"), col("community"))
        .localCheckpoint(eager = true) // read 3x: l2, refine2, contract2
      val l2 = g.louvainOneLevelWeighted(ce, col("a"), col("b"),
          col("w"), rounds = 3)
        .localCheckpoint(eager = true) // read twice: refine2 + stage 3
      val ref2 = g.refineConnectivity(ce, col("a"), col("b"), l2,
          col("id"), col("community"))
        .localCheckpoint(eager = true) // read 3x: contract2, stage 4, map
      val ce2 = g.louvainContractWeighted(ce, col("a"), col("b"),
        col("w"), ref2, col("id"), col("community"))
      val l3 = g.louvainOneLevelWeighted(ce2, col("a"), col("b"),
        col("w"), rounds = 3)
      val r1m = ref1.select(col("id"), col("community").as("sn"))
      val full2 = r1m
        .join(l2.select(col("id").as("sn"), col("community").as("cm")),
          Seq("sn"))
        .select(col("id"), col("cm"))
      val fullRef2 = r1m
        .join(ref2.select(col("id").as("sn"), col("community").as("c2")),
          Seq("sn"))
        .select(col("id"), col("c2"))
        .localCheckpoint(eager = true) // read twice: stage 4 + stage 5 map
      val full3 = fullRef2
        .join(l3.select(col("id").as("c2"), col("community").as("cm")),
          Seq("c2"))
        .select(col("id"), col("cm"))
      OpsQueriesP6.refineCertificate(simple,
        1L -> l1.select(col("id"), col("community").as("cm")),
        2L -> ref1.select(col("id"), col("community").as("cm")),
        3L -> full2,
        4L -> fullRef2.select(col("id"), col("c2").as("cm")),
        5L -> full3)
    }),
    "q374_conductance" -> ((s, d) => {
      // per-community conductance of the level-1 Louvain partition —
      // the cut-quality audit modularity's global sum can hide: a
      // community with phi ~ 1 is noise even inside a high-Q
      // partition. cut = vol - 2*inn falls out of the same two
      // grouped passes; |C| output rows, never per-node
      val simple = copurchase9(s, d)
        .localCheckpoint(eager = true) // read 5x: louvain prep + conductance
      val l1 = graft.ops.Graph.louvainOneLevel(simple, col("a"),
        col("b"), rounds = 3)
      graft.ops.Graph.communityConductance(simple, col("a"), col("b"),
          l1, col("id"), col("community"))
        .orderBy("community")
    }),
    "q375_core_number" -> ((s, d) => {
      // the FULL core decomposition — one number per node orders the
      // whole density spectrum (q307's fixed-k membership answered
      // one k); h-index iteration, estimates only decrease, fixpoint
      // = coreness. 8 rounds: converged at this scale (spec pins the
      // semantics against a brute-force peel; the oracle unrolls the
      // identical iteration so the hash agrees regardless)
      val simple = copurchase9(s, d)
      graft.ops.Graph.coreNumbers(simple, col("a"), col("b"),
          rounds = 8)
        .orderBy("id")
    }),
    "q376_mann_kendall" -> ((s, d) => {
      // per-cohort Mann-Kendall trend test over the DAILY event-count
      // series (30 points/key by construction -- the bounded-grain
      // contract): S from pairwise signs, tie-corrected variance
      // (integer counts tie often -- the correction does real work),
      // continuity-corrected z. The significance half of q356's
      // Theil-Sen slope
      val daily = ev(s, d).groupBy(
          (col("user_id") % 20).as("k"),
          datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).as("o"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.ops.Experiment.mannKendall(daily, col("k"), col("o"),
          col("v"))
        .orderBy("key")
    }),
    "q377_logrank" -> ((s, d) => {
      // two-group log-rank test over the q346 time-to-purchase
      // subjects, split by user parity: do the two cohorts' survival
      // curves differ -- the inferential sibling of the KM/NA curves
      val e = ev(s, d)
      val first = e.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"))
      val conv = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("dp"))
      val subjects = first.join(conv, Seq("user_id"), "left")
        .select(
          when(col("dp").isNotNull && datediff(col("dp"), col("d0")) <= 2,
            datediff(col("dp"), col("d0"))).otherwise(2).as("dur"),
          (col("dp").isNotNull && datediff(col("dp"), col("d0")) <= 2)
            .as("obs"),
          (col("user_id") % 2 === 1).as("g"))
      graft.ops.Experiment.logRankTest(subjects, col("dur"),
        col("obs"), col("g"))
    }),
    "q378_ams_f2" -> ((s, d) => {
      // AMS F2 sketch of the lineitem supplier key next to the exact
      // second moment -- the one-pass self-join-size estimate a
      // planner reads before deciding broadcast/salt/abort; md5 signs
      // make the estimate itself oracle-replayable, and the exact
      // column shows the k=8 estimator's real error on this key
      val li = t(s, d, "lineitem")
      val sk = graft.ops.Scale.amsF2(li, col("l_suppkey"), k = 8)
      val exact = li.filter(col("l_suppkey").isNotNull)
        .groupBy("l_suppkey").agg(count(lit(1)).as("f"))
        .agg(sum(col("f") * col("f")).as("f2_exact"))
      sk.crossJoin(exact)
        .select(col("n_rows"), col("k"),
          col("f2_sum").cast("long").as("f2_sum"), col("f2_exact"))
    }),
    "q380_link_prediction" -> ((s, d) => {
      // neighborhood-overlap link prediction over the co-purchase
      // graph: non-adjacent distance-2 pairs scored by common
      // neighbors + exact integer-basis-point Jaccard -- the
      // hard-negative / missing-edge candidate set (pairs the graph
      // says SHOULD be close but aren't linked)
      graft.ops.Graph.linkPredictionScores(copurchase9(s, d),
          col("a"), col("b"), minCommon = 2)
        .orderBy("a", "b")
    }),
    "q381_stl_decompose" -> ((s, d) => {
      // additive seasonal decomposition of the global daily event
      // count (period 7): centered moving-average trend, per-weekday
      // seasonal means of the EXACT integer detrended values, residual
      // -- the de-weekday step before alerting on a daily metric
      val daily = ev(s, d).groupBy(
          datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).as("t"))
        .agg(count(lit(1)).as("v"))
      graft.ops.Temporal.seasonalDecompose(daily, col("t"), col("v"),
        period = 7)
    }),
    "q382_seasonal_mk" -> ((s, d) => {
      // seasonal Mann-Kendall per cohort: the q376 trend test with
      // within-weekday pairs only, S and the integer variance
      // numerator summed across the 7 phases -- the weekday-cycle-
      // robust version of "is activity drifting"
      val daily = ev(s, d).groupBy(
          (col("user_id") % 10).as("k"),
          datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.ops.Experiment.seasonalMannKendall(daily, col("k"),
          col("t"), pmod(col("t"), lit(7L)), col("v"))
        .orderBy("key")
    }),
    "q383_cmh" -> ((s, d) => {
      // Cochran-Mantel-Haenszel arm->purchase association STRATIFIED
      // by weekday -- the Simpson's-paradox-robust A/B readout next to
      // q296's pooled proportion test; MH common odds ratio rides
      // along
      val u = ev(s, d).select(
        pmod(datediff(to_date(col("ts")),
          to_date(lit("1970-01-01"))), lit(7)).as("st"),
        (col("user_id") % 2 === 1).as("t"),
        (col("event_type") === "purchase").as("su"))
      graft.ops.Experiment.cmhTest(u, col("st"), col("t"), col("su"))
    }),
    "q384_changepoint" -> ((s, d) => {
      // single binary-segmentation split of the global daily event
      // count: WHEN did the level shift (CUSUM q355 answers whether);
      // exact integer prefix sums, deterministic argmax
      val daily = ev(s, d).groupBy(
          datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).as("t"))
        .agg(count(lit(1)).as("v"))
      graft.ops.Temporal.changePointSplit(daily, col("t"), col("v"))
    }),
    "q385_did" -> ((s, d) =>
      // two-group x pre/post difference-in-differences on event value
      // (post = second half of the window) -- the parallel-trends
      // treatment-effect estimate; cell sums in DECIMAL(38,6)
      graft.ops.Experiment.didEstimate(ev(s, d),
        (col("user_id") % 2 === 1),
        to_date(col("ts")) >= lit("2024-01-16"),
        col("value"))),
    "q386_k_anonymity" -> ((s, d) =>
      // k-anonymity / l-diversity release audit over the event log:
      // (cohort, event_type) as the quasi-identifier, the value band
      // as the sensitive attribute -- the indirect-reidentification
      // check after the PII scrub; output = the suppression worklist
      graft.ops.Curation.kAnonymityReport(ev(s, d),
          Seq("cohort" -> (col("user_id") % 100),
            "event_type" -> col("event_type")),
          floor(col("value") / 100).cast("long"), k = 15, l = 2)
        .orderBy("cohort", "event_type")),
    "q387_topo_layers" -> ((s, d) => {
      // longest-path (topological) layers of a guaranteed-acyclic
      // dependency DAG: co-purchase edges restricted to consecutive
      // %16 stages (every path strictly climbs the stage, so depth
      // <= 15 at ANY scale); the op's extra-round convergence check
      // doubles as the loud acyclicity certificate
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") &&
            pmod(col("x.p"), lit(16L)) + 1 === pmod(col("y.p"),
              lit(16L)))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.topoLayers(e, col("a"), col("b"), rounds = 16)
        .orderBy("id")
    }),
    "q388_scc" -> ((s, d) => {
      // strongly connected components of a directed page-link graph
      // (fixed page universe, the q227 crawl's canonical shape):
      // per-site 3-cycles + a one-way ring over sites 0-3 (one
      // 12-page SCC) + a one-way bridge into site 4 (forces a second
      // peel phase) + two isolated site cycles; the closure oracle
      // certifies the SEMANTIC answer, not the iteration
      val id = col("did")
      val d0 = t(s, d, "documents").select(col("doc_id").as("did"))
      def page(site: Column, p: Column) = site * 20L + p
      val e1 = d0.select(
        page(id % 7, id % 3).as("a"),
        page(id % 7, (id % 3 + 1) % 3).as("b"))
      val e2 = d0.filter(id % 3 === 0 && id % 7 < 4)
        .select(page(id % 7, id % 3).as("a"),
          page((id % 7 + 1) % 4, id % 3).as("b"))
      val e3 = d0.filter(id % 11 === 0 && id % 7 === 1)
        .select(page(id % 7, id % 3).as("a"),
          page(lit(4L), id % 3).as("b"))
      graft.ops.Graph.stronglyConnectedComponents(
          e1.unionAll(e2).unionAll(e3), col("a"), col("b"))
        .orderBy("id")
    }),
    "q390_effect_sizes" -> ((s, d) => {
      // the magnitude half of the q290/q293 test pair on the same
      // per-user units: Cohen's d, Hedges' g, and Cliff's delta
      // (midrank U reused, ties count half)
      val units = ev(s, d).groupBy("user_id")
        .agg(sum("value").as("m"))
        .select((col("user_id") % 2).cast("int").as("arm"), col("m"))
      graft.ops.Experiment.effectSizes(units, col("arm"), col("m"))
    }),
    "q391_louvain_converged_w" -> ((s, d) => {
      // CONVERGED external-weight Louvain (round-13 verdict ask #3):
      // louvainOneLevelWeightedConverged had only ever seen
      // contraction-produced weights — here it runs on the q368
      // similarity-weighted co-purchase graph (pair multiplicity +
      // genuine self-loops). The certificate is the q367 trajectory
      // shape with the per-round MOVE COUNT added: one fixed-round
      // weighted trajectory (6 rounds) supplies every round's
      // assignment; moved(r) is one equi-join of consecutive rounds;
      // all 7 weighted modularity evaluations batch under the round
      // tag (two equi-joins total); conv_round derives from the moved
      // series exactly as the op's two-consecutive-zero-move stop
      // does; and conv_matches_fixed COMPARES THE CONVERGED OP'S
      // ACTUAL OUTPUT against the trajectory's final round (equal by
      // the idempotence theorem — stopping early only ever skips
      // provably-zero-move rounds — so the oracle pins `true` while
      // the engine computes the comparison for real: an earlyStop bug
      // would emit false and hash-mismatch).
      val R = 6
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      val loops = li.filter(col("p") % 10 === 0)
        .groupBy(col("p")).agg(count(lit(1)).as("w"))
        .select(col("p").as("a"), col("p").as("b"), col("w"))
      val e = pairs.unionByName(loops)
        .localCheckpoint(eager = true) // read 5x: traj, conv, m, deg, inn
      val g = graft.ops.Graph
      val traj = g.louvainOneLevelWeightedTrajectory(e, col("a"),
          col("b"), col("w"), rounds = R)
        .localCheckpoint(eager = true) // read 3x: asgAll, moved, conv cmp
      val conv = g.louvainOneLevelWeightedConverged(e, col("a"),
        col("b"), col("w"), maxRounds = R)
      val sing = e.select(col("a").as("id"))
        .unionAll(e.select(col("b").as("id"))).distinct()
        .select(lit(0L).as("round"), col("id"), col("id").as("cm"))
      val asgAll = sing.unionByName(traj.select(col("round"),
          col("id"), col("community").as("cm")))
        .localCheckpoint(eager = true) // read 5x: tot, inn x2, nc, moved
      // moved(r): one equi-join of round r with round r-1 (round 0: 0)
      val movedR = asgAll.as("cur")
        .join(asgAll.select((col("round") + 1).as("round"), col("id"),
          col("cm").as("pcm")).as("prv"), Seq("round", "id"))
        .groupBy("round")
        .agg(sum(when(col("cm") =!= col("pcm"), 1L).otherwise(0L))
          .as("moved"))
        .unionByName(sing.limit(1).select(lit(0L).as("round"),
          lit(0L).as("moved")))
        .localCheckpoint(eager = true) // read twice: levels + conv_round
      // the op's stop rule, replayed on the moved series: stops after
      // the SECOND consecutive zero-move round
      val convRound = movedR.as("x")
        .join(movedR.select((col("round") + 1).as("round"),
          col("moved").as("pmv")).as("y"), Seq("round"))
        .filter(col("round") >= 2 && col("moved") === 0 &&
          col("pmv") === 0)
        .agg(min(col("round")).as("conv_round"))
      // converged-op output vs the fixed trajectory's final round
      val convCmp = conv.select(col("id"), col("community").as("cc"))
        .join(traj.filter(col("round") === R)
          .select(col("id"), col("community").as("tc")), Seq("id"))
        .agg((sum(when(col("cc") =!= col("tc"), 1L).otherwise(0L)) ===
          0L).as("conv_matches_fixed"))
      // batched weighted modularity evaluation (the q368 convention:
      // loops add 2w to degree and w to intra mass; m = Σw with loops)
      val m = e.agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
      val nonLoop = e.filter(col("a") =!= col("b"))
      val deg = nonLoop.select(col("a").as("id"), col("w").as("deg"))
        .unionAll(nonLoop.select(col("b").as("id"), col("w").as("deg")))
        .unionAll(e.filter(col("a") === col("b"))
          .select(col("a").as("id"), (col("w") * 2).as("deg")))
        .groupBy("id").agg(sum("deg").as("deg"))
      val tot = asgAll.join(deg, "id")
        .groupBy("round", "cm").agg(sum("deg").as("tot"))
      val xa = asgAll.select(col("round"), col("id").as("a"),
        col("cm").as("ca"))
      val xb = asgAll.select(col("round"), col("id").as("b"),
        col("cm").as("cb"))
      val inn = e.join(xa, Seq("a")).join(xb, Seq("b", "round"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("round"), col("ca").as("cm"))
        .agg(sum("w").as("inn"))
      val qs = tot.join(inn, Seq("round", "cm"), "left")
        .groupBy("round")
        .agg(sum(lit(4L * m) * coalesce(col("inn"), lit(0L)) -
          col("tot") * col("tot")).as("q_num"))
      val nc = asgAll.groupBy("round")
        .agg(countDistinct(col("cm")).as("n_comm"))
      val levels = qs.join(nc, "round").join(movedR, "round")
        .localCheckpoint(eager = true) // read twice: self lag join
      levels.as("cur")
        .join(levels.select((col("round") + 1).as("round"),
          col("q_num").as("prev_q")).as("prv"), Seq("round"), "left")
        .crossJoin(broadcast(convRound))
        .crossJoin(broadcast(convCmp))
        .select(col("round"), col("moved"), col("n_comm"), col("q_num"),
          coalesce(col("q_num") >= col("prev_q"), lit(true))
            .as("not_worse"),
          col("conv_round"), col("conv_matches_fixed"))
        .orderBy("round")
    }),
    "q389_scc_condensation" -> ((s, d) => {
      // the composition a crawl analysis actually runs: SCC -> edge
      // contraction by SCC label -> topological layers of the
      // condensation DAG (acyclic BY THEOREM, so topoLayers'
      // convergence check is a structural self-test). Output: one row
      // per SCC with its size and its depth in the condensation
      val id = col("did")
      val d0 = t(s, d, "documents").select(col("doc_id").as("did"))
      def page(site: Column, p: Column) = site * 20L + p
      val e1 = d0.select(
        page(id % 7, id % 3).as("a"),
        page(id % 7, (id % 3 + 1) % 3).as("b"))
      val e2 = d0.filter(id % 3 === 0 && id % 7 < 4)
        .select(page(id % 7, id % 3).as("a"),
          page((id % 7 + 1) % 4, id % 3).as("b"))
      val e3 = d0.filter(id % 11 === 0 && id % 7 === 1)
        .select(page(id % 7, id % 3).as("a"),
          page(lit(4L), id % 3).as("b"))
      val e = e1.unionAll(e2).unionAll(e3)
        .localCheckpoint(eager = true) // read twice: scc + contraction
      val scc = graft.ops.Graph.stronglyConnectedComponents(e,
          col("a"), col("b"))
        .localCheckpoint(eager = true) // read 3x: contraction x2 + sizes
      val ce = e
        .join(scc.select(col("id").as("a"), col("scc").as("ca")),
          Seq("a"))
        .join(scc.select(col("id").as("b"), col("scc").as("cb")),
          Seq("b"))
        .select(col("ca").as("a"), col("cb").as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val layers = graft.ops.Graph.topoLayers(ce, col("a"), col("b"),
        rounds = 6)
      scc.groupBy(col("scc")).agg(count(lit(1)).as("n_pages"))
        .join(layers.select(col("id").as("scc"), col("layer")),
          Seq("scc"), "left")
        .select(col("scc"), col("n_pages"),
          coalesce(col("layer"), lit(0L)).as("layer"))
        .orderBy("scc")
    }),
    "q379_harmonic" -> ((s, d) => {
      // pivot-sampled harmonic centrality over the %5 co-purchase
      // graph from the %997 seed parts (the q345 pivot stance) -- ONE
      // tagged multi-source BFS, contributions in exact integer
      // micro-units (floor(1e6/d)), no per-pivot loop
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val seeds = t(s, d, "part").filter(col("p_partkey") % 997 === 0)
      graft.ops.Graph.harmonicCentrality(e, col("a"), col("b"),
          seeds, col("p_partkey"), maxDepth = 4)
        .orderBy("id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q373_leiden_three_level" ->
      leidenThreeLevelOracle(mod = 9, r = 3, ccRounds = 10),
    "q374_conductance" -> conductanceOracle(mod = 9, r = 3),
    "q375_core_number" -> coreNumbersOracle(mod = 9, rounds = 8),
    "q376_mann_kendall" ->
      """WITH daily AS (SELECT user_id % 20 AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS o,
               CAST(count(*) AS DOUBLE) AS v
             FROM events GROUP BY 1, 2),
         pairs AS (SELECT x.k,
               CASE WHEN y.v > x.v THEN 1
                    WHEN y.v < x.v THEN -1 ELSE 0 END AS sgn
             FROM daily x JOIN daily y ON x.k = y.k AND x.o < y.o),
         ps AS (SELECT k, CAST(sum(sgn) AS BIGINT) AS s FROM pairs
                GROUP BY k),
         tg AS (SELECT k,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr,
               CAST(sum(t) AS BIGINT) AS n
             FROM (SELECT k, v, count(*) AS t FROM daily GROUP BY k, v)
             GROUP BY k),
         st AS (SELECT tg.k, tg.n,
               coalesce(ps.s, CAST(0 AS BIGINT)) AS s,
               CAST(tg.n * (tg.n - 1) * (2 * tg.n + 5) - tg.tcorr
                 AS BIGINT) / 18.0 AS var_s
             FROM tg LEFT JOIN ps ON ps.k = tg.k),
         zt AS (SELECT k, n, s, var_s,
               CASE WHEN s > 0 AND var_s > 0
                      THEN (s - 1) / sqrt(var_s)
                    WHEN s < 0 AND var_s > 0
                      THEN (s + 1) / sqrt(var_s)
                    ELSE 0.0 END AS z
             FROM st)
         SELECT k AS key, n, s, round(var_s, 4) AS var_s,
           round(z, 4) AS z, abs(z) > 1.96 AS trending
         FROM zt ORDER BY key""",
    "q377_logrank" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
               FROM events GROUP BY user_id),
         p AS (SELECT user_id, min(CAST(ts AS DATE)) AS dp
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id),
         subj AS (SELECT
                    CASE WHEN dp IS NOT NULL
                           AND date_diff('day', d0, dp) <= 2
                      THEN date_diff('day', d0, dp) ELSE 2 END AS t,
                    (dp IS NOT NULL AND date_diff('day', d0, dp) <= 2)
                      AS e,
                    user_id % 2 = 1 AS g
                  FROM f LEFT JOIN p USING (user_id)),
         pt AS (SELECT t,
                  CAST(count(*) FILTER (WHERE e AND NOT g) AS BIGINT)
                    AS d1,
                  CAST(count(*) FILTER (WHERE e) AS BIGINT) AS d,
                  CAST(count(*) FILTER (WHERE NOT g) AS BIGINT) AS a1,
                  count(*) AS a
                FROM subj GROUP BY t),
         k AS (SELECT t, d1, d,
                 CAST(sum(a1) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n1,
                 CAST(sum(a) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n
               FROM pt),
         agg AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
                   sum(d * n1 / CAST(n AS DOUBLE)) AS e1,
                   sum(CASE WHEN n > 1 THEN
                         d * (n1 / CAST(n AS DOUBLE)) *
                           (1 - n1 / CAST(n AS DOUBLE)) *
                           (n - d) / CAST(n - 1 AS DOUBLE)
                       ELSE 0.0 END) AS v
                 FROM k WHERE d > 0),
         tot AS (SELECT
                   CAST(count(*) FILTER (WHERE NOT g) AS BIGINT) AS n1,
                   CAST(count(*) FILTER (WHERE g) AS BIGINT) AS n2
                 FROM subj)
         SELECT tot.n1, tot.n2, agg.o1, round(agg.e1, 4) AS e1,
           round(agg.v, 4) AS var1,
           round(CASE WHEN agg.v > 0
             THEN (agg.o1 - agg.e1) * (agg.o1 - agg.e1) / agg.v
             ELSE 0.0 END, 4) AS chi2,
           CASE WHEN agg.v > 0
             THEN (agg.o1 - agg.e1) * (agg.o1 - agg.e1) / agg.v
             ELSE 0.0 END > 3.841 AS significant
         FROM tot, agg""",
    "q378_ams_f2" ->
      """WITH s AS (SELECT CAST(l_suppkey AS VARCHAR) AS key
               FROM lineitem WHERE l_suppkey IS NOT NULL),
         js AS (SELECT r.j FROM range(1, 9) r(j)),
         sg AS (SELECT js.j,
               CASE WHEN CAST('0x' ||
                   substr(md5(lpad(CAST(js.j AS VARCHAR), 2, '0')
                     || ':' || s.key), 1, 15) AS BIGINT)
                   % 2 = 0
                 THEN 1 ELSE -1 END AS sgn
             FROM s CROSS JOIN js),
         zz AS (SELECT j, CAST(sum(sgn) AS BIGINT) AS z,
                  count(*) AS n
                FROM sg GROUP BY j),
         ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM (
                  SELECT count(*) AS f FROM lineitem
                  WHERE l_suppkey IS NOT NULL GROUP BY l_suppkey))
         SELECT CAST((SELECT sum(n) FROM zz) / 8 AS BIGINT) AS n_rows,
           CAST(8 AS BIGINT) AS k,
           CAST((SELECT sum(z * z) FROM zz) AS BIGINT) AS f2_sum,
           ex.f2_exact
         FROM ex""",
    "q379_harmonic" ->
      harmonicOracle(mod = 5, seedMod = 997, depth = 4),
    "q391_louvain_converged_w" ->
      louvainConvergedWOracle(rounds = 6, mod = 9),
    "q387_topo_layers" -> topoLayersOracle(mod = 5, rounds = 16),
    "q390_effect_sizes" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                 sum(value) AS m
               FROM events GROUP BY user_id),
         mo AS (SELECT arm, count(*) AS n, avg(m) AS mu,
                  var_samp(m) AS v
                FROM u GROUP BY arm),
         pv AS (SELECT m, count(*) AS t,
                  CAST(sum(arm) AS BIGINT) AS n1v
                FROM u GROUP BY m),
         r AS (SELECT t, n1v,
                 coalesce(sum(t) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
               FROM pv),
         uu AS (SELECT round(sum(n1v * midrank)
                  - (SELECT CAST(sum(n1v) AS BIGINT) FROM pv)
                    * ((SELECT CAST(sum(n1v) AS BIGINT) FROM pv) + 1)
                    / 2.0, 4) AS u
                FROM r),
         ab AS (SELECT
             (SELECT n FROM mo WHERE arm = 0) AS n_a,
             (SELECT mu FROM mo WHERE arm = 0) AS mu_a,
             (SELECT v FROM mo WHERE arm = 0) AS v_a,
             (SELECT n FROM mo WHERE arm = 1) AS n_b,
             (SELECT mu FROM mo WHERE arm = 1) AS mu_b,
             (SELECT v FROM mo WHERE arm = 1) AS v_b),
         c AS (SELECT ab.*, uu.u,
                 sqrt(((n_a - 1) * v_a + (n_b - 1) * v_b)
                   / (n_a + n_b - 2)) AS sp
               FROM ab, uu)
         SELECT n_a, n_b, round(mu_a, 4) AS mean_a,
           round(mu_b, 4) AS mean_b,
           round(CASE WHEN sp > 0 THEN (mu_b - mu_a) / sp END, 4)
             AS cohen_d,
           round(CASE WHEN sp > 0 THEN (mu_b - mu_a) / sp *
             (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9)) END, 4)
             AS hedges_g,
           round((2.0 * u - n_a * n_b) / (n_a * n_b), 4)
             AS cliffs_delta
         FROM c""",
    "q389_scc_condensation" ->
      """WITH RECURSIVE d AS (SELECT doc_id AS id FROM documents),
         e0 AS (
           SELECT (id % 7) * 20 + (id % 3) AS s,
             (id % 7) * 20 + ((id % 3) + 1) % 3 AS t FROM d
           UNION ALL
           SELECT (id % 7) * 20 + (id % 3),
             (((id % 7) + 1) % 4) * 20 + (id % 3) FROM d
           WHERE id % 3 = 0 AND id % 7 < 4
           UNION ALL
           SELECT (id % 7) * 20 + (id % 3), 80 + (id % 3) FROM d
           WHERE id % 11 = 0 AND id % 7 = 1),
         e AS (SELECT DISTINCT s, t FROM e0 WHERE s <> t),
         n AS (SELECT DISTINCT id FROM (
                 SELECT s AS id FROM e UNION ALL SELECT t FROM e)),
         r(s, t) AS (
           SELECT s, t FROM e
           UNION
           SELECT r.s, e.t FROM r JOIN e ON e.s = r.t),
         mut AS (SELECT r1.s AS a, r1.t AS b FROM r r1
                 JOIN r r2 ON r2.s = r1.t AND r2.t = r1.s),
         lab AS (SELECT b AS id, min(a) AS m FROM mut GROUP BY b),
         scc AS (SELECT n.id, least(n.id, coalesce(l.m, n.id)) AS scc
                 FROM n LEFT JOIN lab l ON l.id = n.id),
         ce AS (SELECT DISTINCT x.scc AS s, y.scc AS t
                FROM e JOIN scc x ON x.id = e.s
                  JOIN scc y ON y.id = e.t
                WHERE x.scc <> y.scc),
         cn AS (SELECT DISTINCT id FROM (
                  SELECT s AS id FROM ce UNION ALL SELECT t FROM ce)),
         l0 AS (SELECT id, CAST(0 AS BIGINT) AS layer FROM cn),
         l1 AS (SELECT l.id, greatest(l.layer, coalesce(m.c, 0))
                    AS layer
                FROM l0 l LEFT JOIN (
                  SELECT ce.t AS id, max(x.layer) + 1 AS c
                  FROM ce JOIN l0 x ON x.id = ce.s GROUP BY ce.t) m
                  ON m.id = l.id),
         l2 AS (SELECT l.id, greatest(l.layer, coalesce(m.c, 0))
                    AS layer
                FROM l1 l LEFT JOIN (
                  SELECT ce.t AS id, max(x.layer) + 1 AS c
                  FROM ce JOIN l1 x ON x.id = ce.s GROUP BY ce.t) m
                  ON m.id = l.id),
         l3 AS (SELECT l.id, greatest(l.layer, coalesce(m.c, 0))
                    AS layer
                FROM l2 l LEFT JOIN (
                  SELECT ce.t AS id, max(x.layer) + 1 AS c
                  FROM ce JOIN l2 x ON x.id = ce.s GROUP BY ce.t) m
                  ON m.id = l.id),
         l4 AS (SELECT l.id, greatest(l.layer, coalesce(m.c, 0))
                    AS layer
                FROM l3 l LEFT JOIN (
                  SELECT ce.t AS id, max(x.layer) + 1 AS c
                  FROM ce JOIN l3 x ON x.id = ce.s GROUP BY ce.t) m
                  ON m.id = l.id),
         l5 AS (SELECT l.id, greatest(l.layer, coalesce(m.c, 0))
                    AS layer
                FROM l4 l LEFT JOIN (
                  SELECT ce.t AS id, max(x.layer) + 1 AS c
                  FROM ce JOIN l4 x ON x.id = ce.s GROUP BY ce.t) m
                  ON m.id = l.id),
         l6 AS (SELECT l.id, greatest(l.layer, coalesce(m.c, 0))
                    AS layer
                FROM l5 l LEFT JOIN (
                  SELECT ce.t AS id, max(x.layer) + 1 AS c
                  FROM ce JOIN l5 x ON x.id = ce.s GROUP BY ce.t) m
                  ON m.id = l.id)
         SELECT CAST(s.scc AS BIGINT) AS scc,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(coalesce(any_value(l6.layer), 0) AS BIGINT) AS layer
         FROM scc s LEFT JOIN l6 ON l6.id = s.scc
         GROUP BY s.scc ORDER BY s.scc""",
    "q388_scc" ->
      """WITH RECURSIVE d AS (SELECT doc_id AS id FROM documents),
         e0 AS (
           SELECT (id % 7) * 20 + (id % 3) AS s,
             (id % 7) * 20 + ((id % 3) + 1) % 3 AS t FROM d
           UNION ALL
           SELECT (id % 7) * 20 + (id % 3),
             (((id % 7) + 1) % 4) * 20 + (id % 3) FROM d
           WHERE id % 3 = 0 AND id % 7 < 4
           UNION ALL
           SELECT (id % 7) * 20 + (id % 3), 80 + (id % 3) FROM d
           WHERE id % 11 = 0 AND id % 7 = 1),
         e AS (SELECT DISTINCT s, t FROM e0 WHERE s <> t),
         n AS (SELECT DISTINCT id FROM (
                 SELECT s AS id FROM e UNION ALL SELECT t FROM e)),
         r(s, t) AS (
           SELECT s, t FROM e
           UNION
           SELECT r.s, e.t FROM r JOIN e ON e.s = r.t),
         mut AS (SELECT r1.s AS a, r1.t AS b FROM r r1
                 JOIN r r2 ON r2.s = r1.t AND r2.t = r1.s),
         lab AS (SELECT b AS id, min(a) AS m FROM mut GROUP BY b)
         SELECT n.id,
           CAST(least(n.id, coalesce(l.m, n.id)) AS BIGINT) AS scc
         FROM n LEFT JOIN lab l ON l.id = n.id ORDER BY n.id""",
    "q386_k_anonymity" ->
      """WITH g AS (SELECT user_id % 100 AS cohort, event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT CAST(floor(value / 100) AS BIGINT))
                 AS BIGINT) AS n_sensitive
             FROM events GROUP BY 1, 2)
         SELECT cohort, event_type, n, n_sensitive,
           n < 15 AS under_k, n_sensitive < 2 AS under_l
         FROM g WHERE n < 15 OR n_sensitive < 2
         ORDER BY cohort, event_type""",
    "q383_cmh" ->
      """WITH u AS (SELECT
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 % 7 AS st,
               user_id % 2 = 1 AS t,
               event_type = 'purchase' AS s
             FROM events),
         ps AS (SELECT st,
               CAST(count(*) FILTER (WHERE t AND s) AS BIGINT) AS a,
               CAST(count(*) FILTER (WHERE t) AS BIGINT) AS n1,
               CAST(count(*) FILTER (WHERE NOT t) AS BIGINT) AS n2,
               CAST(count(*) FILTER (WHERE s) AS BIGINT) AS m1,
               count(*) AS tt
             FROM u GROUP BY st),
         k AS (SELECT a, n1, n2, m1, tt, tt - m1 AS m0, n1 - a AS b,
                 m1 - a AS c, n2 - (m1 - a) AS d
               FROM ps WHERE tt >= 2),
         dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
                FROM ps WHERE tt < 2),
         ag AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
               CAST(sum(tt) AS BIGINT) AS n,
               CAST(sum(a) AS BIGINT) AS sum_a,
               sum(CAST(n1 AS DOUBLE) * m1 / tt) AS e,
               sum((CAST(n1 AS DOUBLE) * m1 / tt) *
                 (CAST(n2 AS DOUBLE) / tt) *
                 (CAST(m0 AS DOUBLE) / (tt - 1))) AS v,
               sum(CAST(a AS DOUBLE) * d / tt) AS ad,
               sum(CAST(b AS DOUBLE) * c / tt) AS bc
             FROM k)
         SELECT ag.n_strata, dr.n_dropped, ag.n, ag.sum_a,
           round(ag.e, 4) AS sum_e, round(ag.v, 4) AS var,
           round(CASE WHEN ag.v > 0
             THEN (ag.sum_a - ag.e) * (ag.sum_a - ag.e) / ag.v
             ELSE 0.0 END, 4) AS chi2,
           round(CASE WHEN ag.bc > 0 THEN ag.ad / ag.bc END, 4)
             AS or_mh,
           CASE WHEN ag.v > 0
             THEN (ag.sum_a - ag.e) * (ag.sum_a - ag.e) / ag.v
             ELSE 0.0 END > 3.841 AS significant
         FROM ag, dr""",
    "q384_changepoint" ->
      """WITH daily AS (SELECT
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS t,
               count(*) AS v
             FROM events GROUP BY 1),
         p AS (SELECT t, v, count(*) OVER wc AS cn,
                 CAST(sum(v) OVER wc AS BIGINT) AS cs,
                 CAST(sum(v * v) OVER wc AS BIGINT) AS css
               FROM daily
               WINDOW wc AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
         tot AS (SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS ts,
                   CAST(sum(v * v) AS BIGINT) AS tss
                 FROM daily),
         cand AS (SELECT t AS split_t, cn AS n_left,
                 n - cn AS n_right,
                 CAST(cs AS DOUBLE) / cn AS mean_left,
                 CAST(ts - cs AS DOUBLE) / (n - cn) AS mean_right,
                 (CAST(tss AS DOUBLE) - CAST(ts AS DOUBLE) * ts / n)
                   - (CAST(css AS DOUBLE)
                      - CAST(cs AS DOUBLE) * cs / cn)
                   - (CAST(tss - css AS DOUBLE)
                      - CAST(ts - cs AS DOUBLE) * (ts - cs) / (n - cn))
                   AS gain
               FROM p CROSS JOIN tot WHERE cn < n)
         SELECT CAST(split_t AS BIGINT) AS split_t,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           round(mean_left, 4) AS mean_left,
           round(mean_right, 4) AS mean_right, round(gain, 4) AS gain
         FROM cand ORDER BY cand.gain DESC, split_t LIMIT 1""",
    "q385_did" ->
      """WITH u AS (SELECT user_id % 2 = 1 AS g,
               CAST(ts AS DATE) >= DATE '2024-01-16' AS p,
               CAST(value AS DECIMAL(38, 6)) AS v
             FROM events)
         SELECT
           CAST(count(*) FILTER (WHERE NOT g AND NOT p) AS BIGINT)
             AS n_c_pre,
           CAST(count(*) FILTER (WHERE NOT g AND p) AS BIGINT)
             AS n_c_post,
           CAST(count(*) FILTER (WHERE g AND NOT p) AS BIGINT)
             AS n_t_pre,
           CAST(count(*) FILTER (WHERE g AND p) AS BIGINT)
             AS n_t_post,
           round(CAST(sum(v) FILTER (WHERE NOT g AND NOT p) AS DOUBLE)
             / count(*) FILTER (WHERE NOT g AND NOT p), 4)
             AS mean_c_pre,
           round(CAST(sum(v) FILTER (WHERE NOT g AND p) AS DOUBLE)
             / count(*) FILTER (WHERE NOT g AND p), 4) AS mean_c_post,
           round(CAST(sum(v) FILTER (WHERE g AND NOT p) AS DOUBLE)
             / count(*) FILTER (WHERE g AND NOT p), 4) AS mean_t_pre,
           round(CAST(sum(v) FILTER (WHERE g AND p) AS DOUBLE)
             / count(*) FILTER (WHERE g AND p), 4) AS mean_t_post,
           round((CAST(sum(v) FILTER (WHERE g AND p) AS DOUBLE)
               / count(*) FILTER (WHERE g AND p)
             - CAST(sum(v) FILTER (WHERE g AND NOT p) AS DOUBLE)
               / count(*) FILTER (WHERE g AND NOT p))
             - (CAST(sum(v) FILTER (WHERE NOT g AND p) AS DOUBLE)
               / count(*) FILTER (WHERE NOT g AND p)
             - CAST(sum(v) FILTER (WHERE NOT g AND NOT p) AS DOUBLE)
               / count(*) FILTER (WHERE NOT g AND NOT p)), 4) AS did
         FROM u""",
    "q380_link_prediction" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
               FROM lineitem WHERE l_orderkey % 9 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         adj AS (SELECT a AS y, b AS x FROM e0
                 UNION ALL SELECT b, a FROM e0),
         cnp AS (SELECT p.x AS a, q.x AS b, count(*) AS cn
                 FROM adj p JOIN adj q ON q.y = p.y AND p.x < q.x
                 GROUP BY 1, 2),
         cand AS (SELECT * FROM cnp c WHERE cn >= 2 AND NOT EXISTS (
                    SELECT 1 FROM e0
                    WHERE e0.a = c.a AND e0.b = c.b)),
         deg AS (SELECT id, count(*) AS deg FROM (
                   SELECT a AS id FROM e0
                   UNION ALL SELECT b FROM e0) GROUP BY id)
         SELECT c.a, c.b, c.cn,
           CAST(floor(c.cn * 10000.0 / (da.deg + db.deg - c.cn))
             AS BIGINT) AS jaccard_bp
         FROM cand c JOIN deg da ON da.id = c.a
           JOIN deg db ON db.id = c.b
         ORDER BY c.a, c.b""",
    "q381_stl_decompose" ->
      """WITH daily AS (SELECT
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS t,
               count(*) AS v
             FROM events GROUP BY 1),
         w AS (SELECT t, v,
                 CAST(sum(v) OVER win AS BIGINT) AS s7,
                 count(*) OVER win AS c7
               FROM daily
               WINDOW win AS (ORDER BY t
                 RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         d2 AS (SELECT t, v, s7, c7,
                  CASE WHEN c7 = 7 THEN 7 * v - s7 END AS detr,
                  t % 7 AS phase
                FROM w),
         se AS (SELECT phase,
                  CAST(sum(detr) AS BIGINT) / (7.0 * count(*)) AS seas
                FROM d2 WHERE detr IS NOT NULL GROUP BY phase)
         SELECT d2.t, d2.v,
           round(CASE WHEN c7 = 7 THEN CAST(s7 AS DOUBLE) / 7 END, 4)
             AS trend,
           round(se.seas, 4) AS seasonal,
           round(CAST(detr AS DOUBLE) / 7 - se.seas, 4) AS resid
         FROM d2 LEFT JOIN se USING (phase) ORDER BY t""",
    "q382_seasonal_mk" ->
      """WITH daily AS (SELECT user_id % 10 AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS t,
               CAST(count(*) AS DOUBLE) AS v
             FROM events GROUP BY 1, 2),
         d2 AS (SELECT k, t, t % 7 AS ph, v FROM daily),
         ps AS (SELECT x.k, CAST(sum(
               CASE WHEN y.v > x.v THEN 1
                    WHEN y.v < x.v THEN -1 ELSE 0 END) AS BIGINT) AS s
             FROM d2 x JOIN d2 y
               ON x.k = y.k AND x.ph = y.ph AND x.t < y.t
             GROUP BY x.k),
         pp AS (SELECT k, ph,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr,
               CAST(sum(t) AS BIGINT) AS n
             FROM (SELECT k, ph, v, count(*) AS t FROM d2
                   GROUP BY k, ph, v)
             GROUP BY k, ph),
         vk AS (SELECT k,
               CAST(sum(n * (n - 1) * (2 * n + 5) - tcorr) AS BIGINT)
                 AS var_num,
               CAST(sum(n) AS BIGINT) AS n
             FROM pp GROUP BY k),
         zt AS (SELECT vk.k, vk.n,
               coalesce(ps.s, CAST(0 AS BIGINT)) AS s,
               vk.var_num / 18.0 AS var_s,
               CASE WHEN coalesce(ps.s, 0) > 0 AND vk.var_num > 0
                      THEN (ps.s - 1) / sqrt(vk.var_num / 18.0)
                    WHEN coalesce(ps.s, 0) < 0 AND vk.var_num > 0
                      THEN (ps.s + 1) / sqrt(vk.var_num / 18.0)
                    ELSE 0.0 END AS z
             FROM vk LEFT JOIN ps ON ps.k = vk.k)
         SELECT k AS key, n, s, round(var_s, 4) AS var_s,
           round(z, 4) AS z, abs(z) > 1.96 AS trending
         FROM zt ORDER BY key"""
  )
}
