package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QShared._

/** Part 8 of the ops query registry (round-14 wave, q392–q400) —
  * the paired/blocked/exact inference completions (Wilcoxon
  * signed-rank, Fisher exact, Friedman), time-series diagnostics
  * (cross-correlation lead/lag, Durbin–Watson + runs), the graph
  * corpus generators and gauges (degree-weighted link prediction,
  * deterministic DeepWalk walks, double-sweep diameter), and the
  * entity-resolution survivorship merge. Same contract as the other
  * parts: every query carries a co-located DuckDB oracle;
  * [[OpsQueries]] merges the parts. */
private[queries] object OpsQueriesP8 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q392_wilcoxon_signed" -> ((s, d) => {
      // paired pre/post per user: event count in the first half of
      // January vs the second (the q385 DiD boundary) — did activity
      // shift within units, the within-subject sibling of q290's
      // rank-sum
      val pairs = ev(s, d).groupBy("user_id")
        .agg(
          sum(when(to_date(col("ts")) < lit("2024-01-16").cast("date"),
            1L).otherwise(0L)).as("pre"),
          sum(when(to_date(col("ts")) >= lit("2024-01-16").cast("date"),
            1L).otherwise(0L)).as("post"))
      graft.ops.Experiment.wilcoxonSignedRank(pairs, col("pre"),
        col("post"))
    }),
    "q393_ccf" -> ((s, d) => {
      // does click volume lead purchase volume? daily counts of the
      // two types on one grid, correlated at every lag in [-7, 7] —
      // integer moments, one equi-join per lag
      val e = ev(s, d)
      val daily = e.groupBy(
          datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).as("t"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      graft.ops.Temporal.crossCorrelation(daily, col("t"), col("x"),
        col("y"), maxLag = 7)
    }),
    "q394_residual_diag" -> ((s, d) => {
      // per-cohort daily activity: is the series independent noise
      // around its level (DW ~ 2, runs z ~ 0) or
      // clustered/oscillating — the residual audit before any trend
      // claim (q376's MK companion)
      val daily = ev(s, d).groupBy(
          (col("user_id") % 10).as("k"),
          datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).as("t"))
        .agg(count(lit(1)).as("v"))
      graft.ops.Temporal.residualDiagnostics(daily, col("k"),
          col("t"), col("v"))
        .orderBy("key")
    }),
    "q395_fisher_exact" -> ((s, d) => {
      // the 25-row nation table: parity x region-bloc — a genuinely
      // small 2x2 where chi-square would be dishonest and the
      // hypergeometric tail is the real answer
      graft.ops.Experiment.fisherExact(t(s, d, "nation"),
        pmod(col("n_nationkey"), lit(2)) === 0,
        col("n_regionkey").isin(1, 3))
    }),
    "q396_link_pred_w" -> ((s, d) => {
      // q380's candidate set rescored with hub discounting: common
      // neighbors weighted by 1/deg (Resource Allocation) and
      // 1/ln(deg) (Adamic-Adar) in exact micro-units — high-degree
      // hubs stop manufacturing false candidates
      graft.ops.Graph.linkPredictionWeighted(
          OpsQueriesP7.copurchase9(s, d), col("a"), col("b"),
          minCommon = 2)
        .orderBy("a", "b")
    }),
    "q397_random_walks" -> ((s, d) => {
      // DeepWalk corpus: one deterministic 3-hop walk per node, then
      // the window-2 skip-gram pair counts — the training-pair
      // generator for graph embeddings, md5-keyed so the oracle
      // replays every hop
      val walks = graft.ops.Graph.randomWalks(
          OpsQueriesP7.copurchase9(s, d), col("a"), col("b"),
          steps = 3)
        .localCheckpoint(eager = true) // read twice: both join sides
      walks.as("w1").join(walks.as("w2"),
          col("w1.start") === col("w2.start") &&
            col("w1.step") =!= col("w2.step") &&
            abs(col("w1.step") - col("w2.step")) <= 2)
        .groupBy(col("w1.node").as("center"),
          col("w2.node").as("context"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("center", "context")
    }),
    "q398_diameter" -> ((s, d) => {
      // how deep is the co-purchase graph: double-sweep BFS diameter
      // lower bound (exact on trees, tight in practice) with a loud
      // horizon certificate
      graft.ops.Graph.diameterDoubleSweep(
        OpsQueriesP7.copurchase9(s, d), col("a"), col("b"),
        maxDepth = 12)
    }),
    "q399_survivorship" -> ((s, d) => {
      // golden-record merge over prefix-blocked document clusters:
      // canonical = longest text (id tie-break), lang/source fused by
      // majority vote (smallest value on ties) — the survivorship
      // step that closes block - score - cluster - MERGE
      val docs = t(s, d, "documents")
        .withColumn("cluster",
          graft.expr.PortableHash.hex15Col(substring(col("text"), 1, 40)))
      graft.ops.Linkage.survivorshipMerge(docs, col("cluster"),
          col("doc_id"), rankCols = Seq(-col("n_chars")),
          voteCols = Seq("lang" -> col("lang"),
            "source" -> col("source")))
        .orderBy("cluster")
    }),
    "q400_friedman" -> ((s, d) => {
      // blocked repeated measures: 15 user cohorts x 7 weekday
      // treatments, per-cell event counts — do weekdays differ after
      // blocking out cohort level (the within-block sibling of
      // q310's Kruskal-Wallis)
      val cells = ev(s, d).groupBy(
          (col("user_id") % 15).as("blk"),
          pmod(datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))), lit(7)).as("trt"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.ops.Experiment.friedmanTest(cells, col("blk"), col("trt"),
        col("v"))
    }),
    "q401_matching" -> ((s, d) => {
      // greedy maximal matching over the co-purchase graph: the
      // duplicate-merge pair picker (each node pairs at most once per
      // pass); mutual-min rounds with md5 edge priorities, loud round
      // budget, oracle replays every round
      graft.ops.Graph.maximalMatching(OpsQueriesP7.copurchase9(s, d),
          col("a"), col("b"), rounds = matchRounds)
        .orderBy("a", "b")
    }),
    "q402_cochran_q" -> ((s, d) => {
      // blocked binary outcomes: per user x weekday, did the user
      // purchase that weekday — Cochran's Q across the 7 weekdays
      // (the 0/1 sibling of q400; users not active all 7 weekdays
      // drop and count)
      val cells = ev(s, d).groupBy(
          col("user_id").as("blk"),
          pmod(datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))), lit(7)).as("trt"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("x"))
      graft.ops.Experiment.cochranQ(cells, col("blk"), col("trt"),
        col("x"))
    }),
    "q403_jonckheere" -> ((s, d) => {
      // ordered-alternative trend: does per-user activity rise
      // across the 5 ordered cohorts — Kruskal-Wallis answers "any
      // difference", JT answers "monotone in the cohort order";
      // counted integer metrics tie heavily, so the three-term tie
      // variance does real work
      val perUser = ev(s, d).groupBy("user_id")
        .agg(count(lit(1)).cast("double").as("m"))
        .select((col("user_id") % 5).as("g"), col("m"))
      graft.ops.Experiment.jonckheereTerpstra(perUser, col("g"),
        col("m"))
    }),
    "q405_enrichment" -> ((s, d) => {
      // per-source over-representation audit: is English
      // over-represented among LONG documents within each source —
      // the per-domain exact enrichment readout (25 docs/source: the
      // small-n regime where chi-square would be dishonest)
      graft.ops.Experiment.enrichmentTest(t(s, d, "documents"),
          col("source"), col("lang") === "en", col("n_chars") > 500)
        .orderBy("key")
    }),
    "q406_seasonal_anomaly" -> ((s, d) => {
      // the alerting composition: de-weekday the daily series
      // (q381's decomposition), then flag days whose residual sits
      // more than 3 robust MADs off the residual median — the
      // weekday-aware anomaly report (edge days without a full MA
      // window drop)
      val daily = ev(s, d).groupBy(
          datediff(to_date(col("ts")),
            to_date(lit("1970-01-01"))).as("t"))
        .agg(count(lit(1)).as("v"))
      val dec = graft.ops.Temporal.seasonalDecompose(daily, col("t"),
          col("v"), period = 7)
        .filter(col("resid").isNotNull)
        .select(col("t"), col("v"), col("resid"))
        .localCheckpoint(eager = true) // read 3x: med, mad, flags
      val med = dec.agg(expr("percentile(resid, 0.5)").as("med"))
      val withMed = dec.crossJoin(broadcast(med))
      val mad = withMed
        .agg(expr("percentile(abs(resid - med), 0.5)").as("mad"))
      withMed.crossJoin(broadcast(mad))
        .select(col("t"), col("v"), col("resid"),
          (abs(col("resid") - col("med")) > lit(3.0) * col("mad"))
            .as("flagged"))
        .orderBy("t")
    }),
    "q404_bipartite" -> ((s, d) => {
      // two-mode validation: the order-part incidence graph (parts
      // offset into their own id space) IS bipartite by construction
      // — BFS-parity certifies it with zero odd edges; the
      // co-purchase projection is NOT (triangles everywhere) — the
      // same certificate counts its violations. One readout per
      // graph, union'd
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"),
          (col("l_partkey") + lit(1000000000L)).as("p"))
      val incidence = graft.ops.Graph.bipartiteCheck(li, col("o"),
        col("p"), maxDepth = 40)
      val copurch = graft.ops.Graph.bipartiteCheck(
        OpsQueriesP7.copurchase9(s, d), col("a"), col("b"),
        maxDepth = 16)
      incidence.select(lit("incidence").as("graph"), col("*"))
        .unionAll(copurch.select(lit("copurchase").as("graph"),
          col("*")))
        .orderBy("graph")
    }))

  /** Round budget for q401 — an upper bound on mutual-min rounds at
    * every test scale (converged rounds are no-ops on both engines,
    * so over-provisioning is free and keeps one knob for query and
    * oracle). */
  private val matchRounds = 10

  /** The q401 oracle's per-round CTEs — the op's mutual-min round
    * unrolled: per-node struct-min nominee, both-endpoints agreement,
    * matched-node retirement. Generated (the PortableSql
    * ivfTrainCtes precedent) so the round count stays pinned to
    * [[matchRounds]]. */
  private def matchRoundCtes(rounds: Int): String =
    (1 to rounds).map { r =>
      val p = r - 1
      // every act/pr/m is MATERIALIZED: each round reads act{p} three
      // times and pr/m twice — non-materialized CTEs would inline
      // exponentially down to the base scan (the q304 lesson;
      // 3^rounds scans exhausted the process fd table live)
      s"""pr$r AS MATERIALIZED (SELECT id,
             min(struct_pack(h := h, a := a, b := b)) AS m
           FROM (SELECT a AS id, h, a, b FROM act$p
                 UNION ALL SELECT b, h, a, b FROM act$p)
           GROUP BY id),
         m$r AS MATERIALIZED (SELECT e.a, e.b, CAST($r AS BIGINT) AS round
           FROM act$p e
           JOIN pr$r pa ON pa.id = e.a
           JOIN pr$r pb ON pb.id = e.b
           WHERE pa.m = struct_pack(h := e.h, a := e.a, b := e.b)
             AND pb.m = struct_pack(h := e.h, a := e.a, b := e.b)),
         mn$r AS (SELECT a AS id FROM m$r UNION SELECT b FROM m$r),
         act$r AS MATERIALIZED (SELECT e.a, e.b, e.h FROM act$p e
           WHERE NOT EXISTS (SELECT 1 FROM mn$r n
             WHERE n.id = e.a OR n.id = e.b))"""
    }.mkString(",\n")

  val oracle: Map[String, String] = Map(
    "q392_wilcoxon_signed" ->
      """WITH p AS (SELECT user_id,
               count(*) FILTER (WHERE CAST(ts AS DATE) < DATE '2024-01-16')
                 AS pre,
               count(*) FILTER (WHERE CAST(ts AS DATE) >= DATE '2024-01-16')
                 AS post
             FROM events GROUP BY 1),
         d0 AS (SELECT CAST(post AS DOUBLE) - pre AS d FROM p),
         zc AS (SELECT count(*) FILTER (WHERE d = 0) AS n_zero FROM d0),
         pa AS (SELECT abs(d) AS ad, count(*) AS t,
                  count(*) FILTER (WHERE d > 0) AS pos
                FROM d0 WHERE d <> 0 GROUP BY 1),
         r AS (SELECT t, pos,
                 CAST(sum(t) OVER (ORDER BY ad) - t AS BIGINT)
                   + (t + 1) / 2.0 AS midrank
               FROM pa),
         agg AS (SELECT CAST(sum(t) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS n_pos,
                   sum(pos * midrank) AS wp,
                   sum(CAST(t AS HUGEINT) * t * t - t) AS tie
                 FROM r),
         f AS (SELECT agg.n, agg.n_pos, agg.wp,
                 CAST(agg.n AS HUGEINT) * (agg.n + 1) / 4.0 AS mu,
                 CAST(agg.n AS HUGEINT) * (agg.n + 1) * (2 * agg.n + 1)
                     / 24.0
                   - agg.tie / 48.0 AS varw
               FROM agg)
         SELECT coalesce(f.n, 0) AS n, zc.n_zero,
           coalesce(f.n_pos, 0) AS n_pos,
           round(coalesce(f.wp, 0), 4) AS w_plus,
           round(CASE WHEN f.varw > 0
             THEN (f.wp - f.mu) / sqrt(f.varw) ELSE 0.0 END, 4) AS z,
           coalesce(CASE WHEN f.varw > 0
             THEN abs((f.wp - f.mu) / sqrt(f.varw)) > 1.96
             ELSE false END, false) AS significant
         FROM f, zc""",
    "q393_ccf" ->
      """WITH daily AS (SELECT
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS t,
               CAST(count(*) FILTER (WHERE event_type = 'click')
                 AS BIGINT) AS x,
               CAST(count(*) FILTER (WHERE event_type = 'purchase')
                 AS BIGINT) AS y
             FROM events GROUP BY 1),
         lags AS (SELECT CAST(g AS BIGINT) AS lag
                  FROM generate_series(-7, 7) AS gs(g)),
         j AS (SELECT l.lag, a.x, b.y AS ys
               FROM daily a
               CROSS JOIN lags l
               JOIN daily b ON b.t = a.t + l.lag),
         m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(ys) AS BIGINT) AS sy,
                 CAST(sum(x * ys) AS HUGEINT) AS sxy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(ys * ys) AS HUGEINT) AS syy
               FROM j GROUP BY lag)
         SELECT l.lag, coalesce(m.n, 0) AS n,
           round(CASE WHEN m.n >= 2
               AND m.n * sxx - sx * sx > 0 AND m.n * syy - sy * sy > 0
             THEN CAST(m.n * sxy - sx * sy AS DOUBLE) /
               sqrt(CAST(m.n * sxx - sx * sx AS DOUBLE) *
                 CAST(m.n * syy - sy * sy AS DOUBLE))
             END, 4) AS r
         FROM lags l LEFT JOIN m ON m.lag = l.lag ORDER BY l.lag""",
    "q394_residual_diag" ->
      """WITH daily AS (SELECT user_id % 10 AS k,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                 AS t,
               CAST(count(*) AS BIGINT) AS v
             FROM events GROUP BY 1, 2),
         tot AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS sv,
                   CAST(sum(v * v) AS HUGEINT) AS svv
                 FROM daily GROUP BY k),
         sq AS (SELECT d.k, d.t, d.v,
                  d.v - lag(d.v) OVER
                    (PARTITION BY d.k ORDER BY d.t) AS dv,
                  CASE WHEN n * d.v - sv > 0 THEN 1
                       WHEN n * d.v - sv < 0 THEN -1
                       ELSE 0 END AS sgn
                FROM daily d JOIN tot USING (k)),
         dwf AS (SELECT k,
                   CAST(coalesce(sum(dv * dv), 0) AS HUGEINT) AS sdd
                 FROM sq GROUP BY k),
         nz AS (SELECT k, t, sgn,
                  lag(sgn) OVER (PARTITION BY k ORDER BY t) AS prev
                FROM sq WHERE sgn <> 0),
         runs AS (SELECT k,
                    CAST(count(*) FILTER (WHERE sgn > 0) AS BIGINT)
                      AS n_pos,
                    CAST(count(*) FILTER (WHERE sgn < 0) AS BIGINT)
                      AS n_neg,
                    CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn
                      THEN 1 ELSE 0 END) AS BIGINT) AS runs
                  FROM nz GROUP BY k)
         SELECT tot.k AS key, tot.n,
           round(CASE WHEN tot.n * tot.svv - tot.sv * tot.sv > 0
             THEN CAST(tot.n * dwf.sdd AS DOUBLE) /
               CAST(tot.n * tot.svv - tot.sv * tot.sv AS DOUBLE)
             END, 4) AS dw,
           coalesce(runs.n_pos, 0) AS n_pos,
           coalesce(runs.n_neg, 0) AS n_neg,
           coalesce(runs.runs, 0) AS runs,
           round(CASE WHEN runs.n_pos > 0 AND runs.n_neg > 0
               AND (2.0 * runs.n_pos * runs.n_neg *
                 (2.0 * runs.n_pos * runs.n_neg - runs.n_pos
                   - runs.n_neg)) /
               ((runs.n_pos + runs.n_neg) *
                 CAST(runs.n_pos + runs.n_neg AS DOUBLE) *
                 (runs.n_pos + runs.n_neg - 1)) > 0
             THEN (runs.runs - (2.0 * runs.n_pos * runs.n_neg /
                 (runs.n_pos + runs.n_neg) + 1.0)) /
               sqrt((2.0 * runs.n_pos * runs.n_neg *
                 (2.0 * runs.n_pos * runs.n_neg - runs.n_pos
                   - runs.n_neg)) /
               ((runs.n_pos + runs.n_neg) *
                 CAST(runs.n_pos + runs.n_neg AS DOUBLE) *
                 (runs.n_pos + runs.n_neg - 1)))
             END, 4) AS z_runs
         FROM tot JOIN dwf USING (k)
           LEFT JOIN runs ON runs.k = tot.k
         ORDER BY key""",
    "q395_fisher_exact" ->
      """WITH RECURSIVE s AS (SELECT n_nationkey % 2 = 0 AS a,
               n_regionkey IN (1, 3) AS b FROM nation),
         cells AS (SELECT
             CAST(count(*) FILTER (WHERE a AND b) AS BIGINT) AS n11,
             CAST(count(*) FILTER (WHERE a AND NOT b) AS BIGINT) AS n12,
             CAST(count(*) FILTER (WHERE NOT a AND b) AS BIGINT) AS n21,
             CAST(count(*) FILTER (WHERE NOT a AND NOT b) AS BIGINT)
               AS n22
           FROM s),
         marg AS (SELECT *, n11 + n12 AS r1, n21 + n22 AS r2,
                    n11 + n21 AS c1, n12 + n22 AS c2,
                    n11 + n12 + n21 + n22 AS nn
                  FROM cells),
         -- ln x! as a strictly SEQUENTIAL left fold (lf(x) =
         -- ((0 + ln 2) + ln 3) + ...), the exact operand order of
         -- the engine's aggregate() fold
         lft(i, lf) AS (
           SELECT CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)
           UNION ALL
           SELECT i + 1,
             CASE WHEN i + 1 >= 2 THEN lf + ln(i + 1)
                  ELSE CAST(0.0 AS DOUBLE) END
           FROM lft WHERE i < (SELECT nn FROM marg)),
         com AS (SELECT m.*,
             (SELECT lf FROM lft WHERE i = m.r1)
               + (SELECT lf FROM lft WHERE i = m.r2)
               + (SELECT lf FROM lft WHERE i = m.c1)
               + (SELECT lf FROM lft WHERE i = m.c2)
               - (SELECT lf FROM lft WHERE i = m.nn) AS lbase
           FROM marg m),
         obs AS (SELECT c.*,
             exp(c.lbase
               - (SELECT lf FROM lft WHERE i = c.n11)
               - (SELECT lf FROM lft WHERE i = c.r1 - c.n11)
               - (SELECT lf FROM lft WHERE i = c.c1 - c.n11)
               - (SELECT lf FROM lft
                  WHERE i = c.nn - c.r1 - c.c1 + c.n11)) AS pmf_obs
           FROM com c),
         pm AS (SELECT o.*, l.i AS k,
             exp(o.lbase
               - l.lf
               - (SELECT lf FROM lft WHERE i = o.r1 - l.i)
               - (SELECT lf FROM lft WHERE i = o.c1 - l.i)
               - (SELECT lf FROM lft
                  WHERE i = o.nn - o.r1 - o.c1 + l.i)) AS pmf
           FROM obs o JOIN lft l
             ON l.i >= greatest(0, o.r1 + o.c1 - o.nn)
               AND l.i <= least(o.r1, o.c1))
         SELECT n11, n12, n21, n22,
           round(CASE WHEN n12 * n21 > 0
             THEN n11 * n22 / CAST(n12 * n21 AS DOUBLE) END, 4)
             AS odds_ratio,
           round(least(sum(CASE WHEN pmf <= pmf_obs * (1 + 1e-7)
             THEN pmf ELSE 0.0 END), 1.0), 6) AS p_two,
           round(least(sum(CASE WHEN pmf <= pmf_obs * (1 + 1e-7)
             THEN pmf ELSE 0.0 END), 1.0), 6) < 0.05 AS significant
         FROM pm GROUP BY n11, n12, n21, n22""",
    "q396_link_pred_w" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
               FROM lineitem WHERE l_orderkey % 9 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         adj AS (SELECT a AS y, b AS x FROM e0
                 UNION ALL SELECT b, a FROM e0),
         deg AS (SELECT id, count(*) AS deg FROM (
                   SELECT a AS id FROM e0
                   UNION ALL SELECT b FROM e0) GROUP BY id),
         wg AS (SELECT p.x AS a, q.x AS b, p.y AS y
                FROM adj p JOIN adj q ON q.y = p.y AND p.x < q.x),
         sc AS (SELECT wg.a, wg.b, count(*) AS cn,
                  CAST(sum(CAST(floor(1000000.0 / dg.deg) AS BIGINT))
                    AS BIGINT) AS ra_micro,
                  CAST(sum(CAST(floor(1000000.0 / ln(dg.deg))
                    AS BIGINT)) AS BIGINT) AS aa_micro
                FROM wg JOIN deg dg ON dg.id = wg.y
                GROUP BY 1, 2)
         SELECT c.a, c.b, c.cn, c.ra_micro, c.aa_micro
         FROM sc c
         WHERE cn >= 2 AND NOT EXISTS (
           SELECT 1 FROM e0 WHERE e0.a = c.a AND e0.b = c.b)
         ORDER BY c.a, c.b""",
    "q397_random_walks" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
               FROM lineitem WHERE l_orderkey % 9 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         adj AS (SELECT a AS s, b AS t FROM e0
                 UNION ALL SELECT b, a FROM e0),
         n0 AS (SELECT DISTINCT s AS start, s AS node FROM adj),
         s1 AS (SELECT start, node FROM (
                  SELECT n0.start, a.t AS node,
                    row_number() OVER (PARTITION BY n0.start
                      ORDER BY md5(concat_ws(':', n0.start, 1, a.t)),
                        a.t) AS rn
                  FROM n0 JOIN adj a ON a.s = n0.node)
                WHERE rn = 1),
         s2 AS (SELECT start, node FROM (
                  SELECT s1.start, a.t AS node,
                    row_number() OVER (PARTITION BY s1.start
                      ORDER BY md5(concat_ws(':', s1.start, 2, a.t)),
                        a.t) AS rn
                  FROM s1 JOIN adj a ON a.s = s1.node)
                WHERE rn = 1),
         s3 AS (SELECT start, node FROM (
                  SELECT s2.start, a.t AS node,
                    row_number() OVER (PARTITION BY s2.start
                      ORDER BY md5(concat_ws(':', s2.start, 3, a.t)),
                        a.t) AS rn
                  FROM s2 JOIN adj a ON a.s = s2.node)
                WHERE rn = 1),
         walks AS (SELECT start, CAST(0 AS BIGINT) AS step, node FROM n0
                   UNION ALL SELECT start, 1, node FROM s1
                   UNION ALL SELECT start, 2, node FROM s2
                   UNION ALL SELECT start, 3, node FROM s3)
         SELECT w1.node AS center, w2.node AS context,
           count(*) AS cnt
         FROM walks w1 JOIN walks w2
           ON w1.start = w2.start AND w1.step <> w2.step
             AND abs(w1.step - w2.step) <= 2
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q398_diameter" ->
      """WITH RECURSIVE li AS (SELECT l_orderkey AS o, l_partkey AS p
               FROM lineitem WHERE l_orderkey % 9 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         adj AS (SELECT a AS s, b AS t FROM e0
                 UNION ALL SELECT b, a FROM e0),
         pv AS (SELECT min(s) AS id FROM adj),
         b1(id, dist) AS (
           SELECT id, CAST(0 AS BIGINT) FROM pv
           UNION
           SELECT a.t, b1.dist + 1
           FROM b1 JOIN adj a ON a.s = b1.id WHERE b1.dist < 12),
         d1 AS (SELECT id, min(dist) AS dist FROM b1 GROUP BY id),
         far1 AS (SELECT id, dist FROM d1
                  ORDER BY dist DESC, id LIMIT 1),
         b2(id, dist) AS (
           SELECT id, CAST(0 AS BIGINT) FROM far1
           UNION
           SELECT a.t, b2.dist + 1
           FROM b2 JOIN adj a ON a.s = b2.id WHERE b2.dist < 12),
         d2 AS (SELECT id, min(dist) AS dist FROM b2 GROUP BY id),
         far2 AS (SELECT id, dist FROM d2
                  ORDER BY dist DESC, id LIMIT 1)
         SELECT pv.id AS pivot, far1.dist AS ecc_pivot,
           far1.id AS far_node, far2.dist AS diameter_lb,
           far2.id AS far_end,
           (SELECT CAST(count(*) AS BIGINT) FROM d2) AS n_reached
         FROM pv, far1, far2""",
    "q399_survivorship" ->
      """WITH r AS (SELECT doc_id, lang, source, n_chars,
               CAST('0x' || substr(md5(substr(text, 1, 40)), 1, 15)
                 AS BIGINT) AS cluster
             FROM documents),
         canon AS (SELECT cluster, count(*) AS n_records,
                     min(struct_pack(r0 := -n_chars, rid := doc_id))
                       AS m
                   FROM r GROUP BY cluster),
         cn AS (SELECT cluster, n_records,
                  m.rid AS canonical_id FROM canon),
         lv AS (SELECT cluster, lang AS v, count(*) AS c FROM r
                WHERE lang IS NOT NULL GROUP BY 1, 2),
         lw AS (SELECT cluster,
                  min(struct_pack(nc := -c, v := v)) AS w FROM lv
                GROUP BY cluster),
         sv AS (SELECT cluster, source AS v, count(*) AS c FROM r
                WHERE source IS NOT NULL GROUP BY 1, 2),
         sw AS (SELECT cluster,
                  min(struct_pack(nc := -c, v := v)) AS w FROM sv
                GROUP BY cluster)
         SELECT cn.cluster, cn.n_records, cn.canonical_id,
           lw.w.v AS lang, sw.w.v AS source
         FROM cn LEFT JOIN lw USING (cluster)
           LEFT JOIN sw USING (cluster)
         ORDER BY cn.cluster""",
    "q400_friedman" ->
      """WITH cells AS (SELECT user_id % 15 AS blk,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                 AS trt,
               CAST(count(*) AS DOUBLE) AS v
             FROM events GROUP BY 1, 2),
         kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k
                FROM cells),
         bl AS (SELECT blk, count(*) AS nt FROM cells GROUP BY 1),
         complete AS (SELECT blk FROM bl, kk WHERE nt = kk.k),
         dropped AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
                     FROM bl, kk WHERE nt <> kk.k),
         ranked AS (SELECT c.blk, c.trt, c.v,
                      rank() OVER (PARTITION BY c.blk ORDER BY c.v)
                        + (count(*) OVER (PARTITION BY c.blk, c.v)
                          - 1) / 2.0 AS midrank
                    FROM cells c JOIN complete USING (blk)),
         rj AS (SELECT sum(rj * rj) AS rj2 FROM (
                  SELECT trt, sum(midrank) AS rj FROM ranked
                  GROUP BY trt)),
         bb AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS b
                FROM ranked),
         tie AS (SELECT CAST(coalesce(sum(t * t * t - t), 0)
                   AS BIGINT) AS tsum
                 FROM (SELECT blk, v, count(*) AS t FROM ranked
                       GROUP BY 1, 2))
         SELECT bb.b AS b_blocks, kk.k AS k_treatments,
           dropped.n_dropped,
           round(12.0 * rj.rj2 / (bb.b * kk.k * (kk.k + 1))
             - 3.0 * bb.b * (kk.k + 1), 4) AS chi2,
           round(CASE WHEN 1.0 - tie.tsum /
               CAST(bb.b * kk.k * (kk.k * kk.k - 1) AS DOUBLE) > 0
             THEN (12.0 * rj.rj2 / (bb.b * kk.k * (kk.k + 1))
               - 3.0 * bb.b * (kk.k + 1)) /
               (1.0 - tie.tsum /
                 CAST(bb.b * kk.k * (kk.k * kk.k - 1) AS DOUBLE))
             END, 4) AS chi2_tie,
           kk.k - 1 AS dof
         FROM rj, bb, kk, tie, dropped""",
    "q401_matching" ->
      s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
               FROM lineitem WHERE l_orderkey % 9 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         act0 AS MATERIALIZED (SELECT a, b,
                  md5(concat_ws(':', a, b)) AS h
                  FROM e0),
         ${matchRoundCtes(matchRounds)},
         sel AS (${(1 to matchRounds)
            .map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")})
         SELECT a, b, round FROM sel ORDER BY a, b""",
    "q402_cochran_q" ->
      """WITH cells AS (SELECT user_id AS blk,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                 AS trt,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1
                 ELSE 0 END) AS BIGINT) AS x
             FROM events GROUP BY 1, 2),
         kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k
                FROM cells),
         bl AS (SELECT blk, count(*) AS nt,
                  CAST(sum(x) AS BIGINT) AS u
                FROM cells GROUP BY 1),
         complete AS (SELECT blk, u FROM bl, kk WHERE nt = kk.k),
         dropped AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
                     FROM bl, kk WHERE nt <> kk.k),
         bu AS (SELECT CAST(count(*) AS BIGINT) AS b,
                  CAST(sum(u) AS BIGINT) AS nn,
                  CAST(sum(u * u) AS BIGINT) AS uu
                FROM complete),
         tj AS (SELECT trt, CAST(sum(x) AS BIGINT) AS t
                FROM cells JOIN complete USING (blk) GROUP BY trt),
         num AS (SELECT CAST(sum((kk.k * t - bu.nn) *
                   (kk.k * t - bu.nn)) AS BIGINT) AS num
                 FROM tj, kk, bu)
         SELECT bu.b AS b_blocks, kk.k AS k_treatments,
           dropped.n_dropped, bu.nn AS n_success,
           round(CASE WHEN kk.k * bu.nn - bu.uu > 0
             THEN CAST((kk.k - 1) * num.num AS DOUBLE) /
               CAST(kk.k * (kk.k * bu.nn - bu.uu) AS DOUBLE)
             END, 4) AS q,
           kk.k - 1 AS dof
         FROM bu, kk, dropped, num""",
    "q403_jonckheere" ->
      """WITH pu AS (SELECT user_id % 5 AS g,
               CAST(count(*) AS DOUBLE) AS m
             FROM events GROUP BY user_id, 1),
         cells AS (SELECT g, m, CAST(count(*) AS BIGINT) AS c
                   FROM pu GROUP BY 1, 2),
         jj AS (SELECT coalesce(sum(
                 CASE WHEN y.m > x.m THEN CAST(x.c * y.c AS DOUBLE)
                      WHEN y.m = x.m THEN x.c * y.c / 2.0
                      ELSE 0.0 END), 0.0) AS j
                FROM cells x JOIN cells y ON x.g < y.g),
         grp AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   sum(CAST(ng AS HUGEINT) * ng) AS n2,
                   sum(CAST(ng AS HUGEINT) * (ng - 1) * (ng * 2 + 5))
                     AS ga,
                   sum(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2))
                     AS gb,
                   CAST(sum(ng * (ng - 1)) AS BIGINT) AS gc
                 FROM (SELECT g, CAST(sum(c) AS BIGINT) AS ng
                       FROM cells GROUP BY g)),
         ties AS (SELECT
                    coalesce(sum(CAST(t AS HUGEINT) * (t - 1)
                      * (t * 2 + 5)), 0) AS ta,
                    coalesce(sum(CAST(t AS HUGEINT) * (t - 1)
                      * (t - 2)), 0) AS tb,
                    CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT)
                      AS tc
                  FROM (SELECT m, CAST(sum(c) AS BIGINT) AS t
                        FROM cells GROUP BY m)),
         f AS (SELECT jj.j, grp.n, grp.k,
                 (CAST(grp.n AS HUGEINT) * grp.n - grp.n2) / 4.0 AS mu,
                 CAST(CAST(grp.n AS HUGEINT) * (grp.n - 1)
                       * (grp.n * 2 + 5)
                     - grp.ga - ties.ta AS DOUBLE) / 72.0
                   + CAST(CAST(grp.gb AS HUGEINT) * ties.tb
                       AS DOUBLE) /
                     (36.0 * grp.n * (grp.n - 1) * (grp.n - 2))
                   + CAST(CAST(grp.gc AS HUGEINT) * ties.tc
                       AS DOUBLE) /
                     (8.0 * grp.n * (grp.n - 1)) AS var_j
               FROM jj, grp, ties)
         SELECT n, k AS k_groups, round(j, 4) AS j,
           round(mu, 4) AS mu,
           round(CASE WHEN n > 2 THEN var_j END, 4) AS var_j,
           round(CASE WHEN n > 2 AND var_j > 0
             THEN (j - mu) / sqrt(var_j) END, 4) AS z,
           coalesce(CASE WHEN n > 2 AND var_j > 0
             THEN abs((j - mu) / sqrt(var_j)) > 1.96 END, false)
             AS trending
         FROM f""",
    "q405_enrichment" ->
      """WITH RECURSIVE s AS (SELECT source AS k, lang = 'en' AS a,
               n_chars > 500 AS b FROM documents
             WHERE source IS NOT NULL AND lang IS NOT NULL
               AND n_chars IS NOT NULL),
         cells AS (SELECT k,
             CAST(count(*) FILTER (WHERE a AND b) AS BIGINT) AS n11,
             CAST(count(*) FILTER (WHERE a AND NOT b) AS BIGINT)
               AS n12,
             CAST(count(*) FILTER (WHERE NOT a AND b) AS BIGINT)
               AS n21,
             CAST(count(*) FILTER (WHERE NOT a AND NOT b) AS BIGINT)
               AS n22
           FROM s GROUP BY k),
         marg AS (SELECT *, n11 + n12 AS r1, n21 + n22 AS r2,
                    n11 + n21 AS c1, n12 + n22 AS c2,
                    n11 + n12 + n21 + n22 AS nn
                  FROM cells),
         mx AS (SELECT max(nn) AS m FROM marg),
         lft(i, lf) AS (
           SELECT CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)
           UNION ALL
           SELECT i + 1,
             CASE WHEN i + 1 >= 2 THEN lf + ln(i + 1)
                  ELSE CAST(0.0 AS DOUBLE) END
           FROM lft WHERE i < (SELECT m FROM mx)),
         base AS (SELECT c.*,
             (SELECT lf FROM lft WHERE i = c.r1)
               + (SELECT lf FROM lft WHERE i = c.r2)
               + (SELECT lf FROM lft WHERE i = c.c1)
               + (SELECT lf FROM lft WHERE i = c.c2)
               - (SELECT lf FROM lft WHERE i = c.nn) AS lbase
           FROM marg c),
         sup AS (SELECT b2.*, l.i AS j,
             exp(b2.lbase - l.lf
               - (SELECT lf FROM lft WHERE i = b2.r1 - l.i)
               - (SELECT lf FROM lft WHERE i = b2.c1 - l.i)
               - (SELECT lf FROM lft
                  WHERE i = b2.nn - b2.r1 - b2.c1 + l.i)) AS pmf
           FROM base b2 JOIN lft l
             ON l.i >= b2.n11 AND l.i <= least(b2.r1, b2.c1))
         SELECT k AS key, n11, n12, n21, n22,
           round(CASE WHEN nn > 0
             THEN r1 * c1 / CAST(nn AS DOUBLE) END, 4) AS expected,
           round(least(sum(pmf), 1.0), 6) AS p_upper,
           round(least(sum(pmf), 1.0), 6) < 0.05 AS enriched
         FROM sup GROUP BY k, n11, n12, n21, n22, r1, c1, nn
         ORDER BY key""",
    "q406_seasonal_anomaly" ->
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
                FROM d2 WHERE detr IS NOT NULL GROUP BY phase),
         r1 AS (SELECT d2.t, d2.v,
                  round(CAST(detr AS DOUBLE) / 7 - se.seas, 4)
                    AS resid
                FROM d2 LEFT JOIN se USING (phase)
                WHERE detr IS NOT NULL),
         med AS (SELECT quantile_cont(resid, 0.5) AS med FROM r1),
         mad AS (SELECT quantile_cont(abs(resid - med.med), 0.5)
                   AS mad
                 FROM r1, med)
         SELECT r1.t, r1.v, r1.resid,
           abs(r1.resid - med.med) > 3.0 * mad.mad AS flagged
         FROM r1, med, mad ORDER BY r1.t""",
    "q404_bipartite" ->
      """WITH RECURSIVE li0 AS (SELECT l_orderkey AS o,
               l_partkey + 1000000000 AS p
             FROM lineitem WHERE l_orderkey % 9 = 0),
         ei AS (SELECT DISTINCT o AS a, p AS b FROM li0),
         adji AS (SELECT a AS s, b AS t FROM ei
                  UNION ALL SELECT b, a FROM ei),
         pvi AS (SELECT min(s) AS id FROM adji),
         bi(id, dist) AS (
           SELECT id, CAST(0 AS BIGINT) FROM pvi
           UNION
           SELECT a.t, bi.dist + 1
           FROM bi JOIN adji a ON a.s = bi.id WHERE bi.dist < 40),
         di AS MATERIALIZED (SELECT id, min(dist) AS dist FROM bi
                             GROUP BY id),
         pari AS (SELECT count(*) AS n_edges,
                    CAST(sum(CASE WHEN (da.dist + db.dist) % 2 = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS odd_edges
                  FROM ei e
                  JOIN di da ON da.id = e.a
                  JOIN di db ON db.id = e.b),
         li9 AS (SELECT l_orderkey AS o, l_partkey AS p
                 FROM lineitem WHERE l_orderkey % 9 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li9 x JOIN li9 y ON x.o = y.o AND x.p < y.p),
         adjc AS (SELECT a AS s, b AS t FROM e0
                  UNION ALL SELECT b, a FROM e0),
         pvc AS (SELECT min(s) AS id FROM adjc),
         bc(id, dist) AS (
           SELECT id, CAST(0 AS BIGINT) FROM pvc
           UNION
           SELECT a.t, bc.dist + 1
           FROM bc JOIN adjc a ON a.s = bc.id WHERE bc.dist < 16),
         dc AS MATERIALIZED (SELECT id, min(dist) AS dist FROM bc
                             GROUP BY id),
         parc AS (SELECT count(*) AS n_edges,
                    CAST(sum(CASE WHEN (da.dist + db.dist) % 2 = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS odd_edges
                  FROM e0 e
                  JOIN dc da ON da.id = e.a
                  JOIN dc db ON db.id = e.b)
         SELECT 'incidence' AS graph, pvi.id AS seed,
           (SELECT CAST(count(*) AS BIGINT) FROM di) AS n_reached,
           CAST(pari.n_edges AS BIGINT) AS n_edges, pari.odd_edges,
           pari.odd_edges = 0 AS bipartite
         FROM pvi, pari
         UNION ALL
         SELECT 'copurchase', pvc.id,
           (SELECT CAST(count(*) AS BIGINT) FROM dc),
           CAST(parc.n_edges AS BIGINT), parc.odd_edges,
           parc.odd_edges = 0
         FROM pvc, parc
         ORDER BY graph"""
  )
}
