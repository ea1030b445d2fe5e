package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}

/** Helpers + oracle-SQL builders shared by the wave-split parts of the
  * ops query registry ([[OpsQueries]] merges the parts; this object is
  * the one source the parts import — a mechanical extraction of the
  * round-11 monolith's private section, bodies verbatim). */
private[queries] object QShared {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to TIMESTAMP (LTZ) — the same
    * NANOS/MICROS adaptation as T2Queries.t (see the comment there); the
    * temporal-join queries need real timestamp arithmetic, not just
    * ordering. */
  def ev(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    raw.withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** q249's attribution candidate set with the timestamps carried:
    * same-user clicks inside each purchase's trailing 3-day window via
    * the KEYED range join (day buckets), as
    * `(pid, cid, t_ts, c_ts)` — shared by the q264/q265 credit
    * models. */
  def attributionTouches(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("cid0"), col("user_id"), col("ts"))
    val windows = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid0"), col("user_id").as("pu"),
        (col("ts") - expr("INTERVAL 3 DAYS")).as("st"), col("ts").as("en"))
    graft.ops.Temporal.rangeJoin(clicks, col("cid0"), col("ts"),
        windows, col("pid0"), col("st"), col("en"),
        bucketWidthMicros = 24L * 3600 * 1000000L,
        pPayload = Seq("t_ts" -> col("ts")),
        iPayload = Seq("c_ts" -> col("en")),
        pKeys = Seq(col("user_id")), iKeys = Seq(col("pu")))
      .select(col("i_id").as("pid"), col("p_id").as("cid"),
        col("t_ts"), col("c_ts"))
  }

  /** The q271 oracle: journeys → transition matrix → `iters` unrolled
    * value-iteration sweeps computing every removal variant in one
    * (variant × state) chain — the same fixed sweeps the driver solver
    * runs, so the numbers agree to double precision. Generated because
    * SQL has no loop; each CTE is one Jacobi sweep. */
  def removalEffectOracle(iters: Int): String = {
    val sweeps = (1 to iters).map { k =>
      s"""v$k AS MATERIALIZED (SELECT x.rm, t.f AS s,
         sum(t.p * CASE WHEN t.t = '__CONV__' THEN 1.0
             WHEN t.t = '__NULL__' OR t.t = x.rm THEN 0.0
             ELSE coalesce(pv.v, 0.0) END) AS v
       FROM tr t CROSS JOIN vars x
       LEFT JOIN v${k - 1} pv ON pv.rm = x.rm AND pv.s = t.t
       GROUP BY x.rm, t.f)"""
    }.mkString(",\n         ")
    s"""WITH ed AS (SELECT *, CAST(ts AS DATE) AS dd FROM events),
         fp AS (SELECT user_id, dd, min(ts) AS fpt FROM ed
               WHERE event_type = 'purchase' GROUP BY user_id, dd),
         units AS (SELECT DISTINCT user_id, dd FROM ed),
         pre AS (SELECT e.user_id, e.dd,
               list(e.event_type ORDER BY e.ts, e.event_id) AS p
             FROM ed e LEFT JOIN fp USING (user_id, dd)
             WHERE fp.fpt IS NULL OR e.ts < fp.fpt
             GROUP BY e.user_id, e.dd),
         pth AS (SELECT coalesce(pre.p, CAST([] AS VARCHAR[])) AS p,
               fp.fpt IS NOT NULL AS cv
             FROM units u LEFT JOIN pre USING (user_id, dd)
             LEFT JOIN fp USING (user_id, dd)),
         pairs AS (SELECT unnest(['__START__'] || p) AS f,
               unnest(p || [CASE WHEN cv THEN '__CONV__'
                 ELSE '__NULL__' END]) AS t
             FROM pth),
         tr AS (SELECT f, t, count(*)::DOUBLE /
               sum(count(*)) OVER (PARTITION BY f) AS p
             FROM pairs GROUP BY f, t),
         ch AS (SELECT DISTINCT f AS c FROM tr
               WHERE f <> '__START__'),
         vars AS (SELECT c AS rm FROM ch
             UNION ALL SELECT '__BASE__'),
         sts AS (SELECT c AS s FROM ch
             UNION ALL SELECT '__START__'),
         v0 AS (SELECT x.rm, s.s, 0.0 AS v
             FROM vars x CROSS JOIN sts s),
         $sweeps,
         fin AS (SELECT rm, v FROM v$iters WHERE s = '__START__'),
         re AS (SELECT c.c AS channel,
               (SELECT v FROM fin WHERE rm = '__BASE__') AS pb,
               f.v AS pc
             FROM ch c JOIN fin f ON f.rm = c.c),
         re2 AS (SELECT channel, pb, pc,
               CASE WHEN pb > 0 THEN greatest(pb - pc, 0) / pb
                 ELSE 0.0 END AS r
             FROM re)
         SELECT channel, round(pb, 4) AS p_base, round(pc, 4) AS p_removed,
           round(r, 4) AS removal_effect,
           CASE WHEN sum(r) OVER () > 0
             THEN round(r / sum(r) OVER (), 4) END AS credit
         FROM re2 ORDER BY channel"""
  }

  /** Deterministic re-lining of the single-line word-bag corpus into
    * 4-token units joined by `sep` — the fixture transform the line/
    * paragraph-dedup queries (q96, q127, q133) share. Returns
    * `(doc_id, wtext)`. */
  def wrapped4(docs: DataFrame, sep: String = "\n"): DataFrame =
    wrappedN(docs, 4, sep)

  def wrappedN(docs: DataFrame, n: Int, sep: String): DataFrame = {
    val toks = array_remove(split(col("text"), "\\s+"), "")
    docs.select(col("doc_id"),
      when(size(toks) === 0, lit("")).otherwise(
        array_join(transform(
          sequence(lit(0), ceil(size(toks) / lit(n.toDouble)).cast("int") - 1),
          i => concat_ws(" ", slice(toks, i * n + 1, lit(n)))), sep))
        .as("wtext"))
  }

  val qvecScala: Array[Float] = Array.fill(64)(0.125f)
  // second fixed query vector for the batched-search query: alternating sign
  val qvec2Scala: Array[Float] =
    Array.tabulate(64)(i => if (i % 2 == 0) 0.125f else -0.125f)
  def vecSql(v: Array[Float]): String =
    v.map(x => f"$x%.3f").mkString("[", ", ", "]")

  /** Fixed merge list for the q91 tokenizer-inference query (what
    * [[graft.ops.Bpe.train]] learns on the sf0.01 corpus; any literal
    * list is equally valid — query and oracle apply the same one). */
  val bpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"), ("m", "er"))

  /** The q365 oracle: `rounds` unrolled WEIGHTED peel passes — the
    * [[kCoreOracle]] stance with the threshold on `Σw` instead of the
    * neighbor count; `rounds` must exceed rounds-to-fixpoint at
    * verification scale (measured ≤ 6 at sf0.001/0.01/0.1 for k = 20;
    * converged rounds are idempotent). */
  def kCoreWeightedOracle(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (SELECT id FROM (
           SELECT id, CAST(sum(w) AS BIGINT) AS wd FROM (
             SELECT a AS id, w FROM e${i - 1}
             UNION ALL SELECT b, w FROM e${i - 1})
           GROUP BY id) WHERE wd >= $k),
         e$i AS MATERIALIZED (SELECT a, b, w FROM e${i - 1}
           WHERE a IN (SELECT id FROM n$i) AND b IN (SELECT id FROM n$i))"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 3 = 0),
         e0 AS (SELECT x.p AS a, y.p AS b, count(*) AS w
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
                GROUP BY 1, 2),
         $steps
         SELECT id, CAST(sum(w) AS BIGINT) AS core_weight FROM (
           SELECT a AS id, w FROM e$rounds
           UNION ALL SELECT b, w FROM e$rounds)
         GROUP BY id HAVING CAST(sum(w) AS BIGINT) >= $k ORDER BY id"""
  }

  /** The q366 oracle: the q164 integer power iterations with each vote
    * weighted — `floor(rank·w / Σw)` per edge, `//` = DuckDB integer
    * division over non-negative operands = Spark's `div`. */
  def pageRankWeightedOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""s$i AS (SELECT e.dst, sum(r.r * e.w // d.sw) AS s
               FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON r.id = e.src
               GROUP BY e.dst),
         r$i AS (SELECT n.id,
                   CAST(150000 + coalesce(s.s, 0) * 85 // 100 AS BIGINT) AS r
                 FROM nodes n LEFT JOIN s$i s ON n.id = s.dst)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e AS (SELECT x.p AS src, y.p AS dst, count(*) AS w
               FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
               GROUP BY 1, 2),
         deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM e GROUP BY src),
         nodes AS (SELECT DISTINCT id FROM (
                     SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         $iterCtes
         SELECT id, r AS rank_micro FROM r$iters
         ORDER BY rank_micro DESC, id LIMIT 25"""
  }

  def kCoreOracle(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (SELECT id FROM (
           SELECT id, count(*) AS c FROM (
             SELECT a AS id FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
           GROUP BY id) WHERE c >= $k),
         e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
           WHERE a IN (SELECT id FROM n$i) AND b IN (SELECT id FROM n$i))"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 3 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         $steps
         SELECT id, count(*) AS core_degree FROM (
           SELECT a AS id FROM e$rounds UNION ALL SELECT b FROM e$rounds)
         GROUP BY id HAVING count(*) >= $k ORDER BY id"""
  }

  /** The q343 oracle: `iters` unrolled Katz rounds — integer
    * micro-units with `Σ·α // 100` (operands non-negative, so floor
    * division equals Spark's `div`), the q164 PageRank pattern. */
  def katzOracle(alphaPct: Int, iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""x$i AS MATERIALIZED (SELECT n.id,
           1000000 + coalesce(s.s, 0) * $alphaPct // 100 AS x
         FROM nodes n LEFT JOIN (
           SELECT e.dst, CAST(sum(x) AS BIGINT) AS s
           FROM e JOIN x${i - 1} v ON v.id = e.src GROUP BY e.dst) s
           ON s.dst = n.id)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e AS (SELECT DISTINCT x.p AS src, y.p AS dst
               FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         x0 AS (SELECT id, CAST(1000000 AS BIGINT) AS x FROM nodes),
         $steps
         SELECT id, CAST(x AS BIGINT) AS katz_micro
         FROM x$iters ORDER BY id"""
  }

  /** The q344 oracle: the Brandes pivot replay unrolled per pivot and
    * level — forward sigma via level-frontier joins (anti-joined
    * against the visited prefix), backward deltas via the successor
    * join with the EXACT (σv/σw)·(1+δw) association the Spark pass
    * uses. Pivot ids must be scale-stable literals (the two smallest
    * %997 part keys are 0 and 997 at every shipped sf — part keys
    * start at 0; a pivot absent from the graph contributes nothing in
    * either engine). */
  def betweennessOracle(pivots: Seq[Long], depth: Int): String = {
    val perPivot = pivots.map { p =>
      val fwd = (1 to depth).map { i =>
        s"""l${i}_$p AS MATERIALIZED (
             SELECT adj.t AS id, CAST(sum(l.sig) AS BIGINT) AS sig
             FROM l${i - 1}_$p l JOIN adj ON adj.s = l.id
             WHERE adj.t NOT IN (SELECT id FROM v${i - 1}_$p)
             GROUP BY adj.t),
           v${i}_$p AS MATERIALIZED (
             SELECT id FROM v${i - 1}_$p
             UNION ALL SELECT id FROM l${i}_$p)"""
      }.mkString(",\n         ")
      val bwd = (depth - 1 to 0 by -1).map { i =>
        val upper =
          if (i == depth - 1) s"(SELECT id, sig, 0.0 AS d FROM l${depth}_$p)"
          else s"d${i + 1}_$p"
        // the LEFT join keeps zero-delta members in the level frame:
        // dead-end nodes still pass their (1 + 0) term down
        s"""c${i}_$p AS MATERIALIZED (
             SELECT l.id, sum(CAST(l.sig AS DOUBLE) / u.sig * (1 + u.d))
                 AS d
             FROM $upper u JOIN adj ON adj.t = u.id
               JOIN l${i}_$p l ON l.id = adj.s
             GROUP BY l.id),
           d${i}_$p AS MATERIALIZED (
             SELECT l.id, l.sig, coalesce(c.d, 0.0) AS d
             FROM l${i}_$p l LEFT JOIN c${i}_$p c ON c.id = l.id)"""
      }.mkString(",\n         ")
      val scoreLevels = (1 until depth)
        .map(i => s"SELECT id, d FROM d${i}_$p").mkString("\n           UNION ALL ")
      (s"""l0_$p AS (SELECT CAST($p AS BIGINT) AS id,
             CAST(1 AS BIGINT) AS sig),
         v0_$p AS (SELECT id FROM l0_$p),
         $fwd,
         $bwd""",
       scoreLevels)
    }
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         adj AS (SELECT a AS s, b AS t FROM e0
                 UNION ALL SELECT b, a FROM e0),
         ${perPivot.map(_._1).mkString(",\n         ")}
         SELECT id, round(sum(d), 4) AS betweenness FROM (
           ${perPivot.map(_._2).mkString("\n           UNION ALL ")})
         GROUP BY id HAVING round(sum(d), 4) > 0 ORDER BY id"""
  }

  /** The q361 oracle: deterministic one-level Louvain unrolled per
    * round — per round the community degree masses (`tot`), the
    * node→neighbor-community edge counts (`kin`), the exact integer
    * gain score `2m·kin − deg·(tot − [own]·deg)`, the direction-gated
    * (score desc, c asc) argmax, and the strictly-better move — the
    * EXACT association [[graft.ops.Graph.louvainOneLevel]] uses, so
    * the assignments agree row for row. */
  /** One Louvain level's unrolled round CTEs — parameterized over the
    * CTE prefix and the adjacency/degree/mass table names so both the
    * unweighted level-1 and the weighted (contracted) level-2 replay
    * share one generator. `weighted` switches kin from count(*) to
    * Σw. Produces `<p>c0 … <p>c<rounds>`. */
  def louvainRoundCtes(p: String, adj: String, deg: String,
      mTbl: String, rounds: Int, weighted: Boolean): String = {
    val kinAgg = if (weighted) "CAST(sum(a.w) AS BIGINT)" else "count(*)"
    (0 until rounds).map { r =>
      s"""${p}tot$r AS MATERIALIZED (SELECT c,
             CAST(sum(deg) AS BIGINT) AS tot
             FROM ${p}c$r JOIN $deg USING (id) GROUP BY c),
         ${p}kin$r AS MATERIALIZED (SELECT a.s AS id, cm.c,
             $kinAgg AS kin
             FROM $adj a JOIN ${p}c$r cm ON cm.id = a.t
             GROUP BY a.s, cm.c),
         ${p}cand$r AS (SELECT id, c, CAST(max(kin) AS BIGINT) AS kin
             FROM (SELECT id, c, kin FROM ${p}kin$r
               UNION ALL SELECT id, c, 0 FROM ${p}c$r) GROUP BY id, c),
         ${p}sc$r AS MATERIALIZED (SELECT cd.id, cd.c, cur.c AS cc,
               2 * $mTbl.m * cd.kin - d.deg *
                 (t.tot - CASE WHEN cd.c = cur.c THEN d.deg ELSE 0 END)
                 AS score
             FROM ${p}cand$r cd JOIN ${p}c$r cur ON cur.id = cd.id
               JOIN $deg d ON d.id = cd.id
               JOIN ${p}tot$r t ON t.c = cd.c
               CROSS JOIN $mTbl),
         ${p}bst$r AS (SELECT id, c AS best_c, score AS best_s FROM (
               SELECT id, c, score, row_number() OVER (PARTITION BY id
                 ORDER BY score DESC, c) AS rn FROM ${p}sc$r
               WHERE ${if (r % 2 == 0) "c < cc" else "c > cc"})
             WHERE rn = 1),
         ${p}sty$r AS (SELECT id, score AS stay_s FROM ${p}sc$r
             WHERE c = cc),
         ${p}c${r + 1} AS MATERIALIZED (SELECT cur.id,
               CASE WHEN b.best_s > s.stay_s
                 THEN b.best_c ELSE cur.c END AS c
             FROM ${p}c$r cur LEFT JOIN ${p}bst$r b ON b.id = cur.id
               JOIN ${p}sty$r s ON s.id = cur.id)"""
    }.mkString(",\n         ")
  }

  /** The shared q361/q362 level-1 graph + round chain (ends `c<r1>`). */
  def louvainLevel1Ctes(rounds: Int, mod: Int = 3): String =
    s"""li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
             WHERE l_orderkey % $mod = 0),
       e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
              FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       adj AS (SELECT a AS s, b AS t FROM e0
               UNION ALL SELECT b, a FROM e0),
       m AS (SELECT count(*) AS m FROM e0),
       deg AS (SELECT s AS id, count(*) AS deg FROM adj GROUP BY s),
       c0 AS (SELECT id, id AS c FROM deg),
       ${louvainRoundCtes("", "adj", "deg", "m", rounds,
         weighted = false)}"""

  def louvainOracle(rounds: Int): String =
    s"""WITH ${louvainLevel1Ctes(rounds)}
       SELECT id, c AS community FROM c$rounds ORDER BY id"""

  /** The q362 oracle: level 1, community contraction (inter-edges →
    * weighted super-edges, intra-edges → self-loops; m invariant),
    * then the WEIGHTED round chain, members mapped through both
    * assignments. */
  def louvainTwoLevelOracle(r1: Int, r2: Int): String =
    s"""WITH ${louvainLevel1Ctes(r1)},
       ce AS (SELECT least(x.c, y.c) AS a, greatest(x.c, y.c) AS b,
                count(*) AS w
              FROM e0 JOIN c$r1 x ON x.id = e0.a
                JOIN c$r1 y ON y.id = e0.b
              GROUP BY 1, 2),
       dadj AS (SELECT a AS s, b AS t, w FROM ce WHERE a <> b
                UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       dm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
       ddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                  SELECT s AS id, w AS deg FROM dadj
                  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b)
                GROUP BY id),
       dc0 AS (SELECT id, id AS c FROM ddeg),
       ${louvainRoundCtes("d", "dadj", "ddeg", "dm", r2,
         weighted = true)}
       SELECT x.id, x.c AS c1, y.c AS community
       FROM c$r1 x JOIN dc$r2 y ON y.id = x.c ORDER BY x.id"""

  /** The q363 oracle: both levels' integer modularity numerators
    * `Q·(2m)² = Σ_c (4m·in_c − tot_c²)` recomputed from the SAME
    * unrolled assignments ([[louvainTwoLevelOracle]]'s CTE chain),
    * both evaluated against the ORIGINAL e0/deg/m (same m ⇒ the two
    * numerators compare directly), plus the level-2-not-worse
    * certificate. */
  def louvainModularityOracle(r1: Int, r2: Int): String =
    s"""WITH ${louvainLevel1Ctes(r1)},
       ce AS (SELECT least(x.c, y.c) AS a, greatest(x.c, y.c) AS b,
                count(*) AS w
              FROM e0 JOIN c$r1 x ON x.id = e0.a
                JOIN c$r1 y ON y.id = e0.b
              GROUP BY 1, 2),
       dadj AS (SELECT a AS s, b AS t, w FROM ce WHERE a <> b
                UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       dm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
       ddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                  SELECT s AS id, w AS deg FROM dadj
                  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b)
                GROUP BY id),
       dc0 AS (SELECT id, id AS c FROM ddeg),
       ${louvainRoundCtes("d", "dadj", "ddeg", "dm", r2,
         weighted = true)},
       full2 AS (SELECT x.id, y.c AS cm
                 FROM c$r1 x JOIN dc$r2 y ON y.id = x.c),
       t1 AS (SELECT c.c AS cm, CAST(sum(d.deg) AS BIGINT) AS tot
              FROM c$r1 c JOIN deg d USING (id) GROUP BY 1),
       i1 AS (SELECT x.c AS cm, count(*) AS inn
              FROM e0 JOIN c$r1 x ON x.id = e0.a
                JOIN c$r1 y ON y.id = e0.b
              WHERE x.c = y.c GROUP BY 1),
       s1 AS (SELECT CAST(sum(4 * m.m * coalesce(i1.inn, 0)
                - t1.tot * t1.tot) AS BIGINT) AS q1_num
              FROM t1 LEFT JOIN i1 USING (cm) CROSS JOIN m),
       t2 AS (SELECT f.cm, CAST(sum(d.deg) AS BIGINT) AS tot
              FROM full2 f JOIN deg d USING (id) GROUP BY 1),
       i2 AS (SELECT x.cm, count(*) AS inn
              FROM e0 JOIN full2 x ON x.id = e0.a
                JOIN full2 y ON y.id = e0.b
              WHERE x.cm = y.cm GROUP BY 1),
       s2 AS (SELECT CAST(sum(4 * m.m * coalesce(i2.inn, 0)
                - t2.tot * t2.tot) AS BIGINT) AS q2_num
              FROM t2 LEFT JOIN i2 USING (cm) CROSS JOIN m)
       SELECT CAST(2 * m.m AS BIGINT) AS two_m, s1.q1_num, s2.q2_num,
         s2.q2_num >= s1.q1_num AS level2_not_worse
       FROM m, s1, s2"""

  /** One modularity-evaluation CTE triple for [[louvainLevelsOracle]]:
    * tot/in sums of assignment table `asg(node → cm)` against the
    * ORIGINAL e0/deg/m, emitting `${p}s(q)`. */
  private def qEvalCtes(p: String, asg: String, node: String,
      cm: String): String =
    s"""${p}t AS (SELECT a.$cm AS cm, CAST(sum(d.deg) AS BIGINT) AS tot
           FROM $asg a JOIN deg d ON d.id = a.$node GROUP BY 1),
       ${p}i AS (SELECT x.$cm AS cm, count(*) AS inn
           FROM e0 JOIN $asg x ON x.$node = e0.a
             JOIN $asg y ON y.$node = e0.b
           WHERE x.$cm = y.$cm GROUP BY 1),
       ${p}s AS (SELECT CAST(sum(4 * m.m * coalesce(i.inn, 0)
             - t.tot * t.tot) AS BIGINT) AS q
           FROM ${p}t t LEFT JOIN ${p}i i USING (cm) CROSS JOIN m)"""

  /** The q364 oracle: the THREE-level Louvain pipeline on the
    * `mod`-filtered co-purchase graph — level 1, contract (counted),
    * weighted level 2, contract again (SUMMED — weights carry
    * forward, m invariant), weighted level 3 — with the per-level
    * community count and modularity numerator evaluated on the
    * ORIGINAL graph, plus the level-over-level non-degradation
    * certificates (level 0 = singletons anchors the trajectory). */
  def louvainLevelsOracle(mod: Int, r: Int): String =
    s"""WITH ${louvainLevel1Ctes(r, mod)},
       ce AS (SELECT least(x.c, y.c) AS a, greatest(x.c, y.c) AS b,
                count(*) AS w
              FROM e0 JOIN c$r x ON x.id = e0.a
                JOIN c$r y ON y.id = e0.b
              GROUP BY 1, 2),
       dadj AS (SELECT a AS s, b AS t, w FROM ce WHERE a <> b
                UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       dm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
       ddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                  SELECT s AS id, w AS deg FROM dadj
                  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b)
                GROUP BY id),
       dc0 AS (SELECT id, id AS c FROM ddeg),
       ${louvainRoundCtes("d", "dadj", "ddeg", "dm", r,
         weighted = true)},
       ce2 AS (SELECT least(x.c, y.c) AS a, greatest(x.c, y.c) AS b,
                 CAST(sum(ce.w) AS BIGINT) AS w
               FROM ce JOIN dc$r x ON x.id = ce.a
                 JOIN dc$r y ON y.id = ce.b
               GROUP BY 1, 2),
       tdadj AS (SELECT a AS s, b AS t, w FROM ce2 WHERE a <> b
                 UNION ALL SELECT b, a, w FROM ce2 WHERE a <> b),
       tdm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce2),
       tddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                   SELECT s AS id, w AS deg FROM tdadj
                   UNION ALL SELECT a, 2 * w FROM ce2 WHERE a = b)
                 GROUP BY id),
       tc0 AS (SELECT id, id AS c FROM tddeg),
       ${louvainRoundCtes("t", "tdadj", "tddeg", "tdm", r,
         weighted = true)},
       sing AS (SELECT id, id AS cm FROM deg),
       a1 AS (SELECT id, c AS cm FROM c$r),
       a2 AS (SELECT x.id, y.c AS cm
              FROM c$r x JOIN dc$r y ON y.id = x.c),
       a3 AS (SELECT x.id, z.c AS cm
              FROM c$r x JOIN dc$r y ON y.id = x.c
                JOIN tc$r z ON z.id = y.c),
       ${qEvalCtes("q0", "sing", "id", "cm")},
       ${qEvalCtes("q1", "a1", "id", "cm")},
       ${qEvalCtes("q2", "a2", "id", "cm")},
       ${qEvalCtes("q3", "a3", "id", "cm")}
       SELECT CAST(lvl AS BIGINT) AS level, n_comm, q_num, not_worse
       FROM (
         SELECT 0 AS lvl, (SELECT count(*) FROM deg) AS n_comm,
           q0s.q AS q_num, true AS not_worse FROM q0s
         UNION ALL SELECT 1,
           (SELECT count(DISTINCT cm) FROM a1), q1s.q,
           q1s.q >= q0s.q FROM q1s, q0s
         UNION ALL SELECT 2,
           (SELECT count(DISTINCT cm) FROM a2), q2s.q,
           q2s.q >= q1s.q FROM q2s, q1s
         UNION ALL SELECT 3,
           (SELECT count(DISTINCT cm) FROM a3), q3s.q,
           q3s.q >= q2s.q FROM q3s, q2s)
       ORDER BY level"""

  /** The q367 oracle: ONE unrolled `r`-round level-1 Louvain chain
    * (c0..c`r`) on the `mod`-filtered co-purchase graph with the
    * modularity numerator re-evaluated after EVERY round plus the
    * round-over-round not-worse flag — the rounds-as-quality-knob
    * certificate (round-12 verdict ask #2: the knee of the Q
    * trajectory, measured and hash-pinned). Round 0 = singletons
    * anchors the trajectory. */
  def louvainRoundsKneeOracle(mod: Int, r: Int): String = {
    val aCtes = (0 to r).map(i =>
      s"a$i AS (SELECT id, c AS cm FROM c$i)").mkString(",\n       ")
    val qCtes = (0 to r).map(i => qEvalCtes(s"q$i", s"a$i", "id", "cm"))
      .mkString(",\n       ")
    val rows = (0 to r).map { i =>
      val nw = if (i == 0) "true" else s"q${i}s.q >= q${i - 1}s.q"
      val from = if (i == 0) "FROM q0s" else s"FROM q${i}s, q${i - 1}s"
      s"""SELECT $i AS lvl,
           (SELECT count(DISTINCT cm) FROM a$i) AS n_comm,
           q${i}s.q AS q_num, $nw AS not_worse $from"""
    }.mkString("\n         UNION ALL ")
    s"""WITH ${louvainLevel1Ctes(r, mod)},
       $aCtes,
       $qCtes
       SELECT CAST(lvl AS BIGINT) AS round, n_comm, q_num, not_worse
       FROM ($rows) ORDER BY round"""
  }

  /** The q368 oracle: the WEIGHTED level-1 Louvain unroll over an
    * EXTERNAL similarity-weighted graph — co-purchase multiplicity as
    * the edge weight (the q365 construction) plus genuine SELF-LOOPS
    * (every part ≡ 0 mod 10 carries its slice lineitem count as loop
    * weight), so the loops-count-twice weighted-degree convention and
    * the weighted modularity numerator (`in_c` sums intra weight
    * INCLUDING loops; m = Σw with loops) are both replayed end to
    * end; singletons anchor the not-worse certificate. */
  def louvainExternalWOracle(rounds: Int, mod: Int): String = {
    def qEvalW(p: String, asg: String): String =
      s"""${p}t AS (SELECT a.cm, CAST(sum(d.deg) AS BIGINT) AS tot
             FROM $asg a JOIN deg d ON d.id = a.id GROUP BY 1),
         ${p}i AS (SELECT x.cm, CAST(sum(e0.w) AS BIGINT) AS inn
             FROM e0 JOIN $asg x ON x.id = e0.a
               JOIN $asg y ON y.id = e0.b
             WHERE x.cm = y.cm GROUP BY 1),
         ${p}s AS (SELECT CAST(sum(4 * m.m * coalesce(i.inn, 0)
               - t.tot * t.tot) AS BIGINT) AS q
             FROM ${p}t t LEFT JOIN ${p}i i USING (cm) CROSS JOIN m)"""
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % $mod = 0),
       pairs AS (SELECT x.p AS a, y.p AS b, count(*) AS w
                 FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
                 GROUP BY 1, 2),
       loops AS (SELECT p AS a, p AS b, count(*) AS w FROM li
                 WHERE p % 10 = 0 GROUP BY p),
       e0 AS (SELECT a, b, w FROM pairs
              UNION ALL SELECT a, b, w FROM loops),
       adj AS (SELECT a AS s, b AS t, w FROM e0 WHERE a <> b
               UNION ALL SELECT b, a, w FROM e0 WHERE a <> b),
       m AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM e0),
       deg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                 SELECT s AS id, w AS deg FROM adj
                 UNION ALL SELECT a, 2 * w FROM e0 WHERE a = b)
               GROUP BY id),
       c0 AS (SELECT id, id AS c FROM deg),
       ${louvainRoundCtes("", "adj", "deg", "m", rounds,
         weighted = true)},
       a0 AS (SELECT id, id AS cm FROM deg),
       a1 AS (SELECT id, c AS cm FROM c$rounds),
       ${qEvalW("q0", "a0")},
       ${qEvalW("q1", "a1")}
       SELECT CAST(2 * m.m AS BIGINT) AS two_m,
         (SELECT count(DISTINCT cm) FROM a1) AS n_comm,
         q0s.q AS q0_num, q1s.q AS q1_num,
         q1s.q >= q0s.q AS level1_not_worse
       FROM m, q0s, q1s"""
  }

  /** The q391 oracle: the CONVERGED external-weight Louvain
    * certificate — the q368 weighted graph (pair multiplicity +
    * self-loops), the weighted round chain unrolled to `rounds`, and
    * per round: the MOVE COUNT (consecutive-round mismatch), the
    * weighted modularity numerator on the original graph, the
    * not-worse flag, plus `conv_round` = the op's stop round replayed
    * from the moved series (first round whose move count AND its
    * predecessor's are both zero — the two-consecutive-zero-move
    * rule) and `conv_matches_fixed` pinned `true` BY THE IDEMPOTENCE
    * THEOREM (a converged schedule's remaining rounds provably move
    * nothing, so stopping early equals running fixed; the ENGINE
    * computes the comparison for real against
    * [[graft.ops.Graph.louvainOneLevelWeightedConverged]]'s actual
    * output — an earlyStop bug would emit false and mismatch). */
  def louvainConvergedWOracle(rounds: Int, mod: Int): String = {
    def qEvalW(p: String, asg: String): String =
      s"""${p}t AS (SELECT a.cm, CAST(sum(d.deg) AS BIGINT) AS tot
             FROM $asg a JOIN deg d ON d.id = a.id GROUP BY 1),
         ${p}i AS (SELECT x.cm, CAST(sum(e0.w) AS BIGINT) AS inn
             FROM e0 JOIN $asg x ON x.id = e0.a
               JOIN $asg y ON y.id = e0.b
             WHERE x.cm = y.cm GROUP BY 1),
         ${p}s AS (SELECT CAST(sum(4 * m.m * coalesce(i.inn, 0)
               - t.tot * t.tot) AS BIGINT) AS q
             FROM ${p}t t LEFT JOIN ${p}i i USING (cm) CROSS JOIN m)"""
    val aCtes = (1 to rounds).map(i =>
      s"a$i AS (SELECT id, c AS cm FROM c$i)").mkString(",\n       ")
    val qCtes = (0 to rounds).map(i => qEvalW(s"q$i", s"a$i"))
      .mkString(",\n       ")
    val mvRows = (1 to rounds).map(i =>
      s"""SELECT $i AS r, CAST((SELECT count(*) FROM a$i x
           JOIN a${i - 1} y ON y.id = x.id WHERE x.cm <> y.cm)
           AS BIGINT) AS moved""").mkString("\n         UNION ALL ")
    val rows = (0 to rounds).map { i =>
      val nw = if (i == 0) "true" else s"q${i}s.q >= q${i - 1}s.q"
      val from = if (i == 0) "FROM q0s" else s"FROM q${i}s, q${i - 1}s"
      s"""SELECT $i AS lvl,
           (SELECT moved FROM mv WHERE r = $i) AS moved,
           (SELECT count(DISTINCT cm) FROM a$i) AS n_comm,
           q${i}s.q AS q_num, $nw AS not_worse $from"""
    }.mkString("\n         UNION ALL ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % $mod = 0),
       pairs AS (SELECT x.p AS a, y.p AS b, count(*) AS w
                 FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
                 GROUP BY 1, 2),
       loops AS (SELECT p AS a, p AS b, count(*) AS w FROM li
                 WHERE p % 10 = 0 GROUP BY p),
       e0 AS (SELECT a, b, w FROM pairs
              UNION ALL SELECT a, b, w FROM loops),
       adj AS (SELECT a AS s, b AS t, w FROM e0 WHERE a <> b
               UNION ALL SELECT b, a, w FROM e0 WHERE a <> b),
       m AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM e0),
       deg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                 SELECT s AS id, w AS deg FROM adj
                 UNION ALL SELECT a, 2 * w FROM e0 WHERE a = b)
               GROUP BY id),
       c0 AS (SELECT id, id AS c FROM deg),
       ${louvainRoundCtes("", "adj", "deg", "m", rounds,
         weighted = true)},
       a0 AS (SELECT id, id AS cm FROM deg),
       $aCtes,
       mv AS (SELECT 0 AS r, CAST(0 AS BIGINT) AS moved
         UNION ALL $mvRows),
       cr AS (SELECT CAST(min(x.r) AS BIGINT) AS conv_round
              FROM mv x JOIN mv y ON y.r = x.r - 1
              WHERE x.r >= 2 AND x.moved = 0 AND y.moved = 0),
       $qCtes
       SELECT CAST(lvl AS BIGINT) AS round, moved, n_comm, q_num,
         not_worse, cr.conv_round, true AS conv_matches_fixed
       FROM ($rows) CROSS JOIN cr ORDER BY round"""
  }

  /** The q369 oracle: the LEVEL-2 rounds knee — level 1 at the shipped
    * `r1`, contraction, then the WEIGHTED round chain unrolled to `r2`
    * with the modularity numerator re-evaluated on the ORIGINAL graph
    * after EVERY contracted round (members mapped through both
    * assignments), plus the round-over-round not-worse flag. Round 0
    * anchors at the level-1 assignment itself (the contracted
    * singletons), so the trajectory reads as "what each extra level-2
    * round buys over stopping at level 1" — the q367 certificate one
    * level down, where the knob is [[louvainRoundCtes]]' weighted
    * variant (contraction always produces weights). */
  def louvainLevel2KneeOracle(mod: Int, r1: Int, r2: Int): String = {
    val aCtes = (1 to r2).map(i =>
      s"""a$i AS (SELECT x.id, y.c AS cm
           FROM c$r1 x JOIN dc$i y ON y.id = x.c)""")
      .mkString(",\n       ")
    val qCtes = (0 to r2).map(i => qEvalCtes(s"q$i", s"a$i", "id", "cm"))
      .mkString(",\n       ")
    val rows = (0 to r2).map { i =>
      val nw = if (i == 0) "true" else s"q${i}s.q >= q${i - 1}s.q"
      val from = if (i == 0) "FROM q0s" else s"FROM q${i}s, q${i - 1}s"
      s"""SELECT $i AS lvl,
           (SELECT count(DISTINCT cm) FROM a$i) AS n_comm,
           q${i}s.q AS q_num, $nw AS not_worse $from"""
    }.mkString("\n         UNION ALL ")
    s"""WITH ${louvainLevel1Ctes(r1, mod)},
       ce AS (SELECT least(x.c, y.c) AS a, greatest(x.c, y.c) AS b,
                count(*) AS w
              FROM e0 JOIN c$r1 x ON x.id = e0.a
                JOIN c$r1 y ON y.id = e0.b
              GROUP BY 1, 2),
       dadj AS (SELECT a AS s, b AS t, w FROM ce WHERE a <> b
                UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       dm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
       ddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                  SELECT s AS id, w AS deg FROM dadj
                  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b)
                GROUP BY id),
       dc0 AS (SELECT id, id AS c FROM ddeg),
       ${louvainRoundCtes("d", "dadj", "ddeg", "dm", r2,
         weighted = true)},
       a0 AS (SELECT id, c AS cm FROM c$r1),
       $aCtes,
       $qCtes
       SELECT CAST(lvl AS BIGINT) AS round, n_comm, q_num, not_worse
       FROM ($rows) ORDER BY round"""
  }

  /** Unrolled connected-components rounds mirroring
    * [[graft.ops.Dedup.duplicateClusters]]' loop exactly — per round a
    * neighbor-min pass then one path-halving hop (`lbl := lbl(lbl)`),
    * so fixed `rounds` ≥ the op's rounds-to-fixpoint replays identical
    * labels (both steps are idempotent past convergence — the kCore
    * oracle stance). Caller defines `${p}lb0(id, lbl = id)` over the
    * edge-touched nodes and `$iadj(s, t)` both directions; produces
    * `${p}lb1 … ${p}lb<rounds>`. */
  def ccRoundCtes(p: String, iadj: String, rounds: Int): String =
    (0 until rounds).map { r =>
      s"""${p}nb$r AS MATERIALIZED (SELECT a.s AS id, min(l.lbl) AS lbl
           FROM $iadj a JOIN ${p}lb$r l ON l.id = a.t GROUP BY a.s),
         ${p}m$r AS MATERIALIZED (SELECT id, min(lbl) AS lbl FROM (
             SELECT id, lbl FROM ${p}lb$r
             UNION ALL SELECT id, lbl FROM ${p}nb$r) GROUP BY id),
         ${p}lb${r + 1} AS MATERIALIZED (SELECT x.id,
             least(x.lbl, coalesce(y.lbl, x.lbl)) AS lbl
           FROM ${p}m$r x LEFT JOIN ${p}m$r y ON y.id = x.lbl)"""
    }.mkString(",\n       ")

  /** Connectivity-refinement CTEs over assignment `rasg(id, cm)` and
    * edge list `e0`: intra-community edges, CC rounds
    * ([[ccRoundCtes]]), and the refined assignment `ref(id, cm)`
    * (edgeless nodes keep their own id as a singleton label). */
  private def refineCcCtes(ccRounds: Int): String =
    s"""intra AS MATERIALIZED (SELECT e0.a, e0.b FROM e0
             JOIN rasg x ON x.id = e0.a JOIN rasg y ON y.id = e0.b
             WHERE x.cm = y.cm),
       iadj AS (SELECT a AS s, b AS t FROM intra
                UNION ALL SELECT b, a FROM intra),
       lb0 AS (SELECT id, id AS lbl
               FROM (SELECT DISTINCT s AS id FROM iadj)),
       ${ccRoundCtes("", "iadj", ccRounds)},
       ref AS (SELECT a.id, coalesce(l.lbl, a.id) AS cm
               FROM rasg a LEFT JOIN lb$ccRounds l ON l.id = a.id)"""

  /** Shared tail of the two refine oracles: [[refineCcCtes]] plus the
    * two-stage certificate rows. */
  private def refineTailCtes(ccRounds: Int): String =
    s"""${refineCcCtes(ccRounds)},
       ${qEvalCtes("q0", "rasg", "id", "cm")},
       ${qEvalCtes("q1", "ref", "id", "cm")}
       SELECT CAST(lvl AS BIGINT) AS stage, n_comm, q_num, not_worse
       FROM (
         SELECT 0 AS lvl, (SELECT count(DISTINCT cm) FROM rasg)
             AS n_comm, q0s.q AS q_num, true AS not_worse FROM q0s
         UNION ALL SELECT 1, (SELECT count(DISTINCT cm) FROM ref),
           q1s.q, q1s.q >= q0s.q FROM q1s, q0s)
       ORDER BY stage"""

  /** The q372 oracle: the refine-then-contract two-level pipeline —
    * the step Leiden actually runs (Traag et al. 2019: contraction
    * must consume the REFINED partition so the defect cannot freeze
    * into the super-graph). Level 1, connectivity refinement,
    * contraction ON THE REFINED labels, weighted level 2, members
    * mapped through refined → super assignments; per stage (1 =
    * level 1, 2 = refined, 3 = level 2 over refined) the community
    * count, modularity numerator on the ORIGINAL graph, and the
    * not-worse certificate. */
  def leidenTwoLevelOracle(mod: Int, r: Int, ccRounds: Int): String =
    s"""WITH ${louvainLevel1Ctes(r, mod)},
       rasg AS (SELECT id, c AS cm FROM c$r),
       ${refineCcCtes(ccRounds)},
       ce AS (SELECT least(x.cm, y.cm) AS a, greatest(x.cm, y.cm) AS b,
                count(*) AS w
              FROM e0 JOIN ref x ON x.id = e0.a
                JOIN ref y ON y.id = e0.b
              GROUP BY 1, 2),
       dadj AS (SELECT a AS s, b AS t, w FROM ce WHERE a <> b
                UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       dm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
       ddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                  SELECT s AS id, w AS deg FROM dadj
                  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b)
                GROUP BY id),
       dc0 AS (SELECT id, id AS c FROM ddeg),
       ${louvainRoundCtes("d", "dadj", "ddeg", "dm", r,
         weighted = true)},
       full2 AS (SELECT x.id, y.c AS cm
                 FROM ref x JOIN dc$r y ON y.id = x.cm),
       ${qEvalCtes("q1", "rasg", "id", "cm")},
       ${qEvalCtes("q2", "ref", "id", "cm")},
       ${qEvalCtes("q3", "full2", "id", "cm")}
       SELECT CAST(lvl AS BIGINT) AS stage, n_comm, q_num, not_worse
       FROM (
         SELECT 1 AS lvl, (SELECT count(DISTINCT cm) FROM rasg)
             AS n_comm, q1s.q AS q_num, true AS not_worse FROM q1s
         UNION ALL SELECT 2, (SELECT count(DISTINCT cm) FROM ref),
           q2s.q, q2s.q >= q1s.q FROM q2s, q1s
         UNION ALL SELECT 3, (SELECT count(DISTINCT cm) FROM full2),
           q3s.q, q3s.q >= q2s.q FROM q3s, q2s)
       ORDER BY stage"""

  /** The q373 oracle: the THREE-level refine-every-level Leiden
    * pipeline — [[leidenTwoLevelOracle]] extended one contraction
    * down: level 1 → refine (connectivity CC on the original graph)
    * → contract ON the refined labels → weighted level 2 → refine
    * AGAIN (CC on the CONTRACTED graph — equivalent to refining the
    * mapped assignment on the original graph because every super-node
    * is internally connected by construction of the level-1
    * refinement, and much smaller) → contract (SUMMED weights, m
    * invariant) → weighted level 3. Five-stage certificate on the
    * original graph: (1) level 1, (2) refined, (3) level 2, (4)
    * refined level 2, (5) level 3 — each stage's community count,
    * modularity numerator, and the not-worse flag. */
  def leidenThreeLevelOracle(mod: Int, r: Int, ccRounds: Int): String =
    s"""WITH ${louvainLevel1Ctes(r, mod)},
       rasg AS (SELECT id, c AS cm FROM c$r),
       ${refineCcCtes(ccRounds)},
       ce AS (SELECT least(x.cm, y.cm) AS a, greatest(x.cm, y.cm) AS b,
                count(*) AS w
              FROM e0 JOIN ref x ON x.id = e0.a
                JOIN ref y ON y.id = e0.b
              GROUP BY 1, 2),
       dadj AS (SELECT a AS s, b AS t, w FROM ce WHERE a <> b
                UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       dm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce),
       ddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                  SELECT s AS id, w AS deg FROM dadj
                  UNION ALL SELECT a, 2 * w FROM ce WHERE a = b)
                GROUP BY id),
       dc0 AS (SELECT id, id AS c FROM ddeg),
       ${louvainRoundCtes("d", "dadj", "ddeg", "dm", r,
         weighted = true)},
       r2asg AS (SELECT id, c AS cm FROM dc$r),
       intra2 AS MATERIALIZED (SELECT ce.a, ce.b FROM ce
            JOIN r2asg x ON x.id = ce.a JOIN r2asg y ON y.id = ce.b
            WHERE x.cm = y.cm AND ce.a <> ce.b),
       i2adj AS (SELECT a AS s, b AS t FROM intra2
                 UNION ALL SELECT b, a FROM intra2),
       r2lb0 AS (SELECT id, id AS lbl
                 FROM (SELECT DISTINCT s AS id FROM i2adj)),
       ${ccRoundCtes("r2", "i2adj", ccRounds)},
       ref2 AS (SELECT a.id, coalesce(l.lbl, a.id) AS cm
                FROM r2asg a LEFT JOIN r2lb$ccRounds l ON l.id = a.id),
       ce2 AS (SELECT least(x.cm, y.cm) AS a, greatest(x.cm, y.cm) AS b,
                 CAST(sum(ce.w) AS BIGINT) AS w
               FROM ce JOIN ref2 x ON x.id = ce.a
                 JOIN ref2 y ON y.id = ce.b
               GROUP BY 1, 2),
       tdadj AS (SELECT a AS s, b AS t, w FROM ce2 WHERE a <> b
                 UNION ALL SELECT b, a, w FROM ce2 WHERE a <> b),
       tdm AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ce2),
       tddeg AS (SELECT id, CAST(sum(deg) AS BIGINT) AS deg FROM (
                   SELECT s AS id, w AS deg FROM tdadj
                   UNION ALL SELECT a, 2 * w FROM ce2 WHERE a = b)
                 GROUP BY id),
       tc0 AS (SELECT id, id AS c FROM tddeg),
       ${louvainRoundCtes("t", "tdadj", "tddeg", "tdm", r,
         weighted = true)},
       a1 AS (SELECT id, cm FROM rasg),
       a2 AS (SELECT id, cm FROM ref),
       a3 AS (SELECT x.id, y.c AS cm
              FROM ref x JOIN dc$r y ON y.id = x.cm),
       a4 AS (SELECT x.id, y.cm AS cm
              FROM ref x JOIN ref2 y ON y.id = x.cm),
       a5 AS (SELECT x.id, z.c AS cm
              FROM ref x JOIN ref2 y ON y.id = x.cm
                JOIN tc$r z ON z.id = y.cm),
       ${qEvalCtes("q1", "a1", "id", "cm")},
       ${qEvalCtes("q2", "a2", "id", "cm")},
       ${qEvalCtes("q3", "a3", "id", "cm")},
       ${qEvalCtes("q4", "a4", "id", "cm")},
       ${qEvalCtes("q5", "a5", "id", "cm")}
       SELECT CAST(lvl AS BIGINT) AS stage, n_comm, q_num, not_worse
       FROM (
         SELECT 1 AS lvl, (SELECT count(DISTINCT cm) FROM a1)
             AS n_comm, q1s.q AS q_num, true AS not_worse FROM q1s
         UNION ALL SELECT 2, (SELECT count(DISTINCT cm) FROM a2),
           q2s.q, q2s.q >= q1s.q FROM q2s, q1s
         UNION ALL SELECT 3, (SELECT count(DISTINCT cm) FROM a3),
           q3s.q, q3s.q >= q2s.q FROM q3s, q2s
         UNION ALL SELECT 4, (SELECT count(DISTINCT cm) FROM a4),
           q4s.q, q4s.q >= q3s.q FROM q4s, q3s
         UNION ALL SELECT 5, (SELECT count(DISTINCT cm) FROM a5),
           q5s.q, q5s.q >= q4s.q FROM q5s, q4s)
       ORDER BY stage"""

  /** The q374 oracle: per-community conductance of the level-1
    * Louvain assignment — grouped degree mass + intra counts over the
    * same unrolled chain, `cut = vol − 2·inn`,
    * `φ = cut / min(vol, 2m − vol)` (0.0 on a zero denominator). */
  def conductanceOracle(mod: Int, r: Int): String =
    s"""WITH ${louvainLevel1Ctes(r, mod)},
       asg AS (SELECT id, c FROM c$r),
       lab AS (SELECT x.c AS ca, y.c AS cb
               FROM e0 JOIN asg x ON x.id = e0.a
                 JOIN asg y ON y.id = e0.b),
       inn AS (SELECT ca AS community, count(*) AS inn FROM lab
               WHERE ca = cb GROUP BY 1),
       vol AS (SELECT community, count(*) AS vol FROM (
                 SELECT ca AS community FROM lab
                 UNION ALL SELECT cb FROM lab) GROUP BY 1)
       SELECT v.community, v.vol,
         coalesce(i.inn, 0) AS inn,
         v.vol - 2 * coalesce(i.inn, 0) AS cut,
         round(CASE WHEN least(v.vol, 2 * m.m - v.vol) > 0
           THEN (v.vol - 2 * coalesce(i.inn, 0)) /
             CAST(least(v.vol, 2 * m.m - v.vol) AS DOUBLE)
           ELSE 0.0 END, 4) AS conductance
       FROM vol v LEFT JOIN inn i USING (community) CROSS JOIN m
       ORDER BY v.community"""

  /** The q375 oracle: `rounds` unrolled h-index iterations of the
    * distributed core-number decomposition (Montresor et al. 2013) —
    * per round each node's estimate becomes the h-index of its
    * neighbors' estimates (`max(least(est, rn))` over the
    * desc-sorted neighbor list — deterministic under ties since the
    * list is sorted by the value itself). Estimates only decrease and
    * the fixpoint is the core number; a converged round is
    * idempotent, so fixed `rounds` ≥ rounds-to-fixpoint replays the
    * op bit-for-bit (the kCore oracle stance). */
  def coreNumbersOracle(mod: Int, rounds: Int): String = {
    val steps = (0 until rounds).map { i =>
      s"""nb$i AS MATERIALIZED (SELECT a.s, e.est FROM adj a
           JOIN est$i e ON e.id = a.t),
         rn$i AS (SELECT s, est, row_number() OVER (PARTITION BY s
             ORDER BY est DESC) AS rn FROM nb$i),
         est${i + 1} AS MATERIALIZED (SELECT s AS id,
             max(least(est, rn)) AS est FROM rn$i GROUP BY s)"""
    }.mkString(",\n       ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
             WHERE l_orderkey % $mod = 0),
       e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
              FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       adj AS (SELECT a AS s, b AS t FROM e0
               UNION ALL SELECT b, a FROM e0),
       est0 AS (SELECT s AS id, count(*) AS est FROM adj GROUP BY s),
       $steps
       SELECT id, est AS core FROM est$rounds ORDER BY id"""
  }

  /** The q379 oracle: `depth` unrolled rounds of the TAGGED
    * multi-source BFS (min-union per (src, id) — idempotent past
    * convergence), then the harmonic sum in integer micro-units
    * (`floor(10⁶/d)` per reached source — exact Long arithmetic, no
    * order-dependent double accumulation). */
  def harmonicOracle(mod: Int, seedMod: Int, depth: Int): String = {
    val steps = (0 until depth).map { i =>
      s"""nx$i AS (SELECT d.src, a.t AS id, d.dist + 1 AS dist
           FROM dist$i d JOIN adj a ON a.s = d.id),
         dist${i + 1} AS MATERIALIZED (SELECT src, id,
             min(dist) AS dist FROM (
             SELECT * FROM dist$i UNION ALL SELECT * FROM nx$i)
           GROUP BY src, id)"""
    }.mkString(",\n       ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
             WHERE l_orderkey % $mod = 0),
       e0 AS (SELECT x.p AS a, y.p AS b
              FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       adj AS (SELECT DISTINCT s, t FROM (
                 SELECT a AS s, b AS t FROM e0
                 UNION ALL SELECT b, a FROM e0)),
       dist0 AS (SELECT DISTINCT p_partkey AS src, p_partkey AS id,
                   CAST(0 AS BIGINT) AS dist
                 FROM part WHERE p_partkey % $seedMod = 0),
       $steps
       SELECT id, CAST(count(*) AS BIGINT) AS n_reached,
         CAST(sum(CAST(floor(1000000.0 / dist) AS BIGINT)) AS BIGINT)
           AS harmonic_micro
       FROM dist$depth WHERE dist > 0 GROUP BY id ORDER BY id"""
  }

  /** The q387 oracle: `rounds` unrolled max-relaxation rounds of the
    * topological-layer (longest-path) computation over the
    * consecutive-%16-stage co-purchase DAG — the [[coreNumbersOracle]]
    * stance: a converged round is idempotent, so a fixed unroll ≥ the
    * DAG depth (≤ 15 here BY CONSTRUCTION — paths strictly climb the
    * stage) replays the op bit-for-bit; the op's own extra-round check
    * certifies acyclicity engine-side. */
  def topoLayersOracle(mod: Int, rounds: Int): String = {
    val steps = (0 until rounds).map { i =>
      s"""l${i + 1} AS MATERIALIZED (SELECT l.id,
           greatest(l.layer, coalesce(m.c, 0)) AS layer
         FROM l$i l LEFT JOIN (
           SELECT e.t AS id, max(x.layer) + 1 AS c
           FROM e JOIN l$i x ON x.id = e.s GROUP BY e.t) m
           ON m.id = l.id)"""
    }.mkString(",\n       ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
             WHERE l_orderkey % $mod = 0),
       e AS (SELECT DISTINCT x.p AS s, y.p AS t
             FROM li x JOIN li y ON x.o = y.o
               AND (x.p % 16) + 1 = (y.p % 16)
             WHERE x.p <> y.p),
       n AS (SELECT DISTINCT id FROM (
               SELECT s AS id FROM e UNION ALL SELECT t FROM e)),
       l0 AS (SELECT id, CAST(0 AS BIGINT) AS layer FROM n),
       $steps
       SELECT id, layer FROM l$rounds ORDER BY id"""
  }

  /** The q370 oracle: Leiden-style connectivity refinement of the
    * level-1 Louvain assignment — each community split into the
    * connected components of its intra-community subgraph, with the
    * modularity numerator before/after and the not-worse certificate
    * (strict improvement whenever any community was internally
    * disconnected — the Louvain defect the refinement repairs). */
  def refineLouvainOracle(mod: Int, r1: Int, ccRounds: Int): String =
    s"""WITH ${louvainLevel1Ctes(r1, mod)},
       rasg AS (SELECT id, c AS cm FROM c$r1),
       ${refineTailCtes(ccRounds)}"""

  /** The q371 oracle: connectivity refinement of an ATTRIBUTE grouping
    * — parts grouped by brand over the co-purchase graph (brand
    * communities are heavily disconnected, so the refinement
    * demonstrates real splits: n_comm jumps and Q strictly improves).
    * Same graph construction as [[louvainLevel1Ctes]], assignment from
    * the part table restricted to graph nodes. */
  def refineBrandOracle(mod: Int, ccRounds: Int): String =
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
             WHERE l_orderkey % $mod = 0),
       e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
              FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       adj AS (SELECT a AS s, b AS t FROM e0
               UNION ALL SELECT b, a FROM e0),
       m AS (SELECT count(*) AS m FROM e0),
       deg AS (SELECT s AS id, count(*) AS deg FROM adj GROUP BY s),
       rasg AS (SELECT p_partkey AS id,
                  CAST(substr(p_brand, 7) AS BIGINT) AS cm
                FROM part WHERE p_partkey IN (SELECT id FROM deg)),
       ${refineTailCtes(ccRounds)}"""

  /** The q324 oracle: `rounds` unrolled k-truss peel passes — per-edge
    * support as a common-neighbor join over the adjacency (the
    * [[kCoreOracle]] stance: rounds must exceed rounds-to-fixpoint at
    * verification scale; converged rounds are idempotent since the
    * truss is the unique maximal subgraph). Edges without triangles
    * vanish from the support frame, which IS the drop for k ≥ 3. */
  def kTrussOracle(k: Int, rounds: Int): String = {
    val thr = k - 2
    val steps = (1 to rounds).map { i =>
      s"""ad$i AS MATERIALIZED (SELECT a AS s, b AS t FROM e${i - 1}
           UNION ALL SELECT b, a FROM e${i - 1}),
         sp$i AS MATERIALIZED (SELECT x.a, x.b, count(*) AS sup
           FROM e${i - 1} x
           JOIN ad$i p ON p.s = x.a
           JOIN ad$i q ON q.s = x.b AND q.t = p.t
           GROUP BY x.a, x.b),
         e$i AS MATERIALIZED (SELECT a, b FROM sp$i WHERE sup >= $thr)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         $steps
         SELECT a, b, CAST(sup AS BIGINT) AS support
         FROM sp$rounds WHERE sup >= $thr ORDER BY a, b"""
  }

  /** The q325 oracle: `rounds` unrolled Bellman-Ford relaxations —
    * each round unions the previous dist frame with every one-hop
    * extension and keeps the min per node (ties are value ties, so
    * double min is deterministic; distances are sums of the same
    * doubles along the same paths in either engine). */
  def ssspOracle(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""v$i AS MATERIALIZED (SELECT id, min(d) AS dist FROM (
           SELECT id, dist AS d FROM v${i - 1}
           UNION ALL
           SELECT e.t AS id, v.dist + e.w AS d
           FROM v${i - 1} v JOIN e ON e.s = v.id)
         GROUP BY id)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p,
                 l_quantity AS q
               FROM lineitem WHERE l_orderkey % 5 = 0),
         e AS (SELECT x.p AS s, y.p AS t, CAST(x.q AS DOUBLE) AS w
               FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p),
         v0 AS (SELECT DISTINCT p_partkey AS id, CAST(0.0 AS DOUBLE)
                    AS dist
                FROM part WHERE p_partkey % 997 = 0),
         $steps
         SELECT id, round(dist, 4) AS dist FROM v$rounds ORDER BY id"""
  }

  /** The q326 oracle: exact all-pairs eps-neighborhood (the grid join
    * is only pruning — the pair SET is identical), core gate, then
    * `rounds` unrolled min-label + path-halving passes over the
    * core-core graph (halving converges in O(log diameter); converged
    * rounds are idempotent and the fixpoint is the component min in
    * both engines), borders to the smallest neighboring core cluster,
    * noise at -1. */
  def dbscanOracle(eps: Double, minPts: Int,
      rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""m$i AS MATERIALIZED (
           SELECT l.id, least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
           FROM l${i - 1} l
           LEFT JOIN ce ON ce.ia = l.id
           LEFT JOIN l${i - 1} nl ON nl.id = ce.ib
           GROUP BY l.id, l.lbl),
         l$i AS MATERIALIZED (
           SELECT m.id, least(m.lbl, coalesce(h.lbl, m.lbl)) AS lbl
           FROM m$i m LEFT JOIN m$i h ON h.id = m.lbl)"""
    }.mkString(",\n         ")
    s"""WITH p AS (SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x,
                 CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
         nbr AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib
           FROM p a JOIN p b ON a.id <> b.id
             AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                 <= $eps * $eps),
         core AS MATERIALIZED (SELECT ia AS id FROM nbr GROUP BY ia
           HAVING count(*) + 1 >= $minPts),
         ce AS MATERIALIZED (SELECT ia, ib FROM nbr
           WHERE ia IN (SELECT id FROM core)
             AND ib IN (SELECT id FROM core)),
         l0 AS (SELECT id, id AS lbl FROM core),
         $steps,
         corelab AS (SELECT id, lbl AS cluster FROM l$rounds),
         border AS (SELECT n.ia AS id, min(c.cluster) AS cluster
           FROM nbr n JOIN corelab c ON c.id = n.ib
           WHERE n.ia NOT IN (SELECT id FROM core)
           GROUP BY n.ia)
         SELECT p.id, p.id IN (SELECT id FROM core) AS is_core,
           coalesce(cl.cluster, b.cluster, -1) AS cluster
         FROM p LEFT JOIN corelab cl ON cl.id = p.id
           LEFT JOIN border b ON b.id = p.id
         ORDER BY p.id"""
  }

  /** The q303 oracle: `rounds` unrolled level-synchronous BFS frontier
    * expansions (SQL has no loop; running exactly `maxDepth` rounds
    * equals the early-exiting Spark loop — an empty frontier stays
    * empty). */
  def bfsOracle(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""f$i AS MATERIALIZED (SELECT DISTINCT adj.t AS id FROM adj
           WHERE adj.s IN (SELECT id FROM f${i - 1})
             AND adj.t NOT IN (SELECT id FROM v${i - 1})),
         v$i AS MATERIALIZED (SELECT id, dist FROM v${i - 1}
           UNION ALL SELECT id, $i AS dist FROM f$i)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         adj AS (SELECT a AS s, b AS t FROM e0
                 UNION SELECT b, a FROM e0),
         v0 AS (SELECT DISTINCT p_partkey AS id, CAST(0 AS BIGINT) AS dist
                FROM part WHERE p_partkey % 997 = 0),
         f0 AS (SELECT id FROM v0),
         $steps
         SELECT id, dist FROM v$rounds ORDER BY id"""
  }

  /** The q304 oracle: `iters` unrolled HITS rounds with integer
    * max-normalization (`//` is non-negative here, so it equals
    * Spark's `div`) — the q164 PageRank pattern with two half-steps
    * per iteration. Every multiply-referenced CTE is MATERIALIZED
    * (round-13 sf0.1 sweep find): DuckDB INLINES non-materialized
    * CTEs per reference, and with 2–3 references per half-step the
    * re-execution tree grows ~3^(2·iters) — at sf0.1 the inlined plan
    * spilled past 80 GB of disk before dying, while the materialized
    * chain is a few MB per step. */
  def hitsOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst, sum(h.h) AS ar FROM e
             JOIN hs${i - 1} h ON h.id = e.src GROUP BY e.dst),
         am$i AS (SELECT max(ar) AS am FROM ar$i),
         aa$i AS MATERIALIZED (SELECT n.id,
             CAST(coalesce(s.ar * 1000000 // t.am, 0) AS BIGINT) AS a
           FROM nodes n LEFT JOIN ar$i s ON n.id = s.dst CROSS JOIN am$i t),
         hr$i AS MATERIALIZED (SELECT e.src, sum(a.a) AS hr FROM e
             JOIN aa$i a ON a.id = e.dst GROUP BY e.src),
         hm$i AS (SELECT max(hr) AS hm FROM hr$i),
         hs$i AS MATERIALIZED (SELECT n.id,
             CAST(coalesce(s.hr * 1000000 // t.hm, 0) AS BIGINT) AS h,
             a.a AS a
           FROM nodes n LEFT JOIN hr$i s ON n.id = s.src
           JOIN aa$i a ON a.id = n.id CROSS JOIN hm$i t)"""
    }.mkString(",\n         ")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey + 1000000000 AS src,
               l_partkey AS dst
             FROM lineitem WHERE l_suppkey + 1000000000 <> l_partkey),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (
             SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         hs0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h,
                   CAST(1000000 AS BIGINT) AS a FROM nodes),
         $steps
         SELECT id, h AS hub_micro, a AS auth_micro FROM hs$iters
         ORDER BY id"""
  }

  /** The q306 oracle: the q164 unrolled integer PageRank over the
    * adjacent-word co-occurrence graph, words keyed by the portable
    * md5-60-bit id. */
  def textrankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""s$i AS (SELECT e.dst, sum(r.r // d.outdeg) AS s
               FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON r.id = e.src
               GROUP BY e.dst),
         r$i AS (SELECT n.id,
                   CAST(150000 + coalesce(s.s, 0) * 85 // 100 AS BIGINT) AS r
                 FROM nodes n LEFT JOIN s$i s ON n.id = s.dst)"""
    }.mkString(",\n         ")
    s"""WITH toks AS (
           SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 7 = 0),
         tl AS (SELECT tk FROM toks WHERE len(tk) >= 2),
         pr AS (SELECT tk[i] AS w1, tk[i + 1] AS w2, tk
                FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM tl)),
         pw AS (SELECT w1, w2 FROM pr WHERE w1 <> w2),
         e AS (SELECT DISTINCT CAST('0x' || substr(md5(w1), 1, 15) AS BIGINT)
                   AS src,
                 CAST('0x' || substr(md5(w2), 1, 15) AS BIGINT) AS dst
               FROM (SELECT w1, w2 FROM pw
                     UNION ALL SELECT w2, w1 FROM pw)),
         deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         nodes AS (SELECT DISTINCT id FROM (
             SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         $iterCtes,
         words AS (SELECT DISTINCT
             CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS id, w
           FROM (SELECT unnest(list_filter(
                   string_split_regex(trim(text), '\\s+'), x -> x <> ''))
                   AS w
                 FROM documents WHERE doc_id % 7 = 0))
         SELECT w.w AS word, r.r AS rank_micro
         FROM r$iters r JOIN words w USING (id)
         ORDER BY rank_micro DESC, word LIMIT 20"""
  }

  /** The q307 oracle: sample covariance from the raw co-moment sums,
    * then `sweeps` unrolled power-iteration rounds per component with
    * deflation between them — the q271/q164 replay stance applied to
    * linear algebra. `a*` CTEs are component-1 iterates, `b*`
    * component-2; both start from the same deterministic `1/√d`. */
  def pcaOracle(dim: Int, sweeps: Int): String = {
    // every sweep CTE MATERIALIZED: un-materialized chains INLINE, and
    // each sweep references its predecessor twice (the mat-vec and the
    // norm), so the plan tree doubles per sweep — 2^30 nodes by the
    // last one (the q271 Jacobi-sweep lesson)
    def sweepCtes(p: String, cm: String): String =
      (1 to sweeps).map { s =>
        s"""w$p$s AS MATERIALIZED (SELECT c.i, sum(c.v * p.val) AS val
             FROM $cm c JOIN $p${s - 1} p ON p.i = c.j GROUP BY c.i),
         $p$s AS MATERIALIZED (SELECT w.i, w.val / q.nrm AS val
             FROM w$p$s w,
             (SELECT sqrt(sum(val * val)) AS nrm FROM w$p$s) q)"""
      }.mkString(",\n         ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE)))
               AS x,
             unnest(range(0, len(embedding))) AS i
           FROM embeddings),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
         sx AS MATERIALIZED (SELECT i, sum(x) AS s FROM e GROUP BY i),
         sxy AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS s
                 FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2),
         c0 AS MATERIALIZED (SELECT sxy.i, sxy.j,
             (sxy.s - sa.s * sb.s / nn.n) / (nn.n - 1) AS v
           FROM sxy JOIN sx sa ON sa.i = sxy.i
           JOIN sx sb ON sb.i = sxy.j CROSS JOIN nn),
         mu AS (SELECT i, s / n AS m FROM sx CROSS JOIN nn),
         a0 AS (SELECT i, 1.0 / sqrt(${dim}.0) AS val FROM sx),
         ${sweepCtes("a", "c0")},
         cv1 AS (SELECT c.i, sum(c.v * p.val) AS val FROM c0 c
                 JOIN a$sweeps p ON p.i = c.j GROUP BY c.i),
         l1 AS (SELECT sum(p.val * cv.val) AS lam
                FROM a$sweeps p JOIN cv1 cv USING (i)),
         c1 AS MATERIALIZED (SELECT c.i, c.j,
             c.v - l1.lam * pi.val * pj.val AS v
           FROM c0 c JOIN a$sweeps pi ON pi.i = c.i
           JOIN a$sweeps pj ON pj.i = c.j CROSS JOIN l1),
         b0 AS (SELECT i, 1.0 / sqrt(${dim}.0) AS val FROM sx),
         ${sweepCtes("b", "c1")},
         proj AS (SELECT e.vec_id AS id,
             sum((e.x - mu.m) * pa.val) AS pc1,
             sum((e.x - mu.m) * pb.val) AS pc2
           FROM e JOIN mu USING (i)
           JOIN a$sweeps pa USING (i) JOIN b$sweeps pb USING (i)
           GROUP BY e.vec_id)
         SELECT id, round(pc1, 4) + 0.0 AS pc1, round(pc2, 4) + 0.0 AS pc2
         FROM proj ORDER BY id"""
  }

  /** The q308 oracle: `iters` unrolled synchronous label-propagation
    * rounds — majority label among labeled neighbors via the portable
    * two-step argmax (max count, then min label at that count), seeds
    * clamped, previous label kept when no neighbor votes. */
  def labelPropOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""v$i AS MATERIALIZED (SELECT adj.s AS id, l.lbl, count(*) AS c
           FROM adj JOIN l${i - 1} l ON l.id = adj.t
           WHERE l.lbl IS NOT NULL GROUP BY adj.s, l.lbl),
         t$i AS (SELECT id, max(c) AS mc FROM v$i GROUP BY id),
         w$i AS (SELECT v.id, min(v.lbl) AS win FROM v$i v
                 JOIN t$i t ON t.id = v.id AND v.c = t.mc GROUP BY v.id),
         l$i AS MATERIALIZED (SELECT n.id,
             coalesce(n.seed, w.win, p.lbl) AS lbl
           FROM nodes n LEFT JOIN w$i w ON w.id = n.id
           LEFT JOIN l${i - 1} p ON p.id = n.id)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 4 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         adj AS (SELECT a AS s, b AS t FROM e0
                 UNION SELECT b, a FROM e0),
         seeds AS (SELECT p_partkey AS id,
                     CAST(min(p_partkey % 7) AS BIGINT) AS seed
                   FROM part WHERE p_partkey % 50 = 0 GROUP BY p_partkey),
         nodes AS MATERIALIZED (SELECT n.id, s.seed
           FROM (SELECT DISTINCT s AS id FROM adj) n
           LEFT JOIN seeds s ON s.id = n.id),
         l0 AS (SELECT id, seed AS lbl FROM nodes),
         $steps
         SELECT id, lbl AS label FROM l$iters
         WHERE lbl IS NOT NULL ORDER BY id"""
  }

  /** Deterministic doc_id-keyed PII decoration for q161/q162: appends an
    * email (ids % 3 = 0), a dashed phone (% 2), an ipv4 (% 5) and an
    * ssn-shaped id (% 7) so per-class counts vary and ~1/4 of docs stay
    * clean. Mirrored verbatim in the oracle SQL. */
  def piiDecorated(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(id,
      concat(col("text"),
        when(id % 3 === 0, concat(lit(" Contact user"), id.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
        when(id % 2 === 0, concat(lit(" call 555-"),
          lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(id.cast("string"), 4, "0"))).otherwise(lit("")),
        when(id % 5 === 0, concat(lit(" from 10.0."),
          (id % 256).cast("string"), lit("."),
          ((id * 7) % 256).cast("string"))).otherwise(lit("")),
        when(id % 7 === 0, lit(" ref 123-45-6789.")).otherwise(lit("")))
        .as("ptext"))
  }

  /** DuckDB oracles. Shared sub-SQL is inlined per query; dialect notes in
    * [[T2Queries]] apply. */
}
