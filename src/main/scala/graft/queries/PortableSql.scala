package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}


/** Shared DuckDB SQL fragments replicating the engine's portable (md5)
  * chunk/normalize/embed kernels — the oracle side of
  * [[graft.expr.Chunker]] + [[graft.embed.HashEmbedder]] for ASCII corpora
  * (the synthetic `documents` table is verified printable-ASCII, so NFKC and
  * unicode-whitespace handling are no-ops). */
/** Oracle-side fragments for the PII queries (q161/q162). The regexes are
  * taken VERBATIM from [[graft.ops.TextAnalysis.piiPatterns]] — one source
  * of truth for both engines (the pattern subset is RE2-safe by contract);
  * `decorated` mirrors [[OpsQueries.piiDecorated]] in DuckDB SQL. */
private[queries] object PiiSql {
  private val pats: Map[String, String] =
    graft.ops.TextAnalysis.piiPatterns.map { case (n, p, _) => n -> p }.toMap
  val email: String = pats("email")
  val ipv4: String = pats("ipv4")
  val id: String = pats("id")
  val phone: String = pats("phone")
  val decorated: String =
    """SELECT doc_id, text
       || CASE WHEN doc_id % 3 = 0
            THEN ' Contact user' || doc_id || '@example.com' ELSE '' END
       || CASE WHEN doc_id % 2 = 0
            THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ELSE '' END
       || CASE WHEN doc_id % 5 = 0
            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
       || CASE WHEN doc_id % 7 = 0 THEN ' ref 123-45-6789.' ELSE '' END
       AS ptext FROM documents"""
}

private[queries] object PortableSql {

  /** Full [[graft.ops.Classify.logisticTrain]] replay as a CTE body (no
    * `WITH`): hashed 64-dim features over `documents`, y = (lang = 'en'),
    * then 5 unrolled full-batch GD steps with the 1/2^20 weight
    * quantization that makes the whole trajectory engine-exact — the
    * [[ivfTrainCtes]] unrolled-iteration trick applied to an optimizer.
    * Exposes `feats(doc_id, y, x)` and `w10(wl)` (wl[65] = bias). Text is decorated with a ` marker_<lang>` token (the piiDecorated discipline) and features are binary presence — the separable demo task. */
  def logisticTrainCtes: String = {
    val iters = (0 until 10).map { i =>
      s"""p$i AS (SELECT y, x,
             1 / (1 + exp(-(list_sum(list_transform(range(1, 65),
               j -> x[j] * w$i.wl[j])) + w$i.wl[65]))) AS p
           FROM feats CROSS JOIN w$i),
         g$i AS (SELECT j,
                avg((p - y) * (CASE WHEN j <= 64 THEN x[j] ELSE 1.0 END)) AS g
                 FROM p$i CROSS JOIN range(1, 66) r(j) GROUP BY j),
         w${i + 1} AS (SELECT list(floor((w$i.wl[j] - 8 * g) * 1048576 + 0.5)
                  / 1048576 ORDER BY j) AS wl
               FROM g$i CROSS JOIN w$i)"""
    }.mkString(",\n")
    s"""feats AS (
         SELECT doc_id, CAST(lang = 'en' AS INT) AS y,
                list_transform(range(0, 64), j ->
                  CASE WHEN len(list_filter(bks, b -> b = j)) > 0
                       THEN 1.0 ELSE 0.0 END) AS x
         FROM (SELECT doc_id, lang, tk,
                      list_transform(tk, t ->
                        CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 64) AS bks
               FROM (SELECT doc_id, lang,
                            list_filter(string_split_regex(
                                trim(text || ' marker_' || lang), '\\s+'),
                              z -> z <> '') AS tk
                     FROM documents))),
       w0 AS (SELECT list_transform(range(1, 66), j -> 0.0) AS wl),
       $iters"""
  }

  /** MinHash(64)+LSH(16×4) candidate generation + exact unigram-Jaccard
    * verification at ≥ 0.7 over `documents WHERE doc_id < 200` — CTE body
    * (no `WITH` keyword; callers prepend `WITH` or `WITH RECURSIVE`).
    * Ends at `vp(a_id, b_id, j)`: the verified near-duplicate pairs.
    * Mirrors [[graft.ops.Dedup.minHashDuplicates]] via the md5-portable
    * sketch kernels. */
  def minhashVerifiedPairCtes: String =
    """toks AS (
         SELECT doc_id, unnest(list_filter(list_distinct(string_split_regex(text, '\s+')), x -> x <> '')) AS s
         FROM documents WHERE doc_id < 200 AND length(trim(text)) > 0),
       hs AS (
         SELECT doc_id,
                CAST('0x' || substr(md5(s), 1, 7) AS BIGINT) AS h1,
                CAST('0x' || substr(md5(s), 9, 7) AS BIGINT) | 1 AS h2
         FROM toks),
       sig AS (
         SELECT doc_id, i, min((h1 + i * h2) % 268435399) AS v
         FROM hs CROSS JOIN range(64) r(i) GROUP BY doc_id, i),
       band AS (
         SELECT doc_id, i // 4 AS band,
                string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS key
         FROM sig GROUP BY doc_id, i // 4),
       cand AS (
         SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM band a JOIN band b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       sets AS (
         SELECT doc_id, list_filter(list_distinct(string_split_regex(text, '\s+')), x -> x <> '') AS tk
         FROM documents WHERE doc_id < 200),
       vp AS (
         SELECT c.a_id, c.b_id,
                round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.tk, b.tk))), 4) AS j
         FROM cand c JOIN sets a ON c.a_id = a.doc_id
                     JOIN sets b ON c.b_id = b.doc_id
         WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
               / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.7)"""

  /** Connected components over `vp(a_id, b_id, …)` — CTE body (requires a
    * `WITH RECURSIVE` prefix and [[minhashVerifiedPairCtes]] before it).
    * Ends at `cc(id, cluster_id)`: each node labeled with the min reachable
    * id, the fixpoint [[graft.ops.Dedup.duplicateClusters]] converges to.
    * Shared by the q80 (clusters) and q82 (surviving corpus) oracles. */
  def ccCtes: String =
    """edges AS (SELECT a_id AS s, b_id AS d FROM vp
                 UNION ALL SELECT b_id, a_id FROM vp),
       nodes AS (SELECT DISTINCT s AS id FROM edges),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.d, r.lbl FROM reach r JOIN edges e ON r.id = e.s),
       cc AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)"""

  /** 5-gram span-detection CTE body shared by the q97/q100/q103/q107
    * oracles (no `WITH`): `toks(doc_id, t)` → `gl` (gram lists) →
    * `grams(doc_id, g, pos)` (0-based starts) → `rep(g)` (grams in ≥ 2
    * docs). Callers append their own `cov` (covered starts) and either
    * the interval-merge or the [[spanStripTail]] rebuild. */
  def spanGramCtes: String = spanGramCtes("")

  /** As [[spanGramCtes]] but `rep` counts only rows matching `repWhere`
    * (e.g. `"WHERE doc_id < 400"`) — the incremental-scrub oracles build
    * the gram table from a corpus subset. */
  def spanGramCtes(repWhere: String): String =
    s"""toks AS (
         SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
         FROM documents),
       gl AS (SELECT doc_id, [array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)] AS gs
              FROM toks WHERE len(t) >= 5),
       grams AS (SELECT doc_id, unnest(gs) AS g, generate_subscripts(gs, 1) - 1 AS pos FROM gl),
       rep AS (SELECT g FROM grams $repWhere GROUP BY g HAVING count(DISTINCT doc_id) >= 2)"""

  /** Span-REMOVAL CTE tail (requires [[spanGramCtes]] and a
    * `cov(doc_id, pos)` CTE before it): expands covered starts to token
    * indices, rebuilds surviving tokens as `kept(doc_id, tok, ti)`. */
  def spanStripTail: String =
    """dropped AS (SELECT DISTINCT doc_id, pos + off AS ti FROM cov CROSS JOIN range(5) r(off)),
       tokpos AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS ti FROM toks),
       kept AS (SELECT tp.doc_id, tp.tok, tp.ti
                FROM tokpos tp LEFT JOIN dropped d
                  ON tp.doc_id = d.doc_id AND tp.ti = d.ti
                WHERE d.ti IS NULL)"""

  /** Cosine mirroring VectorOps.cosine exactly:
    * dot / (sqrt(na) * sqrt(nb)). */
  def cosSql(a: String, b: String): String =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  /** IVF k-means training + full assignment as a WITH prefix (open-ended:
    * append further CTEs then a SELECT). Re-trains [[graft.ops.Ivf]]'s
    * centroids bit-for-bit: md5-hash seed draw, 50% md5 training sample,
    * two Lloyd iterations — assign to argmax-cosine centroid (ties →
    * lowest cid), update = per-dim mean QUANTIZED to 1/1024, empty
    * clusters keep the previous centroid. Exposes `c2` (cid, centroid)
    * and `bf` (id, v, cid): every vector with its assigned cluster. */
  def ivfTrainSql: String = ivfTrainSql(8)

  /** As [[ivfTrainSql]] with a caller-chosen centroid count (`LIMIT
    * nlist` seed draw) — the auto-scaled SemDeDup oracle re-trains at
    * ⌈√n⌉ instead of q66's fixed 8. */
  def ivfTrainSql(nlist: Int): String =
    s"WITH ${ivfTrainCtes("", nlist)},"

  /** [[ivfTrainSql]] at the AUTO-SCALED nlist = ⌈√n⌉ of the embeddings
    * table itself (a scalar-subquery LIMIT), so the oracle tracks the
    * op's `nlist <= 0` auto-scale at EVERY data scale — the round-13
    * sf0.1 sweep caught the previous hardcoded 23 (⌈√500⌉, sf0.01-only)
    * training a different clustering than the op's ⌈√5000⌉ = 71. */
  def ivfTrainSqlAuto: String =
    s"WITH ${ivfTrainCtes("",
      "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)")},"

  /** [[ivfTrainSql]]'s CTE list with every name prefixed by `p` (no
    * leading WITH, no trailing comma) — so one statement can train at
    * SEVERAL centroid counts side by side (the elbow-curve oracle), the
    * same trick [[pqSubTrainSql]] uses per subspace. Exposes `${p}c2`
    * and `${p}bf`. */
  def ivfTrainCtes(p: String, nlist: Int): String =
    ivfTrainCtes(p, nlist.toString)

  /** As [[ivfTrainCtes]] with the seed-count rendered verbatim into the
    * `LIMIT` (an integer literal or a scalar subquery). */
  def ivfTrainCtes(p: String, nlist: String): String = {
    def iter(i: Int, prev: String): String =
      s"""${p}a$i AS (SELECT x.id, x.v, c.cid, ${cosSql("x.v", "c.c")} AS sim
                  FROM ${p}tr x CROSS JOIN $prev c),
         ${p}b$i AS (SELECT id, v, cid FROM
                  (SELECT *, row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn
                   FROM ${p}a$i) WHERE rn = 1),
         ${p}u$i AS (SELECT cid, j, round(avg(v[j + 1]) * 1024) / 1024 AS q
                 FROM ${p}b$i CROSS JOIN range(64) r(j) GROUP BY cid, j),
         ${p}n$i AS (SELECT cid, list(q ORDER BY j) AS c FROM ${p}u$i GROUP BY cid),
         ${p}c$i AS (SELECT pp.cid, coalesce(${p}n$i.c, pp.c) AS c
                 FROM $prev pp LEFT JOIN ${p}n$i ON pp.cid = ${p}n$i.cid)"""
    s"""${p}v AS (
         SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       ${p}hs AS (SELECT id, v,
                CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT) AS h
              FROM ${p}v),
       ${p}tr AS (SELECT id, v, h FROM ${p}hs WHERE h % 100 < 50),
       ${p}seeds AS (SELECT v, h FROM ${p}tr ORDER BY h LIMIT $nlist),
       ${p}c0 AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cid, v AS c FROM ${p}seeds),
       ${iter(1, s"${p}c0")},
       ${iter(2, s"${p}c1")},
       ${p}af AS (SELECT x.id, x.v, c.cid, ${cosSql("x.v", "c.c")} AS sim
              FROM ${p}v x CROSS JOIN ${p}c2 c),
       ${p}bf AS (SELECT id, v, cid FROM
               (SELECT *, row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn
                FROM ${p}af) WHERE rn = 1)"""
  }

  /** Per-subspace PQ codebook training — [[ivfTrainSql]]'s exact
    * arithmetic on a LIST SLICE `embedding[lo:hi]` (md5 seed draw, 50%
    * sample, 2 Lloyd iterations, 1/1024-quantized means, ksub = 8), every
    * CTE prefixed with `p` so the q85 oracle trains all subspaces in one
    * statement. Exposes `${p}c2` (cid, centroid) and `${p}bf` (id, v,
    * cid): every sub-vector with its code. */
  def pqSubTrainSql(p: String, lo: Int, hi: Int, dims: Int): String =
    pqSubTrainFrom(p,
      s"""SELECT vec_id AS id,
                list_transform(embedding[$lo:$hi], x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings""", dims)

  /** [[pqSubTrainSql]] generalized to any `(id, v DOUBLE[])` source SELECT
    * — the residual-IVFADC oracle trains its sub-codebooks on slices of
    * the residual CTE instead of raw `embeddings`. */
  def pqSubTrainFrom(p: String, vSql: String, dims: Int): String = {
    def iter(i: Int, prev: String): String =
      s"""${p}a$i AS (SELECT x.id, x.v, c.cid, ${cosSql("x.v", "c.c")} AS sim
                  FROM ${p}tr x CROSS JOIN $prev c),
         ${p}b$i AS (SELECT id, v, cid FROM
                  (SELECT *, row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn
                   FROM ${p}a$i) WHERE rn = 1),
         ${p}u$i AS (SELECT cid, j, round(avg(v[j + 1]) * 1024) / 1024 AS q
                 FROM ${p}b$i CROSS JOIN range($dims) r(j) GROUP BY cid, j),
         ${p}n$i AS (SELECT cid, list(q ORDER BY j) AS c FROM ${p}u$i GROUP BY cid),
         ${p}c$i AS (SELECT pp.cid, coalesce(${p}n$i.c, pp.c) AS c
                 FROM $prev pp LEFT JOIN ${p}n$i ON pp.cid = ${p}n$i.cid)"""
    s"""${p}v AS ($vSql),
       ${p}hs AS (SELECT id, v,
                CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT) AS h
              FROM ${p}v),
       ${p}tr AS (SELECT id, v, h FROM ${p}hs WHERE h % 100 < 50),
       ${p}seeds AS (SELECT v, h FROM ${p}tr ORDER BY h LIMIT 8),
       ${p}c0 AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cid, v AS c FROM ${p}seeds),
       ${iter(1, s"${p}c0")},
       ${iter(2, s"${p}c1")},
       ${p}af AS (SELECT x.id, x.v, c.cid, ${cosSql("x.v", "c.c")} AS sim
              FROM ${p}v x CROSS JOIN ${p}c2 c),
       ${p}bf AS (SELECT id, v, cid FROM
               (SELECT *, row_number() OVER (PARTITION BY id ORDER BY sim DESC, cid) AS rn
                FROM ${p}af) WHERE rn = 1)"""
  }

  /** BPE trainer oracle: base vocab CTEs `w0 → vc → v0` + `iters` unrolled
    * merge iterations `p{i} (pair counts) → m{i} (argmax) → v{i} (merged
    * vocab)`. The token-string encoding (U+0001 double-separator, literal
    * `replace` = left-to-right within-word merges) mirrors
    * [[graft.ops.Bpe]] exactly; `CAST(sum AS BIGINT)` dodges DuckDB's
    * HUGEINT sum. */
  def bpeTrainCtes(iters: Int): String = {
    val base = raw"""w0 AS (
         SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '')) AS w
         FROM documents),
       vc AS (SELECT w, count(*) AS cnt FROM w0 GROUP BY w),
       v0 AS (SELECT regexp_replace(w, '(.)', chr(1) || '\1' || chr(1), 'g') AS t,
                     cnt
              FROM vc)"""
    val its = (1 to iters).map { i =>
      s""",
       p$i AS (SELECT tk[i + 1] AS a, tk[i + 2] AS b, CAST(sum(cnt) AS BIGINT) AS s
              FROM (SELECT cnt, tk, unnest(range(len(tk) - 1)) AS i
                    FROM (SELECT cnt, string_split(trim(t, chr(1)),
                                    chr(1) || chr(1)) AS tk FROM v${i - 1}))
              GROUP BY 1, 2),
       m$i AS (SELECT a, b, s FROM p$i ORDER BY s DESC, a, b LIMIT 1),
       v$i AS (SELECT replace(v${i - 1}.t,
                       chr(1) || m$i.a || chr(1) || chr(1) || m$i.b || chr(1),
                       chr(1) || m$i.a || m$i.b || chr(1)) AS t, cnt
              FROM v${i - 1}, m$i)"""
    }.mkString
    base + its
  }

  /** SQL expression: subword count of word expression `w` under a literal
    * merge list — [[graft.ops.Bpe.segmentCount]]'s per-word kernel. */
  def bpeSegmentWordSql(w: String, merges: Seq[(String, String)]): String = {
    val enc = s"regexp_replace($w, '(.)', chr(1) || '\\1' || chr(1), 'g')"
    val folded = merges.foldLeft(enc) { case (acc, (a, b)) =>
      s"replace($acc, chr(1) || '$a' || chr(1) || chr(1) || '$b' || chr(1), chr(1) || '$a$b' || chr(1))"
    }
    s"len(string_split(trim($folded, chr(1)), chr(1) || chr(1)))"
  }

  /** CTE chain `docs → rawc → idxd → chunks(doc_id, chunk_index, ntext)`:
    * strip → fixed windows of `size` advancing by `step` → per-piece strip,
    * drop empties, index → index-side normalize (collapse whitespace, drop
    * empties). Mirrors Chunker.chunk + TextNorm.normalizeIndex. */
  def chunkCtes(size: Int, step: Int, where: String = ""): String =
    raw"""docs AS (
         SELECT doc_id, trim(text) AS clean FROM documents
         WHERE length(trim(text)) > 0 $where),
       rawc AS (
         -- window count derived PER DOCUMENT (ceil(len/step)): a fixed
         -- range(N) cross join would silently truncate any document
         -- longer than N*step chars, diverging from the engine's
         -- unbounded Chunker
         SELECT doc_id, $step * k AS st,
                trim(substr(clean, $step * k + 1, $size)) AS piece
         FROM (SELECT doc_id, clean,
                 unnest(range(CAST(ceil(CAST(length(clean) AS DOUBLE) / $step)
                   AS BIGINT))) AS k
               FROM docs)
         WHERE $step * k < length(clean)),
       idxd AS (
         SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1
                  AS chunk_index, piece
         FROM rawc WHERE length(piece) > 0),
       chunks AS (
         SELECT doc_id, chunk_index,
                trim(regexp_replace(piece, '\s+', ' ', 'g')) AS ntext
         FROM idxd WHERE length(trim(regexp_replace(piece, '\s+', ' ', 'g'))) > 0)"""

  /** CTE chain `<p>toks → <p>grams → <p>hash → <p>buck(<idCols>, b, wt)`:
    * the HashEmbedder sparse form — lowercase, whitespace tokens, char
    * 3-grams (short tokens whole), bucket `h % 64`, weight `1 + h % 7`,
    * h = 60-bit md5 prefix. Cosine follows as
    * `dot / (sqrt(sum wt²) * sqrt(sum wt²))` — identical arithmetic to
    * VectorOps.cosine because every sum is integer-exact. */
  def bucketCtes(p: String, src: String, idCols: String): String =
    raw"""${p}toks AS (
         SELECT $idCols, unnest(string_split_regex(lower(ntext), '\s+')) AS tok
         FROM $src),
       ${p}grams AS (
         SELECT $idCols, unnest(CASE WHEN length(tok) < 3 THEN [tok]
                  ELSE list_transform(range(length(tok) - 2),
                         i -> substr(tok, i + 1, 3)) END) AS g
         FROM ${p}toks),
       ${p}hash AS (
         SELECT $idCols, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h
         FROM ${p}grams),
       ${p}buck AS (
         SELECT $idCols, h % 64 AS b, sum(1 + h % 7) AS wt
         FROM ${p}hash GROUP BY $idCols, h % 64)"""

  /** BM25 CTE chain ending in `sc(doc_id, score)` over `documents` for the
    * given query terms — the oracle twin of [[graft.ops.Keyword.bm25]]
    * (k1 = 1.2, b = 0.75, RSJ idf with Lucene's +1 shift). */
  def bm25Sql(terms: Seq[String]): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    raw"""WITH lens AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents),
         lens2 AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS len, tk FROM lens),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(len) AS sl FROM lens2),
         tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
                       any_value(len) AS len
                FROM (SELECT doc_id, len, unnest(tk) AS term FROM lens2) x
                WHERE term IN ($inList)
                GROUP BY doc_id, term),
         dfc AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
         idf AS (SELECT term, ln((st.n - df + 0.5) / (df + 0.5) + 1) AS idf
                 FROM dfc, st),
         sc AS (SELECT tf.doc_id,
                       sum(idf.idf * tf.tf * (1.2 + 1.0)
                           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.len / (st.sl / st.n)))) AS score
                FROM tf JOIN idf USING (term), st GROUP BY tf.doc_id)"""
  }

  /** Query-string bucket CTEs `qtoks → qgrams → qhash → qbuck(b, wt)` for a
    * SQL string literal expression (same kernel, no id columns). */
  def queryBucketCtes(literalSql: String): String =
    raw"""qtoks AS (
         SELECT unnest(string_split_regex(lower($literalSql), '\s+')) AS tok),
       qgrams AS (
         SELECT unnest(CASE WHEN length(tok) < 3 THEN [tok]
                  ELSE list_transform(range(length(tok) - 2),
                         i -> substr(tok, i + 1, 3)) END) AS g
         FROM qtoks),
       qhash AS (
         SELECT CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h FROM qgrams),
       qbuck AS (SELECT h % 64 AS b, sum(1 + h % 7) AS wt FROM qhash GROUP BY h % 64)"""
}

