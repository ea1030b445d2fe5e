package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}

/**
 * Verification queries for the training-data-pipeline extensions (dedup,
 * similarity search, text analysis, multimodal plumbing). Same contract as
 * [[T2Queries]]: DuckDB oracle where the computation is expressible in both
 * dialects; sketch-based ops (MinHash/SimHash/LSH — engine-side XXH64) are
 * rows-only checked by the driver and exact-verified in the ScalaTest suite
 * instead.
 */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val qvecScala: Array[Float] = Array.fill(64)(0.125f)
  // second fixed query vector for the batched-search query: alternating sign
  private val qvec2Scala: Array[Float] =
    Array.tabulate(64)(i => if (i % 2 == 0) 0.125f else -0.125f)
  private def vecSql(v: Array[Float]): String =
    v.map(x => f"$x%.3f").mkString("[", ", ", "]")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deduplication ----
    "q42_dedup_exact" -> ((s, d) =>
      // exact dedup by content hash; keyed on a 40-char prefix because the
      // synthetic corpus has no full-text duplicates (23 prefix groups)
      Dedup.exactDuplicates(t(s, d, "documents"), col("doc_id"),
        substring(col("text"), 1, 40)).orderBy("h")),
    "q43_dedup_minhash" -> ((s, d) =>
      // MinHash(64)+LSH(16x4) candidates, exact-verified at Jaccard >= 0.7;
      // unigram shingles (this bag-of-words corpus has no word-3-gram
      // near-dups); sketch hashing is engine-side -> rows-only oracle,
      // recall vs brute force is unit-tested
      Dedup.minHashDuplicates(
        t(s, d, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), 0.7, shingleSize = 1)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("j"))
        .orderBy("a_id", "b_id")),
    "q44_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(
        t(s, d, "documents").filter(col("doc_id") < 100),
        col("doc_id"), col("text"), 0.75)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("j"))
        .orderBy("a_id", "b_id")),
    "q45_dedup_cosine" -> ((s, d) =>
      Ann.nearDupPairs(
        t(s, d, "embeddings").filter(col("vec_id") < 300),
        col("vec_id"), col("embedding"), 0.40)
        .orderBy("a_id", "b_id")),
    "q46_dedup_simhash" -> ((s, d) =>
      // SimHash banding + hamming verify; engine-side hashing -> rows-only.
      // maxHamming 20 on this vocabulary-overlap corpus yields real pairs.
      Dedup.simHashDuplicates(
        t(s, d, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), maxHamming = 20)
        .orderBy("a_id", "b_id")),

    // ---- similarity search ----
    "q47_ann_lsh" -> ((s, d) =>
      // LSH-bucketed approximate top-k (rows-only; recall vs brute force is
      // unit-tested at sf0.001)
      Ann.lshTopK(t(s, d, "embeddings"), col("vec_id"), col("embedding"),
        qvecScala, k = 6, nbits = 4, probes = 2)),

    // ---- text analysis ----
    "q48_token_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
        .orderBy("doc_id").limit(200)),
    "q49_lang_id" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred"))
        .orderBy("doc_id").limit(200)),
    "q50_quality_score" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
        .orderBy("doc_id").limit(200)),
    "q51_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id").limit(200)),

    // ---- multimodal plumbing ----
    "q52_multimodal_bytes" -> ((s, d) =>
      Multimodal.assetsFromText(t(s, d, "documents"))
        .select(col("asset_id"), col("modality"),
          length(col("bytes")).cast("bigint").as("nbytes"))
        .orderBy("asset_id").limit(200)),
    "q54_padding_stats" -> ((s, d) =>
      // A6 padding accounting: batch-of-32 padded-token totals for arrival
      // vs length-sorted order (the reference's K2 optimization, quantified)
      graft.ops.BatchStats.paddingEfficiency(
        t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tok")),
        col("doc_id"), col("n_tok"), 32)
        .orderBy("batch_order")),
    "q55_subword_estimate" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.subwordCountEstimate(col("text")).cast("bigint").as("n_sub"))
        .orderBy("doc_id").limit(200)),
    "q56_ingest_pipeline" -> ((s, d) =>
      // ingest-throughput proxy: full-corpus chunk(1200/600) + normalize +
      // embed, aggregated (engine-side chunk semantics -> rows-only oracle)
      t(s, d, "documents")
        .select(col("doc_id"), graft.functions.chunk_document(
          col("text"), lit(1200), lit(600)))
        .select(col("doc_id"), graft.functions.normalize_text(
          col("chunk_text")).as("ntext"))
        .filter(col("ntext").isNotNull)
        .select(graft.functions.l2_norm(
          graft.functions.hash_embed(col("ntext"))).as("nrm"))
        // sum of norms in the output keeps the embed stage un-prunable
        .agg(count("*").as("n_chunks"), round(sum("nrm"), 2).as("norm_sum"))),
    "q64_batched_topk" -> ((s, d) => {
      // batched multi-query top-k: every query scores in ONE scan of the
      // embeddings (broadcast query matrix + window rank) - the Spark-native
      // amortization the one-query-at-a-time reference cannot express
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val qdf = Seq(("qa", qvecScala), ("qb", qvec2Scala)).toDF("query_id", "qvec")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      t(s, d, "embeddings")
        .crossJoin(org.apache.spark.sql.functions.broadcast(qdf))
        .select(col("query_id"), col("vec_id"),
          round(graft.functions.cosine_similarity(col("embedding"), col("qvec")), 4)
            .as("sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("query_id", "vec_id", "sim")
        .orderBy("query_id", "rnk")
    }),
    "q63_percentiles" -> ((s, d) =>
      // exact interpolated percentiles per group (corpus length profiling)
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"),
          round(expr("percentile(l_extendedprice, 0.99)"), 2).as("price_p99"))
        .orderBy("l_returnflag")),
    "q59_split_assign" -> ((s, d) =>
      // deterministic md5-based train/val/test split: per-split counts must
      // match the oracle's identical assignment exactly
      t(s, d, "documents")
        .select(graft.ops.Curation.splitAssign(col("doc_id")).as("split"))
        .groupBy("split").agg(count("*").as("n")).orderBy("split")),
    "q60_pii_redact" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        graft.ops.Curation.piiRedact(
          concat(col("text"), lit(" mail x@y.com site https://ex.com/p id 1234567")))
          .as("red"))
        .orderBy("doc_id").limit(100)),
    "q61_term_frequencies" -> ((s, d) =>
      graft.ops.Curation.termFrequencies(t(s, d, "documents"), col("text"), 20)),
    "q62_pack_sequences" -> ((s, d) =>
      graft.ops.Curation.packSequences(
        t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tok")),
        col("doc_id"), col("n_tok"), 512L)),
    "q58_salted_aggregate" -> ((s, d) =>
      // salting changes the shuffle shape, not the answer: this result must
      // hash-match the plain GROUP BY the oracle runs
      graft.ops.Scale.saltedAggregate(
        t(s, d, "events"), col("event_type"), floor(col("value")))
        .select(col("k").as("event_type"), col("n"), col("s").cast("bigint").as("s"),
          col("mn").cast("bigint").as("mn"), col("mx").cast("bigint").as("mx"))
        .orderBy("event_type")),
    "q57_gap_and_island" -> ((s, d) => {
      // A3's page-range coalescing as the scalable window formulation
      // (SURVEY §2.5: "window lag-based gap-and-island in SQL"): runs of
      // consecutive doc_ids per lang collapse to (start, end) ranges
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
      t(s, d, "documents")
        .select(col("lang"), col("doc_id"),
          (col("doc_id") - row_number().over(w)).as("grp"))
        .groupBy("lang", "grp")
        .agg(min("doc_id").as("s"), max("doc_id").as("e"))
        .select(col("lang"), col("s"), col("e"))
        .orderBy("lang", "s")
    }),
    "q53_multimodal_features" -> ((s, d) =>
      // mapPartitions feature extraction over the binary column (stub
      // decoder, deterministic) -> rows-only
      Multimodal.extractImageFeatures(Multimodal.assetsFromText(
          t(s, d, "documents").filter(col("doc_id") < 100)))
        .select(col("asset_id"), col("modality"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
        .orderBy("asset_id"))
  )

  /** DuckDB oracles. Shared sub-SQL is inlined per query; dialect notes in
    * [[T2Queries]] apply. */
  val oracle: Map[String, String] = Map(
    "q42_dedup_exact" ->
      """SELECT sha256(substr(text, 1, 40)) AS h, count(*) AS n, min(doc_id) AS keep
         FROM documents GROUP BY h HAVING count(*) > 1 ORDER BY h""",
    "q44_dedup_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS tk
                      FROM documents WHERE doc_id < 100)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.tk, b.tk))), 4) AS j
         FROM toks a JOIN toks b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
               / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.75
         ORDER BY a_id, b_id""",
    "q45_dedup_cosine" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings WHERE vec_id < 300)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                round(list_cosine_similarity(a.v, b.v), 4) AS sim
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.40
         ORDER BY a_id, b_id""",
    "q48_token_count" ->
      """SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
         FROM documents ORDER BY doc_id LIMIT 200""",
    "q49_lang_id" ->
      """WITH h AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         c AS (
           SELECT doc_id,
             len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','with'], x))) AS en,
             len(list_filter(tk, x -> list_contains(['el','la','de','que','y','los','las','por'], x))) AS es,
             len(list_filter(tk, x -> list_contains(['le','la','les','des','est','une','dans','pour'], x))) AS fr,
             len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) AS de
           FROM h)
         SELECT doc_id,
           CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                WHEN en = greatest(en, es, fr, de) THEN 'en'
                WHEN es = greatest(en, es, fr, de) THEN 'es'
                WHEN fr = greatest(en, es, fr, de) THEN 'fr'
                ELSE 'de' END AS pred
         FROM c ORDER BY doc_id LIMIT 200""",
    "q50_quality_score" ->
      """WITH f AS (
           SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tk,
                  CAST(length(trim(text)) AS DOUBLE) AS nc FROM documents),
         g AS (
           SELECT doc_id, text, CAST(len(tk) AS DOUBLE) AS nt,
                  (nc - (len(tk) - 1)) / len(tk) AS mtl,
                  CAST(len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','with'], x))) AS DOUBLE) AS sh
           FROM f)
         SELECT doc_id,
           round((CASE WHEN nt BETWEEN 8 AND 10000 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN regexp_matches(text, '[.!?]') THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN sh / nt BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) AS q
         FROM g ORDER BY doc_id LIMIT 200""",
    "q51_fingerprint" ->
      """SELECT doc_id,
                list_reduce(
                  list_prepend(7::BIGINT,
                    list_transform(string_split(substr(text, 1, 64), ''),
                                   c -> CAST(ascii(c) AS BIGINT))),
                  (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM documents ORDER BY doc_id LIMIT 200""",
    "q54_padding_stats" ->
      """WITH tok AS (
           SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tok
           FROM documents),
         a AS (SELECT n_tok, (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS b FROM tok),
         ab AS (SELECT b, count(*) AS n, max(n_tok) AS mx, sum(n_tok) AS r FROM a GROUP BY b),
         at AS (SELECT 'arrival' AS batch_order, CAST(sum(r) AS BIGINT) AS real_total,
                       CAST(sum(mx * n) AS BIGINT) AS padded_total FROM ab),
         l AS (SELECT n_tok, (row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1) // 32 AS b FROM tok),
         lb AS (SELECT b, count(*) AS n, max(n_tok) AS mx, sum(n_tok) AS r FROM l GROUP BY b),
         lt AS (SELECT 'length_sorted' AS batch_order, CAST(sum(r) AS BIGINT) AS real_total,
                       CAST(sum(mx * n) AS BIGINT) AS padded_total FROM lb)
         SELECT batch_order, real_total, padded_total,
                round(CAST(real_total AS DOUBLE) / padded_total, 4) AS efficiency
         FROM (SELECT * FROM at UNION ALL SELECT * FROM lt) t ORDER BY batch_order""",
    "q55_subword_estimate" ->
      """SELECT doc_id,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE list_aggregate(list_transform(
                            string_split_regex(trim(text), '\s+'),
                            t -> greatest(1, CAST(ceil(length(t) / 4.0) AS INT))), 'sum')
                END AS BIGINT) AS n_sub
         FROM documents ORDER BY doc_id LIMIT 200""",
    "q64_batched_topk" ->
      s"""WITH q(query_id, qvec) AS (VALUES ('qa', ${vecSql(Array.fill(64)(0.125f))}),
                                            ('qb', ${vecSql(Array.tabulate(64)(i => if (i % 2 == 0) 0.125f else -0.125f))})),
         s AS (SELECT q.query_id, e.vec_id,
                      round(list_cosine_similarity(
                        list_transform(e.embedding, x -> CAST(x AS DOUBLE)), qvec), 4) AS sim
               FROM embeddings e CROSS JOIN q),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk FROM s)
         SELECT query_id, vec_id, sim FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""",
    "q63_percentiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.5), 4) AS p50,
                round(quantile_cont(l_quantity, 0.95), 4) AS p95,
                round(quantile_cont(l_extendedprice, 0.99), 2) AS price_p99
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q59_split_assign" ->
      """SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
                count(*) AS n
         FROM (SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
               FROM documents) t
         GROUP BY split ORDER BY split""",
    "q60_pii_redact" ->
      """SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(
                  concat(text, ' mail x@y.com site https://ex.com/p id 1234567'),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  'https?://[^\s]+', '<URL>', 'g'),
                  '\b\d{6,}\b', '<NUM>', 'g') AS red
         FROM documents ORDER BY doc_id LIMIT 100""",
    "q61_term_frequencies" ->
      """SELECT w, count(*) AS c
         FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents) t
         WHERE length(w) > 0
         GROUP BY w ORDER BY c DESC, w LIMIT 20""",
    "q62_pack_sequences" ->
      """WITH tok AS (
           SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS t
           FROM documents),
         c AS (SELECT doc_id, t,
                      COALESCE(sum(t) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
               FROM tok)
         SELECT CAST(cb // 512 AS BIGINT) AS bin, count(*) AS n_docs,
                CAST(sum(t) AS BIGINT) AS tokens
         FROM c GROUP BY bin ORDER BY bin""",
    "q58_salted_aggregate" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS s,
                CAST(floor(min(value)) AS BIGINT) AS mn,
                CAST(floor(max(value)) AS BIGINT) AS mx
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q57_gap_and_island" ->
      """SELECT lang, min(doc_id) AS s, max(doc_id) AS e
         FROM (SELECT lang, doc_id,
                      doc_id - row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS grp
               FROM documents) t
         GROUP BY lang, grp ORDER BY lang, s""",
    "q52_multimodal_bytes" ->
      """SELECT doc_id AS asset_id,
                ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
                CAST(octet_length(encode(text)) AS BIGINT) AS nbytes
         FROM documents ORDER BY asset_id LIMIT 200"""
    // q43/q46/q47/q53: engine-side sketches or partition-batch stubs ->
    // rows-only driver check + ScalaTest exact verification.
  )
}
