package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}

/**
 * Verification queries for the training-data-pipeline extensions (dedup,
 * similarity search, text analysis, multimodal plumbing). Same contract as
 * [[T2Queries]]: DuckDB oracle where the computation is expressible in both
 * dialects. Since round 2 the sketch kernels (MinHash/SimHash/LSH/hash-embed)
 * are md5-derived ([[graft.expr.PortableHash]]), so even those have full
 * DuckDB oracles — the SQL replicas live at the bottom of this file
 * ([[PortableSql]]) — plus exact ScalaTest verification.
 */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to TIMESTAMP (LTZ) — the same
    * NANOS/MICROS adaptation as T2Queries.t (see the comment there); the
    * temporal-join queries need real timestamp arithmetic, not just
    * ordering. */
  private def ev(s: SparkSession, dir: String): DataFrame = {
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
  private def attributionTouches(s: SparkSession, d: String): DataFrame = {
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
  private def removalEffectOracle(iters: Int): String = {
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
  private def wrapped4(docs: DataFrame, sep: String = "\n"): DataFrame =
    wrappedN(docs, 4, sep)

  private def wrappedN(docs: DataFrame, n: Int, sep: String): DataFrame = {
    val toks = array_remove(split(col("text"), "\\s+"), "")
    docs.select(col("doc_id"),
      when(size(toks) === 0, lit("")).otherwise(
        array_join(transform(
          sequence(lit(0), ceil(size(toks) / lit(n.toDouble)).cast("int") - 1),
          i => concat_ws(" ", slice(toks, i * n + 1, lit(n)))), sep))
        .as("wtext"))
  }

  private val qvecScala: Array[Float] = Array.fill(64)(0.125f)
  // second fixed query vector for the batched-search query: alternating sign
  private val qvec2Scala: Array[Float] =
    Array.tabulate(64)(i => if (i % 2 == 0) 0.125f else -0.125f)
  private def vecSql(v: Array[Float]): String =
    v.map(x => f"$x%.3f").mkString("[", ", ", "]")

  /** Fixed merge list for the q91 tokenizer-inference query (what
    * [[graft.ops.Bpe.train]] learns on the sf0.01 corpus; any literal
    * list is equally valid — query and oracle apply the same one). */
  private val bpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"), ("m", "er"))

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
      // near-dups); md5 sketch kernel -> the oracle recomputes the exact
      // signatures; recall vs brute force is also unit-tested
      Dedup.minHashDuplicates(
        t(s, d, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), 0.7, shingleSize = 1)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("j"))
        .orderBy("a_id", "b_id")),
    "q80_dup_clusters" -> ((s, d) => {
      // pair detection -> duplicate CLUSTERS (connected components by
      // iterative min-label propagation): the canonical-doc selection step
      // a real dedup pipeline runs after LSH finds the pairs
      val pairs = Dedup.minHashDuplicates(
        t(s, d, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), 0.7, shingleSize = 1)
      val cc = Dedup.duplicateClusters(pairs, col("a_id"), col("b_id"))
      cc.join(cc.groupBy("cluster_id").agg(count("*").as("cluster_size")),
          "cluster_id")
        .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
        .orderBy("doc_id")
    }),
    "q82_dedup_corpus" -> ((s, d) =>
      // the end of the dedup story: pairs (q43) -> clusters (q80) -> the
      // deduplicated corpus itself (keep each cluster's min-id doc)
      Dedup.dedupCorpus(t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), 0.7, shingleSize = 1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")),
    "q81_semantic_dedup" -> ((s, d) =>
      // SemDeDup at the auto-scaled clustering: nlist defaults to
      // ceil(sqrt(n)) = 23 on the 500-vector sf0.01 table (the oracle
      // re-trains the same 23-centroid run); within-cluster cosine >= tau
      // drops the larger id of each pair
      Dedup.semanticDedup(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), threshold = 0.4, iters = 2)
        .select(col("id").as("vec_id"), col("cluster").cast("long").as("cluster"),
          col("keep"))
        .orderBy("vec_id")),

    "q87_incremental_dedup" -> ((s, d) => {
      // daily-ingest shape: docs 150-199 arrive as a new batch and are
      // checked against the persisted band table of corpus docs 0-149 —
      // zero corpus signature recomputation, cross pairs only
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") < 150)
      val batch = docs.filter(col("doc_id") >= 150 && col("doc_id") < 200)
      val bt = Dedup.bandTable(corpus, col("doc_id"), col("text"),
        shingleSize = 1)
      Dedup.incrementalDuplicates(batch, col("doc_id"), col("text"), bt,
          corpus, col("doc_id"), col("text"), 0.7, shingleSize = 1)
        .select(col("corpus_id"), col("new_id"),
          round(col("jaccard"), 4).as("j"))
        .orderBy("corpus_id", "new_id")
    }),

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
      // SimHash banding + hamming verify (60-bit md5 kernel, full oracle).
      // maxHamming 20 on this vocabulary-overlap corpus yields real pairs.
      Dedup.simHashDuplicates(
        t(s, d, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), maxHamming = 20)
        .orderBy("a_id", "b_id")),
    "q114_containment" -> ((s, d) =>
      // near-subset detection: one-sided Jaccard over LSH candidates —
      // quoted/excerpted docs that symmetric Jaccard misses
      Dedup.containmentPairs(t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), threshold = 0.9)
        .orderBy("a_id", "b_id")),
    "q113_dedup_eval" -> ((s, d) => {
      // dedup-quality evaluation: the banded MinHash path scored against
      // exact all-pairs Jaccard ground truth (bounded range). Precision
      // is 1.0 by construction (candidates are exact-verified); recall
      // measures what banding misses — the number an index tuner watches.
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      val approx = Dedup.minHashDuplicates(docs, col("doc_id"), col("text"),
        0.7, shingleSize = 1).select(col("a_id"), col("b_id"))
      val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        0.7, shingleSize = 1).select(col("a_id"), col("b_id"))
      approx.join(exact, Seq("a_id", "b_id")).agg(count(lit(1)).as("tp"))
        .crossJoin(approx.agg(count(lit(1)).as("n_approx")))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select(col("tp"), col("n_approx"), col("n_exact"),
          round(col("tp") / col("n_approx").cast("double"), 4).as("prec"),
          round(col("tp") / col("n_exact").cast("double"), 4).as("recall"))
    }),
    "q96_line_dedup" -> ((s, d) => {
      // RefinedWeb line-level scrub: documents are single-line word bags,
      // so wrap them into 4-token lines first (deterministic re-lining;
      // the operator itself is generic over \n), then drop every line
      // repeated across >= 3 documents and rebuild the docs
      Dedup.lineDedup(wrapped4(t(s, d, "documents")), col("doc_id"),
          col("wtext"), minDocs = 3)
        .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "q138_decontaminate" -> ((s, d) => {
      // the removal twin of q70: docs sharing >= 2 distinct 3-grams with
      // the benchmark drop; the surviving corpus is the product
      val docs = t(s, d, "documents")
      graft.ops.QualitySignals.decontaminate(
          docs.filter(col("doc_id") >= 5), col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 5), col("text"), minShared = 2L)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),
    "q139_nb_model" -> ((s, d) =>
      // multinomial NB fit as pure counting: the (label, term, logp)
      // model table, add-one smoothed, vocab-bounded
      graft.ops.Classify.nbTrain(t(s, d, "documents"),
          col("lang"), col("text"))
        .orderBy("label", "term").limit(400)),
    "q140_nb_predict" -> ((s, d) => {
      // fit on the corpus, score every document row-locally against the
      // broadcast model; argmax on 4dp-rounded scores, ties alphabetical
      val docs = t(s, d, "documents")
      val model = graft.ops.Classify.nbFit(docs, col("lang"), col("text"))
      graft.ops.Classify.nbPredict(docs, col("doc_id"), col("text"), model)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q141_range_shards" -> ((s, d) =>
      // exact ntile range sharding on the unique (n_chars, doc_id) order;
      // the stats prove balance (±1 row) and ordered, non-overlapping
      // key ranges across shards — the globally-sorted export contract
      graft.ops.Curation.rangeShardAssign(
          t(s, d, "documents").select(col("doc_id"), col("n_chars")),
          Seq(col("n_chars"), col("doc_id")), 16)
        .groupBy(col("shard").cast("bigint").as("shard"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("n_chars")).as("min_key"), max(col("n_chars")).as("max_key"))
        .orderBy("shard")),
    "q142_langid_calibration" -> ((s, d) =>
      // margin-confidence calibration of the langId heuristic against
      // the declared lang: per-bucket doc count and agreement rate
      TextAnalysis.langIdCalibration(t(s, d, "documents"),
        col("text"), col("lang")).orderBy("bucket")),
    "q143_cdc_dedup" -> ((s, d) =>
      // content-defined chunking (w=2 anchor window, divisor 8 -> ~8-token
      // chunks) + per-doc share of chunks duplicated across documents
      Dedup.cdcDupFraction(t(s, d, "documents"), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    "q144_longest_shared_span" -> ((s, d) =>
      // exact longest cross-document token run + smallest witness pair,
      // found by doubling/binary search over gram-hash probes
      Dedup.longestSharedSpan(t(s, d, "documents"),
        col("doc_id"), col("text"))),
    "q145_datasheet" -> ((s, d) =>
      // the release datasheet: one row of corpus-level statistics
      graft.ops.Curation.datasheet(t(s, d, "documents"),
        col("text"), col("n_chars"))),
    "q146_elbow_curve" -> ((s, d) =>
      // clustering-quality elbow: mean cosine distance to the assigned
      // centroid at k = 4/8/16 (trained like q66, 50% md5 sample)
      graft.ops.Ivf.inertiaCurve(t(s, d, "embeddings"),
        col("vec_id"), col("embedding"), Seq(4, 8, 16),
        iters = 2, sampleFraction = 50)),
    "q147_cdc_scrub_against" -> ((s, d) => {
      // rsync-style incremental block dedup: chunks duplicated inside the
      // "yesterday" corpus (doc_id < 250) scrub out of the new batch
      val docs = t(s, d, "documents")
      val dup = Dedup.cdcChunks(docs.filter(col("doc_id") < 250),
          col("doc_id"), col("text"))
        .select(col("h"), col("id")).distinct()
        .groupBy("h").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("h")
      Dedup.cdcScrubAgainst(docs.filter(col("doc_id") >= 250),
          col("doc_id"), col("text"), dup)
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "q148_heavy_hitters_sketch" -> ((s, d) =>
      // Misra-Gries at capacity >> vocab: exact counts through the
      // bounded-memory path (q61's sketch sibling, as q65 is to q63)
      graft.ops.Scale.heavyHittersSketch(t(s, d, "documents"),
        col("text"), capacity = 1024, topN = 15)),
    "q149_knn_graph_recall" -> ((s, d) => {
      // edge recall of the IVF-pruned kNN graph vs the exact graph —
      // what same-cell pruning costs at nlist=8 (trained like q66)
      val emb = t(s, d, "embeddings")
      val exact = Ann.knnGraph(emb, col("vec_id"), col("embedding"), 3)
        .select(col("id"), col("nbr"))
      val approx = Ann.knnGraphIvf(emb, col("vec_id"), col("embedding"), 3,
          nlist = 8, iters = 2, sampleFraction = 50)
        .select(col("id"), col("nbr"))
      val e = exact.agg(count(lit(1)).as("n_edges"))
      val m = exact.join(approx, Seq("id", "nbr"), "left_semi")
        .agg(count(lit(1)).as("n_matched"))
      e.crossJoin(m).select(col("n_edges"), col("n_matched"),
        round(col("n_matched") / col("n_edges"), 4).as("recall"))
    }),
    "q350_ivfpq_recall" -> ((s, d) => {
      // recall@10 audit of the PRODUCTION residual-IVFADC pipeline —
      // ADC shortlist (k'=100) + exact rerank — against exact search:
      // the oracle-checked quality floor behind q94's probe/code
      // tuning. Exact rerank of the shortlist returns exactly
      // shortlist ∩ exact-top-10 (plus fill), so recall@10 ==
      // |shortlist ∩ exact10| / 10 and the rerank leg needn't
      // materialize. Embeddings are unit-norm, so the exact cosine
      // order IS the L2 order the ADC approximates; recall_ok pins
      // the contract at >= 0.5.
      val emb = t(s, d, "embeddings")
      val qs = Seq("qa" -> qvecScala, "qb" -> qvec2Scala)
      val exact = graft.ops.Ann.bruteForceTopKMany(emb, col("vec_id"),
          col("embedding"), qs, k = 10)
        .select(col("query_id"), col("id"))
      val short = graft.ops.Pq.ivfPqResidualTopKMany(emb, col("vec_id"),
          col("embedding"), qs, k = 100, nlist = 8, nprobe = 4, m = 4,
          ksub = 8, iters = 2)
        .select(col("query_id"), col("id"))
      val n = exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      val mt = exact.join(short, Seq("query_id", "id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_matched"))
      n.join(mt, Seq("query_id"), "left")
        .select(col("query_id"), col("n_exact"),
          coalesce(col("n_matched"), lit(0L)).as("n_matched"))
        .withColumn("recall",
          round(col("n_matched") / col("n_exact"), 4))
        .withColumn("recall_ok", col("recall") >= 0.5)
        .orderBy("query_id")
    }),
    "q150_covariance" -> ((s, d) =>
      // upper-triangle sample covariance of the embedding column — the
      // whitening/drift statistic, one pass, zero exchanges
      Ann.covarianceMatrix(t(s, d, "embeddings"), col("embedding"), 64)
        .orderBy("i", "j")),
    "q151_kneser_ney" -> ((s, d) =>
      // Kneser-Ney-smoothed sibling of q93: same bigram stream, the
      // discount/continuation formula instead of add-one
      graft.ops.QualitySignals.kneserNeyScore(
          t(s, d, "documents"), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    "q152_suffix_ranks" -> ((s, d) =>
      // distributed suffix array (prefix doubling) over a bounded
      // sub-corpus (every 5th doc — the q45-style bounded verification;
      // the op itself is corpus-generic): every rank depends on every
      // suffix of the input, so the full dump verifies the construction
      graft.ops.Suffix.suffixRanks(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"))
        .orderBy("doc_id", "pos")),
    "q153_longest_repeat" -> ((s, d) =>
      // suffix-array read-off: longest repeated run (within OR across
      // docs) = max LCP of rank-adjacent suffixes; same bounded
      // sub-corpus as q152
      graft.ops.Suffix.longestRepeat(
        t(s, d, "documents").filter(col("doc_id") % 5 === 0),
        col("doc_id"), col("text"))),
    "q154_drift_psi" -> ((s, d) => {
      // nightly-ingest drift gate: PSI over hashed token buckets between
      // the reference (doc_id < 250) and candidate (>= 250) batches
      val docs = t(s, d, "documents")
      graft.ops.QualitySignals.driftPsi(
        docs.filter(col("doc_id") < 250), col("text"),
        docs.filter(col("doc_id") >= 250), col("text"))
    }),
    "q155_prefix_jaccard" -> ((s, d) =>
      // exact similarity join via prefix filtering: must hash-match the
      // brute-force oracle on the bounded range (exactness is the claim)
      Dedup.prefixJaccardJoin(
          t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), threshold = 0.85)
        .orderBy("a_id", "b_id")),
    "q156_c4_clean" -> ((s, d) => {
      // C4 heuristic line rules over the re-lined corpus. The word-bag
      // fixture has no punctuation, so even-indexed lines first get a
      // terminal '.' appended (deterministic, position-based) — the
      // terminal-punctuation rule then bites on exactly half the lines;
      // "spark" plays C4's javascript badword, "vector" its lorem-ipsum
      // doc marker
      val docs = wrapped4(t(s, d, "documents"))
      val punct = docs.select(col("doc_id"),
        array_join(transform(split(col("wtext"), "\n"), (l, i) =>
          when(i % 2 === 0 && length(l) > 0, concat(l, lit(".")))
            .otherwise(l)), "\n").as("wtext"))
      graft.ops.Curation.c4Clean(punct, col("doc_id"), col("wtext"),
          minLineWords = 4, badWords = Seq("spark"),
          dropDocMarkers = Seq("vector"))
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          col("doc_ok"), md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "q157_blocklist" -> ((s, d) =>
      // exact-token blocklist screen: per-doc hit count + ratio against
      // a 3-word list — the C4 badword-filter shape
      t(s, d, "documents")
        .select(col("doc_id"), graft.ops.TextAnalysis.blocklistSignals(
          col("text"), Seq("spark", "window", "stream")).as("b"))
        .select(col("doc_id"), col("b.n_hits").as("n_hits"),
          col("b.hit_ratio").as("hit_ratio"))
        .orderBy("doc_id")),
    "q158_unigram_vocab" -> ((s, d) =>
      // unigram-LM piece vocabulary: substring counts weighted by word
      // frequency, top-60 + forced single chars, integer milli-nat
      // scores (floor(1000·ln(cnt/total)) — engine-reproducible)
      graft.ops.Unigram.trainPieces(t(s, d, "documents"), col("text"),
          vocabSize = 60, maxPieceLen = 4, minCount = 2)
        .orderBy(desc("cnt"), asc("piece"))),
    "q159_unigram_segment" -> ((s, d) => {
      // Viterbi segmentation of every doc against the q158 vocab; the
      // oracle re-trains the vocab AND enumerates all segmentation paths
      // per word (recursive CTE), so the DP's argmax + tie-breaks are
      // verified bit-for-bit
      val docs = t(s, d, "documents")
      val vocab = graft.ops.Unigram.trainPieces(docs, col("text"),
        vocabSize = 60, maxPieceLen = 4, minCount = 2)
      graft.ops.Unigram.segment(docs, col("doc_id"), col("text"), vocab)
        .select(col("id").as("doc_id"), col("n_words"), col("n_pieces"),
          col("fertility"), md5(col("seg")).as("seg_md5"))
        .orderBy("doc_id")
    }),
    "q136_exact_sample" -> ((s, d) =>
      // exact-k simple random sample via md5 order statistic: one
      // TakeOrdered pass, content-keyed so any engine draws the same rows
      graft.ops.Curation.exactSample(
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("source")),
          col("doc_id"), k = 40)
        .orderBy("doc_id")),
    "q137_vocab_coverage" -> ((s, d) =>
      // tokenizer-budget diagnostic: share of token occurrences covered
      // by the V most frequent types, V in {100, 1000, 5000}
      graft.ops.Curation.vocabCoverage(t(s, d, "documents"), col("text"),
          Seq(100, 1000, 5000))
        .orderBy("vocab_size")),
    "q135_within_doc_dedup" -> ((s, d) =>
      // intra-document scrub: wrap into 2-token lines (181 docs repeat a
      // line internally at sf0.01), keep each line's FIRST occurrence —
      // the Gopher self-repetition cleanup, fully row-local
      Dedup.dedupWithinDoc(wrappedN(t(s, d, "documents"), 2, "\n"),
          col("doc_id"), col("wtext"))
        .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")),
    "q133_paragraph_dedup" -> ((s, d) => {
      // the RefinedWeb PARAGRAPH-level pass: same operator as q96 with
      // the unit boundary at blank lines ("\n\n") — one knob, no new
      // machinery; oracle splits on chr(10)||chr(10)
      Dedup.lineDedup(wrapped4(t(s, d, "documents"), "\n\n"), col("doc_id"),
          col("wtext"), minDocs = 3, sep = "\n\n")
        .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "q127_line_scrub_against" -> ((s, d) => {
      // the incremental twin of q96: docs < 400 are the persisted corpus
      // whose frequent-line table is the artifact; docs >= 400 arrive as
      // a batch and scrub against it row-locally (broadcast line set,
      // zero corpus recomputation) — the daily-ingest / streaming shape
      val w = wrapped4(t(s, d, "documents"))
      val freq = Dedup.frequentLines(w.filter(col("doc_id") < 400),
        col("doc_id"), col("wtext"), minDocs = 3)
      Dedup.lineDedupAgainst(w.filter(col("doc_id") >= 400),
          col("doc_id"), col("wtext"), freq)
        .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "q103_curation_pipeline" -> ((s, d) => {
      // the end-to-end curation story in one plan: cut duplicate spans,
      // quality-gate the CLEANED text, split deterministically, report
      // per-split volumes — every stage the composition of verified ops
      val cleaned = Dedup.stripDuplicateSpans(t(s, d, "documents"),
        col("doc_id"), col("text"), k = 5, minDocs = 2)
      cleaned
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
        .select(col("id"),
          graft.ops.Curation.splitAssign(col("id")).as("split"),
          (col("n_tokens") - col("n_removed")).as("n_tok"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
        .orderBy("split")
    }),
    "q107_strip_spans_keep_first" -> ((s, d) =>
      // Lee et al. remove-all-but-one: each repeated gram's min-(id,pos)
      // occurrence is canonical and survives the cut
      Dedup.stripDuplicateSpans(t(s, d, "documents"), col("doc_id"),
          col("text"), k = 5, minDocs = 2, keepFirst = true)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")),
    "q100_strip_spans" -> ((s, d) =>
      // the cleaned corpus after cutting q97's duplicate spans: token
      // counts + md5 of the rebuilt text per doc
      Dedup.stripDuplicateSpans(t(s, d, "documents"), col("doc_id"),
          col("text"), k = 5, minDocs = 2)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")),
    "q97_dup_spans" -> ((s, d) =>
      // suffix-array-style substring dedup at 5-gram granularity: maximal
      // token spans covered by grams repeated across >= 2 documents
      Dedup.duplicateSpans(t(s, d, "documents"), col("doc_id"), col("text"),
          k = 5, minDocs = 2)
        .select(col("id").as("doc_id"),
          col("span_start").cast("bigint").as("span_start"),
          col("span_end").cast("bigint").as("span_end"), col("n_grams"))
        .orderBy("doc_id", "span_start")),
    "q128_span_scrub_against" -> ((s, d) => {
      // the incremental twin of q100: docs < 400 are the persisted corpus
      // whose repeated-gram table is the artifact; docs >= 400 arrive as
      // a batch and scrub row-locally against the broadcast hash set —
      // zero corpus recomputation, the streaming/daily-ingest shape
      val docs = t(s, d, "documents")
      val gramTable = Dedup.repeatedGrams(docs.filter(col("doc_id") < 400),
        col("doc_id"), col("text"), k = 5, minDocs = 2)
      Dedup.spanScrubAgainst(docs.filter(col("doc_id") >= 400),
          col("doc_id"), col("text"), gramTable, k = 5)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // ---- similarity search ----
    "q47_ann_lsh" -> ((s, d) =>
      // LSH-bucketed approximate top-k (md5 hyperplanes -> the oracle
      // recomputes buckets + probes; recall also unit-tested at sf0.001)
      Ann.lshTopK(t(s, d, "embeddings"), col("vec_id"), col("embedding"),
        qvecScala, k = 6, nbits = 4, probes = 2)),

    "q66_ann_ivf" -> ((s, d) =>
      // IVF approximate top-k with LEARNED k-means centroids (md5 seeds,
      // 50% md5 training sample, 1/1024-quantized Lloyd updates -> the
      // DuckDB oracle re-trains the exact same centroids and reproduces
      // the probe + result set; assignment itself is shuffle-free)
      graft.ops.Ivf.ivfTopK(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), qvecScala, k = 6, nlist = 8, iters = 2, nprobe = 2)),

    "q79_ivf_batched" -> ((s, d) =>
      // batched IVF: centroids trained once, one corpus pass pruned to the
      // union of both queries' probe cells, per-query bounded top-k (no
      // window rank) — the searchMany amortization on the IVF path
      graft.ops.Ivf.ivfTopKMany(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), Seq("qa" -> qvecScala, "qb" -> qvec2Scala),
          k = 5, nlist = 8, iters = 2, nprobe = 2)
        .select(col("query_id"), col("rnk"), col("id").as("vec_id"), col("sim"))
        .orderBy("query_id", "rnk")),

    "q85_ann_pq" -> ((s, d) =>
      // product quantization: per-subspace codebooks (same md5 Lloyd as
      // q66, run per 16-dim slice), asymmetric-distance top-k via
      // driver-side lookup tables — the oracle re-trains all 4 codebooks
      graft.ops.Pq.pqTopK(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), qvecScala, k = 6, m = 4, ksub = 8, iters = 2)
        .select(col("id").as("vec_id"), col("dist"))),

    "q86_ann_ivfpq" -> ((s, d) =>
      // the composed index: IVF coarse cells prune WHICH rows score, PQ
      // codes shrink WHAT scoring costs; both row-local projections
      graft.ops.Pq.ivfPqTopK(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), qvecScala, k = 6, nlist = 8, nprobe = 2,
          m = 4, ksub = 8, iters = 2)
        .select(col("id").as("vec_id"), col("dist"))),

    "q122_prefiltered_ann" -> ((s, d) =>
      // PRE-filtered ANN: the metadata predicate prunes BEFORE ranking
      // (broadcast metadata join + filter, then the fused cosine top-k) —
      // the complement of the reference's filter-AFTER-top-k contract
      // (F5-F7), and the correct shape when the filter is selective
      t(s, d, "embeddings")
        .join(broadcast(t(s, d, "documents")
          .select(col("doc_id"), col("lang"))), col("vec_id") === col("doc_id"))
        .filter(col("lang") === "en")
        .select(col("vec_id"),
          round(graft.functions.cosine_similarity(col("embedding"),
            typedLit(qvec2Scala)), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)),
    "q99_binary_ann" -> ((s, d) =>
      // binary-quantized first stage: 64 sign bits -> two packed 32-bit
      // words, hamming top-50 candidates (bit_count(xor), zero exchanges),
      // exact-cosine rerank to top 10
      Ann.binaryTopK(t(s, d, "embeddings"), col("vec_id"), col("embedding"),
          qvec2Scala, k = 10, rerank = 50)
        .select(col("id").as("vec_id"), col("hamming"), col("sim"))),

    "q108_mean_pool" -> ((s, d) =>
      // chunk->document embedding pooling: element-wise mean per label
      // group, folded in ascending vec_id order so the float sum is
      // bit-deterministic (run-to-run AND engine parity)
      graft.ops.Ann.meanPool(t(s, d, "embeddings"), col("label"),
          col("vec_id"), col("embedding"))
        .select(col("group").as("label"), col("n"), posexplode(col("centroid")))
        .select(col("label"), col("n"), col("pos").cast("bigint").as("dim"),
          round(col("col"), 6).as("v"))
        .orderBy("label", "dim")),
    "q111_hard_negatives" -> ((s, d) =>
      // contrastive-training negatives: per-query top-5 by cosine with
      // the known positive ids excluded row-locally before ranking
      Ann.hardNegatives(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"),
          Seq(("qa", qvecScala, Seq(3L, 7L)), ("qb", qvec2Scala, Seq(2L))),
          k = 5)
        .select(col("query_id"), col("rnk"), col("id").as("vec_id"),
          col("sim"))),
    "q105_binary_batched" -> ((s, d) =>
      // batched binary search: one corpus pass, per-query bounded
      // top-rerank on broadcast packed query words, exact-cosine refine
      Ann.binaryTopKMany(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), Seq("qa" -> qvecScala, "qb" -> qvec2Scala),
          k = 5, rerank = 50)
        .select(col("query_id"), col("rnk"), col("id").as("vec_id"),
          col("sim"))),
    "q106_sq8_batched" -> ((s, d) =>
      // batched SQ8: per-query codes/scale broadcast with the query
      // frame, one pass, bounded per-query top-k, exact refine
      graft.ops.Quantize.int8TopKMany(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), Seq("qa" -> qvecScala, "qb" -> qvec2Scala),
          k = 5, rerank = 50)
        .select(col("query_id"), col("rnk"), col("id").as("vec_id"),
          col("sim"))),
    "q104_recall_eval" -> ((s, d) => {
      // index-quality evaluation: recall@10 of each approximate retrieval
      // path against the exact cosine top-10 — the measurement loop an
      // index-tuning pipeline runs before committing to probe/rerank
      // budgets. Each leg is bounded (top-10 lists), so the joins are
      // trivial; the corpus scans are the legs' own.
      val emb = t(s, d, "embeddings")
      val exact = Ann.bruteForceTopK(emb, col("vec_id"), col("embedding"),
        qvec2Scala, 10).select("id")
      def recall(name: String, approx: DataFrame): DataFrame =
        approx.select("id").join(exact, "id")
          .agg((count(lit(1)).cast("double") / 10).as("recall"))
          .select(lit(name).as("method"), col("recall"))
      recall("binary", Ann.binaryTopK(emb, col("vec_id"), col("embedding"),
          qvec2Scala, k = 10, rerank = 50))
        .unionByName(recall("lsh", Ann.lshTopK(emb, col("vec_id"),
          col("embedding"), qvec2Scala, k = 10, nbits = 4, probes = 2)))
        .unionByName(recall("sq8", graft.ops.Quantize.int8TopK(emb,
          col("vec_id"), col("embedding"), qvec2Scala, k = 10, rerank = 50)))
        .orderBy("method")
    }),
    "q102_ann_int8" -> ((s, d) =>
      // SQ8 asymmetric search: integer code dot product rescaled by both
      // scales ranks candidates (zero exchanges), exact-cosine rerank
      graft.ops.Quantize.int8TopK(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), qvec2Scala, k = 10, rerank = 50)
        .select(col("id").as("vec_id"), col("approx"), col("sim"))),

    "q115_cross_rerank" -> ((s, d) =>
      // second-stage cross-encoder rerank over a bounded candidate list
      // (mapPartitions scorer backend; deterministic md5 stub scorer)
      graft.ops.Rerank.crossRerank(
          t(s, d, "documents").filter(col("doc_id") < 100),
          col("doc_id"), col("text"), "window hash join",
          graft.ops.HashCrossScorer(), k = 10)
        .select(col("id").as("doc_id"), col("score"))),

    "q92_mmr_rerank" -> ((s, d) =>
      // diversified retrieval: top-50 cosine candidates (one distributed
      // TakeOrdered pass), then the greedy MMR trace on the driver —
      // λ·sim(q,d) − (1−λ)·max sim(d, selected), k picks, ties → low id
      graft.ops.Rerank.mmrTopK(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), qvecScala, k = 5, nCandidates = 50, lambda = 0.7)
        .select(col("rnk"), col("id").as("vec_id"), col("mmr"))),

    "q89_ann_ivfpq_residual" -> ((s, d) =>
      // classical IVFADC: PQ codebooks trained on residuals v − C_cell,
      // per-probed-cell driver ADC tables — scoring stays row-local
      graft.ops.Pq.ivfPqResidualTopK(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), qvecScala, k = 6, nlist = 8, nprobe = 2,
          m = 4, ksub = 8, iters = 2)
        .select(col("id").as("vec_id"), col("dist"))),

    "q94_ivfpq_residual_batched" -> ((s, d) =>
      // batched residual IVFADC: coarse + residual codebooks train once,
      // per-query probe lists AND per-cell ADC tables broadcast with the
      // query frame, one pruned corpus pass, bounded per-query top-k
      graft.ops.Pq.ivfPqResidualTopKMany(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), Seq("qa" -> qvecScala, "qb" -> qvec2Scala),
          k = 5, nlist = 8, nprobe = 2, m = 4, ksub = 8, iters = 2)
        .select(col("query_id"), col("rnk"), col("id").as("vec_id"), col("dist"))
        .orderBy("query_id", "rnk")),

    "q67_bm25" -> ((s, d) =>
      // lexical relevance: BM25 over the documents table (one scan; only
      // query-term tokens reach the shuffle)
      graft.ops.Keyword.bm25(t(s, d, "documents"), col("doc_id"), col("text"),
          Seq("join", "hash", "window"))
        .select(col("id").as("doc_id"), round(col("score"), 4).as("s"))
        .orderBy(col("s").desc, col("doc_id")).limit(20)),
    "q68_hybrid_rrf" -> ((s, d) => {
      // hybrid search: reciprocal-rank fusion of BM25 and cosine top-50
      // candidate lists (both bounded before any rank window runs)
      val kw = graft.ops.Keyword.bm25(t(s, d, "documents"), col("doc_id"),
          col("text"), Seq("join", "hash", "window"))
        .select(col("id"), round(col("score"), 4).as("s"))
        .orderBy(col("s").desc, col("id")).limit(50)
      val vec = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          round(graft.functions.cosine_similarity(col("embedding"),
            typedLit(qvecScala)), 4).as("s"))
        .orderBy(col("s").desc, col("id")).limit(50)
      graft.ops.Keyword.rrfFuse(kw, col("s"), vec, col("s"))
        .select(col("id"), round(col("rrf"), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("id")).limit(10)
    }),

    "q69_repetition_signals" -> ((s, d) =>
      // Gopher-style repetition quality signals per document
      graft.ops.QualitySignals.repetitionSignals(
          t(s, d, "documents"), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id").limit(200)),
    "q70_contamination" -> ((s, d) => {
      // n-gram-overlap decontamination: docs 0-4 stand in for an eval set;
      // the corpus side is a broadcast semi-join, no corpus shuffle
      val docs = t(s, d, "documents")
      graft.ops.QualitySignals.contamination(
          docs.filter(col("doc_id") >= 5), col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 5), col("text"), n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q88_contamination_multi" -> ((s, d) => {
      // multi-benchmark decontamination: docs 0-4 and 5-9 stand in for two
      // eval sets; both gram sets broadcast together, ONE corpus pass,
      // per-benchmark distinct-shared counts split out in the aggregate
      val docs = t(s, d, "documents")
      graft.ops.QualitySignals.contaminationMulti(
          docs.filter(col("doc_id") >= 10), col("doc_id"), col("text"),
          Seq(("dev", docs.filter(col("doc_id") < 5), col("text")),
            ("test", docs.filter(col("doc_id") >= 5 && col("doc_id") < 10),
              col("text"))),
          n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q93_lm_score" -> ((s, d) =>
      // CCNet-style LM quality signal: add-one bigram model trained on
      // the corpus itself (vocab-bounded), one broadcast-join scoring pass
      graft.ops.QualitySignals.bigramLmScore(
          t(s, d, "documents"), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    "q83_boilerplate" -> ((s, d) =>
      // corpus-level boilerplate: per doc, share of its distinct bigrams
      // seen in >= 5 documents (df computed in-plan, partial-aggregated)
      graft.ops.QualitySignals.boilerplateFraction(
          t(s, d, "documents"), col("doc_id"), col("text"), n = 2, minDf = 5L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    "q95_mixture_sample" -> ((s, d) =>
      // temperature-mixture reweighting: en halved, de doubled, es ×1.25,
      // fr kept, zh dropped — md5-basis-point copies, row-local explode
      graft.ops.Curation.mixtureSample(
          t(s, d, "documents").select(col("doc_id"), col("lang")),
          col("doc_id"), col("lang"),
          Map("en" -> 0.5, "de" -> 2.0, "es" -> 1.25, "fr" -> 1.0))
        .orderBy("doc_id", "copy")),
    "q101_domain_cap" -> ((s, d) =>
      // per-domain quota: the 5 best-quality docs per source via the
      // bounded grouped-top-k aggregator (no window rank), ties -> low id
      graft.ops.TopK.perGroup(
          t(s, d, "documents").select(col("source"), col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("q")),
          Seq(col("source")), col("doc_id"), col("q"), k = 5)
        .select(col("source"), col("rnk").cast("bigint").as("rnk"),
          col("id").as("doc_id"), round(col("sim"), 4).as("q"))
        .orderBy("source", "rnk")),
    "q118_range_join" -> ((s, d) => {
      // binned range join: lineitem quantities against overlapping
      // nation-derived bands — hash equi-join on the bin + exact
      // residual, never a nested loop; integer floor-sums stay exact
      val ranges = t(s, d, "nation").select(col("n_nationkey").as("rid"),
        (col("n_nationkey") * 2).cast("double").as("lo"),
        (col("n_nationkey") * 2 + 3).cast("double").as("hi"))
      graft.ops.Scale.binnedRangeJoin(
          t(s, d, "lineitem").select(col("l_quantity")), col("l_quantity"),
          ranges, col("rid"), col("lo"), col("hi"), binWidth = 4.0)
        .groupBy(col("range_id").as("rid"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v")).cast("bigint")).as("qty_floor_sum"))
        .orderBy("rid")
    }),
    "q117_cluster_balance" -> ((s, d) => {
      // index-health diagnostics: per-cluster population of the learned
      // IVF clustering + each cluster's share — the skew report that
      // decides whether nlist/probe budgets hold (a 10x-overloaded cell
      // makes probe cost unpredictable at scale)
      val emb = t(s, d, "embeddings")
      val cents = graft.ops.Ivf.trainCentroids(emb, col("vec_id"),
        col("embedding"), k = 8, iters = 2, sampleFraction = 50)
      val assigned = graft.ops.Ivf.assignClusters(
        emb.select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<float>").as("v")),
        col("id"), col("v"), cents)
      val counts = assigned.groupBy(col("cluster").cast("bigint").as("cluster"))
        .agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(sum("n").as("total"))))
        .select(col("cluster"), col("n"),
          round(col("n") / col("total").cast("double"), 4).as("share"))
        .orderBy("cluster")
    }),
    "q116_cluster_sample" -> ((s, d) =>
      // diversity-preserving downsample: 5 md5-picked rows per learned
      // cluster (q66's training recipe), bounded grouped-top-k, no window
      graft.ops.Curation.clusterBalancedSample(t(s, d, "embeddings"),
          col("vec_id"), col("embedding"), perCluster = 5)
        .withColumnRenamed("id", "vec_id")),
    "q98_dsir_weights" -> ((s, d) =>
      // DSIR importance selection: hashed-unigram log-likelihood ratio of
      // the en subcorpus (target) vs the full corpus (raw); top 25 docs
      graft.ops.Curation.importanceWeights(
          t(s, d, "documents"), col("doc_id"), col("text"),
          t(s, d, "documents").filter(col("lang") === "en"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("w").desc, col("doc_id")).limit(25)),
    "q84_shard_histogram" -> ((s, d) =>
      // training-export shard assignment (md5-keyed, engine-reproducible):
      // the histogram the writeShards manifest records
      t(s, d, "documents")
        .select(graft.ops.Curation.shardAssign(col("doc_id"), 16).as("shard"),
          col("doc_id"))
        .groupBy("shard")
        .agg(count("*").as("n_rows"), min("doc_id").as("first_id"))
        .orderBy("shard")),

    "q75_frame_sampling" -> ((s, d) =>
      // video frame sampling shape: explode assets into fixed-stride
      // frames; sizes are pure functions of byte length -> exact oracle
      Multimodal.sampleVideoFrames(
          Multimodal.assetsFromText(t(s, d, "documents").filter(col("doc_id") < 100)),
          frameSize = 128, everyN = 2)
        .groupBy("asset_id")
        .agg(count("*").as("n_frames"),
          sum(length(col("frame_bytes"))).as("frame_bytes_total"),
          max(col("frame_index")).cast("bigint").as("last_idx"))
        .orderBy("asset_id")),
    "q76_audio_envelope" -> ((s, d) =>
      // audio envelope shape: per-window mean |amplitude|; verified via the
      // integer window sum (mean × window length rounds back exactly —
      // float32 mean error ≪ 0.5) so float rounding can't diverge engines
      Multimodal.extractAudioEnvelope(
          Multimodal.assetsFromText(t(s, d, "documents").filter(col("doc_id") < 100)),
          window = 256)
        .select(col("asset_id"), size(col("envelope")).cast("bigint").as("n_win"),
          round(element_at(col("envelope"), 1).cast("double") *
            least(col("n_bytes"), lit(256L))).cast("bigint").as("first_sum"))
        .orderBy("asset_id")),

    // ---- text analysis ----
    "q90_bpe_train" -> ((s, d) => {
      // BPE pair-merge trainer: corpus reduces to the word-count vocab in
      // one scan; each of the 6 merge iterations is one partial-aggregated
      // pair count over the vocab + a 1-row TakeOrdered (the oracle
      // unrolls the same 6 iterations as chained CTEs)
      import s.implicits._
      graft.ops.Bpe.train(t(s, d, "documents"), col("text"), numMerges = 6)
        .zipWithIndex
        .map { case ((a, b, cnt), i) => (i + 1, a, b, cnt) }
        .toDF("merge_rank", "lhs", "rhs", "pair_cnt")
    }),
    "q91_bpe_segment" -> ((s, d) =>
      // tokenizer inference with a FIXED merge list (the 6 merges the
      // sf0.01 corpus learns): per-doc subword counts, fully row-local
      t(s, d, "documents").select(col("doc_id"),
        graft.ops.Bpe.segmentCount(col("text"), bpeMerges).as("n_sub"))
        .orderBy("doc_id").limit(300)),
    "q126_bpe_tokenize_table" -> ((s, d) =>
      // SAME inference contract as q91 but through the merge-TABLE path
      // ([[graft.ops.Bpe.segmentCounts]], mapPartitions over a closure-
      // shipped table) — the production shape for 30k-merge tokenizers,
      // where folding merges into the plan would explode it
      graft.ops.Bpe.segmentCounts(t(s, d, "documents"), col("doc_id"),
          col("text"), bpeMerges)
        .select(col("id").as("doc_id"), col("n_sub"))
        .orderBy("doc_id").limit(300)),
    "q132_entropy_deciles" -> ((s, d) => {
      // curriculum binning: token-entropy deciles via ONE exact percentile
      // aggregate broadcast as cut points + a row-local fold — the
      // no-global-sort alternative to an ntile window
      val docs = t(s, d, "documents").select(col("doc_id"),
        array_remove(split(trim(col("text")), "\\s+"), "").as("tk"))
      val scored = docs.select(col("doc_id"),
        round(graft.ops.TextAnalysis.tokenEntropy(col("tk")), 4).as("e"))
      graft.ops.Curation.quantileBins(scored, col("doc_id"), col("e"), 10)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          round(min("s"), 4).as("min_e"), round(max("s"), 4).as("max_e"))
        .orderBy("bin")
    }),
    "q134_winnow_overlap" -> ((s, d) =>
      // the MOSS use-case: fingerprint-index self-join on hash — only
      // (id, h) longs shuffle, hashes selected in > 10 docs pruned first
      // (boilerplate is not copying evidence and its buckets fan out
      // quadratically) — pairs sharing >= 3 rare fingerprints
      graft.ops.TextAnalysis.winnowOverlapPairs(
          t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), k = 3, w = 4, minShared = 3, maxDf = 10)
        .orderBy("a_id", "b_id")),
    "q131_winnow_fingerprints" -> ((s, d) =>
      // MOSS winnowing: 3-gram hashes, window 4, rightmost-min selection;
      // per-doc fingerprint count + order-independent mod-1e9+7 digest
      graft.ops.TextAnalysis.winnowFingerprints(
          t(s, d, "documents"), col("doc_id"), col("text"), k = 3, w = 4)
        .select(col("id").as("doc_id"), col("n_fp"), col("fp_mod"))
        .orderBy("doc_id")),
    "q130_tfidf_keywords" -> ((s, d) =>
      // per-doc keyword extraction: top-5 terms by tf*ln((N+1)/(df+1)),
      // scores 4dp-rounded before the cut, ties on the term — broadcast
      // df table, row-local top-k (no window)
      graft.ops.TextAnalysis.tfidfKeywords(
          t(s, d, "documents").filter(col("doc_id") < 100),
          col("doc_id"), col("text"), k = 5)
        .select(col("id").as("doc_id"), col("rnk").cast("bigint").as("rnk"),
          col("term"), col("score"))
        .orderBy("doc_id", "rnk")),
    "q129_bloom_contamination" -> ((s, d) => {
      // decontamination through a fixed 16384-bit Bloom filter (k=3 md5
      // positions per benchmark 3-gram): flags every truly-shared gram
      // plus a reproducible sliver of false positives — the oracle
      // rebuilds the same filter and reaches the same verdicts
      val docs = t(s, d, "documents")
      graft.ops.QualitySignals.bloomContamination(
          docs.filter(col("doc_id") >= 5), col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 5), col("text"),
          n = 3, m = 16384, k = 3)
        .select(col("id").as("doc_id"), col("n_flagged"))
        .orderBy("doc_id")
    }),
    "q109_gopher_rules" -> ((s, d) => {
      // Gopher-style rule diagnostics (Rae et al. 2021 A1, adapted):
      // per-rule booleans + the conjunctive gate — row-local rules joined
      // with the corpus repetition signal (top bigram fraction)
      val docs = t(s, d, "documents")
      val rep = graft.ops.QualitySignals.repetitionSignals(docs,
        col("doc_id"), col("text"))
      docs.select(col("doc_id"), TextAnalysis.qualityFlags(col("text")).as("f"))
        .join(rep.select(col("id").as("doc_id"), col("top2_frac")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          col("f.length_ok").as("wc_ok"),
          col("f.token_len_ok").as("mtl_ok"),
          col("f.stop_ok").as("stop_ok"),
          (coalesce(col("top2_frac"), lit(0.0)) <= 0.06).as("rep_ok"))
        .withColumn("pass",
          col("wc_ok") && col("mtl_ok") && col("stop_ok") && col("rep_ok"))
        .orderBy("doc_id")
    }),
    "q110_token_entropy" -> ((s, d) =>
      // vocabulary-diversity signals: token entropy (sorted-type fold for
      // order-deterministic float sums) + type-token ratio, row-local;
      // tokens materialize in their own projection (op contract)
      t(s, d, "documents")
        .select(col("doc_id"),
          array_remove(split(trim(col("text")), "\\s+"), "").as("tk"))
        .select(col("doc_id"),
          size(array_distinct(col("tk"))).cast("bigint").as("n_types"),
          round(TextAnalysis.typeTokenRatio(col("tk")), 4).as("ttr"),
          round(TextAnalysis.tokenEntropy(col("tk")), 4).as("entropy"))
        .orderBy("doc_id")),
    "q125_length_histogram" -> ((s, d) =>
      // corpus profiling: doc-length histogram on log2 bins (the shape
      // chart a curation run reads before setting length cutoffs); one
      // partial-agg shuffle of bin ids
      t(s, d, "documents")
        .select(floor(log2(greatest(col("n_chars"), lit(1)))).cast("bigint")
          .as("log2_bin"))
        .groupBy("log2_bin")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("log2_bin")),
    "q124_collocations" -> ((s, d) => {
      // collocation detection: PMI of adjacent word pairs,
      // log(N_bg * c(ab) / (c(a)*c(b))) over exact corpus counts; only
      // the count tables shuffle (partial-agg'd), unigrams broadcast
      val docs = t(s, d, "documents")
        .select(array_remove(split(trim(col("text")), "\\s+"), "").as("tk"))
      val bigrams = docs.select(explode(
          when(size(col("tk")) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), size(col("tk")) - 2),
              i => concat_ws(" ", slice(col("tk"), i + 1, lit(2)))))).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 20)
      val unigrams = docs.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cw"))
      val nBg = docs.select(
        sum(greatest(size(col("tk")) - 1, lit(0)).cast("long")).as("n_bg"))
      bigrams
        .withColumn("a", split(col("bg"), " ").getItem(0))
        .withColumn("b", split(col("bg"), " ").getItem(1))
        .join(broadcast(unigrams.withColumnRenamed("w", "a")
          .withColumnRenamed("cw", "ca")), "a")
        .join(broadcast(unigrams.withColumnRenamed("w", "b")
          .withColumnRenamed("cw", "cb")), "b")
        .crossJoin(broadcast(nBg))
        .select(col("bg"), col("cab"),
          round(log(col("n_bg") * col("cab") /
            (col("ca") * col("cb")).cast("double")), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("bg"))
        .limit(15)
    }),
    "q120_top_terms_by_lang" -> ((s, d) => {
      // per-language heavy hitters: term counts reduce under partial
      // aggregation; the rank window partitions by lang over the
      // VOCABULARY-bounded count relation (documented bounded-input
      // window — never over corpus rows)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("c").desc, col("w"))
      t(s, d, "documents")
        .select(col("lang"),
          explode(array_remove(split(trim(col("text")), "\\s+"), "")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 5)
        .orderBy("lang", "rnk")
    }),
    "q112_fertility_by_lang" -> ((s, d) =>
      // tokenizer fertility (subwords per word) per language — the
      // multilingual diagnostic that decides per-language token budgets;
      // integer sums reduce exactly, one partial-agg shuffle on lang
      t(s, d, "documents").select(col("lang"),
          TextAnalysis.subwordCountEstimate(col("text")).cast("long").as("sub"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("sub").as("subwords"),
          sum("tok").as("tokens"),
          round(sum("sub").cast("double") / sum("tok"), 4).as("fertility"))
        .orderBy("lang")),
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
      // embed, aggregated (chunk/normalize/embed all replicated in the
      // oracle via PortableSql)
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
      // embeddings (broadcast query matrix + bounded TopKAggregator — a
      // partial aggregate, not a window rank, so the shuffle carries only
      // per-partition per-query top-k buffers) - the Spark-native
      // amortization the one-query-at-a-time reference cannot express
      import s.implicits._
      val qdf = Seq(("qa", qvecScala), ("qb", qvec2Scala)).toDF("query_id", "qvec")
      val scored = t(s, d, "embeddings")
        .crossJoin(org.apache.spark.sql.functions.broadcast(qdf))
        .select(col("query_id"), col("vec_id"),
          round(graft.functions.cosine_similarity(col("embedding"), col("qvec")), 4)
            .as("sim"))
      graft.ops.TopK.perGroup(scored, Seq(col("query_id")), col("vec_id"),
          col("sim"), 5)
        .select(col("query_id"), col("id").as("vec_id"), col("sim"), col("rnk"))
        .orderBy("query_id", "rnk")
        .select("query_id", "vec_id", "sim")
    }),
    "q63_percentiles" -> ((s, d) =>
      // exact interpolated percentiles per group (corpus length profiling)
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"),
          round(expr("percentile(l_extendedprice, 0.99)"), 2).as("price_p99"))
        .orderBy("l_returnflag")),
    "q65_percentiles_approx" -> ((s, d) =>
      // t-digest-class profiling companion to q63: approx_percentile (GK
      // sketch — mergeable partial aggregate, no per-group sort, the 100 TB
      // path) verified to sit within its rank-error bound of the exact
      // interpolated percentile (which stays the q63 oracle row). The
      // booleans make the sketch's accuracy oracle-checkable even though
      // DuckDB's approx algorithm differs: measured |err| is 0 for p50 and
      // < 7 for price p99 at sf0.1 vs tolerances 1.0 / 100.0.
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_quantity, 0.5)").as("ap50"),
          expr("percentile(l_quantity, 0.5)").as("ep50"),
          expr("approx_percentile(l_extendedprice, 0.99)").as("ap99"),
          expr("percentile(l_extendedprice, 0.99)").as("ep99"))
        .select(col("l_returnflag"), round(col("ep50"), 4).as("p50"),
          (abs(col("ap50") - col("ep50")) <= 1.0).as("p50_ok"),
          // approx returns a sample element, exact interpolates: the gap is
          // bounded by local value spacing, which widens in the sparse tail
          // at small n — hence a relative bound (1% of p99 ≈ rank error ×
          // spacing with heavy margin; measured max |err| is 101 at sf0.001,
          // 7 at sf0.1)
          (abs(col("ap99") - col("ep99")) <= greatest(lit(100.0),
            col("ep99") * 0.01)).as("p99_ok"))
        .orderBy("l_returnflag")),
    "q71_stratified_sample" -> ((s, d) =>
      // deterministic domain-mixing sample: per-lang keep rates, md5-keyed
      // membership (reproducible across engines/runs/partitionings)
      t(s, d, "documents")
        .filter(graft.ops.Curation.stratifiedSample(col("doc_id"), col("lang"),
          Map("en" -> 80, "es" -> 40, "fr" -> 20, "de" -> 10)))
        .groupBy("lang").agg(count("*").as("n"), min("doc_id").as("first_id"))
        .orderBy("lang")),
    "q72_quantize_int8" -> ((s, d) =>
      // symmetric int8 embedding quantization: codes + reconstruction
      // error, scale/codes materialized ONCE then consumed (recomputing
      // the HOF chain per output column multiplies per-element work)
      t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"),
          graft.ops.Quantize.int8Scale(col("embedding")).as("sc"))
        .select(col("vec_id"), col("embedding"), col("sc"),
          graft.ops.Quantize.int8Codes(col("embedding"), col("sc")).as("codes"))
        .select(col("vec_id"),
          element_at(col("codes"), 1).as("c0"),
          element_at(col("codes"), 32).as("c31"),
          round(col("sc"), 6).as("scale"),
          round(graft.ops.Quantize.reconError(col("embedding"), col("codes"),
            col("sc")), 6).as("err"))
        .orderBy("vec_id").limit(200)),
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
      // decoder; exact-count features -> full DuckDB oracle). f2/f6 are the
      // punctuation-range and a-o-range histogram bins — the two the ASCII
      // corpus actually populates.
      Multimodal.extractImageFeatures(Multimodal.assetsFromText(
          t(s, d, "documents").filter(col("doc_id") < 100)))
        .select(col("asset_id"), col("modality"), col("n_bytes"),
          round(element_at(col("features"), 3).cast("double"), 4).as("f2"),
          round(element_at(col("features"), 7).cast("double"), 4).as("f6"))
        .orderBy("asset_id")),
    "q160_nfc_normalize" -> ((s, d) => {
      // Unicode hygiene: crawl text arrives in mixed normal forms, which
      // makes byte-identical content hash differently. The all-NFC fixture
      // is first decomposed deterministically ('merge' → 'me' + U+0301 +
      // 'rge', i.e. NFD-style combining marks), then the native
      // unicode_normalize expression restores canonical NFC — row-local,
      // inside whole-stage codegen, zero exchanges
      import graft.functions.unicode_normalize
      val dec = t(s, d, "documents").select(col("doc_id"),
        replace(col("text"), lit("merge"), lit("me\u0301rge")).as("dtext"))
      dec.select(col("doc_id"),
          (col("dtext") =!= unicode_normalize(col("dtext"))).as("changed"),
          length(unicode_normalize(col("dtext"))).cast("long").as("norm_len"),
          md5(unicode_normalize(col("dtext")).cast("binary")).as("norm_hash"))
        .orderBy("doc_id")
    }),
    "q161_pii_signals" -> ((s, d) =>
      // PII audit counts per class. The clean word-bag corpus gets
      // deterministic doc_id-keyed PII appended (email on ids % 3, phone
      // % 2, ipv4 % 5, ssn-shaped id % 7 — so counts VARY per doc and
      // many docs stay clean); the signals themselves are generic
      // row-local regexp_count, zero exchanges
      piiDecorated(t(s, d, "documents"))
        .select(col("doc_id"), TextAnalysis.piiSignals(col("ptext")).as("p"))
        .select(col("doc_id"), col("p.n_email").as("n_email"),
          col("p.n_ipv4").as("n_ipv4"), col("p.n_id").as("n_id"),
          col("p.n_phone").as("n_phone"))
        .orderBy("doc_id")),
    "q162_pii_redact" -> ((s, d) =>
      // class-sentinel masking over the same fixture; n_masks counts the
      // sentinels actually placed, red_hash pins the full masked text
      piiDecorated(t(s, d, "documents"))
        .select(col("doc_id"), TextAnalysis.redactPii(col("ptext")).as("red"))
        .select(col("doc_id"),
          regexp_count(col("red"), lit("<(EMAIL|IP|ID|PHONE)>"))
            .cast("long").as("n_masks"),
          md5(col("red").cast("binary")).as("red_hash"))
        .orderBy("doc_id")),
    "q163_matryoshka_ann" -> ((s, d) =>
      // MRL nested-representation search: 16-of-64-dim coarse scan
      // (¼ bandwidth), exact full-dim rerank of 100 candidates, top-10
      Ann.matryoshkaTopK(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), qvecScala, d = 16, k = 10, refine = 100)
        .orderBy(desc("sim"), asc("id"))),
    "q164_pagerank" -> ((s, d) => {
      // centrality-based data selection: damped PageRank (3 fixed-point
      // iterations) over the exact k=3 kNN similarity graph; the top-25
      // ranks are the corpus's most "representative" documents. The
      // oracle replays the integer iterations bit-for-bit
      val edges = Ann.knnGraph(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), 3)
      graft.ops.Graph.pageRank(edges, col("id"), col("nbr"), iters = 3)
        .orderBy(desc("rank_micro"), asc("id"))
        .limit(25)
    }),
    "q165_substring_search" -> ((s, d) =>
      // indexed multi-pattern exact search over the positional gram
      // table: two 3-token patterns that recur corpus-wide, a 5-token
      // pattern (3 aligned grams must certify), and an absent pattern
      // (must yield zero rows, not noise)
      Dedup.substringSearch(t(s, d, "documents"), col("doc_id"),
          col("text"),
          Seq("slow hash batch", "part filter scan",
            "key agg row scan slow", "alpha beta gamma"), k = 3)
        .orderBy("pattern", "id", "start_pos")),
    "q166_cms_estimates" -> ((s, d) =>
      // count-min point queries: 4×64 portable-hash matrix built in one
      // pass (depth·width longs per partition move, never a token); the
      // oracle rebuilds the matrix cell-for-cell, so estimates — upper
      // bounds that include collision mass — match exactly. 'nosuchword'
      // reports whatever its cells absorbed, not an error
      graft.ops.Scale.countMinEstimates(t(s, d, "documents"), col("text"),
          width = 64, depth = 4,
          probes = Seq("spark", "window", "stream", "batch", "nosuchword"))
        .orderBy("term")),
    "q167_corpus_diff" -> ((s, d) => {
      // release-to-release corpus audit: v1 = ids < 300, v2 = ids >= 100
      // with ids 150-199 edited — so the diff shows all four statuses;
      // only (id, sha256) digests ever shuffle
      val docs = t(s, d, "documents")
      val v1 = docs.filter(col("doc_id") < 300)
      val v2 = docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"),
          when(col("doc_id").between(150, 199), concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      graft.ops.Curation.corpusDiff(v1, col("doc_id"), col("text"),
          v2, col("doc_id"), col("text"))
        .orderBy("id")
    }),
    "q168_jl_ann" -> ((s, d) => {
      // data-independent dimension cut: JL ±1 sign projection 64→16
      // (portable md5-parity matrix, rebuilt anywhere, never shipped),
      // then cosine top-10 IN THE PROJECTED SPACE — double arithmetic
      // end-to-end so both engines fold the same values
      val pr = Ann.jlProject(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), outDim = 16)
      val q = Ann.jlProjectVec(qvecScala, 16)
      val qn = math.sqrt(q.map(x => x * x).sum)
      val dot = aggregate(zip_with(col("v"), typedLit(q), (x, y) => x * y),
        lit(0.0), _ + _)
      val na = sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), _ + _))
      pr.select(col("id"), round(dot / (na * lit(qn)), 4).as("sim"))
        .orderBy(desc("sim"), asc("id")).limit(10)
    }),
    "q169_pagerank_ivf" -> ((s, d) => {
      // q164's 100 TB path: the SAME integer PageRank over the
      // IVF-pruned kNN graph (equi-join on learned cells, q149's
      // contract) — no all-pairs stage anywhere in the plan. Top-25
      // overlap vs the exact-graph ranks is the recall note in PLANS.md
      // (q164 stays as the bounded exact baseline).
      val edges = Ann.knnGraphIvf(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), 3, nlist = 8, iters = 2, sampleFraction = 50)
      graft.ops.Graph.pageRank(edges, col("id"), col("nbr"), iters = 3)
        .orderBy(desc("rank_micro"), asc("id"))
        .limit(25)
    }),
    "q170_winnow_against" -> ((s, d) => {
      // daily-ingest near-dup gate: new batch (ids >= 300) winnowed
      // row-locally and counted against the frozen corpus's (ids < 350)
      // persisted fingerprint index — ids 300-349 live in both slices,
      // so self-matches prove the detector and cross-matches the
      // boilerplate prune. Stateless projection; streaming twin in
      // StreamingSpec.
      val docs = t(s, d, "documents")
      val frozen = graft.ops.TextAnalysis.winnowFingerprintTable(
        docs.filter(col("doc_id") < 350), col("doc_id"), col("text"),
        k = 3, w = 4)
      graft.ops.TextAnalysis.winnowOverlapAgainst(
          docs.filter(col("doc_id") >= 300), col("doc_id"), col("text"),
          frozen, k = 3, w = 4, minShared = 3, maxDf = 10)
        .orderBy("id", "ref_id")
    }),
    "q171_edit_distance_join" -> ((s, d) => {
      // SymSpell deletion-variant join on 16-char text prefixes: the
      // natural corpus plus a +1000-id copy of the first 50 prefixes
      // with one char appended — guaranteed distance-1 twins; word-bag
      // prefix collisions supply natural distance-0/1 pairs too
      val docs = t(s, d, "documents")
      val base = docs.select(col("doc_id").as("id"),
        substring(col("text"), 1, 16).as("s"))
      val mut = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000).as("id"),
          concat(substring(col("text"), 1, 16), lit("x")).as("s"))
      Dedup.editDistanceJoin(base.unionByName(mut), col("id"), col("s"),
          maxDist = 1)
        .orderBy("a_id", "b_id")
    }),
    "q172_ngram_novelty" -> ((s, d) => {
      // memorization audit: distinct-3-gram novelty of the tail batch
      // (ids >= 400) against the head corpus — only gram hashes shuffle
      val docs = t(s, d, "documents")
      graft.ops.QualitySignals.ngramNovelty(
          docs.filter(col("doc_id") >= 400), col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 400), col("text"), n = 3)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_novel"),
          col("novelty"))
        .orderBy("doc_id")
    }),
    "q173_drift_kl" -> ((s, d) => {
      // KL sibling of q154 over the same split and buckets — the
      // asymmetric surprise gate next to PSI's symmetric one
      val docs = t(s, d, "documents")
      graft.ops.QualitySignals.driftKl(
        docs.filter(col("doc_id") < 250), col("text"),
        docs.filter(col("doc_id") >= 250), col("text"))
    }),
    "q174_zipf_slope" -> ((s, d) =>
      // corpus-health diagnostic: ln(freq) vs ln(rank) slope over the
      // top-100 terms; the rank window runs over the bounded top slice
      graft.ops.TextAnalysis.zipfSlope(t(s, d, "documents"), col("text"),
        topN = 100)),
    "q175_epoch_shuffle" -> ((s, d) =>
      // dataloader epoch permutation: md5(epoch:id)-ordered global
      // positions, partitioning-independent; epoch 7, first 100 rows by
      // id so the dump is bounded and order-stable
      graft.ops.Curation.epochShuffle(t(s, d, "documents"), col("doc_id"),
          epoch = 7)
        .select(col("id").as("doc_id"), col("ord"))
        .orderBy("doc_id").limit(100)),
    "q176_winnow_clusters" -> ((s, d) => {
      // near-copy CLUSTERS: q134's winnowing pair evidence -> q80's
      // min-label connected components -> per-doc cluster id + size
      val pairs = graft.ops.TextAnalysis.winnowOverlapPairs(
        t(s, d, "documents").filter(col("doc_id") < 200),
        col("doc_id"), col("text"), k = 3, w = 4, minShared = 3, maxDf = 10)
      val cc = Dedup.duplicateClusters(pairs, col("a_id"), col("b_id"))
      cc.join(cc.groupBy("cluster_id").agg(count("*").as("cluster_size")),
          "cluster_id")
        .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
        .orderBy("doc_id")
    }),
    "q177_dedup_keep_best" -> ((s, d) =>
      // q82's survivor rule upgraded: keep each near-dup cluster's
      // LONGEST document (n_chars, ties -> min id) — the
      // quality-aware production rule; same pairs/clusters as q80/q82
      Dedup.dedupCorpusKeepBest(
          t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), col("n_chars"), 0.7, shingleSize = 1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")),
    "q178_rendezvous_shards" -> ((s, d) => {
      // highest-random-weight sharding: growing 16 -> 17 shards moves
      // only ~1/17 of keys, every one TO the new shard — the one-row
      // report a resharding plan is signed off on
      val docs = t(s, d, "documents")
      val assigned = docs.select(col("doc_id"),
        graft.ops.Curation.rendezvousShard(col("doc_id"), 16).as("s16"),
        graft.ops.Curation.rendezvousShard(col("doc_id"), 17).as("s17"))
      assigned.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("s16") =!= col("s17"), 1L).otherwise(0L)).as("n_moved"),
        sum(when(col("s16") =!= col("s17") && col("s17") =!= 16, 1L)
          .otherwise(0L)).as("n_moved_elsewhere"),
        round(sum(when(col("s16") =!= col("s17"), 1L).otherwise(0L)) /
          count(lit(1)).cast("double"), 4).as("moved_frac"))
    }),
    "q179_mad_outliers" -> ((s, d) => {
      // robust release gate: modified z-score over a length metric with
      // a deterministic 10x spike on ids % 100 == 0 so the gate has
      // true positives to catch
      val docs = t(s, d, "documents")
      val metric = when(col("doc_id") % 100 === 0, col("n_chars") * 10)
        .otherwise(col("n_chars"))
      graft.ops.Curation.madOutliers(docs, col("doc_id"), metric)
        .select(col("id").as("doc_id"), col("x"), col("z"), col("outlier"))
        .orderBy("doc_id")
    }),
    "q180_mask_spans" -> ((s, d) =>
      // q100's cut replaced by a length-preserving <DUP> mask — token
      // positions survive for alignment-keyed downstream data
      Dedup.maskDuplicateSpans(t(s, d, "documents"), col("doc_id"),
          col("text"), k = 5, minDocs = 2)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_masked"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")),
    "q181_substring_counts" -> ((s, d) =>
      // Aho-Corasick multi-needle audit: one compiled pass counts every
      // needle (char-level, non-overlapping = split-count semantics);
      // needles include a cross-word phrase and an absent string
      graft.ops.TextAnalysis.substringCounts(t(s, d, "documents"),
          col("doc_id"), col("text"),
          Seq("data", "slow fast", "spark", "window", "zzznotthere"))
        .select(col("id").as("doc_id"), col("pattern"), col("n_hits"))
        .orderBy("doc_id", "pattern")),
    "q182_lm_worst_window" -> ((s, d) =>
      // bad-SPAN detector: q93's add-one bigram model, worst 8-bigram
      // sliding-window mean per doc (ties -> smallest start)
      graft.ops.QualitySignals.lmWorstWindow(t(s, d, "documents"),
          col("doc_id"), col("text"), window = 8)
        .select(col("id").as("doc_id"), col("n_windows"),
          col("worst_start"), col("worst_lp"))
        .orderBy("doc_id")),
    "q183_split_balance" -> ((s, d) => {
      // release-gate split report: per (split, lang) counts + within-
      // split share — the stratification check a datasheet publishes
      val assigned = t(s, d, "documents")
        .select(col("lang"),
          graft.ops.Curation.splitAssign(col("doc_id")).as("split"))
      val totals = assigned.groupBy("split").agg(count(lit(1)).as("n_split"))
      assigned.groupBy("split", "lang").agg(count(lit(1)).as("n"))
        .join(totals, "split")
        .select(col("split"), col("lang"), col("n"),
          round(col("n") / col("n_split").cast("double"), 4).as("frac"))
        .orderBy("split", "lang")
    }),
    "q184_leakage_safe_split" -> ((s, d) =>
      // contamination-proof splitting: whole near-dup clusters (q80's
      // evidence) move to the same md5 split bucket, keyed by the
      // cluster representative — a paraphrase can never straddle
      // train/test
      graft.ops.Curation.leakageSafeSplit(
          t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), threshold = 0.7, shingleSize = 1)
        .select(col("id").as("doc_id"), col("cluster_id"), col("split"))
        .orderBy("doc_id")),
    "q185_curriculum_order" -> ((s, d) =>
      // curriculum schedule: length quartiles easy-first, md5(epoch:id)
      // shuffle within each band, exact global positions — epoch 3
      graft.ops.Curation.curriculumOrder(t(s, d, "documents"),
          col("doc_id"), col("n_chars"), nBins = 4, epoch = 3)
        .select(col("id").as("doc_id"), col("bin"), col("ord"))
        .orderBy("doc_id")),
    "q186_minhash_calibration" -> ((s, d) =>
      // signature-estimate error vs exact Jaccard, bucketed by true
      // similarity, on an 80-doc eval sample (all pairs by design —
      // the banding-parameter eval every LSH threshold choice rests on)
      Dedup.minhashCalibration(
          t(s, d, "documents").filter(col("doc_id") < 80),
          col("doc_id"), col("text"), buckets = 10)
        .orderBy("bucket")),
    "q187_contrastive_triplets" -> ((s, d) => {
      // contrastive pairs mined from dedup evidence: q80's clusters give
      // the positives, the exact k=5 kNN graph (bounded baseline; the
      // IVF graph composes identically) gives out-of-cluster negatives
      val edges = Ann.knnGraph(
        t(s, d, "embeddings").filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), 5)
      graft.ops.Curation.contrastiveTriplets(
          t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), edges, threshold = 0.7,
          shingleSize = 1)
        .orderBy("anchor_id")
    }),
    "q188_novelty_against" -> ((s, d) => {
      // incremental novelty gate: the head corpus's persisted gram-hash
      // table audits the tail batch — ids 350-399 sit in both slices,
      // so their novelty is exactly 0 (the self-containment check)
      val docs = t(s, d, "documents")
      val table = graft.ops.QualitySignals.ngramHashTable(
        docs.filter(col("doc_id") < 400), col("text"), n = 3)
      graft.ops.QualitySignals.ngramNoveltyAgainst(
          docs.filter(col("doc_id") >= 350), col("doc_id"), col("text"),
          table, n = 3)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_novel"),
          col("novelty"))
        .orderBy("doc_id")
    }),
    "q189_pii_matches" -> ((s, d) =>
      // the audit trail behind q161's counts: every match string with
      // its class and in-document order, over the same decorated fixture
      graft.ops.TextAnalysis.piiMatches(
          piiDecorated(t(s, d, "documents")), col("doc_id"), col("ptext"))
        .select(col("id").as("doc_id"), col("pii_class"), col("match_no"),
          col("matched"))
        .orderBy("doc_id", "pii_class", "match_no")),
    "q190_weighted_sample" -> ((s, d) =>
      // Efraimidis-Spirakis weighted sampling without replacement: 50
      // docs weight-proportional to n_chars, md5-keyed (no RNG state) —
      // the oracle replays u^(1/w) and picks the same 50
      graft.ops.Curation.weightedSample(
          t(s, d, "documents"), col("doc_id"), col("n_chars"), k = 50)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")),
    "q191_mixture_budget" -> ((s, d) => {
      // pretraining-mix planning: four weighted sources + sixteen
      // at weight 0, 100k-token budget, 2-epoch repetition ceiling;
      // shortfall reported, never silently redistributed
      val docs = t(s, d, "documents")
      graft.ops.Curation.mixtureBudget(docs, col("source"),
          size(array_remove(split(trim(col("text")), "\\s+"), "")),
          Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.05),
          budget = 100000L, maxEpochs = 2.0)
        .orderBy("source")
    }),
    "q192_collocations" -> ((s, d) =>
      // Church-Hanks PMI collocations: top-40 adjacent pairs seen >= 30
      // times — the corpus-phrase audit; minCount prunes hapax noise
      // before any join
      graft.ops.TextAnalysis.collocations(t(s, d, "documents"),
        col("text"), minCount = 30L, topN = 40)),
    "q193_split_leakage" -> ((s, d) => {
      // what leakageSafeSplit prevents, measured: cross-split doc pairs
      // sharing rare 5-grams under the NAIVE md5 split. Exact copies of
      // docs < 30 at +5000 ids guarantee leaky pairs whose twin lands in
      // a different split; maxDf=10 drops boilerplate grams first
      val docs = t(s, d, "documents")
      val base = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 5000).as("doc_id"), col("text")))
      graft.ops.Curation.splitLeakage(base, col("doc_id"), col("text"),
          graft.ops.Curation.splitAssign(col("doc_id")),
          n = 5, minShared = 1, maxDf = 10)
        .orderBy("train_id", "eval_id")
    }),
    "q194_scrub_chain" -> ((s, d) => {
      // the ScrubArtifact facade end-to-end as ONE oracle query:
      // frequent-line scrub (corpus docs < 400, q127's artifact) feeding
      // the repeated-gram span scrub (q128's artifact) over batch docs
      // >= 400 — gate-composed exactly as VectorStore.scrubGate folds
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") < 400)
      val batch = wrapped4(docs.filter(col("doc_id") >= 400))
      val line = graft.ops.FrequentLineScrub(minDocs = 3)
      val span = graft.ops.SpanScrub(k = 5, minDocs = 2)
      val lineTab = line.build(wrapped4(corpus), col("doc_id"), col("wtext"))
      val spanTab = span.build(corpus, col("doc_id"), col("text"))
      val step1 = line.gate(batch, col("doc_id"), col("wtext"), lineTab)
      span.gate(step1, col("id"), col("text"), spanTab)
        .select(col("id").as("doc_id"),
          size(array_remove(split(col("text"), "\\s+"), ""))
            .cast("bigint").as("n_tokens"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),
    "q195_drift_ks" -> ((s, d) => {
      // exact two-sample KS over per-doc token counts, head batch vs
      // tail batch (q154's split): supremum chosen by integer
      // comparison, so the argmax never rides float summation order
      val docs = t(s, d, "documents")
      val nTok = size(array_remove(split(trim(col("text")), "\\s+"), ""))
      graft.ops.QualitySignals.driftKs(
        docs.filter(col("doc_id") < 250).select(nTok.as("m")), col("m"),
        docs.filter(col("doc_id") >= 250).select(nTok.as("m")), col("m"))
    }),
    "q196_encoding_artifacts" -> ((s, d) =>
      // mojibake gate over a deterministically decorated corpus:
      // ids %3 gain a U+FFFD, %4 a latin-1 double-encoded pair+triple,
      // %5 a C0 control char — mirrored verbatim in the oracle
      graft.ops.QualitySignals.encodingArtifacts(
          t(s, d, "documents").select(col("doc_id"),
            concat(col("text"),
              when(col("doc_id") % 3 === 0, lit(" caf\uFFFD"))
                .otherwise(lit("")),
              when(col("doc_id") % 4 === 0,
                lit(" caf\u00C3\u00A9 don\u00E2\u0080\u0099t"))
                .otherwise(lit("")),
              when(col("doc_id") % 5 === 0, lit(" bell\u0007"))
                .otherwise(lit("")))
              .as("ptext")),
          col("doc_id"), col("ptext"))
        .orderBy("id")),
    "q197_distinct_n" -> ((s, d) =>
      // corpus lexical diversity: distinct-1/2/3 over md5 gram hashes —
      // the oracle counts the same sets by gram string (collision-free
      // ground truth, the q172 stance)
      graft.ops.TextAnalysis.distinctN(t(s, d, "documents"), col("text"))),
    "q198_simhash_against" -> ((s, d) => {
      // the simhash member of the ...Against family: batch (ids >= 300)
      // sketches against the frozen corpus's (ids < 350) persisted 60-bit
      // signature table — overlap ids self-match at hamming 0 (q170's
      // self-containment proof); maxHamming 20 as in q46 for real pairs
      val docs = t(s, d, "documents")
      val frozen = Dedup.simHashTable(
        docs.filter(col("doc_id") < 350), col("doc_id"), col("text"))
      Dedup.simHashDupAgainst(
          docs.filter(col("doc_id") >= 300), col("doc_id"), col("text"),
          frozen, maxHamming = 20)
        .orderBy("id", "ref_id")
    }),
    "q199_lang_confusion" -> ((s, d) =>
      // where the lang-ID heuristic routes each declared language —
      // the confusion matrix behind q142's agreement buckets
      graft.ops.TextAnalysis.langConfusion(
          t(s, d, "documents"), col("lang"), col("text"))
        .orderBy("declared", "pred")),
    "q200_lm_score_against" -> ((s, d) => {
      // CCNet proper: the bigram LM trains on the CLEAN slice (en docs
      // < 400) and scores the incoming batch (ids >= 300) — unseen
      // bigrams smooth to c=0, unseen first-tokens to cu=0, V from the
      // reference vocabulary only
      val docs = t(s, d, "documents")
      val model = graft.ops.QualitySignals.bigramLmTable(
        docs.filter(col("doc_id") < 400 && col("lang") === "en"), col("text"))
      graft.ops.QualitySignals.bigramLmScoreAgainst(
          docs.filter(col("doc_id") >= 300), col("doc_id"), col("text"), model)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    "q201_weighted_stratum_sample" -> ((s, d) =>
      // balanced eval-set builder: 10 n_chars-weighted docs per declared
      // language via the bounded top-k aggregator — no per-stratum
      // window sort
      graft.ops.Curation.weightedSamplePerStratum(
          t(s, d, "documents"), col("doc_id"), col("lang"), col("n_chars"),
          k = 10)
        .orderBy("stratum", "rnk")),
    "q202_cluster_topics" -> ((s, d) => {
      // the corpus map: q66's IVF training (md5 seeds, 50% sample,
      // quantized Lloyd — the oracle re-trains identical centroids),
      // then top-5 cluster-tf-idf terms per cell over the joined docs
      val cents = graft.ops.Ivf.trainCentroids(t(s, d, "embeddings"),
        col("vec_id"), col("embedding"), 8, iters = 2, sampleFraction = 50)
      val assign = graft.ops.Ivf.assignClusters(t(s, d, "embeddings"),
          col("vec_id"), col("embedding"), cents)
        .select(col("vec_id").as("id"), col("cluster"))
      graft.ops.TextAnalysis.clusterTopics(
          t(s, d, "documents"), col("doc_id"), col("text"), assign, k = 5)
        .orderBy("cluster", "rnk")
    }),
    "q203_soft_dedup" -> ((s, d) => {
      // SoftDeDup: q80's duplicate clusters -> per-doc sampling weight
      // 1/cluster_size; non-members keep 1.0. No document is dropped.
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      val pairs = Dedup.minHashDuplicates(docs, col("doc_id"), col("text"),
        0.7, shingleSize = 1)
      val cc = Dedup.duplicateClusters(pairs, col("a_id"), col("b_id"))
      graft.ops.Curation.softDedupWeights(docs, col("doc_id"), cc)
        .select(col("doc_id"), col("cluster_id"),
          round(col("weight"), 4).as("w"))
        .orderBy("doc_id")
    }),
    "q204_latest_snapshot" -> ((s, d) =>
      // crawl-recrawl current view: latest event per (user_id, event_type),
      // ties toward the smallest event_id — one partial-agg struct-max pass
      Dedup.latestSnapshot(t(s, d, "events"),
          Seq(col("user_id"), col("event_type")), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 4).as("v"))
        .orderBy("user_id", "event_type")),
    "q205_preference_pairs" -> ((s, d) =>
      // DPO pair construction: prompt key = (lang, source), score =
      // n_chars; chosen/rejected = per-group extremes, zero-margin and
      // singleton groups dropped
      graft.ops.Curation.preferencePairs(
          t(s, d, "documents"),
          concat_ws("|", col("lang"), col("source")), col("doc_id"),
          col("n_chars"))
        .select(col("grp"), col("chosen_id"),
          col("chosen_score").cast("long").as("chosen_score"),
          col("rejected_id"),
          col("rejected_score").cast("long").as("rejected_score"),
          col("margin").cast("long").as("margin"), col("n_candidates"))
        .orderBy("grp")),
    "q206_semantic_decontam" -> ((s, d) => {
      // embedding-space contamination: bench = vecs 0-24 (the "eval
      // suite"), corpus = the rest; cosine >= 0.4 against any bench vec
      // flags the row with its best match — what n-gram decontamination
      // (q70/q138) misses on paraphrases
      val emb = t(s, d, "embeddings")
      graft.ops.QualitySignals.semanticContamination(
          emb.filter(col("vec_id") >= 25), col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") < 25), col("vec_id"), col("embedding"),
          0.40)
        .orderBy("id")
    }),
    "q207_retrieval_metrics" -> ((s, d) => {
      // the search-quality eval: IVF(nprobe=2) system ranking graded
      // against the exact brute-force truth at k=10 — recall/MRR/nDCG
      // per query, the numbers an index tuning loop watches
      val emb = t(s, d, "embeddings")
      val qs = Seq("qa" -> qvecScala, "qb" -> qvec2Scala)
      val truth = Ann.bruteForceTopKMany(emb, col("vec_id"),
        col("embedding"), qs, 10)
      val system = graft.ops.Ivf.ivfTopKMany(emb, col("vec_id"),
        col("embedding"), qs, 10)
      Ann.retrievalMetrics(system, truth, 10).orderBy("query_id")
    }),
    "q208_fim_transform" -> ((s, d) =>
      // fill-in-the-middle: md5-selected half of the corpus rewritten
      // PSM (<PRE>prefix<SUF>suffix<MID>middle), deterministic char pivots
      graft.ops.Curation.fimTransform(t(s, d, "documents"), col("doc_id"),
          col("text"), rate = 0.5)
        .orderBy("id")),
    "q209_span_corruption" -> ((s, d) =>
      // T5 denoising objective: one 2-token span per 8-token block
      // replaced by <extra_id_k>, target pairs sentinels with the removed
      // tokens — all offsets md5-derived, row-local
      graft.ops.Curation.spanCorruption(t(s, d, "documents"), col("doc_id"),
          col("text"), stride = 8, spanLen = 2)
        .orderBy("id")),
    "q210_domain_gate" -> ((s, d) =>
      // domain-level gate: per-source mean n_chars and short-doc share;
      // keep = mean >= 300 and <= 75% under the 400-char floor
      graft.ops.Curation.domainRollup(t(s, d, "documents"), col("source"),
          col("n_chars"), minMean = 300.0, lowFloor = 400.0,
          maxLowShare = 0.75)
        .orderBy("source")),
    "q211_embedding_drift" -> ((s, d) =>
      // embedding-space drift: snapshots = vec_id < 250 (ref) vs >= 250
      // (new) assigned to one shared q66-style IVF clustering; per-cell
      // share PSI terms + mean-cosine-to-centroid shift
      graft.ops.QualitySignals.embeddingDrift(t(s, d, "embeddings"),
          col("vec_id"), col("embedding"), col("vec_id") >= 250)
        .orderBy("cluster")),
    "q212_bitext_mining" -> ((s, d) => {
      // margin-ratio mining between two disjoint vector sets (the
      // parallel-corpus construction primitive); exact all-pairs form
      // on bounded slices, k=4 neighborhood normalization
      val emb = t(s, d, "embeddings")
      Ann.bitextMine(
          emb.filter(col("vec_id") < 60), col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") >= 60 && col("vec_id") < 160),
          col("vec_id"), col("embedding"), k = 4, threshold = 1.1)
        .orderBy("a_id")
    }),
    "q213_conversations" -> ((s, d) => {
      // SFT chat assembly: events as dialog turns (user_id = the
      // conversation, deterministic role mapping), templated text +
      // the role-alternation validity verdict
      val ev = t(s, d, "events")
      TextAnalysis.conversationAssemble(ev,
          col("user_id"),
          when(col("event_type").isin("click", "view", "purchase"), "user")
            .otherwise("assistant"),
          concat(col("event_type"), lit(":"),
            floor(col("value")).cast("long")),
          col("ts"), col("event_id"))
        .orderBy("conv_id")
    }),
    "q214_domain_reweight" -> ((s, d) =>
      // one DoReMi multiplicative-weights round: uniform reference mix,
      // loss proxy = ln(1000/n_chars) (short docs read as high-loss),
      // eta=0.5, 10% uniform smoothing
      graft.ops.Curation.domainReweight(t(s, d, "documents"), col("source"),
          log(lit(1000.0) / col("n_chars")),
          (0 until 20).map(i => s"src$i" -> 0.05).toMap,
          eta = 0.5, eps = 0.1)
        .orderBy("source")),
    "q215_score_calibrate" -> ((s, d) =>
      // cross-source calibration: n_chars mapped to its mid-rank CDF
      // position within each source — one threshold, same meaning
      // everywhere
      graft.ops.Curation.scoreRankCalibrate(t(s, d, "documents"),
          col("doc_id"), col("source"), col("n_chars"))
        .orderBy("id")),
    "q216_temperature_sample" -> ((s, d) =>
      // multilingual temperature rebalancing at T=2: stratum shares
      // flatten toward uniform via deterministic md5 Bernoulli keeps
      graft.ops.Curation.temperatureSample(t(s, d, "documents"),
          col("doc_id"), col("lang"), temperature = 2.0)
        .select(col("doc_id"), col("lang"), col("rate"))
        .orderBy("doc_id")),
    "q217_url_dedup" -> ((s, d) => {
      // crawl-frontier dedup: doc_id-keyed synthetic URLs with every
      // canonicalization hazard (www, default ports, utm/fbclid params,
      // fragments, trailing slashes); collisions at lcm(2,7,50)=350
      val id = col("doc_id")
      val url = concat(
        when(id % 2 === 0, "https://").otherwise("http://"),
        when(id % 3 === 0, "www.").otherwise(lit("")),
        lit("site"), (id % 7).cast("string"), lit(".example.com"),
        when(id % 4 === 0,
          when(id % 2 === 0, ":443").otherwise(":80")).otherwise(lit("")),
        lit("/p/"), (id % 50).cast("string"),
        when(id % 5 === 0, "/").otherwise(lit("")),
        when(id % 3 === 1, "?utm_source=news&fbclid=abc").otherwise(lit("")),
        when(id % 6 === 0, "#frag").otherwise(lit("")))
      TextAnalysis.urlDedup(t(s, d, "documents"), id, url)
        .orderBy("canon_url")
    }),
    "q218_readability" -> ((s, d) =>
      // Flesch reading ease over the corpus — the classic readability
      // quality gate, pure row-local regexp arithmetic
      TextAnalysis.fleschReadability(t(s, d, "documents"), col("doc_id"),
          col("text"))
        .orderBy("id")),
    "q219_silhouette" -> ((s, d) =>
      // cluster-separation diagnostic on q66's IVF training: simplified
      // silhouette per cell — the overlap signal the elbow curve (q146)
      // cannot see
      graft.ops.Ivf.silhouetteSimplified(t(s, d, "embeddings"),
          col("vec_id"), col("embedding"))
        .orderBy("cluster")),
    "q220_domain_similarity" -> ((s, d) =>
      // the domain-similarity map: per-label mean-pool centroids, then
      // every pair's cosine — which groups share embedding space
      Ann.groupCentroidSimilarity(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), col("label"))
        .select(col("a_grp").cast("long").as("a_grp"),
          col("b_grp").cast("long").as("b_grp"), col("n_a"), col("n_b"),
          col("sim"))
        .orderBy("a_grp", "b_grp")),
    "q221_lsh_plan" -> ((s, d) =>
      // banding planner at the q43 threshold: S-curve fp/fn per layout
      // within a 64-hash budget — the table that picks (bands, rows)
      Dedup.lshPlan(s, threshold = 0.7, maxHashes = 64)
        .orderBy("bands", "rows_per_band")),
    "q222_logistic_model" -> ((s, d) =>
      // distributed full-batch logistic regression (fastText-lite):
      // y = (lang = 'en'), 64 hashed features, 5 quantized GD steps —
      // the oracle replays the whole optimization bit-for-bit
      graft.ops.Classify.logisticTrain(
          t(s, d, "documents").withColumn("mtext",
            concat(col("text"), lit(" marker_"), col("lang"))),
          col("lang") === "en", col("mtext"), dim = 64, iters = 10, lr = 8.0,
          binary = true)
        .orderBy("j")),
    "q223_logistic_predict" -> ((s, d) => {
      // scoring under the q222 model: row-local sigmoid projection
      val docs = t(s, d, "documents").withColumn("mtext",
        concat(col("text"), lit(" marker_"), col("lang")))
      val model = graft.ops.Classify.logisticTrain(docs,
        col("lang") === "en", col("mtext"), dim = 64, iters = 10, lr = 8.0,
        binary = true)
      graft.ops.Classify.logisticPredictBulk(docs, col("doc_id"),
          col("mtext"), model, binary = true)
        .orderBy("id")
    }),
    "q224_packing_report" -> ((s, d) => {
      // the number a packing strategy is judged by: utilization + waste
      // over q62's greedy 512-token bins
      val toks = when(length(trim(col("text"))) === 0, 0)
        .otherwise(size(split(trim(col("text")), "\\s+"))).cast("long")
      val packed = graft.ops.Curation.packSequences(
        t(s, d, "documents"), col("doc_id"), toks, budget = 512L)
      graft.ops.Curation.packingReport(packed, budget = 512L)
    }),
    "q225_dedup_saturation" -> ((s, d) =>
      // marginal-novelty curve over ingest order: per prefix size, the
      // share of docs near-duplicating an earlier doc (q43 fixture)
      Dedup.dedupSaturation(
          t(s, d, "documents").filter(col("doc_id") < 200),
          col("doc_id"), col("text"), 0.7,
          prefixes = Seq(25L, 50L, 75L, 100L, 125L, 150L, 175L, 200L),
          shingleSize = 1)
        .orderBy("prefix_n")),
    "q226_token_truncate" -> ((s, d) =>
      // context-window fit, boundary-preserving: first+last halves
      // joined by an ellipsis token at a 60-token budget
      graft.ops.Curation.tokenBudgetTruncate(t(s, d, "documents"),
          col("doc_id"), col("text"), budget = 60, strategy = "both")
        .select(col("id"), md5(col("kept_text")).as("kept_md5"),
          col("n_tokens"), col("n_kept"), col("truncated"))
        .orderBy("id")),
    "q227_link_graph" -> ((s, d) => {
      // web-graph construction: doc_id-keyed synthetic anchors →
      // extractLinks → urlCanonicalize → in-degree per canonical target
      // (the fan-in table PageRank seeds from)
      val id = col("doc_id")
      val html = concat(lit("<p>"), col("text"), lit("</p>"),
        lit("<a href=\"https://www.site"), (id % 7).cast("string"),
        lit(".example.com/p/"), (id % 50).cast("string"),
        lit("?utm_source=x\">to page "), (id % 50).cast("string"),
        lit("</a>"),
        when(id % 3 === 0, concat(
          lit("<a href=\"http://site"), ((id + 1) % 7).cast("string"),
          lit(".example.com/p/"), ((id + 13) % 50).cast("string"),
          lit("#frag\"><b>bold</b> link</a>"))).otherwise(lit("")))
      val links = TextAnalysis.extractLinks(
        t(s, d, "documents").withColumn("html", html), id, col("html"))
      links.select(TextAnalysis.urlCanonicalize(col("href")).as("target"))
        .groupBy("target").agg(count(lit(1)).as("in_degree"))
        .orderBy("target")
    }),
    "q228_section_split" -> ((s, d) => {
      // structure-aware chunking: heading-delimited sections with a
      // heading-less preamble, built from a deterministic md fixture
      val toks = array_remove(split(trim(col("text")), "\\s+"), "")
      val md = concat_ws("\n",
        lit("preamble notes"),
        concat(lit("# Title "), col("doc_id").cast("string")),
        concat_ws(" ", slice(toks, 1, 8)),
        lit("## Details"),
        concat_ws(" ", slice(toks, 9, 8)))
      TextAnalysis.sectionSplit(
          t(s, d, "documents").withColumn("md", md), col("doc_id"),
          col("md"))
        .orderBy("id", "sec_idx")
    }),
    "q229_asof_join" -> ((s, d) => {
      // point-in-time lookup: every click gets the latest same-user
      // purchase at-or-before it, plus a 1-hour-tolerance variant —
      // union-and-scan construction, one shuffle on user_id, no theta-join
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      // one purchase row per (user, ts): greatest event_id (makes the
      // as-of winner well-defined in both engines even under ts ties)
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(struct(col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("ts"), col("m.event_id").as("p_id"),
          col("m.value").as("p_value"))
      val plain = graft.ops.Temporal.asofJoin(clicks, purchases,
        Seq("user_id"), "ts", payload = Seq("p_id", "p_value"),
        rightTiebreak = col("p_id"))
      val tol = graft.ops.Temporal.asofJoin(clicks, purchases,
          Seq("user_id"), "ts", payload = Seq("p_id"),
          rightTiebreak = col("p_id"),
          toleranceMicros = Some(3600L * 1000000L))
        .select(col("event_id"), col("asof_p_id").as("p_id_1h"))
      plain.select(col("event_id"), col("asof_p_id").as("p_id"),
          round(col("asof_p_value"), 4).as("p_value"))
        .join(tol, Seq("event_id"))
        .orderBy("event_id")
    }),
    "q230_range_join" -> ((s, d) => {
      // point-in-interval: error events inside [purchase, purchase+30min)
      // windows — interval→bucket replication + equi-join, never a
      // cartesian; 15-min buckets ≈ half the interval length
      val e = ev(s, d)
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"))
      val windows = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("w_id"), col("ts").as("s"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
      graft.ops.Temporal.rangeJoin(errors, col("event_id"), col("ts"),
          windows, col("w_id"), col("s"), col("en"),
          bucketWidthMicros = 15L * 60 * 1000000L)
        .orderBy("p_id", "i_id")
    }),
    "q231_hnsw_edges" -> ((s, d) =>
      // HNSW layered-graph construction (exact baseline): md5-ladder
      // levels, symmetric top-4 cosine neighbors per layer, rnk-0 ring
      // successors for batch-mode connectivity — the whole graph
      // replays in the oracle; beam search recall is HnswSpec territory
      graft.ops.Hnsw.buildExact(
          t(s, d, "embeddings").filter(col("vec_id") < 200),
          col("vec_id"), col("embedding"), m = 4, maxLevel = 2)
        .orderBy("level", "id", "rnk", "nbr")),
    "q232_ict_pairs" -> ((s, d) =>
      // inverse-cloze-task pairs: one md5-picked 4-token unit becomes
      // the pseudo-query, the rest the positive context (1/10 keep the
      // unit in context — the lexical-overlap leave-in); row-local
      graft.ops.Curation.ictPairs(t(s, d, "documents"), col("doc_id"),
          col("text"), unitTokens = 4)
        .select(col("id"), col("n_units"), col("q_idx"),
          md5(col("query_text")).as("q_md5"),
          md5(col("context_text")).as("ctx_md5"), col("kept"))
        .orderBy("id")),
    "q233_distill_pairs" -> ((s, d) => {
      // teacher-score distillation triples over a synthetic first-stage
      // candidate list: 20 pseudo-queries (8-token prefixes of every
      // 25th doc), candidates = docs with did % 20 == qid; top-2
      // positives + bottom-3 hard rejects per query by the md5-portable
      // stub teacher
      val docs = t(s, d, "documents")
      val toks = array_remove(split(trim(col("text")), "\\s+"), "")
      val queries = docs.filter(col("doc_id") % 25 === 0)
        .filter(col("doc_id") < 500)
        .select((col("doc_id") / 25).cast("long").as("qid"),
          concat_ws(" ", slice(toks, 1, 8)).as("qt"))
      val cands = docs.select(col("doc_id").as("did"),
        col("text").as("dt"), (col("doc_id") % 20).cast("long").as("qid"))
      graft.ops.Rerank.distillationPairs(queries.join(cands, "qid"),
          col("qid"), col("qt"), col("did"), col("dt"),
          graft.ops.HashCrossScorer(), posK = 2, negK = 3)
        .orderBy("qid", "rnk")
    }),
    "q234_semantic_pack" -> ((s, d) => {
      // negative-aware packing: bins filled in (IVF cell, id) order, so
      // each training bin co-packs same-cell sequences — in-batch
      // negatives come pre-hardened; report per-bin cell concentration
      val emb = t(s, d, "embeddings")
      val cents = graft.ops.Ivf.trainCentroids(emb, col("vec_id"),
        col("embedding"), 8, iters = 2, sampleFraction = 50)
      val cells = graft.ops.Ivf.assignClusters(emb, col("vec_id"),
          col("embedding"), cents)
        .select(col("vec_id").cast("long").as("id"),
          col("cluster").as("cell"))
      val tok = t(s, d, "documents").select(col("doc_id").as("id"),
        size(array_remove(split(trim(col("text")), "\\s+"), ""))
          .cast("long").as("t"))
      val packed = graft.ops.Curation.packAssign(tok.join(cells, "id"),
        col("id"), Seq(col("cell"), col("id")), col("t"), budget = 512)
      packed.join(cells, "id").groupBy("bin", "cell")
        .agg(count(lit(1)).as("n"), sum("t").as("tk"))
        .groupBy("bin")
        .agg(sum("n").as("n_docs"), sum("tk").as("tokens"),
          round(max(col("n")) / sum(col("n")).cast("double"), 4)
            .as("top_cell_share"))
        .orderBy("bin")
    }),
    "q235_embedding_outliers" -> ((s, d) =>
      // semantic stray detection: cosine to the assigned IVF centroid,
      // flagged under τ = 0.1 — row-local fold over the broadcast
      // centroid literal, no join
      graft.ops.Ivf.embeddingOutliers(t(s, d, "embeddings"),
          col("vec_id"), col("embedding"), tau = 0.1)
        .orderBy("id")),
    "q236_diverse_sample" -> ((s, d) =>
      // inspection sampling: 40 rows round-robin across IVF cells by
      // md5 rank — every cell surfaces members before any cell repeats
      graft.ops.Ivf.diverseSample(t(s, d, "embeddings"),
          col("vec_id"), col("embedding"), k = 40)
        .orderBy("rnd", "id")),
    "q237_rolling_stats" -> ((s, d) =>
      // per-user trailing-3-event features: rolling mean/min/max, value
      // delta and gap seconds — one key shuffle, keyed window frames
      graft.ops.Temporal.rollingStats(ev(s, d), col("event_id"),
          Seq("user_id"), col("ts"), col("value"), nRows = 3)
        .filter(col("user_id") < 30)
        .select(col("id"), col("user_id"), round(col("value"), 4).as("v"),
          col("roll_mean"), round(col("roll_min"), 4).as("roll_min"),
          round(col("roll_max"), 4).as("roll_max"), col("delta"),
          col("gap_s"))
        .orderBy("user_id", "id")),
    "q238_word_noise" -> ((s, d) =>
      // BART deletion noising at 30%: md5-keyed per-position coin, the
      // first token always survives; row-local, no shuffle
      graft.ops.Curation.wordNoise(t(s, d, "documents"), col("doc_id"),
          col("text"), pct = 30)
        .select(col("id"), col("n_tokens"), col("n_deleted"),
          md5(col("noised_text")).as("noised_md5"))
        .orderBy("id")),
    "q239_sentence_split" -> ((s, d) => {
      // sentence segmentation over a deterministically punctuated
      // fixture (every 6th token closes a sentence); row-local
      // regexp_extract_all + one explode
      val toks = array_remove(split(trim(col("text")), "\\s+"), "")
      val punct = concat_ws(" ", transform(toks,
        (tk, i) => when((i + 1) % 6 === 0, concat(tk, lit(".")))
          .otherwise(tk)))
      graft.ops.TextAnalysis.sentenceSplit(
          t(s, d, "documents").withColumn("p", punct), col("doc_id"),
          col("p"))
        .select(col("id"), col("sent_idx"), md5(col("sentence")).as("s_md5"))
        .orderBy("id", "sent_idx")
    }),
    "q240_pack_texts" -> ((s, d) =>
      // the packed training sequences themselves: id-ordered first-fit
      // bins concatenated at a 512-token budget
      graft.ops.Curation.packTexts(t(s, d, "documents"), col("doc_id"),
          col("text"),
          size(array_remove(split(trim(col("text")), "\\s+"), "")),
          budget = 512)
        .select(col("bin"), col("n_docs"), col("tokens"),
          md5(col("text")).as("text_md5"))
        .orderBy("bin")),
    "q241_funnel" -> ((s, d) =>
      // ordered conversion funnel signup → view → click → purchase:
      // ONE key-shuffled aggregation (per-key sorted scan of the
      // step-typed events), counts derived in the same job
      graft.ops.Temporal.funnel(ev(s, d), col("user_id"),
          col("event_type"), col("ts"),
          Seq("signup", "view", "click", "purchase"))
        .orderBy("step_idx")),
    "q243_funnel_steps" -> ((s, d) =>
      // the composable per-key funnel frame q241's counts derive from:
      // (user, step_idx, step, earliest in-order completion time) —
      // funnel-by-cohort joins hang off this
      graft.ops.Temporal.funnelSteps(ev(s, d), col("user_id"),
          col("event_type"), col("ts"),
          Seq("signup", "view", "click", "purchase"))
        .orderBy("step_idx", "k")),
    "q244_funnel_by_cohort" -> ((s, d) => {
      // the composition funnelSteps exists for: conversion counts per
      // first-seen-day cohort — the per-key frame joins the cohort
      // frame on the key, then one grouped count; no event-log rescan
      val e = ev(s, d)
      val steps = graft.ops.Temporal.funnelSteps(e, col("user_id"),
        col("event_type"), col("ts"),
        Seq("signup", "view", "click", "purchase"))
      val cohort = e.select(col("user_id").cast("long").as("k"), col("ts"))
        .groupBy("k").agg(min(to_date(col("ts"))).as("cohort_day"))
      steps.join(cohort, "k")
        .groupBy("cohort_day", "step_idx", "step")
        .agg(count(lit(1)).as("n_keys"))
        .orderBy("cohort_day", "step_idx")
    }),
    "q245_interval_overlap" -> ((s, d) => {
      // interval×interval: purchase 30-min windows co-active with view
      // 10-min windows — both sides bucket-replicate, the owner bucket
      // (holding max(start, start)) claims each pair exactly once;
      // never a theta-join cartesian, no distinct pass
      val e = ev(s, d)
      val pw = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("wid"), col("ts").as("st"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
      val vw = e.filter(col("event_type") === "view")
        .select(col("event_id").as("wid"), col("ts").as("st"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("en"))
      graft.ops.Temporal.intervalOverlapJoin(
          pw, col("wid"), col("st"), col("en"),
          vw, col("wid"), col("st"), col("en"),
          bucketWidthMicros = 15L * 60 * 1000000L)
        .orderBy("a_id", "b_id")
    }),
    "q246_asof_forward" -> ((s, d) => {
      // forward as-of: every click gets the EARLIEST same-user purchase
      // at-or-after it (+ a 1-hour-tolerance variant) — the mirrored
      // union-and-scan, time-descending, still no join operator
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(struct(col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("ts"), col("m.event_id").as("p_id"),
          col("m.value").as("p_value"))
      val plain = graft.ops.Temporal.asofJoin(clicks, purchases,
        Seq("user_id"), "ts", payload = Seq("p_id", "p_value"),
        rightTiebreak = col("p_id"), direction = "forward")
      val tol = graft.ops.Temporal.asofJoin(clicks, purchases,
          Seq("user_id"), "ts", payload = Seq("p_id"),
          rightTiebreak = col("p_id"),
          toleranceMicros = Some(3600L * 1000000L), direction = "forward")
        .select(col("event_id"), col("asof_p_id").as("p_id_1h"))
      plain.select(col("event_id"), col("asof_p_id").as("p_id"),
          round(col("asof_p_value"), 4).as("p_value"))
        .join(tol, Seq("event_id"))
        .orderBy("event_id")
    }),
    "q250_ab_test" -> ((s, d) => {
      // two-arm Welch z-test: units = users (arm by user_id parity —
      // the synthetic assignment), metric = per-user purchase revenue
      // with non-purchasers at 0; one partial-agg over units, per-arm
      // moments meet in a 1x1 broadcast-scalar cross join
      val e = ev(s, d)
      val units = e.select(col("user_id")).distinct()
        .join(e.filter(col("event_type") === "purchase")
            .groupBy("user_id").agg(sum("value").as("rev")),
          Seq("user_id"), "left")
        .select((col("user_id") % 2).as("arm"),
          coalesce(col("rev"), lit(0.0)).as("metric"))
      graft.ops.Experiment.abTest(units, col("arm"), col("metric"))
    }),
    "q251_funnel_latency" -> ((s, d) =>
      // step-to-step conversion latency: median/p90 seconds between
      // adjacent earliest in-order completions — the funnelSteps frame
      // self-joined on ints, one grouped percentile agg
      graft.ops.Experiment.funnelLatency(ev(s, d), col("user_id"),
          col("event_type"), col("ts"),
          Seq("signup", "view", "click", "purchase"))
        .orderBy("step_idx")),
    "q252_ewma" -> ((s, d) =>
      // trailing-4 exponential smoothing (alpha 0.5) of per-user event
      // values: bounded frame, renormalized at series starts — one key
      // shuffle, codegen HOF arithmetic per row
      graft.ops.Temporal.ewmaSmooth(ev(s, d), col("event_id"),
          Seq("user_id"), col("ts"), col("value"), alpha = 0.5, nRows = 4)
        .filter(col("user_id") < 30)
        .select(col("id"), col("user_id"),
          round(col("value"), 4).as("v"), col("ewma"))
        .orderBy("user_id", "id")),
    "q253_anomalies" -> ((s, d) =>
      // rolling z-score anomaly scoring: each event vs its user's 5
      // PRIOR events (self-exclusion), z gated on >= 3 priors and
      // nonzero variance, |z| >= 2 flags — one key shuffle, one frame
      graft.ops.Temporal.anomalies(ev(s, d), col("event_id"),
          Seq("user_id"), col("ts"), col("value"), nRows = 5,
          minPrior = 3, threshold = 2.0)
        .filter(col("user_id") < 30)
        .select(col("id"), col("user_id"), round(col("value"), 4).as("v"),
          col("n_prior"), col("mean_prior"), col("std_prior"), col("z"),
          col("is_anomaly"))
        .orderBy("user_id", "id")),
    "q254_level_shift" -> ((s, d) =>
      // changepoint edge filter: trailing-4 vs leading-4 mean delta per
      // user, full windows only — peaks at step changes, ~0 in regime
      graft.ops.Temporal.levelShift(ev(s, d), col("event_id"),
          Seq("user_id"), col("ts"), col("value"), nRows = 4)
        .filter(col("user_id") < 30)
        .select(col("id"), col("user_id"), round(col("value"), 4).as("v"),
          col("left_mean"), col("right_mean"), col("shift"))
        .orderBy("user_id", "id")),
    "q255_seasonal" -> ((s, d) =>
      // additive seasonal decomposition, period 4 over each user's
      // event sequence: centered 5-row trend, recentered per-(user,
      // phase) seasonal indices, resid = value - trend - seasonal
      graft.ops.Temporal.seasonalDecompose(ev(s, d), col("event_id"),
          Seq("user_id"), col("ts"), col("value"), period = 4)
        .filter(col("user_id") < 30)
        .select(col("id"), col("user_id"), col("phase"),
          round(col("value"), 4).as("v"), col("trend"), col("seasonal"),
          col("resid"))
        .orderBy("user_id", "id")),
    "q256_cuped" -> ((s, d) => {
      // CUPED variance-reduced A/B readout: metric = per-user purchase
      // revenue, covariate = per-user view-value sum (the "pre-period"
      // stand-in) — ONE partial agg over units, per-arm moment sums
      // combine into pooled theta and adjusted Welch z in closed form
      val e = ev(s, d)
      val rev = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(sum("value").as("rev"))
      val vv = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(sum("value").as("vv"))
      val units = e.select("user_id").distinct()
        .join(rev, Seq("user_id"), "left")
        .join(vv, Seq("user_id"), "left")
        .select((col("user_id") % 2).as("arm"),
          coalesce(col("rev"), lit(0.0)).as("metric"),
          coalesce(col("vv"), lit(0.0)).as("x"))
      graft.ops.Experiment.cupedAbTest(units, col("arm"), col("metric"),
        col("x"))
    }),
    "q257_srm" -> ((s, d) => {
      // sample-ratio-mismatch gate: per-arm user counts vs the 50/50
      // design, Pearson chi-square at the 0.001 dof-1 critical value —
      // one count-by-arm agg, then k-row arithmetic
      val units = ev(s, d).select("user_id").distinct()
        .select((col("user_id") % 2).as("arm"))
      graft.ops.Experiment.srmCheck(units, col("arm"),
        Seq(0 -> 1.0, 1 -> 1.0))
    }),
    "q258_jw_join" -> ((s, d) => {
      // record-linkage fuzzy join: 3-token title stand-ins per doc plus
      // a deterministic end-transposition twin; first-token blocking,
      // Jaro-Winkler >= 0.96 — only same-block pairs pay the kernel
      val base = t(s, d, "documents")
        .select(col("doc_id").cast("long").as("id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 3), " ")
            .as("s"))
        .filter(length(col("s")) >= 6)
      val L = length(col("s"))
      val mut = base.select((col("id") + 1000000L).as("id"),
        concat(col("s").substr(lit(1), L - 2), col("s").substr(L, lit(1)),
          col("s").substr(L - 1, lit(1))).as("s"))
      graft.ops.Dedup.jaroWinklerJoin(base.unionByName(mut), col("id"),
          col("s"), element_at(split(col("s"), " "), 1), minSim = 0.96)
        .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
        .orderBy("a_id", "b_id")
    }),
    "q259_active_users" -> ((s, d) =>
      // rolling DAU/WAU/MAU: one distinct over (user, day), then the
      // pairs frame fans out ×28 and one grouped conditional
      // count_distinct serves all three windows — the log never
      // self-joins
      graft.ops.Analytics.activeUsers(ev(s, d), col("user_id"), col("ts"),
        Seq(1, 7, 28)).orderBy("day")),
    "q260_transitions" -> ((s, d) =>
      // Markov journey matrix: per-user lead pairs in (ts, id) order,
      // grouped to |types|² rows, row-normalized per origin
      graft.ops.Analytics.eventTransitions(ev(s, d), col("user_id"),
        col("event_type"), col("ts"), col("event_id"))
        .orderBy("from_type", "to_type")),
    "q261_inactivity_gaps" -> ((s, d) =>
      // churn-risk pauses: consecutive same-user events more than a
      // day apart — one keyed lead window, then a filter
      graft.ops.Analytics.inactivityGaps(ev(s, d), col("user_id"),
        col("ts"), 24L * 3600 * 1000000L).orderBy("k", "gap_start")),
    "q262_ohlc" -> ((s, d) =>
      // candlestick downsampling to 6-hour bars: min_by/max_by resolve
      // open/close inside ONE hash aggregation — no window, no sort
      graft.ops.Analytics.ohlcBars(ev(s, d), col("user_id"), col("ts"),
        col("value"), col("event_id"), 6L * 3600 * 1000000L)
        .orderBy("k", "bucket_start")),
    "q263_resample_locf" -> ((s, d) =>
      // forward-filled 6-hour grid over each user's view stream: each
      // event's validity segment explodes to exactly the ticks it owns
      graft.ops.Analytics.resampleLocf(
        ev(s, d).filter(col("event_type") === "view"), col("user_id"),
        col("ts"), col("value"), 6L * 3600 * 1000000L)
        .orderBy("k", "tick")),
    "q264_time_decay_attribution" -> ((s, d) => {
      // q249's candidate set (same-user clicks in the purchase's
      // trailing 3-day window via the KEYED range join), credited by
      // recency: weight 0.5^(Δt / 1 day), renormalized per purchase
      graft.ops.Analytics.attributionCredits(
        attributionTouches(s, d), col("pid"), col("cid"),
        col("t_ts"), col("c_ts"), "time_decay",
        halfLifeMicros = 24L * 3600 * 1000000L)
        .orderBy("conversion_id", "touch_id")
    }),
    "q265_position_attribution" -> ((s, d) => {
      // the U-shaped model over the same candidate set: 40% first
      // touch, 40% last, 20% spread over middles (50/50 at two
      // touches, 100% at one)
      graft.ops.Analytics.attributionCredits(
        attributionTouches(s, d), col("pid"), col("cid"),
        col("t_ts"), col("c_ts"), "position")
        .orderBy("conversion_id", "touch_id")
    }),
    "q266_triangles" -> ((s, d) => {
      // co-purchase graph: parts sharing an order are linked (pair
      // fan-out bounded by the per-order item count), then per-node
      // triangle counts + clustering coefficient via degree-oriented
      // wedges — never a hub-quadratic join
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      // co-purchase edge set (~1M) fits the driver: broadcast the
      // closing-edge lookup so the Σ outdeg²-sized wedge frame never
      // shuffles
      graft.ops.Graph.triangleStats(e, col("a"), col("b"),
          broadcastEdges = true)
        .orderBy("id")
    }),
    "q267_profile" -> ((s, d) =>
      // one-pass column profiles of the event log: ONE explode melt,
      // a moments agg, and a per-(col, value) cardinality/entropy agg
      graft.ops.Profile.profileColumns(ev(s, d),
        Seq("event_id", "user_id", "event_type", "value"))
        .orderBy("col_name")),
    "q268_winsorize" -> ((s, d) =>
      // per-event-type p01/p99 winsorization: one grouped exact
      // percentile → broadcast bounds → map-side clip + flag
      graft.ops.Profile.winsorize(ev(s, d), col("event_id"),
        Seq("event_type"), col("value"), 0.01, 0.99)
        .orderBy("id")),
    "q271_removal_effect" -> ((s, d) => {
      // Markov removal-effect attribution: journeys are (user, day)
      // units — the day's event-type path up to its first purchase,
      // converted iff the day purchases. The transition matrix
      // aggregates distributed; only the |channels|²-sized matrix
      // reaches the driver solver
      val e = ev(s, d).withColumn("dd", to_date(col("ts")))
      val fp = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "dd").agg(min(col("ts")).as("fpt"))
      val pre = e.join(fp, Seq("user_id", "dd"), "left")
        .filter(col("fpt").isNull || col("ts") < col("fpt"))
        .groupBy("user_id", "dd")
        .agg(transform(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")).as("p"))
      val units = e.select("user_id", "dd").distinct()
      val paths = units
        .join(pre, Seq("user_id", "dd"), "left")
        .join(fp, Seq("user_id", "dd"), "left")
        .select(coalesce(col("p"), array().cast("array<string>")).as("p"),
          col("fpt").isNotNull.as("cv"))
      graft.ops.Analytics.removalEffectAttribution(paths, col("p"),
        col("cv"), iters = 60).orderBy("channel")
    }),
    "q270_active_users_hll" -> ((s, d) =>
      // the 100 TB path for q259 (per-day HLL sketches union across the
      // window — only KB sketches fan out, never (user, day) pairs),
      // made hash-matchable via the self-certifying audit contract:
      // emit the exact rolling counts plus in-query |est−exact|/exact
      // ≤ 5% booleans; the oracle recomputes the exact twin and
      // expects all-true.
      graft.ops.Analytics.activeUsersAudit(ev(s, d), col("user_id"),
        col("ts"), Seq(1, 7, 28), tol = 0.05).orderBy("day")),
    "q269_sessions" -> ((s, d) =>
      // batch sessionization at a 2-hour inactivity gap: lag marks
      // starts, a running sum numbers sessions, one grouped agg rolls
      // up — a single key shuffle end to end
      graft.ops.Analytics.sessionize(ev(s, d), col("user_id"), col("ts"),
        col("value"), 2L * 3600 * 1000000L)
        .orderBy("k", "session_idx")),
    "q248_twap" -> ((s, d) => {
      // time-weighted average value per user over 6-hour buckets: each
      // view's value HOLDS until the user's next view (step function),
      // buckets integrate the held values normalized by covered time —
      // one lead() window + bucket-replicated clipping, no extrapolation
      val e = ev(s, d)
      val views = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts")
        .agg(max(struct(col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("ts"), col("m.value").as("v"))
      graft.ops.Temporal.timeWeightedAvg(views, col("user_id"), col("ts"),
          col("v"), bucketWidthMicros = 6L * 3600 * 1000000L)
        .orderBy("k", "bucket_start")
    }),
    "q249_linear_attribution" -> ((s, d) => {
      // multi-touch attribution: every purchase splits unit credit
      // equally across the same-user clicks in its trailing 3-day
      // window — the KEYED range join (user equi-key + day buckets)
      // keeps candidates to same-user pairs, then one grouped count
      // derives the per-touch share; never a theta join
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ts"))
      val windows = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("pu"),
          (col("ts") - expr("INTERVAL 3 DAYS")).as("st"), col("ts").as("en"))
      val touches = graft.ops.Temporal.rangeJoin(
          clicks, col("cid"), col("ts"),
          windows, col("pid"), col("st"), col("en"),
          bucketWidthMicros = 24L * 3600 * 1000000L,
          pKeys = Seq(col("user_id")), iKeys = Seq(col("pu")))
        .select(col("p_id").as("click_id"), col("i_id").as("purchase_id"))
      val n = touches.groupBy("purchase_id")
        .agg(count(lit(1)).as("n_touch"))
      touches.join(n, "purchase_id")
        .select(col("purchase_id"), col("click_id"),
          round(lit(1.0) / col("n_touch"), 4).as("credit"))
        .orderBy("purchase_id", "click_id")
    }),
    "q247_asof_nearest" -> ((s, d) => {
      // nearest as-of: the closer of the latest-before / earliest-after
      // purchase per click (equal distance → backward) — BOTH running
      // windows over ONE key shuffle, row-local closer pick
      val e = ev(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(col("event_id")).as("p_id"))
        .select(col("user_id"), col("ts"), col("p_id"))
      graft.ops.Temporal.asofJoinNearest(clicks, purchases,
          Seq("user_id"), "ts", payload = Seq("p_id"),
          rightTiebreak = col("p_id"))
        .select(col("event_id"), col("asof_p_id").as("p_id"),
          col("asof_time").as("near_ts"))
        .orderBy("event_id")
    }),
    "q242_cohort_retention" -> ((s, d) =>
      // weekly cohort retention matrix: first-seen-day cohorts ×
      // 7-day activity offsets, distinct users per cell
      graft.ops.Temporal.cohortRetention(ev(s, d), col("user_id"),
          col("ts"), periodDays = 7)
        .orderBy("cohort_day", "period_idx")),
    "q272_gram_spectrum" -> ((s, d) =>
      // every gram length 1..64 answered from ONE suffix ranking +
      // integer LCP table — the per-length gram alternative re-scans
      // the corpus 64 times; here text ships once (the LCP join) and
      // the census is an integer explode. Same bounded sub-corpus as
      // q152 (the suffix-family verification input).
      graft.ops.Suffix.gramSpectrum(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), minLen = 1, maxLen = 64)
        .orderBy("len")),
    "q273_dq_report" -> ((s, d) => {
      // data-quality gate: four row-level rules in ONE scan (one
      // conditional sum each), key uniqueness as one grouped count,
      // referential integrity as one anti-join against the distinct
      // parent keys — a fixed number of passes however many rules
      val li = t(s, d, "lineitem")
      val rules = graft.ops.Profile.dqReport(li, Seq(
        "discount_max" -> (col("l_discount") <= 0.08),
        "flag_domain" -> col("l_returnflag").isin("A", "N", "R"),
        "price_positive" -> (col("l_extendedprice") > 0),
        "qty_range" -> col("l_quantity").between(1, 50)))
      val uniq = graft.ops.Profile.dqUnique(li,
        Seq("pk_unique" -> Seq(col("l_orderkey"), col("l_linenumber"))))
      val ref = graft.ops.Profile.dqRefIntegrity(li, col("l_orderkey"),
        t(s, d, "orders"), col("o_orderkey"), "fk_orders")
      rules.unionByName(uniq).unionByName(ref).orderBy("rule")
    }),
    "q274_scd2" -> ((s, d) =>
      // SCD type-2 history of each user's event-type state: one key
      // shuffle for the change-detection window, then version-level
      // frames only
      graft.ops.Warehouse.scd2(ev(s, d), col("user_id"), col("ts"),
          col("event_id"), Seq("state" -> col("event_type")))
        .orderBy("k", "version")),
    "q275_sorted_neighborhood" -> ((s, d) =>
      // sorted-neighborhood blocking: global range-partitioned rank on
      // the name, candidates = the w-1 next ranks via ONE integer
      // equi-join (n·(w−1) pairs regardless of skew), JW scored
      // row-local
      graft.ops.Linkage.sortedNeighborhoodJoin(t(s, d, "customer"),
          col("c_custkey"), col("c_name"), col("c_name"),
          window = 4, minSim = 0.9)
        .orderBy("a_id", "b_id")),
    "q276_linkage_score" -> ((s, d) => {
      // Fellegi–Sunter scoring over (nation, segment)-blocked customer
      // pairs: agreement predicates are engine-shared functions
      // (levenshtein, abs), weights are driver-side literals — the
      // scoring itself is a zero-shuffle projection
      // spread BEFORE the self-join: the customer scan is one row group
      // at bench scale, and a broadcast self-join would run the whole
      // |block|²/2 levenshtein fan-out inside that single scan task (18 s
      // serial vs ~2 s spread). spreadSmallScan PINS the partition count
      // — a bare repartition(cols) is AQE-coalesced right back to one
      // task on a tiny shuffle — and no-ops at corpus scale
      val c = graft.ops.Dedup.spreadSmallScan(
        t(s, d, "customer").select(col("c_custkey").as("id"),
          col("c_name").as("nm"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"), col("c_acctbal").as("bal")),
        col("id"))
      val pairs = c.as("a").join(c.as("b"),
          col("a.nk") === col("b.nk") && col("a.seg") === col("b.seg") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
          col("a.nm").as("a_name"), col("b.nm").as("b_name"),
          col("a.bal").as("a_bal"), col("b.bal").as("b_bal"))
      graft.ops.Linkage.linkageScore(pairs, Seq(
          ("name", levenshtein(col("a_name"), col("b_name")) <= 2,
            0.9, 0.05),
          ("bal", abs(col("a_bal") - col("b_bal")) < lit(100.0),
            0.8, 0.1)),
          upper = 3.0, lower = -4.0)
        .orderBy("a_id", "b_id")
    }),
    "q277_kaplan_meier" -> ((s, d) => {
      // time-to-first-purchase survival with administrative censoring
      // at a 2-day horizon (subjects not converted by then censor at
      // t=2); the KM table is a grouped count + cumulative windows
      // over the |distinct durations| frame
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
            .as("obs"))
      graft.ops.Analytics.kaplanMeier(subjects, col("dur"), col("obs"))
        .orderBy("t")
    }),
    "q278_assoc_rules" -> ((s, d) =>
      // market-basket rules over order → part baskets: choose-2
      // per-basket pair fan-out, broadcast item counts, 4dp
      // support/confidence/lift
      graft.ops.Analytics.associationRules(t(s, d, "lineitem"),
          col("l_orderkey"), col("l_partkey"), minPairs = 2)
        .orderBy("antecedent", "consequent")),
    "q279_cube" -> ((s, d) =>
      // CUBE over (returnflag, linestatus): all four grouping sets in
      // one pass (Expand + partial agg); rolled-up keys render 'ALL'
      // so ordering is engine-portable
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"), col("avg_price"))
        .orderBy("rf", "ls")),
    "q280_pivot" -> ((s, d) =>
      // wide activity matrix: one groupBy + pivot with an EXPLICIT
      // value list (no discovery pass) — a single shuffle producing
      // |types| conditional aggregates per user
      ev(s, d).groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 4))
        .orderBy("user_id")),
    "q281_trend" -> ((s, d) =>
      // per-type linear trend of value over elapsed days: regr_* are
      // moment aggregates (one partial-agg pass, no sort, no window)
      ev(s, d)
        .select(col("event_type"),
          (unix_micros(col("ts")) / lit(86400000000.0)).as("x"),
          col("value").as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(expr("regr_slope(y, x)"), 4).as("slope"),
          round(expr("regr_intercept(y, x)"), 4).as("intercept"),
          round(expr("regr_r2(y, x)"), 4).as("r2"))
        .orderBy("event_type")),
    "q282_benford" -> ((s, d) =>
      // Benford first-digit audit of prices: digit extraction is pure
      // arithmetic (floor/log10 — identical doubles on every engine),
      // then one 9-row grouped count against the log10(1+1/d) law
      t(s, d, "lineitem")
        .filter(col("l_extendedprice") > 0)
        .select(floor(col("l_extendedprice") /
          pow(lit(10.0), floor(log10(col("l_extendedprice")))))
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(t(s, d, "lineitem")
          .filter(col("l_extendedprice") > 0)
          .agg(count(lit(1)).as("__t"))))
        .select(col("digit"), col("n"),
          round(col("n") / col("__t").cast("double"), 4).as("obs_p"),
          round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("exp_p"))
        .orderBy("digit")),
    "q283_gini" -> ((s, d) =>
      // revenue concentration across customers: per-customer totals
      // (one grouped sum), then the rank-identity Gini over a
      // range-partitioned global index — no single-task sort
      graft.ops.Analytics.giniCoefficient(
        t(s, d, "orders").groupBy("o_custkey")
          .agg(sum("o_totalprice").as("spend")),
        col("spend"), col("o_custkey"))),
    "q284_rfm" -> ((s, d) => {
      // RFM quintile segmentation: three per-customer aggregates from
      // ONE pass over orders, each binned by the window-free quantile
      // binner (exact percentile cut points broadcast, row-local fold)
      val o = t(s, d, "orders")
      val study = o.agg(max(to_date(col("o_orderdate"))).as("dm"))
      val per = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_day"),
          count(lit(1)).as("f"), round(sum("o_totalprice"), 4).as("m"))
        .crossJoin(broadcast(study))
        .select(col("o_custkey").as("id"),
          datediff(col("dm"), col("last_day")).cast("double").as("r"),
          col("f").cast("double").as("fd"), col("m"))
      def bins(src: org.apache.spark.sql.DataFrame, c: String, out: String) =
        graft.ops.Curation.quantileBins(src, col("id"), col(c), 5)
          .select(col("id"), col("bin").as(out))
      per.join(bins(per, "r", "r_bin"), "id")
        .join(bins(per, "fd", "f_bin"), "id")
        .join(bins(per, "m", "m_bin"), "id")
        .select(col("id"), col("r").cast("long").as("recency_days"),
          col("fd").cast("long").as("frequency"), col("m").as("monetary"),
          col("r_bin"), col("f_bin"), col("m_bin"),
          (col("r_bin") * 100 + col("f_bin") * 10 + col("m_bin"))
            .as("segment"))
        .orderBy("id")
    }),
    "q285_holt" -> ((s, d) =>
      // Holt level+trend per user: the full prefix recurrence folded
      // in-task over each key's sorted series — one key shuffle, no
      // driver loop, no window
      graft.ops.Temporal.holtSmooth(ev(s, d), col("user_id"), col("ts"),
          col("event_id"), col("value"), alpha = 0.5, beta = 0.3,
          horizon = 3)
        .orderBy("k")),
    "q286_skew_report" -> ((s, d) =>
      // pre-shuffle skew audit of a join key: one grouped count is the
      // only corpus pass; percentiles + top-N run over the |keys| table.
      // top_keys stringified so every result column is scalar (the
      // driver's pandas sort/hash can't handle array cells)
      graft.ops.Scale.skewReport(t(s, d, "lineitem"), col("l_partkey"),
          topN = 5)
        .withColumn("top_keys", array_join(col("top_keys"), ","))),
    "q287_standardize" -> ((s, d) =>
      // per-type z-scores: broadcast group moments, map-side transform
      // — the fact table never shuffles
      graft.ops.Profile.standardize(ev(s, d), col("event_id"),
          Seq("event_type"), col("value"))
        .orderBy("id")),
    "q288_kmv_distinct" -> ((s, d) => {
      // KMV distinct sketch vs exact, per source: md5 determinism
      // makes the ESTIMATE itself oracle-exact; the exact column is
      // the verification join, not part of the sketch
      val tk = t(s, d, "documents")
        .select(col("source"),
          explode(array_remove(split(trim(col("text")), "\\s+"), ""))
            .as("w"))
      val est = graft.ops.Scale.kmvDistinct(tk, Seq("source"), col("w"),
        k = 16)
      val exact = tk.groupBy("source")
        .agg(count_distinct(col("w")).as("exact_distinct"))
      est.join(exact, "source")
        .select(col("source"), col("exact_distinct"),
          col("est_distinct"))
        .orderBy("source")
    }),
    "q289_window_funnel" -> ((s, d) =>
      // conversion-deadline funnel: later steps count only within 24 h
      // of the first-signup anchor — same single-shuffle greedy fold,
      // one extra deadline conjunct
      graft.ops.Temporal.funnelStepsWindowed(ev(s, d), col("user_id"),
          col("event_type"), col("ts"),
          Seq("signup", "view", "click", "purchase"),
          windowMicros = 24L * 3600 * 1000000L)
        .orderBy("step_idx", "k")),
    "q290_mann_whitney" -> ((s, d) => {
      // nonparametric A/B over per-user totals: the pool collapses to
      // per-value (count, arm-1 count) rows; midranks via the weighted
      // prefix sum — no row-level global window
      val units = ev(s, d).groupBy("user_id")
        .agg(sum("value").as("m"))
        .select((col("user_id") % 2).cast("int").as("arm"), col("m"))
      graft.ops.Experiment.mannWhitney(units, col("arm"), col("m"))
    }),
    "q291_maximal_repeats" -> ((s, d) =>
      // boilerplate-template miner: repeats of 2..6 tokens that extend
      // neither way — grams hash in-projection, only (len, hash,
      // neighbor) rows shuffle, witness text via one small join
      graft.ops.Suffix.maximalRepeats(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), minLen = 2, maxLen = 6,
          minCount = 3)
        .orderBy("len", "gram")),
    "q292_maximal_repeats_all" -> ((s, d) =>
      // NO length cap: every maximal repeat from one suffix ranking —
      // LCP-interval candidates, sparse-table ANSV bounds, prefix-sum
      // left-maximality; all integer shuffles after the one LCP join
      graft.ops.Suffix.maximalRepeatsAll(
          t(s, d, "documents").filter(col("doc_id") % 10 === 0),
          col("doc_id"), col("text"), minLen = 2, minCount = 3)
        .orderBy("len", "gram")),
    "q293_proportion_test" -> ((s, d) => {
      // did the treatment arm convert more? pooled two-proportion z
      // over per-user purchase flags — one partial-agg over the units
      val units = ev(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
        .select((col("user_id") % 2).cast("int").as("arm"), col("conv"))
      graft.ops.Experiment.proportionTest(units, col("arm"), col("conv"))
    }),
    "q294_chi2_independence" -> ((s, d) =>
      // is event mix independent of user cohort? one grouped count is
      // the only corpus pass; margins/expected run on the cell frame
      graft.ops.Experiment.chiSquareIndependence(
        ev(s, d).select(col("event_type"),
          (col("user_id") % 3).as("cohort")),
        col("event_type"), col("cohort"))),
    "q295_acf" -> ((s, d) => {
      // lag-1..7 autocorrelation of each type's daily volume: one keyed
      // sort powers all lags, the melt explodes |keys| rows only
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.autocorrelation(series,
          datediff(col("day"), to_date(lit("1970-01-01"))),
          Seq("event_type"), col("day"), col("v"), maxLag = 7)
        .orderBy("event_type", "lag")
    }),
    "q296_cusum" -> ((s, d) => {
      // where does each type's daily mean shift? CUSUM peak over the
      // standardized series — one keyed sort + a |keys|-max re-join
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(avg("value").as("v"))
      graft.ops.Temporal.cusumChangepoint(series,
          datediff(col("day"), to_date(lit("1970-01-01"))),
          Seq("event_type"), col("day"), col("v"), threshold = 3.0)
        .orderBy("event_type")
    }),
    "q297_posting_lists" -> ((s, d) =>
      // the materialized lexical index: df / total tf / first-10
      // postings per term, ids capped BEFORE the collect. postings
      // stringified so every result column is scalar-hashable
      graft.ops.Keyword.postingLists(t(s, d, "documents"),
          col("doc_id"), col("text"), minDf = 8, cap = 10)
        .withColumn("postings",
          array_join(col("postings").cast("array<string>"), ","))
        .orderBy("term")),
    "q298_kcore" -> ((s, d) => {
      // dense backbone of the co-purchase graph: iterative peeling to
      // the k-core fixpoint — per round one grouped count + two
      // semi-joins, the edge frame checkpointed O(1)-deep
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.kCore(e, col("a"), col("b"), k = 12)
        .orderBy("id")
    }),
    "q299_systematic_sample" -> ((s, d) =>
      // every-97th order in (date, key) order: range-partitioned global
      // rank + a row-local modulo — never a single-task sort
      graft.ops.Curation.systematicSample(
          t(s, d, "orders")
            .select("o_orderkey", "o_orderdate", "o_totalprice"),
          Seq(col("o_orderdate"), col("o_orderkey")), step = 97)
        .orderBy("gidx")),
    "q300_kmv_setops" -> ((s, d) => {
      // union / Jaccard / intersection estimates between every source
      // pair from k-hash sketches — pairwise work on k·|groups| rows,
      // md5 determinism makes the estimates oracle-exact
      val tk = t(s, d, "documents")
        .select(col("source"),
          explode(array_remove(split(trim(col("text")), "\\s+"), ""))
            .as("w"))
      graft.ops.Scale.kmvSetOps(tk, col("source"), col("w"), k = 32)
        .orderBy("src_a", "src_b")
    }),
    "q301_welch_ttest" -> ((s, d) => {
      // means test with honest degrees of freedom: Welch t + W-S df
      // over per-user averages — one partial-agg corpus pass
      val units = ev(s, d).groupBy("user_id")
        .agg(avg("value").as("m"))
        .select((col("user_id") % 2).cast("int").as("arm"), col("m"))
      graft.ops.Experiment.welchTTest(units, col("arm"), col("m"))
    }),
    "q302_kruskal_wallis" -> ((s, d) => {
      // 3-arm nonparametric test: pooled midranks from the weighted
      // prefix sum, per-arm rank sums, tie-corrected H
      val units = ev(s, d).groupBy("user_id")
        .agg(sum("value").as("m"))
        .select((col("user_id") % 3).cast("string").as("arm"), col("m"))
      graft.ops.Experiment.kruskalWallis(units, col("arm"), col("m"))
    }),
    "q303_bfs" -> ((s, d) => {
      // hop distances from a seed part set over the co-purchase graph:
      // level-synchronous frontier joins, visited set O(1)-deep
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val seeds = t(s, d, "part")
        .filter(col("p_partkey") % 997 === 0)
        .select(col("p_partkey"))
      graft.ops.Graph.bfsDistances(e, col("a"), col("b"),
          seeds, col("p_partkey"), maxDepth = 6)
        .orderBy("id")
    }),
    "q304_hits" -> ((s, d) => {
      // hubs/authorities on the directed supplier→part supply graph
      // (suppliers offset out of the part id space): deterministic
      // integer max-normalized iterations, oracle replays them exactly
      val e = t(s, d, "lineitem")
        .select((col("l_suppkey") + lit(1000000000L)).as("s"),
          col("l_partkey").as("p"))
      graft.ops.Graph.hits(e, col("s"), col("p"), iters = 3)
        .orderBy("id")
    }),
    "q305_theil_sen" -> ((s, d) => {
      // robust daily-volume trend per type: median pairwise slope over
      // the bounded per-key series — outliers can't drag it
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01")))
            .cast("double").as("x"), col("v"))
      graft.ops.Temporal.theilSen(series, Seq("event_type"), col("x"),
          col("v"))
        .orderBy("event_type")
    }),
    "q306_textrank" -> ((s, d) => {
      // TextRank keyphrases: adjacent-word co-occurrence edges (words
      // as md5-60-bit ids — engine-portable), symmetrized, 3 PageRank
      // iterations, top-20 words; the whole composition stays on the
      // verified integer iteration kernel
      val toks = t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(array_remove(split(trim(col("text")), "\\s+"), "")
          .as("tk"))
        .filter(size(col("tk")) >= 2)
      val pairs = toks.select(explode(arrays_zip(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1))).as("z"))
        .select(col("z.0").as("w1"), col("z.1").as("w2"))
        .filter(col("w1") =!= col("w2"))
      val edges = pairs
        .select(graft.expr.PortableHash.hex15Col(col("w1")).as("src"),
          graft.expr.PortableHash.hex15Col(col("w2")).as("dst"))
        .unionAll(pairs
          .select(graft.expr.PortableHash.hex15Col(col("w2")).as("src"),
            graft.expr.PortableHash.hex15Col(col("w1")).as("dst")))
        .distinct()
      val words = t(s, d, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(explode(array_remove(split(trim(col("text")), "\\s+"), ""))
          .as("w"))
        .select(graft.expr.PortableHash.hex15Col(col("w")).as("id"),
          col("w"))
        .distinct()
      graft.ops.Graph.pageRank(edges, col("src"), col("dst"), iters = 3)
        .join(words, "id")
        .select(col("w").as("word"), col("rank_micro"))
        .orderBy(desc("rank_micro"), asc("word"))
        .limit(20)
    }),
    "q307_pca_project" -> ((s, d) =>
      // top-2 principal directions by fixed-sweep power iteration with
      // deflation — the oracle replays the identical sweeps, so parity
      // never hangs on convergence or an engine-internal eigensolver;
      // stats via the zero-exchange co-moment pass, projection row-local
      graft.ops.Ann.pcaProject(t(s, d, "embeddings"), col("vec_id"),
          col("embedding"), dim = 64, nComponents = 2, sweeps = 30)
        .orderBy("id")),
    "q308_label_propagation" -> ((s, d) => {
      // semi-supervised topic spread: a 2% seed set's labels propagate
      // 4 synchronous majority rounds over the co-purchase graph —
      // seeds clamp, ties break to the smallest label
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val seeds = t(s, d, "part")
        .filter(col("p_partkey") % 50 === 0)
        .select(col("p_partkey"), (col("p_partkey") % 7).as("cls"))
      graft.ops.Graph.labelPropagation(e, col("a"), col("b"),
          seeds, col("p_partkey"), col("cls"), iters = 4)
        .orderBy("id")
    }),
    "q309_cross_folds" -> ((s, d) =>
      // content-addressed 5-fold assignment: stable across runs and
      // engines, no RNG state — per-doc fold + the size histogram is
      // the oracle's identical md5 arithmetic
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.ops.Curation.crossFold(col("doc_id"), 5).as("fold"))
        .orderBy("doc_id")),
    "q310_holt_winters" -> ((s, d) => {
      // weekly-seasonal triple smoothing of daily cohort volumes: the
      // full level+trend+seasonal recurrence folded in-task per key;
      // the oracle replays it through a list-carrying recursive CTE
      val series = ev(s, d)
        .groupBy((col("user_id") % 3).as("k"),
          to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.holtWintersSmooth(series, col("k"), col("day"),
          datediff(col("day"), to_date(lit("1970-01-01"))), col("v"),
          alpha = 0.5, beta = 0.3, gamma = 0.4, period = 7, horizon = 2)
        .orderBy("k")
    }),
    "q311_glove_cooccurrence" -> ((s, d) =>
      // the GloVe input matrix: window-4 distance-discounted pair
      // weights in exact integer 1/12 units — row-local expansion,
      // only (w1, w2, weight) rows shuffle
      graft.ops.TextAnalysis.gloveCooccurrence(
          t(s, d, "documents").filter(col("doc_id") % 3 === 0),
          col("text"), window = 4, minCount = 10)
        .orderBy("w1", "w2")),
    "q312_pii_spans" -> ((s, d) => {
      // character-position PII spans over the q161 decorated corpus,
      // made hash-matchable: per (doc, class) emit the span count, the
      // ordered matched strings, and an in-query slices_match boolean
      // certifying every span slices back to its matched text. DuckDB
      // recomputes counts + matched strings via regexp_extract_all;
      // the raw positions stay spec-pinned (TextAnalysisSpec).
      val base = piiDecorated(t(s, d, "documents"))
        .select(col("doc_id").cast("long").as("id"), col("ptext"))
      graft.ops.TextAnalysis.piiSpans(base, col("id"), col("ptext"))
        .join(base, "id")
        .withColumn("__ok",
          col("ptext").substr((col("start_pos") + 1).cast("int"),
            (col("end_pos") - col("start_pos")).cast("int"))
            === col("matched"))
        .groupBy("id", "pii_class")
        .agg(count(lit(1)).as("n_spans"),
          array_join(transform(
            array_sort(collect_list(struct(col("start_pos"),
              col("matched")))),
            x => x.getField("matched")), "|").as("matched_seq"),
          bool_and(col("__ok")).as("slices_match"))
        .orderBy("id", "pii_class")
    }),
    "q313_isotonic" -> ((s, d) => {
      // monotone probability calibration of the raw event score:
      // segment-merge PAV over 5-unit value bins; the oracle replays
      // the min-max identity (max_{i≤k} min_{j≥k} avg(i..j)) over the
      // identical bin table — block means are exact integer ratios, so
      // the two agree bit-for-bit
      val e = ev(s, d).select(
        floor(col("value") / 5).cast("long").as("bin"),
        (col("event_type") === "purchase").cast("long").as("y"))
      graft.ops.Classify.isotonicCalibrate(e, col("bin"), col("y"))
        .orderBy("bin")
    }),
    "q314_roc_auc" -> ((s, d) =>
      // exact tie-aware AUC of the raw score against the purchase
      // label — a normalized Mann–Whitney U, midranks from the same
      // weighted prefix sum (no global window)
      graft.ops.Classify.rocAuc(ev(s, d), col("value"),
        (col("event_type") === "purchase").cast("long"))),
    "q315_calibration_error" -> ((s, d) =>
      // reliability audit of a pseudo-probability (value/500) against
      // the purchase label: 10-bucket ECE + MCE in one grouped pass
      graft.ops.Classify.calibrationError(
        ev(s, d).select((col("value") / 500).as("p"),
          (col("event_type") === "purchase").cast("int").as("y")),
        col("p"), col("y"), bins = 10)),
    "q316_lift" -> ((s, d) =>
      // decile lift & gains of the raw score on purchases: ntile cuts
      // from the weighted prefix sum with the (score DESC, label ASC)
      // tie discipline that makes per-decile counts deterministic
      graft.ops.Classify.liftTable(ev(s, d), col("value"),
        (col("event_type") === "purchase").cast("long"), k = 10)),
    "q317_target_encode" -> ((s, d) => {
      // leakage-safe categorical featurization: each event's type is
      // replaced by the smoothed out-of-fold mean of a binary target —
      // folds from the content-addressed md5 assignment, so both
      // engines agree bit-for-bit
      val e = ev(s, d)
      graft.ops.Curation.targetEncode(e, col("event_id"),
        col("event_type"), (col("value") > 50).cast("long"),
        graft.ops.Curation.crossFold(col("event_id"), 5),
        smoothing = 20.0).orderBy("id")
    }),
    "q318_quantile_normalize" -> ((s, d) =>
      // cross-type score equalization: every event type's value
      // distribution maps onto the pooled one by rank interpolation —
      // per-type windows + the exploded global position table, two int
      // equi-joins, no range join
      graft.ops.Profile.quantileNormalize(ev(s, d), col("event_id"),
        col("event_type"), col("value")).orderBy("id")),
    "q319_mutual_information" -> ((s, d) =>
      // feature-relevance screen: MI and sqrt-normalized MI between
      // document language and source over the one contingency pass
      graft.ops.Experiment.mutualInformation(t(s, d, "documents"),
        col("lang"), col("source"))),
    "q320_sgns_pairs" -> ((s, d) =>
      // word2vec SGNS training table: window-2 directed pairs over the
      // minCount-gated vocab plus two deterministic unigram negatives
      // per pair via md5 spans — the segment equi-join, never a scan
      graft.ops.TextAnalysis.sgnsPairs(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("text"), window = 2, minCount = 20, negatives = 2)
        .orderBy("center", "context", "j")),
    "q321_holt_winters_mult" -> ((s, d) => {
      // the q310 series through the MULTIPLICATIVE damped-trend
      // recurrence (seasonal ratios, Gardner-McKenzie phi=0.9); the
      // oracle replays it through the same list-carrying recursive CTE
      val series = ev(s, d)
        .groupBy((col("user_id") % 3).as("k"),
          to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.holtWintersMultiplicative(series, col("k"),
          col("day"), datediff(col("day"), to_date(lit("1970-01-01"))),
          col("v"), alpha = 0.5, beta = 0.3, gamma = 0.4, period = 7,
          phi = 0.9, horizon = 2)
        .orderBy("k")
    }),
    "q322_pacf" -> ((s, d) => {
      // lag-1..5 PARTIAL autocorrelation of each type's daily volume:
      // the q295 corpus shape plus a bounded Durbin-Levinson fold on
      // the |keys| frame; the oracle unrolls the same recursion over
      // DuckDB lists
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.pacf(series,
          datediff(col("day"), to_date(lit("1970-01-01"))),
          Seq("event_type"), col("day"), col("v"), maxLag = 5)
        .orderBy("event_type", "lag")
    }),
    "q323_sprt" -> ((s, d) =>
      // sequential A/B readout: Wald's SPRT over each type's ordered
      // high-value outcomes — first Wald-bound crossing in one keyed
      // window pass, identical running doubles in both engines
      graft.ops.Experiment.sprtTest(ev(s, d), col("event_type"),
        col("ts"), col("event_id"), (col("value") > 50).cast("int"),
        p0 = 0.45, p1 = 0.55, alpha = 0.05, beta = 0.2)
        .orderBy("k")),
    "q324_ktruss" -> ((s, d) => {
      // 4-truss of the co-purchase graph: synchronous support peeling
      // to the unique fixpoint — oriented triangle enumeration per
      // round, exploded to canonical edges; the oracle peels the same
      // rounds with a common-neighbor join
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      // broadcastClosing measured SLOWER here (10.5 vs 8.5 s at sf0.1:
      // the broadcast rebuilds per peel round; the shuffle join reuses
      // its exchange) — the option stays for single-round callers
      graft.ops.Graph.kTruss(e, col("a"), col("b"), k = 4)
        .orderBy("a", "b")
    }),
    "q325_sssp" -> ((s, d) => {
      // weighted shortest paths from the q303 seed set over directed
      // co-purchase edges (weight = source line quantity): 6 synchronous
      // Bellman-Ford rounds, integer-exact distances
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"),
          col("l_quantity").as("q"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
        .select(col("x.p").as("s"), col("y.p").as("t"),
          col("x.q").as("w"))
      val src = t(s, d, "part").filter(col("p_partkey") % 997 === 0)
      graft.ops.Graph.ssspBellmanFord(e, col("s"), col("t"), col("w"),
          src, col("p_partkey"), rounds = 6)
        .orderBy("id")
    }),
    "q326_dbscan" -> ((s, d) =>
      // density clustering of the first two embedding coordinates:
      // grid-cell candidate pairs (3×3 eps cells), exact eps filter,
      // path-halving components over the core graph, min-labelled
      // borders, noise at -1
      graft.ops.Ann.dbscan(t(s, d, "embeddings"), col("vec_id"),
          element_at(col("embedding"), 1),
          element_at(col("embedding"), 2),
          eps = 0.05, minPts = 5)
        .orderBy("id")),
    "q327_rake" -> ((s, d) =>
      // per-document RAKE keyphrases: stopword-run phrase candidates,
      // deg/freq word scores, top-3 phrase types ranked on the rounded
      // score — everything rides per-doc windows and (id, token) aggs
      graft.ops.TextAnalysis.rakeKeywords(
        t(s, d, "documents").filter(col("doc_id") % 7 === 0),
        col("doc_id"), col("text"),
        stopwords = Seq("a", "the", "value", "table"),
        maxPhraseLen = 4, topK = 3).orderBy("id", "rank")),
    "q328_anova" -> ((s, d) =>
      // does mean value differ across the five event types? one-way F
      // with eta-squared — one grouped moment pass, then a 5-row frame
      graft.ops.Experiment.anovaF(ev(s, d), col("event_type"),
        col("value"))),
    "q329_bh_fdr" -> ((s, d) => {
      // multiple-testing correction across per-cohort pseudo p-values
      // within each event-type family: BH step-up via per-family rank
      // + reverse running min — no global window
      val h = ev(s, d)
        .groupBy(col("event_type").as("family"),
          (col("user_id") % 20).cast("string").as("key"))
        .agg((avg("value") / 500).as("p"))
      graft.ops.Experiment.bhFdr(h, col("family"), col("key"), col("p"))
        .orderBy("family", "rank")
    }),
    "q330_mcnemar" -> ((s, d) => {
      // paired flip test: per user, did-click vs did-purchase — only
      // the discordant pairs carry signal; one counting aggregation
      val pairs = ev(s, d).groupBy("user_id")
        .agg(max((col("event_type") === "click").cast("int")).as("x"),
          max((col("event_type") === "purchase").cast("int")).as("y"))
      graft.ops.Experiment.mcnemarTest(pairs, col("x"), col("y"))
    }),
    "q331_brown_forsythe" -> ((s, d) =>
      // variance-equality gate before trusting q328's F: absolute
      // deviations from each type's exact median, then the same
      // one-way F on the transformed units
      graft.ops.Experiment.brownForsythe(ev(s, d), col("event_type"),
        col("value"))),
    "q332_conformal" -> ((s, d) => {
      // distribution-free intervals around a per-type mean model: the
      // width is the exact conformal order statistic on the held-out
      // fifth, every scoring row gets pred ± q
      val e = ev(s, d)
      val model = e.filter(col("event_id") % 5 === 0)
        .groupBy("event_type").agg(avg("value").as("pred"))
      val scored = e.join(model, "event_type")
      graft.ops.Classify.conformalInterval(scored, col("event_id"),
          col("pred"), col("value"), col("event_id") % 5 === 0,
          alpha = 0.1)
        .orderBy("id")
    }),
    "q333_event_sequences" -> ((s, d) =>
      // frequent 3-step journeys: per-user ordered type n-grams,
      // distinct-user support + occurrences, one key shuffle
      graft.ops.Analytics.frequentEventSequences(ev(s, d),
          col("user_id"), col("event_type"), col("ts"), col("event_id"),
          n = 3, minSupport = 3)
        .orderBy("seq")),
    "q334_ips" -> ((s, d) => {
      // off-policy value of "even cohorts get click, odd get view"
      // from the logged traffic: empirical propensities per (cohort,
      // type), Horvitz-Thompson reweighting, one final aggregate
      val pol = s.range(4).select(col("id").cast("string").as("ctx"),
        when(col("id") % 2 === 0, "click").otherwise("view").as("parm"))
      graft.ops.Experiment.ipsEstimate(ev(s, d), col("user_id") % 4,
        col("event_type"), col("value"), pol, col("ctx"), col("parm"))
    }),
    "q335_moments" -> ((s, d) =>
      // per-type distribution shape: mean/variance/skew/kurt from one
      // power-sum pass with explicit central-moment identities — the
      // one definition both engines reproduce (builtin conventions
      // differ); multiplication, never libm pow
      graft.ops.Profile.momentsProfile(ev(s, d), Seq("event_type"),
        col("value")).orderBy("event_type")),
    "q336_trimmed_mean" -> ((s, d) =>
      // 10-90 trimmed mean per type: exact percentile bounds then a
      // conditional average over the broadcast bounds join
      graft.ops.Profile.trimmedMean(ev(s, d), Seq("event_type"),
        col("value"), lo = 0.1, hi = 0.9).orderBy("event_type")),
    "q337_vocab_growth" -> ((s, d) =>
      // the Heaps-law curve: cumulative types vs tokens in doc order —
      // first occurrences from one grouped min, cumulatives from the
      // range-partitioned prefix sum
      graft.ops.TextAnalysis.vocabularyGrowth(t(s, d, "documents"),
        col("doc_id"), col("text")).orderBy("id")),
    "q338_knn_classify" -> ((s, d) =>
      // leave-one-out 5-NN vote over the embedding labels: the shared
      // knnGraph edge contract + the portable two-step argmax
      graft.ops.Ann.knnClassify(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), col("label"), k = 5).orderBy("id")),
    "q339_davies_bouldin" -> ((s, d) =>
      // cluster-quality score of the label partition: per-dim centroid
      // means, broadcast scatter pass, k-row max-ratio cross
      graft.ops.Ann.daviesBouldin(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), col("label"))),
    "q340_tfidf_pairs" -> ((s, d) =>
      // lexical related-document pairs through the inverted index:
      // df-capped terms bound the posting fan-out, cosine from summed
      // weight products
      graft.ops.Keyword.tfidfSimilarityPairs(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), maxDf = 40, threshold = 0.3)
        .orderBy("a_id", "b_id")),
    "q341_assortativity" -> ((s, d) => {
      // does the co-purchase graph wire hubs to hubs? Pearson of
      // endpoint degrees over both edge orientations — exact integer
      // moments, one degree agg + one edge join
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.degreeAssortativity(e, col("a"), col("b"))
    }),
    "q342_modularity" -> ((s, d) => {
      // Newman-Girvan Q of the %7 part partition over the co-purchase
      // graph: intra-edge shares vs degree-mass expectation
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val asg = t(s, d, "part")
        .select(col("p_partkey"), (col("p_partkey") % 7).as("comm"))
      graft.ops.Graph.modularity(e, col("a"), col("b"), asg,
        col("p_partkey"), col("comm"))
    }),
    "q343_katz" -> ((s, d) => {
      // 3-hop attenuated walk counts in integer micro-units — the
      // pageRank discipline with the Katz recurrence; oracle unrolls
      // the identical integer rounds
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.ops.Graph.katzCentrality(e, col("src"), col("dst"),
          alphaPct = 10, iters = 3)
        .orderBy("id")
    }),
    "q344_betweenness" -> ((s, d) => {
      // pivot-sampled Brandes from the two smallest %997 parts, depth
      // 4: integer sigma counts forward, level-walked deltas back —
      // the broker-node centrality the other families lack
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val cand = t(s, d, "part").filter(col("p_partkey") % 997 === 0)
      // the oracle unrolls per-pivot CTEs and so must pin the pivot ids
      // as literals (0, 997). Assert the data-derived pivots are a
      // prefix of those literals — a generator change (e.g. keys
      // starting at 1) fails loudly here instead of silently diverging
      // the engines; at tiny scale only pivot 0 may exist, which is
      // fine (a pivot absent from the graph contributes nothing in
      // either engine). Bounded collect: 2 rows.
      val pivots = cand.select(col("p_partkey").cast("long"))
        .orderBy("p_partkey").limit(2).collect().map(_.getLong(0)).toSeq
      require(pivots.nonEmpty && pivots == Seq(0L, 997L).take(pivots.size),
        s"q344: oracle pins pivots (0, 997) but data yields $pivots — " +
          "regenerate betweennessOracle's literals")
      graft.ops.Graph.betweennessApprox(e, col("a"), col("b"), cand,
          col("p_partkey"), maxPivots = 2, maxDepth = 4)
        .orderBy("id")
    }),
    "q345_ppr" -> ((s, d) => {
      // random walk with restart to the %997 seed parts: integer
      // micro-unit rounds, teleport mass only on seeds
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      val seeds = t(s, d, "part").filter(col("p_partkey") % 997 === 0)
      graft.ops.Graph.personalizedPageRank(e, col("src"), col("dst"),
          seeds, col("p_partkey"), iters = 3)
        .orderBy("id")
    }),
    "q346_nelson_aalen" -> ((s, d) => {
      // the q277 subjects through the cumulative-hazard estimator —
      // sums of d/n instead of the KM product
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
            .as("obs"))
      graft.ops.Analytics.nelsonAalen(subjects, col("dur"), col("obs"))
        .orderBy("t")
    }),
    "q347_lorenz" -> ((s, d) =>
      // the value-concentration curve behind q283's gini scalar:
      // ascending ntile cuts from the weighted prefix sum, cumulative
      // shares over the 10-row frame
      graft.ops.Analytics.lorenzCurve(ev(s, d), col("value"), k = 10)),
    "q348_spearman" -> ((s, d) =>
      // monotone association between event value and user cohort:
      // Pearson over tie-averaged midranks (two prefix-sum rank
      // passes, value equi-joins back, one moment pass)
      graft.ops.Experiment.spearmanCorr(ev(s, d), col("value"),
        (col("user_id") % 100).cast("double"))),
    "q349_cohens_kappa" -> ((s, d) =>
      // chance-corrected agreement between two threshold raters of the
      // same events (value > 50 vs value > 60): one contingency pass
      graft.ops.Experiment.cohensKappa(ev(s, d),
        (col("value") > 50).cast("int"), (col("value") > 60).cast("int"))),
    "q351_kendall_tau" -> ((s, d) =>
      // concordance-based rank association on BINNED metrics (q348's
      // pair): one cell pass + the |cells|² half self-join, integer
      // products end to end
      graft.ops.Experiment.kendallTau(ev(s, d),
        floor(col("value") / 5), col("user_id") % 100)),
    "q352_chao1" -> ((s, d) =>
      // vocabulary-ceiling estimate per source: one (source, word)
      // count pass; chao1 ships unrounded (exact integer ratio)
      graft.ops.TextAnalysis.chao1Richness(t(s, d, "documents"),
          col("source"), col("text"))
        .withColumnRenamed("g", "source")
        .orderBy("source")),
    "q353_feature_screen" -> ((s, d) =>
      // one-pass info-gain screen of three candidate features against
      // the value>50 label — the corpus is read once via the melt
      graft.ops.Experiment.featureScreen(ev(s, d),
          Seq("event_type" -> col("event_type"),
            "user_decile" -> (col("user_id") % 10),
            "value_bin" -> floor(col("value") / 20)),
          col("value") > 50)
        .orderBy("feature")),
    "q354_forecast_backtest" -> ((s, d) => {
      // seasonal-naive MASE/sMAPE backtest of the q296 daily series:
      // last 7 days held out, forecast = value 7 days earlier, scale =
      // in-sample one-step naive MAE — one key shuffle
      val e = ev(s, d)
      val series = e.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(avg("value").as("v"))
        .withColumn("di",
          datediff(col("day"), to_date(lit("1970-01-01"))))
      graft.ops.Temporal.forecastBacktest(series, col("di"),
          Seq("event_type"), col("di"), col("v"), period = 7,
          horizon = 7)
        .orderBy("event_type")
    }),
    "q355_isotonic_by_key" -> ((s, d) =>
      // per-event-type monotone calibration: the q313 PAV kernel run
      // inside each key's group — no cross-key coordination
      graft.ops.Classify.isotonicCalibrateByKey(ev(s, d),
          col("event_type"), floor(col("value") / 5),
          (col("user_id") % 97 < col("value")).cast("long"))
        .orderBy("k", "bin")),
    "q356_theil_sen" -> ((s, d) => {
      // robust daily-trend slope per event type: median of pairwise
      // slopes over the bounded q296 series, explicit two-middle median
      val e = ev(s, d)
      val series = e.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(avg("value").as("v"))
        .withColumn("di",
          datediff(col("day"), to_date(lit("1970-01-01"))))
      graft.ops.Temporal.theilSenTrend(series, col("di"),
          Seq("event_type"), col("di"), col("v"), maxPoints = 60)
        .orderBy("event_type")
    }),
    "q357_gapped_sequences" -> ((s, d) =>
      // gap-allowed 2/3-item behavior patterns over each user's first
      // 12 events: bounded positional self-joins, support = users
      graft.ops.Analytics.gappedSequences(ev(s, d), col("user_id"),
          col("event_type"), col("ts"), col("event_id"),
          maxEventsPerKey = 12, minSupport = 10)
        .orderBy("len", "seq")),
    "q358_bootstrap_ci" -> ((s, d) =>
      // md5-deterministic Poisson bootstrap of the mean event value:
      // the fan-out ships (v, replicate) pairs only and partial-aggs
      // to 200 replicate rows; CI = nearest-rank order statistics
      graft.ops.Experiment.bootstrapMeanCI(ev(s, d), col("event_id"),
        col("value"), nBoot = 200, alpha = 0.05)),
    "q359_bleu_pairs" -> ((s, d) => {
      // BLEU-2 over the q43 LSH candidate pairs: n-gram-precision
      // similarity (order + multiplicity) where Jaccard sees only
      // sets — row-local scoring on the bounded candidate frame
      val docs = t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .filter(col("doc_id") < 200)
      val pairs = graft.ops.Dedup.lshCandidatePairs(docs, col("doc_id"),
        col("text"), shingleSize = 1)
      val withTexts = pairs
        .join(docs.select(col("doc_id").as("a_id"),
          col("text").as("ta")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"),
          col("text").as("tb")), "b_id")
      graft.ops.TextAnalysis.bleuPairs(withTexts, col("a_id"),
          col("b_id"), col("ta"), col("tb"))
        .orderBy("a_id", "b_id")
    }),
    "q360_bootstrap_diff" -> ((s, d) =>
      // distribution-free A/B readout: Poisson-bootstrap CI for the
      // click-vs-view mean-value difference — same B-row partial-agg
      // shape as q358, both arms drawn from one md5 stream
      graft.ops.Experiment.bootstrapDiffCI(ev(s, d), col("event_id"),
        col("event_type"), col("value"), armA = "click", armB = "view",
        nBoot = 200, alpha = 0.05)),
    "q361_louvain" -> ((s, d) => {
      // deterministic one-level Louvain over the q298 co-purchase
      // graph: integer modularity-gain scores, parity-scheduled
      // synchronous moves, 3 fixed rounds — the oracle unrolls them
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.louvainOneLevel(e, col("a"), col("b"), rounds = 3)
        .orderBy("id")
    }),
    "q362_louvain_two_level" -> ((s, d) => {
      // the full multi-level step: level-1 communities contract to a
      // weighted super-graph (intra mass → self-loops, m invariant)
      // and the WEIGHTED one-level pass coarsens further; members map
      // through both assignments
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read twice: level 1 + contract
      val l1 = graft.ops.Graph.louvainOneLevel(simple, col("a"),
        col("b"), rounds = 3)
      val contracted = graft.ops.Graph.louvainContract(simple, col("a"),
        col("b"), l1, col("id"), col("community"))
      val l2 = graft.ops.Graph.louvainOneLevelWeighted(contracted,
        col("a"), col("b"), col("w"), rounds = 3)
      l1.select(col("id"), col("community").as("c1"))
        .join(l2.select(col("id").as("c1"),
          col("community").as("community")), "c1")
        .select(col("id"), col("c1"), col("community"))
        .orderBy("id")
    })
  )

  /** The q298 oracle: `rounds` unrolled peel passes of the k-core
    * (SQL has no fixpoint loop — the [[removalEffectOracle]] stance).
    * Each CTE pair computes surviving nodes (induced degree ≥ k) and
    * the induced edge set; `rounds` must exceed the rounds-to-fixpoint
    * at verification scale (a converged round is idempotent, so extra
    * rounds are harmless). */
  private def kCoreOracle(k: Int, rounds: Int): String = {
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
  private def katzOracle(alphaPct: Int, iters: Int): String = {
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
  private def betweennessOracle(pivots: Seq[Long], depth: Int): String = {
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
  private def louvainRoundCtes(p: String, adj: String, deg: String,
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
  private def louvainLevel1Ctes(rounds: Int): String =
    s"""li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
             WHERE l_orderkey % 3 = 0),
       e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
              FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
       adj AS (SELECT a AS s, b AS t FROM e0
               UNION ALL SELECT b, a FROM e0),
       m AS (SELECT count(*) AS m FROM e0),
       deg AS (SELECT s AS id, count(*) AS deg FROM adj GROUP BY s),
       c0 AS (SELECT id, id AS c FROM deg),
       ${louvainRoundCtes("", "adj", "deg", "m", rounds,
         weighted = false)}"""

  private def louvainOracle(rounds: Int): String =
    s"""WITH ${louvainLevel1Ctes(rounds)}
       SELECT id, c AS community FROM c$rounds ORDER BY id"""

  /** The q362 oracle: level 1, community contraction (inter-edges →
    * weighted super-edges, intra-edges → self-loops; m invariant),
    * then the WEIGHTED round chain, members mapped through both
    * assignments. */
  private def louvainTwoLevelOracle(r1: Int, r2: Int): String =
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

  /** The q324 oracle: `rounds` unrolled k-truss peel passes — per-edge
    * support as a common-neighbor join over the adjacency (the
    * [[kCoreOracle]] stance: rounds must exceed rounds-to-fixpoint at
    * verification scale; converged rounds are idempotent since the
    * truss is the unique maximal subgraph). Edges without triangles
    * vanish from the support frame, which IS the drop for k ≥ 3. */
  private def kTrussOracle(k: Int, rounds: Int): String = {
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
  private def ssspOracle(rounds: Int): String = {
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
  private def dbscanOracle(eps: Double, minPts: Int,
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
  private def bfsOracle(rounds: Int): String = {
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
    * per iteration. */
  private def hitsOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""ar$i AS (SELECT e.dst, sum(h.h) AS ar FROM e
             JOIN hs${i - 1} h ON h.id = e.src GROUP BY e.dst),
         am$i AS (SELECT max(ar) AS am FROM ar$i),
         aa$i AS (SELECT n.id,
             CAST(coalesce(s.ar * 1000000 // t.am, 0) AS BIGINT) AS a
           FROM nodes n LEFT JOIN ar$i s ON n.id = s.dst CROSS JOIN am$i t),
         hr$i AS (SELECT e.src, sum(a.a) AS hr FROM e
             JOIN aa$i a ON a.id = e.dst GROUP BY e.src),
         hm$i AS (SELECT max(hr) AS hm FROM hr$i),
         hs$i AS (SELECT n.id,
             CAST(coalesce(s.hr * 1000000 // t.hm, 0) AS BIGINT) AS h,
             a.a AS a
           FROM nodes n LEFT JOIN hr$i s ON n.id = s.src
           JOIN aa$i a ON a.id = n.id CROSS JOIN hm$i t)"""
    }.mkString(",\n         ")
    s"""WITH e AS (SELECT DISTINCT l_suppkey + 1000000000 AS src,
               l_partkey AS dst
             FROM lineitem WHERE l_suppkey + 1000000000 <> l_partkey),
         nodes AS (SELECT DISTINCT id FROM (
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
  private def textrankOracle(iters: Int): String = {
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
  private def pcaOracle(dim: Int, sweeps: Int): String = {
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
  private def labelPropOracle(iters: Int): String = {
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
  private def piiDecorated(docs: DataFrame): DataFrame = {
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
  val oracle: Map[String, String] = Map(
    "q42_dedup_exact" ->
      """SELECT sha256(substr(text, 1, 40)) AS h, count(*) AS n, min(doc_id) AS keep
         FROM documents GROUP BY h HAVING count(*) > 1 ORDER BY h""",
    "q44_dedup_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, list_filter(list_distinct(string_split_regex(text, '\s+')), x -> x <> '') AS tk
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

    "q114_containment" ->
      // band/cand/sets CTEs shared with q43's recipe; verification is the
      // one-sided intersect-over-own-size ratio, both directions
      s"""WITH ${PortableSql.minhashVerifiedPairCtes},
         cp AS (SELECT c.a_id, c.b_id,
                       round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                             / len(a.tk), 4) AS a_in_b,
                       round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                             / len(b.tk), 4) AS b_in_a
                FROM cand c JOIN sets a ON c.a_id = a.doc_id
                            JOIN sets b ON c.b_id = b.doc_id)
         SELECT a_id, b_id, a_in_b, b_in_a FROM cp
         WHERE greatest(a_in_b, b_in_a) >= 0.9
         ORDER BY a_id, b_id""",

    "q113_dedup_eval" ->
      s"""WITH ${PortableSql.minhashVerifiedPairCtes},
         ep AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                FROM sets a JOIN sets b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.7),
         tpc AS (SELECT count(*) AS tp FROM vp
                 JOIN ep ON vp.a_id = ep.a_id AND vp.b_id = ep.b_id),
         na AS (SELECT count(*) AS n_approx FROM vp),
         ne AS (SELECT count(*) AS n_exact FROM ep)
         SELECT CAST(tp AS BIGINT) AS tp,
                CAST(n_approx AS BIGINT) AS n_approx,
                CAST(n_exact AS BIGINT) AS n_exact,
                round(tp / CAST(n_approx AS DOUBLE), 4) AS prec,
                round(tp / CAST(n_exact AS DOUBLE), 4) AS recall
         FROM tpc CROSS JOIN na CROSS JOIN ne""",

    "q96_line_dedup" ->
      // re-line into 4-token lines, drop lines repeated across >= 3 docs,
      // rebuild; md5 of the rebuilt text keeps the payload small
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         wrapped AS (
           SELECT doc_id, CASE WHEN len(t) = 0 THEN ''
                  ELSE array_to_string([array_to_string(t[(i*4+1):(i*4+4)], ' ')
                                        FOR i IN range(0, CAST(ceil(len(t)/4.0) AS INT))], chr(10)) END AS wtext
           FROM toks),
         ls AS (SELECT doc_id, string_split(wtext, chr(10)) AS ll FROM wrapped),
         lines AS (SELECT doc_id, unnest(ll) AS line, generate_subscripts(ll, 1) AS pos FROM ls),
         freq AS (SELECT line FROM lines WHERE trim(line) <> ''
                  GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
         flagged AS (SELECT l.doc_id, l.pos, l.line, (f.line IS NOT NULL) AS dup
                     FROM lines l LEFT JOIN freq f ON l.line = f.line)
         SELECT doc_id,
                CAST(sum(CASE WHEN NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                md5(coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10) ORDER BY pos), '')) AS text_md5
         FROM flagged GROUP BY doc_id ORDER BY doc_id""",

    "q138_decontaminate" ->
      // q70's shared-gram counts; survivors have < 2 shared grams
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
                 i -> tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3])) AS g3
               FROM toks WHERE len(tk) >= 3),
         bench AS (SELECT DISTINCT g3 FROM g WHERE doc_id < 5),
         shared AS (SELECT g.doc_id, count(DISTINCT g.g3) AS n_shared
                    FROM g JOIN bench USING (g3) WHERE g.doc_id >= 5
                    GROUP BY g.doc_id)
         SELECT d.doc_id, d.lang, d.n_chars
         FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
         WHERE d.doc_id >= 5 AND coalesce(s.n_shared, 0) < 2
         ORDER BY d.doc_id""",

    "q139_nb_model" ->
      // the same sufficient statistics: (label, term) counts, per-label
      // token totals, corpus vocab size, add-one smoothing
      """WITH toks AS (
           SELECT lang AS label, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         c AS (SELECT label, term, count(*) AS c
               FROM (SELECT label, unnest(tk) AS term FROM toks) GROUP BY 1, 2),
         nl AS (SELECT label, CAST(sum(c) AS DOUBLE) AS n_l FROM c GROUP BY 1),
         vv AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v FROM c)
         SELECT c.label, c.term, round(ln((c.c + 1.0) / (nl.n_l + vv.v)), 4) AS logp
         FROM c JOIN nl USING (label) CROSS JOIN vv
         ORDER BY label, term LIMIT 400""",

    "q140_nb_predict" ->
      // per-token smoothed log-probs summed per (doc, label) + log prior;
      // token-less docs score on the prior alone; argmax at 4dp, ties ->
      // alphabetically first label
      """WITH toks AS (
           SELECT doc_id, lang, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         c AS (SELECT label, term, count(*) AS c
               FROM (SELECT lang AS label, unnest(tk) AS term FROM toks) GROUP BY 1, 2),
         nl AS (SELECT label, CAST(sum(c) AS DOUBLE) AS n_l FROM c GROUP BY 1),
         vv AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v FROM c),
         pr AS (SELECT lang AS label,
                  ln(count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE)) AS lp
                FROM documents GROUP BY 1),
         dt AS (SELECT doc_id, unnest(tk) AS term FROM toks),
         sc AS (SELECT dt.doc_id, nl.label,
                  sum(ln((coalesce(c.c, 0) + 1.0) / (nl.n_l + vv.v))) AS s
                FROM dt CROSS JOIN nl CROSS JOIN vv
                LEFT JOIN c ON c.term = dt.term AND c.label = nl.label
                GROUP BY 1, 2),
         tot AS (SELECT d.doc_id, pr.label, pr.lp + coalesce(sc.s, 0.0) AS t
                 FROM documents d CROSS JOIN pr
                 LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.label = pr.label),
         r AS (SELECT doc_id, label, round(t, 4) AS score,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY round(t, 4) DESC, label) AS rn
               FROM tot)
         SELECT doc_id, label AS pred, score FROM r WHERE rn = 1 ORDER BY doc_id""",

    "q141_range_shards" ->
      // ntile of the exact global rank — what the two-pass prefix sum
      // computes without an unpartitioned window
      """WITH r AS (
           SELECT doc_id, n_chars,
                  ntile(16) OVER (ORDER BY n_chars, doc_id) AS sh
           FROM documents)
         SELECT sh - 1 AS shard, count(*) AS n_rows,
                min(n_chars) AS min_key, max(n_chars) AS max_key
         FROM r GROUP BY 1 ORDER BY 1""",

    "q142_langid_calibration" ->
      // q49's marker-hit scores + relative margin (top1-top2)/top1,
      // bucketed at 4dp-rounded margins; ties at the top -> margin 0
      """WITH h AS (
           SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         c AS (
           SELECT doc_id, lang,
             len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','with'], x))) AS en,
             len(list_filter(tk, x -> list_contains(['el','la','de','que','y','los','las','por'], x))) AS es,
             len(list_filter(tk, x -> list_contains(['le','la','les','des','est','une','dans','pour'], x))) AS fr,
             len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) AS de
           FROM h),
         p AS (
           SELECT doc_id, lang,
             CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                  WHEN en = greatest(en, es, fr, de) THEN 'en'
                  WHEN es = greatest(en, es, fr, de) THEN 'es'
                  WHEN fr = greatest(en, es, fr, de) THEN 'fr'
                  ELSE 'de' END AS pred,
             list_reverse_sort([en, es, fr, de]) AS s
           FROM c),
         m AS (
           SELECT doc_id, lang, pred,
             CASE WHEN s[1] > 0 THEN round((s[1] - s[2]) / CAST(s[1] AS DOUBLE), 4)
                  ELSE 0.0 END AS margin
           FROM p),
         b AS (
           SELECT least(CAST(floor(margin * 4) AS INT), 3) AS bucket,
                  CASE WHEN pred = lang THEN 1 ELSE 0 END AS agree
           FROM m)
         SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
                CAST(sum(agree) AS BIGINT) AS n_agree,
                round(sum(agree) / CAST(count(*) AS DOUBLE), 4) AS agree_rate
         FROM b GROUP BY 1 ORDER BY 1""",

    "q143_cdc_dedup" ->
      // same boundary rule: cut after 1-based token i (w <= i < n) when
      // hex15 of the 2-token window divides by 8; chunk hash = hex15(text)
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         t AS (SELECT doc_id, tk FROM toks WHERE len(tk) > 0),
         p AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS i, tk FROM t),
         f AS (SELECT doc_id, i, tk[i] AS tok,
                 CASE WHEN i >= 2 AND i < len(tk)
                       AND CAST('0x' || substr(md5(tk[i - 1] || ' ' || tk[i]), 1, 15)
                             AS BIGINT) % 8 = 0
                      THEN 1 ELSE 0 END AS b
               FROM p),
         c AS (SELECT doc_id, i, tok,
                 coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_no
               FROM f),
         ch AS (SELECT doc_id, chunk_no,
                  CAST('0x' || substr(md5(string_agg(tok, ' ' ORDER BY i)), 1, 15)
                    AS BIGINT) AS h
                FROM c GROUP BY 1, 2),
         nd AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ch GROUP BY h)
         SELECT ch.doc_id, count(*) AS n_chunks,
                round(sum(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END)
                  / CAST(count(*) AS DOUBLE), 4) AS dup_frac
         FROM ch JOIN nd USING (h)
         GROUP BY 1 ORDER BY 1""",

    "q144_longest_shared_span" ->
      // the classic diagonal gaps-and-islands LCS: token matches across
      // doc pairs grouped by diagonal (ai - bi); consecutive ai within a
      // diagonal form a shared run; the max run length wins, smallest
      // (a_id, b_id) pair breaks ties
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         p AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS i, tk FROM toks),
         q AS (SELECT doc_id, i, tk[i] AS tok FROM p),
         m AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.i AS ai, b.i AS bi
               FROM q a JOIN q b ON a.tok = b.tok AND a.doc_id < b.doc_id),
         isl AS (SELECT a_id, b_id, ai - bi AS diag,
                   ai - row_number() OVER (PARTITION BY a_id, b_id, ai - bi
                     ORDER BY ai) AS grp
                 FROM m),
         runs AS (SELECT a_id, b_id, count(*) AS len
                  FROM isl GROUP BY a_id, b_id, diag, grp),
         best AS (SELECT max(len) AS len FROM runs)
         SELECT CAST(best.len AS BIGINT) AS len, r.a_id, r.b_id
         FROM best JOIN runs r ON r.len = best.len
         ORDER BY r.a_id, r.b_id LIMIT 1""",

    "q145_datasheet" ->
      """WITH base AS (
           SELECT md5(text) AS h, CAST(n_chars AS DOUBLE) AS nc,
                  len(list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '')) AS nt
           FROM documents),
         ty AS (SELECT count(DISTINCT w) AS n_types FROM (
                  SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '')) AS w FROM documents))
         SELECT count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
                ty.n_types,
                round(1.0 - count(DISTINCT h) / CAST(count(*) AS DOUBLE), 4)
                  AS pct_dup_docs,
                round(avg(nc), 4) AS mean_chars,
                round(quantile_cont(nc, 0.5), 4) AS p50_chars
         FROM base CROSS JOIN ty GROUP BY ty.n_types""",

    "q146_elbow_curve" -> {
      // three side-by-side re-trainings (prefixed CTE chains), each
      // scored by mean cosine distance to the assigned centroid
      def one(p: String, k: Int) =
        s"""SELECT CAST($k AS BIGINT) AS k, count(*) AS n,
              round(avg(1 - (${PortableSql.cosSql(s"${p}bf.v", s"${p}c2.c")})), 4)
                AS mean_dist
            FROM ${p}bf JOIN ${p}c2 ON ${p}bf.cid = ${p}c2.cid"""
      s"""WITH ${PortableSql.ivfTrainCtes("e4", 4)},
         ${PortableSql.ivfTrainCtes("e8", 8)},
         ${PortableSql.ivfTrainCtes("e16", 16)}
         SELECT * FROM (${one("e4", 4)} UNION ALL ${one("e8", 8)}
                        UNION ALL ${one("e16", 16)})
         ORDER BY k"""
    },

    "q147_cdc_scrub_against" ->
      // q143's chunk chain keeping chunk text; dup = blocks in >= 2 old
      // docs; survivors re-join by chunk order
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         t AS (SELECT doc_id, tk FROM toks WHERE len(tk) > 0),
         p AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS i, tk FROM t),
         f AS (SELECT doc_id, i, tk[i] AS tok,
                 CASE WHEN i >= 2 AND i < len(tk)
                       AND CAST('0x' || substr(md5(tk[i - 1] || ' ' || tk[i]), 1, 15)
                             AS BIGINT) % 8 = 0
                      THEN 1 ELSE 0 END AS b
               FROM p),
         c AS (SELECT doc_id, i, tok,
                 coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_no
               FROM f),
         ch AS (SELECT doc_id, chunk_no, string_agg(tok, ' ' ORDER BY i) AS ct
                FROM c GROUP BY 1, 2),
         chh AS (SELECT doc_id, chunk_no, ct,
                   CAST('0x' || substr(md5(ct), 1, 15) AS BIGINT) AS h
                 FROM ch),
         dup AS (SELECT h FROM (
                   SELECT h, count(DISTINCT doc_id) AS nd
                   FROM chh WHERE doc_id < 250 GROUP BY h) WHERE nd >= 2),
         scrub AS (
           SELECT doc_id, count(*) AS n_chunks,
                  CAST(sum(CASE WHEN h IN (SELECT h FROM dup) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
                  md5(coalesce(string_agg(
                    CASE WHEN h NOT IN (SELECT h FROM dup) THEN ct END,
                    ' ' ORDER BY chunk_no), '')) AS text_md5
           FROM chh WHERE doc_id >= 250 GROUP BY doc_id)
         -- token-less documents pass through as (0, 0, md5('')) like the
         -- Spark scrubber
         SELECT d.doc_id, coalesce(s.n_chunks, 0) AS n_chunks,
                coalesce(s.n_removed, 0) AS n_removed,
                coalesce(s.text_md5, md5('')) AS text_md5
         FROM documents d LEFT JOIN scrub s USING (doc_id)
         WHERE d.doc_id >= 250 ORDER BY d.doc_id""",

    "q148_heavy_hitters_sketch" ->
      // exact top terms — what the sketch must equal above the
      // no-decrement capacity threshold
      """SELECT w AS term, count(*) AS c
         FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> x <> '')) AS w
               FROM documents)
         GROUP BY w ORDER BY c DESC, term LIMIT 15""",

    "q149_knn_graph_recall" ->
      // same re-training (g-prefixed CTEs), exact graph from the full
      // cross pairs, approx graph from same-cid pairs, edge recall
      s"""WITH ${PortableSql.ivfTrainCtes("g", 8)},
         px AS (SELECT a.id AS qid, b.id AS nbr,
                  round(${PortableSql.cosSql("a.v", "b.v")}, 4) AS sim
                FROM gv a JOIN gv b ON a.id <> b.id),
         ex AS (SELECT qid, nbr FROM (
                  SELECT qid, nbr, row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, nbr) AS rn FROM px) WHERE rn <= 3),
         pa AS (SELECT a.id AS qid, b.id AS nbr,
                  round(${PortableSql.cosSql("a.v", "b.v")}, 4) AS sim
                FROM gbf a JOIN gbf b ON a.cid = b.cid AND a.id <> b.id),
         ap AS (SELECT qid, nbr FROM (
                  SELECT qid, nbr, row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, nbr) AS rn FROM pa) WHERE rn <= 3),
         e AS (SELECT count(*) AS n_edges FROM ex),
         m AS (SELECT count(*) AS n_matched FROM ex JOIN ap USING (qid, nbr))
         SELECT e.n_edges, m.n_matched,
                round(m.n_matched / CAST(e.n_edges AS DOUBLE), 4) AS recall
         FROM e CROSS JOIN m""",

    "q150_covariance" ->
      """WITH v AS (
           SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
         SELECT i, j, round(covar_samp(v[i + 1], v[j + 1]), 6) + 0.0 AS cov
         FROM v CROSS JOIN range(64) r(i) CROSS JOIN range(64) s(j)
         WHERE i <= j
         GROUP BY i, j ORDER BY i, j""",

    "q151_kneser_ney" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         big AS (SELECT doc_id, tk[i + 1] AS a, tk[i + 2] AS b
                 FROM (SELECT doc_id, tk, unnest(range(len(tk) - 1)) AS i
                       FROM toks WHERE len(tk) >= 2)),
         cb AS (SELECT a, b, count(*) AS cb FROM big GROUP BY 1, 2),
         ctx AS (SELECT a, CAST(sum(cb) AS DOUBLE) AS ctx,
                        count(*) AS n1p FROM cb GROUP BY a),
         cont AS (SELECT b, count(*) AS nprec FROM cb GROUP BY b),
         ty AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM cb)
         SELECT big.doc_id, count(*) AS n_big,
                round(avg(ln(greatest(cb.cb - 0.75, 0.0) / ctx.ctx
                    + 0.75 * ctx.n1p / ctx.ctx * (cont.nprec / ty.t))), 4)
                  AS avg_lp
         FROM big JOIN cb USING (a, b) JOIN ctx USING (a)
              JOIN cont USING (b) CROSS JOIN ty
         GROUP BY big.doc_id ORDER BY doc_id""",

    "q152_suffix_ranks" ->
      // direct construction: sort every suffix's separator-joined string
      // (chr(1) sorts below every token byte, so string order == token-
      // sequence order with end-of-doc first); dense_rank for ties
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 5 = 0),
         p AS (SELECT doc_id, unnest(range(len(tk))) AS pos, tk FROM toks),
         suf AS (SELECT doc_id, pos,
                   array_to_string(tk[pos + 1:], chr(1)) AS s
                 FROM p),
         r AS (SELECT doc_id, pos,
                 dense_rank() OVER (ORDER BY s) - 1 AS rank
               FROM suf)
         SELECT doc_id, CAST(pos AS INT) AS pos, rank
         FROM r ORDER BY doc_id, pos""",

    "q153_longest_repeat" ->
      // direct construction: suffixes in (string, doc, pos) order,
      // neighbor LCP via first-mismatch position, max + smallest witness
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 5 = 0),
         p AS (SELECT doc_id, unnest(range(len(tk))) AS pos, tk FROM toks),
         suf AS (SELECT doc_id, pos, tk[pos + 1:] AS sl FROM p),
         ord AS (SELECT doc_id, pos, sl,
                   row_number() OVER (ORDER BY array_to_string(sl, chr(1)),
                     doc_id, pos) AS idx
                 FROM suf),
         pairs AS (SELECT a.doc_id AS a_id, a.pos AS a_pos,
                     b.doc_id AS b_id, b.pos AS b_pos, a.sl AS sa, b.sl AS sb
                   FROM ord a JOIN ord b ON b.idx = a.idx + 1),
         l AS (SELECT a_id, a_pos, b_id, b_pos,
                 coalesce(list_position(list_transform(
                     range(least(len(sa), len(sb))),
                     i -> sa[i + 1] = sb[i + 1]), false) - 1,
                   least(len(sa), len(sb))) AS len
               FROM pairs),
         best AS (SELECT max(len) AS len FROM l)
         SELECT CAST(best.len AS BIGINT) AS len, l.a_id,
                CAST(l.a_pos AS INT) AS a_pos, l.b_id,
                CAST(l.b_pos AS INT) AS b_pos
         FROM best JOIN l ON l.len = best.len
         ORDER BY l.a_id, l.a_pos, l.b_id, l.b_pos LIMIT 1""",

    "q154_drift_psi" ->
      // same md5 buckets, add-one smoothing on both shares; 512 smoothed
      // terms sum well inside the 6dp round
      """WITH rt AS (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
                     FROM documents WHERE doc_id < 250),
         ct AS (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
                FROM documents WHERE doc_id >= 250),
         rb AS (SELECT CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 512 AS b,
                       count(*) AS cr FROM rt GROUP BY 1),
         cb AS (SELECT CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 512 AS b,
                       count(*) AS cq FROM ct GROUP BY 1),
         j AS (SELECT coalesce(rb.b, cb.b) AS b, coalesce(cr, 0) AS cr,
                      coalesce(cq, 0) AS cq
               FROM rb FULL JOIN cb ON rb.b = cb.b),
         t AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
                      CAST(sum(cq) AS BIGINT) AS nq FROM j)
         SELECT t.nr AS n_ref, t.nq AS n_cand,
                round(sum(((j.cr + 1) / CAST(t.nr + 512 AS DOUBLE)
                           - (j.cq + 1) / CAST(t.nq + 512 AS DOUBLE))
                    * ln(((j.cr + 1) / CAST(t.nr + 512 AS DOUBLE))
                         / ((j.cq + 1) / CAST(t.nq + 512 AS DOUBLE)))), 6) AS psi
         FROM j CROSS JOIN t GROUP BY t.nr, t.nq""",

    "q155_prefix_jaccard" ->
      // brute-force all-pairs distinct-token Jaccard on the same range
      """WITH s AS (
           SELECT doc_id,
                  list_sort(list_distinct(list_filter(
                    string_split_regex(trim(text), '\s+'), x -> x <> ''))) AS ts
           FROM documents WHERE doc_id < 200),
         s2 AS (SELECT doc_id, ts FROM s WHERE len(ts) > 0),
         p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 round(len(list_intersect(a.ts, b.ts)) /
                   CAST(len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))
                     AS DOUBLE), 4) AS jaccard
               FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id)
         SELECT a_id, b_id, jaccard FROM p
         WHERE jaccard >= 0.85 ORDER BY a_id, b_id""",

    "q156_c4_clean" ->
      // same re-line + even-line punctuation fixture, then the C4 rules:
      // terminal punct AND >= 4 words AND no badword per line; doc flag
      // from the marker word anywhere in the doc
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
           FROM documents),
         wrapped AS (
           SELECT doc_id, CASE WHEN len(tk) = 0 THEN ''
                  ELSE array_to_string([array_to_string(tk[(i*4+1):(i*4+4)], ' ')
                                        FOR i IN range(0, CAST(ceil(len(tk)/4.0) AS INT))], chr(10)) END AS wtext
           FROM toks),
         ls AS (SELECT doc_id, string_split(wtext, chr(10)) AS ll FROM wrapped),
         punct AS (SELECT doc_id, list_transform(range(len(ll)), i ->
                     CASE WHEN i % 2 = 0 AND len(ll[i+1]) > 0
                          THEN ll[i+1] || '.' ELSE ll[i+1] END) AS ll FROM ls),
         lines AS (SELECT doc_id, unnest(ll) AS line,
                          generate_subscripts(ll, 1) AS pos FROM punct),
         flag AS (SELECT doc_id, pos, line,
                    (regexp_matches(line, '[.!?"]\s*$')
                     AND len(list_filter(string_split_regex(trim(line), '\s+'), x -> x <> '')) >= 4
                     AND NOT regexp_matches(line, '(?i)spark')) AS ok
                  FROM lines),
         docflag AS (SELECT doc_id, NOT bool_or(regexp_matches(line, '(?i)vector')) AS doc_ok
                     FROM lines GROUP BY doc_id)
         SELECT f.doc_id,
                CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                any_value(d.doc_ok) AS doc_ok,
                md5(coalesce(string_agg(CASE WHEN ok THEN line END, chr(10) ORDER BY pos), '')) AS text_md5
         FROM flag f JOIN docflag d USING (doc_id)
         GROUP BY f.doc_id ORDER BY doc_id""",

    "q157_blocklist" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         h AS (SELECT doc_id, len(tk) AS n,
                      len(list_filter(tk, x -> list_contains(['spark', 'window', 'stream'], x))) AS hits
               FROM toks)
         SELECT doc_id, CAST(hits AS BIGINT) AS n_hits,
                CASE WHEN n = 0 THEN 0.0
                     ELSE round(hits / CAST(n AS DOUBLE), 4) END AS hit_ratio
         FROM h ORDER BY doc_id""",

    "q158_unigram_vocab" ->
      // re-train from scratch: positional substrings of each word (len
      // 1..4, multiplicity counts) weighted by word frequency; top-60 by
      // (cnt desc, piece) with cnt >= 2, union all single chars; integer
      // milli-nat scores normalized over the selected vocab
      """WITH toks AS (
           SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         wocc AS (SELECT unnest(tk) AS w FROM toks),
         wcnt AS (SELECT w, count(*) AS c FROM wocc GROUP BY w),
         cand AS (SELECT unnest(flatten(list_transform(range(len(w)), i ->
                    list_transform(range(1, 1 + least(4, len(w) - i)),
                      L -> substr(w, CAST(i + 1 AS INT), CAST(L AS INT)))))) AS piece, c
                  FROM wcnt),
         cc AS (SELECT piece, CAST(sum(c) AS BIGINT) AS cnt FROM cand GROUP BY piece),
         top AS (SELECT piece, cnt FROM (
                   SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rnk
                   FROM cc WHERE cnt >= 2) WHERE rnk <= 60),
         sel AS (SELECT piece, cnt FROM top
                 UNION SELECT piece, cnt FROM cc WHERE len(piece) = 1),
         tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS s FROM sel)
         SELECT piece, cnt, CAST(floor(1000 * ln(cnt / s)) AS BIGINT) AS score_milli
         FROM sel, tot ORDER BY cnt DESC, piece""",

    "q159_unigram_segment" ->
      // the full pipeline in SQL: q158's vocab, then EVERY composition of
      // each distinct word into vocab pieces via a recursive CTE, argmax
      // per word on (score desc, fewer pieces, lexicographic seg) —
      // exactly the Viterbi tie-break contract — then per-doc reassembly.
      // NB: inside WITH RECURSIVE DuckDB stops deduplicating a plain
      // UNION in a non-recursive CTE (it parses as anchor/recursive
      // structure), so `sel` must spell DISTINCT over UNION ALL — the
      // bare-UNION form silently double-counts top∩singles in `tot`
      """WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         wocc AS (SELECT unnest(tk) AS w FROM toks),
         wcnt AS (SELECT w, count(*) AS c FROM wocc GROUP BY w),
         cand AS (SELECT unnest(flatten(list_transform(range(len(w)), i ->
                    list_transform(range(1, 1 + least(4, len(w) - i)),
                      L -> substr(w, CAST(i + 1 AS INT), CAST(L AS INT)))))) AS piece, c
                  FROM wcnt),
         cc AS (SELECT piece, CAST(sum(c) AS BIGINT) AS cnt FROM cand GROUP BY piece),
         top AS (SELECT piece, cnt FROM (
                   SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rnk
                   FROM cc WHERE cnt >= 2) WHERE rnk <= 60),
         sel AS (SELECT DISTINCT piece, cnt FROM (
                   SELECT piece, cnt FROM top
                   UNION ALL SELECT piece, cnt FROM cc WHERE len(piece) = 1)),
         tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS s FROM sel),
         vocab AS (SELECT piece, CAST(floor(1000 * ln(cnt / s)) AS BIGINT) AS score
                   FROM sel, tot),
         paths(w, pos, score, np, seg) AS (
           SELECT w, 0, CAST(0 AS BIGINT), 0, '' FROM (SELECT DISTINCT w FROM wcnt)
           UNION ALL
           SELECT p.w, p.pos + len(v.piece), p.score + v.score, p.np + 1,
                  CASE WHEN p.seg = '' THEN v.piece
                       ELSE p.seg || ' ' || v.piece END
           FROM paths p JOIN vocab v
             ON v.piece = substr(p.w, p.pos + 1, len(v.piece))
           WHERE p.pos < len(p.w)),
         best AS (SELECT w, np, seg FROM (
                    SELECT w, np, seg, row_number() OVER (
                      PARTITION BY w ORDER BY score DESC, np, seg) AS rn
                    FROM paths WHERE pos = len(w)) WHERE rn = 1),
         wordseq AS (SELECT doc_id, unnest(tk) AS w,
                            generate_subscripts(tk, 1) AS ord FROM toks),
         perdoc AS (SELECT ws.doc_id,
                      CAST(count(*) AS BIGINT) AS n_words,
                      CAST(sum(b.np) AS BIGINT) AS n_pieces,
                      round(sum(b.np) / CAST(count(*) AS DOUBLE), 4) AS fertility,
                      md5(string_agg(b.seg, ' / ' ORDER BY ord)) AS seg_md5
                    FROM wordseq ws JOIN best b USING (w)
                    GROUP BY ws.doc_id)
         SELECT d.doc_id,
                coalesce(p.n_words, CAST(0 AS BIGINT)) AS n_words,
                coalesce(p.n_pieces, CAST(0 AS BIGINT)) AS n_pieces,
                coalesce(p.fertility, 0.0) AS fertility,
                coalesce(p.seg_md5, md5('')) AS seg_md5
         FROM documents d LEFT JOIN perdoc p USING (doc_id)
         ORDER BY d.doc_id""",

    "q136_exact_sample" ->
      """SELECT * FROM (
           SELECT doc_id, lang, source FROM documents
           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
                    doc_id
           LIMIT 40)
         ORDER BY doc_id""",

    "q137_vocab_coverage" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
           FROM documents),
         cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
         rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk,
                       sum(c) OVER (ORDER BY c DESC, tok
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM cnt),
         tot AS (SELECT sum(c) AS total FROM cnt),
         sz(vocab_size) AS (VALUES (100), (1000), (5000))
         SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
                CAST(coalesce(max(CASE WHEN rnk <= vocab_size THEN rnk END), 0) AS BIGINT) AS n_types,
                CAST(coalesce(max(CASE WHEN rnk <= vocab_size THEN cum END), 0) AS BIGINT) AS covered,
                CAST(max(tot.total) AS BIGINT) AS total,
                round(coalesce(max(CASE WHEN rnk <= vocab_size THEN cum END), 0)
                      / CAST(max(tot.total) AS DOUBLE), 4) AS coverage
         FROM sz CROSS JOIN rk CROSS JOIN tot
         GROUP BY vocab_size ORDER BY vocab_size""",

    "q135_within_doc_dedup" ->
      // 2-token wrapping; keep pos = min(pos) per (doc, line), blanks
      // always; rebuild in original order
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         wrapped AS (
           SELECT doc_id, CASE WHEN len(t) = 0 THEN ''
                  ELSE array_to_string([array_to_string(t[(i*2+1):(i*2+2)], ' ')
                                        FOR i IN range(0, CAST(ceil(len(t)/2.0) AS INT))], chr(10)) END AS wtext
           FROM toks),
         ls AS (SELECT doc_id, string_split(wtext, chr(10)) AS ll FROM wrapped),
         lines AS (SELECT doc_id, unnest(ll) AS line, generate_subscripts(ll, 1) AS pos FROM ls),
         firsts AS (SELECT doc_id, line, min(pos) AS fp FROM lines
                    WHERE trim(line) <> '' GROUP BY doc_id, line),
         flagged AS (SELECT l.doc_id, l.pos, l.line,
                            (trim(l.line) <> '' AND l.pos <> f.fp) AS dup
                     FROM lines l LEFT JOIN firsts f
                       ON l.doc_id = f.doc_id AND l.line = f.line)
         SELECT doc_id,
                CAST(sum(CASE WHEN NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                md5(coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10) ORDER BY pos), '')) AS text_md5
         FROM flagged GROUP BY doc_id ORDER BY doc_id""",

    "q133_paragraph_dedup" ->
      // q96 with the unit boundary at chr(10)||chr(10): paragraphs
      // repeated across >= 3 docs drop, text rebuilt with the same joiner
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         wrapped AS (
           SELECT doc_id, CASE WHEN len(t) = 0 THEN ''
                  ELSE array_to_string([array_to_string(t[(i*4+1):(i*4+4)], ' ')
                                        FOR i IN range(0, CAST(ceil(len(t)/4.0) AS INT))], chr(10) || chr(10)) END AS wtext
           FROM toks),
         ls AS (SELECT doc_id, string_split(wtext, chr(10) || chr(10)) AS ll FROM wrapped),
         lines AS (SELECT doc_id, unnest(ll) AS line, generate_subscripts(ll, 1) AS pos FROM ls),
         freq AS (SELECT line FROM lines WHERE trim(line) <> ''
                  GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
         flagged AS (SELECT l.doc_id, l.pos, l.line, (f.line IS NOT NULL) AS dup
                     FROM lines l LEFT JOIN freq f ON l.line = f.line)
         SELECT doc_id,
                CAST(sum(CASE WHEN NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                md5(coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10) || chr(10) ORDER BY pos), '')) AS text_md5
         FROM flagged GROUP BY doc_id ORDER BY doc_id""",

    "q127_line_scrub_against" ->
      // q96's wrapping; frequent table from corpus docs < 400 only,
      // batch docs >= 400 scrub against it (exact line content)
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         wrapped AS (
           SELECT doc_id, CASE WHEN len(t) = 0 THEN ''
                  ELSE array_to_string([array_to_string(t[(i*4+1):(i*4+4)], ' ')
                                        FOR i IN range(0, CAST(ceil(len(t)/4.0) AS INT))], chr(10)) END AS wtext
           FROM toks),
         ls AS (SELECT doc_id, string_split(wtext, chr(10)) AS ll FROM wrapped),
         lines AS (SELECT doc_id, unnest(ll) AS line, generate_subscripts(ll, 1) AS pos FROM ls),
         freq AS (SELECT line FROM lines WHERE trim(line) <> '' AND doc_id < 400
                  GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
         flagged AS (SELECT l.doc_id, l.pos, l.line,
                            (trim(l.line) <> '' AND f.line IS NOT NULL) AS dup
                     FROM lines l LEFT JOIN freq f ON l.line = f.line
                     WHERE l.doc_id >= 400)
         SELECT doc_id,
                CAST(sum(CASE WHEN NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                md5(coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10) ORDER BY pos), '')) AS text_md5
         FROM flagged GROUP BY doc_id ORDER BY doc_id""",

    "q97_dup_spans" ->
      // 5-gram start positions repeated across >= 2 docs, merged into
      // maximal [start, end) token spans per doc (gap > 5 starts a span)
      s"""WITH ${PortableSql.spanGramCtes},
         cov AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)),
         isl AS (SELECT doc_id, pos,
                        CASE WHEN pos - lag(pos, 1, -5) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                             THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, pos, sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span FROM isl)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
                CAST(max(pos) + 5 AS BIGINT) AS span_end,
                CAST(count(*) AS BIGINT) AS n_grams
         FROM sp GROUP BY doc_id, span ORDER BY doc_id, span_start""",

    "q100_strip_spans" ->
      // q97's covered gram starts expand to token indices [pos, pos+5);
      // surviving tokens rebuild each doc (all occurrences cut)
      s"""WITH ${PortableSql.spanGramCtes},
         cov AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)),
         ${PortableSql.spanStripTail}
         SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
                CAST(len(t.t) - count(k.ti) AS BIGINT) AS n_removed,
                md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), '')) AS text_md5
         FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
         GROUP BY t.doc_id, len(t.t) ORDER BY t.doc_id""",

    "q107_strip_spans_keep_first" ->
      // q100 with canonical occurrences excluded from coverage: rn = 1 in
      // (doc_id, pos) order per gram survives
      s"""WITH ${PortableSql.spanGramCtes},
         occ AS (SELECT doc_id, pos, g,
                        row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
                 FROM grams JOIN rep USING (g)),
         cov AS (SELECT doc_id, pos FROM occ WHERE rn > 1),
         ${PortableSql.spanStripTail}
         SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
                CAST(len(t.t) - count(k.ti) AS BIGINT) AS n_removed,
                md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), '')) AS text_md5
         FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
         GROUP BY t.doc_id, len(t.t) ORDER BY t.doc_id""",

    "q128_span_scrub_against" ->
      // q100's strip with the gram table restricted to corpus docs < 400
      // and only batch docs >= 400 rebuilt
      s"""WITH ${PortableSql.spanGramCtes("WHERE doc_id < 400")},
         cov AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)
                 WHERE doc_id >= 400),
         ${PortableSql.spanStripTail}
         SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
                CAST(len(t.t) - count(k.ti) AS BIGINT) AS n_removed,
                md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), '')) AS text_md5
         FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
         WHERE t.doc_id >= 400
         GROUP BY t.doc_id, len(t.t) ORDER BY t.doc_id""",

    "q101_domain_cap" ->
      // q50's quality formula + row_number quota per source (the engine
      // side replaces the window with the bounded top-k aggregator)
      """WITH f AS (
           SELECT doc_id, source, text, string_split_regex(trim(text), '\s+') AS tk,
                  CAST(length(trim(text)) AS DOUBLE) AS nc FROM documents),
         g AS (
           SELECT doc_id, source, text, CAST(len(tk) AS DOUBLE) AS nt,
                  (nc - (len(tk) - 1)) / len(tk) AS mtl,
                  CAST(len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','with'], x))) AS DOUBLE) AS sh
           FROM f),
         scored AS (
           SELECT doc_id, source,
             round((CASE WHEN nt BETWEEN 8 AND 10000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN regexp_matches(text, '[.!?]') THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN sh / nt BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) AS q
           FROM g),
         r AS (SELECT source, doc_id, q,
                      row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rnk
               FROM scored)
         SELECT source, rnk, doc_id, round(q, 4) AS q
         FROM r WHERE rnk <= 5 ORDER BY source, rnk""",

    "q103_curation_pipeline" ->
      // q100's cleaned corpus -> q50's quality formula on the cleaned
      // text -> q59's md5 split -> per-split doc/token volumes
      s"""WITH ${PortableSql.spanGramCtes},
         cov AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)),
         ${PortableSql.spanStripTail},
         cleaned AS (SELECT t.doc_id,
                            coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), '') AS text,
                            CAST(count(k.ti) AS BIGINT) AS n_tok
                     FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
                     GROUP BY t.doc_id),
         f AS (SELECT doc_id, text, n_tok, string_split_regex(trim(text), '\\s+') AS tk,
                      CAST(length(trim(text)) AS DOUBLE) AS nc FROM cleaned),
         g2 AS (SELECT doc_id, text, n_tok, CAST(len(tk) AS DOUBLE) AS nt,
                       (nc - (len(tk) - 1)) / len(tk) AS mtl,
                       CAST(len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','with'], x))) AS DOUBLE) AS sh
                FROM f),
         scored AS (
           SELECT doc_id, n_tok,
             round((CASE WHEN nt BETWEEN 8 AND 10000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN regexp_matches(text, '[.!?]') THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN sh / nt BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END), 2) AS q
           FROM g2),
         sel AS (SELECT doc_id, n_tok,
                        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
                 FROM scored WHERE q >= 0.5)
         SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
                CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens
         FROM sel GROUP BY 1 ORDER BY split""",

    "q98_dsir_weights" ->
      // hashed-unigram (512 md5 buckets) Laplace-smoothed log-likelihood
      // ratio: en subcorpus = target, full corpus = raw; top 25 by weight
      """WITH rtok AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
           FROM documents),
         rb AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 512 AS b FROM rtok),
         ttok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
           FROM documents WHERE lang = 'en'),
         tb AS (SELECT CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 512 AS b FROM ttok),
         tc AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM tb GROUP BY b),
         rc AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM rb GROUP BY b),
         tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM tb) AS nt,
                        (SELECT CAST(count(*) AS BIGINT) FROM rb) AS nr),
         pb AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS nb
                FROM rb GROUP BY doc_id, b),
         sc AS (SELECT pb.doc_id,
                       round(list_sum(list(
                         nb * (ln((coalesce(tc.ct, 0) + 1) / (tot.nt + 512.0))
                             - ln((rc.cr + 1) / (tot.nr + 512.0)))
                         ORDER BY pb.b)) + 0.0, 4) AS w
                FROM pb LEFT JOIN tc USING (b) JOIN rc USING (b) CROSS JOIN tot
                GROUP BY pb.doc_id)
         SELECT d.doc_id, coalesce(sc.w, 0.0) AS w
         FROM (SELECT doc_id FROM documents) d LEFT JOIN sc USING (doc_id)
         ORDER BY w DESC, doc_id LIMIT 25""",

    "q125_length_histogram" ->
      """SELECT CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS log2_bin,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY log2_bin ORDER BY log2_bin""",

    "q124_collocations" ->
      """WITH tks AS (
           SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
           FROM documents),
         bgs AS (SELECT unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]) AS bg
                 FROM tks WHERE len(t) >= 2),
         bc AS (SELECT bg, CAST(count(*) AS BIGINT) AS cab
                FROM bgs GROUP BY bg HAVING count(*) >= 20),
         uc AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM (
                  SELECT unnest(t) AS w FROM tks) GROUP BY w),
         nb AS (SELECT CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS n_bg FROM tks)
         SELECT bc.bg, bc.cab,
                round(ln(nb.n_bg * bc.cab / CAST(a.cw * b.cw AS DOUBLE)), 4) AS pmi
         FROM bc JOIN uc a ON a.w = string_split(bc.bg, ' ')[1]
                 JOIN uc b ON b.w = string_split(bc.bg, ' ')[2]
         CROSS JOIN nb
         ORDER BY pmi DESC, bg LIMIT 15""",

    "q120_top_terms_by_lang" ->
      """WITH tc AS (
           SELECT lang, tok AS w, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             FROM documents)
           GROUP BY lang, tok)
         SELECT lang, w, c, rnk FROM (
           SELECT lang, w, c,
                  row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rnk
           FROM tc)
         WHERE rnk <= 5 ORDER BY lang, rnk""",

    "q112_fertility_by_lang" ->
      """WITH f AS (
           SELECT lang,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE list_aggregate(list_transform(
                              string_split_regex(trim(text), '\s+'),
                              t -> greatest(1, CAST(ceil(length(t) / 4.0) AS INT))), 'sum')
                  END AS BIGINT) AS sub,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tok
           FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(sub) AS BIGINT) AS subwords,
                CAST(sum(tok) AS BIGINT) AS tokens,
                round(sum(sub) / CAST(sum(tok) AS DOUBLE), 4) AS fertility
         FROM f GROUP BY lang ORDER BY lang""",

    "q110_token_entropy" ->
      // same sorted-type fold order; + 0.0 normalizes a -0.0 sum
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         t2 AS (SELECT doc_id, tk, CAST(len(tk) AS DOUBLE) AS n,
                       list_sort(list_distinct(tk)) AS ty
                FROM toks)
         SELECT doc_id, CAST(len(ty) AS BIGINT) AS n_types,
                CASE WHEN n = 0 THEN 0.0 ELSE round(len(ty) / n, 4) END AS ttr,
                CASE WHEN n = 0 THEN 0.0 ELSE
                  round(list_sum([-(len(list_filter(tk, x -> x = t)) / n)
                                  * ln(len(list_filter(tk, x -> x = t)) / n)
                                  FOR t IN ty]) + 0.0, 4) END AS entropy
         FROM t2 ORDER BY doc_id""",

    "q109_gopher_rules" ->
      // q50's rule bands as booleans + q69's top-bigram fraction at 0.06
      """WITH f AS (
           SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tk,
                  CAST(length(trim(text)) AS DOUBLE) AS nc FROM documents),
         g AS (
           SELECT doc_id, CAST(len(tk) AS DOUBLE) AS nt,
                  (nc - (len(tk) - 1)) / len(tk) AS mtl,
                  CAST(len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','with'], x))) AS DOUBLE) AS sh
           FROM f),
         toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 1),
                  i -> tk[i + 1] || ' ' || tk[i + 2])) AS g
                FROM toks WHERE len(tk) >= 2),
         bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
         b2 AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top2_frac
                FROM bc GROUP BY doc_id)
         SELECT g.doc_id,
                (g.nt BETWEEN 8 AND 10000) AS wc_ok,
                (g.mtl BETWEEN 2.0 AND 12.0) AS mtl_ok,
                (g.sh / g.nt BETWEEN 0.01 AND 0.6) AS stop_ok,
                (coalesce(b2.top2_frac, 0.0) <= 0.06) AS rep_ok,
                ((g.nt BETWEEN 8 AND 10000) AND (g.mtl BETWEEN 2.0 AND 12.0)
                 AND (g.sh / g.nt BETWEEN 0.01 AND 0.6)
                 AND (coalesce(b2.top2_frac, 0.0) <= 0.06)) AS pass
         FROM g LEFT JOIN b2 ON g.doc_id = b2.doc_id
         ORDER BY g.doc_id""",

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
    "q65_percentiles_approx" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS p50,
                TRUE AS p50_ok, TRUE AS p99_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q71_stratified_sample" ->
      """WITH b AS (
           SELECT lang, doc_id,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bk
           FROM documents)
         SELECT lang, count(*) AS n, min(doc_id) AS first_id
         FROM b
         WHERE (lang = 'en' AND bk < 80) OR (lang = 'es' AND bk < 40)
            OR (lang = 'fr' AND bk < 20) OR (lang = 'de' AND bk < 10)
         GROUP BY lang ORDER BY lang""",

    "q72_quantize_int8" ->
      """WITH v AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         s AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
               FROM v),
         c AS (SELECT vec_id, v, sc,
                      list_transform(v, x -> CASE WHEN sc = 0 THEN 0
                        ELSE CAST(floor(x / sc + 0.5) AS INT) END) AS codes
               FROM s)
         SELECT vec_id, codes[1] AS c0, codes[32] AS c31,
                round(sc, 6) AS scale,
                round(list_reduce(
                        list_prepend(0.0,
                          list_transform(range(len(v)),
                            i -> abs(v[i + 1] - CAST(codes[i + 1] AS DOUBLE) * sc))),
                        (acc, x) -> acc + x) / len(v), 6) AS err
         FROM c ORDER BY vec_id LIMIT 200"""
,
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
         FROM documents ORDER BY asset_id LIMIT 200""",

    // ---- portable-sketch oracles (SURVEY §5.5): every kernel below is
    // md5-derived (expr/PortableHash.scala), so DuckDB recomputes the exact
    // signatures/buckets/vectors the engine produced ----

    "q43_dedup_minhash" ->
      s"""WITH ${PortableSql.minhashVerifiedPairCtes}
         SELECT a_id, b_id, j FROM vp ORDER BY a_id, b_id""",

    "q87_incremental_dedup" ->
      // the full <200 pair set restricted to corpus(<150) × batch(150-199):
      // band collisions and the verify threshold are identical, so the
      // incremental path must reproduce exactly this slice
      s"""WITH ${PortableSql.minhashVerifiedPairCtes}
         SELECT a_id AS corpus_id, b_id AS new_id, j FROM vp
         WHERE a_id < 150 AND b_id >= 150
         ORDER BY corpus_id, new_id""",

    "q80_dup_clusters" ->
      // connected components over the verified near-dup pairs: recursive
      // label closure, min reachable id per node = cluster id (the engine's
      // iterative min-label propagation converges to the same fixpoint)
      s"""WITH RECURSIVE ${PortableSql.minhashVerifiedPairCtes},
         ${PortableSql.ccCtes},
         sz AS (SELECT cluster_id, count(*) AS cluster_size
                FROM cc GROUP BY cluster_id)
         SELECT cc.id AS doc_id, cc.cluster_id, sz.cluster_size
         FROM cc JOIN sz USING (cluster_id) ORDER BY doc_id""",

    "q82_dedup_corpus" ->
      // q80's connected components, then keep min-id per cluster: the
      // surviving corpus rows themselves
      s"""WITH RECURSIVE ${PortableSql.minhashVerifiedPairCtes},
         ${PortableSql.ccCtes}
         SELECT doc_id, lang, n_chars FROM documents
         WHERE doc_id < 200
           AND doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)
         ORDER BY doc_id""",

    "q118_range_join" ->
      """WITH r AS (SELECT n_nationkey AS rid, n_nationkey * 2.0 AS lo,
                           n_nationkey * 2.0 + 3 AS hi FROM nation)
         SELECT rid, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty_floor_sum
         FROM lineitem JOIN r ON l_quantity >= lo AND l_quantity <= hi
         GROUP BY rid ORDER BY rid""",

    "q117_cluster_balance" ->
      s"""${PortableSql.ivfTrainSql}
         c3 AS (SELECT CAST(cid AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n
                FROM bf GROUP BY cid),
         t3 AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c3)
         SELECT cluster, n, round(n / CAST(total AS DOUBLE), 4) AS share
         FROM c3 CROSS JOIN t3 ORDER BY cluster""",

    "q116_cluster_sample" ->
      // bf = the re-trained clustering; pick order = md5(id) % 1e9, id
      s"""${PortableSql.ivfTrainSql}
         r AS (SELECT cid, id,
                      row_number() OVER (PARTITION BY cid ORDER BY
                        CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15) AS BIGINT)
                          % 1000000000, id) AS rnk
               FROM bf)
         SELECT CAST(cid AS BIGINT) AS cluster, rnk, id AS vec_id
         FROM r WHERE rnk <= 5 ORDER BY cluster, rnk""",

    "q81_semantic_dedup" ->
      // re-trained clustering at the auto-scaled nlist = ceil(sqrt(500))
      // = 23 (bf = id, v, cid), then the SemDeDup pair rule: drop the
      // larger id of any within-cluster pair >= tau
      s"""${PortableSql.ivfTrainSql(23)}
         dr AS (SELECT DISTINCT b.id AS drop_id
                FROM bf a JOIN bf b ON a.cid = b.cid AND a.id < b.id
                WHERE round(${PortableSql.cosSql("a.v", "b.v")}, 4) >= 0.4)
         SELECT bf.id AS vec_id, bf.cid AS cluster, dr.drop_id IS NULL AS keep
         FROM bf LEFT JOIN dr ON bf.id = dr.drop_id
         ORDER BY vec_id""",

    "q46_dedup_simhash" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
           FROM documents WHERE doc_id < 200 AND length(trim(text)) > 0),
         h AS (
           SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
           FROM toks),
         bits AS (
           SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS c
           FROM h CROSS JOIN range(60) r(b) GROUP BY doc_id, b),
         sig AS (
           SELECT doc_id,
                  sum(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS sig
           FROM bits GROUP BY doc_id),
         chunks AS (
           SELECT doc_id, sig, c, (sig >> (15 * c)) & 32767 AS chunk
           FROM sig CROSS JOIN range(4) r(c)),
         cand AS (
           SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                  a.sig AS sa, b.sig AS sb
           FROM chunks a JOIN chunks b
             ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 20
         ORDER BY a_id, b_id""",

    "q47_ann_lsh" -> {
      val qv = vecSql(qvecScala)
      s"""WITH planes AS (
           SELECT j, list_transform(range(64), i ->
             CASE WHEN CAST('0x' || substr(md5(CAST(j * 64 + i AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END) AS p
           FROM range(4) t(j)),
         emb2 AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         buckets AS (
           SELECT vec_id,
                  CAST(sum(CASE WHEN list_inner_product(v, p) > 0
                                THEN (1 << j) ELSE 0 END) AS INT) AS bucket
           FROM emb2 CROSS JOIN planes GROUP BY vec_id),
         qb AS (
           SELECT CAST(sum(CASE WHEN list_inner_product($qv, p) > 0
                                THEN (1 << j) ELSE 0 END) AS INT) AS b
           FROM planes)
         SELECT e.vec_id AS id, round(list_cosine_similarity(e.v, $qv), 4) AS sim
         FROM emb2 e JOIN buckets bk ON e.vec_id = bk.vec_id
         WHERE bk.bucket IN (SELECT b FROM qb UNION ALL
                             SELECT xor(b, 1) FROM qb UNION ALL
                             SELECT xor(b, 2) FROM qb)
         ORDER BY sim DESC, id LIMIT 6"""
    },

    "q115_cross_rerank" ->
      // the stub scorer is md5-portable: hex15(query||U+0001||text)
      """SELECT doc_id,
                CAST('0x' || substr(md5('window hash join' || chr(1) || text), 1, 15) AS BIGINT)
                  % 10000 / 10000.0 AS score
         FROM documents WHERE doc_id < 100
         ORDER BY score DESC, doc_id LIMIT 10""",

    "q108_mean_pool" ->
      // same fold order: vectors listed by vec_id, per-dim left-to-right
      // list_sum, divide by the group count
      """WITH v AS (
           SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         g AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
                      list(v ORDER BY vec_id) AS vs
               FROM v GROUP BY label)
         SELECT label, n, i - 1 AS dim,
                round(list_sum(list_transform(vs, w -> w[i])) / n, 6) AS v
         FROM g CROSS JOIN range(1, 65) r(i)
         ORDER BY label, dim""",

    "q111_hard_negatives" -> {
      val q1 = vecSql(qvecScala)
      val q2 = vecSql(qvec2Scala)
      s"""WITH qs(query_id, qv, pos) AS (VALUES ('qa', $q1, [3, 7]), ('qb', $q2, [2])),
         emb2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
         scored AS (
           SELECT q.query_id, e.vec_id,
                  round(list_cosine_similarity(e.v, q.qv), 4) AS sim
           FROM emb2 e CROSS JOIN qs q
           WHERE NOT list_contains(q.pos, e.vec_id))
         SELECT query_id, rn AS rnk, vec_id, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, vec_id) AS rn FROM scored)
         WHERE rn <= 5 ORDER BY query_id, rnk"""
    },

    "q105_binary_batched" -> {
      val q1 = vecSql(qvecScala)
      val q2 = vecSql(qvec2Scala)
      s"""WITH qs(query_id, qv) AS (VALUES ('qa', $q1), ('qb', $q2)),
         emb2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
         h AS (SELECT q.query_id, e.vec_id, e.v, q.qv,
                      CAST(len([i FOR i IN range(1, 65)
                                IF (e.v[i] >= 0) <> (q.qv[i] >= 0)]) AS BIGINT) AS hamming
               FROM emb2 e CROSS JOIN qs q),
         cand AS (SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, vec_id) AS rn FROM h)
                  WHERE rn <= 50),
         scored AS (SELECT query_id, vec_id,
                           round(list_cosine_similarity(v, qv), 4) AS sim
                    FROM cand)
         SELECT query_id, rn2 AS rnk, vec_id, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, vec_id) AS rn2 FROM scored)
         WHERE rn2 <= 5 ORDER BY query_id, rnk"""
    },

    "q106_sq8_batched" -> {
      val q1 = vecSql(qvecScala)
      val q2 = vecSql(qvec2Scala)
      s"""WITH qs(query_id, qvr) AS (VALUES ('qa', $q1), ('qb', $q2)),
         q2c AS (SELECT query_id, list_transform(qvr, x -> CAST(x AS DOUBLE)) AS qv FROM qs),
         qq AS (SELECT query_id, qv, list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qsc
                FROM q2c),
         qc AS (SELECT query_id, qv, qsc, list_transform(qv, x -> CASE WHEN qsc = 0 THEN 0
                  ELSE CAST(floor(x / qsc + 0.5) AS INT) END) AS qcodes FROM qq),
         v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc FROM v),
         c8 AS (SELECT vec_id, v, sc, list_transform(v, x -> CASE WHEN sc = 0 THEN 0
                  ELSE CAST(floor(x / sc + 0.5) AS INT) END) AS codes FROM s),
         a AS (SELECT q.query_id, c.vec_id, c.v, q.qv,
                      CAST(list_sum([CAST(c.codes[i] AS BIGINT) * q.qcodes[i]
                                     FOR i IN range(1, 65)]) AS DOUBLE) * c.sc * q.qsc AS approx
               FROM c8 c CROSS JOIN qc q),
         cand AS (SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY approx DESC, vec_id) AS rn FROM a)
                  WHERE rn <= 50),
         scored AS (SELECT query_id, vec_id,
                           round(list_cosine_similarity(v, qv), 4) AS sim
                    FROM cand)
         SELECT query_id, rn2 AS rnk, vec_id, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, vec_id) AS rn2 FROM scored)
         WHERE rn2 <= 5 ORDER BY query_id, rnk"""
    },

    "q104_recall_eval" -> {
      // every leg re-derived from its own oracle recipe (q16 exact, q47
      // lsh, q99 binary, q102 sq8), intersected with the exact top-10
      val qv = vecSql(qvec2Scala)
      s"""WITH q AS (SELECT list_transform($qv, x -> CAST(x AS DOUBLE)) AS qv),
         emb2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
         ex AS (SELECT vec_id FROM emb2 CROSS JOIN q
                ORDER BY round(list_cosine_similarity(v, qv), 4) DESC, vec_id LIMIT 10),
         planes AS (
           SELECT j, list_transform(range(64), i ->
             CASE WHEN CAST('0x' || substr(md5(CAST(j * 64 + i AS VARCHAR)), 1, 15)
                       AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END) AS p
           FROM range(4) t(j)),
         buckets AS (
           SELECT vec_id,
                  CAST(sum(CASE WHEN list_inner_product(v, p) > 0
                                THEN (1 << j) ELSE 0 END) AS INT) AS bucket
           FROM emb2 CROSS JOIN planes GROUP BY vec_id),
         qb AS (
           SELECT CAST(sum(CASE WHEN list_inner_product(qv, p) > 0
                                THEN (1 << j) ELSE 0 END) AS INT) AS b
           FROM planes CROSS JOIN q),
         lsh AS (
           SELECT e.vec_id FROM emb2 e JOIN buckets bk ON e.vec_id = bk.vec_id
           CROSS JOIN q
           WHERE bk.bucket IN (SELECT b FROM qb UNION ALL
                               SELECT xor(b, 1) FROM qb UNION ALL
                               SELECT xor(b, 2) FROM qb)
           ORDER BY round(list_cosine_similarity(e.v, qv), 4) DESC, e.vec_id LIMIT 10),
         bh AS (SELECT vec_id, v, qv,
                       CAST(len([i FOR i IN range(1, 65)
                                 IF (v[i] >= 0) <> (qv[i] >= 0)]) AS BIGINT) AS hamming
                FROM emb2 CROSS JOIN q),
         bcand AS (SELECT * FROM bh ORDER BY hamming, vec_id LIMIT 50),
         bin AS (SELECT vec_id FROM bcand
                 ORDER BY round(list_cosine_similarity(v, qv), 4) DESC, vec_id LIMIT 10),
         qq AS (SELECT qv, list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qsc FROM q),
         qc AS (SELECT qv, qsc, list_transform(qv, x -> CASE WHEN qsc = 0 THEN 0
                  ELSE CAST(floor(x / qsc + 0.5) AS INT) END) AS qcodes FROM qq),
         sc8 AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
                 FROM emb2),
         c8 AS (SELECT vec_id, v, sc, list_transform(v, x -> CASE WHEN sc = 0 THEN 0
                  ELSE CAST(floor(x / sc + 0.5) AS INT) END) AS codes FROM sc8),
         a8 AS (SELECT vec_id, v, qv,
                       CAST(list_sum([CAST(codes[i] AS BIGINT) * qcodes[i]
                                      FOR i IN range(1, 65)]) AS DOUBLE) * sc * qsc AS approx
                FROM c8 CROSS JOIN qc),
         s8cand AS (SELECT * FROM a8 ORDER BY approx DESC, vec_id LIMIT 50),
         sq8 AS (SELECT vec_id FROM s8cand
                 ORDER BY round(list_cosine_similarity(v, qv), 4) DESC, vec_id LIMIT 10)
         SELECT * FROM (
           SELECT 'binary' AS method,
                  (SELECT CAST(count(*) AS DOUBLE) / 10 FROM bin JOIN ex USING (vec_id)) AS recall
           UNION ALL SELECT 'lsh',
                  (SELECT CAST(count(*) AS DOUBLE) / 10 FROM lsh JOIN ex USING (vec_id))
           UNION ALL SELECT 'sq8',
                  (SELECT CAST(count(*) AS DOUBLE) / 10 FROM sq8 JOIN ex USING (vec_id))
         ) ORDER BY method"""
    },

    "q102_ann_int8" -> {
      // codes re-derived exactly as q72; approx = (int dot) * sc * qsc
      // with the same left-associated double products as the engine
      val qv = vecSql(qvec2Scala)
      s"""WITH q AS (SELECT list_transform($qv, x -> CAST(x AS DOUBLE)) AS qv),
         qq AS (SELECT qv, list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qsc FROM q),
         qc AS (SELECT qv, qsc, list_transform(qv, x -> CASE WHEN qsc = 0 THEN 0
                  ELSE CAST(floor(x / qsc + 0.5) AS INT) END) AS qcodes FROM qq),
         v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc FROM v),
         c AS (SELECT vec_id, v, sc, list_transform(v, x -> CASE WHEN sc = 0 THEN 0
                 ELSE CAST(floor(x / sc + 0.5) AS INT) END) AS codes FROM s),
         a AS (SELECT vec_id, v, qv,
                      CAST(list_sum([CAST(codes[i] AS BIGINT) * qcodes[i]
                                     FOR i IN range(1, 65)]) AS DOUBLE) * sc * qsc AS approx
               FROM c CROSS JOIN qc),
         cand AS (SELECT * FROM a ORDER BY approx DESC, vec_id LIMIT 50)
         SELECT vec_id, round(approx, 4) AS approx,
                round(list_cosine_similarity(v, qv), 4) AS sim
         FROM cand ORDER BY sim DESC, vec_id LIMIT 10"""
    },

    "q122_prefiltered_ann" -> {
      val qv = vecSql(qvec2Scala)
      s"""SELECT vec_id,
                round(list_cosine_similarity(
                  list_transform(embedding, x -> CAST(x AS DOUBLE)), $qv), 4) AS sim
         FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         WHERE d.lang = 'en'
         ORDER BY sim DESC, vec_id LIMIT 10"""
    },

    "q99_binary_ann" -> {
      // the packed-word hamming the engine computes equals the number of
      // sign mismatches — the oracle ranks from the sign definition alone
      val qv = vecSql(qvec2Scala)
      s"""WITH q AS (SELECT $qv AS qv),
         h AS (
           SELECT vec_id, embedding, qv,
                  CAST(len([i FOR i IN range(1, 65)
                            IF (embedding[i] >= 0) <> (qv[i] >= 0)]) AS BIGINT) AS hamming
           FROM embeddings CROSS JOIN q),
         c AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT 50)
         SELECT vec_id, hamming,
                round(list_cosine_similarity(
                  list_transform(embedding, x -> CAST(x AS DOUBLE)), qv), 4) AS sim
         FROM c ORDER BY sim DESC, vec_id LIMIT 10"""
    },

    "q66_ann_ivf" -> {
      val qv = vecSql(qvecScala)
      s"""${PortableSql.ivfTrainSql}
         pc AS (SELECT cid FROM c2
                ORDER BY ${PortableSql.cosSql(qv, "c")} DESC, cid LIMIT 2)
         SELECT id, round(${PortableSql.cosSql("v", qv)}, 4) AS sim
         FROM bf WHERE cid IN (SELECT cid FROM pc)
         ORDER BY sim DESC, id LIMIT 6"""
    },

    "q79_ivf_batched" -> {
      val qv1 = vecSql(qvecScala)
      val qv2 = vecSql(qvec2Scala)
      // same trained assignment (bf/c2) as q66; per-query probe lists and
      // per-query rank over the rounded sim, ties -> lowest id
      s"""${PortableSql.ivfTrainSql}
         q(query_id, qvec) AS (VALUES ('qa', $qv1), ('qb', $qv2)),
         pr AS (SELECT query_id, cid FROM
                 (SELECT q.query_id, c.cid,
                         row_number() OVER (PARTITION BY q.query_id
                           ORDER BY ${PortableSql.cosSql("q.qvec", "c.c")} DESC, c.cid) AS rn
                  FROM q CROSS JOIN c2 c) WHERE rn <= 2),
         sc AS (SELECT pr.query_id, bf.id,
                       round(${PortableSql.cosSql("bf.v", "q.qvec")}, 4) AS sim
                FROM bf JOIN pr ON bf.cid = pr.cid
                        JOIN q ON q.query_id = pr.query_id)
         SELECT query_id, rnk, id AS vec_id, sim FROM
          (SELECT query_id, id, sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, id) AS rnk
           FROM sc) WHERE rnk <= 5
         ORDER BY query_id, rnk"""
    },

    "q85_ann_pq" -> {
      val d = 16
      def qslice(s: Int) = vecSql(qvecScala.slice(s * d, (s + 1) * d))
      val subs = (0 until 4).map(s =>
        PortableSql.pqSubTrainSql(s"p${s}_", s * d + 1, (s + 1) * d, d))
        .mkString(",\n")
      val dists = (0 until 4).map { s =>
        s"""SELECT b.id, list_sum(list_transform(range($d),
              i -> ((${qslice(s)})[i + 1] - c.c[i + 1])
                   * ((${qslice(s)})[i + 1] - c.c[i + 1]))) AS dist
            FROM p${s}_bf b JOIN p${s}_c2 c ON b.cid = c.cid"""
      }.mkString(" UNION ALL ")
      s"""WITH $subs,
         alld AS ($dists),
         tot AS (SELECT id, sum(dist) AS dist FROM alld GROUP BY id)
         SELECT id AS vec_id, round(dist, 4) AS dist FROM tot
         ORDER BY round(dist, 4), id LIMIT 6"""
    },

    "q86_ann_ivfpq" -> {
      val d = 16
      val qv = vecSql(qvecScala)
      def qslice(s: Int) = vecSql(qvecScala.slice(s * d, (s + 1) * d))
      val subs = (0 until 4).map(s =>
        PortableSql.pqSubTrainSql(s"p${s}_", s * d + 1, (s + 1) * d, d))
        .mkString(",\n")
      val dists = (0 until 4).map { s =>
        s"""SELECT b.id, list_sum(list_transform(range($d),
              i -> ((${qslice(s)})[i + 1] - c.c[i + 1])
                   * ((${qslice(s)})[i + 1] - c.c[i + 1]))) AS dist
            FROM p${s}_bf b JOIN p${s}_c2 c ON b.cid = c.cid"""
      }.mkString(" UNION ALL ")
      // ivfTrainSql's bf/c2 = coarse assignment; pq subs = fine distances
      s"""${PortableSql.ivfTrainSql}
         $subs,
         pc AS (SELECT cid FROM c2
                ORDER BY ${PortableSql.cosSql(qv, "c")} DESC, cid LIMIT 2),
         alld AS ($dists),
         tot AS (SELECT id, sum(dist) AS dist FROM alld GROUP BY id)
         SELECT b.id AS vec_id, round(t.dist, 4) AS dist
         FROM bf b JOIN tot t ON b.id = t.id
         WHERE b.cid IN (SELECT cid FROM pc)
         ORDER BY round(t.dist, 4), b.id LIMIT 6"""
    },

    "q92_mmr_rerank" -> {
      val qv = vecSql(qvecScala)
      val cos = PortableSql.cosSql("c.v", "s.v")
      // unrolled greedy: sel{i} grows by the argmax of
      // 0.7·sim − 0.3·max(sim to selected); ties → lowest id
      val steps = (2 to 5).map { i =>
        s""",
         m$i AS (SELECT c.id, any_value(c.v) AS v, any_value(c.sim) AS sim,
                        max($cos) AS ms
                 FROM cand c, sel${i - 1} s
                 WHERE c.id NOT IN (SELECT id FROM sel${i - 1})
                 GROUP BY c.id),
         s$i AS (SELECT id, v, sim, 0.7 * sim - 0.3 * ms AS mmr FROM m$i
                 ORDER BY mmr DESC, id LIMIT 1),
         sel$i AS (SELECT id, v, sim, mmr FROM sel${i - 1}
                   UNION ALL SELECT id, v, sim, mmr FROM s$i)"""
      }.mkString
      s"""WITH cand AS (
           SELECT vec_id AS id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                  ${PortableSql.cosSql(
                    s"list_transform(embedding, x -> CAST(x AS DOUBLE))", qv)} AS sim
           FROM embeddings
           ORDER BY sim DESC, vec_id LIMIT 50),
         s1 AS (SELECT id, v, sim, 0.7 * sim AS mmr FROM cand
                ORDER BY mmr DESC, id LIMIT 1),
         sel1 AS (SELECT id, v, sim, mmr FROM s1)$steps,
         picks AS (SELECT 1 AS rnk, id, mmr FROM s1
                   UNION ALL SELECT 2, id, mmr FROM s2
                   UNION ALL SELECT 3, id, mmr FROM s3
                   UNION ALL SELECT 4, id, mmr FROM s4
                   UNION ALL SELECT 5, id, mmr FROM s5)
         SELECT rnk, id AS vec_id, round(mmr, 4) AS mmr FROM picks
         ORDER BY rnk"""
    },

    "q89_ann_ivfpq_residual" -> {
      val d = 16
      val qv = vecSql(qvecScala)
      // sub-codebooks trained on slices of the residual CTE rv; the bit
      // trick making rv portable: binary64 subtraction of two binary32
      // values CAST back to FLOAT is exactly the engine's float32 zip_with
      // (53 ≥ 2·24+2 — double rounding is innocuous)
      val subs = (0 until 4).map(s =>
        PortableSql.pqSubTrainFrom(s"r${s}_",
          s"SELECT id, v[${s * d + 1}:${(s + 1) * d}] AS v FROM rv", d))
        .mkString(",\n")
      val dists = (0 until 4).map { s =>
        val off = s * d
        s"""SELECT b.id, list_sum(list_transform(range($d),
              i -> ((($qv)[$off + i + 1] - cc.c[$off + i + 1]) - rc.c[i + 1])
                 * ((($qv)[$off + i + 1] - cc.c[$off + i + 1]) - rc.c[i + 1]))) AS dist
            FROM r${s}_bf b JOIN r${s}_c2 rc ON b.cid = rc.cid
                 JOIN bf ON bf.id = b.id JOIN c2 cc ON cc.cid = bf.cid"""
      }.mkString(" UNION ALL ")
      s"""${PortableSql.ivfTrainSql}
         rv AS (SELECT bf.id, bf.cid,
                  list_transform(range(64),
                    i -> CAST(CAST(bf.v[i + 1] - c.c[i + 1] AS FLOAT) AS DOUBLE)) AS v
                FROM bf JOIN c2 c ON bf.cid = c.cid),
         $subs,
         pc AS (SELECT cid FROM c2
                ORDER BY ${PortableSql.cosSql(qv, "c")} DESC, cid LIMIT 2),
         alld AS ($dists),
         tot AS (SELECT id, sum(dist) AS dist FROM alld GROUP BY id)
         SELECT b.id AS vec_id, round(t.dist, 4) AS dist
         FROM bf b JOIN tot t ON b.id = t.id
         WHERE b.cid IN (SELECT cid FROM pc)
         ORDER BY round(t.dist, 4), b.id LIMIT 6"""
    },

    "q94_ivfpq_residual_batched" -> {
      val d = 16
      val qv1 = vecSql(qvecScala)
      val qv2 = vecSql(qvec2Scala)
      val subs = (0 until 4).map(s =>
        PortableSql.pqSubTrainFrom(s"r${s}_",
          s"SELECT id, v[${s * d + 1}:${(s + 1) * d}] AS v FROM rv", d))
        .mkString(",\n")
      // per (query, subspace): ((q_i − C_cell_i) − r_i)² summed over the
      // slice, rows restricted to the query's probed cells via pr
      val dists = (0 until 4).map { s =>
        val off = s * d
        s"""SELECT pr.query_id, b.id, list_sum(list_transform(range($d),
              i -> ((q.qvec[$off + i + 1] - cc.c[$off + i + 1]) - rc.c[i + 1])
                 * ((q.qvec[$off + i + 1] - cc.c[$off + i + 1]) - rc.c[i + 1]))) AS dist
            FROM r${s}_bf b JOIN r${s}_c2 rc ON b.cid = rc.cid
                 JOIN bf ON bf.id = b.id JOIN c2 cc ON cc.cid = bf.cid
                 JOIN pr ON pr.cid = bf.cid
                 JOIN q ON q.query_id = pr.query_id"""
      }.mkString(" UNION ALL ")
      s"""${PortableSql.ivfTrainSql}
         rv AS (SELECT bf.id, bf.cid,
                  list_transform(range(64),
                    i -> CAST(CAST(bf.v[i + 1] - c.c[i + 1] AS FLOAT) AS DOUBLE)) AS v
                FROM bf JOIN c2 c ON bf.cid = c.cid),
         $subs,
         q(query_id, qvec) AS (VALUES ('qa', $qv1), ('qb', $qv2)),
         pr AS (SELECT query_id, cid FROM
                 (SELECT q.query_id, c.cid,
                         row_number() OVER (PARTITION BY q.query_id
                           ORDER BY ${PortableSql.cosSql("q.qvec", "c.c")} DESC, c.cid) AS rn
                  FROM q CROSS JOIN c2 c) WHERE rn <= 2),
         alld AS ($dists),
         tot AS (SELECT query_id, id, round(sum(dist), 4) AS dist
                 FROM alld GROUP BY query_id, id)
         SELECT query_id, rnk, id AS vec_id, dist FROM
          (SELECT query_id, id, dist,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY dist, id) AS rnk
           FROM tot) WHERE rnk <= 5
         ORDER BY query_id, rnk"""
    },

    // q350: the q94 residual-IVFADC replay as a k'=100 shortlist joined
    // against the exact cosine top-10 (unit-norm embeddings: cosine
    // order == L2 order; exact rerank of the shortlist makes recall@10
    // the overlap count); recall + the pinned >= 0.5 floor computed
    // identically
    "q350_ivfpq_recall" -> {
      val d = 16
      val qv1 = vecSql(qvecScala)
      val qv2 = vecSql(qvec2Scala)
      val subs = (0 until 4).map(s =>
        PortableSql.pqSubTrainFrom(s"r${s}_",
          s"SELECT id, v[${s * d + 1}:${(s + 1) * d}] AS v FROM rv", d))
        .mkString(",\n")
      val dists = (0 until 4).map { s =>
        val off = s * d
        s"""SELECT pr.query_id, b.id, list_sum(list_transform(range($d),
              i -> ((q.qvec[$off + i + 1] - cc.c[$off + i + 1]) - rc.c[i + 1])
                 * ((q.qvec[$off + i + 1] - cc.c[$off + i + 1]) - rc.c[i + 1]))) AS dist
            FROM r${s}_bf b JOIN r${s}_c2 rc ON b.cid = rc.cid
                 JOIN bf ON bf.id = b.id JOIN c2 cc ON cc.cid = bf.cid
                 JOIN pr ON pr.cid = bf.cid
                 JOIN q ON q.query_id = pr.query_id"""
      }.mkString(" UNION ALL ")
      s"""${PortableSql.ivfTrainSql}
         rv AS (SELECT bf.id, bf.cid,
                  list_transform(range(64),
                    i -> CAST(CAST(bf.v[i + 1] - c.c[i + 1] AS FLOAT) AS DOUBLE)) AS v
                FROM bf JOIN c2 c ON bf.cid = c.cid),
         $subs,
         q(query_id, qvec) AS (VALUES ('qa', $qv1), ('qb', $qv2)),
         pr AS (SELECT query_id, cid FROM
                 (SELECT q.query_id, c.cid,
                         row_number() OVER (PARTITION BY q.query_id
                           ORDER BY ${PortableSql.cosSql("q.qvec", "c.c")} DESC, c.cid) AS rn
                  FROM q CROSS JOIN c2 c) WHERE rn <= 4),
         alld AS ($dists),
         tot AS (SELECT query_id, id, round(sum(dist), 4) AS dist
                 FROM alld GROUP BY query_id, id),
         approx AS (SELECT query_id, id FROM
                 (SELECT query_id, id,
                         row_number() OVER (PARTITION BY query_id
                           ORDER BY dist, id) AS rnk
                  FROM tot) WHERE rnk <= 100),
         ex AS (SELECT query_id, id FROM
                 (SELECT q.query_id, e.vec_id AS id,
                         row_number() OVER (PARTITION BY q.query_id
                           ORDER BY round(list_cosine_similarity(
                             list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                             q.qvec), 4) DESC, e.vec_id) AS rnk
                  FROM embeddings e CROSS JOIN q) WHERE rnk <= 10),
         n AS (SELECT query_id, count(*) AS n_exact FROM ex GROUP BY query_id),
         m AS (SELECT ex.query_id, count(*) AS n_matched
               FROM ex JOIN approx a
                 ON a.query_id = ex.query_id AND a.id = ex.id
               GROUP BY ex.query_id)
         SELECT n.query_id, n.n_exact,
           coalesce(m.n_matched, 0) AS n_matched,
           round(coalesce(m.n_matched, 0) / CAST(n.n_exact AS DOUBLE), 4)
             AS recall,
           coalesce(m.n_matched, 0) / CAST(n.n_exact AS DOUBLE) >= 0.5
             AS recall_ok
         FROM n LEFT JOIN m ON m.query_id = n.query_id
         ORDER BY n.query_id"""
    },

    "q67_bm25" -> (PortableSql.bm25Sql(Seq("join", "hash", "window")) +
      """
         SELECT doc_id, round(score, 4) AS s FROM sc
         ORDER BY s DESC, doc_id LIMIT 20"""),

    "q68_hybrid_rrf" -> {
      val qv = vecSql(qvecScala)
      PortableSql.bm25Sql(Seq("join", "hash", "window")) +
      s""",
         kw AS (SELECT doc_id AS id, round(score, 4) AS s FROM sc
                ORDER BY s DESC, id LIMIT 50),
         vec AS (SELECT vec_id AS id,
                        round(list_cosine_similarity(
                          list_transform(embedding, x -> CAST(x AS DOUBLE)), $qv), 4) AS s
                 FROM embeddings ORDER BY s DESC, id LIMIT 50),
         ra AS (SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r FROM kw),
         rb AS (SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r FROM vec),
         u AS (SELECT id, 1.0 / (60 + r) AS c FROM ra
               UNION ALL SELECT id, 1.0 / (60 + r) AS c FROM rb),
         f AS (SELECT id, sum(c) AS rrf FROM u GROUP BY id)
         SELECT id, round(rrf, 6) AS rrf FROM f ORDER BY rrf DESC, id LIMIT 10"""
    },

    "q69_repetition_signals" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 1),
                  i -> tk[i + 1] || ' ' || tk[i + 2])) AS g
                FROM toks WHERE len(tk) >= 2),
         bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
         b2 AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top2_frac
                FROM bc GROUP BY doc_id),
         tg AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
                  i -> tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3])) AS g
                FROM toks WHERE len(tk) >= 3),
         tc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g),
         t2 AS (SELECT doc_id,
                       round(CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
                             / sum(c), 4) AS dup3_frac
                FROM tc GROUP BY doc_id)
         SELECT b2.doc_id, b2.top2_frac, coalesce(t2.dup3_frac, 0.0) AS dup3_frac
         FROM b2 LEFT JOIN t2 ON b2.doc_id = t2.doc_id
         ORDER BY b2.doc_id LIMIT 200""",

    "q90_bpe_train" -> {
      val ranks = (1 to 6).map(i =>
        s"SELECT $i AS merge_rank, a AS lhs, b AS rhs, s AS pair_cnt FROM m$i")
        .mkString(" UNION ALL ")
      s"""WITH ${PortableSql.bpeTrainCtes(6)}
         SELECT * FROM ($ranks) ORDER BY merge_rank"""
    },

    "q91_bpe_segment" -> {
      val wordCount = PortableSql.bpeSegmentWordSql("w", bpeMerges)
      s"""WITH words AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '')) AS w
           FROM documents),
         per AS (SELECT doc_id, $wordCount AS n FROM words)
         SELECT d.doc_id,
                CAST(coalesce(p.n, 0) AS BIGINT) AS n_sub
         FROM (SELECT doc_id FROM documents) d
         LEFT JOIN (SELECT doc_id, sum(n) AS n FROM per GROUP BY doc_id) p
           ON d.doc_id = p.doc_id
         ORDER BY d.doc_id LIMIT 300"""
    },

    "q126_bpe_tokenize_table" -> {
      // identical semantics to q91 — the engine side differs (merge-table
      // mapPartitions vs folded column), the oracle is the same replay
      val wordCount = PortableSql.bpeSegmentWordSql("w", bpeMerges)
      s"""WITH words AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '')) AS w
           FROM documents),
         per AS (SELECT doc_id, $wordCount AS n FROM words)
         SELECT d.doc_id,
                CAST(coalesce(p.n, 0) AS BIGINT) AS n_sub
         FROM (SELECT doc_id FROM documents) d
         LEFT JOIN (SELECT doc_id, sum(n) AS n FROM per GROUP BY doc_id) p
           ON d.doc_id = p.doc_id
         ORDER BY d.doc_id LIMIT 300"""
    },

    "q132_entropy_deciles" ->
      // q110's entropy formula, decile cut points via quantile_cont
      // (rounded 4dp like the engine), bin = 1 + #cuts strictly below
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         t2 AS (SELECT doc_id, tk, CAST(len(tk) AS DOUBLE) AS n,
                       list_sort(list_distinct(tk)) AS ty
                FROM toks),
         ent AS (SELECT doc_id,
                        CASE WHEN n = 0 THEN 0.0 ELSE
                          round(list_sum([-(len(list_filter(tk, x -> x = t)) / n)
                                          * ln(len(list_filter(tk, x -> x = t)) / n)
                                          FOR t IN ty]) + 0.0, 4) END AS e
                 FROM t2),
         cuts AS (SELECT [round(q, 4) FOR q IN
                    quantile_cont(e, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])] AS cs
                  FROM ent),
         binned AS (SELECT doc_id, e,
                           1 + len(list_filter(cs, c -> e > c)) AS bin
                    FROM ent CROSS JOIN cuts)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
                round(min(e), 4) AS min_e, round(max(e), 4) AS max_e
         FROM binned GROUP BY bin ORDER BY bin""",

    "q134_winnow_overlap" ->
      // q131's selection restricted to docs < 200, then pairs sharing
      // >= 3 distinct selected hashes
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents WHERE doc_id < 200),
         gl AS (SELECT doc_id, [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] AS gs
                FROM toks WHERE len(tk) >= 3),
         g0 AS (SELECT doc_id, unnest(gs) AS gr,
                       generate_subscripts(gs, 1) - 1 AS pos
                FROM gl),
         g AS (SELECT doc_id, pos,
                      CAST('0x' || substr(md5(gr), 1, 15) AS BIGINT) AS h
               FROM g0),
         mx AS (SELECT doc_id, max(pos) AS mp FROM g GROUP BY doc_id),
         wins AS (SELECT g.doc_id, g.pos AS i FROM g JOIN mx USING (doc_id)
                  WHERE g.pos + 3 <= mp),
         cand AS (SELECT w.doc_id, w.i, b.pos AS j, b.h
                  FROM wins w JOIN g b ON w.doc_id = b.doc_id
                    AND b.pos BETWEEN w.i AND w.i + 3),
         sel AS (SELECT doc_id, i, j, h,
                        row_number() OVER (PARTITION BY doc_id, i ORDER BY h ASC, j DESC) AS rn
                 FROM cand),
         fpd AS (SELECT DISTINCT doc_id, h FROM sel WHERE rn = 1),
         hot AS (SELECT h FROM fpd GROUP BY h HAVING count(*) > 10),
         fpr AS (SELECT * FROM fpd WHERE h NOT IN (SELECT h FROM hot))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(count(*) AS BIGINT) AS n_shared
         FROM fpr a JOIN fpr b ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3
         ORDER BY a_id, b_id""",

    "q131_winnow_fingerprints" ->
      // same 3-gram/window-4 winnowing: per (doc, window) pick min hash,
      // rightmost on ties; distinct selected positions are the set
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         gl AS (SELECT doc_id, [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] AS gs
                FROM toks WHERE len(tk) >= 3),
         g0 AS (SELECT doc_id, unnest(gs) AS gr,
                       generate_subscripts(gs, 1) - 1 AS pos
                FROM gl),
         g AS (SELECT doc_id, pos,
                      CAST('0x' || substr(md5(gr), 1, 15) AS BIGINT) AS h
               FROM g0),
         mx AS (SELECT doc_id, max(pos) AS mp FROM g GROUP BY doc_id),
         wins AS (SELECT g.doc_id, g.pos AS i FROM g JOIN mx USING (doc_id)
                  WHERE g.pos + 3 <= mp),
         cand AS (SELECT w.doc_id, w.i, b.pos AS j, b.h
                  FROM wins w JOIN g b ON w.doc_id = b.doc_id
                    AND b.pos BETWEEN w.i AND w.i + 3),
         sel AS (SELECT doc_id, i, j, h,
                        row_number() OVER (PARTITION BY doc_id, i ORDER BY h ASC, j DESC) AS rn
                 FROM cand),
         fp AS (SELECT DISTINCT doc_id, j, h FROM sel WHERE rn = 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
                CAST(sum(h % 1000000007) % 1000000007 AS BIGINT) AS fp_mod
         FROM fp GROUP BY doc_id ORDER BY doc_id""",

    "q130_tfidf_keywords" ->
      """WITH tk AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
           FROM documents WHERE doc_id < 100),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
         dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n FROM documents WHERE doc_id < 100),
         sc AS (SELECT tf.doc_id, tf.term,
                       round(tf.tf * ln((n.n + 1) / CAST(df + 1 AS DOUBLE)), 4) AS s
                FROM tf JOIN dft USING (term) CROSS JOIN n),
         rk AS (SELECT doc_id, term, s,
                       row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rnk
                FROM sc)
         SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, s AS score
         FROM rk WHERE rnk <= 5 ORDER BY doc_id, rnk""",

    "q129_bloom_contamination" ->
      // the same 16384-bit / 3-hash filter rebuilt in SQL: a corpus gram
      // is flagged iff all 3 of its md5 positions are set by bench grams
      """WITH tokb AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
           FROM documents WHERE doc_id < 5),
         bg AS (SELECT DISTINCT unnest(list_transform(range(len(tk) - 2),
                  i -> tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3])) AS g3
                FROM tokb WHERE len(tk) >= 3),
         bpos AS (SELECT DISTINCT
                    CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ' ' || g3), 1, 15) AS BIGINT) % 16384 AS p
                  FROM bg CROSS JOIN range(3) r(j)),
         tokc AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents WHERE doc_id >= 5),
         dg AS (SELECT DISTINCT doc_id, unnest(list_transform(range(len(tk) - 2),
                  i -> tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3])) AS g3
                FROM tokc WHERE len(tk) >= 3),
         dp AS (SELECT doc_id, g3,
                  CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ' ' || g3), 1, 15) AS BIGINT) % 16384 AS p
                FROM dg CROSS JOIN range(3) r(j)),
         hit AS (SELECT dp.doc_id, dp.g3 FROM dp JOIN bpos ON dp.p = bpos.p
                 GROUP BY dp.doc_id, dp.g3 HAVING count(*) = 3)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged
         FROM hit GROUP BY doc_id ORDER BY doc_id""",

    "q70_contamination" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
                 i -> tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3])) AS g3
               FROM toks WHERE len(tk) >= 3),
         bench AS (SELECT DISTINCT g3 FROM g WHERE doc_id < 5)
         SELECT g.doc_id, count(DISTINCT g.g3) AS n_shared
         FROM g JOIN bench USING (g3) WHERE g.doc_id >= 5
         GROUP BY g.doc_id ORDER BY g.doc_id""",

    "q88_contamination_multi" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
                 i -> tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3])) AS g3
               FROM toks WHERE len(tk) >= 3),
         ba AS (SELECT DISTINCT 'dev' AS bench, g3 FROM g WHERE doc_id < 5
                UNION
                SELECT DISTINCT 'test' AS bench, g3 FROM g
                WHERE doc_id >= 5 AND doc_id < 10)
         SELECT g.doc_id,
                count(DISTINCT CASE WHEN ba.bench = 'dev' THEN g.g3 END) AS shared_dev,
                count(DISTINCT CASE WHEN ba.bench = 'test' THEN g.g3 END) AS shared_test
         FROM g JOIN ba ON g.g3 = ba.g3 WHERE g.doc_id >= 10
         GROUP BY g.doc_id ORDER BY g.doc_id""",

    "q93_lm_score" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         uni AS (SELECT w, count(*) AS cu
                 FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w),
         vv AS (SELECT count(*) AS v FROM uni),
         big AS (SELECT doc_id, tk[i + 1] AS a, tk[i + 2] AS b
                 FROM (SELECT doc_id, tk, unnest(range(len(tk) - 1)) AS i
                       FROM toks WHERE len(tk) >= 2)),
         bc AS (SELECT a, b, count(*) AS cb FROM big GROUP BY a, b)
         SELECT big.doc_id, count(*) AS n_big,
                round(avg(ln((bc.cb + 1.0) / (uni.cu + vv.v))), 4) AS avg_lp
         FROM big JOIN bc USING (a, b) JOIN uni ON big.a = uni.w, vv
         GROUP BY big.doc_id ORDER BY big.doc_id""",

    "q83_boilerplate" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(tk) - 1),
                 i -> tk[i + 1] || ' ' || tk[i + 2]))) AS g2
               FROM toks WHERE len(tk) >= 2),
         df AS (SELECT g2, count(*) AS df FROM g GROUP BY g2)
         SELECT g.doc_id, count(*) AS n_grams,
                round(avg(CASE WHEN df.df >= 5 THEN 1.0 ELSE 0.0 END), 4) AS boiler_frac
         FROM g JOIN df USING (g2)
         GROUP BY g.doc_id ORDER BY g.doc_id""",

    "q95_mixture_sample" ->
      """WITH h AS (
           SELECT doc_id, lang,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 10000 AS hb
           FROM documents),
         c AS (SELECT doc_id, lang,
                 CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 2
                           WHEN 'es' THEN 1 WHEN 'fr' THEN 1 ELSE 0 END
                 + CASE WHEN hb < (CASE lang WHEN 'en' THEN 5000
                                             WHEN 'es' THEN 2500 ELSE 0 END)
                        THEN 1 ELSE 0 END AS copies
               FROM h)
         SELECT doc_id, lang, CAST(unnest(range(1, copies + 1)) AS INT) AS copy
         FROM c WHERE copies >= 1 ORDER BY doc_id, copy""",

    "q84_shard_histogram" ->
      """SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 16 AS INT) AS shard,
                count(*) AS n_rows, min(doc_id) AS first_id
         FROM documents GROUP BY 1 ORDER BY shard""",

    "q75_frame_sampling" ->
      """WITH a AS (
           SELECT doc_id AS asset_id, octet_length(encode(text)) AS len
           FROM documents WHERE doc_id < 100),
         f AS (SELECT asset_id, len, unnest(range((len + 255) // 256)) AS k FROM a)
         SELECT asset_id, count(*) AS n_frames,
                CAST(sum(least(128, len - 256 * k)) AS BIGINT) AS frame_bytes_total,
                CAST(max(k) AS BIGINT) AS last_idx
         FROM f GROUP BY asset_id ORDER BY asset_id""",

    "q76_audio_envelope" ->
      // byte-accurate: iterate hex PAIRS of encode(text), not characters —
      // substr over text would count code points and diverge from the
      // engine's byte windows on any non-ASCII corpus
      """WITH h AS (
           SELECT doc_id AS asset_id, octet_length(encode(text)) AS len,
                  hex(encode(text)) AS hx
           FROM documents WHERE doc_id < 100)
         SELECT asset_id,
                CAST((len + 255) // 256 AS BIGINT) AS n_win,
                CAST(list_aggregate(
                  list_transform(
                    list_transform(range(least(len, 256)),
                      i -> CAST('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2) AS BIGINT)),
                    v -> CASE WHEN v < 128 THEN v ELSE 256 - v END),
                  'sum') AS BIGINT) AS first_sum
         FROM h ORDER BY asset_id""",

    "q53_multimodal_features" ->
      """SELECT doc_id AS asset_id,
                ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                round(CAST(length(text)
                  - length(regexp_replace(text, '[\x20-\x2f]', '', 'g')) AS DOUBLE), 4) AS f2,
                round(CAST(length(text)
                  - length(regexp_replace(text, '[\x60-\x6f]', '', 'g')) AS DOUBLE), 4) AS f6
         FROM documents WHERE doc_id < 100 ORDER BY asset_id""",

    "q56_ingest_pipeline" ->
      s"""WITH ${PortableSql.chunkCtes(size = 1200, step = 600)},
         ${PortableSql.bucketCtes("c", "chunks", "doc_id, chunk_index")},
         nrm AS (SELECT doc_id, chunk_index, sqrt(sum(wt * wt)) AS nrm
                 FROM cbuck GROUP BY doc_id, chunk_index)
         SELECT count(*) AS n_chunks, round(sum(nrm), 2) AS norm_sum FROM nrm""",

    "q160_nfc_normalize" ->
      // same deterministic decomposition ('merge' → 'me' + chr(769) +
      // 'rge'), then DuckDB's nfc_normalize is the oracle for the native
      // expression; both engines count length in code points
      """WITH dec AS (
           SELECT doc_id,
                  replace(text, 'merge', 'me' || chr(769) || 'rge') AS dtext
           FROM documents)
         SELECT doc_id,
                dtext <> nfc_normalize(dtext) AS changed,
                CAST(length(nfc_normalize(dtext)) AS BIGINT) AS norm_len,
                md5(nfc_normalize(dtext)) AS norm_hash
         FROM dec ORDER BY doc_id""",

    "q161_pii_signals" ->
      s"""WITH p AS (${PiiSql.decorated})
         SELECT doc_id,
           CAST(len(regexp_extract_all(ptext, '${PiiSql.email}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(ptext, '${PiiSql.ipv4}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(ptext, '${PiiSql.id}')) AS BIGINT) AS n_id,
           CAST(len(regexp_extract_all(ptext, '${PiiSql.phone}')) AS BIGINT) AS n_phone
         FROM p ORDER BY doc_id""",

    "q162_pii_redact" ->
      s"""WITH p AS (${PiiSql.decorated}),
         r AS (SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(ptext,
                   '${PiiSql.email}', '<EMAIL>', 'g'),
                   '${PiiSql.ipv4}', '<IP>', 'g'),
                   '${PiiSql.id}', '<ID>', 'g'),
                   '${PiiSql.phone}', '<PHONE>', 'g') AS red
               FROM p)
         SELECT doc_id,
                CAST(len(regexp_extract_all(red, '<(EMAIL|IP|ID|PHONE)>')) AS BIGINT) AS n_masks,
                md5(red) AS red_hash
         FROM r ORDER BY doc_id""",

    "q163_matryoshka_ann" -> {
      val qv = vecSql(qvecScala)
      val qv16 = vecSql(qvecScala.take(16))
      s"""WITH emb2 AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         coarse AS (
           SELECT vec_id AS id, v,
                  round(list_cosine_similarity(v[1:16], $qv16), 4) AS csim
           FROM emb2 ORDER BY csim DESC, id LIMIT 100)
         SELECT id, round(list_cosine_similarity(v, $qv), 4) AS sim
         FROM coarse ORDER BY sim DESC, id LIMIT 10"""
    },

    "q164_pagerank" -> {
      // exact k=3 kNN edges (same contract as q149's `ex` CTE), then the
      // integer power iterations unrolled: `//` is DuckDB's int division
      // (operands non-negative, so it equals Spark's `div` truncation)
      val iterCtes = (1 to 3).map { i =>
        s"""s$i AS (SELECT e.dst, sum(r.r // d.outdeg) AS s
                 FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON r.id = e.src
                 GROUP BY e.dst),
         r$i AS (SELECT n.id,
                   CAST(150000 + coalesce(s.s, 0) * 85 // 100 AS BIGINT) AS r
                 FROM nodes n LEFT JOIN s$i s ON n.id = s.dst)"""
      }.mkString(",\n         ")
      s"""WITH emb2 AS (
           SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         px AS (SELECT a.id AS src, b.id AS dst,
                  round(${PortableSql.cosSql("a.v", "b.v")}, 4) AS sim
                FROM emb2 a JOIN emb2 b ON a.id <> b.id),
         e AS (SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (PARTITION BY src
                   ORDER BY sim DESC, dst) AS rn FROM px) WHERE rn <= 3),
         deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         nodes AS (SELECT DISTINCT id FROM (
                     SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         $iterCtes
         SELECT id, r AS rank_micro FROM r3
         ORDER BY rank_micro DESC, id LIMIT 25"""
    },

    "q165_substring_search" ->
      // ground truth by direct position enumeration: every candidate
      // start where the token slice equals the pattern's token list.
      // NB: the unnest must live in its OWN CTE over toks alone —
      // unnesting inside the pattern cross join trips a DuckDB binder
      // assertion when the slice bounds reference the unnested column
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         p AS (SELECT doc_id, tk, unnest(range(len(tk))) AS s FROM toks),
         pats(pattern) AS (VALUES ('slow hash batch'), ('part filter scan'),
                                  ('key agg row scan slow'), ('alpha beta gamma')),
         ptk AS (SELECT pattern,
                   list_filter(string_split_regex(pattern, '\s+'), x -> x <> '') AS pt
                 FROM pats)
         SELECT ptk.pattern, p.doc_id AS id, CAST(p.s AS BIGINT) AS start_pos
         FROM p CROSS JOIN ptk
         WHERE p.s + len(ptk.pt) <= len(p.tk)
           AND list_slice(p.tk, p.s + 1, p.s + len(ptk.pt)) = ptk.pt
         ORDER BY pattern, id, start_pos""",

    "q166_cms_estimates" ->
      // rebuild the 4×64 count-min matrix from exact token counts with
      // the same md5 K-M bucket pair (hex chars 1-7 and 9-15-forced-odd,
      // PortableHash's MinHash split), then take min over rows per probe
      """WITH toks AS (
           SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '')) AS w
           FROM documents),
         cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
         hh AS (SELECT w, c,
                  CAST('0x' || substr(md5(w), 1, 7) AS BIGINT) AS h1,
                  CAST('0x' || substr(md5(w), 9, 7) AS BIGINT) | 1 AS h2
                FROM cnt),
         cells AS (SELECT r, (h1 + r * h2) % 64 AS b,
                          CAST(sum(c) AS BIGINT) AS cell
                   FROM hh CROSS JOIN range(4) t(r) GROUP BY 1, 2),
         probes(term) AS (VALUES ('spark'), ('window'), ('stream'),
                                 ('batch'), ('nosuchword')),
         ph AS (SELECT term,
                  CAST('0x' || substr(md5(term), 1, 7) AS BIGINT) AS h1,
                  CAST('0x' || substr(md5(term), 9, 7) AS BIGINT) | 1 AS h2
                FROM probes),
         pb AS (SELECT term, r, (h1 + r * h2) % 64 AS b
                FROM ph CROSS JOIN range(4) t(r))
         SELECT pb.term, CAST(min(coalesce(cells.cell, 0)) AS BIGINT) AS est
         FROM pb LEFT JOIN cells ON pb.r = cells.r AND pb.b = cells.b
         GROUP BY pb.term ORDER BY term""",

    "q167_corpus_diff" ->
      """WITH v1 AS (
           SELECT doc_id AS id, sha256(text) AS h FROM documents WHERE doc_id < 300),
         v2 AS (
           SELECT doc_id AS id,
                  sha256(CASE WHEN doc_id BETWEEN 150 AND 199
                              THEN text || ' v2' ELSE text END) AS h
           FROM documents WHERE doc_id >= 100)
         SELECT coalesce(v1.id, v2.id) AS id,
                CASE WHEN v1.id IS NULL THEN 'added'
                     WHEN v2.id IS NULL THEN 'removed'
                     WHEN v1.h = v2.h THEN 'unchanged'
                     ELSE 'changed' END AS status
         FROM v1 FULL OUTER JOIN v2 ON v1.id = v2.id
         ORDER BY id""",

    "q168_jl_ann" ->
      // rebuild the ±1 matrix from the same md5 parity, project corpus
      // and query, cosine in the 16-dim space
      """WITH emb2 AS (
           SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         sg AS (SELECT i, j,
                  CASE WHEN CAST('0x' || substr(md5(i || ' ' || j), 1, 15) AS BIGINT)
                            % 2 = 0
                       THEN 1.0 ELSE -1.0 END AS s
                FROM range(64) a(i) CROSS JOIN range(16) b(j)),
         pv AS (SELECT id, j, sum(v[i + 1] * s) / sqrt(16.0) AS pj
                FROM emb2 CROSS JOIN sg GROUP BY id, j),
         pl AS (SELECT id, list(pj ORDER BY j) AS pv FROM pv GROUP BY id),
         qv AS (SELECT j, sum(0.125 * s) / sqrt(16.0) AS qj FROM sg GROUP BY j),
         ql AS (SELECT list(qj ORDER BY j) AS q FROM qv)
         SELECT id, round(list_inner_product(pv, q) /
                  (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(q, q))),
                  4) AS sim
         FROM pl CROSS JOIN ql ORDER BY sim DESC, id LIMIT 10""",

    "q169_pagerank_ivf" -> {
      // q164's integer iterations verbatim, but the edge list comes from
      // same-cell pairs of the replayed IVF training (q149's pa/ap CTEs)
      val iterCtes = (1 to 3).map { i =>
        s"""s$i AS (SELECT e.dst, sum(r.r // d.outdeg) AS s
                 FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON r.id = e.src
                 GROUP BY e.dst),
         r$i AS (SELECT n.id,
                   CAST(150000 + coalesce(s.s, 0) * 85 // 100 AS BIGINT) AS r
                 FROM nodes n LEFT JOIN s$i s ON n.id = s.dst)"""
      }.mkString(",\n         ")
      s"""WITH ${PortableSql.ivfTrainCtes("g", 8)},
         px AS (SELECT a.id AS src, b.id AS dst,
                  round(${PortableSql.cosSql("a.v", "b.v")}, 4) AS sim
                FROM gbf a JOIN gbf b ON a.cid = b.cid AND a.id <> b.id),
         e AS (SELECT src, dst FROM (
                 SELECT src, dst, row_number() OVER (PARTITION BY src
                   ORDER BY sim DESC, dst) AS rn FROM px) WHERE rn <= 3),
         deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         nodes AS (SELECT DISTINCT id FROM (
                     SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         $iterCtes
         SELECT id, r AS rank_micro FROM r3
         ORDER BY rank_micro DESC, id LIMIT 25"""
    },

    "q170_winnow_against" ->
      // q131's winnowing selection over the full corpus, split into the
      // frozen (< 350) index — stop-gram pruned on its own df — and the
      // new batch (>= 300); pair counts over distinct shared hashes
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents),
         gl AS (SELECT doc_id, [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] AS gs
                FROM toks WHERE len(tk) >= 3),
         g0 AS (SELECT doc_id, unnest(gs) AS gr,
                       generate_subscripts(gs, 1) - 1 AS pos
                FROM gl),
         g AS (SELECT doc_id, pos,
                      CAST('0x' || substr(md5(gr), 1, 15) AS BIGINT) AS h
               FROM g0),
         mx AS (SELECT doc_id, max(pos) AS mp FROM g GROUP BY doc_id),
         wins AS (SELECT g.doc_id, g.pos AS i FROM g JOIN mx USING (doc_id)
                  WHERE g.pos + 3 <= mp),
         cand AS (SELECT w.doc_id, w.i, b.pos AS j, b.h
                  FROM wins w JOIN g b ON w.doc_id = b.doc_id
                    AND b.pos BETWEEN w.i AND w.i + 3),
         sel AS (SELECT doc_id, i, j, h,
                        row_number() OVER (PARTITION BY doc_id, i ORDER BY h ASC, j DESC) AS rn
                 FROM cand),
         fpd AS (SELECT DISTINCT doc_id, h FROM sel WHERE rn = 1),
         frozen AS (SELECT doc_id, h FROM fpd WHERE doc_id < 350),
         hot AS (SELECT h FROM frozen GROUP BY h HAVING count(*) > 10),
         fidx AS (SELECT * FROM frozen WHERE h NOT IN (SELECT h FROM hot)),
         newb AS (SELECT doc_id, h FROM fpd WHERE doc_id >= 300)
         SELECT n.doc_id AS id, f.doc_id AS ref_id,
                CAST(count(*) AS BIGINT) AS n_shared
         FROM newb n JOIN fidx f ON n.h = f.h
         GROUP BY 1, 2 HAVING count(*) >= 3
         ORDER BY id, ref_id""",

    "q171_edit_distance_join" ->
      // ground truth by brute force: DuckDB's levenshtein is the same
      // unit-cost metric as the engine's verify DP
      """WITH base AS (
           SELECT doc_id AS id, substr(text, 1, 16) AS s FROM documents
           UNION ALL
           SELECT doc_id + 1000, substr(text, 1, 16) || 'x'
           FROM documents WHERE doc_id < 50)
         SELECT a.id AS a_id, b.id AS b_id,
                CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
         FROM base a JOIN base b ON a.id < b.id
         WHERE levenshtein(a.s, b.s) <= 1
         ORDER BY a_id, b_id""",

    "q172_ngram_novelty" ->
      // gram-string join is collision-free ground truth for the engine's
      // md5-hash join (same distinct-per-doc gram sets)
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         gl AS (SELECT doc_id, [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] AS gs
                FROM toks WHERE len(tk) >= 3),
         g AS (SELECT DISTINCT doc_id, unnest(gs) AS gr FROM gl),
         ref AS (SELECT DISTINCT gr FROM g WHERE doc_id < 400),
         cand AS (SELECT doc_id, gr FROM g WHERE doc_id >= 400)
         SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN r.gr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                round(sum(CASE WHEN r.gr IS NULL THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 4) AS novelty
         FROM cand c LEFT JOIN ref r ON c.gr = r.gr
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    "q173_drift_kl" ->
      // q154's buckets and smoothing, KL(cand||ref) fold
      """WITH rt AS (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
                     FROM documents WHERE doc_id < 250),
         ct AS (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
                FROM documents WHERE doc_id >= 250),
         rb AS (SELECT CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 512 AS b,
                       count(*) AS cr FROM rt GROUP BY 1),
         cb AS (SELECT CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 512 AS b,
                       count(*) AS cq FROM ct GROUP BY 1),
         j AS (SELECT coalesce(rb.b, cb.b) AS b, coalesce(cr, 0) AS cr,
                      coalesce(cq, 0) AS cq
               FROM rb FULL JOIN cb ON rb.b = cb.b),
         t AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
                      CAST(sum(cq) AS BIGINT) AS nq FROM j)
         SELECT t.nr AS n_ref, t.nq AS n_cand,
                round(sum(((j.cq + 1) / CAST(t.nq + 512 AS DOUBLE))
                    * ln(((j.cq + 1) / CAST(t.nq + 512 AS DOUBLE))
                         / ((j.cr + 1) / CAST(t.nr + 512 AS DOUBLE)))), 6) AS kl
         FROM j CROSS JOIN t GROUP BY t.nr, t.nq""",

    "q174_zipf_slope" ->
      // identical moment formula so both engines agree inside 4dp
      """WITH tc AS (
           SELECT tok, count(*) AS c FROM (
             SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                      x -> x <> '')) AS tok
             FROM documents)
           GROUP BY tok ORDER BY c DESC, tok LIMIT 100),
         xy AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tok) AS DOUBLE)) AS x,
                       ln(CAST(c AS DOUBLE)) AS y
                FROM tc)
         SELECT CAST(count(*) AS BIGINT) AS n_terms,
                round((avg(x * y) - avg(x) * avg(y))
                      / (avg(x * x) - avg(x) * avg(x)), 4) AS slope
         FROM xy""",

    "q175_epoch_shuffle" ->
      """SELECT doc_id, CAST(row_number() OVER (
                  ORDER BY md5('7:' || doc_id), doc_id) AS BIGINT) AS ord
         FROM documents
         ORDER BY doc_id LIMIT 100""",

    "q176_winnow_clusters" -> {
      // q134's pair SQL as the `vp` CTE, then the shared recursive
      // min-label closure (q80's ccCtes)
      s"""WITH RECURSIVE toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
           FROM documents WHERE doc_id < 200),
         gl AS (SELECT doc_id, [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] AS gs
                FROM toks WHERE len(tk) >= 3),
         g0 AS (SELECT doc_id, unnest(gs) AS gr,
                       generate_subscripts(gs, 1) - 1 AS pos
                FROM gl),
         g AS (SELECT doc_id, pos,
                      CAST('0x' || substr(md5(gr), 1, 15) AS BIGINT) AS h
               FROM g0),
         mx AS (SELECT doc_id, max(pos) AS mp FROM g GROUP BY doc_id),
         wins AS (SELECT g.doc_id, g.pos AS i FROM g JOIN mx USING (doc_id)
                  WHERE g.pos + 3 <= mp),
         cand AS (SELECT w.doc_id, w.i, b.pos AS j, b.h
                  FROM wins w JOIN g b ON w.doc_id = b.doc_id
                    AND b.pos BETWEEN w.i AND w.i + 3),
         sel AS (SELECT doc_id, i, j, h,
                        row_number() OVER (PARTITION BY doc_id, i ORDER BY h ASC, j DESC) AS rn
                 FROM cand),
         fpd AS (SELECT DISTINCT doc_id, h FROM sel WHERE rn = 1),
         hot AS (SELECT h FROM fpd GROUP BY h HAVING count(*) > 10),
         fpr AS (SELECT * FROM fpd WHERE h NOT IN (SELECT h FROM hot)),
         vp AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
                FROM fpr a JOIN fpr b ON a.h = b.h AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 3),
         ${PortableSql.ccCtes},
         sz AS (SELECT cluster_id, count(*) AS cluster_size
                FROM cc GROUP BY cluster_id)
         SELECT cc.id AS doc_id, cc.cluster_id, sz.cluster_size
         FROM cc JOIN sz USING (cluster_id) ORDER BY doc_id"""
    },

    "q177_dedup_keep_best" ->
      // q82's recursive closure, winner per cluster by (n_chars desc,
      // id asc) instead of min id
      s"""WITH RECURSIVE ${PortableSql.minhashVerifiedPairCtes},
         ${PortableSql.ccCtes},
         scored AS (SELECT cc.id, cc.cluster_id, d.n_chars
                    FROM cc JOIN documents d ON cc.id = d.doc_id),
         win AS (SELECT cluster_id, id AS keep_id FROM (
                   SELECT cluster_id, id, row_number() OVER (
                     PARTITION BY cluster_id
                     ORDER BY n_chars DESC, id) AS rn FROM scored)
                 WHERE rn = 1),
         dropped AS (SELECT s.id FROM scored s JOIN win w USING (cluster_id)
                     WHERE s.id <> w.keep_id)
         SELECT doc_id, lang, n_chars FROM documents
         WHERE doc_id < 200 AND doc_id NOT IN (SELECT id FROM dropped)
         ORDER BY doc_id""",

    "q178_rendezvous_shards" ->
      // argmax weight per (doc, shard-count), ties toward the larger
      // shard id to match struct-max semantics
      """WITH a AS (SELECT doc_id, s,
                  CAST('0x' || substr(md5(s || ':' || doc_id), 1, 15) AS BIGINT) AS h
                FROM documents CROSS JOIN range(16) r(s)),
         r16 AS (SELECT doc_id, s AS s16 FROM (
                   SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                     ORDER BY h DESC, s DESC) AS rn FROM a) WHERE rn = 1),
         b AS (SELECT doc_id, s,
                  CAST('0x' || substr(md5(s || ':' || doc_id), 1, 15) AS BIGINT) AS h
                FROM documents CROSS JOIN range(17) r(s)),
         r17 AS (SELECT doc_id, s AS s17 FROM (
                   SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                     ORDER BY h DESC, s DESC) AS rn FROM b) WHERE rn = 1)
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
                CAST(sum(CASE WHEN s16 <> s17 AND s17 <> 16 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_moved_elsewhere,
                round(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 4) AS moved_frac
         FROM r16 JOIN r17 USING (doc_id)""",

    "q179_mad_outliers" ->
      // exact interpolated medians (quantile_cont = Spark percentile),
      // modified z at 4dp
      """WITH x AS (SELECT doc_id, CAST(CASE WHEN doc_id % 100 = 0
                      THEN n_chars * 10 ELSE n_chars END AS DOUBLE) AS x
                    FROM documents),
         m AS (SELECT quantile_cont(x, 0.5) AS med FROM x),
         md AS (SELECT quantile_cont(abs(x.x - m.med), 0.5) AS mad
                FROM x CROSS JOIN m)
         SELECT doc_id, x,
                CASE WHEN md.mad = 0 THEN 0.0
                     ELSE round(0.6745 * (x - m.med) / md.mad, 4) END AS z,
                CASE WHEN md.mad = 0 THEN FALSE
                     ELSE abs(round(0.6745 * (x - m.med) / md.mad, 4)) > 3.5
                END AS outlier
         FROM x CROSS JOIN m CROSS JOIN md
         ORDER BY doc_id""",

    "q180_mask_spans" ->
      // q100's coverage, per-token sentinel substitution instead of cut
      s"""WITH ${PortableSql.spanGramCtes},
         cov AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)),
         dropped AS (SELECT DISTINCT doc_id, pos + off AS ti
                     FROM cov CROSS JOIN range(5) r(off)),
         tokpos AS (SELECT doc_id, unnest(t) AS tok,
                           generate_subscripts(t, 1) - 1 AS ti FROM toks),
         masked AS (SELECT tp.doc_id, tp.ti,
                           CASE WHEN d.ti IS NULL THEN tp.tok ELSE '<DUP>' END AS tok,
                           CASE WHEN d.ti IS NULL THEN 0 ELSE 1 END AS m
                    FROM tokpos tp LEFT JOIN dropped d
                      ON tp.doc_id = d.doc_id AND tp.ti = d.ti)
         SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
                CAST(coalesce(sum(mk.m), 0) AS BIGINT) AS n_masked,
                md5(coalesce(string_agg(mk.tok, ' ' ORDER BY mk.ti), '')) AS text_md5
         FROM toks t LEFT JOIN masked mk ON t.doc_id = mk.doc_id
         GROUP BY t.doc_id, len(t.t) ORDER BY t.doc_id""",

    "q181_substring_counts" ->
      // split-count ground truth: len(split(text, pat)) - 1 is exactly
      // greedy non-overlapping occurrence counting
      """WITH pats(pattern) AS (VALUES ('data'), ('slow fast'), ('spark'),
                                       ('window'), ('zzznotthere'))
         SELECT d.doc_id, p.pattern,
                CAST(len(string_split(d.text, p.pattern)) - 1 AS BIGINT) AS n_hits
         FROM documents d CROSS JOIN pats p
         WHERE len(string_split(d.text, p.pattern)) > 1
         ORDER BY doc_id, pattern""",

    "q182_lm_worst_window" ->
      // q93's model CTEs + indexed bigrams; window means via an 8-row
      // frame, full windows only, worst by (wlp, start)
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         uni AS (SELECT w, count(*) AS cu
                 FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w),
         vv AS (SELECT count(*) AS v FROM uni),
         big AS (SELECT doc_id, i, tk[i + 1] AS a, tk[i + 2] AS b
                 FROM (SELECT doc_id, tk, unnest(range(len(tk) - 1)) AS i
                       FROM toks WHERE len(tk) >= 2)),
         bc AS (SELECT a, b, count(*) AS cb FROM big GROUP BY a, b),
         lp AS (SELECT big.doc_id, big.i,
                       ln((bc.cb + 1.0) / (uni.cu + vv.v)) AS lp
                FROM big JOIN bc USING (a, b) JOIN uni ON big.a = uni.w, vv),
         w AS (SELECT doc_id, i,
                 avg(lp) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wlp,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS n
               FROM lp),
         fullw AS (SELECT doc_id, i AS strt, round(wlp, 4) AS wlp
                   FROM w WHERE n = 8),
         worst AS (SELECT doc_id, strt, wlp FROM (
                     SELECT doc_id, strt, wlp, row_number() OVER (
                       PARTITION BY doc_id ORDER BY wlp, strt) AS rn
                     FROM fullw) WHERE rn = 1),
         cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
                 FROM fullw GROUP BY doc_id)
         SELECT c.doc_id, c.n_windows, CAST(wo.strt AS BIGINT) AS worst_start,
                wo.wlp AS worst_lp
         FROM cnt c JOIN worst wo USING (doc_id) ORDER BY doc_id""",

    "q183_split_balance" ->
      """WITH a AS (
           SELECT lang,
                  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                       ELSE 'test' END AS split
           FROM (SELECT lang,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     AS BIGINT) % 100 AS b
                 FROM documents) t),
         tot AS (SELECT split, count(*) AS n_split FROM a GROUP BY split)
         SELECT a.split, a.lang, CAST(count(*) AS BIGINT) AS n,
                round(count(*) / CAST(tot.n_split AS DOUBLE), 4) AS frac
         FROM a JOIN tot USING (split)
         GROUP BY a.split, a.lang, tot.n_split
         ORDER BY split, lang""",

    "q184_leakage_safe_split" ->
      // q80's recursive closure; unclustered docs represent themselves;
      // the q59 md5 bucket keyed by the representative
      s"""WITH RECURSIVE ${PortableSql.minhashVerifiedPairCtes},
         ${PortableSql.ccCtes},
         rep AS (SELECT d.doc_id,
                        coalesce(cc.cluster_id, d.doc_id) AS cluster_id
                 FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
                 WHERE d.doc_id < 200),
         b AS (SELECT doc_id, cluster_id,
                 CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100 AS bk
               FROM rep)
         SELECT doc_id, cluster_id,
                CASE WHEN bk < 90 THEN 'train' WHEN bk < 95 THEN 'val'
                     ELSE 'test' END AS split
         FROM b ORDER BY doc_id""",

    "q185_curriculum_order" ->
      // q132's 4dp quantile cuts at quartiles, bin = 1 + #cuts strictly
      // below, then row_number over (bin, md5(3:id), id)
      """WITH x AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS s FROM documents),
         cuts AS (SELECT [round(q, 4) FOR q IN
                    quantile_cont(s, [0.25, 0.5, 0.75])] AS cs FROM x),
         binned AS (SELECT doc_id, s,
                           1 + len(list_filter(cs, c -> s > c)) AS bin
                    FROM x CROSS JOIN cuts)
         SELECT doc_id, CAST(bin AS BIGINT) AS bin,
                CAST(row_number() OVER (
                  ORDER BY bin, md5('3:' || doc_id), doc_id) AS BIGINT) AS ord
         FROM binned ORDER BY doc_id""",

    "q186_minhash_calibration" ->
      // q43's signature kernel on the 80-doc slice, all pairs: matching
      // positions / 64 vs exact distinct-token Jaccard, integer 1e-4th
      // error aggregation
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(list_distinct(string_split_regex(text, '\s+')), x -> x <> '')) AS s
           FROM documents WHERE doc_id < 80 AND length(trim(text)) > 0),
         hs AS (SELECT doc_id,
                  CAST('0x' || substr(md5(s), 1, 7) AS BIGINT) AS h1,
                  CAST('0x' || substr(md5(s), 9, 7) AS BIGINT) | 1 AS h2
                FROM toks),
         sig AS (SELECT doc_id, i, min((h1 + i * h2) % 268435399) AS v
                 FROM hs CROSS JOIN range(64) r(i) GROUP BY doc_id, i),
         sets AS (SELECT doc_id,
                    list_filter(list_distinct(string_split_regex(text, '\s+')), x -> x <> '') AS tk
                  FROM documents WHERE doc_id < 80 AND length(trim(text)) > 0),
         m AS (SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
                      sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS mm
               FROM sig sa JOIN sig sb
                 ON sa.i = sb.i AND sa.doc_id < sb.doc_id
               GROUP BY 1, 2),
         ex AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.tk, b.tk))) AS exact
                FROM sets a JOIN sets b ON a.doc_id < b.doc_id),
         e AS (SELECT ex.exact, m.mm / 64.0 AS est
               FROM ex JOIN m ON ex.a_id = m.a_id AND ex.b_id = m.b_id),
         r AS (SELECT least(CAST(floor(exact * 10) AS INT), 9) AS bucket,
                      CAST(round(round(abs(est - exact), 4) * 10000, 0) AS BIGINT) AS err4
               FROM e)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_pairs,
                round(sum(err4) / (count(*) * 10000.0), 4) AS avg_abs_err,
                max(err4) / 10000.0 AS max_abs_err
         FROM r GROUP BY bucket ORDER BY bucket""",

    "q187_contrastive_triplets" -> {
      // q80's closure for positives; q164's exact-kNN pattern (k=5,
      // ids < 200) filtered to out-of-cluster neighbours, lowest rank
      s"""WITH RECURSIVE ${PortableSql.minhashVerifiedPairCtes},
         ${PortableSql.ccCtes},
         pos AS (SELECT x.id, min(y.id) AS pos_id
                 FROM cc x JOIN cc y
                   ON x.cluster_id = y.cluster_id AND x.id <> y.id
                 GROUP BY x.id),
         emb2 AS (SELECT vec_id AS id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings WHERE vec_id < 200),
         px AS (SELECT a.id AS qid, b.id AS nbr,
                  round(${PortableSql.cosSql("a.v", "b.v")}, 4) AS sim
                FROM emb2 a JOIN emb2 b ON a.id <> b.id),
         kn AS (SELECT qid, nbr, sim, row_number() OVER (PARTITION BY qid
                  ORDER BY sim DESC, nbr) AS rnk FROM px),
         k5 AS (SELECT * FROM kn WHERE rnk <= 5),
         neg AS (SELECT k.qid AS id, k.nbr, k.sim, k.rnk
                 FROM k5 k JOIN cc ca ON k.qid = ca.id
                 LEFT JOIN cc cb ON k.nbr = cb.id
                 WHERE cb.id IS NULL OR cb.cluster_id <> ca.cluster_id),
         negm AS (SELECT id, nbr AS neg_id, sim AS neg_sim FROM (
                    SELECT id, nbr, sim,
                           row_number() OVER (PARTITION BY id ORDER BY rnk) AS rr
                    FROM neg) WHERE rr = 1)
         SELECT p.id AS anchor_id, p.pos_id, n.neg_id, n.neg_sim
         FROM pos p JOIN negm n USING (id) ORDER BY anchor_id"""
    },

    "q188_novelty_against" ->
      // q172's gram-string ground truth over the shifted slices
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents),
         gl AS (SELECT doc_id, [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)] AS gs
                FROM toks WHERE len(tk) >= 3),
         g AS (SELECT DISTINCT doc_id, unnest(gs) AS gr FROM gl),
         ref AS (SELECT DISTINCT gr FROM g WHERE doc_id < 400),
         cand AS (SELECT doc_id, gr FROM g WHERE doc_id >= 350)
         SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN r.gr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                round(sum(CASE WHEN r.gr IS NULL THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 4) AS novelty
         FROM cand c LEFT JOIN ref r ON c.gr = r.gr
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    "q189_pii_matches" ->
      s"""WITH p AS (${PiiSql.decorated}),
         pats(pii_class, pat) AS (VALUES
           ('email', '${PiiSql.email}'), ('ipv4', '${PiiSql.ipv4}'),
           ('id', '${PiiSql.id}'), ('phone', '${PiiSql.phone}')),
         m AS (SELECT doc_id, pii_class,
                      unnest(regexp_extract_all(ptext, pat)) AS matched,
                      generate_subscripts(regexp_extract_all(ptext, pat), 1) AS match_no
               FROM p CROSS JOIN pats)
         SELECT doc_id, pii_class, CAST(match_no AS BIGINT) AS match_no, matched
         FROM m ORDER BY doc_id, pii_class, match_no""",

    "q190_weighted_sample" ->
      // Efraimidis-Spirakis replay: u from the md5 60-bit prefix, score
      // u^(1/w), top 50 — same IEEE pow, same selection
      """SELECT doc_id, n_chars FROM (
           SELECT doc_id, n_chars
           FROM documents
           WHERE n_chars IS NOT NULL AND n_chars > 0
           ORDER BY pow((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
                          / 1152921504606846976.0,
                        1.0 / n_chars) DESC, doc_id
           LIMIT 50)
         ORDER BY doc_id""",

    "q191_mixture_budget" ->
      // weights forced to DOUBLE so floor(budget*w) floors the same IEEE
      // product the engine computes (DECIMAL arithmetic could differ on
      // weights whose double product rounds across an integer)
      """WITH s AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))) AS BIGINT) AS tokens
           FROM documents GROUP BY source),
         w AS (SELECT source, n_docs, tokens,
                      CASE source WHEN 'src0' THEN CAST(0.4 AS DOUBLE)
                                  WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
                                  WHEN 'src2' THEN CAST(0.2 AS DOUBLE)
                                  WHEN 'src3' THEN CAST(0.05 AS DOUBLE)
                                  ELSE CAST(0.0 AS DOUBLE) END AS target_w
               FROM s)
         SELECT source, n_docs, tokens, target_w,
                CAST(floor(100000 * target_w) AS BIGINT) AS alloc_tokens,
                CAST(floor(tokens * 2.0) AS BIGINT) AS cap_tokens,
                CAST(least(floor(100000 * target_w), floor(tokens * 2.0)) AS BIGINT) AS granted_tokens,
                CASE WHEN tokens = 0 THEN 0.0
                     ELSE round(least(floor(100000 * target_w), floor(tokens * 2.0)) / tokens, 4) END AS epochs,
                CAST(floor(100000 * target_w) - least(floor(100000 * target_w), floor(tokens * 2.0)) AS BIGINT) AS shortfall
         FROM w ORDER BY source""",

    "q192_collocations" ->
      // PMI over adjacent pairs: unigram totals from token occurrences,
      // pair totals from ALL pairs (pre-prune), natural log, 4dp; the
      // rounded value orders the top-40
      """WITH toks AS (
           SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
           FROM documents),
         uc AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
         pc0 AS (SELECT p['a'] AS a, p['b'] AS b
                 FROM (SELECT unnest([{'a': t[i], 'b': t[i+1]} FOR i IN range(1, len(t))]) AS p
                       FROM toks WHERE len(t) >= 2)),
         pc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_pair
                FROM pc0 GROUP BY a, b HAVING count(*) >= 30),
         tot AS (SELECT (SELECT CAST(sum(cu) AS BIGINT) FROM uc) AS t_tok,
                        (SELECT CAST(count(*) AS BIGINT) FROM pc0) AS t_pair)
         SELECT a, b, n_pair,
                round(ln((CAST(n_pair AS DOUBLE) / t_pair)
                         / ((CAST(ua.cu AS DOUBLE) / t_tok) * (CAST(ub.cu AS DOUBLE) / t_tok))), 4) AS pmi
         FROM pc JOIN uc ua ON pc.a = ua.w JOIN uc ub ON pc.b = ub.w, tot
         ORDER BY pmi DESC, a, b LIMIT 40""",

    "q193_split_leakage" ->
      // gram-STRING join is collision-free ground truth for the engine's
      // md5-hash join (q172's stance); naive md5 split labels replayed
      """WITH base AS (
           SELECT doc_id AS id, text FROM documents
           UNION ALL
           SELECT doc_id + 5000, text FROM documents WHERE doc_id < 30),
         toks AS (SELECT id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
                  FROM base),
         grams AS (SELECT DISTINCT id, g FROM (
             SELECT id, unnest([array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)]) AS g
             FROM toks WHERE len(t) >= 5)),
         sp AS (SELECT id, CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
                FROM (SELECT id, CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
                      FROM base)),
         keepg AS (SELECT g FROM grams GROUP BY g HAVING count(*) <= 10),
         pruned AS (SELECT grams.id, grams.g FROM grams JOIN keepg USING (g)),
         lab AS (SELECT p.id, p.g, s.split FROM pruned p JOIN sp s ON p.id = s.id),
         tr AS (SELECT g, id AS train_id FROM lab WHERE split = 'train'),
         ev AS (SELECT g, id AS eval_id, split FROM lab WHERE split <> 'train')
         SELECT train_id, eval_id, split, CAST(count(*) AS BIGINT) AS n_shared
         FROM tr JOIN ev USING (g)
         GROUP BY train_id, eval_id, split
         HAVING count(*) >= 1
         ORDER BY train_id, eval_id""",

    "q194_scrub_chain" ->
      // q127's line scrub feeding q128's span scrub: the facade chain as
      // one composed replay — scrubbed batch text re-grams against the
      // RAW corpus (< 400) repeated-gram table, kept tokens rebuild
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
           FROM documents),
         wrapped AS (
           SELECT doc_id, CASE WHEN len(t) = 0 THEN ''
                  ELSE array_to_string([array_to_string(t[(i*4+1):(i*4+4)], ' ')
                                        FOR i IN range(0, CAST(ceil(len(t)/4.0) AS INT))], chr(10)) END AS wtext
           FROM toks),
         ls AS (SELECT doc_id, string_split(wtext, chr(10)) AS ll FROM wrapped),
         lines AS (SELECT doc_id, unnest(ll) AS line, generate_subscripts(ll, 1) AS pos FROM ls),
         freq AS (SELECT line FROM lines WHERE trim(line) <> '' AND doc_id < 400
                  GROUP BY line HAVING count(DISTINCT doc_id) >= 3),
         scrub AS (SELECT l.doc_id,
                          coalesce(string_agg(CASE WHEN trim(l.line) = '' OR f.line IS NULL THEN l.line END,
                                              chr(10) ORDER BY l.pos), '') AS stext
                   FROM lines l LEFT JOIN freq f ON l.line = f.line
                   WHERE l.doc_id >= 400 GROUP BY l.doc_id),
         rep AS (SELECT g FROM (
                   SELECT doc_id, unnest([array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)]) AS g
                   FROM toks WHERE len(t) >= 5 AND doc_id < 400)
                 GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
         btoks AS (SELECT doc_id, list_filter(string_split_regex(stext, '\s+'), x -> x <> '') AS t
                   FROM scrub),
         bgl AS (SELECT doc_id, [array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)] AS gs
                 FROM btoks WHERE len(t) >= 5),
         bgrams AS (SELECT doc_id, unnest(gs) AS g, generate_subscripts(gs, 1) - 1 AS pos FROM bgl),
         cov AS (SELECT doc_id, pos FROM bgrams JOIN rep USING (g)),
         dropped AS (SELECT DISTINCT doc_id, pos + off AS ti FROM cov CROSS JOIN range(5) r(off)),
         tokpos AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS ti FROM btoks),
         kept AS (SELECT tp.doc_id, tp.tok, tp.ti
                  FROM tokpos tp LEFT JOIN dropped d
                    ON tp.doc_id = d.doc_id AND tp.ti = d.ti
                  WHERE d.ti IS NULL)
         SELECT b.doc_id,
                CAST(count(k.ti) AS BIGINT) AS n_tokens,
                md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), '')) AS text_md5
         FROM btoks b LEFT JOIN kept k ON b.doc_id = k.doc_id
         GROUP BY b.doc_id ORDER BY b.doc_id""",

    "q195_drift_ks" ->
      // CDF walk over the joined distinct-value table; supremum by exact
      // HUGEINT cross-product comparison (same integers the engine's
      // decimal(38) fold compares), ties -> smallest value
      """WITH r AS (SELECT CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS DOUBLE) AS x
                    FROM documents WHERE doc_id < 250),
         c AS (SELECT CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS DOUBLE) AS x
               FROM documents WHERE doc_id >= 250),
         rc AS (SELECT x, count(*) AS cr FROM r GROUP BY x),
         cc AS (SELECT x, count(*) AS cq FROM c GROUP BY x),
         j AS (SELECT coalesce(rc.x, cc.x) AS x, coalesce(cr, 0) AS cr, coalesce(cq, 0) AS cq
               FROM rc FULL JOIN cc ON rc.x = cc.x),
         t AS (SELECT (SELECT sum(cr) FROM j) AS nr, (SELECT sum(cq) FROM j) AS nq),
         cum AS (SELECT x, sum(cr) OVER (ORDER BY x) AS sr, sum(cq) OVER (ORDER BY x) AS sq FROM j),
         sc AS (SELECT x, abs(CAST(sr AS HUGEINT) * nq - CAST(sq AS HUGEINT) * nr) AS dnum
                FROM cum, t),
         m AS (SELECT max(dnum) AS mx FROM sc)
         SELECT CAST(nr AS BIGINT) AS n_ref, CAST(nq AS BIGINT) AS n_cand,
                round(CAST(mx AS DOUBLE) / (CAST(nr AS DOUBLE) * CAST(nq AS DOUBLE)), 6) AS ks,
                (SELECT min(x) FROM sc WHERE dnum = mx) AS ks_at
         FROM t, m""",

    "q196_encoding_artifacts" ->
      // identical deterministic decoration (chr codepoints) + RE2 \x{..}
      // classes mirroring the engine's Java-regex ranges
      """WITH p AS (
           SELECT doc_id,
                  text
                  || CASE WHEN doc_id % 3 = 0 THEN ' caf' || chr(65533) ELSE '' END
                  || CASE WHEN doc_id % 4 = 0 THEN ' caf' || chr(195) || chr(169) || ' don' || chr(226) || chr(128) || chr(153) || 't' ELSE '' END
                  || CASE WHEN doc_id % 5 = 0 THEN ' bell' || chr(7) ELSE '' END AS ptext
           FROM documents)
         SELECT doc_id AS id,
                CAST(len(regexp_extract_all(ptext, '\x{FFFD}')) AS BIGINT) AS n_replacement,
                CAST(len(regexp_extract_all(ptext, '[\x{C3}\x{C2}][\x{80}-\x{BF}]'))
                   + len(regexp_extract_all(ptext, '\x{E2}[\x{80}-\x{BF}][\x{80}-\x{BF}]')) AS BIGINT) AS n_double_utf8,
                CAST(len(regexp_extract_all(ptext, '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]')) AS BIGINT) AS n_control,
                (len(regexp_extract_all(ptext, '\x{FFFD}'))
                 + len(regexp_extract_all(ptext, '[\x{C3}\x{C2}][\x{80}-\x{BF}]'))
                 + len(regexp_extract_all(ptext, '\x{E2}[\x{80}-\x{BF}][\x{80}-\x{BF}]'))
                 + len(regexp_extract_all(ptext, '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]'))) = 0 AS clean
         FROM p ORDER BY id""",

    "q197_distinct_n" ->
      // gram-string distinct counts are collision-free ground truth for
      // the engine's md5-hash distinct counts
      """WITH toks AS (
           SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
           FROM documents),
         g1 AS (SELECT unnest(t) AS g FROM toks),
         g2 AS (SELECT unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]) AS g
                FROM toks WHERE len(t) >= 2),
         g3 AS (SELECT unnest([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS g
                FROM toks WHERE len(t) >= 3)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS total_grams,
                  CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams,
                  round(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 4) AS distinct_ratio
           FROM g1
           UNION ALL
           SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
                  CAST(count(DISTINCT g) AS BIGINT),
                  round(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 4)
           FROM g2
           UNION ALL
           SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
                  CAST(count(DISTINCT g) AS BIGINT),
                  round(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 4)
           FROM g3)
         ORDER BY n""",

    "q198_simhash_against" ->
      // q46's 60-bit md5 simhash replay, banded batch-vs-frozen instead
      // of self-join; overlap ids self-match at hamming 0
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
           FROM documents WHERE length(trim(text)) > 0),
         h AS (
           SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
           FROM toks),
         bits AS (
           SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS c
           FROM h CROSS JOIN range(60) r(b) GROUP BY doc_id, b),
         sig AS (
           SELECT doc_id,
                  sum(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS sig
           FROM bits GROUP BY doc_id),
         chunks AS (
           SELECT doc_id, sig, c, (sig >> (15 * c)) & 32767 AS chunk
           FROM sig CROSS JOIN range(4) r(c)),
         cand AS (
           SELECT DISTINCT b.doc_id AS id, f.doc_id AS ref_id,
                  b.sig AS sb, f.sig AS sf
           FROM chunks b JOIN chunks f
             ON b.c = f.c AND b.chunk = f.chunk
           WHERE b.doc_id >= 300 AND f.doc_id < 350)
         SELECT id, ref_id, CAST(bit_count(xor(sb, sf)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sb, sf)) <= 20
         ORDER BY id, ref_id""",

    "q199_lang_confusion" ->
      // q49's classifier replay aggregated into the declared x predicted
      // routing matrix with per-declared shares
      """WITH h AS (
           SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         c AS (
           SELECT doc_id, lang,
             len(list_filter(tk, x -> list_contains(['the','and','of','to','in','is','that','with'], x))) AS en,
             len(list_filter(tk, x -> list_contains(['el','la','de','que','y','los','las','por'], x))) AS es,
             len(list_filter(tk, x -> list_contains(['le','la','les','des','est','une','dans','pour'], x))) AS fr,
             len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) AS de
           FROM h),
         p AS (
           SELECT lang AS declared,
             CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                  WHEN en = greatest(en, es, fr, de) THEN 'en'
                  WHEN es = greatest(en, es, fr, de) THEN 'es'
                  WHEN fr = greatest(en, es, fr, de) THEN 'fr'
                  ELSE 'de' END AS pred
           FROM c),
         m AS (SELECT declared, pred, CAST(count(*) AS BIGINT) AS n
               FROM p GROUP BY declared, pred),
         t AS (SELECT declared, sum(n) AS nd FROM m GROUP BY declared)
         SELECT m.declared AS declared, m.pred AS pred, m.n AS n,
                round(CAST(m.n AS DOUBLE) / t.nd, 4) AS frac
         FROM m JOIN t ON m.declared = t.declared
         ORDER BY m.declared, m.pred""",

    "q200_lm_score_against" ->
      // q93's formula with the model CTEs restricted to the clean
      // reference slice and LEFT joins smoothing unseen counts to 0
      """WITH rtoks AS (
           SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents WHERE doc_id < 400 AND lang = 'en'),
         uni AS (SELECT w, count(*) AS cu
                 FROM (SELECT unnest(tk) AS w FROM rtoks) GROUP BY w),
         vv AS (SELECT count(*) AS v FROM uni),
         rbig AS (SELECT tk[i + 1] AS a, tk[i + 2] AS b
                  FROM (SELECT tk, unnest(range(len(tk) - 1)) AS i
                        FROM rtoks WHERE len(tk) >= 2)),
         bc AS (SELECT a, b, count(*) AS cb FROM rbig GROUP BY a, b),
         ctoks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
           FROM documents WHERE doc_id >= 300),
         cbig AS (SELECT doc_id, tk[i + 1] AS a, tk[i + 2] AS b
                  FROM (SELECT doc_id, tk, unnest(range(len(tk) - 1)) AS i
                        FROM ctoks WHERE len(tk) >= 2))
         SELECT cbig.doc_id AS doc_id, count(*) AS n_big,
                round(avg(ln((coalesce(bc.cb, 0) + 1.0) / (coalesce(uni.cu, 0) + vv.v))), 4) AS avg_lp
         FROM cbig LEFT JOIN bc ON cbig.a = bc.a AND cbig.b = bc.b
                   LEFT JOIN uni ON cbig.a = uni.w, vv
         GROUP BY cbig.doc_id ORDER BY doc_id""",

    "q201_weighted_stratum_sample" ->
      // window replay of the bounded aggregator: row_number over
      // (u^(1/w) DESC, id) per language, top 10
      """SELECT lang AS stratum, CAST(rnk AS BIGINT) AS rnk, doc_id AS id
         FROM (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang ORDER BY
                    pow((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
                          / 1152921504606846976.0,
                        1.0 / n_chars) DESC, doc_id) AS rnk
           FROM documents
           WHERE n_chars IS NOT NULL AND n_chars > 0)
         WHERE rnk <= 10
         ORDER BY stratum, rnk""",

    "q202_cluster_topics" ->
      // ivfTrainSql re-trains q66's centroids bit-for-bit; bf(id, v, cid)
      // is the full assignment the cluster-tf-idf aggregates over
      s"""${PortableSql.ivfTrainSql}
         terms AS (SELECT bf.cid AS cluster,
                          unnest(list_filter(string_split_regex(trim(d.text), '\\s+'), x -> x <> '')) AS term
                   FROM documents d JOIN bf ON d.doc_id = bf.id),
         ct AS (SELECT cluster, term, count(*) AS tf FROM terms GROUP BY cluster, term),
         kk AS (SELECT count(DISTINCT cluster) AS k FROM ct),
         dft AS (SELECT term, count(*) AS df FROM ct GROUP BY term),
         scored AS (SELECT ct.cluster, ct.term,
                           round(ct.tf * ln((kk.k + 1) / CAST(dft.df + 1 AS DOUBLE)), 4) AS s
                    FROM ct JOIN dft USING (term), kk),
         r AS (SELECT cluster, term, s,
                      row_number() OVER (PARTITION BY cluster ORDER BY s DESC, term) AS rnk
               FROM scored)
         SELECT cluster, CAST(rnk AS BIGINT) AS rnk, term, s AS score
         FROM r WHERE rnk <= 5 ORDER BY cluster, rnk""",

    "q203_soft_dedup" ->
      // q80's connected components, then weight = 1/cluster_size for
      // members, 1.0 (null cluster) for everyone else
      s"""WITH RECURSIVE ${PortableSql.minhashVerifiedPairCtes},
         ${PortableSql.ccCtes},
         sz AS (SELECT cluster_id, count(*) AS n FROM cc GROUP BY cluster_id)
         SELECT d.doc_id, cc.cluster_id,
                round(COALESCE(1.0 / sz.n, 1.0), 4) AS w
         FROM documents d
         LEFT JOIN cc ON d.doc_id = cc.id
         LEFT JOIN sz USING (cluster_id)
         WHERE d.doc_id < 200 ORDER BY d.doc_id""",

    "q204_latest_snapshot" ->
      """SELECT user_id, event_type, event_id, round(value, 4) AS v
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id ASC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",

    "q205_preference_pairs" ->
      """WITH b AS (SELECT lang || '|' || source AS grp, doc_id, n_chars
                    FROM documents WHERE n_chars IS NOT NULL),
         r AS (SELECT grp, doc_id, n_chars,
                      row_number() OVER (PARTITION BY grp
                        ORDER BY n_chars DESC, doc_id ASC) AS hi,
                      row_number() OVER (PARTITION BY grp
                        ORDER BY n_chars ASC, doc_id ASC) AS lo,
                      count(*) OVER (PARTITION BY grp) AS n
               FROM b)
         SELECT c.grp, c.doc_id AS chosen_id, c.n_chars AS chosen_score,
                j.doc_id AS rejected_id, j.n_chars AS rejected_score,
                c.n_chars - j.n_chars AS margin, c.n AS n_candidates
         FROM (SELECT * FROM r WHERE hi = 1) c
         JOIN (SELECT * FROM r WHERE lo = 1) j USING (grp)
         WHERE c.n_chars - j.n_chars > 0 ORDER BY grp""",

    "q206_semantic_decontam" ->
      s"""WITH e AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
         m AS (SELECT c.vec_id AS id, b.vec_id AS bid,
                      round(list_cosine_similarity(c.v, b.v), 4) AS sim
               FROM e c CROSS JOIN e b
               WHERE c.vec_id >= 25 AND b.vec_id < 25
                 AND round(list_cosine_similarity(c.v, b.v), 4) >= 0.40),
         r AS (SELECT id, bid, sim,
                      row_number() OVER (PARTITION BY id
                        ORDER BY sim DESC, bid ASC) AS rn,
                      count(*) OVER (PARTITION BY id) AS n
               FROM m)
         SELECT id, bid AS bench_id, sim AS max_sim,
                CAST(n AS BIGINT) AS n_matches
         FROM r WHERE rn = 1 ORDER BY id""",

    "q207_retrieval_metrics" -> {
      val qv1 = vecSql(qvecScala)
      val qv2 = vecSql(qvec2Scala)
      // truth = exact top-10 per query; system = q79's IVF replay at
      // k=10; binary-relevance recall/MRR/nDCG with log2 discounts
      s"""${PortableSql.ivfTrainSql}
         q(query_id, qvec) AS (VALUES ('qa', $qv1), ('qb', $qv2)),
        gt AS (SELECT query_id, id FROM
                 (SELECT q.query_id, bf.id,
                         row_number() OVER (PARTITION BY q.query_id
                           ORDER BY round(${PortableSql.cosSql("bf.v", "q.qvec")}, 4) DESC,
                                    bf.id) AS rnk
                  FROM bf CROSS JOIN q) WHERE rnk <= 10),
         pr AS (SELECT query_id, cid FROM
                 (SELECT q.query_id, c.cid,
                         row_number() OVER (PARTITION BY q.query_id
                           ORDER BY ${PortableSql.cosSql("q.qvec", "c.c")} DESC, c.cid) AS rn
                  FROM q CROSS JOIN c2 c) WHERE rn <= 2),
         sys AS (SELECT query_id, id, rnk FROM
                 (SELECT pr.query_id, bf.id,
                         row_number() OVER (PARTITION BY pr.query_id
                           ORDER BY round(${PortableSql.cosSql("bf.v", "q.qvec")}, 4) DESC,
                                    bf.id) AS rnk
                  FROM bf JOIN pr ON bf.cid = pr.cid
                          JOIN q ON q.query_id = pr.query_id)
                 WHERE rnk <= 10),
         hits AS (SELECT s.query_id, count(*) AS n_hits, min(s.rnk) AS fh,
                      sum(1.0 / log2(s.rnk + 1)) AS dcg
               FROM sys s JOIN gt t ON s.query_id = t.query_id AND s.id = t.id
               GROUP BY s.query_id),
         nrel AS (SELECT query_id, count(*) AS n_rel FROM gt GROUP BY query_id),
         ideal AS (SELECT query_id,
                      list_sum(list_transform(range(1, least(n_rel, 10) + 1),
                        x -> 1.0 / log2(x + 1))) AS idcg
               FROM nrel)
         SELECT nrel.query_id,
                round(COALESCE(hits.n_hits, 0) / CAST(nrel.n_rel AS DOUBLE), 4) AS recall,
                round(COALESCE(1.0 / hits.fh, 0), 4) AS mrr,
                round(COALESCE(hits.dcg, 0) / ideal.idcg, 4) AS ndcg
         FROM nrel LEFT JOIN hits USING (query_id) JOIN ideal USING (query_id)
         ORDER BY query_id"""
    },

    "q208_fim_transform" ->
      """WITH p AS (SELECT doc_id, text, length(text) AS n,
                CAST('0x' || substr(md5(doc_id || ':fim'), 1, 15) AS BIGINT) % 100 < 50
                  AND length(text) > 0 AS sel,
                CAST('0x' || substr(md5(doc_id || ':fima'), 1, 15) AS BIGINT)
                  % (length(text) + 1) AS lo
              FROM documents),
         q AS (SELECT *, CAST('0x' || substr(md5(doc_id || ':fimb'), 1, 15) AS BIGINT)
                  % (n + 1 - lo) AS mid FROM p)
         SELECT doc_id AS id, sel AS fim,
                CASE WHEN sel THEN
                  '<PRE>' || substr(text, 1, CAST(lo AS INT))
                  || '<SUF>' || substr(text, CAST(lo + mid + 1 AS INT), CAST(n - lo - mid AS INT))
                  || '<MID>' || substr(text, CAST(lo + 1 AS INT), CAST(mid AS INT))
                ELSE text END AS out_text
         FROM q ORDER BY id""",

    "q209_span_corruption" ->
      """WITH toks AS (SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
              FROM documents),
         tok AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS t,
                        generate_subscripts(tk, 1) - 1 AS i FROM toks),
         c AS (SELECT doc_id, t, i, i // 8 AS b, i % 8 AS w,
                      least(8, n - (i // 8) * 8) AS bl FROM tok),
         o AS (SELECT *, CASE WHEN bl >= 2 THEN
                  CAST('0x' || substr(md5(doc_id || ':sc:' || b), 1, 15) AS BIGINT)
                    % (bl - 1) ELSE -1 END AS off FROM c),
         cl AS (SELECT doc_id, t, i, b,
                       CASE WHEN off >= 0 AND w = off THEN 1
                            WHEN off >= 0 AND w > off AND w < off + 2 THEN 2
                            ELSE 0 END AS cls FROM o),
         inp AS (SELECT doc_id,
                        string_agg(CASE WHEN cls = 1 THEN '<extra_id_' || b || '>'
                                        ELSE t END, ' ' ORDER BY i) AS input
                 FROM cl WHERE cls <> 2 GROUP BY doc_id),
         tg AS (SELECT doc_id,
                       string_agg(CASE WHEN cls = 1 THEN '<extra_id_' || b || '> ' || t
                                       ELSE t END, ' ' ORDER BY i) AS target
                FROM cl WHERE cls >= 1 GROUP BY doc_id),
         ns AS (SELECT doc_id, count(*) AS n_spans FROM cl WHERE cls = 1
                GROUP BY doc_id)
         SELECT d.doc_id AS id, COALESCE(inp.input, '') AS input,
                COALESCE(tg.target, '') AS target,
                CAST(COALESCE(ns.n_spans, 0) AS BIGINT) AS n_spans
         FROM documents d
         LEFT JOIN inp USING (doc_id) LEFT JOIN tg USING (doc_id)
         LEFT JOIN ns USING (doc_id)
         ORDER BY id""",

    "q210_domain_gate" ->
      """SELECT source, count(*) AS n_docs,
                round(avg(CAST(n_chars AS DOUBLE)), 4) AS mean_score,
                round(avg(CASE WHEN n_chars < 400 THEN 1.0 ELSE 0.0 END), 4) AS low_share,
                COALESCE(round(avg(CAST(n_chars AS DOUBLE)), 4) >= 300
                  AND round(avg(CASE WHEN n_chars < 400 THEN 1.0 ELSE 0.0 END), 4) <= 0.75,
                  false) AS keep
         FROM documents WHERE n_chars IS NOT NULL
         GROUP BY source ORDER BY source""",

    "q211_embedding_drift" ->
      s"""${PortableSql.ivfTrainSql}
         per AS (SELECT bf.cid AS cluster,
                        count(*) FILTER (WHERE bf.id < 250) AS n_ref,
                        count(*) FILTER (WHERE bf.id >= 250) AS n_new,
                        avg(${PortableSql.cosSql("bf.v", "c2.c")})
                          FILTER (WHERE bf.id < 250) AS mc_ref,
                        avg(${PortableSql.cosSql("bf.v", "c2.c")})
                          FILTER (WHERE bf.id >= 250) AS mc_new
                 FROM bf JOIN c2 ON bf.cid = c2.cid GROUP BY bf.cid),
         tt AS (SELECT sum(n_ref) AS tr, sum(n_new) AS tn FROM per)
         SELECT CAST(cluster AS BIGINT) AS cluster,
                CAST(n_ref AS BIGINT) AS n_ref, CAST(n_new AS BIGINT) AS n_new,
                round(((n_ref + 1) / CAST(tr + 8 AS DOUBLE)
                       - (n_new + 1) / CAST(tn + 8 AS DOUBLE))
                      * ln(((n_ref + 1) / CAST(tr + 8 AS DOUBLE))
                           / ((n_new + 1) / CAST(tn + 8 AS DOUBLE))), 6) AS psi_term,
                round(COALESCE(mc_ref, 0), 4) AS mean_cos_ref,
                round(COALESCE(mc_new, 0), 4) AS mean_cos_new,
                round(COALESCE(mc_new, 0) - COALESCE(mc_ref, 0), 4) AS cos_shift
         FROM per CROSS JOIN tt ORDER BY cluster""",

    "q212_bitext_mining" ->
      """WITH e AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
         pr AS (SELECT a.vec_id AS aid, b.vec_id AS bid,
                       round(list_cosine_similarity(a.v, b.v), 4) AS c
                FROM e a CROSS JOIN e b
                WHERE a.vec_id < 60 AND b.vec_id >= 60 AND b.vec_id < 160),
         da AS (SELECT aid, avg(c) AS d FROM
                 (SELECT aid, c, row_number() OVER (PARTITION BY aid
                    ORDER BY c DESC, bid) AS rn FROM pr)
                WHERE rn <= 4 GROUP BY aid),
         db AS (SELECT bid, avg(c) AS d FROM
                 (SELECT bid, c, row_number() OVER (PARTITION BY bid
                    ORDER BY c DESC, aid) AS rn FROM pr)
                WHERE rn <= 4 GROUP BY bid),
         fwd AS (SELECT aid, bid, c FROM
                 (SELECT *, row_number() OVER (PARTITION BY aid
                    ORDER BY c DESC, bid) AS rn FROM pr) WHERE rn = 1),
         bwd AS (SELECT bid, aid AS best_a FROM
                 (SELECT *, row_number() OVER (PARTITION BY bid
                    ORDER BY c DESC, aid) AS rn FROM pr) WHERE rn = 1)
         SELECT f.aid AS a_id, f.bid AS b_id, f.c AS cos,
                round(f.c / ((da.d + db.d) / 2), 4) AS margin,
                (bwd.best_a = f.aid) AS mutual
         FROM fwd f JOIN da ON f.aid = da.aid JOIN db ON f.bid = db.bid
                    JOIN bwd ON f.bid = bwd.bid
         WHERE round(f.c / ((da.d + db.d) / 2), 4) >= 1.1
         ORDER BY a_id""",

    "q213_conversations" ->
      """WITH turns AS (SELECT user_id AS conv_id, ts, event_id,
                CASE WHEN event_type IN ('click', 'view', 'purchase')
                     THEN 'user' ELSE 'assistant' END AS r,
                event_type || ':' || CAST(floor(value) AS BIGINT) AS t
              FROM events),
         g AS (SELECT conv_id,
                      list(struct_pack(r := r, t := t)
                           ORDER BY ts, event_id) AS turns
               FROM turns GROUP BY conv_id)
         SELECT conv_id, CAST(len(turns) AS BIGINT) AS n_turns,
                turns[1].r = 'user' AND
                  len([i FOR i IN range(2, len(turns) + 1)
                       IF turns[i].r = turns[i - 1].r]) = 0 AS valid,
                array_to_string(list_transform(turns,
                  x -> '<|' || x.r || '|> ' || x.t), chr(10)) AS text
         FROM g ORDER BY conv_id""",

    "q214_domain_reweight" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
                round(avg(ln(1000.0 / n_chars)), 6) AS ml
              FROM documents
              WHERE n_chars IS NOT NULL GROUP BY source),
         p2 AS (SELECT *, 0.05 AS w_ref, 0.05 * exp(0.5 * ml) AS raw FROM per),
         tt AS (SELECT sum(raw) AS z, count(*) AS k FROM p2)
         SELECT source, n_docs, round(ml, 4) AS mean_loss, w_ref,
                round(0.9 * raw / z + 0.1 / k, 6) AS w_new
         FROM p2 CROSS JOIN tt ORDER BY source""",

    "q215_score_calibrate" ->
      """WITH b AS (SELECT doc_id AS id, source,
                CAST(n_chars AS DOUBLE) AS score
              FROM documents WHERE n_chars IS NOT NULL),
         c AS (SELECT source, score, count(*) AS c FROM b GROUP BY source, score),
         w AS (SELECT source, score,
                      sum(c) OVER (PARTITION BY source ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                      c, sum(c) OVER (PARTITION BY source) AS n
               FROM c)
         SELECT b.id, b.source, b.score,
                round((w.cum - w.c / 2.0) / w.n, 6) AS calibrated
         FROM b JOIN w ON b.source = w.source AND b.score = w.score
         ORDER BY b.id""",

    "q216_temperature_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         r AS (SELECT lang, pow(CAST(n AS DOUBLE), -0.5) AS ratio FROM c),
         z AS (SELECT max(ratio) AS zm FROM r),
         rt AS (SELECT lang, round(ratio / zm, 6) AS rate FROM r CROSS JOIN z)
         SELECT d.doc_id, d.lang, rt.rate
         FROM documents d JOIN rt USING (lang)
         WHERE (CAST('0x' || substr(md5(d.doc_id || ':ts'), 1, 15) AS BIGINT) + 1)
                 / 1152921504606846976.0 < rt.rate
         ORDER BY doc_id""",

    "q217_url_dedup" ->
      """WITH u AS (SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END
                || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
                || 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                || CASE WHEN doc_id % 4 = 0 THEN
                     CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END
                   ELSE '' END
                || '/p/' || CAST(doc_id % 50 AS VARCHAR)
                || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
                || CASE WHEN doc_id % 3 = 1 THEN '?utm_source=news&fbclid=abc' ELSE '' END
                || CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END AS url
              FROM documents),
         c AS (SELECT doc_id,
                regexp_replace(
                 regexp_replace(
                  regexp_replace(
                   regexp_replace(
                    regexp_replace(
                     regexp_replace(
                      regexp_replace(
                       regexp_replace(url, '#.*$', '', 'g'),
                       '(utm_[a-z]+|fbclid|gclid)=[^&#]*&?', '', 'g'),
                      '\?&', '?', 'g'),
                     '[?&]$', '', 'g'),
                    '^(http://[^/:]+):80(/|$)', '\1\2', 'g'),
                   '^(https://[^/:]+):443(/|$)', '\1\2', 'g'),
                  '^(https?://)www\.', '\1', 'g'),
                 '/$', '', 'g') AS canon_url
               FROM u)
         SELECT canon_url, count(*) AS n, min(doc_id) AS keep
         FROM c GROUP BY canon_url HAVING count(*) > 1
         ORDER BY canon_url""",

    "q218_readability" ->
      """SELECT doc_id AS id,
                CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '')) AS BIGINT) AS words,
                CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
                  AS sentences,
                CAST(len(regexp_extract_all(text, '(?i)[aeiouy]+')) AS BIGINT)
                  AS syllables,
                CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) = 0 THEN NULL
                ELSE round(206.835
                  - 1.015 * len(list_filter(string_split_regex(trim(text), '\s+'),
                      x -> x <> ''))
                    / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  - 84.6 * len(regexp_extract_all(text, '(?i)[aeiouy]+'))
                    / CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                        x -> x <> '')) AS DOUBLE), 4) END AS flesch
         FROM documents ORDER BY id""",

    "q219_silhouette" ->
      s"""${PortableSql.ivfTrainSql}
         per AS (SELECT bf.id, bf.cid AS own, c2.cid,
                        ${PortableSql.cosSql("bf.v", "c2.c")} AS cs
                 FROM bf CROSS JOIN c2),
         ab AS (SELECT id, own,
                       1 - max(CASE WHEN cid = own THEN cs END) AS a,
                       1 - max(CASE WHEN cid <> own THEN cs END) AS b
                FROM per GROUP BY id, own)
         SELECT CAST(own AS BIGINT) AS cluster, count(*) AS n,
                round(avg(CASE WHEN greatest(a, b) = 0 THEN 0
                               ELSE (b - a) / greatest(a, b) END), 4)
                  AS mean_silhouette
         FROM ab GROUP BY own ORDER BY cluster""",

    "q224_packing_report" ->
      """WITH tok AS (
           SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS t
           FROM documents),
         c AS (SELECT doc_id, t,
                      COALESCE(sum(t) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
               FROM tok),
         bins AS (SELECT CAST(cb // 512 AS BIGINT) AS bin,
                         CAST(sum(t) AS BIGINT) AS tokens
                  FROM c GROUP BY bin)
         SELECT count(*) AS n_bins, CAST(sum(tokens) AS BIGINT) AS total_tokens,
                round(avg(tokens / 512.0), 4) AS mean_util,
                round(min(tokens / 512.0), 4) AS min_util,
                round(max(tokens / 512.0), 4) AS max_util,
                round(1.0 - sum(tokens) / CAST(count(*) * 512 AS DOUBLE), 4)
                  AS waste_frac
         FROM bins""",

    "q225_dedup_saturation" ->
      s"""WITH ${PortableSql.minhashVerifiedPairCtes},
         d AS (SELECT DISTINCT b_id FROM vp),
         pf(prefix_n) AS (VALUES (25), (50), (75), (100), (125), (150), (175), (200)),
         dc AS (SELECT prefix_n, count(*) AS n_dup_docs
                FROM d JOIN pf ON d.b_id < pf.prefix_n GROUP BY prefix_n),
         nc AS (SELECT prefix_n, count(*) AS n_docs
                FROM documents JOIN pf ON doc_id < prefix_n
                WHERE doc_id < 200 GROUP BY prefix_n)
         SELECT CAST(nc.prefix_n AS BIGINT) AS prefix_n, nc.n_docs,
                CAST(COALESCE(dc.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
                round(COALESCE(dc.n_dup_docs, 0) / CAST(nc.n_docs AS DOUBLE), 4)
                  AS dup_rate
         FROM nc LEFT JOIN dc ON nc.prefix_n = dc.prefix_n
         ORDER BY prefix_n""",

    "q226_token_truncate" ->
      """WITH tk AS (SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '') AS t
              FROM documents)
         SELECT doc_id AS id,
                md5(CASE WHEN len(t) <= 60 THEN array_to_string(t, ' ')
                     ELSE array_to_string(
                       list_concat(list_concat(t[1:30], ['…']),
                         t[-29:]), ' ') END) AS kept_md5,
                CAST(len(t) AS BIGINT) AS n_tokens,
                CAST(CASE WHEN len(t) <= 60 THEN len(t)
                     ELSE least(60, len(t)) END AS BIGINT) AS n_kept,
                len(t) > 60 AS truncated
         FROM tk ORDER BY id""",

    "q227_link_graph" ->
      """WITH u AS (SELECT doc_id,
                'https://site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.com/p/' || CAST(doc_id % 50 AS VARCHAR) AS t1,
                CASE WHEN doc_id % 3 = 0 THEN
                  'http://site' || CAST((doc_id + 1) % 7 AS VARCHAR)
                  || '.example.com/p/' || CAST((doc_id + 13) % 50 AS VARCHAR)
                END AS t2
              FROM documents),
         e AS (SELECT t1 AS target FROM u
               UNION ALL
               SELECT t2 FROM u WHERE t2 IS NOT NULL)
         SELECT target, count(*) AS in_degree
         FROM e GROUP BY target ORDER BY target""",

    "q228_section_split" ->
      """WITH md AS (SELECT doc_id,
                'preamble notes' || chr(10)
                || '# Title ' || CAST(doc_id AS VARCHAR) || chr(10)
                || array_to_string(list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '')[1:8], ' ') || chr(10)
                || '## Details' || chr(10)
                || array_to_string(list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '')[9:16], ' ') AS m
              FROM documents),
         l AS (SELECT doc_id, string_split(m, chr(10)) AS ls FROM md),
         h AS (SELECT doc_id, ls,
                      [i - 1 FOR i IN range(1, len(ls) + 1)
                       IF regexp_matches(ls[i], '^#{1,6} ')] AS hs
               FROM l),
         st AS (SELECT doc_id, ls,
                       CASE WHEN len(hs) = 0 OR hs[1] <> 0
                            THEN list_prepend(-1, hs) ELSE hs END AS s
                FROM h),
         sec AS (SELECT doc_id, k AS sec_idx,
                        CASE WHEN s[k] = -1 THEN ''
                             ELSE ls[s[k] + 1] END AS heading,
                        array_to_string(
                          ls[(s[k] + 2):COALESCE(s[k + 1], len(ls))], chr(10))
                          AS body
                 FROM st CROSS JOIN range(1, 10) r(k)
                 WHERE k <= len(s))
         SELECT doc_id AS id, CAST(sec_idx AS BIGINT) AS sec_idx, heading, body
         FROM sec WHERE heading <> '' OR body <> ''
         ORDER BY id, sec_idx""",

    "q229_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
         p0 AS (SELECT user_id, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'),
         p AS (SELECT user_id, ts, event_id AS p_id, value FROM p0
               WHERE rn = 1),
         j AS (SELECT c.event_id, c.ts AS cts, p.p_id, p.value, p.ts AS pts
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts >= p.ts)
         SELECT event_id, p_id, round(value, 4) AS p_value,
                CASE WHEN pts IS NOT NULL
                          AND epoch_us(cts) - epoch_us(pts) <= 3600000000
                     THEN p_id END AS p_id_1h
         FROM j ORDER BY event_id""",

    "q230_range_join" ->
      """WITH e AS (SELECT event_id, ts FROM events
                 WHERE event_type = 'error'),
         w AS (SELECT event_id AS w_id, ts AS s,
                      ts + INTERVAL 30 MINUTE AS en
               FROM events WHERE event_type = 'purchase')
         SELECT e.event_id AS p_id, w_id AS i_id
         FROM e JOIN w ON e.ts >= s AND e.ts < en
         ORDER BY p_id, i_id""",

    "q231_hnsw_edges" ->
      s"""WITH vv AS (SELECT vec_id AS id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                CAST('0x' || substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)),
                  1, 15) AS BIGINT) AS h
              FROM embeddings WHERE vec_id < 200),
         lv AS (SELECT id, v, CASE WHEN h % 16 = 0 THEN 2
                                   WHEN h % 4 = 0 THEN 1 ELSE 0 END AS lvl
                FROM vv),
         nodes AS (SELECT l, id, v FROM lv
                   JOIN range(0, 3) r(l) ON lvl >= l),
         px AS (SELECT a.l, a.id AS src, b.id AS cid,
                  round(${PortableSql.cosSql("a.v", "b.v")}, 4) AS sim
                FROM nodes a JOIN nodes b
                  ON a.l = b.l AND a.id <> b.id),
         dir AS (SELECT l, src, cid AS nbr, sim FROM (
                   SELECT *, row_number() OVER (PARTITION BY l, src
                     ORDER BY sim DESC, cid) AS rn FROM px)
                 WHERE rn <= 4),
         sym AS (SELECT l, src, nbr, max(sim) AS sim FROM (
                   SELECT l, src, nbr, sim FROM dir
                   UNION ALL
                   SELECT l, nbr AS src, src AS nbr, sim FROM dir)
                 GROUP BY l, src, nbr),
         topm AS (SELECT l, src, rn AS rnk, nbr, sim FROM (
                   SELECT *, row_number() OVER (PARTITION BY l, src
                     ORDER BY sim DESC, nbr) AS rn FROM sym)
                  WHERE rn <= 4),
         ring1 AS (SELECT l, id AS src, v,
                     COALESCE(lead(id) OVER (PARTITION BY l ORDER BY id),
                       min(id) OVER (PARTITION BY l)) AS nbr
                   FROM nodes),
         ring AS (SELECT r.l, r.src, 0 AS rnk, r.nbr,
                    round(${PortableSql.cosSql("r.v", "n.v")}, 4) AS sim
                  FROM ring1 r JOIN nodes n ON n.l = r.l AND n.id = r.nbr
                  WHERE r.src <> r.nbr
                    AND NOT EXISTS (SELECT 1 FROM topm t
                      WHERE t.l = r.l AND t.src = r.src AND t.nbr = r.nbr))
         SELECT CAST(l AS INT) AS level, src AS id, CAST(rnk AS INT) AS rnk,
                nbr, sim
         FROM (SELECT * FROM topm UNION ALL SELECT * FROM ring)
         ORDER BY level, id, rnk, nbr""",

    "q232_ict_pairs" ->
      """WITH tk AS (SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '') AS tk
              FROM documents),
         u AS (SELECT doc_id, CAST(ceil(len(tk) / 4.0) AS INT) AS nu,
                 [array_to_string(tk[(i * 4 + 1):(i * 4 + 4)], ' ')
                  FOR i IN range(0, CAST(ceil(len(tk) / 4.0) AS BIGINT))] AS us
               FROM tk),
         p AS (SELECT doc_id, nu,
                 CAST(CAST('0x' || substr(md5('ict:' || CAST(doc_id AS VARCHAR)),
                   1, 15) AS BIGINT) % nu AS INT) AS qi,
                 CAST('0x' || substr(md5('ictkeep:' || CAST(doc_id AS VARCHAR)),
                   1, 15) AS BIGINT) % 10 = 0 AS kept,
                 us
               FROM u WHERE nu >= 2)
         SELECT doc_id AS id, CAST(nu AS BIGINT) AS n_units,
                CAST(qi AS BIGINT) AS q_idx,
                md5(us[qi + 1]) AS q_md5,
                md5(CASE WHEN kept THEN array_to_string(us, ' ')
                     ELSE array_to_string([us[i] FOR i IN range(1, nu + 1)
                       IF i <> qi + 1], ' ') END) AS ctx_md5,
                kept
         FROM p ORDER BY id""",

    "q233_distill_pairs" ->
      """WITH q AS (SELECT doc_id // 25 AS qid,
                array_to_string(list_filter(string_split_regex(trim(text),
                  '\s+'), x -> x <> '')[1:8], ' ') AS qt
              FROM documents WHERE doc_id % 25 = 0 AND doc_id < 500),
         c AS (SELECT doc_id AS did, text AS dt, doc_id % 20 AS qid
               FROM documents),
         s AS (SELECT q.qid, c.did,
                 CAST('0x' || substr(md5(qt || chr(1) || dt), 1, 15)
                   AS BIGINT) % 10000 / 10000.0 AS sc
               FROM q JOIN c USING (qid)),
         r AS (SELECT qid, did, sc,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY sc DESC, did ASC) AS rnk,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY sc ASC, did DESC) AS tl
               FROM s)
         SELECT qid, did, round(sc, 4) AS t_score, CAST(rnk AS INT) AS rnk,
                rnk <= 2 AS is_pos
         FROM r WHERE rnk <= 2 OR tl <= 3
         ORDER BY qid, rnk""",

    "q234_semantic_pack" ->
      s"""WITH ${PortableSql.ivfTrainCtes("g", 8)},
         tok AS (SELECT doc_id AS id,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\\s+'))
                       END AS BIGINT) AS t
                 FROM documents),
         j AS (SELECT tok.id, tok.t, gbf.cid AS cell
               FROM tok JOIN gbf ON gbf.id = tok.id),
         cum AS (SELECT id, t, cell,
                   COALESCE(sum(t) OVER (ORDER BY cell, id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cb
                 FROM j),
         b AS (SELECT CAST(cb // 512 AS BIGINT) AS bin, cell, t FROM cum),
         bc AS (SELECT bin, cell, count(*) AS n, sum(t) AS tk
                FROM b GROUP BY bin, cell)
         SELECT bin, CAST(sum(n) AS BIGINT) AS n_docs,
                CAST(sum(tk) AS BIGINT) AS tokens,
                round(max(n) / CAST(sum(n) AS DOUBLE), 4) AS top_cell_share
         FROM bc GROUP BY bin ORDER BY bin""",

    "q235_embedding_outliers" ->
      s"""${PortableSql.ivfTrainSql}
         s AS (SELECT bf.id, bf.cid,
                 round(${PortableSql.cosSql("bf.v", "c2.c")}, 4) AS cs
               FROM bf JOIN c2 ON c2.cid = bf.cid)
         SELECT id, CAST(cid AS BIGINT) AS cluster, cs AS cent_sim,
                cs < 0.1 AS outlier
         FROM s ORDER BY id""",

    "q236_diverse_sample" ->
      s"""${PortableSql.ivfTrainSql}
         h AS (SELECT id, cid,
                 CAST('0x' || substr(md5('div:' || CAST(id AS VARCHAR)),
                   1, 15) AS BIGINT) AS hv
               FROM bf),
         r AS (SELECT id, cid, hv,
                 row_number() OVER (PARTITION BY cid
                   ORDER BY hv ASC, id ASC) AS rnd
               FROM h)
         SELECT id, cluster, rnd FROM (
           SELECT id, CAST(cid AS BIGINT) AS cluster,
                  CAST(rnd AS BIGINT) AS rnd, hv
           FROM r ORDER BY rnd, hv, id LIMIT 40)
         ORDER BY rnd, id""",

    "q237_rolling_stats" ->
      """WITH e AS (SELECT event_id AS id, user_id, ts, value
              FROM events WHERE user_id < 30),
         w AS (SELECT id, user_id, value,
                 avg(value) OVER (PARTITION BY user_id ORDER BY ts, id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rm,
                 min(value) OVER (PARTITION BY user_id ORDER BY ts, id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rmin,
                 max(value) OVER (PARTITION BY user_id ORDER BY ts, id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rmax,
                 value - lag(value) OVER (PARTITION BY user_id
                   ORDER BY ts, id) AS d,
                 (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, id))) // 1000000 AS gap_s
               FROM e)
         SELECT id, user_id, round(value, 4) AS v, round(rm, 4) AS roll_mean,
                round(rmin, 4) AS roll_min, round(rmax, 4) AS roll_max,
                round(d, 4) AS delta, gap_s
         FROM w ORDER BY user_id, id""",

    "q238_word_noise" ->
      """WITH tk AS (SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '') AS tk
              FROM documents),
         k AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
                 [tk[i] FOR i IN range(1, len(tk) + 1)
                  IF i = 1 OR CAST('0x' || substr(md5('noise:'
                    || CAST(doc_id AS VARCHAR) || ':'
                    || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT)
                    % 100 >= 30] AS kept
               FROM tk)
         SELECT doc_id AS id, n AS n_tokens,
                n - CAST(len(kept) AS BIGINT) AS n_deleted,
                md5(array_to_string(kept, ' ')) AS noised_md5
         FROM k ORDER BY id""",

    "q239_sentence_split" ->
      """WITH tk AS (SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                  x -> x <> '') AS tk
              FROM documents),
         p AS (SELECT doc_id, array_to_string(
                 [CASE WHEN i % 6 = 0 THEN tk[i] || '.' ELSE tk[i] END
                  FOR i IN range(1, len(tk) + 1)], ' ') AS txt
               FROM tk),
         s AS (SELECT doc_id,
                 list_filter(list_transform(
                   regexp_extract_all(txt, '[^.!?]+[.!?]*'), x -> trim(x)),
                   x -> x <> '') AS ss
               FROM p)
         SELECT doc_id AS id, CAST(i - 1 AS BIGINT) AS sent_idx,
                md5(ss[i]) AS s_md5
         FROM s CROSS JOIN range(1, 200) r(i)
         WHERE i <= len(ss)
         ORDER BY id, sent_idx""",

    "q240_pack_texts" ->
      """WITH tok AS (SELECT doc_id, text,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(list_filter(string_split_regex(trim(text),
                       '\s+'), x -> x <> '')) END AS BIGINT) AS t
              FROM documents),
         c AS (SELECT doc_id, text, t,
                 COALESCE(sum(t) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cb
               FROM tok)
         SELECT CAST(cb // 512 AS BIGINT) AS bin, count(*) AS n_docs,
                CAST(sum(t) AS BIGINT) AS tokens,
                md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id))
                  AS text_md5
         FROM c GROUP BY bin ORDER BY bin""",

    "q241_funnel" ->
      """WITH r1 AS (SELECT user_id, min(ts) AS rt FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
         r2 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts >= r1.rt
                GROUP BY e.user_id),
         r3 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r2 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= r2.rt
                GROUP BY e.user_id),
         r4 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r3 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= r3.rt
                GROUP BY e.user_id)
         SELECT * FROM (
           SELECT 1 AS step_idx, 'signup' AS step,
                  (SELECT count(*) FROM r1) AS n_keys
           UNION ALL SELECT 2, 'view', (SELECT count(*) FROM r2)
           UNION ALL SELECT 3, 'click', (SELECT count(*) FROM r3)
           UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM r4))
         ORDER BY step_idx""",

    "q243_funnel_steps" ->
      """WITH r1 AS (SELECT user_id, min(ts) AS rt FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
         r2 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts >= r1.rt
                GROUP BY e.user_id),
         r3 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r2 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= r2.rt
                GROUP BY e.user_id),
         r4 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r3 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= r3.rt
                GROUP BY e.user_id)
         SELECT user_id AS k, step_idx, step, rt AS reached_at FROM (
           SELECT user_id, CAST(1 AS BIGINT) AS step_idx,
                  'signup' AS step, rt FROM r1
           UNION ALL SELECT user_id, 2, 'view', rt FROM r2
           UNION ALL SELECT user_id, 3, 'click', rt FROM r3
           UNION ALL SELECT user_id, 4, 'purchase', rt FROM r4)
         ORDER BY step_idx, k""",

    "q244_funnel_by_cohort" ->
      """WITH r1 AS (SELECT user_id, min(ts) AS rt FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
         r2 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts >= r1.rt
                GROUP BY e.user_id),
         r3 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r2 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= r2.rt
                GROUP BY e.user_id),
         r4 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r3 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= r3.rt
                GROUP BY e.user_id),
         f AS (SELECT user_id, min(CAST(ts AS DATE)) AS c0
               FROM events GROUP BY user_id),
         s AS (SELECT user_id, CAST(1 AS BIGINT) AS step_idx,
                      'signup' AS step FROM r1
               UNION ALL SELECT user_id, 2, 'view' FROM r2
               UNION ALL SELECT user_id, 3, 'click' FROM r3
               UNION ALL SELECT user_id, 4, 'purchase' FROM r4)
         SELECT f.c0 AS cohort_day, s.step_idx, s.step,
                count(*) AS n_keys
         FROM s JOIN f USING (user_id)
         GROUP BY 1, 2, 3 ORDER BY cohort_day, step_idx""",

    "q245_interval_overlap" ->
      """WITH a AS (SELECT event_id AS a_id, ts AS s,
                 ts + INTERVAL 30 MINUTE AS e
               FROM events WHERE event_type = 'purchase'),
         b AS (SELECT event_id AS b_id, ts AS s,
                 ts + INTERVAL 10 MINUTE AS e
               FROM events WHERE event_type = 'view')
         SELECT a_id, b_id
         FROM a JOIN b ON a.s < b.e AND b.s < a.e
         ORDER BY a_id, b_id""",

    "q246_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
         p0 AS (SELECT user_id, ts, event_id, value,
                       row_number() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'),
         p AS (SELECT user_id, ts, event_id AS p_id, value FROM p0
               WHERE rn = 1),
         j AS (SELECT c.event_id, c.ts AS cts, p.p_id, p.value, p.ts AS pts
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts <= p.ts)
         SELECT event_id, p_id, round(value, 4) AS p_value,
                CASE WHEN pts IS NOT NULL
                          AND epoch_us(pts) - epoch_us(cts) <= 3600000000
                     THEN p_id END AS p_id_1h
         FROM j ORDER BY event_id""",

    "q250_ab_test" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         m AS (SELECT u.user_id, u.user_id % 2 AS arm,
                 COALESCE(sum(e.value), 0) AS metric
               FROM u LEFT JOIN events e
                 ON e.user_id = u.user_id AND e.event_type = 'purchase'
               GROUP BY u.user_id),
         s AS (SELECT arm, count(*) AS n, avg(metric) AS mu,
                      var_samp(metric) AS v
               FROM m GROUP BY arm)
         SELECT a.n AS n_a, b.n AS n_b,
                round(a.mu, 4) AS mean_a, round(b.mu, 4) AS mean_b,
                round(b.mu - a.mu, 4) AS lift,
                round((b.mu - a.mu) / sqrt(a.v / a.n + b.v / b.n), 4) AS z,
                abs((b.mu - a.mu) / sqrt(a.v / a.n + b.v / b.n)) > 1.96
                  AS significant
         FROM s a JOIN s b ON a.arm = 0 AND b.arm = 1""",

    "q251_funnel_latency" ->
      """WITH r1 AS (SELECT user_id, min(ts) AS rt FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
         r2 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts >= r1.rt
                GROUP BY e.user_id),
         r3 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r2 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= r2.rt
                GROUP BY e.user_id),
         r4 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r3 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= r3.rt
                GROUP BY e.user_id),
         p AS (SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step,
                      (epoch_us(r2.rt) - epoch_us(r1.rt)) / 1000000.0 AS lat
               FROM r1 JOIN r2 USING (user_id)
               UNION ALL
               SELECT 2, 'view',
                      (epoch_us(r3.rt) - epoch_us(r2.rt)) / 1000000.0
               FROM r2 JOIN r3 USING (user_id)
               UNION ALL
               SELECT 3, 'click',
                      (epoch_us(r4.rt) - epoch_us(r3.rt)) / 1000000.0
               FROM r3 JOIN r4 USING (user_id))
         SELECT step_idx, step, count(*) AS n_converted,
                round(quantile_cont(lat, 0.5), 4) AS p50_s,
                round(quantile_cont(lat, 0.9), 4) AS p90_s
         FROM p GROUP BY step_idx, step ORDER BY step_idx""",

    "q252_ewma" ->
      """WITH e AS (SELECT event_id AS id, user_id, ts, value
              FROM events),
         l AS (SELECT id, user_id, value,
                 lag(value, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, id) AS v1,
                 lag(value, 2) OVER (PARTITION BY user_id
                   ORDER BY ts, id) AS v2,
                 lag(value, 3) OVER (PARTITION BY user_id
                   ORDER BY ts, id) AS v3
               FROM e)
         SELECT id, user_id, round(value, 4) AS v,
                round((value
                       + COALESCE(v1, 0) * 0.5
                       + COALESCE(v2, 0) * 0.25
                       + COALESCE(v3, 0) * 0.125)
                      / (1 + CASE WHEN v1 IS NULL THEN 0 ELSE 0.5 END
                           + CASE WHEN v2 IS NULL THEN 0 ELSE 0.25 END
                           + CASE WHEN v3 IS NULL THEN 0 ELSE 0.125 END),
                      4) AS ewma
         FROM l WHERE user_id < 30 ORDER BY user_id, id""",

    "q253_anomalies" ->
      """WITH e AS (SELECT event_id AS id, user_id, ts, value
              FROM events),
         w AS (SELECT id, user_id, value,
                 count(*) OVER f AS n_prior,
                 avg(value) OVER f AS m,
                 stddev_samp(value) OVER f AS sd
               FROM e
               WINDOW f AS (PARTITION BY user_id ORDER BY ts, id
                            ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT id, user_id, value, n_prior, m, sd,
                 CASE WHEN n_prior >= 3 AND sd > 0
                      THEN round((value - m) / sd, 4) END AS z
               FROM w)
         SELECT id, user_id, round(value, 4) AS v, n_prior,
                round(m, 4) AS mean_prior, round(sd, 4) AS std_prior, z,
                CAST(COALESCE(abs(z) >= 2.0, FALSE) AS BIGINT)
                  AS is_anomaly
         FROM z WHERE user_id < 30 ORDER BY user_id, id""",

    "q254_level_shift" ->
      """WITH e AS (SELECT event_id AS id, user_id, ts, value
              FROM events),
         w AS (SELECT id, user_id, value,
                 count(*) OVER fl AS nl, avg(value) OVER fl AS ml,
                 count(*) OVER fr AS nr, avg(value) OVER fr AS mr
               FROM e
               WINDOW
                 fl AS (PARTITION BY user_id ORDER BY ts, id
                        ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING),
                 fr AS (PARTITION BY user_id ORDER BY ts, id
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING))
         SELECT id, user_id, round(value, 4) AS v,
                round(ml, 4) AS left_mean, round(mr, 4) AS right_mean,
                round(mr - ml, 4) AS shift
         FROM w WHERE nl = 4 AND nr = 4 AND user_id < 30
         ORDER BY user_id, id""",

    "q255_seasonal" ->
      """WITH e AS (SELECT event_id AS id, user_id, ts, value
              FROM events),
         b AS (SELECT id, user_id, value,
                 (row_number() OVER o - 1) % 4 AS phase,
                 CASE WHEN count(*) OVER f = 5
                      THEN avg(value) OVER f END AS trend
               FROM e
               WINDOW o AS (PARTITION BY user_id ORDER BY ts, id),
                      f AS (PARTITION BY user_id ORDER BY ts, id
                            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
         s0 AS (SELECT user_id, phase,
                  avg(value - trend) AS sraw
                FROM b GROUP BY user_id, phase),
         s AS (SELECT user_id, phase,
                 sraw - avg(sraw) OVER (PARTITION BY user_id) AS seas
               FROM s0)
         SELECT b.id, b.user_id, b.phase, round(b.value, 4) AS v,
                round(b.trend, 4) AS trend, round(s.seas, 4) AS seasonal,
                round(b.value - b.trend - s.seas, 4) AS resid
         FROM b JOIN s USING (user_id, phase)
         WHERE b.user_id < 30 ORDER BY b.user_id, b.id""",

    "q256_cuped" ->
      """WITH ids AS (SELECT DISTINCT user_id FROM events),
         r AS (SELECT user_id, sum(value) AS rev FROM events
               WHERE event_type = 'purchase' GROUP BY user_id),
         v AS (SELECT user_id, sum(value) AS vv FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         u AS (SELECT ids.user_id % 2 AS arm,
                 COALESCE(r.rev, 0) AS y, COALESCE(v.vv, 0) AS x
               FROM ids LEFT JOIN r USING (user_id)
                        LEFT JOIN v USING (user_id)),
         g AS (SELECT covar_samp(x, y) / var_samp(x) AS th, avg(x) AS xb
               FROM u),
         adj AS (SELECT arm, y - g.th * (x - g.xb) AS m FROM u, g),
         s AS (SELECT arm, count(*) AS n, avg(m) AS mu, var_samp(m) AS v
               FROM adj GROUP BY arm)
         SELECT a.n AS n_a, b.n AS n_b,
                round(a.mu, 4) AS mean_a, round(b.mu, 4) AS mean_b,
                round(b.mu - a.mu, 4) AS lift, round(g.th, 4) AS theta,
                round((b.mu - a.mu) / sqrt(a.v / a.n + b.v / b.n), 4) AS z,
                abs((b.mu - a.mu) / sqrt(a.v / a.n + b.v / b.n)) > 1.96
                  AS significant
         FROM (SELECT * FROM s WHERE arm = 0) a,
              (SELECT * FROM s WHERE arm = 1) b, g""",

    "q257_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         c AS (SELECT user_id % 2 AS arm, count(*) AS o
               FROM u GROUP BY arm),
         d AS (SELECT 0 AS arm, 0.5 AS w UNION ALL SELECT 1, 0.5),
         t AS (SELECT CAST(sum(o) AS DOUBLE) AS n_total FROM c),
         x AS (SELECT CAST(t.n_total AS BIGINT) AS n_total,
                 round(sum(pow(COALESCE(c.o, 0) - d.w * t.n_total, 2)
                           / (d.w * t.n_total)), 4) AS chi2
               FROM d LEFT JOIN c USING (arm), t
               GROUP BY t.n_total)
         SELECT n_total, chi2, CAST(1 AS BIGINT) AS dof,
                chi2 > 10.828 AS srm
         FROM x""",

    "q258_jw_join" ->
      """WITH base AS (SELECT doc_id AS id,
                 array_to_string(
                   (string_split_regex(trim(text), '\s+'))[1:3], ' ') AS s
               FROM documents),
         okay AS (SELECT * FROM base WHERE length(s) >= 6),
         mut AS (SELECT id + 1000000 AS id,
                   substr(s, 1, length(s) - 2) ||
                   substr(s, length(s), 1) ||
                   substr(s, length(s) - 1, 1) AS s
                 FROM okay),
         u AS (SELECT * FROM okay UNION ALL SELECT * FROM mut),
         p AS (SELECT id, s, split_part(s, ' ', 1) AS blk FROM u),
         c AS (SELECT a.id AS a_id, b.id AS b_id,
                 jaro_winkler_similarity(a.s, b.s) AS sim
               FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id)
         SELECT a_id, b_id, round(sim, 4) AS sim FROM c
         WHERE sim >= 0.96 ORDER BY a_id, b_id""",

    "q259_active_users" ->
      """WITH pairs AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS d
                 FROM events),
         days AS (SELECT DISTINCT d AS day FROM pairs)
         SELECT day,
           count(DISTINCT CASE WHEN p.d = day THEN p.k END) AS au_1,
           count(DISTINCT CASE WHEN p.d > day - 7 THEN p.k END) AS au_7,
           count(DISTINCT p.k) AS au_28
         FROM days JOIN pairs p ON p.d <= day AND p.d > day - 28
         GROUP BY day ORDER BY day""",

    // q270: the HLL estimate itself is engine-internal; the contract is
    // the exact counts plus in-query ok booleans — the oracle recomputes
    // the exact side and asserts the engine certified its own estimates
    "q270_active_users_hll" ->
      """WITH pairs AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS d
                 FROM events),
         days AS (SELECT DISTINCT d AS day FROM pairs)
         SELECT day,
           count(DISTINCT CASE WHEN p.d = day THEN p.k END) AS exact_1,
           count(DISTINCT CASE WHEN p.d > day - 7 THEN p.k END) AS exact_7,
           count(DISTINCT p.k) AS exact_28,
           true AS ok_1, true AS ok_7, true AS ok_28
         FROM days JOIN pairs p ON p.d <= day AND p.d > day - 28
         GROUP BY day ORDER BY day""",

    "q260_transitions" ->
      """WITH e AS (SELECT user_id AS k, event_type AS tp,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS to_type
               FROM events)
         SELECT tp AS from_type, to_type, count(*) AS n,
           round(count(*) / sum(count(*)) OVER (PARTITION BY tp), 4) AS p
         FROM e WHERE to_type IS NOT NULL
         GROUP BY tp, to_type ORDER BY from_type, to_type""",

    "q261_inactivity_gaps" ->
      """WITH e AS (SELECT user_id AS k, ts,
                 lead(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nt
               FROM events)
         SELECT k, ts AS gap_start, nt AS gap_end,
           epoch_us(nt) - epoch_us(ts) AS gap_micros
         FROM e WHERE epoch_us(nt) - epoch_us(ts) > 86400000000
         ORDER BY k, gap_start""",

    "q262_ohlc" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS t, value AS v,
                 epoch_us(ts) // 21600000000 AS bk
               FROM events)
         SELECT k, make_timestamp(bk * 21600000000) AS bucket_start,
           arg_min(v, t) AS open, max(v) AS high, min(v) AS low,
           arg_max(v, t) AS close, count(*) AS n_events,
           round(sum(v), 4) AS v_sum
         FROM e GROUP BY k, bk ORDER BY k, bucket_start""",

    "q263_resample_locf" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS t, value AS v
               FROM events WHERE event_type = 'view'),
         b AS (SELECT k, min(t) AS t0, max(t) AS t1 FROM e GROUP BY k),
         grid AS (SELECT k,
             unnest(generate_series((t0 + 21599999999) // 21600000000,
               t1 // 21600000000)) AS n
           FROM b)
         SELECT g.k, make_timestamp(g.n * 21600000000) AS tick,
           e.v AS value
         FROM grid g ASOF JOIN e ON g.k = e.k AND g.n * 21600000000 >= e.t
         ORDER BY g.k, tick""",

    "q264_time_decay_attribution" ->
      """WITH c AS (SELECT event_id AS cid, user_id, ts FROM events
                 WHERE event_type = 'click'),
         w AS (SELECT event_id AS pid, user_id,
                      ts - INTERVAL 3 DAY AS st, ts AS en
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT w.pid, c.cid, epoch_us(c.ts) AS tt,
                      epoch_us(w.en) AS ct
               FROM c JOIN w ON c.user_id = w.user_id
                  AND c.ts >= w.st AND c.ts < w.en),
         r AS (SELECT pid, cid,
                 pow(0.5, (ct - tt) / 86400000000.0) AS raw FROM t)
         SELECT pid AS conversion_id, cid AS touch_id,
           round(raw / sum(raw) OVER (PARTITION BY pid), 4) AS credit
         FROM r ORDER BY conversion_id, touch_id""",

    "q265_position_attribution" ->
      """WITH c AS (SELECT event_id AS cid, user_id, ts FROM events
                 WHERE event_type = 'click'),
         w AS (SELECT event_id AS pid, user_id,
                      ts - INTERVAL 3 DAY AS st, ts AS en
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT w.pid, c.cid, epoch_us(c.ts) AS tt
               FROM c JOIN w ON c.user_id = w.user_id
                  AND c.ts >= w.st AND c.ts < w.en),
         r AS (SELECT pid, cid,
                 row_number() OVER (PARTITION BY pid
                   ORDER BY tt, cid) AS rn,
                 count(*) OVER (PARTITION BY pid) AS n FROM t),
         v AS (SELECT pid, cid,
                 CASE WHEN n = 1 THEN 1.0
                      WHEN rn = 1 OR rn = n THEN 0.4
                      ELSE 0.2 / (n - 2) END AS raw FROM r)
         SELECT pid AS conversion_id, cid AS touch_id,
           round(raw / sum(raw) OVER (PARTITION BY pid), 4) AS credit
         FROM v ORDER BY conversion_id, touch_id""",

    "q266_triangles" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e AS (SELECT DISTINCT x.p AS a, y.p AS b
               FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         deg AS (SELECT id, count(*) AS degree FROM (
                   SELECT a AS id FROM e UNION ALL SELECT b FROM e)
                 GROUP BY id),
         tr AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         pn AS (SELECT id, count(*) AS triangles FROM (
                  SELECT x AS id FROM tr UNION ALL
                  SELECT y FROM tr UNION ALL SELECT z FROM tr)
                GROUP BY id)
         SELECT deg.id, deg.degree,
           coalesce(pn.triangles, 0) AS triangles,
           round(CASE WHEN deg.degree >= 2 THEN
               coalesce(pn.triangles, 0) * 2.0 /
                 (deg.degree * (deg.degree - 1))
             ELSE 0.0 END, 4) AS clustering
         FROM deg LEFT JOIN pn ON pn.id = deg.id ORDER BY deg.id""",

    "q267_profile" ->
      """WITH p AS (
           SELECT 'event_id' AS col_name, count(*) AS n,
             count(*) - count(event_id) AS n_null,
             count(DISTINCT event_id) AS n_distinct,
             round(entropy(event_id), 4) AS entropy,
             round(min(event_id), 4) AS min_v,
             round(max(event_id), 4) AS max_v,
             round(avg(event_id), 4) AS mean,
             round(stddev_samp(event_id), 4) AS std,
             CAST(NULL AS DOUBLE) AS avg_len
           FROM events
           UNION ALL
           SELECT 'user_id', count(*), count(*) - count(user_id),
             count(DISTINCT user_id), round(entropy(user_id), 4),
             round(min(user_id), 4), round(max(user_id), 4),
             round(avg(user_id), 4), round(stddev_samp(user_id), 4),
             NULL
           FROM events
           UNION ALL
           SELECT 'event_type', count(*), count(*) - count(event_type),
             count(DISTINCT event_type), round(entropy(event_type), 4),
             NULL, NULL, NULL, NULL,
             round(avg(length(event_type)), 4)
           FROM events
           UNION ALL
           SELECT 'value', count(*), count(*) - count(value),
             count(DISTINCT value), round(entropy(value), 4),
             round(min(value), 4), round(max(value), 4),
             round(avg(value), 4), round(stddev_samp(value), 4),
             NULL
           FROM events)
         SELECT * FROM p ORDER BY col_name""",

    "q268_winsorize" ->
      """WITH b AS (SELECT event_type,
                 quantile_cont(value, 0.01) AS lo,
                 quantile_cont(value, 0.99) AS hi
               FROM events GROUP BY event_type)
         SELECT e.event_id AS id, e.event_type, e.value,
           round(greatest(b.lo, least(b.hi, e.value)), 4) AS clipped,
           CAST(e.value < b.lo OR e.value > b.hi AS BIGINT)
             AS was_clipped
         FROM events e JOIN b USING (event_type) ORDER BY id""",

    "q271_removal_effect" -> removalEffectOracle(60),

    "q272_gram_spectrum" ->
      // direct per-length census: enumerate every length-l token slice
      // and count occurrences / distinct / repeated per length — the
      // O(n·L) enumeration the suffix read-off avoids
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 5 = 0),
         lens AS (SELECT unnest(range(1, 65)) AS l),
         base AS (
           SELECT l.l AS len, t.tk AS tk,
                  unnest(range(1, len(t.tk) - l.l + 2)) AS i
           FROM toks t JOIN lens l ON len(t.tk) >= l.l),
         grams AS (SELECT len, array_to_string(tk[i:i + len - 1], ' ') AS g
                   FROM base),
         gc AS (SELECT len, g, count(*) AS c FROM grams GROUP BY 1, 2)
         SELECT len, CAST(sum(c) AS BIGINT) AS occurrences,
                count(*) AS distinct_grams,
                CAST(count(*) FILTER (WHERE c > 1) AS BIGINT)
                  AS repeated_grams
         FROM gc GROUP BY len ORDER BY len""",

    "q273_dq_report" ->
      """WITH r AS (
           SELECT 'discount_max' AS rule, count(*) AS n_rows,
             CAST(count(*) FILTER (
               WHERE NOT coalesce(l_discount <= 0.08, FALSE)) AS BIGINT)
               AS violations FROM lineitem
           UNION ALL
           SELECT 'flag_domain', count(*),
             CAST(count(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R')
               OR l_returnflag IS NULL) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'price_positive', count(*),
             CAST(count(*) FILTER (
               WHERE NOT coalesce(l_extendedprice > 0, FALSE)) AS BIGINT)
             FROM lineitem
           UNION ALL
           SELECT 'qty_range', count(*),
             CAST(count(*) FILTER (
               WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE))
               AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'pk_unique', CAST(sum(c) AS BIGINT),
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
           FROM (SELECT count(*) AS c FROM lineitem
                 GROUP BY l_orderkey, l_linenumber)
           UNION ALL
           SELECT 'fk_orders', (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
         SELECT rule, n_rows, violations,
           round((n_rows - violations) / CAST(n_rows AS DOUBLE), 4)
             AS pass_rate
         FROM r ORDER BY rule""",

    "q274_scd2" ->
      """WITH b AS (SELECT user_id AS k, ts AS t, event_id AS tb,
                 event_type AS a FROM events),
         m AS (SELECT k, t, tb, a,
                 CASE WHEN row_number() OVER w = 1
                      OR (a IS DISTINCT FROM lag(a) OVER w)
                   THEN 1 ELSE 0 END AS chg
               FROM b WINDOW w AS (PARTITION BY k ORDER BY t, tb)),
         r AS (SELECT k, t, a,
                 CAST(sum(chg) OVER (PARTITION BY k ORDER BY t, tb
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
               FROM m),
         g AS (SELECT k, version, min(t) AS valid_from, min(a) AS state
               FROM r GROUP BY k, version),
         f AS (SELECT k, version, valid_from,
                 lead(valid_from) OVER (PARTITION BY k ORDER BY version)
                   AS valid_to, state
               FROM g)
         SELECT k, version, valid_from, valid_to,
           CAST(valid_to IS NULL AS BIGINT) AS is_current, state
         FROM f ORDER BY k, version""",

    "q275_sorted_neighborhood" ->
      """WITH r AS (SELECT c_custkey AS id, c_name AS s,
                 row_number() OVER (ORDER BY c_name, c_custkey) AS idx
               FROM customer)
         SELECT a.id AS a_id, b.id AS b_id,
           CAST(b.idx - a.idx AS BIGINT) AS gap,
           jaro_winkler_similarity(a.s, b.s) AS sim
         FROM r a JOIN r b
           ON b.idx > a.idx AND b.idx <= a.idx + 3
         WHERE jaro_winkler_similarity(a.s, b.s) >= 0.9
         ORDER BY a_id, b_id""",

    "q276_linkage_score" -> {
      val (nwa, nwd) = graft.ops.Linkage.fsWeights(0.9, 0.05)
      val (bwa, bwd) = graft.ops.Linkage.fsWeights(0.8, 0.1)
      s"""WITH c AS (SELECT c_custkey AS id, c_name AS nm,
                  c_nationkey AS nk, c_mktsegment AS seg, c_acctbal AS bal
                FROM customer),
          p AS (SELECT a.id AS a_id, b.id AS b_id, a.nm AS a_name,
                  b.nm AS b_name, a.bal AS a_bal, b.bal AS b_bal
                FROM c a JOIN c b ON a.nk = b.nk AND a.seg = b.seg
                  AND a.id < b.id),
          f AS (SELECT *,
                  coalesce(levenshtein(a_name, b_name) <= 2, FALSE)
                    AS agree_name,
                  coalesce(abs(a_bal - b_bal) < 100.0, FALSE) AS agree_bal
                FROM p),
          sc AS (SELECT *,
                  round((CASE WHEN agree_name THEN ${nwa} ELSE ${nwd} END)
                      + (CASE WHEN agree_bal THEN ${bwa} ELSE ${bwd} END), 4)
                    AS score
                 FROM f)
          SELECT a_id, b_id, a_name, b_name, a_bal, b_bal,
            agree_name, agree_bal, score,
            CASE WHEN score >= 3.0 THEN 'match'
                 WHEN score <= -4.0 THEN 'non_match'
                 ELSE 'review' END AS decision
          FROM sc ORDER BY a_id, b_id"""
    },

    "q277_kaplan_meier" ->
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
                      AS e
                  FROM f LEFT JOIN p USING (user_id)),
         pt AS (SELECT t,
                  CAST(count(*) FILTER (WHERE e) AS BIGINT) AS n_event,
                  count(*) AS n_at
                FROM subj GROUP BY t),
         k AS (SELECT t, n_event, n_at,
                 CAST(sum(n_at) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
               FROM pt),
         k2 AS (SELECT t, n_event, n_risk,
                  sum(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END)
                    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead,
                  sum(CASE WHEN n_event < n_risk
                        THEN ln(1 - n_event / CAST(n_risk AS DOUBLE)) END)
                    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnS
                FROM k)
         SELECT t, n_risk, n_event,
           CASE WHEN dead > 0 THEN 0.0
                ELSE round(exp(coalesce(lnS, 0.0)), 4) END AS survival
         FROM k2 WHERE n_event > 0 ORDER BY t""",

    "q278_assoc_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
               FROM lineitem),
         nb AS (SELECT count(DISTINCT bk) AS n FROM b),
         ic AS (SELECT it, count(*) AS ci FROM b GROUP BY it),
         p AS (SELECT x.it AS a, y.it AS b2, count(*) AS nab
               FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
               GROUP BY 1, 2 HAVING count(*) >= 2),
         dir AS (SELECT a AS ant, b2 AS cons, nab FROM p
                 UNION ALL SELECT b2, a, nab FROM p)
         SELECT ant AS antecedent, cons AS consequent,
           CAST(nab AS BIGINT) AS n_ab,
           round(nab / CAST(n.n AS DOUBLE), 4) AS support,
           round(nab / CAST(ca.ci AS DOUBLE), 4) AS confidence,
           round(CAST(nab * n.n AS DOUBLE) /
             CAST(ca.ci * cb.ci AS DOUBLE), 4) AS lift
         FROM dir
         JOIN ic ca ON ca.it = dir.ant
         JOIN ic cb ON cb.it = dir.cons
         CROSS JOIN nb n
         ORDER BY antecedent, consequent""",

    "q279_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price
         FROM lineitem
         GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",

    "q280_pivot" ->
      """SELECT user_id,
           round(sum(value) FILTER (WHERE event_type = 'click'), 4)
             AS click,
           round(sum(value) FILTER (WHERE event_type = 'error'), 4)
             AS error,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 4)
             AS purchase,
           round(sum(value) FILTER (WHERE event_type = 'signup'), 4)
             AS signup,
           round(sum(value) FILTER (WHERE event_type = 'view'), 4)
             AS view
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q281_trend" ->
      """SELECT event_type, count(*) AS n,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
             AS slope,
           round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 4)
             AS intercept,
           round(regr_r2(value, epoch_us(ts) / 86400000000.0), 4) AS r2
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q282_benford" ->
      """WITH p AS (SELECT l_extendedprice AS x FROM lineitem
               WHERE l_extendedprice > 0),
         t AS (SELECT count(*) AS tot FROM p),
         d AS (SELECT CAST(floor(x / power(10, floor(log10(x))))
                 AS BIGINT) AS digit FROM p)
         SELECT digit, count(*) AS n,
           round(count(*) / CAST(t.tot AS DOUBLE), 4) AS obs_p,
           round(log10(1 + 1.0 / digit), 4) AS exp_p
         FROM d, t GROUP BY digit, t.tot ORDER BY digit""",

    "q283_gini" ->
      """WITH s AS (SELECT o_custkey AS k, sum(o_totalprice) AS x
               FROM orders GROUP BY o_custkey),
         r AS (SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM s)
         SELECT count(*) AS n, round(sum(x), 4) AS total,
           round(CASE WHEN sum(x) > 0
             THEN (2 * sum(i * x) - (count(*) + 1) * sum(x)) /
                  (count(*) * sum(x))
             ELSE 0.0 END, 4) AS gini
         FROM r""",

    "q284_rfm" ->
      """WITH st AS (SELECT max(CAST(o_orderdate AS DATE)) AS dm
               FROM orders),
         per AS (SELECT o_custkey AS id,
             CAST(date_diff('day', max(CAST(o_orderdate AS DATE)), st.dm)
               AS DOUBLE) AS r,
             CAST(count(*) AS DOUBLE) AS fd,
             round(sum(o_totalprice), 4) AS m
           FROM orders, st GROUP BY o_custkey, st.dm),
         cuts AS (SELECT
             [round(quantile_cont(r, 0.2), 4), round(quantile_cont(r, 0.4), 4),
              round(quantile_cont(r, 0.6), 4), round(quantile_cont(r, 0.8), 4)]
               AS rc,
             [round(quantile_cont(fd, 0.2), 4), round(quantile_cont(fd, 0.4), 4),
              round(quantile_cont(fd, 0.6), 4), round(quantile_cont(fd, 0.8), 4)]
               AS fc,
             [round(quantile_cont(m, 0.2), 4), round(quantile_cont(m, 0.4), 4),
              round(quantile_cont(m, 0.6), 4), round(quantile_cont(m, 0.8), 4)]
               AS mc
           FROM per),
         b AS (SELECT id, r, fd, m,
             1 + len(list_filter(rc, c -> r > c)) AS r_bin,
             1 + len(list_filter(fc, c -> fd > c)) AS f_bin,
             1 + len(list_filter(mc, c -> m > c)) AS m_bin
           FROM per, cuts)
         SELECT id, CAST(r AS BIGINT) AS recency_days,
           CAST(fd AS BIGINT) AS frequency, m AS monetary,
           r_bin, f_bin, m_bin,
           r_bin * 100 + f_bin * 10 + m_bin AS segment
         FROM b ORDER BY id""",

    "q285_holt" -> {
      // the exact doubles the Spark fold uses: 1−β in IEEE arithmetic
      // is NOT the 0.7 literal, so the constants interpolate from the
      // same Scala expressions
      val a = 0.5; val b = 0.3
      val (ia, ib) = (1.0 - a, 1.0 - b)
      s"""WITH RECURSIVE s AS (
            SELECT user_id AS k,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS ord,
              value AS y
            FROM events),
          n AS (SELECT k, max(ord) AS n FROM s GROUP BY k),
          h AS (
            SELECT k, ord, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b FROM s WHERE ord = 1
            UNION ALL
            SELECT s.k, s.ord,
              $a * s.y + $ia * (h.l + h.b),
              $b * (($a * s.y + $ia * (h.l + h.b)) - h.l) + $ib * h.b
            FROM h JOIN s ON s.k = h.k AND s.ord = h.ord + 1),
          fin AS (SELECT h.k, n.n, h.l, h.b
                  FROM h JOIN n ON n.k = h.k AND h.ord = n.n)
          SELECT k, n, round(l, 4) AS level, round(b, 4) AS trend,
            round(l + 3.0 * b, 4) AS forecast
          FROM fin ORDER BY k"""
    },

    "q286_skew_report" ->
      """WITH c AS (SELECT CAST(l_partkey AS VARCHAR) AS k, count(*) AS c
               FROM lineitem GROUP BY 1),
         t AS (SELECT list(s ORDER BY c DESC, k) AS top_keys FROM
                 (SELECT k, c, k || ':' || CAST(c AS VARCHAR) AS s
                  FROM c ORDER BY c DESC, k LIMIT 5))
         SELECT CAST(sum(c.c) AS BIGINT) AS n_rows, count(*) AS n_keys,
           max(c.c) AS max_count,
           round(quantile_cont(c.c, 0.5), 4) AS p50_count,
           round(quantile_cont(c.c, 0.99), 4) AS p99_count,
           round(sum(c.c) / CAST(count(*) AS DOUBLE), 4) AS avg_count,
           round(max(c.c) / (sum(c.c) / CAST(count(*) AS DOUBLE)), 4)
             AS skew_ratio,
           array_to_string(any_value(t.top_keys), ',') AS top_keys
         FROM c, t""",

    "q287_standardize" ->
      """WITH m AS (SELECT event_type, avg(value) AS mu,
                 stddev_samp(value) AS sd
               FROM events GROUP BY event_type)
         SELECT e.event_id AS id, e.event_type,
           round(e.value, 4) AS value,
           round(CASE WHEN m.sd > 0 THEN (e.value - m.mu) / m.sd END, 4)
             AS z
         FROM events e JOIN m USING (event_type) ORDER BY id""",

    "q288_kmv_distinct" ->
      """WITH tk AS (SELECT source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         h AS (SELECT DISTINCT source,
             CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
           FROM tk),
         r AS (SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           FROM h),
         kk AS (SELECT source, count(*) AS n_kept, max(h) AS kth
           FROM r WHERE rn <= 16 GROUP BY source),
         ex AS (SELECT source, count(DISTINCT w) AS exact_distinct
           FROM tk GROUP BY source)
         SELECT source, ex.exact_distinct,
           round(CASE WHEN kk.n_kept < 16 THEN CAST(kk.n_kept AS DOUBLE)
             ELSE (15 * 1152921504606846976.0) / CAST(kth AS DOUBLE) END, 4)
             AS est_distinct
         FROM kk JOIN ex USING (source) ORDER BY source""",

    "q289_window_funnel" ->
      """WITH r1 AS (SELECT user_id, min(ts) AS rt FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
         d AS (SELECT user_id, rt,
                 rt + INTERVAL 24 HOURS AS dl FROM r1),
         r2 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN d USING (user_id)
                WHERE e.event_type = 'view' AND e.ts >= d.rt
                  AND e.ts <= d.dl
                GROUP BY e.user_id),
         r3 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r2 USING (user_id) JOIN d USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= r2.rt
                  AND e.ts <= d.dl
                GROUP BY e.user_id),
         r4 AS (SELECT e.user_id, min(e.ts) AS rt FROM events e
                JOIN r3 USING (user_id) JOIN d USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= r3.rt
                  AND e.ts <= d.dl
                GROUP BY e.user_id)
         SELECT user_id AS k, step_idx, step, rt AS reached_at FROM (
           SELECT user_id, CAST(1 AS BIGINT) AS step_idx,
                  'signup' AS step, rt FROM r1
           UNION ALL SELECT user_id, 2, 'view', rt FROM r2
           UNION ALL SELECT user_id, 3, 'click', rt FROM r3
           UNION ALL SELECT user_id, 4, 'purchase', rt FROM r4)
         ORDER BY step_idx, k""",

    "q290_mann_whitney" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                 sum(value) AS m
               FROM events GROUP BY user_id),
         pv AS (SELECT m, count(*) AS t,
                  CAST(sum(arm) AS BIGINT) AS n1v
                FROM u GROUP BY m),
         r AS (SELECT t, n1v,
                 coalesce(sum(t) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
               FROM pv),
         a AS (SELECT CAST(sum(t) AS BIGINT) AS nn,
                 CAST(sum(n1v) AS BIGINT) AS n1,
                 sum(n1v * midrank) AS r1,
                 CAST(sum(t * t * t - t) AS BIGINT) AS tie
               FROM r)
         SELECT nn - n1 AS n_a, n1 AS n_b,
           round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * (nn - n1) / 2.0) /
             sqrt((n1 * (nn - n1) / 12.0) *
               ((nn + 1) - tie / (nn * (nn - 1.0)))), 4) AS z,
           abs(round((r1 - n1 * (n1 + 1) / 2.0 - n1 * (nn - n1) / 2.0) /
             sqrt((n1 * (nn - n1) / 12.0) *
               ((nn + 1) - tie / (nn * (nn - 1.0)))), 4)) > 1.96
             AS significant
         FROM a""",

    "q291_maximal_repeats" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 5 = 0),
         lens AS (SELECT unnest(range(2, 7)) AS l),
         base AS (
           SELECT l.l AS len, t.tk AS tk,
                  unnest(range(0, len(t.tk) - l.l + 1)) AS p
           FROM toks t JOIN lens l ON len(t.tk) >= l.l),
         g AS (SELECT len, array_to_string(tk[p + 1:p + len], ' ') AS gram,
                 CASE WHEN p > 0 THEN tk[p] ELSE '' END AS prev,
                 CASE WHEN p + len < len(tk) THEN tk[p + len + 1]
                   ELSE '' END AS next
               FROM base)
         SELECT len, gram, count(*) AS n_occ,
           count(DISTINCT prev) AS n_left,
           count(DISTINCT next) AS n_right
         FROM g GROUP BY len, gram
         HAVING count(*) >= 3 AND count(DISTINCT prev) >= 2
           AND count(DISTINCT next) >= 2
         ORDER BY len, gram""",

    "q292_maximal_repeats_all" ->
      // all lengths per document: the O(n·maxlen) enumeration the
      // LCP-interval read-off answers from one ranking
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 10 = 0),
         wl AS (SELECT tk, unnest(range(2, len(tk) + 1)) AS len
                FROM toks),
         base AS (SELECT len, tk,
                    unnest(range(0, len(tk) - len + 1)) AS p
                  FROM wl),
         g AS (SELECT len, array_to_string(tk[p + 1:p + len], ' ') AS gram,
                 CASE WHEN p > 0 THEN tk[p] ELSE '' END AS prev,
                 CASE WHEN p + len < len(tk) THEN tk[p + len + 1]
                   ELSE '' END AS next
               FROM base)
         SELECT len, gram, count(*) AS n_occ
         FROM g GROUP BY len, gram
         HAVING count(*) >= 3 AND count(DISTINCT prev) >= 2
           AND count(DISTINCT next) >= 2
         ORDER BY len, gram""",

    "q293_proportion_test" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                 max(CASE WHEN event_type = 'purchase' THEN 1
                     ELSE 0 END) AS c
               FROM events GROUP BY user_id),
         s AS (SELECT arm, count(*) AS n, CAST(sum(c) AS BIGINT) AS x
               FROM u GROUP BY arm),
         m AS (SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b,
                 (a.x + b.x) / CAST(a.n + b.n AS DOUBLE) AS pp
               FROM (SELECT n, x FROM s WHERE arm = 0) a,
                    (SELECT n, x FROM s WHERE arm = 1) b)
         SELECT n_a, n_b,
           round(x_a / CAST(n_a AS DOUBLE), 4) AS p_a,
           round(x_b / CAST(n_b AS DOUBLE), 4) AS p_b,
           round(x_b / CAST(n_b AS DOUBLE)
             - x_a / CAST(n_a AS DOUBLE), 4) AS lift,
           round(CASE WHEN pp > 0 AND pp < 1 THEN
             (x_b / CAST(n_b AS DOUBLE) - x_a / CAST(n_a AS DOUBLE)) /
             sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z,
           coalesce(abs(CASE WHEN pp > 0 AND pp < 1 THEN
             (x_b / CAST(n_b AS DOUBLE) - x_a / CAST(n_a AS DOUBLE)) /
             sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END) > 1.96,
             false) AS significant
         FROM m""",

    "q294_chi2_independence" ->
      """WITH cells AS (SELECT event_type AS a,
                 CAST(user_id % 3 AS VARCHAR) AS b, count(*) AS o
               FROM events GROUP BY 1, 2),
         rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra
                FROM cells GROUP BY a),
         ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb
                FROM cells GROUP BY b),
         tt AS (SELECT CAST(sum(o) AS DOUBLE) AS n,
                  count(DISTINCT a) AS r, count(DISTINCT b) AS c
                FROM cells),
         f AS (SELECT rt.ra, ct.cb, coalesce(cells.o, 0) AS o
               FROM rt CROSS JOIN ct
               LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
         q AS (SELECT tt.n, tt.r, tt.c,
                 pow(f.o - f.ra * f.cb / tt.n, 2) /
                   (f.ra * f.cb / tt.n) AS q
               FROM f, tt)
         SELECT CAST(n AS BIGINT) AS n, r, c,
           round(sum(q), 4) AS chi2,
           (r - 1) * (c - 1) AS dof,
           round(sqrt(sum(q) / (n * least(r - 1, c - 1))), 4) AS cramers_v
         FROM q GROUP BY n, r, c""",

    "q295_acf" -> {
      val lags = (1 to 7)
      val lagCols = lags.map(k =>
        s"lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
        .mkString(", ")
      val numCols = lags.map(k =>
        s"sum((v - mu) * (l$k - mu)) AS num$k").mkString(", ")
      val arms = lags.map(k =>
        s"""SELECT event_type, CAST($k AS BIGINT) AS lag, n,
            round(CASE WHEN den > 0 THEN num$k / den END, 4) AS acf
            FROM a""").mkString("\n           UNION ALL ")
      s"""WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(value) AS v
               FROM events GROUP BY 1, 2),
         m AS (SELECT event_type, v,
                 avg(v) OVER (PARTITION BY event_type) AS mu, $lagCols
               FROM sday),
         a AS (SELECT event_type, count(*) AS n,
                 sum(pow(v - mu, 2)) AS den, $numCols
               FROM m GROUP BY event_type)
         $arms
         ORDER BY event_type, lag"""
    },

    "q296_cusum" ->
      // w MATERIALIZED: it is read twice (per-key max + argmax), and
      // DuckDB's parallel avg/stddev aggregation is not bit-identical
      // across evaluations — the a = m equality needs ONE evaluation
      // (the localCheckpoint on the Spark side plays the same role)
      """WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 avg(value) AS v
               FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, day, v,
                  avg(v) OVER (PARTITION BY event_type) AS mu,
                  stddev_samp(v) OVER (PARTITION BY event_type) AS sd
                FROM sday),
         w AS MATERIALIZED (SELECT event_type, day,
                 CASE WHEN sd > 0
                   THEN abs(sum((v - mu) / sd)
                     OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING)) END AS a
               FROM st),
         mx AS (SELECT event_type, count(*) AS n, max(a) AS m
                FROM w GROUP BY event_type)
         SELECT w.event_type, any_value(mx.n) AS n,
           round(any_value(mx.m), 4) AS max_cusum,
           min(CASE WHEN w.a = mx.m THEN w.day END) AS changepoint_at,
           coalesce(any_value(mx.m) > 3.0, false) AS shifted
         FROM w JOIN mx ON w.event_type = mx.event_type
         WHERE w.a = mx.m OR mx.m IS NULL
         GROUP BY w.event_type ORDER BY w.event_type""",

    "q297_posting_lists" ->
      """WITH td AS (SELECT term, doc_id AS id, count(*) AS tf FROM (
             SELECT doc_id,
               unnest(list_filter(string_split_regex(trim(text), '\s+'),
                 x -> x <> '')) AS term
             FROM documents)
           GROUP BY term, doc_id),
         r AS (SELECT term, id, tf,
                 row_number() OVER (PARTITION BY term ORDER BY id) AS rn
               FROM td)
         SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
           array_to_string(list_sort(list(id) FILTER (WHERE rn <= 10)), ',')
             AS postings
         FROM r GROUP BY term HAVING count(*) >= 8 ORDER BY term""",

    "q298_kcore" -> kCoreOracle(k = 12, rounds = 20),

    "q299_systematic_sample" ->
      """WITH r AS (SELECT o_orderkey, o_orderdate, o_totalprice,
                 row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                   AS gidx
               FROM orders)
         SELECT o_orderkey, o_orderdate, o_totalprice, gidx
         FROM r WHERE (gidx - 1) % 97 = 0 ORDER BY gidx""",

    "q300_kmv_setops" ->
      """WITH tk AS (SELECT source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         h AS (SELECT DISTINCT source AS g,
             CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h
           FROM tk),
         sk AS (SELECT g, h FROM (
             SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
               AS rn FROM h)
           WHERE rn <= 32),
         gs AS (SELECT DISTINCT g FROM sk),
         p AS (SELECT a.g AS ga, b.g AS gb
               FROM gs a JOIN gs b ON a.g < b.g),
         m AS (SELECT ga, gb, h, max(ia) AS ia, max(ib) AS ib FROM (
             SELECT p.ga, p.gb, sk.h, 1 AS ia, 0 AS ib
             FROM p JOIN sk ON sk.g = p.ga
             UNION ALL
             SELECT p.ga, p.gb, sk.h, 0, 1
             FROM p JOIN sk ON sk.g = p.gb)
           GROUP BY ga, gb, h),
         r AS (SELECT ga, gb, h, ia, ib,
                 row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
               FROM m),
         agg AS (SELECT ga, gb, count(*) AS nk, max(h) AS kth,
                   CAST(sum(ia * ib) AS BIGINT) AS nb
                 FROM r WHERE rn <= 32 GROUP BY ga, gb)
         SELECT ga AS src_a, gb AS src_b,
           round(CASE WHEN nk < 32 THEN CAST(nk AS DOUBLE)
             ELSE (31 * 1152921504606846976.0) / CAST(kth AS DOUBLE)
             END, 4) AS union_est,
           round(nb / CAST(nk AS DOUBLE), 4) AS jaccard_est,
           round((nb / CAST(nk AS DOUBLE)) *
             CASE WHEN nk < 32 THEN CAST(nk AS DOUBLE)
               ELSE (31 * 1152921504606846976.0) / CAST(kth AS DOUBLE)
               END, 4) AS intersect_est
         FROM agg ORDER BY src_a, src_b""",

    "q301_welch_ttest" ->
      """WITH u AS (SELECT CAST(user_id % 2 AS INT) AS arm,
                 avg(value) AS m
               FROM events GROUP BY user_id),
         s AS (SELECT arm, count(*) AS n, avg(m) AS mu,
                 var_samp(m) AS v
               FROM u GROUP BY arm),
         m AS (SELECT a.n AS n_a, a.mu AS mu_a, a.v AS v_a,
                 b.n AS n_b, b.mu AS mu_b, b.v AS v_b
               FROM (SELECT * FROM s WHERE arm = 0) a,
                    (SELECT * FROM s WHERE arm = 1) b)
         SELECT n_a, n_b, round(mu_a, 4) AS mean_a,
           round(mu_b, 4) AS mean_b, round(mu_b - mu_a, 4) AS lift,
           round((mu_b - mu_a) / sqrt(v_a / n_a + v_b / n_b), 4) AS t,
           round(pow(v_a / n_a + v_b / n_b, 2) /
             (pow(v_a / n_a, 2) / (n_a - 1) +
              pow(v_b / n_b, 2) / (n_b - 1)), 4) AS df,
           coalesce(abs((mu_b - mu_a) / sqrt(v_a / n_a + v_b / n_b))
             > 1.96, false) AS significant
         FROM m""",

    "q302_kruskal_wallis" ->
      """WITH u AS (SELECT CAST(user_id % 3 AS VARCHAR) AS arm,
                 sum(value) AS m
               FROM events GROUP BY user_id),
         pva AS (SELECT m, arm, count(*) AS c FROM u GROUP BY 1, 2),
         pv AS (SELECT m, CAST(sum(c) AS BIGINT) AS t
                FROM pva GROUP BY m),
         r AS (SELECT m, t,
                 coalesce(sum(t) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
               FROM pv),
         pa AS (SELECT arm, CAST(sum(c) AS BIGINT) AS ng,
                  sum(c * r.midrank) AS rg
                FROM pva JOIN r USING (m) GROUP BY arm),
         tt AS (SELECT sum(pow(t, 3) - t) AS tie FROM r),
         ag AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
                  count(*) AS k_arms, sum(rg * rg / ng) AS rr
                FROM pa)
         SELECT nn AS n, k_arms,
           round(12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0), 4)
             AS h,
           round(CASE WHEN (1.0 - tie / (pow(nn, 3) - nn)) > 0 THEN
             (12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0)) /
             (1.0 - tie / (pow(nn, 3) - nn)) END, 4) AS h_tie,
           k_arms - 1 AS dof
         FROM ag, tt""",

    "q303_bfs" -> bfsOracle(rounds = 6),

    "q304_hits" -> hitsOracle(iters = 3),

    "q305_theil_sen" ->
      """WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(value) AS v
               FROM events GROUP BY 1, 2),
         b AS (SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', day) AS DOUBLE)
                   AS x, v AS y
               FROM sday),
         sl AS (SELECT a.event_type,
                  (b2.y - a.y) / (b2.x - a.x) AS sl
                FROM b a JOIN b b2 ON a.event_type = b2.event_type
                  AND a.x < b2.x),
         sm AS (SELECT event_type, count(*) AS n_pairs,
                  quantile_cont(sl, 0.5) AS slope
                FROM sl GROUP BY event_type),
         fin AS (SELECT b.event_type, count(*) AS n,
                   any_value(sm.n_pairs) AS n_pairs,
                   any_value(sm.slope) AS s,
                   quantile_cont(b.y - sm.slope * b.x, 0.5) AS i
                 FROM b JOIN sm USING (event_type)
                 GROUP BY b.event_type)
         SELECT event_type, n, n_pairs, round(s, 4) AS slope,
           round(i, 4) AS intercept
         FROM fin ORDER BY event_type""",

    "q306_textrank" -> textrankOracle(iters = 3),

    "q307_pca_project" -> pcaOracle(dim = 64, sweeps = 30),

    "q308_label_propagation" -> labelPropOracle(iters = 4),

    "q309_cross_folds" ->
      """SELECT doc_id,
           CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) % 5 AS fold
         FROM documents ORDER BY doc_id""",

    "q310_holt_winters" -> {
      // the exact IEEE doubles the Spark fold uses (the q285 stance),
      // seasonal state carried as a LIST through the recursion with
      // slice-splice updates; base row's seasonal update is exactly 0
      // (gamma*(y-y) + (1-gamma)*0), so the base list is all zeros
      val a = 0.5; val b = 0.3; val g = 0.4; val m = 7; val h = 2
      val (ia, ib, ig) = (1.0 - a, 1.0 - b, 1.0 - g)
      val zeros = Seq.fill(m)("0.0").mkString("[", ", ", "]")
      val pos = s"((sd.ord - 1) % $m)"
      val sOld = s"h.s[$pos + 1]"
      val l1 = s"($a * (sd.y - $sOld) + $ia * (h.l + h.b))"
      val s1 = s"($g * (sd.y - $l1) + $ig * $sOld)"
      s"""WITH RECURSIVE sd AS (
            SELECT k, row_number() OVER (PARTITION BY k ORDER BY day)
                AS ord, y
            FROM (SELECT user_id % 3 AS k, CAST(ts AS DATE) AS day,
                    sum(value) AS y
                  FROM events GROUP BY 1, 2)),
          n AS (SELECT k, max(ord) AS n FROM sd GROUP BY k),
          hw AS (
            SELECT k, ord, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b,
              CAST($zeros AS DOUBLE[]) AS s
            FROM sd WHERE ord = 1
            UNION ALL
            SELECT sd.k, sd.ord,
              $l1 AS l,
              $b * ($l1 - h.l) + $ib * h.b AS b,
              list_concat(list_concat(h.s[1:$pos], [$s1]),
                h.s[$pos + 2:]) AS s
            FROM hw h JOIN sd ON sd.k = h.k AND sd.ord = h.ord + 1),
          fin AS (SELECT h.k, n.n, h.l, h.b,
                    h.s[((n.n + $h - 1) % $m) + 1] AS sf
                  FROM hw h JOIN n ON n.k = h.k AND h.ord = n.n)
          SELECT k, n, round(l, 4) AS level, round(b, 4) AS trend,
            round(l + $h.0 * b + sf, 4) AS forecast
          FROM fin ORDER BY k"""
    },

    "q311_glove_cooccurrence" ->
      """WITH toks AS (
           SELECT list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '') AS tk
           FROM documents WHERE doc_id % 3 = 0),
         p AS (SELECT tk, unnest(range(0, len(tk))) AS p FROM toks),
         pd AS (SELECT tk, p,
                  unnest(range(1, least(4, len(tk) - p - 1) + 1)) AS d
                FROM p WHERE len(tk) - p >= 2),
         pr AS (SELECT tk[p + 1] AS wa, tk[p + d + 1] AS wb,
                  12 // d AS wt
                FROM pd),
         cn AS (SELECT least(wa, wb) AS w1, greatest(wa, wb) AS w2, wt
                FROM pr)
         SELECT w1, w2, count(*) AS n_pair,
           round(CAST(sum(wt) AS DOUBLE) / 12.0, 4) AS x
         FROM cn GROUP BY w1, w2 HAVING count(*) >= 10
         ORDER BY w1, w2""",

    // q312: counts + ordered matched strings are DuckDB-recomputable via
    // regexp_extract_all; slices_match is the engine's in-query
    // certification that each span slices back to its matched text
    // (positions themselves stay spec-pinned — DuckDB has no
    // position-returning extract-all)
    "q312_pii_spans" ->
      s"""WITH p AS (${PiiSql.decorated}),
         pats(pii_class, pat) AS (VALUES
           ('email', '${PiiSql.email}'), ('ipv4', '${PiiSql.ipv4}'),
           ('id', '${PiiSql.id}'), ('phone', '${PiiSql.phone}')),
         m AS (SELECT doc_id AS id, pii_class,
                      regexp_extract_all(ptext, pat) AS ms
               FROM p CROSS JOIN pats)
         SELECT id, pii_class, CAST(len(ms) AS BIGINT) AS n_spans,
           array_to_string(ms, '|') AS matched_seq,
           true AS slices_match
         FROM m WHERE len(ms) > 0 ORDER BY id, pii_class""",

    "q313_isotonic" ->
      """WITH s AS (SELECT CAST(floor(value / 5) AS BIGINT) AS bin,
                 CAST(event_type = 'purchase' AS BIGINT) AS y FROM events),
         b AS (SELECT bin, count(*) AS n, sum(y) AS pos FROM s GROUP BY bin),
         c AS (SELECT bin, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
                 row_number() OVER (ORDER BY bin) AS r,
                 CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
                 CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp FROM b),
         pr AS (SELECT i.r AS i, j.r AS j,
                  CAST(j.cp - i.cp + i.pos AS DOUBLE) /
                    (j.cn - i.cn + i.n) AS m
                FROM c i JOIN c j ON i.r <= j.r),
         mn AS (SELECT pr.i, k.r AS k, min(pr.m) AS v
                FROM pr JOIN c k ON pr.i <= k.r AND pr.j >= k.r
                GROUP BY pr.i, k.r),
         fit AS (SELECT k, max(v) AS cal FROM mn GROUP BY k)
         SELECT c.bin, c.n, c.pos,
           round(CAST(c.pos AS DOUBLE) / c.n, 4) AS rate,
           round(f.cal, 4) AS calibrated
         FROM c JOIN fit f ON f.k = c.r ORDER BY bin""",

    "q314_roc_auc" ->
      """WITH s AS (SELECT value AS m,
                 CAST(event_type = 'purchase' AS BIGINT) AS y FROM events),
         pv AS (SELECT m, count(*) AS t, sum(y) AS n1v FROM s GROUP BY m),
         r AS (SELECT t, n1v,
                 sum(t) OVER (ORDER BY m) - t + (t + 1) / 2.0 AS midrank
               FROM pv),
         a AS (SELECT CAST(sum(t) AS BIGINT) AS nn,
                 CAST(sum(n1v) AS BIGINT) AS n1,
                 CAST(sum(n1v * midrank) AS DOUBLE) AS r1 FROM r)
         SELECT n1 AS n_pos, nn - n1 AS n_neg,
           round((r1 - n1 * (n1 + 1) / 2.0) / (n1 * (nn - n1)), 4) AS auc,
           round((r1 - n1 * (n1 + 1) / 2.0) / (n1 * (nn - n1)) * 2 - 1, 4)
             AS gini
         FROM a""",

    "q315_calibration_error" ->
      """WITH s AS (SELECT value / 500 AS p,
                 CAST(event_type = 'purchase' AS INT) AS y FROM events),
         b AS (SELECT CAST(least(greatest(floor(p * 10), 0), 9) AS BIGINT)
                   AS bin,
                 count(*) AS n, avg(p) AS conf, avg(y) AS acc
               FROM s GROUP BY 1)
         SELECT CAST(sum(n) AS BIGINT) AS n, count(*) AS n_bins,
           round(sum(abs(conf - acc) * n) / sum(n), 4) AS ece,
           round(max(abs(conf - acc)), 4) AS mce
         FROM b""",

    "q316_lift" ->
      """WITH s AS (SELECT value AS m,
                 CAST(event_type = 'purchase' AS BIGINT) AS y FROM events),
         r AS (SELECT y, ntile(10) OVER (ORDER BY m DESC, y) AS decile
               FROM s),
         a AS (SELECT decile, count(*) AS n,
                 CAST(sum(y) AS BIGINT) AS responders
               FROM r GROUP BY decile),
         t AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
                 CAST(sum(responders) AS DOUBLE) AS np FROM a)
         SELECT CAST(decile AS BIGINT) AS decile, n, responders,
           round(responders / CAST(n AS DOUBLE), 4) AS rate,
           round((responders / CAST(n AS DOUBLE)) / (np / nn), 4) AS lift,
           round(sum(responders) OVER (ORDER BY decile) / np, 4)
             AS cum_gains
         FROM a, t ORDER BY decile""",

    "q317_target_encode" ->
      """WITH s AS (SELECT event_id AS id, event_type AS cat,
                 CAST(value > 50 AS BIGINT) AS y,
                 CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                   1, 15)) AS BIGINT) % 5 AS fold FROM events),
         cf AS (SELECT cat, fold, count(*) AS nf,
                  CAST(sum(y) AS BIGINT) AS tf FROM s GROUP BY cat, fold),
         ct AS (SELECT cat, CAST(sum(nf) AS BIGINT) AS nc,
                  CAST(sum(tf) AS BIGINT) AS tc FROM cf GROUP BY cat),
         g AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS gm FROM s)
         SELECT s.id, s.cat, s.fold,
           round((ct.tc - cf.tf + 20.0 * g.gm) /
             (ct.nc - cf.nf + 20.0), 4) AS encoded
         FROM s JOIN cf ON cf.cat = s.cat AND cf.fold = s.fold
           JOIN ct ON ct.cat = s.cat CROSS JOIN g
         ORDER BY id""",

    "q318_quantile_normalize" ->
      """WITH s AS (SELECT event_id AS id, event_type AS grp, value AS v
               FROM events),
         r AS (SELECT id, grp, v,
                 row_number() OVER (PARTITION BY grp ORDER BY v, id) AS rk,
                 count(*) OVER (PARTITION BY grp) AS ng FROM s),
         g AS (SELECT v AS gv, row_number() OVER (ORDER BY v) AS gp FROM s),
         n AS (SELECT count(*) AS nn FROM s),
         ip AS (SELECT id, grp, v,
                  CASE WHEN ng = 1 THEN 0.5
                       ELSE (rk - 1) / CAST(ng - 1 AS DOUBLE) END
                    * (nn - 1) AS gpos
                FROM r CROSS JOIN n),
         fp AS (SELECT *, CAST(floor(gpos) AS BIGINT) AS fl FROM ip)
         SELECT fp.id, fp.grp, fp.v,
           gl.gv + (fp.gpos - fp.fl) * (gh.gv - gl.gv) AS qnorm
         FROM fp CROSS JOIN n
           JOIN g gl ON gl.gp = fp.fl + 1
           JOIN g gh ON gh.gp = least(fp.fl + 2, n.nn)
         ORDER BY id""",

    "q319_mutual_information" ->
      """WITH cells AS (SELECT lang AS a, source AS b, count(*) AS o
               FROM documents
               WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
         rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a),
         ctt AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b),
         t AS (SELECT CAST(sum(o) AS DOUBLE) AS n,
                 count(DISTINCT a) AS r, count(DISTINCT b) AS c FROM cells),
         hx AS (SELECT -sum(ra / n * ln(ra / n)) AS hx FROM rt CROSS JOIN t),
         hy AS (SELECT -sum(cb / n * ln(cb / n)) AS hy FROM ctt CROSS JOIN t),
         mi AS (SELECT sum(o / n * ln(o * n / (ra * CAST(cb AS DOUBLE))))
                    AS mi0
                FROM cells JOIN rt USING (a) JOIN ctt USING (b)
                  CROSS JOIN t)
         SELECT CAST(t.n AS BIGINT) AS n, t.r, t.c,
           round(mi.mi0, 4) AS mi,
           round(CASE WHEN hx.hx > 0 AND hy.hy > 0
             THEN mi.mi0 / sqrt(hx.hx * hy.hy) END, 4) AS nmi
         FROM t CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""",

    "q320_sgns_pairs" ->
      """WITH toks AS (SELECT list_filter(string_split_regex(trim(text),
                   '\s+'), x -> x <> '') AS tk
               FROM documents WHERE doc_id % 5 = 0),
         flat AS (SELECT unnest(tk) AS w FROM toks),
         vocab AS (SELECT w, count(*) AS cnt FROM flat GROUP BY w
                   HAVING count(*) >= 20),
         vr AS (SELECT w, CAST(cnt AS BIGINT) AS cnt,
                  CAST(sum(cnt) OVER (ORDER BY w) - cnt AS BIGINT) AS lo
                FROM vocab),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
         p AS (SELECT tk, unnest(range(0, len(tk))) AS p FROM toks),
         pd AS (SELECT tk, p,
                  unnest(range(1, least(2, len(tk) - p - 1) + 1)) AS d
                FROM p WHERE len(tk) - p >= 2),
         pr AS (SELECT tk[p + 1] AS wa, tk[p + d + 1] AS wb FROM pd),
         dir AS (SELECT wa AS center, wb AS context FROM pr
                 UNION ALL SELECT wb, wa FROM pr),
         pp AS (SELECT center, context, count(*) AS n_pos FROM dir
                JOIN vr va ON va.w = dir.center
                JOIN vr vb ON vb.w = dir.context
                GROUP BY center, context),
         ex AS (SELECT center, context, CAST(n_pos AS BIGINT) AS n_pos,
                  unnest(range(1, 3)) AS j FROM pp),
         rr AS (SELECT ex.*, CAST(concat('0x', substr(md5(concat(center,
                    chr(1), context, chr(1), CAST(j AS VARCHAR))), 1, 15))
                  AS BIGINT) % tot.total AS r
                FROM ex CROSS JOIN tot)
         SELECT rr.center, rr.context, rr.n_pos, CAST(rr.j AS INT) AS j,
           vr.w AS neg
         FROM rr JOIN vr ON rr.r >= vr.lo AND rr.r < vr.lo + vr.cnt
         ORDER BY center, context, j""",

    "q321_holt_winters_mult" -> {
      // multiplicative twin of the q310 oracle: seasonal state seeds at
      // the identity 1 (the base row's own update is exactly
      // g*1 + (1-g)*1 = 1 in IEEE: ig is computed AS 1-g, so the pair
      // sums back to 1.0), damped-trend forecast uses the inlined
      // Scala-computed phi-power sum so both engines see one double
      val a = 0.5; val b = 0.3; val g = 0.4; val m = 7; val h = 2
      val phi = 0.9
      val (ia, ib, ig) = (1.0 - a, 1.0 - b, 1.0 - g)
      val dampSum = (1 to h).map(j => math.pow(phi, j)).sum
      val ones = Seq.fill(m)("1.0").mkString("[", ", ", "]")
      val pos = s"((sd.ord - 1) % $m)"
      val sOld = s"h.s[$pos + 1]"
      val l1 = s"($a * (sd.y / $sOld) + $ia * (h.l + $phi * h.b))"
      val s1 = s"($g * (sd.y / $l1) + $ig * $sOld)"
      s"""WITH RECURSIVE sd AS (
            SELECT k, row_number() OVER (PARTITION BY k ORDER BY day)
                AS ord, y
            FROM (SELECT user_id % 3 AS k, CAST(ts AS DATE) AS day,
                    sum(value) AS y
                  FROM events GROUP BY 1, 2)),
          n AS (SELECT k, max(ord) AS n FROM sd GROUP BY k),
          hw AS (
            SELECT k, ord, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b,
              CAST($ones AS DOUBLE[]) AS s
            FROM sd WHERE ord = 1
            UNION ALL
            SELECT sd.k, sd.ord,
              $l1 AS l,
              $b * ($l1 - h.l) + $ib * $phi * h.b AS b,
              list_concat(list_concat(h.s[1:$pos], [$s1]),
                h.s[$pos + 2:]) AS s
            FROM hw h JOIN sd ON sd.k = h.k AND sd.ord = h.ord + 1),
          fin AS (SELECT h.k, n.n, h.l, h.b,
                    h.s[((n.n + $h - 1) % $m) + 1] AS sf
                  FROM hw h JOIN n ON n.k = h.k AND h.ord = n.n)
          SELECT k, n, round(l, 4) AS level, round(b, 4) AS trend,
            round((l + $dampSum * b) * sf, 4) AS forecast
          FROM fin ORDER BY k"""
    },

    "q322_pacf" -> {
      // Durbin-Levinson unrolled over DuckDB lists: rho from the q295
      // machinery (unrounded), then one (pmm, list-update) CTE pair per
      // level — range(1, m) drives both the inner sums and the phi
      // update, the exact index sets the Spark fold walks
      val L = 5
      val lagCols = (1 to L).map(k =>
        s"lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
        .mkString(", ")
      val numCols = (1 to L).map(k =>
        s"sum((v - mu) * (l$k - mu)) AS num$k").mkString(", ")
      val rhoList = (1 to L).map(k =>
        s"CASE WHEN den > 0 THEN num$k / den END")
        .mkString("[", ", ", "]")
      val steps = (2 to L).map { m =>
        s"""s$m AS (SELECT *,
             CASE WHEN (1 - list_sum(list_transform(range(1, $m),
                 j -> phis[j] * rho[j]))) <> 0 THEN
               (rho[$m] - list_sum(list_transform(range(1, $m),
                 j -> phis[j] * rho[$m - j]))) /
               (1 - list_sum(list_transform(range(1, $m),
                 j -> phis[j] * rho[j]))) END AS pmm
           FROM d${m - 1}),
         d$m AS (SELECT event_type, n, rho,
             list_concat(list_transform(range(1, $m),
               j -> phis[j] - pmm * phis[$m - j]), [pmm]) AS phis,
             list_concat(diag, [pmm]) AS diag
           FROM s$m)"""
      }.mkString(",\n         ")
      s"""WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(value) AS v
               FROM events GROUP BY 1, 2),
         mm AS (SELECT event_type, v,
                 avg(v) OVER (PARTITION BY event_type) AS mu, $lagCols
               FROM sday),
         a AS (SELECT event_type, count(*) AS n,
                 sum(pow(v - mu, 2)) AS den, $numCols
               FROM mm GROUP BY event_type),
         r0 AS (SELECT event_type, n, $rhoList AS rho FROM a),
         d1 AS (SELECT event_type, n, rho,
                  [rho[1]] AS phis, [rho[1]] AS diag FROM r0),
         $steps
         SELECT event_type, unnest(range(1, $L + 1)) AS lag, n,
           round(unnest(diag), 4) AS pacf
         FROM d$L ORDER BY event_type, lag"""
    },

    "q323_sprt" -> {
      // the Wald constants are Scala-computed doubles inlined as
      // shortest-repr literals, and the running LLR is an ORDERED
      // window sum — the identical IEEE fold in both engines
      val p0 = 0.45; val p1 = 0.55; val al = 0.05; val be = 0.2
      val wp = math.log(p1 / p0); val wn = math.log((1 - p1) / (1 - p0))
      val lo = math.log(be / (1 - al)); val up = math.log((1 - be) / al)
      s"""WITH s AS (SELECT event_type AS k, ts, event_id AS tb,
                 CASE WHEN value > 50 THEN 1 ELSE 0 END AS x FROM events),
         w AS (SELECT k,
                 row_number() OVER (PARTITION BY k ORDER BY ts, tb)
                   AS ord,
                 sum(CASE WHEN x = 1 THEN $wp ELSE $wn END)
                   OVER (PARTITION BY k ORDER BY ts, tb
                         ROWS UNBOUNDED PRECEDING) AS llr
               FROM s),
         c AS (SELECT k, ord, llr,
                 CASE WHEN llr >= $up THEN 1
                      WHEN llr <= $lo THEN -1 END AS cr
               FROM w),
         fc AS (SELECT k, min(ord) AS n_at FROM c WHERE cr IS NOT NULL
                GROUP BY k),
         dec AS (SELECT c.k, c.cr FROM c
                 JOIN fc ON fc.k = c.k AND c.ord = fc.n_at),
         fin AS (SELECT k, count(*) AS n, arg_max(llr, ord) AS lf
                 FROM c GROUP BY k)
         SELECT fin.k AS k, fin.n,
           CASE WHEN fc.n_at IS NULL THEN 'continue'
                WHEN dec.cr = 1 THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           fc.n_at AS n_at_decision,
           round(fin.lf, 4) AS llr_final
         FROM fin LEFT JOIN fc ON fc.k = fin.k
           LEFT JOIN dec ON dec.k = fin.k
         ORDER BY fin.k"""
    },

    "q327_rake" ->
      """WITH d AS (SELECT doc_id AS id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                   x -> x <> '') AS tk
               FROM documents WHERE doc_id % 7 = 0),
         toks AS (SELECT id, unnest(tk) AS tok,
                    unnest(range(1, len(tk) + 1)) AS pos FROM d),
         mk AS (SELECT id, tok, pos,
                  tok IN ('a', 'the', 'value', 'table') AS stop
                FROM toks),
         ph AS (SELECT id, tok, pos,
                  sum(CASE WHEN stop THEN 1 ELSE 0 END)
                    OVER (PARTITION BY id ORDER BY pos) AS pid, stop
                FROM mk),
         kept AS (SELECT id, tok, pos, pid FROM ph WHERE NOT stop),
         wl AS (SELECT *, count(*) OVER (PARTITION BY id, pid) AS plen
                FROM kept),
         k2 AS (SELECT * FROM wl WHERE plen <= 4),
         ws AS (SELECT id, tok, count(*) AS freq,
                  CAST(sum(plen) AS BIGINT) AS deg
                FROM k2 GROUP BY id, tok),
         sc AS (SELECT k2.id, k2.pid,
                  string_agg(k2.tok, ' ' ORDER BY k2.pos) AS phrase,
                  sum(CAST(ws.deg AS DOUBLE) / ws.freq) AS score0
                FROM k2 JOIN ws ON ws.id = k2.id AND ws.tok = k2.tok
                GROUP BY k2.id, k2.pid),
         dd AS (SELECT id, phrase, max(round(score0, 4)) AS score
                FROM sc GROUP BY id, phrase),
         rk AS (SELECT id, phrase, score,
                  row_number() OVER (PARTITION BY id
                    ORDER BY score DESC, phrase) AS rank
                FROM dd)
         SELECT id, CAST(rank AS BIGINT) AS rank, phrase, score
         FROM rk WHERE rank <= 3 ORDER BY id, rank""",

    "q328_anova" ->
      """WITH s AS (SELECT event_type AS arm, value AS m FROM events),
         g AS (SELECT arm, count(*) AS ng, sum(m) AS sg,
                 sum(m * m) AS qg FROM s GROUP BY arm),
         t AS (SELECT CAST(sum(ng) AS BIGINT) AS nn, count(*) AS k,
                 sum(sg) AS st, sum(sg * sg / ng) AS sb0,
                 sum(qg) AS qt FROM g),
         d AS (SELECT nn, k, sb0 - st * st / nn AS ssb,
                 qt - sb0 AS ssw FROM t)
         SELECT nn AS n, k AS k_arms,
           round(CASE WHEN k > 1 AND nn > k AND ssw > 0
             THEN (ssb / (k - 1)) / (ssw / (nn - k)) END, 4) AS f,
           k - 1 AS df1, nn - k AS df2,
           round(CASE WHEN ssb + ssw > 0
             THEN ssb / (ssb + ssw) END, 4) AS eta_sq
         FROM d""",

    "q329_bh_fdr" ->
      """WITH h AS (SELECT event_type AS family,
                 CAST(user_id % 20 AS VARCHAR) AS key,
                 avg(value) / 500 AS p
               FROM events GROUP BY 1, 2),
         r AS (SELECT family, key, p,
                 row_number() OVER (PARTITION BY family
                   ORDER BY p, key) AS rank,
                 count(*) OVER (PARTITION BY family) AS nn FROM h)
         SELECT family, key, p, rank,
           round(least(min(p * nn / rank) OVER (PARTITION BY family
             ORDER BY p, key
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0), 4)
             AS p_adj
         FROM r ORDER BY family, rank""",

    "q330_mcnemar" ->
      """WITH pr AS (SELECT user_id,
                 max(CAST(event_type = 'click' AS INT)) AS x,
                 max(CAST(event_type = 'purchase' AS INT)) AS y
               FROM events GROUP BY user_id),
         a AS (SELECT count(*) AS n,
                 CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
                 CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS c
               FROM pr)
         SELECT n, b, c,
           round(CASE WHEN b + c > 0
             THEN pow(abs(b - c) - 1, 2) / (b + c) END, 4) AS chi2,
           coalesce(CASE WHEN b + c > 0
             THEN pow(abs(b - c) - 1, 2) / (b + c) END > 3.841, false)
             AS significant
         FROM a""",

    "q331_brown_forsythe" ->
      """WITH s AS (SELECT event_type AS arm, value AS m FROM events),
         md AS (SELECT arm, quantile_cont(m, 0.5) AS md FROM s
                GROUP BY arm),
         z AS (SELECT s.arm, abs(s.m - md.md) AS m
               FROM s JOIN md ON md.arm = s.arm),
         g AS (SELECT arm, count(*) AS ng, sum(m) AS sg,
                 sum(m * m) AS qg FROM z GROUP BY arm),
         t AS (SELECT CAST(sum(ng) AS BIGINT) AS nn, count(*) AS k,
                 sum(sg) AS st, sum(sg * sg / ng) AS sb0,
                 sum(qg) AS qt FROM g),
         d AS (SELECT nn, k, sb0 - st * st / nn AS ssb,
                 qt - sb0 AS ssw FROM t)
         SELECT nn AS n, k AS k_arms,
           round(CASE WHEN k > 1 AND nn > k AND ssw > 0
             THEN (ssb / (k - 1)) / (ssw / (nn - k)) END, 4) AS f,
           k - 1 AS df1, nn - k AS df2
         FROM d""",

    "q332_conformal" ->
      """WITH e AS (SELECT event_id AS id, event_type, value,
                 event_id % 5 = 0 AS cal FROM events),
         model AS (SELECT event_type, avg(value) AS pred FROM e
                   WHERE cal GROUP BY 1),
         s AS (SELECT e.id, e.value, e.cal, m.pred
               FROM e JOIN model m USING (event_type)),
         r AS (SELECT abs(value - pred) AS r FROM s WHERE cal),
         n AS (SELECT count(*) AS nc FROM r),
         kk AS (SELECT CAST(ceil((nc + 1) * 0.9) AS BIGINT) AS k FROM n),
         ranked AS (SELECT r, row_number() OVER (ORDER BY r) AS rn
                    FROM r),
         q AS (SELECT r AS q FROM ranked CROSS JOIN kk WHERE rn = kk.k)
         SELECT s.id, s.pred, round(s.pred - q.q, 4) AS lo,
           round(s.pred + q.q, 4) AS hi
         FROM s CROSS JOIN q WHERE NOT s.cal ORDER BY id""",

    "q333_event_sequences" ->
      """WITH s AS (SELECT user_id AS k, event_type AS tp, ts,
                 event_id AS tb FROM events),
         l AS (SELECT k, tp,
                 lead(tp, 1) OVER (PARTITION BY k ORDER BY ts, tb) AS n1,
                 lead(tp, 2) OVER (PARTITION BY k ORDER BY ts, tb) AS n2
               FROM s),
         g AS (SELECT concat(tp, '->', n1, '->', n2) AS seq, k FROM l
               WHERE n1 IS NOT NULL AND n2 IS NOT NULL),
         pk AS (SELECT seq, k, count(*) AS c FROM g GROUP BY seq, k)
         SELECT seq, count(*) AS support,
           CAST(sum(c) AS BIGINT) AS occurrences
         FROM pk GROUP BY seq HAVING count(*) >= 3 ORDER BY seq""",

    "q334_ips" ->
      """WITH s AS (SELECT CAST(user_id % 4 AS VARCHAR) AS ctx,
                 event_type AS arm, value AS r FROM events),
         prop AS (SELECT ctx, arm, count(*) AS na FROM s GROUP BY 1, 2),
         ct AS (SELECT ctx, CAST(sum(na) AS BIGINT) AS nc FROM prop
                GROUP BY ctx),
         pol AS (SELECT CAST(i AS VARCHAR) AS ctx,
                   CASE WHEN i % 2 = 0 THEN 'click' ELSE 'view' END
                     AS parm
                 FROM range(4) t(i)),
         j AS (SELECT s.r,
                 CASE WHEN s.arm = pol.parm
                   THEN s.r * ct.nc / prop.na ELSE 0.0 END AS w,
                 CASE WHEN s.arm = pol.parm THEN 1 ELSE 0 END AS m
               FROM s JOIN prop USING (ctx, arm) JOIN ct USING (ctx)
                 LEFT JOIN pol USING (ctx))
         SELECT count(*) AS n, CAST(sum(m) AS BIGINT) AS n_matched,
           round(sum(w) / count(*), 4) AS v_hat,
           round(avg(r), 4) AS v_logged
         FROM j""",

    "q335_moments" ->
      """WITH s AS (SELECT event_type, value AS v FROM events),
         g AS (SELECT event_type, count(*) AS n, sum(v) AS s1,
                 sum(v * v) AS s2, sum(v * v * v) AS s3,
                 sum(v * v * v * v) AS s4
               FROM s GROUP BY event_type),
         c AS (SELECT event_type, n, s1, s2, s3, s4,
                 CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS m
               FROM g),
         mm AS (SELECT *, s2 / nd - m * m AS m2,
                  s3 / nd - 3.0 * m * s2 / nd + 2.0 * m * m * m AS m3,
                  s4 / nd - 4.0 * m * s3 / nd + 6.0 * m * m * s2 / nd
                    - 3.0 * m * m * m * m AS m4
                FROM c)
         SELECT event_type, n, round(m, 4) AS mean,
           round(CASE WHEN n > 1
             THEN (s2 - s1 * s1 / nd) / (nd - 1) END, 4) AS variance,
           round(CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END, 4)
             AS skew,
           round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3 END, 4)
             AS kurt
         FROM mm ORDER BY event_type""",

    "q336_trimmed_mean" ->
      """WITH s AS (SELECT event_type, value AS v FROM events),
         b AS (SELECT event_type, quantile_cont(v, 0.1) AS lo,
                 quantile_cont(v, 0.9) AS hi
               FROM s GROUP BY event_type)
         SELECT s.event_type, count(*) AS n,
           CAST(sum(CASE WHEN v BETWEEN lo AND hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           round(avg(CASE WHEN v BETWEEN lo AND hi THEN v END), 4)
             AS trimmed_mean
         FROM s JOIN b USING (event_type)
         GROUP BY s.event_type ORDER BY s.event_type""",

    "q337_vocab_growth" ->
      """WITH d AS (SELECT doc_id AS id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                   x -> x <> '') AS tk
               FROM documents),
         pd AS (SELECT id, len(tk) AS n_tokens FROM d),
         fl AS (SELECT id, unnest(tk) AS term FROM d),
         fo AS (SELECT term, min(id) AS id FROM fl GROUP BY term),
         nt AS (SELECT id, count(*) AS new_types FROM fo GROUP BY id),
         j AS (SELECT pd.id, pd.n_tokens,
                 coalesce(nt.new_types, 0) AS new_types
               FROM pd LEFT JOIN nt USING (id))
         SELECT id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(sum(n_tokens) OVER (ORDER BY id) AS BIGINT)
             AS cum_tokens,
           CAST(sum(new_types) OVER (ORDER BY id) AS BIGINT)
             AS cum_types
         FROM j ORDER BY id""",

    "q338_knn_classify" -> {
      val cos = PortableSql.cosSql("a.v", "b.v")
      s"""WITH v AS (SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 CAST(label AS BIGINT) AS label FROM embeddings),
         px AS (SELECT a.id AS qid, b.id AS nbr,
                  round($cos, 4) AS sim
                FROM v a JOIN v b ON a.id <> b.id),
         ex AS (SELECT qid, nbr FROM (
                  SELECT qid, nbr, row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, nbr) AS rn FROM px)
                WHERE rn <= 5),
         vt AS (SELECT ex.qid AS id, v.label AS lbl, count(*) AS cv
                FROM ex JOIN v ON v.id = ex.nbr GROUP BY 1, 2),
         mx AS (SELECT id, max(cv) AS mv FROM vt GROUP BY id),
         pd AS (SELECT vt.id, min(vt.lbl) AS pred,
                  CAST(max(vt.cv) AS BIGINT) AS votes
                FROM vt JOIN mx ON mx.id = vt.id AND vt.cv = mx.mv
                GROUP BY vt.id)
         SELECT pd.id AS id, pd.pred, pd.votes, v.label AS actual,
           pd.pred = v.label AS correct
         FROM pd JOIN v ON v.id = pd.id ORDER BY pd.id"""
    },

    "q339_davies_bouldin" -> {
      val d2 = (a: String, b: String) =>
        s"sqrt(list_sum(list_transform(range(1, len($a) + 1), " +
          s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))))"
      s"""WITH v AS (SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 CAST(label AS BIGINT) AS c FROM embeddings),
         dims AS (SELECT c, unnest(v) AS x,
                    unnest(range(len(v))) AS i FROM v),
         cent AS (SELECT c, i, avg(x) AS m FROM dims GROUP BY c, i),
         ca AS (SELECT c, list(m ORDER BY i) AS cv FROM cent GROUP BY c),
         sc AS (SELECT v.c, avg(${d2("v.v", "ca.cv")}) AS s
                FROM v JOIN ca USING (c) GROUP BY v.c),
         pr AS (SELECT x.c AS c,
                  (x.s + y.s) / ${d2("xa.cv", "ya.cv")} AS ratio
                FROM sc x JOIN sc y ON x.c <> y.c
                  JOIN ca xa ON xa.c = x.c JOIN ca ya ON ya.c = y.c),
         w AS (SELECT c, max(ratio) AS r FROM pr GROUP BY c)
         SELECT count(*) AS n_clusters, round(avg(r), 4) AS db_index
         FROM w"""
    },

    "q340_tfidf_pairs" ->
      """WITH toks AS (SELECT doc_id AS id, unnest(list_filter(
                 string_split_regex(trim(text), '\s+'), x -> x <> ''))
                   AS term
               FROM documents WHERE doc_id % 5 = 0),
         tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nn
               FROM documents WHERE doc_id % 5 = 0),
         dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term
                 HAVING count(*) <= 40),
         w AS (SELECT tf.id, tf.term, tf.tf * ln(n.nn / dft.df) AS w
               FROM tf JOIN dft USING (term) CROSS JOIN n),
         nrm AS (SELECT id, sum(w * w) AS n2 FROM w GROUP BY id),
         d AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_shared,
                 sum(a.w * b.w) AS dot
               FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
               GROUP BY a.id, b.id)
         SELECT d.a_id, d.b_id, d.n_shared,
           round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS sim
         FROM d JOIN nrm na ON na.id = d.a_id
           JOIN nrm nb ON nb.id = d.b_id
         WHERE round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.3
         ORDER BY a_id, b_id""",

    "q341_assortativity" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
                   SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)
                 GROUP BY id),
         dir AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
         pr AS (SELECT da.d AS x, db.d AS y FROM dir
                JOIN deg da ON da.id = dir.a
                JOIN deg db ON db.id = dir.b),
         s AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy FROM pr)
         SELECT m // 2 AS n_edges,
           round(CASE WHEN m * sxx - sx * sx > 0 THEN
             (m * sxy - sx * sy) /
               (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(m * syy - sy * sy AS DOUBLE))) END, 4) AS r
         FROM s""",

    "q342_modularity" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
         asg AS (SELECT p_partkey AS id,
                   CAST(p_partkey % 7 AS BIGINT) AS c FROM part),
         wc AS (SELECT coalesce(ca.c, -e0.a - 1) AS ca,
                  coalesce(cb.c, -e0.b - 1) AS cb
                FROM e0 LEFT JOIN asg ca ON ca.id = e0.a
                  LEFT JOIN asg cb ON cb.id = e0.b),
         intra AS (SELECT ca AS c, CAST(count(*) AS BIGINT) AS ec
                   FROM wc WHERE ca = cb GROUP BY ca),
         dm AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM (
                  SELECT ca AS c FROM wc UNION ALL SELECT cb FROM wc)
                GROUP BY c)
         SELECT m.m AS n_edges, count(*) AS n_communities,
           round(sum(CAST(coalesce(i.ec, 0) AS DOUBLE) / m.m -
             (dm.dc / (2.0 * m.m)) * (dm.dc / (2.0 * m.m))), 4) AS q
         FROM dm LEFT JOIN intra i ON i.c = dm.c CROSS JOIN m
         GROUP BY m.m""",

    "q345_ppr" -> {
      // base = (100-85)·10⁶/100 = 150000 only on seeds; 3 unrolled
      // integer rounds of the q164 shape
      val steps = (1 to 3).map { i =>
        s"""r$i AS MATERIALIZED (SELECT n.id,
             n.is_seed * 150000 + coalesce(s.s, 0) * 85 // 100 AS r
           FROM ns n LEFT JOIN (
             SELECT ew.dst, CAST(sum(r // outdeg) AS BIGINT) AS s
             FROM ew JOIN r${i - 1} v ON v.id = ew.src
             GROUP BY ew.dst) s ON s.dst = n.id)"""
      }.mkString(",\n         ")
      s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e AS (SELECT x.p AS src, y.p AS dst
               FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p),
         ew AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN (
                  SELECT src, count(*) AS outdeg FROM e GROUP BY src) d
                  ON d.src = e.src),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         ns AS (SELECT n.id,
                  CASE WHEN p.p_partkey IS NOT NULL THEN 1 ELSE 0 END
                    AS is_seed
                FROM nodes n LEFT JOIN (
                  SELECT DISTINCT p_partkey FROM part
                  WHERE p_partkey % 997 = 0) p ON p.p_partkey = n.id),
         r0 AS (SELECT id, CAST(is_seed * 1000000 AS BIGINT) AS r
                FROM ns),
         $steps
         SELECT id, CAST(r AS BIGINT) AS ppr_micro
         FROM r3 ORDER BY id"""
    },

    "q346_nelson_aalen" ->
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
                      AS e
                  FROM f LEFT JOIN p USING (user_id)),
         pt AS (SELECT t,
                  CAST(count(*) FILTER (WHERE e) AS BIGINT) AS n_event,
                  count(*) AS n_at
                FROM subj GROUP BY t),
         k AS (SELECT t, n_event, n_at,
                 CAST(sum(n_at) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
               FROM pt),
         k2 AS (SELECT t, n_event, n_risk,
                  sum(n_event / CAST(n_risk AS DOUBLE))
                    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS h
                FROM k)
         SELECT t, n_risk, n_event, round(h, 4) AS cum_hazard,
           round(exp(-h), 4) AS survival_fh
         FROM k2 WHERE n_event > 0 ORDER BY t""",

    "q347_lorenz" ->
      """WITH s AS (SELECT value AS m FROM events WHERE value >= 0),
         r AS (SELECT m, ntile(10) OVER (ORDER BY m) AS bucket FROM s),
         a AS (SELECT bucket, count(*) AS n, sum(m) AS vs FROM r
               GROUP BY bucket),
         t AS (SELECT CAST(sum(vs) AS DOUBLE) AS tv FROM a)
         SELECT CAST(bucket AS BIGINT) AS bucket, n,
           round(vs, 4) AS value_sum,
           round(sum(vs) OVER (ORDER BY bucket) / tv, 4) AS cum_share
         FROM a CROSS JOIN t ORDER BY bucket""",

    "q348_spearman" ->
      """WITH s AS (SELECT value AS x, CAST(user_id % 100 AS DOUBLE) AS y
               FROM events),
         rx AS (SELECT x, sum(t) OVER (ORDER BY x) - t + (t + 1) / 2.0
                    AS rx
                FROM (SELECT x, count(*) AS t FROM s GROUP BY x)),
         ry AS (SELECT y, sum(t) OVER (ORDER BY y) - t + (t + 1) / 2.0
                    AS ry
                FROM (SELECT y, count(*) AS t FROM s GROUP BY y)),
         j AS (SELECT rx.rx, ry.ry FROM s JOIN rx USING (x)
               JOIN ry USING (y)),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(rx) AS DOUBLE) AS sx,
                 CAST(sum(ry) AS DOUBLE) AS sy,
                 CAST(sum(rx * rx) AS DOUBLE) AS sxx,
                 CAST(sum(ry * ry) AS DOUBLE) AS syy,
                 CAST(sum(rx * ry) AS DOUBLE) AS sxy FROM j)
         SELECT n,
           round(CASE WHEN n * sxx - sx * sx > 0
                   AND n * syy - sy * sy > 0 THEN
             (n * sxy - sx * sy) /
               (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END,
             4) AS rho
         FROM a""",

    "q349_cohens_kappa" ->
      """WITH s AS (SELECT CAST(value > 50 AS INT) AS a,
                 CAST(value > 60 AS INT) AS b FROM events),
         cells AS (SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR)
                     AS b, count(*) AS o FROM s GROUP BY 1, 2),
         t AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM cells),
         po AS (SELECT CAST(coalesce(sum(o), 0) AS DOUBLE) AS dg
                FROM cells WHERE a = b),
         pe AS (SELECT CAST(coalesce(sum(ra.ra * cb.cb), 0) AS DOUBLE)
                  AS mp FROM
                  (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells
                   GROUP BY a) ra
                JOIN (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells
                      GROUP BY b) cb ON ra.a = cb.b)
         SELECT CAST(t.n AS BIGINT) AS n,
           round(po.dg / t.n, 4) AS po,
           round(pe.mp / (t.n * t.n), 4) AS pe,
           round(CASE WHEN pe.mp / (t.n * t.n) < 1 THEN
             (po.dg / t.n - pe.mp / (t.n * t.n)) /
               (1.0 - pe.mp / (t.n * t.n)) END, 4) AS kappa
         FROM t CROSS JOIN po CROSS JOIN pe""",

    "q351_kendall_tau" ->
      """WITH s AS (SELECT CAST(floor(value / 5) AS DOUBLE) AS x,
                 CAST(user_id % 100 AS DOUBLE) AS y
               FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT x, y, count(*) AS c FROM s GROUP BY x, y),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
         tx AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) AS tpx
                FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells
                      GROUP BY x)),
         ty AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) AS tpy
                FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells
                      GROUP BY y)),
         pr AS (SELECT
                  CAST(coalesce(sum(CASE WHEN b.y > a.y
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS concordant,
                  CAST(coalesce(sum(CASE WHEN b.y < a.y
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS discordant
                FROM cells a JOIN cells b ON a.x < b.x),
         f AS (SELECT n, concordant, discordant,
                 n * (n - 1) // 2 AS n0, tpx // 2 AS n1, tpy // 2 AS n2
               FROM tot, pr, tx, ty)
         SELECT n, concordant, discordant,
           round(CASE WHEN n0 > n1 AND n0 > n2 THEN
             (concordant - discordant) /
               sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
             END, 4) AS tau_b
         FROM f""",

    "q352_chao1" ->
      """WITH tk AS (SELECT source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         wc AS (SELECT source, w, count(*) AS c FROM tk GROUP BY source, w)
         SELECT source, count(*) AS d_obs,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           count(*) +
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) *
                  (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1) AS BIGINT) /
             (2.0 * (CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
               AS BIGINT) + 1)) AS chao1
         FROM wc GROUP BY source ORDER BY source""",

    // q353: feature/value strings differ between engines (Spark casts
    // floor() longs, DuckDB doubles) but v is a grouping key only —
    // the contingency PARTITION is identical, and only per-feature
    // aggregates surface
    "q353_feature_screen" ->
      """WITH m AS (
           SELECT 'event_type' AS f, event_type AS v,
                  CAST(value > 50 AS VARCHAR) AS y FROM events
           UNION ALL
           SELECT 'user_decile', CAST(user_id % 10 AS VARCHAR),
                  CAST(value > 50 AS VARCHAR) FROM events
           UNION ALL
           SELECT 'value_bin', CAST(floor(value / 20) AS VARCHAR),
                  CAST(value > 50 AS VARCHAR) FROM events),
         mm AS (SELECT f, v, y FROM m
                WHERE v IS NOT NULL AND y IS NOT NULL),
         cells AS (SELECT f, v, y, count(*) AS o FROM mm GROUP BY f, v, y),
         vt AS (SELECT f, v, CAST(sum(o) AS BIGINT) AS rv FROM cells
                GROUP BY f, v),
         yt AS (SELECT f, y, CAST(sum(o) AS BIGINT) AS cy FROM cells
                GROUP BY f, y),
         tt AS (SELECT f, CAST(sum(o) AS DOUBLE) AS n FROM cells GROUP BY f),
         hx AS (SELECT vt.f, -sum(rv / n * ln(rv / n)) AS hf
                FROM vt JOIN tt ON vt.f = tt.f GROUP BY vt.f),
         hy AS (SELECT yt.f, -sum(cy / n * ln(cy / n)) AS hl
                FROM yt JOIN tt ON yt.f = tt.f GROUP BY yt.f),
         mi AS (SELECT c.f, sum(o / n * ln(o * n / (rv * CAST(cy AS DOUBLE))))
                  AS mi0
                FROM cells c JOIN vt ON vt.f = c.f AND vt.v = c.v
                  JOIN yt ON yt.f = c.f AND yt.y = c.y
                  JOIN tt ON tt.f = c.f
                GROUP BY c.f)
         SELECT tt.f AS feature, CAST(tt.n AS BIGINT) AS n,
           round(hy.hl, 4) AS h_label,
           round(mi.mi0, 4) AS info_gain,
           round(CASE WHEN hx.hf > 0 THEN mi.mi0 / hx.hf END, 4)
             AS gain_ratio
         FROM tt JOIN hy ON hy.f = tt.f JOIN hx ON hx.f = tt.f
           JOIN mi ON mi.f = tt.f
         ORDER BY feature""",

    "q354_forecast_backtest" ->
      """WITH sd AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 avg(value) AS v FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, v,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY day) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n,
                 lag(v, 7) OVER (PARTITION BY event_type
                   ORDER BY day) AS f,
                 abs(v - lag(v, 1) OVER (PARTITION BY event_type
                   ORDER BY day)) AS d1
               FROM sd),
         g AS (SELECT event_type, any_value(n) AS n,
                 any_value(n) - 7 AS n_train,
                 avg(CASE WHEN rn > n - 7 THEN abs(f - v) END) AS mae,
                 avg(CASE WHEN rn >= 2 AND rn <= n - 7 THEN d1 END)
                   AS scale,
                 avg(CASE WHEN rn > n - 7 THEN
                   CASE WHEN abs(f) + abs(v) > 0 THEN
                     2.0 * abs(f - v) / (abs(f) + abs(v))
                   ELSE 0.0 END END) AS smape
               FROM w WHERE n >= 15 GROUP BY event_type)
         SELECT event_type, n, n_train, mae,
           CASE WHEN scale > 0 THEN mae / scale END AS mase, smape
         FROM g ORDER BY event_type""",

    // q355: per-key min-max identity replay of the per-key PAV —
    // max_{i<=k} min_{j>=k} avg(i..j) within each event_type
    "q355_isotonic_by_key" ->
      """WITH s AS (SELECT event_type AS k,
                 CAST(floor(value / 5) AS BIGINT) AS bin,
                 CAST(user_id % 97 < value AS BIGINT) AS y FROM events),
         b AS (SELECT k, bin, count(*) AS n, sum(y) AS pos
               FROM s GROUP BY k, bin),
         c AS (SELECT k, bin, CAST(n AS BIGINT) AS n,
                 CAST(pos AS BIGINT) AS pos,
                 row_number() OVER (PARTITION BY k ORDER BY bin) AS r,
                 CAST(sum(n) OVER (PARTITION BY k ORDER BY bin)
                   AS BIGINT) AS cn,
                 CAST(sum(pos) OVER (PARTITION BY k ORDER BY bin)
                   AS BIGINT) AS cp FROM b),
         pr AS (SELECT i.k, i.r AS i, j.r AS j,
                  CAST(j.cp - i.cp + i.pos AS DOUBLE) /
                    (j.cn - i.cn + i.n) AS m
                FROM c i JOIN c j ON i.k = j.k AND i.r <= j.r),
         mn AS (SELECT pr.k, pr.i, x.r AS xr, min(pr.m) AS v
                FROM pr JOIN c x ON x.k = pr.k AND pr.i <= x.r
                  AND pr.j >= x.r
                GROUP BY pr.k, pr.i, x.r),
         fit AS (SELECT k, xr, max(v) AS cal FROM mn GROUP BY k, xr)
         SELECT c.k, c.bin, c.n, c.pos,
           CAST(c.pos AS DOUBLE) / c.n AS rate,
           f.cal AS calibrated
         FROM c JOIN fit f ON f.k = c.k AND f.xr = c.r
         ORDER BY c.k, c.bin""",

    "q356_theil_sen" ->
      """WITH sd AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 avg(value) AS v FROM events GROUP BY 1, 2),
         p AS (SELECT event_type,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY day) AS rn,
                 CAST(date_diff('day', DATE '1970-01-01', day)
                   AS DOUBLE) AS t, v
               FROM sd),
         pr AS (SELECT a.event_type, (b.v - a.v) / (b.t - a.t) AS slope
                FROM p a JOIN p b ON a.event_type = b.event_type
                  AND a.rn < b.rn AND a.t <> b.t),
         r AS (SELECT event_type, slope,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY slope) AS sr,
                 count(*) OVER (PARTITION BY event_type) AS m FROM pr)
         SELECT event_type, any_value(m) AS n_pairs,
           sum(slope) / count(*) AS slope
         FROM r WHERE sr = (m + 1) // 2 OR sr = (m + 2) // 2
         GROUP BY event_type ORDER BY event_type""",

    "q357_gapped_sequences" ->
      """WITH p AS (SELECT user_id AS k, event_type AS tp,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS i
               FROM events QUALIFY i <= 12),
         two AS (SELECT a.k, a.i AS i1, b.i AS i2,
                   a.tp || '->' || b.tp AS seq
                 FROM p a JOIN p b ON a.k = b.k AND a.i < b.i),
         three AS (SELECT t.k, t.seq || '->' || c.tp AS seq
                   FROM two t JOIN p c ON t.k = c.k AND t.i2 < c.i),
         al AS (SELECT k, seq, 2 AS len FROM two
                UNION ALL SELECT k, seq, 3 FROM three),
         g AS (SELECT seq, len, k, count(*) AS c FROM al
               GROUP BY 1, 2, 3)
         SELECT seq, CAST(len AS BIGINT) AS len, count(*) AS support,
           CAST(sum(c) AS BIGINT) AS occurrences
         FROM g GROUP BY seq, len HAVING count(*) >= 10
         ORDER BY len, seq""",

    // q358: the Poisson thresholds interpolate from the ONE Scala
    // source (Experiment.poissonCum) — shortest-repr doubles round-trip
    "q358_bootstrap_ci" -> {
      val caseW = graft.ops.Experiment.poissonCum.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString(" ")
      val loR = math.max(1, math.ceil(0.025 * 200).toInt)
      val hiR = math.min(200, math.ceil(0.975 * 200).toInt)
      s"""WITH s AS (SELECT event_id AS id, value AS v FROM events
               WHERE value IS NOT NULL),
         f AS (SELECT id, v, unnest(range(0, 200)) AS b FROM s),
         uu AS (SELECT v, b,
                  CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
                    CAST(b AS VARCHAR)), 1, 15) AS BIGINT)
                    / 1152921504606846976.0 AS u
                FROM f),
         w AS (SELECT v, b, CASE $caseW ELSE 8 END AS w FROM uu),
         reps AS (SELECT b, sum(w * v) AS sv, CAST(sum(w) AS BIGINT) AS sw
                  FROM w GROUP BY b),
         m AS (SELECT b, sv / sw AS m FROM reps WHERE sw > 0),
         r AS (SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM m),
         t AS (SELECT count(*) AS n, sum(v) / count(*) AS mean FROM s)
         SELECT t.n, CAST(200 AS BIGINT) AS n_boot, t.mean,
           lo.m AS lo, hi.m AS hi
         FROM t, (SELECT m FROM r WHERE r = $loR) lo,
              (SELECT m FROM r WHERE r = $hiR) hi"""
    },

    "q360_bootstrap_diff" -> {
      val caseW = graft.ops.Experiment.poissonCum.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString(" ")
      val loR = math.max(1, math.ceil(0.025 * 200).toInt)
      val hiR = math.min(200, math.ceil(0.975 * 200).toInt)
      s"""WITH s AS (SELECT event_id AS id, event_type AS arm, value AS v
               FROM events WHERE value IS NOT NULL
                 AND event_type IN ('click', 'view')),
         f AS (SELECT id, arm, v, unnest(range(0, 200)) AS b FROM s),
         uu AS (SELECT arm, v, b,
                  CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
                    CAST(b AS VARCHAR)), 1, 15) AS BIGINT)
                    / 1152921504606846976.0 AS u
                FROM f),
         w AS (SELECT arm, v, b, CASE $caseW ELSE 8 END AS w FROM uu),
         reps AS (SELECT b,
             sum(CASE WHEN arm = 'click' THEN w * v END) AS sva,
             CAST(sum(CASE WHEN arm = 'click' THEN w END) AS BIGINT)
               AS swa,
             sum(CASE WHEN arm = 'view' THEN w * v END) AS svb,
             CAST(sum(CASE WHEN arm = 'view' THEN w END) AS BIGINT)
               AS swb
           FROM w GROUP BY b),
         m AS (SELECT b, sva / swa - svb / swb AS m FROM reps
               WHERE swa > 0 AND swb > 0),
         r AS (SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM m),
         t AS (SELECT
             CAST(sum(CASE WHEN arm = 'click' THEN 1 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 'view' THEN 1 END) AS BIGINT)
               AS n_b,
             sum(CASE WHEN arm = 'click' THEN v END) /
               sum(CASE WHEN arm = 'click' THEN 1 END) -
               sum(CASE WHEN arm = 'view' THEN v END) /
                 sum(CASE WHEN arm = 'view' THEN 1 END) AS diff
           FROM s)
         SELECT t.n_a, t.n_b, CAST(200 AS BIGINT) AS n_boot, t.diff,
           lo.m AS lo, hi.m AS hi
         FROM t, (SELECT m FROM r WHERE r = $loR) lo,
              (SELECT m FROM r WHERE r = $hiR) hi"""
    },

    "q359_bleu_pairs" ->
      s"""WITH ${PortableSql.minhashVerifiedPairCtes},
         dt AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '') AS tk
                FROM documents WHERE doc_id < 200),
         pairx AS (SELECT c.a_id, c.b_id, a.tk AS ta, b.tk AS tb
                   FROM cand c JOIN dt a ON a.doc_id = c.a_id
                     JOIN dt b ON b.doc_id = c.b_id),
         gg AS (SELECT a_id, b_id, len(ta) AS r, len(tb) AS c, ta, tb,
                  list_transform(range(len(ta) - 1),
                    i -> ta[i + 1] || ' ' || ta[i + 2]) AS ga2,
                  list_transform(range(len(tb) - 1),
                    i -> tb[i + 1] || ' ' || tb[i + 2]) AS gb2
                FROM pairx),
         sc AS (SELECT a_id, b_id, r, c,
                  CAST(coalesce(list_sum(list_transform(list_distinct(tb),
                    t -> least(len(list_filter(tb, x -> x = t)),
                               len(list_filter(ta, x -> x = t))))), 0)
                    AS DOUBLE) AS m1,
                  CASE WHEN c >= 2 THEN
                    CAST(coalesce(list_sum(list_transform(
                      list_distinct(gb2),
                      t -> least(len(list_filter(gb2, x -> x = t)),
                                 len(list_filter(ga2, x -> x = t))))), 0)
                      AS DOUBLE)
                  ELSE 0.0 END AS m2
                FROM gg),
         pp AS (SELECT a_id, b_id, r, c,
                  CASE WHEN c > 0 THEN m1 / c ELSE 0.0 END AS p1,
                  CASE WHEN c >= 2 THEN m2 / (c - 1) ELSE 0.0 END AS p2,
                  CASE WHEN c = 0 THEN 0.0 WHEN c >= r THEN 1.0
                    ELSE exp(1.0 - CAST(r AS DOUBLE) / c) END AS bp
                FROM sc)
         SELECT a_id, b_id, CAST(r AS BIGINT) AS n_ref,
           CAST(c AS BIGINT) AS n_cand,
           round(CASE WHEN p1 > 0 AND p2 > 0 THEN
             bp * exp((ln(p1) + ln(p2)) / 2) ELSE 0.0 END, 4) AS bleu
         FROM pp ORDER BY a_id, b_id""",

    "q343_katz" -> katzOracle(alphaPct = 10, iters = 3),

    "q344_betweenness" ->
      betweennessOracle(pivots = Seq(0L, 997L), depth = 4),

    "q324_ktruss" -> kTrussOracle(k = 4, rounds = 8),

    "q361_louvain" -> louvainOracle(rounds = 3),

    "q362_louvain_two_level" -> louvainTwoLevelOracle(r1 = 3, r2 = 3),

    "q325_sssp" -> ssspOracle(rounds = 6),

    "q326_dbscan" -> dbscanOracle(eps = 0.05, minPts = 5, rounds = 12),

    "q269_sessions" ->
      """WITH e AS (SELECT user_id AS k, epoch_us(ts) AS t, value AS v,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts) > 7200000000
                   OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL THEN 1 ELSE 0 END AS nw
               FROM events),
         s AS (SELECT k, t, v, CAST(sum(nw) OVER (PARTITION BY k
                 ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_idx FROM e)
         SELECT k, session_idx, make_timestamp(min(t)) AS start,
           make_timestamp(max(t)) AS "end", count(*) AS n_events,
           round(sum(v), 4) AS value_sum
         FROM s GROUP BY k, session_idx ORDER BY k, session_idx""",

    "q248_twap" ->
      """WITH p0 AS (SELECT user_id, ts, value,
                 row_number() OVER (PARTITION BY user_id, ts
                                    ORDER BY event_id DESC) AS rn
               FROM events WHERE event_type = 'view'),
         d AS (SELECT user_id AS k, epoch_us(ts) AS t, value AS v
               FROM p0 WHERE rn = 1),
         s AS (SELECT k, t, v,
                 lead(t) OVER (PARTITION BY k ORDER BY t) AS e
               FROM d),
         seg AS (SELECT * FROM s WHERE e IS NOT NULL AND e > t),
         ex AS (SELECT k, v, t, e,
                 unnest(generate_series(t // 21600000000,
                   (e - 1) // 21600000000)) AS bk
               FROM seg),
         ov AS (SELECT k, bk, v,
                 CAST(least(e, (bk + 1) * 21600000000) -
                      greatest(t, bk * 21600000000) AS DOUBLE) AS o
               FROM ex)
         SELECT k, make_timestamp(bk * 21600000000) AS bucket_start,
                round(sum(v * o) / sum(o), 4) AS twa,
                CAST(sum(o) AS BIGINT) AS covered_micros
         FROM ov GROUP BY k, bk ORDER BY k, bucket_start""",

    "q249_linear_attribution" ->
      """WITH c AS (SELECT event_id AS cid, user_id, ts FROM events
                 WHERE event_type = 'click'),
         w AS (SELECT event_id AS pid, user_id,
                      ts - INTERVAL 3 DAY AS st, ts AS en
               FROM events WHERE event_type = 'purchase'),
         t AS (SELECT w.pid, c.cid FROM c JOIN w
               ON c.user_id = w.user_id
                  AND c.ts >= w.st AND c.ts < w.en),
         n AS (SELECT pid, count(*) AS nt FROM t GROUP BY pid)
         SELECT t.pid AS purchase_id, t.cid AS click_id,
                round(1.0 / n.nt, 4) AS credit
         FROM t JOIN n USING (pid) ORDER BY purchase_id, click_id""",

    "q247_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
         p AS (SELECT user_id, ts, max(event_id) AS p_id FROM events
               WHERE event_type = 'purchase' GROUP BY user_id, ts),
         b AS (SELECT c.event_id, c.ts AS cts, p.p_id AS bp, p.ts AS bt
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts >= p.ts),
         f AS (SELECT c.event_id, p.p_id AS fp, p.ts AS ft
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts <= p.ts)
         SELECT b.event_id,
                CASE WHEN ft IS NULL THEN bp
                     WHEN bt IS NULL THEN fp
                     WHEN epoch_us(cts) - epoch_us(bt)
                          <= epoch_us(ft) - epoch_us(cts) THEN bp
                     ELSE fp END AS p_id,
                CASE WHEN ft IS NULL THEN bt
                     WHEN bt IS NULL THEN ft
                     WHEN epoch_us(cts) - epoch_us(bt)
                          <= epoch_us(ft) - epoch_us(cts) THEN bt
                     ELSE ft END AS near_ts
         FROM b JOIN f USING (event_id)
         ORDER BY event_id""",

    "q242_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS c0
               FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT e.user_id, f.c0,
                 (CAST(e.ts AS DATE) - f.c0) // 7 AS pi
               FROM events e JOIN f USING (user_id))
         SELECT c0 AS cohort_day, CAST(pi AS BIGINT) AS period_idx,
                count(DISTINCT user_id) AS n_keys
         FROM a GROUP BY c0, pi ORDER BY cohort_day, period_idx""",

    "q220_domain_similarity" ->
      s"""WITH v AS (SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
         g AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
                      list(v ORDER BY vec_id) AS vs
               FROM v GROUP BY label),
         c AS (SELECT label, n,
                      list_transform(range(1, 65), i ->
                        list_sum(list_transform(vs, w -> w[i])) / n) AS cent
               FROM g)
         SELECT CAST(a.label AS BIGINT) AS a_grp,
                CAST(b.label AS BIGINT) AS b_grp, a.n AS n_a, b.n AS n_b,
                round(${PortableSql.cosSql("a.cent", "b.cent")}, 4) AS sim
         FROM c a JOIN c b ON a.label < b.label
         ORDER BY a_grp, b_grp""",

    "q221_lsh_plan" ->
      """SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
                round(pow(1.0 / b, 1.0 / r), 6) AS s_mid,
                round(1 - pow(1 - pow(0.55, r), b), 6) AS fp_low,
                round(1 - pow(1 - pow(0.7, r), b), 6) AS p_at_t,
                1 - round(1 - pow(1 - pow(0.85, r), b), 6) AS fn_high
         FROM range(1, 65) rb(b) CROSS JOIN range(1, 65) rr(r)
         WHERE b * r <= 64
         ORDER BY bands, rows_per_band""",

    "q222_logistic_model" ->
      s"""WITH ${PortableSql.logisticTrainCtes}
         SELECT CAST(j AS BIGINT) - 1 AS j, w10.wl[j] AS w
         FROM w10 CROSS JOIN range(1, 66) r(j) ORDER BY j""",

    "q223_logistic_predict" ->
      s"""WITH ${PortableSql.logisticTrainCtes}
         SELECT doc_id AS id,
                round(1 / (1 + exp(-(list_sum(list_transform(range(1, 65),
                  j -> x[j] * w10.wl[j])) + w10.wl[65]))), 4) AS p,
                round(1 / (1 + exp(-(list_sum(list_transform(range(1, 65),
                  j -> x[j] * w10.wl[j])) + w10.wl[65]))), 4) >= 0.5 AS pred
         FROM feats CROSS JOIN w10 ORDER BY id"""
  )
}

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

  /** [[ivfTrainSql]]'s CTE list with every name prefixed by `p` (no
    * leading WITH, no trailing comma) — so one statement can train at
    * SEVERAL centroid counts side by side (the elbow-curve oracle), the
    * same trick [[pqSubTrainSql]] uses per subspace. Exposes `${p}c2`
    * and `${p}bf`. */
  def ivfTrainCtes(p: String, nlist: Int): String = {
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
