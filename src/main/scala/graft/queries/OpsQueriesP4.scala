package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}
import graft.queries.QShared._

/** Part 4/6 of the ops query registry (q207_retrieval_metrics..q263_resample_locf) — mechanical
  * wave split of the round-11 monolith; entry bodies are verbatim and
  * [[OpsQueries]] merges the parts, so keys, plans and oracle SQL are
  * unchanged. Each query keeps its DuckDB oracle co-located. */
private[queries] object OpsQueriesP4 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
        .orderBy("k", "tick"))
  )

  val oracle: Map[String, String] = Map(
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
                ELSE (SELECT CAST(CASE WHEN raw = 0 THEN 0 ELSE
                        sign(raw) * CAST(floor(
                          abs(CAST(CAST(raw AS VARCHAR) AS DECIMAL(38, 17)))
                            * 10000 + 0.5) AS DOUBLE) / 10000 END AS DOUBLE)
                      FROM (SELECT CAST(206.835 AS DOUBLE)
                        - CAST(1.015 AS DOUBLE)
                          * len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> ''))
                          / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                        - CAST(84.6 AS DOUBLE)
                          * len(regexp_extract_all(text, '(?i)[aeiouy]+'))
                          / CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '')) AS DOUBLE) AS raw))
                END AS flesch
         -- Spark-parity rounding (round-13 sf0.1 sweep find, two rows):
         -- (1) constants CAST AS DOUBLE so DuckDB does the same IEEE
         --     double arithmetic as Spark (bare 1.015/84.6 are exact
         --     DECIMALs here and shift the value by an ulp across the
         --     .00005 boundary);
         -- (2) Spark's round = BigDecimal HALF_UP on the SHORTEST
         --     DECIMAL REPR of the double, replicated as
         --     sign·floor(abs(varchar→decimal)·10⁴ + 0.5)/10⁴ —
         --     DuckDB's own round() rounds the binary value instead
         --     and disagrees exactly at repr boundaries
         --     (28.19375000000001 → 28.1937)
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
         FROM feats CROSS JOIN w10 ORDER BY id""",
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
    // the exact side and asserts the engine certified its own estimates,
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
         ORDER BY g.k, tick"""
  )
}
