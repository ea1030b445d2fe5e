package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}
import graft.queries.QShared._

/** Part 3/6 of the ops query registry (q60_pii_redact..q206_semantic_decontam) — mechanical
  * wave split of the round-11 monolith; entry bodies are verbatim and
  * [[OpsQueries]] merges the parts, so keys, plans and oracle SQL are
  * unchanged. Each query keeps its DuckDB oracle co-located. */
private[queries] object OpsQueriesP3 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    })
  )

  val oracle: Map[String, String] = Map(
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
    "q53_multimodal_features" ->
      """SELECT doc_id AS asset_id,
                ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                round(CAST(length(text)
                  - length(regexp_replace(text, '[\x20-\x2f]', '', 'g')) AS DOUBLE), 4) AS f2,
                round(CAST(length(text)
                  - length(regexp_replace(text, '[\x60-\x6f]', '', 'g')) AS DOUBLE), 4) AS f6
         FROM documents WHERE doc_id < 100 ORDER BY asset_id""",
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
         FROM r WHERE rn = 1 ORDER BY id"""
  )
}
