package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}
import graft.queries.QShared._

/** Part 2/6 of the ops query registry (q111_hard_negatives..q59_split_assign) — mechanical
  * wave split of the round-11 monolith; entry bodies are verbatim and
  * [[OpsQueries]] merges the parts, so keys, plans and oracle SQL are
  * unchanged. Each query keeps its DuckDB oracle co-located. */
private[queries] object OpsQueriesP2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // ---- text analysis ----,
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

    // ---- multimodal plumbing ----,
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
        .groupBy("split").agg(count("*").as("n")).orderBy("split"))
  )

  val oracle: Map[String, String] = Map(
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
    "q115_cross_rerank" ->
      // the stub scorer is md5-portable: hex15(query||U+0001||text)
      """SELECT doc_id,
                CAST('0x' || substr(md5('window hash join' || chr(1) || text), 1, 15) AS BIGINT)
                  % 10000 / 10000.0 AS score
         FROM documents WHERE doc_id < 100
         ORDER BY score DESC, doc_id LIMIT 10""",
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
    // the overlap count); recall + the per-query measured-minus-margin
    // floors (qa 0.75 / qb 0.55) computed identically,
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
    "q52_multimodal_bytes" ->
      """SELECT doc_id AS asset_id,
                ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
                CAST(octet_length(encode(text)) AS BIGINT) AS nbytes
         FROM documents ORDER BY asset_id LIMIT 200""",

    // ---- portable-sketch oracles (SURVEY §5.5): every kernel below is
    // md5-derived (expr/PortableHash.scala), so DuckDB recomputes the exact
    // signatures/buckets/vectors the engine produced ----,
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
    "q56_ingest_pipeline" ->
      s"""WITH ${PortableSql.chunkCtes(size = 1200, step = 600)},
         ${PortableSql.bucketCtes("c", "chunks", "doc_id, chunk_index")},
         nrm AS (SELECT doc_id, chunk_index, sqrt(sum(wt * wt)) AS nrm
                 FROM cbuck GROUP BY doc_id, chunk_index)
         SELECT count(*) AS n_chunks, round(sum(nrm), 2) AS norm_sum FROM nrm""",
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
         GROUP BY split ORDER BY split"""
  )
}
