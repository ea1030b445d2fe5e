package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}
import graft.queries.QShared._

/** Part 1/6 of the ops query registry (q42_dedup_exact..q108_mean_pool) — mechanical
  * wave split of the round-11 monolith; entry bodies are verbatim and
  * [[OpsQueries]] merges the parts, so keys, plans and oracle SQL are
  * unchanged. Each query keeps its DuckDB oracle co-located. */
private[queries] object OpsQueriesP1 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      // the contract at the MEASURED floor minus margin per query
      // (qa 0.8 → 0.75, qb 0.6 → 0.55 — round-11 audit values), so a
      // tuning regression that sheds true neighbors trips the gate.
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
        .withColumn("recall_ok", col("recall") >=
          when(col("query_id") === "qa", 0.75).otherwise(0.55))
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

    // ---- similarity search ----,
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
        .orderBy("label", "dim"))
  )

  val oracle: Map[String, String] = Map(
    "q42_dedup_exact" ->
      """SELECT sha256(substr(text, 1, 40)) AS h, count(*) AS n, min(doc_id) AS keep
         FROM documents GROUP BY h HAVING count(*) > 1 ORDER BY h""",
    "q43_dedup_minhash" ->
      s"""WITH ${PortableSql.minhashVerifiedPairCtes}
         SELECT a_id, b_id, j FROM vp ORDER BY a_id, b_id""",
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
    "q81_semantic_dedup" ->
      // re-trained clustering at the op's auto-scaled nlist = ceil(sqrt(n))
      // — a scalar-subquery LIMIT so the oracle tracks the auto-scale at
      // every data scale (the previous hardcoded 23 = ceil(sqrt(500)) was
      // sf0.01-only and diverged at sf0.1: round-13 sweep find) — then the
      // SemDeDup pair rule: drop the larger id of any within-cluster
      // pair >= tau
      s"""${PortableSql.ivfTrainSqlAuto}
         dr AS (SELECT DISTINCT b.id AS drop_id
                FROM bf a JOIN bf b ON a.cid = b.cid AND a.id < b.id
                WHERE round(${PortableSql.cosSql("a.v", "b.v")}, 4) >= 0.4)
         SELECT bf.id AS vec_id, bf.cid AS cluster, dr.drop_id IS NULL AS keep
         FROM bf LEFT JOIN dr ON bf.id = dr.drop_id
         ORDER BY vec_id""",
    "q87_incremental_dedup" ->
      // the full <200 pair set restricted to corpus(<150) × batch(150-199):
      // band collisions and the verify threshold are identical, so the
      // incremental path must reproduce exactly this slice
      s"""WITH ${PortableSql.minhashVerifiedPairCtes}
         SELECT a_id AS corpus_id, b_id AS new_id, j FROM vp
         WHERE a_id < 150 AND b_id >= 150
         ORDER BY corpus_id, new_id""",
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
           coalesce(m.n_matched, 0) / CAST(n.n_exact AS DOUBLE) >=
             CASE WHEN n.query_id = 'qa' THEN 0.75 ELSE 0.55 END
             AS recall_ok
         FROM n LEFT JOIN m ON m.query_id = n.query_id
         ORDER BY n.query_id"""
    },
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
         l0 AS (SELECT a_id, a_pos, b_id, b_pos,
                  least(len(sa), len(sb)) AS minlen,
                  list_position(list_transform(
                    range(least(len(sa), len(sb))),
                    i -> sa[i + 1] = sb[i + 1]), false) AS mp
                FROM pairs),
         -- not-found list_position is NULL on some DuckDB versions and
         -- 0 on others (1.0.0); both mean "no mismatch → LCP = minlen"
         l AS (SELECT a_id, a_pos, b_id, b_pos,
                 CASE WHEN coalesce(mp, 0) = 0 THEN minlen
                   ELSE mp - 1 END AS len
               FROM l0),
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
         ORDER BY label, dim"""
  )
}
