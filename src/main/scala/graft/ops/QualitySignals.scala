package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-quality signals for training-data curation (north-star
 * extension): Gopher-style repetition measures and benchmark-contamination
 * detection — the filters a pre-training pipeline runs between dedup and
 * tokenization.
 *
 * Scale shapes: repetition counts shuffle (id, gram) pairs with map-side
 * partial aggregation (the explode never leaves the stage un-combined);
 * contamination broadcasts the benchmark's distinct shingles (eval sets
 * are tiny next to a 100 TB corpus) so the corpus side is one scan with a
 * broadcast semi-join — no corpus shuffle at all before the per-doc count.
 */
object QualitySignals {

  /** Word n-grams of an ALREADY-SPLIT token array column (empty when the
    * document has fewer than `n` tokens — no whole-text fallback here,
    * unlike MinHash shingles: repetition ratios over padded grams would
    * skew). Callers materialize the token array in a projection first:
    * referencing `split(...)` directly here would re-run the regex split
    * inside the per-element lambda — O(tokens²) splits per document. */
  private[graft] def grams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Length of the longest run of equal adjacent elements in a SORTED
    * string array — i.e. the count of the most frequent element. Row-local
    * fold; `null` prev sentinel starts the first run (the `===` null
    * comparison is SQL-null, so `when` falls to the run-reset branch). */
  private def maxRunLen(sorted: Column): Column =
    aggregate(sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Total number of elements belonging to runs of length ≥ 2 in a SORTED
    * string array — i.e. the occurrence count of all duplicated elements.
    * Runs flush into the total when the next element differs; the final
    * open run flushes in the finish lambda. */
  private def dupRunTotal(sorted: Column): Column = {
    def flush(run: Column) = when(run >= 2L, run).otherwise(0L)
    aggregate(sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("dup")),
      (acc, x) => {
        val same = x === acc.getField("prev")
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(1L).as("run"),
          when(same, acc.getField("dup"))
            .otherwise(acc.getField("dup") + flush(acc.getField("run"))).as("dup"))
      },
      acc => acc.getField("dup") + flush(acc.getField("run")))
  }

  /**
   * Per-document repetition signals (Gopher §A1.1-style, token-based):
   *
   *  - `top2_frac`: share of bigram occurrences taken by the single most
   *    frequent bigram — high values mean boilerplate loops.
   *  - `dup3_frac`: share of trigram occurrences whose trigram appears
   *    more than once in the document.
   *
   * Fully ROW-LOCAL: repetition is a per-document statistic, so no
   * (id, gram) pairs ever leave their row — each document sorts its own
   * gram array and folds it for run-length counts (rounds 2-3 exploded the
   * corpus into a gram-count shuffle; at 100 TB that exchanged the whole
   * token stream to compute values derivable inside one row). The plan is
   * a pure projection: zero Exchange operators.
   */
  def repetitionSignals(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // tk is a real projection step: referencing split() inside the HOF
    // lambdas directly would re-run the regex per array element.
    val toks = df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
    toks
      // docs with < 2 tokens have neither signal and are absent — the
      // contract; a 2-token doc has a bigram signal but no trigrams — its
      // dup3_frac is 0 by definition, not a reason to drop the row.
      // (Filter on the token count, BEFORE building gram arrays: a filter
      // on size(g2) would be predicate-pushed through the projection and
      // re-evaluate the whole sort per row.)
      .filter(size(col("tk")) >= 2)
      .select(col("id"),
        array_sort(grams(col("tk"), 2)).as("g2"),
        array_sort(grams(col("tk"), 3)).as("g3"))
      .select(col("id"),
        round(maxRunLen(col("g2")).cast("double") / size(col("g2")), 4).as("top2_frac"),
        when(size(col("g3")) === 0, lit(0.0))
          .otherwise(round(dupRunTotal(col("g3")).cast("double") / size(col("g3")), 4))
          .as("dup3_frac"))
  }

  /**
   * Benchmark contamination: documents sharing ≥ 1 distinct word `n`-gram
   * with the benchmark corpus, with the count of distinct shared shingles
   * — the n-gram-overlap decontamination check run before training on any
   * corpus that might contain eval data. Returns `(id, n_shared)`.
   */
  def contamination(df: DataFrame, idCol: Column, textCol: Column,
      bench: DataFrame, benchTextCol: Column, n: Int = 3): DataFrame = {
    val benchGrams = broadcast(
      bench.select(split(trim(benchTextCol), "\\s+").as("tk"))
        .select(explode(grams(col("tk"), n)).as("g")).distinct())
    df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
      .select(col("id"), explode(grams(col("tk"), n)).as("g"))
      .join(benchGrams, "g") // broadcast hash join: corpus never shuffles
      .groupBy("id")
      .agg(countDistinct("g").as("n_shared"))
  }

  /**
   * Contamination REMOVAL — the product to [[contamination]]'s evidence:
   * drop every document sharing ≥ `minShared` distinct word `n`-grams
   * with the benchmark corpus and return the clean corpus (all input
   * columns). Anti-join on the (vanishingly small) flagged-id list: the
   * corpus itself never shuffles, exactly like [[Dedup.dedupCorpus]].
   */
  def decontaminate(df: DataFrame, idCol: Column, textCol: Column,
      bench: DataFrame, benchTextCol: Column, n: Int = 3,
      minShared: Long = 1L): DataFrame = {
    val flagged = contamination(df, idCol, textCol, bench, benchTextCol, n)
      .filter(col("n_shared") >= minShared)
      .select(col("id").as("__contaminated_id"))
    df.join(flagged, idCol === col("__contaminated_id"), "left_anti")
  }

  /**
   * BLOOM-FILTER decontamination — [[contamination]] for benchmark sets
   * too large to broadcast verbatim. The benchmark's distinct word
   * `n`-grams reduce to a fixed `m`-bit filter (each gram sets `k`
   * md5-derived positions), so executors hold m/8 bytes — 128 KiB at the
   * default m = 2²⁰ — no matter how many grams the eval suites contain;
   * a corpus gram is flagged when ALL `k` of its positions are set.
   * Returns `(id, n_flagged)` for documents with ≥ 1 flagged distinct
   * gram. One-sided error, deterministically: every truly-shared gram IS
   * flagged (no false negatives — safe for decontamination, which drops
   * flagged docs); a non-shared gram false-positives with
   * P ≈ (1 − e^(−k·n/m))^k. The positions are md5-derived
   * ([[graft.expr.PortableHash]] kernel), so the filter — including its
   * false positives — is bit-reproducible in any engine: the DuckDB
   * oracle recomputes the same positions and the same verdicts.
   *
   * Scale shape: the filter builds in one benchmark pass (positions
   * dedupe under partial aggregation; ≤ m longs ever reach the driver)
   * and ships once per executor; the corpus side is a stateless
   * per-partition projection — zero joins, zero corpus shuffle before
   * the final (id, count) rows. Streaming-safe in append mode.
   */
  def bloomContamination(df: DataFrame, idCol: Column, textCol: Column,
      bench: DataFrame, benchTextCol: Column, n: Int = 3,
      m: Int = 1 << 20, k: Int = 3): DataFrame =
    bloomContaminationAgainst(df, idCol, textCol,
      bloomBitsTable(bench, benchTextCol, n, m, k), n, m, k)

  /** The benchmark side of [[bloomContamination]] as a PERSISTED
    * artifact: the distinct set-bit positions `(p)` of the `m`-bit
    * filter — ≤ m rows of one long each, the `…Against` family's table
    * for Bloom decontamination ([[graft.ops.Dedup.repeatedGrams]]
    * stance). Positions dedupe under partial aggregation; writing this
    * instead of re-deriving the filter per batch is what makes the
    * daily gate one benchmark pass TOTAL, not one per day. */
  def bloomBitsTable(bench: DataFrame, benchTextCol: Column, n: Int = 3,
      m: Int = 1 << 20, k: Int = 3): DataFrame = {
    require(k >= 1 && m >= 8, "need k >= 1 hash functions and m >= 8 bits")
    def posCol(j: Int, g: Column): Column =
      graft.expr.PortableHash.hex15Col(
        concat(lit(j.toString), lit(" "), g)) % m
    bench
      .select(split(trim(benchTextCol), "\\s+").as("tk"))
      .select(explode(grams(col("tk"), n)).as("g")).distinct()
      .select(explode(array((0 until k).map(j => posCol(j, col("g"))): _*))
        .as("p"))
      .distinct()
  }

  /** Incremental [[bloomContamination]]: flag a new batch — or an
    * unbounded STREAM — against a PERSISTED [[bloomBitsTable]] with zero
    * benchmark recomputation. The positions table rebuilds the m-bit
    * filter once (≤ m longs reach the driver, m/8 bytes per executor);
    * the scan is the same stateless per-partition projection —
    * bit-identical verdicts to the one-shot form. */
  def bloomContaminationAgainst(df: DataFrame, idCol: Column,
      textCol: Column, bitsTable: DataFrame, n: Int = 3,
      m: Int = 1 << 20, k: Int = 3): DataFrame = {
    require(k >= 1 && m >= 8, "need k >= 1 hash functions and m >= 8 bits")
    val spark = df.sparkSession
    import spark.implicits._
    val positions = bitsTable.select(col("p").cast("long"))
      .collect().map(_.getLong(0))
    val bits = new java.util.BitSet(m)
    positions.foreach(p => bits.set(p.toInt))
    val bc = spark.sparkContext.broadcast(bits)
    df.select(idCol.cast("long").as("id"), textCol.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val filter = bc.value
        rows.map { case (id, text) => (id, bloomFlagged(text, filter, n, m, k)) }
      }
      .toDF("id", "n_flagged")
      .filter(col("n_flagged") > 0)
  }

  /** Row-local Bloom scan shared by [[bloomContaminationAgainst]] and the
    * [[ScrubArtifacts]] gate (which must keep the text column): number of
    * the document's distinct word n-grams whose `k` positions are all set. */
  private[graft] def bloomFlagged(text: String, filter: java.util.BitSet,
      n: Int, m: Int, k: Int): Long = {
    val tk =
      if (text == null) Array.empty[String]
      else Dedup.trimSpaces(text).split("\\s+").filter(_.nonEmpty)
    val seen = scala.collection.mutable.HashSet.empty[String]
    var flagged = 0L
    var i = 0
    while (i + n <= tk.length) {
      val g = tk.slice(i, i + n).mkString(" ")
      if (!seen.contains(g)) {
        seen += g
        var j = 0
        var hit = true
        while (j < k && hit) {
          val p = (graft.expr.PortableHash.hex15(
            j.toString + " " + g) % m).toInt
          hit = filter.get(p)
          j += 1
        }
        if (hit) flagged += 1
      }
      i += 1
    }
    flagged
  }

  /**
   * Multi-benchmark decontamination: [[contamination]] generalized to `n`
   * named eval sets in ONE corpus pass. Every benchmark's distinct word
   * `n`-grams broadcast together (tagged with the benchmark name); a corpus
   * gram matching grams in several benchmarks fans out to one row per
   * match, and the per-document aggregate splits the distinct-shared
   * counts back out per benchmark. Returns
   * `(id, shared_<name1>, …, shared_<nameK>)` — only documents sharing at
   * least one gram with at least one benchmark (the decontamination
   * candidates a pipeline would drop or flag).
   *
   * Scale shape: identical to [[contamination]] — eval sets are tiny next
   * to a 100 TB corpus, so the union of all benchmark gram sets still
   * broadcasts; the corpus side is one scan feeding a broadcast hash join,
   * and the only shuffle carries (id, bench, gram) rows that SURVIVED the
   * join (contaminated grams only, a vanishing fraction of the corpus).
   * Adding a benchmark adds broadcast bytes, never a corpus pass.
   */
  def contaminationMulti(df: DataFrame, idCol: Column, textCol: Column,
      benches: Seq[(String, DataFrame, Column)], n: Int = 3): DataFrame = {
    require(benches.nonEmpty, "at least one benchmark")
    val benchGrams = broadcast(
      benches.map { case (name, b, tc) =>
        b.select(lit(name).as("bench"), split(trim(tc), "\\s+").as("tk"))
          .select(col("bench"), explode(grams(col("tk"), n)).as("g"))
      }.reduce(_ unionAll _).distinct())
    val perBench = benches.map { case (name, _, _) =>
      countDistinct(when(col("bench") === name, col("g"))).as(s"shared_$name")
    }
    df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
      .select(col("id"), explode(grams(col("tk"), n)).as("g"))
      .join(benchGrams, "g") // broadcast hash join: corpus never shuffles
      .groupBy("id")
      .agg(perBench.head, perBench.tail: _*)
  }

  /**
   * CCNet-style language-model quality scoring (Wenzek et al., "CCNet:
   * Extracting High Quality Monolingual Datasets from Web Crawl Data",
   * LREC 2020 — there a 5-gram KenLM; here an add-one-smoothed word
   * bigram LM, the same decision signal shape): per document, the mean
   * log P(w₂|w₁) = ln((c(w₁w₂)+1) / (c(w₁)+V)) over its bigrams. Low
   * scores flag gibberish/boilerplate; pipelines bucket the corpus by
   * this signal (CCNet's head/middle/tail) before sampling. Returns
   * `(id, n_big, avg_lp)` for documents with ≥ 2 tokens.
   *
   * Scale shape: the corpus reduces ONCE to the bigram/unigram count
   * model (vocabulary-bounded, partial-aggregated — never corpus-sized);
   * the scoring pass joins each document's bigrams to the model.
   * `broadcastModel = true` (default) broadcasts the model so scoring is
   * one corpus scan with zero corpus shuffles besides the per-doc
   * aggregate; set it false when vocab² outgrows broadcast and the
   * scoring join should shuffle on the bigram key instead.
   */
  def bigramLmScore(df: DataFrame, idCol: Column, textCol: Column,
      broadcastModel: Boolean = true): DataFrame = {
    val toks = df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
      .select(col("id"), filter(col("tk"), w => w =!= "").as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val vocabSize = uni.count() // one vocabulary-sized job, driver scalar
    val bigrams = bigramRows(toks)
    val model = bigrams.groupBy("a", "b").agg(count(lit(1)).as("cb"))
      .join(uni.withColumnRenamed("w", "a"), "a") // vocab-sized join
    val m = if (broadcastModel) broadcast(model) else model
    bigrams.join(m, Seq("a", "b"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_big"),
        round(avg(log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cu"), lit(0L)) + lit(vocabSize)))), 4).as("avg_lp"))
  }

  /** The persisted REFERENCE bigram-LM table — the `…Against` artifact
    * for [[bigramLmScoreAgainst]] (CCNet proper: the model trains on a
    * CLEAN reference corpus — Wikipedia in the paper — and scores the
    * crawl; [[bigramLmScore]]'s self-trained form is the bootstrap).
    * One frame, two row kinds: unigrams `(a, NULL, c(a))` and bigrams
    * `(a, b, c(a,b))` — vocabulary size is the unigram row count, so the
    * artifact is self-contained. Vocabulary-bounded, partial-aggregated,
    * text never shuffles. */
  def bigramLmTable(ref: DataFrame, refText: Column): DataFrame = {
    val toks = ref.select(lit(0L).as("id"),
        split(trim(refText), "\\s+").as("tk"))
      .select(col("id"), filter(col("tk"), w => w =!= "").as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("w").as("a"), lit(null).cast("string").as("b"), col("c"))
    val big = bigramRows(toks).groupBy("a", "b").agg(count(lit(1)).as("c"))
    uni.unionByName(big)
  }

  /** Incremental [[bigramLmScore]]: score a batch — or an unbounded
    * STREAM when `broadcastModel` — under a PERSISTED reference
    * [[bigramLmTable]], zero reference recomputation: the daily-ingest
    * quality gate, and the CCNet shape proper (clean-reference model,
    * crawl candidates). Same formula bit-for-bit: mean
    * `ln((c(w₁w₂)+1)/(c(w₁)+V))`, unseen bigrams/unigrams at count 0,
    * `V` = reference vocabulary; `(id, n_big, avg_lp)` (4dp), docs with
    * < 2 tokens absent. Scoring against its own corpus's table
    * reproduces [[bigramLmScore]] exactly (spec-asserted).
    *
    * Scale shape: the model broadcasts (vocabulary-bounded) into two
    * joins on the candidate's bigram rows — one corpus scan, shuffles
    * only the per-doc aggregate; `broadcastModel = false` shuffles the
    * scoring join on the bigram key instead when vocab² outgrows
    * broadcast ([[bigramLmScore]]'s escape hatch). */
  def bigramLmScoreAgainst(cand: DataFrame, idCol: Column, textCol: Column,
      model: DataFrame, broadcastModel: Boolean = true): DataFrame = {
    val uni = model.filter(col("b").isNull)
      .select(col("a"), col("c").as("cu"))
    val vocabSize = uni.count() // vocabulary-sized job, driver scalar
    val big = model.filter(col("b").isNotNull)
      .select(col("a"), col("b"), col("c").as("cb"))
    val toks = cand.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
      .select(col("id"), filter(col("tk"), w => w =!= "").as("tk"))
    val bigrams = bigramRows(toks)
    val (bigM, uniM) =
      if (broadcastModel) (broadcast(big), broadcast(uni)) else (big, uni)
    bigrams.join(bigM, Seq("a", "b"), "left")
      .join(uniM, Seq("a"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_big"),
        round(avg(log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cu"), lit(0L)) + lit(vocabSize)))), 4).as("avg_lp"))
  }

  /** WORST-WINDOW variant of [[bigramLmScore]]: per document, the
    * minimum mean log-probability over every sliding window of `window`
    * consecutive bigrams — the "find the bad SPAN, not the bad doc"
    * signal (a mostly-clean page with one gibberish injection scores
    * fine on the whole-doc mean; its worst window screams). Returns
    * `(id, n_windows, worst_start, worst_lp)` — 0-based bigram index of
    * the worst window (ties → smallest start), window mean at 4dp; docs
    * with fewer than `window` bigrams are absent.
    *
    * Scale shape, `broadcastModel = true` (default): the add-one bigram
    * model is vocabulary-bounded and COLLECTED to the driver
    * ([[graft.ops.Bpe]]/[[graft.ops.Classify]] discipline — both count
    * tables reduce under partial aggregation first), then broadcast; the
    * window scan is a compiled stateless per-partition projection —
    * corpus text never shuffles, zero exchanges after the two model
    * aggregations. Set `broadcastModel = false` when bigram-type count
    * outgrows the driver ([[bigramLmScore]]'s escape hatch): the scoring
    * join shuffles positional bigrams on the bigram key instead — the
    * model never leaves the cluster — and per-doc (pos, lp) pairs
    * regroup for the same compiled window scan. Both paths produce
    * IDENTICAL rows (same operands, same IEEE ops, same 4dp rounding). */
  def lmWorstWindow(df: DataFrame, idCol: Column, textCol: Column,
      window: Int = 8, broadcastModel: Boolean = true): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    if (!broadcastModel) {
      // join path: model stays distributed. Positional bigrams (id, i,
      // a, b) join the model on (a, b) — same-corpus scoring always
      // hits, so an inner join loses nothing — then (i, lp) pairs
      // regroup per doc for the window scan. One corpus-bigram shuffle
      // on the join key + one on id; text itself never moves.
      val toks = df.select(idCol.cast("long").as("id"),
        array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
      val uni = toks.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cu"))
      val v = uni.count() // vocabulary-sized job, driver scalar
      val pb = toks.filter(size(col("tk")) >= 2)
        .select(col("id"), posexplode(zip_with(col("tk"),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))))
        .filter(col("col.b").isNotNull)
        .select(col("id"), col("pos").as("i"),
          col("col.a").as("a"), col("col.b").as("b"))
      val model = pb.groupBy("a", "b").agg(count(lit(1)).as("cb"))
        .join(uni.withColumnRenamed("w", "a"), "a")
      val perDoc = pb.join(model, Seq("a", "b"))
        .select(col("id"), col("i"),
          log((col("cb") + lit(1.0)) / (col("cu") + lit(v))).as("lp"))
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("i"), col("lp")))).as("ps"))
      return perDoc.as[(Long, Seq[(Int, Double)])]
        .flatMap { case (id, ps) =>
          val lp = new Array[Double](ps.length)
          ps.foreach { case (i, p) => lp(i) = p }
          scanWorstWindow(lp, window) match {
            case Some((n, st, w4)) => Iterator.single((id, n, st, w4))
            case None => Iterator.empty
          }
        }
        .toDF("id", "n_windows", "worst_start", "worst_lp")
    }
    val tok = df.select(idCol.cast("long").as("id"),
        textCol.cast("string").as("text"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, if (t == null) Array.empty[String]
             else t.trim.split("\\s+").filter(_.nonEmpty))
      }
      .persist()
    try {
      val uniMap = tok.toDF("id", "tk")
        .select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bigMap = tok.flatMap { case (_, tk) =>
          if (tk.length < 2) Iterator.empty
          else tk.iterator.sliding(2).withPartial(false)
            .map(s => (s.head, s(1)))
        }
        .toDF("a", "b").groupBy("a", "b").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val v = uniMap.size.toLong
      val bcU = spark.sparkContext.broadcast(uniMap)
      val bcB = spark.sparkContext.broadcast(bigMap)
      tok.mapPartitions { it =>
        val uni = bcU.value
        val big = bcB.value
        it.flatMap { case (id, tk) =>
          val nBig = tk.length - 1
          if (nBig < window) Iterator.empty
          else {
            val lp = new Array[Double](nBig)
            var i = 0
            while (i < nBig) {
              val cb = big.getOrElse((tk(i), tk(i + 1)), 0L)
              val cu = uni.getOrElse(tk(i), 0L)
              lp(i) = math.log((cb + 1.0) / (cu + v))
              i += 1
            }
            scanWorstWindow(lp, window).iterator.map { case (n, st, w4) =>
              (id, n, st, w4)
            }
          }
        }
      }.toDF("id", "n_windows", "worst_start", "worst_lp")
    } finally tok.unpersist(blocking = false)
  }

  /** Shared sliding-window minimum over a per-bigram log-prob array:
    * `(n_windows, worst_start, worst_lp-4dp)`, ties → smallest start,
    * None when the doc has fewer than `window` bigrams — ONE kernel so
    * [[lmWorstWindow]]'s broadcast and join paths can never drift on
    * rounding or tie rules. */
  private def scanWorstWindow(lp: Array[Double],
      window: Int): Option[(Long, Long, Double)] = {
    val nBig = lp.length
    if (nBig < window) return None
    var worstLp = Double.MaxValue
    var worstStart = -1
    var s = 0
    while (s + window <= nBig) {
      var sum = 0.0
      var j = s
      while (j < s + window) { sum += lp(j); j += 1 }
      val w4 = BigDecimal(sum / window)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (w4 < worstLp) { worstLp = w4; worstStart = s }
      s += 1
    }
    Some(((nBig - window + 1).toLong, worstStart.toLong, worstLp))
  }

  /** `(id, a, b)` bigram occurrences of a tokenized `(id, tk)` frame —
    * shared by [[bigramLmScore]] and [[kneserNeyScore]]. */
  private def bigramRows(toks: DataFrame): DataFrame =
    toks.filter(size(col("tk")) >= 2)
      .select(col("id"),
        explode(zip_with(col("tk"),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .filter(col("p.b").isNotNull)
      .select(col("id"), col("p.a").as("a"), col("p.b").as("b"))

  /**
   * Interpolated Kneser-Ney bigram LM score with absolute discount `D` —
   * the smoothing CCNet-class filters actually prefer over add-one,
   * because continuation probability ranks words by how many CONTEXTS
   * they follow, not how often they occur:
   *
   *   p_KN(b|a) = max(c(a,b) − D, 0)/ctx(a) + D·n1p(a)/ctx(a) · pcont(b)
   *   ctx(a)  = Σ_b c(a,b)         n1p(a) = |{b : c(a,b) > 0}|
   *   pcont(b) = |{a : c(a,b) > 0}| / |distinct bigram types|
   *
   * Returns `(id, n_big, avg_lp)` — per-doc mean ln p_KN over its
   * bigrams, 4dp. Self-scored corpora only meet observed bigrams
   * (c ≥ 1 > D), so every probability is positive; scoring FOREIGN text
   * against this model needs a backoff for unseen contexts and is out of
   * contract. Scale shape: identical to [[bigramLmScore]] — every model
   * table is vocabulary/bigram-type-bounded and broadcasts into the
   * scoring join; all counts reduce under partial aggregation.
   */
  def kneserNeyScore(df: DataFrame, idCol: Column, textCol: Column,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val toks = df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
      .select(col("id"), filter(col("tk"), w => w =!= "").as("tk"))
    val bigrams = bigramRows(toks)
    val cb = bigrams.groupBy("a", "b").agg(count(lit(1)).as("cb"))
    val ctx = cb.groupBy("a")
      .agg(sum("cb").cast("double").as("ctx"), count(lit(1)).as("n1p"))
    val cont = cb.groupBy("b").agg(count(lit(1)).as("nprec"))
    val types = cb.count().toDouble // one bigram-type-sized job
    val model = cb.join(ctx, "a").join(cont, "b")
      .select(col("a"), col("b"),
        (greatest(col("cb") - discount, lit(0.0)) / col("ctx") +
          lit(discount) * col("n1p") / col("ctx") * (col("nprec") / lit(types)))
          .as("p"))
    bigrams.join(broadcast(model), Seq("a", "b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_big"),
        round(avg(log(col("p"))), 4).as("avg_lp"))
  }

  /**
   * Distribution DRIFT between two corpus batches — the population
   * stability index over hashed token buckets:
   *
   *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)
   *
   * with `p` the reference batch's token-bucket shares, `q` the
   * candidate's, both add-one smoothed over the same `buckets` md5
   * buckets (the [[graft.ops.Curation.importanceWeights]] bucketing, so
   * the statistic is engine-reproducible and vocabulary-unbounded). The
   * nightly-ingest monitoring gate: PSI < 0.1 is conventionally "no
   * shift", > 0.25 "investigate before training". Returns one row
   * `(n_ref, n_cand, psi)`.
   *
   * Scale shape: two token scans reducing to `buckets` counts each
   * (partial-agg friendly, bucket-bounded shuffles), one broadcast-sized
   * join of the two count tables, one fold over `buckets` rows ordered
   * by bucket id — float addition in a fixed order, never a
   * sum-of-doubles shuffle whose grouping could reorder it.
   */
  def driftPsi(ref: DataFrame, refText: Column, cand: DataFrame,
      candText: Column, buckets: Int = 512): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    def bucketCounts(df: DataFrame, text: Column, out: String): DataFrame =
      df.select(explode(array_remove(split(trim(text), "\\s+"), "")).as("tok"))
        .select((graft.expr.PortableHash.hex15Col(col("tok")) % buckets).as("b"))
        .groupBy("b").agg(count(lit(1)).as(out))
    val joined = bucketCounts(ref, refText, "cr")
      .join(bucketCounts(cand, candText, "cq"), Seq("b"), "full")
      .select(col("b"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cq"), lit(0L)).as("cq"))
    val totals = joined.agg(sum("cr").as("nr"), sum("cq").as("nq"))
    joined
      .crossJoin(broadcast(totals))
      .select(col("b"), col("nr"), col("nq"),
        ((col("cr") + 1) / (col("nr") + lit(buckets)).cast("double")).as("p"),
        ((col("cq") + 1) / (col("nq") + lit(buckets)).cast("double")).as("q"))
      .groupBy("nr", "nq")
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("b"), col("p"), col("q")))),
        lit(0.0),
        (acc, x) => acc + (x.getField("p") - x.getField("q")) *
          log(x.getField("p") / x.getField("q"))), 6).as("psi"))
      .select(col("nr").as("n_ref"), col("nq").as("n_cand"), col("psi"))
  }

  /** KL-divergence sibling of [[driftPsi]] over the same hashed token
    * buckets: `KL(cand ‖ ref) = Σ q·ln(q/p)` with add-one smoothing —
    * the asymmetric "how surprised is the reference model by the new
    * batch" gate (PSI is the symmetrized variant; both belong on a
    * nightly dashboard because KL reacts harder to NEW mass than to
    * vanished mass). Returns one row `(n_ref, n_cand, kl)`, 6dp.
    *
    * Scale shape identical to PSI: two partial-agg bucket counts, one
    * `buckets`-row join, one ordered fold (float addition in a fixed
    * bucket order, never an order-dependent shuffle sum). */
  def driftKl(ref: DataFrame, refText: Column, cand: DataFrame,
      candText: Column, buckets: Int = 512): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    def bucketCounts(df: DataFrame, text: Column, out: String): DataFrame =
      df.select(explode(array_remove(split(trim(text), "\\s+"), "")).as("tok"))
        .select((graft.expr.PortableHash.hex15Col(col("tok")) % buckets).as("b"))
        .groupBy("b").agg(count(lit(1)).as(out))
    val joined = bucketCounts(ref, refText, "cr")
      .join(bucketCounts(cand, candText, "cq"), Seq("b"), "full")
      .select(col("b"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cq"), lit(0L)).as("cq"))
    val totals = joined.agg(sum("cr").as("nr"), sum("cq").as("nq"))
    joined
      .crossJoin(broadcast(totals))
      .select(col("b"), col("nr"), col("nq"),
        ((col("cr") + 1) / (col("nr") + lit(buckets)).cast("double")).as("p"),
        ((col("cq") + 1) / (col("nq") + lit(buckets)).cast("double")).as("q"))
      .groupBy("nr", "nq")
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("b"), col("p"), col("q")))),
        lit(0.0),
        (acc, x) => acc +
          x.getField("q") * log(x.getField("q") / x.getField("p"))), 6)
        .as("kl"))
      .select(col("nr").as("n_ref"), col("nq").as("n_cand"), col("kl"))
  }

  /**
   * Exact two-sample Kolmogorov–Smirnov drift over a per-document NUMERIC
   * metric (length, quality score, token count): `KS = sup_x |F_ref(x) −
   * F_cand(x)|`, the distribution-shape gate PSI/KL's fixed hash buckets
   * can miss (a pure location shift spreads over many buckets; KS reads
   * it directly off the CDFs). Returns one row `(n_ref, n_cand, ks,
   * ks_at)` — ks at 6dp, `ks_at` the smallest metric value attaining the
   * supremum.
   *
   * Exactness stance: the supremum is chosen by INTEGER comparison —
   * `|sr·nq − sq·nr|` over decimal(38) products — so the argmax never
   * depends on float summation order; only the final reported ratio
   * divides. Scale shape: per-side value counts reduce under partial
   * aggregation to a DISTINCT-VALUE-bounded table (quantize first for
   * continuous metrics); the CDF walk is the [[driftPsi]] ordered-fold
   * discipline — one sorted collect of the bounded value table, no
   * unpartitioned window, no corpus-sized collect. */
  def driftKs(ref: DataFrame, refMetric: Column, cand: DataFrame,
      candMetric: Column): DataFrame = {
    def counts(df: DataFrame, m: Column, out: String): DataFrame =
      df.select(m.cast("double").as("x")).filter(col("x").isNotNull)
        .groupBy("x").agg(count(lit(1)).as(out))
    val joined = counts(ref, refMetric, "cr")
      .join(counts(cand, candMetric, "cq"), Seq("x"), "full")
      .select(col("x"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cq"), lit(0L)).as("cq"))
    val totals = joined.agg(sum("cr").as("nr"), sum("cq").as("nq"))
    val dec = "decimal(38,0)"
    val folded = aggregate(
      array_sort(collect_list(struct(col("x"), col("cr"), col("cq"),
        col("nr"), col("nq")))),
      struct(lit(0L).as("sr"), lit(0L).as("sq"),
        lit(-1).cast(dec).as("best"), lit(Double.NaN).as("at")),
      (acc, e) => {
        val sr = acc.getField("sr") + e.getField("cr")
        val sq = acc.getField("sq") + e.getField("cq")
        val d = abs(sr.cast(dec) * e.getField("nq").cast(dec) -
          sq.cast(dec) * e.getField("nr").cast(dec))
        struct(sr.as("sr"), sq.as("sq"),
          greatest(d, acc.getField("best")).as("best"),
          when(d > acc.getField("best"), e.getField("x"))
            .otherwise(acc.getField("at")).as("at"))
      })
    joined.crossJoin(broadcast(totals))
      .groupBy("nr", "nq")
      .agg(folded.as("f"))
      .select(col("nr").as("n_ref"), col("nq").as("n_cand"),
        round(col("f.best").cast("double") /
          (col("nr").cast("double") * col("nq").cast("double")), 6).as("ks"),
        col("f.at").as("ks_at"))
  }

  /**
   * Encoding-artifact (mojibake) signal — the "was this decoded with the
   * wrong charset" gate a crawl pipeline runs before any text op:
   * per-document counts of U+FFFD replacement characters (decoder gave
   * up), Ã/Â-prefixed double-encoded UTF-8 pairs and â-prefixed triples
   * (UTF-8 bytes re-decoded as Latin-1 — the `Ã©`/`â€™` signature), and
   * C0 control characters (except tab/LF/CR — binary bleed-through).
   * Returns `(id, n_replacement, n_double_utf8, n_control, clean)`.
   * Row-local `regexp_count` projections — stateless, streaming-safe,
   * zero exchanges. */
  def encodingArtifacts(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val t = textCol.cast("string")
    val nRepl = regexp_count(t, lit("\\uFFFD"))
    val nDouble = regexp_count(t, lit("[\\u00C3\\u00C2][\\u0080-\\u00BF]")) +
      regexp_count(t, lit("\\u00E2[\\u0080-\\u00BF][\\u0080-\\u00BF]"))
    val nCtrl = regexp_count(t,
      lit("[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F]"))
    df.select(idCol.cast("long").as("id"),
        nRepl.cast("bigint").as("n_replacement"),
        nDouble.cast("bigint").as("n_double_utf8"),
        nCtrl.cast("bigint").as("n_control"))
      .withColumn("clean",
        col("n_replacement") + col("n_double_utf8") + col("n_control") === 0)
  }

  /** N-gram NOVELTY of each candidate document against a REFERENCE
    * corpus: the fraction of the doc's DISTINCT word `n`-grams absent
    * from the reference's gram set — the memorization/regurgitation
    * audit for generated or continually-crawled data (novelty ≈ 0 means
    * the doc restates the reference; ≈ 1 means genuinely new text), and
    * the inverse of [[contamination]]'s overlap direction. Returns
    * `(id, n_grams, n_novel, novelty)` (4dp); docs with fewer than `n`
    * tokens have no grams and are absent.
    *
    * Scale shape: both sides reduce to md5-portable gram HASHES
    * row-locally (compiled kernels — text never shuffles); the reference
    * side dedupes to a vocabulary-sized hash set under partial
    * aggregation; one equi-join on `h` + one per-doc count — the
    * [[QualitySignals.boilerplateFraction]] join discipline. */
  def ngramNovelty(cand: DataFrame, candId: Column, candText: Column,
      ref: DataFrame, refText: Column, n: Int = 3): DataFrame =
    ngramNoveltyAgainst(cand, candId, candText,
      ngramHashTable(ref, refText, n), n)

  /** A corpus reduced to its DISTINCT n-gram hash table `(h)` — the
    * persisted artifact the incremental [[ngramNoveltyAgainst]] audits
    * new batches against (this family's …Against table, like
    * [[graft.ops.Dedup.repeatedGrams]] for the span scrub). Row-local
    * hashing, vocabulary-sized output under partial aggregation. */
  def ngramHashTable(df: DataFrame, textCol: Column, n: Int = 3): DataFrame =
    docGramHashes(df, lit(0L), textCol, n).select("h").distinct()

  /** Incremental [[ngramNovelty]]: audit a new batch against a
    * PERSISTED [[ngramHashTable]] with zero reference recomputation —
    * the daily-ingest novelty gate. Same output contract; the op never
    * collects the reference table (it is corpus-gram sized), and the
    * equi-join on `h` lets the planner pick broadcast vs shuffled hash
    * join from actual sizes — the [[graft.ops.Dedup.duplicateSpans]]
    * stance. */
  def ngramNoveltyAgainst(cand: DataFrame, candId: Column, candText: Column,
      gramTable: DataFrame, n: Int = 3): DataFrame =
    docGramHashes(cand, candId, candText, n)
      .join(gramTable.select(col("h").cast("long").as("h"))
        .withColumn("seen", lit(1L)), Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("id"), col("n_grams"), col("n_novel"),
        round(col("n_novel") / col("n_grams"), 4).as("novelty"))

  /** Per-doc DISTINCT n-gram hashes `(id, h)` — compiled row-local
    * kernel shared by the novelty family (text never shuffles). */
  private def docGramHashes(df: DataFrame, id: Column, text: Column,
      n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), text.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (docId, t) =>
          val tk = if (t == null) Array.empty[String]
                   else t.trim.split("\\s+").filter(_.nonEmpty)
          if (tk.length < n) Iterator.empty
          else {
            val set = scala.collection.mutable.HashSet.empty[Long]
            var i = 0
            while (i + n <= tk.length) {
              set += graft.expr.PortableHash.hex15(
                tk.slice(i, i + n).mkString(" "))
              i += 1
            }
            set.iterator.map(h => (docId, h))
          }
        }
      }.toDF("id", "h")
  }

  /**
   * Cross-document boilerplate detection: for each document, the fraction
   * of its DISTINCT word `n`-grams that occur in at least `minDf` documents
   * corpus-wide (headers, footers, templates, license blurbs — the
   * repetition [[repetitionSignals]] cannot see because it is corpus-level,
   * not row-local). Returns `(id, n_grams, boiler_frac)`.
   *
   * Scale shape: one explode of distinct per-doc grams; the document
   * frequency reduces with map-side partial aggregation on the gram key
   * (a count per DISTINCT gram — vocabulary-sized, not corpus-sized), then
   * joins back on the same gram key: both sides hash-partition identically
   * so the join adds no third shuffle of the big side. Unlike a
   * `count(*) over (partition by gram)` window, partial aggregation keeps
   * stop-gram skew bounded — the window would buffer the hottest gram's
   * every occurrence in one task.
   */
  def boilerplateFraction(df: DataFrame, idCol: Column, textCol: Column,
      n: Int = 3, minDf: Long = 3L): DataFrame = {
    val grams_ = df
      .select(idCol.as("id"), split(trim(textCol), "\\s+").as("tk"))
      .select(col("id"), explode(array_distinct(grams(col("tk"), n))).as("g"))
    val docFreq = grams_.groupBy("g").agg(count("*").as("df"))
    grams_.join(docFreq, "g")
      .groupBy("id")
      .agg(count("*").as("n_grams"),
        round(avg((col("df") >= minDf).cast("double")), 4).as("boiler_frac"))
  }

  /**
   * SEMANTIC benchmark contamination — the embedding-space member of the
   * contamination family ([[contamination]] catches verbatim n-gram
   * overlap; a paraphrased eval item evades it but not its embedding):
   * every corpus vector whose cosine against ANY benchmark vector meets
   * `threshold` is reported with its best-matching benchmark id (ties
   * toward the smaller bench id), max similarity, and match count.
   * Returns `(id, bench_id, max_sim, n_matches)` — flagged rows only.
   *
   * Scale shape: benchmark suites are small by nature, so the bench frame
   * broadcasts and the corpus pays one pass with |bench| fused cosines
   * per row — no corpus shuffle; the per-id reduction is a partial agg
   * over rows already filtered to matches. For a benchmark too large to
   * broadcast, assign both sides to IVF cells first and equi-join on the
   * cell ([[graft.ops.Dedup.semanticDedup]]'s pruning) — same verdicts
   * at nprobe-bounded recall. */
  def semanticContamination(corpus: DataFrame, idCol: Column,
      vecCol: Column, bench: DataFrame, benchIdCol: Column,
      benchVecCol: Column, threshold: Double): DataFrame = {
    val b = broadcast(bench.select(benchIdCol.cast("long").as("bid"),
      benchVecCol.as("bv")))
    corpus.select(idCol.cast("long").as("id"), vecCol.as("v"))
      .crossJoin(b)
      .select(col("id"), col("bid"),
        round(graft.functions.cosine_similarity(col("v"), col("bv")), 4)
          .as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy("id")
      .agg(max(struct(col("sim"), (-col("bid")).as("nb"))).as("m"),
        count(lit(1)).as("n_matches"))
      .select(col("id"), (-col("m.nb")).as("bench_id"),
        col("m.sim").as("max_sim"), col("n_matches"))
  }

  /**
   * EMBEDDING-SPACE drift between two corpus snapshots — the vector
   * sibling of [[driftPsi]] (which sees token shift but not semantic
   * shift under a changed vocabulary): both snapshots are assigned to
   * one shared IVF clustering (trained on their union — the common
   * reference frame), and each cell reports its reference/new counts,
   * add-one-smoothed share pair, PSI contribution, and the shift in mean
   * member-to-centroid cosine (a cell whose share holds but whose
   * members drift off-center is early warning PSI alone misses).
   * `Σ psi_term` is the headline statistic, same thresholds as
   * [[driftPsi]]. Returns one row per cell.
   *
   * Scale shape: [[graft.ops.Ivf.trainCentroids]]'s sampled Lloyd +
   * one row-local assignment pass; the only full-corpus aggregation is
   * the per-(cell) partial agg of counts and cosine sums; the centroid
   * join is a broadcast of nlist rows. */
  def embeddingDrift(emb: DataFrame, idCol: Column, vecCol: Column,
      isNewCol: Column, nlist: Int = 8, iters: Int = 2,
      sampleFraction: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(idCol.cast("long").as("id"),
      vecCol.cast("array<float>").as("v"),
      isNewCol.cast("boolean").as("is_new"))
    val cents = graft.ops.Ivf.trainCentroids(v, col("id"), col("v"), nlist,
      iters, sampleFraction)
    val cdf = broadcast(cents.map { case (cid, c) => (cid, c.toVector) }
      .toDF("cid", "c")
      .select(col("cid"), col("c").cast("array<float>").as("c")))
    val per = graft.ops.Ivf.assignClusters(v, col("id"), col("v"), cents)
      .join(cdf, col("cluster") === col("cid"))
      .select(col("cluster").cast("long").as("cluster"), col("is_new"),
        graft.functions.cosine_similarity(col("v"), col("c")).as("cc"))
      .groupBy("cluster")
      .agg(sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        avg(when(!col("is_new"), col("cc"))).as("mc_ref"),
        avg(when(col("is_new"), col("cc"))).as("mc_new"))
    val totals = per.agg(sum("n_ref").as("tr"), sum("n_new").as("tn"))
    val p = (col("n_ref") + 1) / (col("tr") + lit(nlist)).cast("double")
    val q = (col("n_new") + 1) / (col("tn") + lit(nlist)).cast("double")
    per.crossJoin(broadcast(totals))
      .select(col("cluster"), col("n_ref"), col("n_new"),
        round((p - q) * log(p / q), 6).as("psi_term"),
        round(coalesce(col("mc_ref"), lit(0.0)), 4).as("mean_cos_ref"),
        round(coalesce(col("mc_new"), lit(0.0)), 4).as("mean_cos_new"),
        round(coalesce(col("mc_new"), lit(0.0)) -
          coalesce(col("mc_ref"), lit(0.0)), 4).as("cos_shift"))
  }

  /** [[semanticContamination]]'s removal form: the corpus minus every
    * flagged row — [[decontaminate]]'s contract on the embedding path.
    * The flagged-id frame is match-bounded; the corpus pays one
    * broadcast anti-join and never shuffles. */
  def semanticDecontaminate(corpus: DataFrame, idCol: Column,
      vecCol: Column, bench: DataFrame, benchIdCol: Column,
      benchVecCol: Column, threshold: Double): DataFrame = {
    val flagged = semanticContamination(corpus, idCol, vecCol, bench,
      benchIdCol, benchVecCol, threshold).select(col("id").as("_fid"))
    corpus.join(broadcast(flagged), idCol.cast("long") === col("_fid"),
      "left_anti")
  }
}
