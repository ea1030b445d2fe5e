package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation (north-star
 * extensions): token counting, quality scoring, language identification,
 * and document fingerprinting. The scalar signals are codegen'd Spark
 * built-ins (no UDFs) that fuse into the scan; the winnowing family runs
 * as compiled per-partition projections (bounded per-row loops belong in
 * JVM code, not interpreted HOF trees — see [[winnowFingerprints]]).
 * Either way: one pass, zero exchanges.
 */
object TextAnalysis {

  /** Whitespace token count; 0 for blank text. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: whitespace tokens plus an extra unit
    * per 4 chars of long tokens (a cheap stand-in for byte-pair merges). */
  def subwordCountEstimate(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(aggregate(split(trim(text), "\\s+"), lit(0),
        (acc, t) => acc + greatest(lit(1), ceil(length(t) / 4.0).cast("int"))))

  /** Per-rule booleans behind [[qualityScore]] — the diagnostic view a
    * Gopher-style rule filter reads (which rule rejected a doc matters as
    * much as that one did). Struct of `length_ok, token_len_ok, punct_ok,
    * stop_ok`. */
  def qualityFlags(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val nTok = size(toks).cast("double")
    val meanTokLen = (length(trim(text)) - (nTok - 1)) / nTok // chars sans separators
    val stopHits = size(filter(toks, t => t.isin(stopwordsEn: _*))).cast("double")
    struct(
      nTok.between(8, 10000).as("length_ok"),
      meanTokLen.between(2.0, 12.0).as("token_len_ok"),
      text.rlike("[.!?]").as("punct_ok"),
      (stopHits / nTok).between(0.01, 0.6).as("stop_ok"))
  }

  /** Composite quality score in [0,1] from cheap heuristics: length band,
    * mean token length band, punctuation presence, stopword ratio — 0.25
    * per passing [[qualityFlags]] rule (null rules score 0, as the
    * original when/otherwise formulation did). */
  def qualityScore(text: Column): Column = {
    val f = qualityFlags(text)
    round(Seq("length_ok", "token_len_ok", "punct_ok", "stop_ok")
      .map(n => coalesce(f.getField(n).cast("double"), lit(0.0)) * 0.25)
      .reduce(_ + _), 2)
  }

  /** Shannon entropy (nats) of a document's token distribution — the
    * vocabulary-diversity signal quality classifiers use (low entropy =
    * repetitive/templated text). `tk` MUST be a materialized token-array
    * column (project `array_remove(split(...), "")` first): an inline
    * split expression would re-evaluate once per distinct type inside the
    * lambda — O(types) regex passes per row. The term list folds over the
    * SORTED distinct tokens so the float sum is order-deterministic
    * across engines (float addition is order-sensitive). O(types×tokens)
    * comparisons per row, never leaving the row. */
  def tokenEntropy(tk: Column): Column = {
    val n = size(tk).cast("double")
    val types = array_sort(array_distinct(tk))
    val h = aggregate(
      transform(types, t => {
        val c = size(filter(tk, x => x === t)).cast("double")
        -(c / n) * log(c / n)
      }),
      lit(0.0), (acc, x) => acc + x)
    when(size(tk) === 0, lit(0.0)).otherwise(h)
  }

  /** Type-token ratio (distinct/total tokens) over a materialized
    * token-array column — the companion diversity signal. */
  def typeTokenRatio(tk: Column): Column =
    when(size(tk) === 0, lit(0.0))
      .otherwise(size(array_distinct(tk)).cast("double") / size(tk))

  /** Blocklist signal: struct `(n_hits, hit_ratio)` — exact-token hits
    * against a word list (the C4 "bad words" filter shape; also profanity
    * / brand / compliance screens). `hit_ratio` rounds to 4dp so
    * downstream threshold cuts are engine-reproducible. Row-local
    * built-ins; token membership against a literal list stays in
    * codegen. */
  def blocklistSignals(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklist must be non-empty")
    val toks = array_remove(split(trim(text), "\\s+"), "")
    val hits = size(filter(toks, t => t.isin(words: _*)))
    struct(hits.cast("long").as("n_hits"),
      when(size(toks) === 0, lit(0.0))
        .otherwise(round(hits.cast("double") / size(toks), 4)).as("hit_ratio"))
  }

  /** PII pattern table shared by [[piiSignals]] and [[redactPii]] so the
    * two stay in lockstep: (class, regex, sentinel). Patterns are
    * deliberately RE2-compatible (no lookaround, no backreferences) so
    * any linear-time engine — and the DuckDB oracle — runs them
    * verbatim; match semantics (leftmost-first, greedy) agree between
    * java.util.regex and RE2 for this subset. Redaction applies the
    * table IN ORDER, so an email whose local part contains an id-shaped
    * digit run is masked once, as `<EMAIL>`. Deliberately conservative
    * core classes — the shape (ordered regex fold, row-local, inside
    * whole-stage codegen) is what scales; richer pattern sets drop in.
    * ([[Curation.piiRedact]] is the older one-expression quick scrub —
    * email/URL/digit-run, no counts; this family adds per-class audit
    * signals and the shared-table engine-parity contract.) */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<ID>"),
    ("phone", "(?:\\+\\d{7,15}\\b|\\b\\d{3}-\\d{3}-\\d{4}\\b|\\(\\d{3}\\) \\d{3}-\\d{4}\\b)",
      "<PHONE>"))

  /** Per-class PII match counts (`n_email`, `n_ipv4`, `n_id`, `n_phone`),
    * each counted independently on the RAW text — the audit signal a
    * release gate thresholds on. Row-local `regexp_count`, zero
    * exchanges. */
  def piiSignals(text: Column): Column =
    struct(piiPatterns.map { case (name, pat, _) =>
      regexp_count(text, lit(pat)).cast("long").as(s"n_$name")
    }: _*)

  /** PII match EXTRACTION — the audit-trail sibling of [[piiSignals]]:
    * one row per match, `(id, pii_class, match_no, matched)` with
    * `match_no` the 1-based in-document order per class, so a release
    * review inspects WHAT matched, not just how often (and a false-
    * positive analysis has the evidence in hand). Same [[piiPatterns]]
    * table; row-local `regexp_extract_all` + posexplode per class,
    * classes unioned — zero exchanges, streaming-safe. */
  def piiMatches(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    piiPatterns.map { case (name, pat, _) =>
      df.select(idCol.cast("long").as("id"), textCol.as("t"))
        .select(col("id"), lit(name).as("pii_class"),
          posexplode(regexp_extract_all(col("t"), lit(pat), lit(0))))
        .select(col("id"), col("pii_class"),
          (col("pos") + 1).cast("long").as("match_no"),
          col("col").as("matched"))
    }.reduce(_ unionAll _)

  /** PII spans with CHARACTER POSITIONS — the surgical-redaction /
    * annotation-export sibling of [[piiMatches]]: one row per match,
    * `(id, pii_class, start_pos, end_pos, matched)` with 0-based
    * `start_pos` inclusive and `end_pos` exclusive (substring
    * convention), matches per class in leftmost non-overlapping scan
    * order — exactly what a span-level redactor or an NER training
    * exporter consumes, where [[piiMatches]]' strings alone can't
    * locate a repeated value. Row-local mapPartitions scan (each
    * class's regex compiled once per partition), zero exchanges.
    * DuckDB has no position-returning extract-all, so this op carries
    * a rows-only driver check + the positional ScalaTest contract
    * (spans slice back to their matched text). */
  def piiSpans(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pats = piiPatterns.map { case (n, p, _) => (n, p) }
    df.select(idCol.cast("long").as("id"),
        textCol.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val compiled = pats.map { case (n, p) => (n, p.r) }
        rows.flatMap { case (id, t) =>
          if (t == null) Iterator.empty
          else compiled.iterator.flatMap { case (name, re) =>
            re.findAllMatchIn(t).map(m =>
              (id, name, m.start.toLong, m.end.toLong, m.matched))
          }
        }
      }
      .toDF("id", "pii_class", "start_pos", "end_pos", "matched")
  }

  /** Mask every PII match with its class sentinel, applying
    * [[piiPatterns]] in table order (email first — see table doc).
    * Idempotent: sentinels contain no digits or `@`, so a second pass
    * matches nothing. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, sentinel)) =>
      regexp_replace(c, pat, sentinel)
    }

  /** Tiny per-language marker-word lists for the n-gram/stopword heuristic.
    * Deliberately minimal — the operator shape (argmax over per-language
    * token-hit counts) is what scales; richer lists drop in. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "por"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"))

  private val stopwordsEn = markers.head._2

  /** Language-ID heuristic: count marker-word hits per language; predict the
    * argmax (ties → alphabetical order), `und` when nothing matches. */
  def langId(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val hits = markers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // alphabetical scan: first language reaching the max wins ties
    hits.reverse.foldLeft(lit("und")) { case (acc, (lang, h)) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** [[langId]] with a calibrated-confidence companion: struct
    * `(pred, margin)` where `margin = (top1 − top2) / top1` over the
    * marker-hit counts (0 when nothing matches or two languages tie) —
    * the relative-margin confidence heuristic classifiers report when
    * there is no probabilistic head. Rounded 4dp so downstream bucket
    * cuts are engine-reproducible. Row-local built-ins only. */
  def langIdWithConfidence(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val hits = markers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val sorted = reverse(array_sort(array(hits.map(_._2): _*)))
    val s1 = element_at(sorted, 1)
    val s2 = element_at(sorted, 2)
    val pred = hits.reverse.foldLeft(lit("und")) { case (acc, (lang, h)) =>
      when(h === greatest(hits.map(_._2): _*) && h > 0, lit(lang)).otherwise(acc)
    }
    struct(pred.as("pred"),
      when(s1 > 0, round((s1 - s2) / s1, 4)).otherwise(lit(0.0)).as("margin"))
  }

  /** Confidence CALIBRATION report for [[langId]] against a declared
    * label: bucket the margin into `buckets` equal bins (top bin closed)
    * and report per-bin document count and agreement rate — the "is
    * high confidence actually more accurate" diagnostic that decides
    * whether a margin threshold is a usable routing gate. Returns
    * `(bucket, n, n_agree, agree_rate)`.
    *
    * Scale shape: the classifier runs as a compiled per-partition kernel
    * (ONE split per row, hash-set marker membership), then one
    * partial-agg-friendly aggregation over `buckets` groups. A first cut
    * composed [[langIdWithConfidence]] Column HOFs instead; `filter` is
    * CodegenFallback (interpreted) and the margin/argmax tree repeats
    * each per-language hit expression — with the token split inlined into
    * every occurrence — ~20 regex splits of the full text per row
    * (measured 9.2 s vs sub-second at sf0.1; the [[winnowFingerprints]]
    * lesson again: bounded per-row loops belong in compiled JVM code).
    * Semantics are [[langIdWithConfidence]] bit-for-bit: duplicate-token
    * hits count, ties → first language in marker order, margin rounded
    * 4dp via the same HALF_UP decimal Spark's `round` uses. The rate
    * divides two exact longs — no float-sum ordering anywhere. */
  def langIdCalibration(df: DataFrame, textCol: Column, declaredCol: Column,
      buckets: Int = 4): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val langs = markers.map(_._1).toArray
    val sets = markers.map(_._2.toSet).toArray
    df.select(textCol.cast("string").as("t"),
        declaredCol.cast("string").as("d"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (t, d) =>
          // split(trim(text), "\s+") parity: trim-then-split leaves [""]
          // for empty text, which matches no marker word
          val toks = if (t == null) Array.empty[String]
                     else t.trim.split("\\s+")
          val hits = new Array[Int](langs.length)
          var i = 0
          while (i < toks.length) {
            var j = 0
            while (j < sets.length) {
              if (sets(j).contains(toks(i))) hits(j) += 1
              j += 1
            }
            i += 1
          }
          var s1 = 0; var s2 = 0
          var j = 0
          while (j < hits.length) {
            val h = hits(j)
            if (h > s1) { s2 = s1; s1 = h } else if (h > s2) s2 = h
            j += 1
          }
          var pred = "und"
          if (s1 > 0) {
            var p = 0
            while (pred == "und" && p < hits.length) {
              if (hits(p) == s1) pred = langs(p)
              p += 1
            }
          }
          // the same HALF_UP shortest-decimal rounding Catalyst's Round
          // applies to doubles, so bucket cuts agree with the oracle
          val margin =
            if (s1 > 0) BigDecimal((s1 - s2).toDouble / s1)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            else 0.0
          val bucket = math.min(math.floor(margin * buckets).toInt, buckets - 1)
          val agree: Option[Long] =
            if (d == null) None else Some(if (pred == d) 1L else 0L)
          (bucket, agree)
        }
      }
      .toDF("bucket", "agree")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("agree").as("n_agree"))
      .select(col("bucket").cast("bigint").as("bucket"), col("n"),
        col("n_agree"), round(col("n_agree") / col("n"), 4).as("agree_rate"))
  }

  /** Zipf rank-frequency slope over the corpus's top-`topN` terms: the
    * least-squares slope of `ln(freq)` against `ln(rank)` — healthy
    * natural-language corpora sit near −1 (Zipf's law); a flat slope
    * flags templated/synthetic text, a cliff flags boilerplate
    * domination. One row `(n_terms, slope)` (4dp).
    *
    * Scale shape: term counts reduce under partial aggregation
    * (vocabulary-sized, not corpus-sized); the top-`topN` cut is a
    * TakeOrdered, and the rank window runs over the BOUNDED top slice
    * only (the rrfFuse stance — never an unpartitioned window on
    * corpus-sized data). The slope uses the explicit moment formula
    * `(E[xy] − E[x]E[y]) / (E[x²] − E[x]²)` so any engine reproduces it
    * within the 4dp round. */
  def zipfSlope(df: DataFrame, textCol: Column, topN: Int = 100): DataFrame = {
    require(topN >= 2, "need at least 2 ranks for a slope")
    import org.apache.spark.sql.expressions.Window
    val top = df
      .select(explode(array_remove(split(trim(textCol), "\\s+"), "")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tok")).limit(topN)
    val xy = top
      .withColumn("r", row_number().over(Window.orderBy(desc("c"), asc("tok"))))
      .select(log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    xy.agg(count(lit(1)).as("n_terms"),
      round((avg(col("x") * col("y")) - avg(col("x")) * avg(col("y"))) /
        (avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))), 4)
        .as("slope"))
  }

  /** Polynomial rolling-hash fingerprint of the first `prefix` chars:
    * `acc = (acc*31 + codepoint) mod 1e9+7`, seed 7 — cheap, deterministic,
    * and expressible in any engine with a list fold (used by the DuckDB
    * oracle too). */
  def fingerprint(text: Column, prefix: Int = 64): Column =
    aggregate(
      transform(split(substring(text, 1, prefix), ""), c => ascii(c).cast("bigint")),
      lit(7L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS algorithm): hash every word `k`-gram, slide a window of `w`
    * consecutive hashes, and select each window's minimum (rightmost on
    * ties); the distinct selected positions are the fingerprint set. The
    * guarantee: any shared substring of ≥ `w + k - 1` tokens produces at
    * least one shared fingerprint, while storage is ~2/(w+1) of the gram
    * count — the robust partial-overlap detector between whole-document
    * hashing (brittle) and all-grams indexes (huge). Returns
    * `(id, n_fp, fp_mod)` — fingerprint count and the order-independent
    * sum of selected hashes mod 1e9+7 (a compact set digest for
    * equality/overlap checks); documents with fewer than `w` grams have
    * no window and are absent.
    *
    * Scale shape: entirely ROW-LOCAL — a compiled per-partition
    * projection (mapPartitions), zero exchanges, streaming-safe. A first
    * cut used Catalyst HOF folds instead; higher-order functions are
    * CodegenFallback (interpreted eval), and the optimizer inlined the
    * token-split into the per-gram lambda — O(tokens²) regex splits per
    * document, measured 1097 s vs ~2 s at sf0.1. Bounded per-row loops
    * belong in compiled JVM code. The hash is the md5
    * [[graft.expr.PortableHash]] kernel, so fingerprints — and therefore
    * cross-engine joins on them — are bit-reproducible. */
  def winnowFingerprints(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 3, w: Int = 4): DataFrame = {
    val P = 1000000007L
    val spark = df.sparkSession
    import spark.implicits._
    winnowRows(df, idCol, textCol, k, w)
      .map { case (id, sel) =>
        var digest = 0L
        sel.foreach { case (_, h) => digest = (digest + h % P) % P }
        (id, sel.length.toLong, digest)
      }
      .toDF("id", "n_fp", "fp_mod")
  }

  /** The exploded fingerprint INDEX `(id, pos, h)` — one row per selected
    * winnowing fingerprint, the joinable table overlap detection builds:
    * two documents sharing a ≥ `w + k - 1` token run share at least one
    * `h`. Same row-local selection as [[winnowFingerprints]]; only the
    * (id, int, long) fingerprint rows ever reach a shuffle, never text. */
  def winnowFingerprintTable(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 3, w: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    winnowRows(df, idCol, textCol, k, w)
      .flatMap { case (id, sel) => sel.map { case (p, h) => (id, p, h) } }
      .toDF("id", "pos", "h")
  }

  /** Cross-document overlap report over the winnowing index — the MOSS
    * use-case: pairs of documents sharing ≥ `minShared` selected
    * fingerprints, with the shared count. Fingerprints appearing in more
    * than `maxDf` documents are dropped FIRST (the standard stop-gram
    * prune: boilerplate selected everywhere is not evidence of copying,
    * and joining on it makes the pair fan-out quadratic in the hottest
    * bucket — measured 1097 s vs ~1 s on the sf0.1 word-bag corpus).
    * Returns `(a_id, b_id, n_shared)`, `a_id < b_id`.
    *
    * Scale shape: the index builds row-locally ([[winnowFingerprintTable]]);
    * df counts reduce under partial aggregation; the hot-hash set (df >
    * maxDf — small by construction) broadcasts into an anti-join; the
    * self-join then carries `(id, h)` longs with every bucket bounded by
    * `maxDf`, so pair fan-out is ≤ maxDf²/2 per hash — never quadratic in
    * the corpus. */
  def winnowOverlapPairs(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 3, w: Int = 4, minShared: Int = 3, maxDf: Int = 10): DataFrame = {
    val fp = winnowFingerprintTable(df, idCol, textCol, k, w)
      .select(col("id"), col("h")).distinct()
    val hot = fp.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("h"))
    val pruned = fp.join(broadcast(hot), Seq("h"), "left_anti")
    val a = pruned.as("a")
    val b = pruned.as("b")
    a.join(b, col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Incremental [[winnowOverlapPairs]]: overlap of a NEW batch — or an
    * unbounded STREAM — against a PERSISTED frozen-corpus fingerprint
    * index ([[winnowFingerprintTable]] output), the daily-ingest
    * near-dup gate: which frozen documents each incoming document shares
    * ≥ `minShared` rare fingerprints with. The stop-gram prune runs on
    * the FROZEN side (hashes indexed in > `maxDf` reference docs are
    * boilerplate, not copying evidence), which also bounds each
    * broadcast bucket to `maxDf` ids. Returns `(id, ref_id, n_shared)`.
    *
    * Row-local by construction (the [[Dedup.spanScrubAgainst]]
    * discipline): the pruned index ships once per executor as a
    * broadcast `h → ref ids` map; each incoming row winnows its own
    * text in compiled per-partition code, looks its distinct selected
    * hashes up, and counts per reference doc in a local map — no joins,
    * no aggregation, no watermark; streaming-safe in append mode. For a
    * frozen corpus whose PRUNED index outgrows a broadcast, keep the
    * persisted [[winnowFingerprintTable]] and use the q134 equi-join
    * shape instead; this twin is the bounded-reference daily-gate form
    * (the [[Dedup.lineDedupAgainst]] stance). */
  def winnowOverlapAgainst(df: DataFrame, idCol: Column, textCol: Column,
      fpTable: DataFrame, k: Int = 3, w: Int = 4, minShared: Int = 3,
      maxDf: Int = 10, maxIndexEntries: Long = 20000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pruned = fpTable
      .select(col("id").cast("long").as("id"), col("h").cast("long").as("h"))
      .distinct()
      .groupBy("h").agg(collect_list("id").as("ids"))
      .filter(size(col("ids")) <= maxDf)
    // maxDf bounds each BUCKET but not the number of distinct hashes —
    // a frozen corpus whose pruned index outgrows the driver would
    // otherwise die as an opaque broadcast/driver OOM. One
    // hash-count-sized job up front turns that into a sized, actionable
    // error. (The count reuses the groupBy's shuffle output, so the
    // marginal cost is the final-agg pass, not a second index build.)
    val nEntries = pruned.count()
    require(nEntries <= maxIndexEntries,
      s"winnowOverlapAgainst: pruned fingerprint index has $nEntries " +
      s"distinct hashes (> maxIndexEntries=$maxIndexEntries) — too large " +
      "to broadcast as the daily-gate map. Keep the persisted " +
      "winnowFingerprintTable and use the q134 equi-join shape " +
      "(winnowOverlapPairs against the union) instead, or raise " +
      "maxIndexEntries if the driver is sized for it.")
    val index: Map[Long, Array[Long]] = pruned
      .as[(Long, Seq[Long])]
      .collect()
      .map { case (h, ids) => h -> ids.sorted.toArray }
      .toMap
    val bc = spark.sparkContext.broadcast(index)
    winnowRows(df, idCol, textCol, k, w)
      .mapPartitions { it =>
        val idx = bc.value
        it.flatMap { case (id, sel) =>
          val counts = scala.collection.mutable.HashMap.empty[Long, Int]
          val seen = scala.collection.mutable.HashSet.empty[Long]
          sel.foreach { case (_, h) =>
            if (seen.add(h)) idx.get(h).foreach(_.foreach { r =>
              counts.update(r, counts.getOrElse(r, 0) + 1)
            })
          }
          counts.iterator.filter(_._2 >= minShared).toArray.sortBy(_._1)
            .map { case (r, n) => (id, r, n.toLong) }
        }
      }
      .toDF("id", "ref_id", "n_shared")
  }

  /** Multi-needle CHARACTER-level substring counts via a compiled
    * Aho–Corasick automaton: one pass over each document regardless of
    * pattern count — the complement of [[Dedup.substringSearch]] (which
    * needs token patterns of ≥ k words and reports positions; this
    * counts arbitrary character needles, the blocklist-audit shape).
    * Counts are NON-overlapping per pattern, greedy left-to-right —
    * exactly `split(text, pattern).length − 1`, so any engine can
    * replay them. Returns `(id, pattern, n_hits)`, hits > 0 only;
    * patterns dedupe first ([[Dedup.substringSearch]]'s contract).
    *
    * Scale shape: the automaton builds once per partition from the
    * broadcast pattern list (pattern-size-bounded state); scanning is a
    * stateless compiled projection — zero exchanges, streaming-safe. */
  def substringCounts(df: DataFrame, idCol: Column, textCol: Column,
      patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "need non-empty patterns")
    val pats = patterns.distinct.toArray
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pats)
    df.select(idCol.cast("long").as("id"), textCol.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val pa = bc.value
        val ac = new AhoCorasick(pa)
        it.flatMap { case (id, t) =>
          if (t == null) Iterator.empty
          else {
            val cs = ac.countNonOverlapping(t)
            Iterator.range(0, pa.length).filter(cs(_) > 0)
              .map(pi => (id, pa(pi), cs(pi)))
          }
        }
      }
      .toDF("id", "pattern", "n_hits")
  }

  /** Aho–Corasick automaton over a fixed needle set: trie + BFS failure
    * links + merged output lists. `countNonOverlapping` scans a text
    * once and counts each pattern's greedy left-to-right non-overlapping
    * occurrences (a match is taken iff it starts after the pattern's
    * previous accepted match ended — the `split`-count semantics). */
  private final class AhoCorasick(patterns: Array[String]) {
    import scala.collection.mutable
    private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val out = mutable.ArrayBuffer[List[Int]](Nil)
    private val fail = mutable.ArrayBuffer(0)

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += mutable.HashMap.empty[Char, Int]
          out += Nil
          fail += 0
          children.size - 1
        })
      }
      out(s) = pi :: out(s)
    }
    locally {
      val q = mutable.Queue.empty[Int]
      children(0).values.foreach { s => fail(s) = 0; q += s }
      while (q.nonEmpty) {
        val r = q.dequeue()
        children(r).foreach { case (c, u) =>
          q += u
          var f = fail(r)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          val t = children(f).getOrElse(c, 0)
          fail(u) = if (t == u) 0 else t
          out(u) = out(u) ++ out(fail(u))
        }
      }
    }

    def countNonOverlapping(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      val lastEnd = Array.fill(patterns.length)(-1)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !children(s).contains(c)) s = fail(s)
        s = children(s).getOrElse(c, 0)
        out(s).foreach { pi =>
          val start = i - patterns(pi).length + 1
          if (start > lastEnd(pi)) { counts(pi) += 1; lastEnd(pi) = i }
        }
        i += 1
      }
      counts
    }
  }

  /** Shared winnowing core: one typed row per document with ≥ `w` grams,
    * carrying the selected `(pos, hash)` fingerprints in position order —
    * each window's rightmost-min, deduplicated. Compiled per-partition
    * code (see [[winnowFingerprints]]'s scale note for why not HOFs). */
  private def winnowRows(df: DataFrame, idCol: Column, textCol: Column,
      k: Int, w: Int) = {
    require(k >= 1 && w >= 1, "need k >= 1 gram size and w >= 1 window")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("long").as("id"), textCol.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val tk =
            if (text == null) Array.empty[String]
            else graft.ops.Dedup.trimSpaces(text).split("\\s+").filter(_.nonEmpty)
          val nGrams = tk.length - k + 1
          if (nGrams < w) Iterator.empty
          else {
            val hs = new Array[Long](nGrams)
            var i = 0
            while (i < nGrams) {
              hs(i) = graft.expr.PortableHash.hex15(
                tk.slice(i, i + k).mkString(" "))
              i += 1
            }
            val picked = new Array[Boolean](nGrams)
            i = 0
            while (i + w <= nGrams) {
              var best = i
              var j = i + 1
              while (j < i + w) {
                if (hs(j) <= hs(best)) best = j // rightmost minimal
                j += 1
              }
              picked(best) = true
              i += 1
            }
            val sel = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
            i = 0
            while (i < nGrams) {
              if (picked(i)) sel += ((i, hs(i)))
              i += 1
            }
            Iterator.single((id, sel.toArray))
          }
        }
      }
  }

  /** Per-document keyword extraction: top `k` terms by tf·idf with
    * smoothed idf `ln((N+1)/(df+1))` (N = corpus document count, df =
    * documents containing the term). Scores round to 4dp BEFORE ranking
    * so the cut is engine-reproducible; ties break on the term itself.
    * Returns `(id, rnk, term, score)`, `rnk` 1-based.
    *
    * Scale shape: per-(doc, term) counts and the document-frequency table
    * both reduce under partial aggregation (the only exchanges carry
    * `(id, term, count)` / `(term, df)` rows, never document text); the
    * df table is vocabulary-bounded and BROADCASTS to the scoring join;
    * N is one broadcast scalar. The top-k cut is a row-local sort of each
    * document's own (bounded) term list — no window, no global sort. */
  def tfidfKeywords(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 5): DataFrame = {
    val terms = df.select(idCol.as("id"),
        explode(array_remove(split(trim(textCol), "\\s+"), "")).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        round(col("tf") * log((col("n") + 1).cast("double") / (col("df") + 1)), 4)
          .as("s"))
    scored
      .groupBy("id")
      .agg(slice(array_sort(collect_list(struct((-col("s")).as("ns"),
        col("term").as("term")))), 1, k).as("top"))
      .select(col("id"), posexplode(col("top")))
      .select(col("id"), (col("pos") + 1).as("rnk"),
        col("col.term").as("term"), (-col("col.ns")).as("score"))
  }

  /**
   * GloVe-style windowed co-occurrence matrix (Pennington et al. 2014):
   * for every token pair within `window` positions, accumulate the
   * distance-discounted weight `1/d` — the input statistic GloVe (and
   * any PMI-matrix factorization) trains on, and the windowed
   * generalization of [[collocations]]' adjacent pairs. Pairs emit
   * CANONICALIZED (`w1 ≤ w2` lexicographically — the matrix is
   * symmetric) with their occurrence count and weight sum; pairs seen
   * fewer than `minCount` times drop. Output:
   * `(w1, w2, n_pair, x)` with `x = Σ 1/d` at 4dp.
   *
   * Engine determinism: the weights accumulate in EXACT INTEGER units
   * of `1/lcm(1..window)` (for window 4: 12/d ∈ {12, 6, 4, 3}), summed
   * as longs and divided ONCE at the end — a float `Σ 1/d` is
   * order-sensitive at the 4th decimal on hot pairs, an integer sum
   * never is.
   *
   * Scale shape: the pair expansion is row-local (n·window rows per
   * document, two nested explodes in one projection); only
   * `(w1, w2, weight)` rows shuffle into a partial-agg'd group-by —
   * bounded by the pair vocabulary per partition, the same regime as
   * [[collocations]]' bigram counts. */
  /** Vocabulary growth curve (Heaps'-law evidence) — cumulative
    * distinct types vs cumulative tokens as the corpus is read in
    * `idCol` order: the dataset-scaling readout behind "how much new
    * vocabulary does the next slice of data buy" (fit
    * `log cum_types ~ log cum_tokens` downstream — the regr_* family —
    * for the Heaps exponent). Output one row per document:
    * `(id, n_tokens, new_types, cum_tokens, cum_types)`.
    *
    * Scale shape: a type's first occurrence is `min(doc id)` over one
    * grouped pass of (term, id) pairs — the corpus-order scan SQL
    * formulations need never happens; per-doc token counts are
    * row-local; both cumulative columns come from the range-partitioned
    * weighted prefix sum over the |docs| frame (no row-level global
    * window). */
  def vocabularyGrowth(docs: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val base = docs.select(idCol.cast("long").as("id"),
        array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
      .localCheckpoint(eager = true) // read twice: tokens + first-occ
    val perDoc = base.select(col("id"),
      size(col("tk")).cast("long").as("n_tokens"))
    val firstOcc = base.select(col("id"), explode(col("tk")).as("term"))
      .groupBy("term").agg(min("id").as("id"))
      .groupBy("id").agg(count(lit(1)).as("new_types"))
    val joined = perDoc.join(firstOcc, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
    val c1 = Suffix.withWeightedOffset(joined, Seq(col("id")),
      col("n_tokens"), "__ct0")
    val c2 = Suffix.withWeightedOffset(c1, Seq(col("id")),
      col("new_types"), "__cy0")
    c2.select(col("id"), col("n_tokens"), col("new_types"),
      (col("__ct0") + col("n_tokens")).as("cum_tokens"),
      (col("__cy0") + col("new_types")).as("cum_types"))
  }

  /** Chao1 species-richness estimate per group — "how much vocabulary
    * does this source HAVE, beyond what the sample shows": the
    * abundance-based lower bound `chao1 = D + f₁(f₁−1)/(2(f₂+1))`
    * (the bias-corrected form, defined even when no doubletons exist)
    * from the singleton/doubleton counts of the observed frequency
    * spectrum. The corpus-budgeting companion to [[vocabularyGrowth]]:
    * Heaps answers "what does the next slice buy", Chao1 answers "how
    * far is the ceiling". Output `(g, d_obs, f1, f2, chao1)` — chao1
    * UNROUNDED (an exact integer ratio; both engines emit the identical
    * double and the compare layer formats it).
    *
    * Scale shape: one (group, word) grouped count is the only
    * corpus-sized pass; the frequency spectrum collapses per group in a
    * second partial-agg'd pass. */
  def chao1Richness(docs: DataFrame, groupCol: Column,
      textCol: Column): DataFrame = {
    val wc = docs.select(groupCol.as("g"),
        explode(array_remove(split(trim(textCol), "\\s+"), "")).as("w"))
      .groupBy("g", "w").agg(count(lit(1)).as("c"))
    wc.groupBy("g").agg(
        count(lit(1)).as("d_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("g"), col("d_obs"), col("f1"), col("f2"),
        (col("d_obs") + col("f1") * (col("f1") - 1) /
          (lit(2.0) * (col("f2") + 1))).as("chao1"))
  }

  /** Pairwise BLEU-2 (Papineni et al. 2002) — n-gram-precision
    * similarity for PAIRED texts: clipped unigram+bigram precision of
    * the candidate against the reference, geometric-mean combined,
    * times the brevity penalty `min(1, e^(1−r/c))`. The
    * dedup-adjudication / paraphrase-eval metric the set-based Jaccard
    * family can't express (BLEU sees n-gram ORDER and multiplicity).
    * Takes an already-bounded pair frame (LSH candidates, eval pairs);
    * any zero n-gram precision — including a candidate shorter than 2
    * tokens — scores 0, the unsmoothed convention. Output
    * `(a_id, b_id, n_ref, n_cand, bleu)` (4dp).
    *
    * Scale shape: the clipped counting is a COMPILED per-partition
    * kernel (hash-map counts, O(len) per pair) — a first cut as
    * Catalyst `aggregate`/`filter` HOF folds was interpreted
    * CodegenFallback eval at O(distinct·len) per pair and 160× slower
    * (the PLANS.md q131 lesson re-learned); the bounded pair frame is
    * explicitly repartitioned first so a tiny one-row-group input
    * doesn't serialize the kernel onto one task. */
  def bleuPairs(pairs: DataFrame, aIdCol: Column, bIdCol: Column,
      refText: Column, candText: Column): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val base = pairs.select(aIdCol.cast("long").as("a_id"),
        bIdCol.cast("long").as("b_id"),
        refText.cast("string").as("ta"), candText.cast("string").as("tb"))
      .repartition(n, col("a_id"), col("b_id"))
      .as[(Long, Long, String, String)]
    base.mapPartitions { rows =>
      def toks(s: String): Array[String] =
        if (s == null) Array.empty
        else s.trim.split("\\s+").filter(_.nonEmpty)
      def countMap(xs: Array[String]) = {
        val m = scala.collection.mutable.HashMap.empty[String, Int]
        xs.foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
        m
      }
      def clipped(cand: Array[String], ref: Array[String]): Long = {
        val rm = countMap(ref)
        countMap(cand).iterator
          .map { case (t, k) => math.min(k, rm.getOrElse(t, 0)).toLong }
          .sum
      }
      def big(t: Array[String]): Array[String] =
        if (t.length < 2) Array.empty
        else Array.tabulate(t.length - 1)(i => t(i) + " " + t(i + 1))
      rows.map { case (a, b, sa, sb) =>
        val ta = toks(sa); val tb = toks(sb)
        val r = ta.length.toLong; val c = tb.length.toLong
        val m1 = clipped(tb, ta).toDouble
        val m2 = if (c >= 2) clipped(big(tb), big(ta)).toDouble else 0.0
        val p1 = if (c > 0) m1 / c else 0.0
        val p2 = if (c >= 2) m2 / (c - 1) else 0.0
        val bp =
          if (c == 0) 0.0
          else if (c >= r) 1.0
          else math.exp(1.0 - r.toDouble / c)
        val bleu =
          if (p1 > 0 && p2 > 0)
            bp * math.exp((math.log(p1) + math.log(p2)) / 2)
          else 0.0
        (a, b, r, c, bleu)
      }
    }.toDF("a_id", "b_id", "n_ref", "n_cand", "bleu")
      // round via the Spark expression so the 4dp path is the same one
      // every other oracle-compared double takes
      .withColumn("bleu", round(col("bleu"), 4))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents") — per-document candidate
    * phrases are the maximal stopword-free token runs (capped at
    * `maxPhraseLen` words BEFORE statistics — the capped variant);
    * each word scores `deg/freq` over the document's kept phrases
    * (deg = Σ lengths of phrases containing it, freq = occurrences), a
    * phrase scores the sum of its word scores, and the top `topK`
    * phrase types per document report with rank ties broken by the
    * ROUNDED score then phrase text (ranking on the 4dp value keeps
    * the order engine-reproducible where raw float sums could differ
    * by an ulp). Output `(id, rank, phrase, score)`.
    *
    * Scale shape: stop-marking and phrase-id assignment ride per-DOC
    * windows (the key shuffle); word stats and phrase scores are
    * grouped aggregations on (id, token) / (id, phrase-id) — nothing
    * leaves its document, no corpus-wide vocabulary state. */
  def rakeKeywords(docs: DataFrame, idCol: Column, textCol: Column,
      stopwords: Seq[String], maxPhraseLen: Int = 4,
      topK: Int = 3): DataFrame = {
    require(stopwords.nonEmpty, "rakeKeywords: stopwords must be non-empty")
    require(maxPhraseLen >= 1 && topK >= 1,
      "rakeKeywords: maxPhraseLen and topK must be >= 1")
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val toks = docs.select(idCol.cast("long").as("id"),
        posexplode(array_remove(split(trim(textCol), "\\s+"), ""))
          .as(Seq("pos", "tok")))
      .withColumn("stop", col("tok").isin(stopwords: _*))
      .withColumn("pid", sum(col("stop").cast("int")).over(wd))
      .filter(!col("stop"))
      .withColumn("plen",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("id", "pid")))
      .filter(col("plen") <= maxPhraseLen)
      .localCheckpoint(eager = true) // read twice: word stats + scores
    val ws = toks.groupBy("id", "tok")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
    val scored = toks.join(ws, Seq("id", "tok"))
      .groupBy("id", "pid")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"),
        sum(col("deg").cast("double") / col("freq")).as("score0"))
      .groupBy("id", "phrase")
      .agg(max(round(col("score0"), 4)).as("score"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("score"), asc("phrase"))
    scored.withColumn("rank", row_number().over(rank).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("id"), col("rank"), col("phrase"), col("score"))
  }

  /** Skip-gram-with-negative-sampling training pairs (word2vec SGNS,
    * Mikolov et al. 2013) — the [[gloveCooccurrence]] sibling that
    * emits the actual (center, context, negatives) training table:
    * every directed pair within `window` whose BOTH endpoints survive
    * the `minCount` vocabulary gate, aggregated to
    * `(center, context, n_pos)`, then `negatives` deterministic
    * unigram draws per aggregated pair — negative `j` is the vocab
    * word whose cumulative-count span contains
    * `md5(center, context, j) mod Σcounts`, i.e. exact
    * frequency-proportional sampling with zero RNG state (the word2vec
    * count^0.75 flattening is a caller-side weight choice; raw counts
    * keep the arithmetic integer-exact and engine-reproducible).
    * Output `(center, context, n_pos, j, neg)`.
    *
    * Scale shape: windows expand row-locally (positions × ≤window) and
    * only (center, context) string pairs shuffle into the count; the
    * vocab gate is a broadcast semi-join; the negative lookup is a
    * SEGMENT equi-join against the cumulative vocab spans (span rows
    * replicate to the ≤ span/W + 1 segments they overlap,
    * W ≈ total/4096) — never a per-row scan of the vocabulary, never a
    * range join. */
  def sgnsPairs(docs: DataFrame, textCol: Column, window: Int,
      minCount: Long, negatives: Int): DataFrame = {
    require(window >= 1 && window <= 16, "sgnsPairs: window in [1, 16]")
    require(minCount >= 1 && negatives >= 1,
      "sgnsPairs: minCount and negatives must be >= 1")
    val toks = docs.select(
        array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
      .localCheckpoint(eager = true) // read twice: vocab + windows
    val vocab = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val vr = Suffix.withWeightedOffset(vocab, Seq(col("w")),
      col("cnt"), "lo")
    val tot = vocab.agg(sum("cnt").as("total"))
    val raw = toks
      .select(col("tk"), explode(sequence(lit(0), size(col("tk")) - 1))
        .as("p"))
      .filter(size(col("tk")) - col("p") >= 2)
      .select(col("tk"), col("p"),
        explode(sequence(lit(1),
          least(lit(window), size(col("tk")) - col("p") - 1))).as("d"))
      .select(element_at(col("tk"), col("p") + 1).as("wa"),
        element_at(col("tk"), col("p") + col("d") + 1).as("wb"))
    val dir = raw.select(col("wa").as("center"), col("wb").as("context"))
      .unionAll(raw.select(col("wb").as("center"), col("wa").as("context")))
    val pp = dir
      .join(broadcast(vocab.select(col("w").as("center"))), "center")
      .join(broadcast(vocab.select(col("w").as("context"))), "context")
      .groupBy("center", "context").agg(count(lit(1)).as("n_pos"))
    val withR = pp
      .select(col("center"), col("context"), col("n_pos"),
        explode(sequence(lit(1), lit(negatives))).as("j"))
      .crossJoin(broadcast(tot))
      .withColumn("r", pmod(graft.expr.PortableHash.hex15Col(
        // separators must stay U+0001 to match the oracle's chr(1); use
        // the visible escape so a formatter can't silently strip the byte
        concat(col("center"), lit("\u0001"), col("context"),
          lit("\u0001"), col("j").cast("string"))), col("total")))
      .withColumn("w0", greatest(expr("total div 4096"), lit(1L)))
      .withColumn("seg", expr("r div w0"))
    val spans = vr.crossJoin(broadcast(tot))
      .withColumn("w0", greatest(expr("total div 4096"), lit(1L)))
      .select(col("w").as("neg"), col("lo"), col("cnt"),
        explode(sequence(expr("lo div w0"),
          expr("(lo + cnt - 1) div w0"))).as("seg"))
    withR.join(spans, Seq("seg"))
      .filter(col("r") >= col("lo") && col("r") < col("lo") + col("cnt"))
      .select(col("center"), col("context"), col("n_pos"), col("j"),
        col("neg"))
  }

  def gloveCooccurrence(docs: DataFrame, textCol: Column, window: Int,
      minCount: Long = 1L): DataFrame = {
    require(window >= 1 && window <= 16, "gloveCooccurrence: window in [1, 16]")
    require(minCount >= 1, "gloveCooccurrence: minCount >= 1")
    val lcm = (1 to window).foldLeft(1L)((a, b) =>
      a / BigInt(a).gcd(BigInt(b)).toLong * b)
    val toks = docs.select(
      array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
    toks
      .select(col("tk"), explode(sequence(lit(0), size(col("tk")) - 1))
        .as("p"))
      .filter(size(col("tk")) - col("p") >= 2)
      .select(col("tk"), col("p"),
        explode(sequence(lit(1),
          least(lit(window), size(col("tk")) - col("p") - 1))).as("d"))
      .select(
        element_at(col("tk"), col("p") + 1).as("wa"),
        element_at(col("tk"), col("p") + col("d") + 1).as("wb"),
        (lit(lcm) / col("d")).cast("long").as("wt"))
      .select(least(col("wa"), col("wb")).as("w1"),
        greatest(col("wa"), col("wb")).as("w2"), col("wt"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_pair"), sum("wt").as("__w"))
      .filter(col("n_pair") >= minCount)
      .select(col("w1"), col("w2"), col("n_pair"),
        round(col("__w") / lit(lcm.toDouble), 4).as("x"))
  }

  /**
   * Collocation extraction by pointwise mutual information: the top-`topN`
   * adjacent token pairs by `PMI = ln( P(a,b) / (P(a)·P(b)) )` with
   * `P(a,b) = c(a,b)/B` over bigram occurrences and `P(a) = c(a)/T` over
   * token occurrences — the corpus-phrase detector (Church & Hanks; the
   * "New York" / "San Francisco" finder) a tokenizer or quality audit
   * reads. Pairs below `minCount` occurrences are dropped FIRST: PMI is
   * maximal for count-1 hapax pairs, so an unthresholded top list is all
   * noise. Returns `(a, b, n_pair, pmi)` (pmi at 4dp), ordered by
   * `(pmi desc, a, b)` — the rounded value orders, keeping the list
   * engine-stable.
   *
   * Scale shape: token and bigram counts reduce under partial
   * aggregation (vocabulary- and pair-vocabulary-bounded); the minCount
   * prune happens BEFORE the two unigram joins, so joined cardinality is
   * the surviving-pair table, not the corpus; totals broadcast as one
   * row; the final list is a TakeOrderedAndProject top-k. */
  def collocations(df: DataFrame, textCol: Column, minCount: Long = 5L,
      topN: Int = 100): DataFrame = {
    require(minCount >= 1 && topN >= 1, "need minCount >= 1 and topN >= 1")
    val toks = df.select(
      array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val pairs = toks.filter(size(col("tk")) >= 2)
      .select(explode(zip_with(col("tk"),
        slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .filter(col("p.b").isNotNull)
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pairCounts = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val totals = uni.agg(sum("cu").as("t_tok"))
      .crossJoin(pairs.agg(count(lit(1)).as("t_pair")))
    pairCounts
      .join(uni.select(col("w").as("a"), col("cu").as("ca")), "a")
      .join(uni.select(col("w").as("b"), col("cu").as("cb")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_pair"),
        round(log((col("n_pair").cast("double") / col("t_pair")) /
          ((col("ca").cast("double") / col("t_tok")) *
           (col("cb").cast("double") / col("t_tok")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(topN)
  }

  /**
   * Cluster topic summaries — the "corpus map": for each embedding
   * cluster ([[graft.ops.Ivf.assignClusters]] output or any `(id,
   * cluster)` frame), the top-`k` terms by cluster-level tf-idf
   * (`tf(term, cluster) · ln((K+1)/(df+1))` with `df` = number of
   * clusters containing the term — [[tfidfKeywords]]' smoothing lifted
   * from documents to clusters). What a human reads to label IVF cells
   * after an index build or a SemDeDup pass. Returns `(cluster, rnk,
   * term, score)` (4dp; ties → term ascending).
   *
   * Scale shape: one explode + partial-agg to the (cluster × term)
   * count table; `df` and the totals are term-vocabulary-bounded; the
   * per-cluster top-k is the [[tfidfKeywords]] bounded sort-slice —
   * per-cluster vocabulary, never corpus rows. */
  def clusterTopics(docs: DataFrame, idCol: Column, textCol: Column,
      assign: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val terms = docs.select(idCol.cast("long").as("id"),
        explode(array_remove(split(trim(textCol), "\\s+"), "")).as("term"))
      .join(assign.select(col("id").cast("long").as("id"),
        col("cluster").cast("int").as("cluster")), "id")
    val ct = terms.groupBy("cluster", "term").agg(count(lit(1)).as("tf"))
    val nClusters = ct.select("cluster").distinct().count()
    val dfT = ct.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = ct.join(dfT, "term")
      .select(col("cluster"), col("term"),
        round(col("tf") * log((lit(nClusters) + 1).cast("double") /
          (col("df") + 1)), 4).as("s"))
    scored.groupBy("cluster")
      .agg(slice(array_sort(collect_list(struct((-col("s")).as("ns"),
        col("term").as("term")))), 1, k).as("top"))
      .select(col("cluster"), posexplode(col("top")))
      .select(col("cluster"), (col("pos") + 1).as("rnk"),
        col("col.term").as("term"), (-col("col.ns")).as("score"))
  }

  /**
   * Language confusion matrix — [[langId]] predictions against the
   * corpus's declared labels: `(declared, pred, n, frac)` with `frac`
   * the share of the declared language routed to each prediction (rows
   * of the matrix sum to 1). The [[langIdCalibration]] agreement-rate
   * buckets say WHETHER the classifier errs; this says WHERE (which
   * languages absorb the mistakes — the routing-table diagnostic).
   *
   * Scale shape: one row-local classify + one partial-agg count to a
   * languages²-bounded table; the share join is language-bounded. */
  def langConfusion(df: DataFrame, declaredCol: Column,
      textCol: Column): DataFrame = {
    val counts = df
      .select(declaredCol.cast("string").as("declared"),
        langId(textCol).as("pred"))
      .groupBy("declared", "pred").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("declared").agg(sum("n").as("nd"))
    counts.join(totals, "declared")
      .select(col("declared"), col("pred"), col("n"),
        round(col("n").cast("double") / col("nd"), 4).as("frac"))
  }

  /**
   * Distinct-n diversity — the corpus-level lexical-diversity metric
   * generation pipelines track (Li et al.'s distinct-1/2: distinct
   * n-grams over total n-gram occurrences; a synthetic corpus collapsing
   * to template loops shows it immediately where per-doc repetition
   * signals average it away). One row per `n`: `(n, total_grams,
   * distinct_grams, distinct_ratio)` (4dp), ordered by n.
   *
   * Scale shape: one pass per n — grams hash row-locally
   * ([[graft.expr.PortableHash]] md5, so the DuckDB oracle counts the
   * same sets), totals and exact distinct counts reduce under partial
   * aggregation; only (hash) longs shuffle, text never moves. */
  def distinctN(df: DataFrame, textCol: Column,
      ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "need ns all >= 1")
    val toks = df.select(
      array_remove(split(trim(textCol), "\\s+"), "").as("tk"))
    ns.map { n =>
      val grams = when(size(col("tk")) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(col("tk")) - n),
          i => concat_ws(" ", slice(col("tk"), i + 1, lit(n)))))
      toks.select(explode(grams).as("g"))
        .select(graft.expr.PortableHash.hex15Col(col("g")).as("h"))
        .agg(count(lit(1)).as("total_grams"),
          count_distinct(col("h")).as("distinct_grams"))
        .select(lit(n.toLong).as("n"), col("total_grams"),
          col("distinct_grams"),
          when(col("total_grams") === 0, lit(0.0))
            .otherwise(round(col("distinct_grams").cast("double") /
              col("total_grams"), 4)).as("distinct_ratio"))
    }.reduce(_ unionByName _).orderBy("n")
  }

  /**
   * URL canonicalization — the crawl-frontier dedup key: strips the
   * fragment, tracking parameters (`utm_*`, `fbclid`, `gclid`), the
   * `www.` host prefix, scheme-default ports (`:80` http / `:443`
   * https), and any trailing slash, then collapses the query-string
   * debris the removals leave behind (`?&`, dangling `?`/`&`). A pure
   * `regexp_replace` chain — whole-stage codegen, streaming-safe.
   * Case is preserved (hosts in crawl data are lowercased at fetch
   * time; paths are case-significant). */
  def urlCanonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "")
    val tidy = regexp_replace(regexp_replace(noTrack, "\\?&", "?"),
      "[?&]$", "")
    val noPort = regexp_replace(regexp_replace(tidy,
      "^(http://[^/:]+):80(/|$)", "$1$2"),
      "^(https://[^/:]+):443(/|$)", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    regexp_replace(noWww, "/$", "")
  }

  /** Structural (markdown-heading) section split — the chunker that
    * respects document structure where fixed-size chunking
    * ([[graft.expr.Chunker]]) cuts mid-thought: each `#`-heading opens a
    * section holding the lines up to the next heading; text before the
    * first heading becomes a heading-less preamble section. Returns one
    * row per section, `(id, sec_idx, heading, body)`, 1-based index in
    * document order. Row-local array arithmetic + one explode. */
  /** Sentence segmentation — the unit boundary below [[sectionSplit]]'s
    * headings and above tokens: terminal-punctuation runs close a
    * sentence ("`[^.!?]+[.!?]*`" — RE2-safe in both engines, no
    * lookbehind), trailing unterminated text forms the last one, and
    * segments blank after trim drop. The prep step for sentence-level
    * dedup ([[graft.ops.Dedup.lineDedup]] over the exploded rows) and
    * sentence-unit ICT. Row-local `regexp_extract_all` + one explode;
    * no shuffle. Output: `(id, sent_idx, sentence)` (0-based,
    * trimmed). */
  def sentenceSplit(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val sents = filter(
      transform(regexp_extract_all(textCol, lit("[^.!?]+[.!?]*"), lit(0)),
        s => trim(s)),
      s => s =!= "")
    df.select(idCol.cast("long").as("id"), posexplode(sents))
      .select(col("id"), col("pos").cast("long").as("sent_idx"),
        col("col").as("sentence"))
  }

  def sectionSplit(df: DataFrame, idCol: Column, mdCol: Column): DataFrame = {
    val lines = split(mdCol, "\n")
    val hIdx = filter(sequence(lit(0), size(col("_ls")) - 1),
      i => element_at(col("_ls"), i + 1).rlike("^#{1,6} "))
    val starts = when(size(col("_h")) === 0 ||
        try_element_at(col("_h"), lit(1)) =!= 0,
      concat(array(lit(-1)), col("_h"))).otherwise(col("_h"))
    val secs = transform(sequence(lit(1), size(col("_st"))), k => {
      val s = element_at(col("_st"), k)
      val e = coalesce(try_element_at(col("_st"), k + 1), size(col("_ls")))
      struct(k.cast("long").as("sec_idx"),
        when(s === -1, lit("")).otherwise(element_at(col("_ls"), s + 1))
          .as("heading"),
        concat_ws("\n", slice(col("_ls"), s + 2,
          greatest(lit(0), e - s - 1))).as("body"))
    })
    df.select(idCol.cast("long").as("id"), lines.as("_ls"))
      .select(col("id"), col("_ls"), hIdx.as("_h"))
      .select(col("id"), col("_ls"), starts.as("_st"))
      .select(col("id"), explode(secs).as("_s"))
      .select(col("id"), col("_s.sec_idx").as("sec_idx"),
        col("_s.heading").as("heading"), col("_s.body").as("body"))
      .filter(col("heading") =!= "" || col("body") =!= "")
  }

  /** Hyperlink extraction — the web-graph construction step: every
    * `<a href="…">anchor</a>` in an HTML column becomes one
    * `(src_id, href, anchor)` row (href unquoted verbatim; anchor with
    * inner tags stripped and whitespace collapsed). Pipe the hrefs
    * through [[urlCanonicalize]] and the pairs into
    * [[graft.ops.Graph.pageRank]] and the crawl's link graph is three
    * composed operators. Row-local regexp over each document + one
    * explode — no shuffle until the caller aggregates. */
  def extractLinks(df: DataFrame, idCol: Column, htmlCol: Column): DataFrame = {
    val tags = regexp_extract_all(htmlCol,
      lit("(?is)<a\\s[^>]*href\\s*=\\s*\"[^\"]*\"[^>]*>.*?</a>"), lit(0))
    df.select(idCol.cast("long").as("src_id"), explode(tags).as("_tag"))
      .select(col("src_id"),
        regexp_extract(col("_tag"), "(?is)href\\s*=\\s*\"([^\"]*)\"", 1)
          .as("href"),
        trim(regexp_replace(regexp_replace(regexp_replace(col("_tag"),
          "(?is)^<a[^>]*>|</a>$", ""), "(?s)<[^>]*>", " "), "\\s+", " "))
          .as("anchor"))
  }

  /** Canonical-URL dedup ([[urlCanonicalize]] → the
    * [[graft.ops.Dedup.exactDuplicates]] shape): every canonical form
    * fetched more than once, with its fetch count and the smallest id as
    * the keeper. One partial-agg pass on the canonical key. */
  def urlDedup(df: DataFrame, idCol: Column, urlCol: Column): DataFrame =
    df.select(idCol.cast("long").as("id"),
        urlCanonicalize(urlCol).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n"), min("id").as("keep"))
      .filter(col("n") > 1)

  /**
   * Flesch reading-ease scoring — the classic readability gate
   * (206.835 − 1.015·words/sentences − 84.6·syllables/words), with the
   * standard cheap proxies: sentences = terminal-punctuation runs
   * (min 1), syllables = vowel-group runs (`[aeiouy]+`, case-folded by
   * the regex). Row-local `regexp_count` arithmetic — codegen,
   * streaming-safe. Empty docs score null. */
  def fleschReadability(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val words = size(array_remove(split(trim(textCol), "\\s+"), ""))
    val sentences = greatest(regexp_count(textCol, lit("[.!?]+")), lit(1))
    val syllables = regexp_count(textCol, lit("(?i)[aeiouy]+"))
    df.select(idCol.cast("long").as("id"),
        words.cast("long").as("words"),
        sentences.cast("long").as("sentences"),
        syllables.cast("long").as("syllables"),
        when(words === 0, lit(null).cast("double"))
          .otherwise(round(lit(206.835)
            - lit(1.015) * words / sentences
            - lit(84.6) * syllables / words, 4)).as("flesch"))
  }

  /**
   * Conversation assembly for SFT/chat training data: turn rows
   * `(convCol, roleCol, textCol)` become one templated document per
   * conversation — `<|role|> text` lines in `(orderCol, idCol)` order —
   * with the structural-validity verdict an instruction-tuning pipeline
   * gates on: `valid` = the first turn is `"user"` AND roles strictly
   * alternate (a double-assistant or assistant-led transcript is
   * malformed training data, not just noise).
   * Returns `(conv_id, n_turns, valid, text)`.
   *
   * Scale shape: one shuffle keyed by conversation; each group
   * sort_array-s its own turn list row-locally. Conversations are
   * short by nature (the unit is a dialog, not a corpus) — this is the
   * per-doc-bounded collect_list discipline of the line-dedup family,
   * NOT an unbounded group: cap upstream if a conv key can be hot. */
  def conversationAssemble(df: DataFrame, convCol: Column, roleCol: Column,
      textCol: Column, orderCol: Column, idCol: Column): DataFrame = {
    val rows = df.select(convCol.as("conv_id"),
      struct(orderCol.as("o"), idCol.as("i"), roleCol.cast("string").as("r"),
        textCol.cast("string").as("t")).as("turn"))
    val n = size(col("turns"))
    val adj = zip_with(slice(col("turns"), lit(1), n - 1),
      slice(col("turns"), lit(2), n - 1),
      (a, b) => a.getField("r") =!= b.getField("r"))
    rows.groupBy("conv_id")
      .agg(sort_array(collect_list(col("turn"))).as("turns"))
      .select(col("conv_id"), n.cast("long").as("n_turns"),
        (element_at(col("turns"), 1).getField("r") === "user" &&
          forall(adj, x => x)).as("valid"),
        concat_ws("\n", transform(col("turns"),
          t => concat(lit("<|"), t.getField("r"), lit("|> "),
            t.getField("t")))).as("text"))
  }
}
