package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM (SentencePiece-style) tokenizer: train a piece vocabulary
 * from corpus substring statistics, segment words by Viterbi against the
 * broadcast vocab, optionally refine scores with driver-local Viterbi-EM
 * (Kudo 2018's unigram model; the reference has no tokenizer trainer —
 * this is a north-star extension alongside [[Bpe]]).
 *
 * Same scale discipline as [[Bpe]]: ONE distributed pass reduces the
 * corpus to the bounded `(word, count)` table (natural-language vocabs
 * are ~10⁵–10⁶ rows — driver-sized by construction, the reduction every
 * production trainer performs first); candidate counting, selection, EM
 * all run driver-local on that table; inference is a broadcast-vocab
 * `mapPartitions` projection with a per-partition word memo — corpus
 * text never shuffles, no per-iteration Spark jobs.
 *
 * Determinism contract (so a SQL oracle reproduces every bit):
 * all slicing/length semantics are CODE POINTS (the [[codePoints]]
 * primitive — Spark `substr`/`length` and DuckDB `substr` agree on
 * code points; UTF-16 units would diverge on supplementary-plane
 * text); scores are INTEGER milli-nats `floor(1000·ln(cnt/total))` — `floor`,
 * not `round`, because half-up vs half-away rounding differs between
 * engines; Viterbi ties break on (score desc, fewer pieces, lexicographic
 * piece sequence), total order, engine-independent. Single-char pieces
 * are always retained so every corpus word has a segmentation; a word
 * with a character outside the vocab (possible only on non-corpus text)
 * passes through whole as one OOV piece.
 */
object Unigram {

  /** Distributed corpus reduction: `(word, c)` occurrence counts — the
    * bounded table everything else consumes. */
  def wordCounts(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(array_remove(split(trim(textCol), "\\s+"), ""))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))

  /** The ONE slicing primitive every driver-local kernel shares with
    * the distributed [[pieceCounts]] plan: CODE-POINT split. Spark's
    * `length`/`substr` and DuckDB's `substr` both count code points,
    * not UTF-16 units — a supplementary-plane character (emoji) is ONE
    * position. The JVM kernels must slice the same way or the
    * distributed and local paths diverge on non-BMP text (and the
    * `length == 1` singles filter would disagree with
    * `length(col) === 1`). */
  private[graft] def codePoints(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Candidate piece counts over a word-count table: every positional
    * substring of CODE-POINT length 1..maxPieceLen of each word,
    * weighted by the word's corpus count (multiplicity within a word
    * counts each occurrence). Pure driver-local kernel — slices by
    * [[codePoints]], matching the distributed [[pieceCounts]] plan's
    * Spark substr semantics exactly. */
  private[graft] def candidateCounts(words: Seq[(String, Long)],
      maxPieceLen: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words) {
      val cp = codePoints(w)
      for (i <- 0 until cp.length;
           l <- 1 to math.min(maxPieceLen, cp.length - i)) {
        val p = cp.slice(i, i + l).mkString
        m.update(p, m.getOrElse(p, 0L) + c)
      }
    }
    m.toMap
  }

  /** Scoring tail shared by the driver-local [[selectVocab]] kernel and
    * the distributed [[trainPieces]] path — ONE source of truth for the
    * union/total/score semantics: selected = top ∪ singles (dedup),
    * `score_milli = floor(1000·ln(cnt/total))` with `total` summed over
    * the SELECTED vocab, ordered (cnt desc, piece asc). */
  private[graft] def scoreSelected(top: Seq[(String, Long)],
      singles: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    val selected = (top ++ singles).distinct
    val total = selected.map(_._2).sum.toDouble
    selected.map { case (p, c) =>
      (p, c, math.floor(1000.0 * math.log(c / total)).toLong)
    }.sortBy { case (p, c, _) => (-c, p) }
  }

  /** Vocab selection + scoring: top `vocabSize` candidates with
    * `cnt >= minCount` by (cnt desc, piece asc), UNION all single-char
    * pieces (kept regardless of count/cap so segmentation is total over
    * the corpus); scoring per [[scoreSelected]]. */
  private[graft] def selectVocab(cands: Map[String, Long], vocabSize: Int,
      minCount: Long): Seq[(String, Long, Long)] = {
    val top = cands.toSeq.filter(_._2 >= minCount)
      .sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    // singles = CODE-POINT length 1 (matches trainPieces's
    // `length(col("piece")) === 1` — Spark length counts code points)
    scoreSelected(top, cands.toSeq.filter(p => cpLen(p._1) == 1))
  }

  /** Distributed candidate piece counts: every positional substring of
    * length 1..maxPieceLen of each distinct word, weighted by the word's
    * corpus count — the [[candidateCounts]] kernel as a Spark plan
    * (double explode over the word-count table + one grouped sum), so
    * web-scale noise vocabularies (URLs, hashes) never reach the
    * driver. */
  def pieceCounts(df: DataFrame, textCol: Column,
      maxPieceLen: Int): DataFrame =
    wordCounts(df, textCol)
      .select(col("word"), col("c"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("c"),
        col("word"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("i"))))
          .as("l"))
      .select(col("word").substr(col("i") + 1, col("l")).as("piece"),
        col("c"))
      .groupBy("piece").agg(sum("c").as("cnt"))

  /** Train the piece table: selection runs DISTRIBUTED — `minCount` and
    * the top-`vocabSize` cap apply inside the [[pieceCounts]] plan
    * (filter + TakeOrderedAndProject), so only the selected vocab plus
    * the single-char pieces ever reach the driver. `maxSingles` bounds
    * the single-char collect (distinct codepoints — a corpus exceeding
    * it is binary noise, not text; raise the knob deliberately).
    * Returns `(piece, cnt, score_milli)`. */
  def trainPieces(df: DataFrame, textCol: Column, vocabSize: Int = 200,
      maxPieceLen: Int = 4, minCount: Long = 2,
      maxSingles: Int = 65536): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1, "need vocabSize/maxPieceLen >= 1")
    require(maxSingles >= 1, "trainPieces: maxSingles >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val pc = pieceCounts(df, textCol, maxPieceLen)
      .localCheckpoint(eager = true) // read twice: top + singles
    val top = pc.filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val singles = pc.filter(length(col("piece")) === 1)
      .limit(maxSingles + 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(singles.size <= maxSingles,
      s"trainPieces: > $maxSingles distinct single-char pieces — the " +
        "corpus looks like binary noise, not text; raise maxSingles to " +
        "proceed deliberately")
    scoreSelected(top, singles).toDF("piece", "cnt", "score_milli")
  }

  /** Viterbi-best segmentation of one word against an integer-scored
    * vocab: maximize Σ score, ties → fewer pieces → lexicographically
    * smallest piece sequence (space-joined; ASCII space sorts below all
    * word characters, so string order equals sequence order). Returns
    * `(seg, nPieces)`; a word whose characters leave no path passes
    * through whole as one OOV piece. Pure driver/executor-local kernel —
    * O(len × maxPieceLen) states, exactly the DP the all-paths SQL
    * oracle enumerates. */
  private[graft] def viterbi(word: String, vocab: Map[String, Long],
      maxPieceLen: Int): (String, Int) = {
    // DP positions are CODE-POINT boundaries and `maxPieceLen` counts
    // code points — the [[codePoints]] contract: vocab pieces are
    // code-point slices, so UTF-16 surrogate halves are never probed
    // and a 1-piece emoji is reachable at l = 1
    val cp = codePoints(word)
    val n = cp.length
    if (n == 0) return ("", 0)
    // best(j) = (score, nPieces, seg) over segmentations of word[0,j)
    val best = new Array[(Long, Int, String)](n + 1)
    best(0) = (0L, 0, "")
    var j = 1
    while (j <= n) {
      var cand: (Long, Int, String) = null
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        val prev = best(j - l)
        if (prev != null) {
          val piece = cp.slice(j - l, j).mkString
          vocab.get(piece) match {
            case Some(s) =>
              val seg = if (prev._3.isEmpty) piece else prev._3 + " " + piece
              val c = (prev._1 + s, prev._2 + 1, seg)
              if (cand == null || c._1 > cand._1 ||
                  (c._1 == cand._1 && (c._2 < cand._2 ||
                    (c._2 == cand._2 && c._3 < cand._3)))) cand = c
            case None =>
          }
        }
        l += 1
      }
      best(j) = cand // null when no piece reaches j
      j += 1
    }
    if (best(n) == null) (word, 1) else (best(n)._3, best(n)._2)
  }

  /** Segment a corpus against a trained piece table: vocab broadcasts
    * once (bounded by `vocabSize`), each partition memoizes per-word
    * segmentations (Zipf: few distinct words dominate), rows never
    * shuffle. Returns `(id, n_words, n_pieces, fertility, seg)` — `seg`
    * is the piece stream, words joined by " / " so word boundaries
    * survive; fertility (pieces per word, the tokenizer-quality metric)
    * rounds to 4dp via Spark's `round` (half-up — DuckDB-`round`
    * parity; `math.rint`'s half-to-even differs at exact .5 ties). */
  def segment(df: DataFrame, idCol: Column, textCol: Column,
      pieces: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = pieces.select(col("piece").cast("string"),
        col("score_milli").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val bc = spark.sparkContext.broadcast(vocab)
    df.select(idCol.cast("long").as("id"), textCol.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val v = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, (String, Int)]
        rows.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.split("\\s+").filter(_.nonEmpty)
          var nPieces = 0L
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < words.length) {
            val (seg, np) = memo.getOrElseUpdate(words(i),
              viterbi(words(i), v, maxPieceLen))
            if (i > 0) sb.append(" / ")
            sb.append(seg)
            nPieces += np
            i += 1
          }
          (id, words.length.toLong, nPieces, sb.toString)
        }
      }
      .toDF("id", "n_words", "n_pieces", "seg")
      .select(col("id"), col("n_words"), col("n_pieces"),
        when(col("n_words") === 0, 0.0)
          .otherwise(round(col("n_pieces") / col("n_words"), 4))
          .as("fertility"),
        col("seg"))
  }

  /** Driver-local Viterbi-EM refinement (the loop SentencePiece runs
    * after seeding): E-step re-segments every distinct word with current
    * REAL-valued scores and accumulates piece counts weighted by word
    * frequency; M-step re-normalizes `ln(cnt/total)`; pieces that win no
    * segmentation are pruned (single chars always survive). Returns the
    * refined integer-quantized vocab plus the corpus log-likelihood
    * trace — non-decreasing by EM's guarantee on the Viterbi objective,
    * which the spec asserts. Everything here is in-memory on the bounded
    * word-count table; no Spark jobs per iteration. */
  private[graft] def emRefine(words: Seq[(String, Long)],
      vocab0: Seq[(String, Long, Long)], maxPieceLen: Int, iters: Int)
      : (Seq[(String, Long, Long)], Seq[Double]) = {
    // real-valued scores for EM; quantize only on exit
    var scores: Map[String, Double] = {
      val total = vocab0.map(_._2).sum.toDouble
      vocab0.map { case (p, c, _) => p -> math.log(c / total) }.toMap
    }
    val singles = vocab0.map(_._1).filter(cpLen(_) == 1).toSet
    val ll = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      // E: Viterbi counts under current scores (milli-quantized for the
      // shared DP kernel; monotone transform preserves the argmax order)
      val q = scores.map { case (p, s) => p -> math.floor(1000.0 * s).toLong }
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var logLik = 0.0
      for ((w, c) <- words) {
        val (seg, _) = viterbi(w, q, maxPieceLen)
        var wll = 0.0
        for (p <- seg.split(" ") if p.nonEmpty) {
          counts.update(p, counts.getOrElse(p, 0L) + c)
          wll += scores.getOrElse(p, math.log(1e-9))
        }
        logLik += c * wll
      }
      ll += logLik
      val kept = counts.toMap ++
        singles.filterNot(counts.contains).map(s => s -> 1L).toMap
      val total = kept.values.sum.toDouble
      scores = kept.map { case (p, c) => p -> math.log(c / total) }
    }
    val totalC = {
      val q = scores.map { case (p, s) => p -> math.floor(1000.0 * s).toLong }
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- words; p <- viterbi(w, q, maxPieceLen)._1.split(" ")
           if p.nonEmpty)
        counts.update(p, counts.getOrElse(p, 0L) + c)
      counts
    }
    val total = totalC.values.sum.toDouble
    val out = totalC.toSeq.map { case (p, c) =>
      (p, c, math.floor(1000.0 * math.log(c / total)).toLong)
    }.sortBy { case (p, c, _) => (-c, p) }
    (out, ll.result())
  }
}
