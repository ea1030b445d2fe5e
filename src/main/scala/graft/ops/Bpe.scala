package graft.ops

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer training (Sennrich et al., "Neural Machine
 * Translation of Rare Words with Subword Units", ACL 2016) — the trainer a
 * pre-training pipeline runs between curation and tokenization.
 *
 * Scale shape: the corpus is scanned ONCE, reducing under map-side partial
 * aggregation to the word-count vocabulary — a |distinct words| frame
 * (vocabulary-bounded, the table FastBPE/HuggingFace trainers also reduce
 * to first). That bounded table is collected and the merge loop runs
 * DRIVER-LOCAL with incrementally-maintained pair counts — the same
 * collect-the-small-model discipline as [[Ivf.trainCentroids]] (k centroid
 * rows) and [[Rerank]]'s greedy trace. Training 30k merges is therefore
 * ONE Spark job plus an in-memory loop, not 30k jobs and a 30k-deep
 * expression tree; the 100 TB corpus is never touched after the scan.
 * `minCount` prunes crawl-noise hapaxes to bound the collect (every real
 * trainer exposes the same knob); the default 1 keeps every word.
 *
 * Applying a trained tokenizer: [[segmentCount]] folds a SMALL merge list
 * into a whole-stage-codegen column expression (zero exchanges); for real
 * merge-table sizes [[segmentCounts]] runs the same fold as a compiled
 * per-partition loop over a broadcast-closure merge table — row-local,
 * streaming-safe, and O(1) plan size regardless of merge count.
 *
 * Engine-portable representation (shared by the column path and the DuckDB
 * oracle): a word's token sequence is a single string `⟂t₁⟂⟂t₂⟂…⟂tₙ⟂`
 * (⟂ = U+0001, outside any printable corpus). Merging pair (a,b) is then
 * literal `replace(tokstr, "⟂a⟂⟂b⟂", "⟂ab⟂")` — both Spark and DuckDB scan
 * left-to-right over non-overlapping matches, which is exactly BPE's merge
 * order within a word ("aaa" with merge (a,a) → "aa","a"); the driver-local
 * loop implements the identical left-to-right walk ([[applyMerge]]). Ties
 * in pair counts break lexicographically (a, then b) in UTF-8 byte order —
 * the comparison UTF8String (Spark) and DuckDB both use, reproduced here
 * byte-for-byte ([[utf8Order]]) so the oracle replays the training run
 * verbatim.
 */
object Bpe {

  /** Token separator: each token is wrapped `⟂tok⟂`, so adjacency shows
    * as `⟂⟂` and a merge pattern can never match across token or word
    * boundaries (tokens never contain U+0001). */
  private val S = "\u0001"

  /** A word as its character token string: "cat" → `⟂c⟂⟂a⟂⟂t⟂` — one
    * regexp pass wrapping every char. */
  private def enc(w: Column): Column =
    regexp_replace(w, "(.)", S + "$1" + S)

  /** Decode a token string back to the token array. */
  private def toks(tokstr: Column): Column =
    split(trim(tokstr, S), S + S)

  /** One merge as a literal replace (see class doc for why this is
    * exactly BPE's within-word left-to-right merge order). */
  private def merge1(t: Column, a: String, b: String): Column =
    replace(t, lit(S + a + S + S + b + S), lit(S + a + b + S))

  /** The word-count vocabulary: one corpus scan, whitespace words,
    * map-side-combined count per distinct word. */
  def wordVocab(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(trim(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** UTF-8 byte order — what Spark's UTF8String.compareTo and DuckDB's
    * string comparison both implement. Java's String.compareTo is UTF-16
    * code-unit order, which disagrees above the BMP, so spell it out. */
  private[ops] val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes(StandardCharsets.UTF_8)
      val b = y.getBytes(StandardCharsets.UTF_8)
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** A word as its base character tokens, one per code point (the same
    * segmentation `enc`'s `(.)` regex produces). */
  private def charToks(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One merge over a token array: left-to-right, non-overlapping — the
    * exact walk `replace` does over the token-string form. */
  private[ops] def applyMerge(tk: Array[String], a: String, b: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](tk.length)
    var i = 0
    while (i < tk.length) {
      if (i + 1 < tk.length && tk(i) == a && tk(i + 1) == b) { out += a + b; i += 2 }
      else { out += tk(i); i += 1 }
    }
    out.toArray
  }

  /** Train `numMerges` BPE merges over the corpus; returns the merge
    * table `(a, b, pairCount)` in learned order. Deterministic in the
    * data: integer counts, ties → UTF-8-lexicographically smallest
    * (a, b). Stops early if the vocabulary runs out of adjacent pairs.
    *
    * One distributed job builds and collects the word-count vocabulary
    * (`minCount` bounds it; see class doc); the merge loop is driver-local
    * with incremental pair-count maintenance — each merge re-touches only
    * the words that actually contain the merged pair. */
  def train(df: DataFrame, textCol: Column, numMerges: Int,
      minCount: Long = 1L): Seq[(String, String, Long)] = {
    val vocab = wordVocab(df, textCol)
      .filter(col("cnt") >= minCount)
      .collect()
      .map(r => (charToks(r.getString(0)), r.getLong(1)))
    trainLocal(vocab, numMerges)
  }

  /** The in-memory merge loop over a collected `(tokens, count)` vocab.
    * Pair counts and a pair→word-index occurrence index are maintained
    * incrementally: merging (a,b) re-counts only the words listed under
    * (a,b), removing their old pair contributions and adding the merged
    * form's — the textbook fast-BPE trainer. Argmax scans the count map
    * (pair-vocabulary-sized) with the UTF-8 tie-break. */
  private def trainLocal(vocab: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String, Long)] = {
    val words: Array[Array[String]] = vocab.map(_._1)
    val cnts: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def addWord(wi: Int, sign: Long): Unit = {
      val tk = words(wi)
      var i = 0
      while (i + 1 < tk.length) {
        val p = (tk(i), tk(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * cnts(wi)
        if (c == 0L) counts.remove(p) else counts.update(p, c)
        if (sign > 0) where.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }

    var wi = 0
    while (wi < words.length) { addWord(wi, 1L); wi += 1 }

    val merges = Seq.newBuilder[(String, String, Long)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      if (counts.isEmpty) exhausted = true
      else {
        // max count; ties → UTF-8-smallest (a, b)
        var best: ((String, String), Long) = null
        val it = counts.iterator
        while (it.hasNext) {
          val e = it.next()
          if (best == null || e._2 > best._2 ||
              (e._2 == best._2 && {
                val ca = utf8Order.compare(e._1._1, best._1._1)
                ca < 0 || (ca == 0 && utf8Order.compare(e._1._2, best._1._2) < 0)
              })) best = e
        }
        val (a, b) = best._1
        merges += ((a, b, best._2))
        val touched = where.getOrElse((a, b), mutable.BitSet.empty)
        for (w <- touched) {
          addWord(w, -1L) // retract old pair contributions (occurrence index stays; stale entries are harmless — addWord(+) re-adds live ones)
          words(w) = applyMerge(words(w), a, b)
          addWord(w, 1L)
        }
        where.remove((a, b))
      }
      m += 1
    }
    merges.result()
  }

  /** Tokenizer inference as a COLUMN for small, literal merge lists —
    * per-document subword count, each merge folded into the expression
    * (whole-stage codegen, zero exchanges). Plan size grows with the
    * merge count: for trained-tokenizer tables use [[segmentCounts]]. */
  def segmentCount(textCol: Column, merges: Seq[(String, String)]): Column = {
    val words = filter(split(trim(textCol), "\\s+"), w => w =!= "")
    val perWord = transform(words, w =>
      size(toks(merges.foldLeft(enc(w)) {
        case (acc, (a, b)) => merge1(acc, a, b)
      })).cast("long"))
    aggregate(perWord, lit(0L), (acc, x) => acc + x)
  }

  /** Tokenizer inference for REAL merge tables (30k+ merges): per-document
    * subword counts via a compiled per-partition loop. The merge table
    * ships once per executor in the task closure; each word folds the
    * merges in learned order (identical semantics to [[segmentCount]]),
    * with a token-set guard that skips merges whose operands aren't
    * present — the common case once a word stops changing. Row-local and
    * stateless: O(1) plan size, zero exchanges, streaming-safe.
    *
    * Returns `(id, n_sub)`, one row per input row. */
  def segmentCounts(df: DataFrame, idCol: Column, textCol: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeArr = merges.toArray
    df.select(idCol.cast("long").as("id"), textCol.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          var total = 0L
          if (text != null) {
            val words = text.trim.split("\\s+")
            var w = 0
            while (w < words.length) {
              if (words(w).nonEmpty) {
                var tk = charToks(words(w))
                val present = mutable.HashSet.empty[String]
                tk.foreach(present += _)
                var i = 0
                while (i < mergeArr.length) {
                  val (a, b) = mergeArr(i)
                  if (present.contains(a) && present.contains(b)) {
                    val merged = applyMerge(tk, a, b)
                    if (merged.length != tk.length) {
                      tk = merged
                      present.clear()
                      tk.foreach(present += _)
                    }
                  }
                  i += 1
                }
                total += tk.length
              }
              w += 1
            }
          }
          (id, total)
        }
      }
      .toDF("id", "n_sub")
  }
}
