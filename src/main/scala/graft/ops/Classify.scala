package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Trainable text classification for training-data curation (north-star
 * extension): a multinomial Naive Bayes over whitespace tokens — the
 * fastText-shaped "train a cheap linear model on the corpus, score every
 * document row-locally" pipeline component (quality gates, language
 * routing, domain tagging). Deliberately classical: NB training is pure
 * counting, so the whole fit is two partial-agg-friendly aggregations,
 * and the fitted model is vocabulary-bounded — the same
 * collect-the-bounded-table discipline as [[Ivf.trainCentroids]] (k
 * centroids) and [[Bpe.train]] (the word vocab).
 *
 * Scale shapes: training shuffles only `(label, term, count)` rows with
 * map-side combine — document text never leaves its scan stage. Scoring
 * is a compiled per-partition projection over a broadcast model map —
 * zero exchanges, O(tokens × labels) hash lookups per document, never an
 * interpreted HOF walk (higher-order functions are CodegenFallback; a
 * vocab lookup inside one would scan the vocab array per token). For
 * vocabularies beyond driver memory the broadcast-join variant of
 * [[QualitySignals.bigramLmScore]] is the same recipe; a fitted text
 * model at fastText scale (millions of terms) fits comfortably.
 */
object Classify {

  /** Fitted multinomial NB: `labels` sorted ascending (the tie-break
    * order), per-label log priors `ln(docs_l / docs)`, per-label
    * unknown-token log-prob `ln(1 / (n_l + V))`, and per-term per-label
    * smoothed log-probs `ln((c(t,l) + 1) / (n_l + V))` aligned to
    * `labels`. */
  case class NbModel(labels: Array[String], logPrior: Array[Double],
      logUnk: Array[Double], termLogp: Map[String, Array[Double]]) {
    require(labels.length == logPrior.length && labels.length == logUnk.length)
  }

  /** The trained model TABLE `(label, term, logp)` — add-one-smoothed
    * `ln((c(term,label) + 1) / (n_label + V))`, `V` = corpus-wide distinct
    * term count, rounded 4dp for engine-reproducible dumps. Two
    * aggregations over `(label, term)` pairs (both reduce under partial
    * aggregation) plus two broadcast scalars; the result is
    * vocabulary-bounded. */
  def nbTrain(df: DataFrame, labelCol: Column, textCol: Column): DataFrame = {
    val counts = termCounts(df, labelCol, textCol)
    val totals = counts.groupBy("label").agg(sum("c").as("n_l"))
    val vocab = counts.agg(count_distinct(col("term")).as("v"))
    counts
      .join(broadcast(totals), "label")
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("term"),
        round(log((col("c") + 1).cast("double") / (col("n_l") + col("v"))), 4)
          .as("logp"))
  }

  /** Fit and COLLECT the bounded model (|V|·|L| log-probs + |L| priors).
    * Documents with no tokens still count toward the priors — they are
    * real corpus members a scorer must still label. Rows with a NULL
    * label are unlabeled and contribute nothing to the fit (they would
    * otherwise become a phantom "null" class). */
  def nbFit(df: DataFrame, labelCol: Column, textCol: Column): NbModel = {
    val counts = termCounts(df, labelCol, textCol).persist()
    try {
      val totals = counts.groupBy("label").agg(sum("c").as("n_l"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val vocabSize = counts.agg(count_distinct(col("term"))).head().getLong(0)
      val docCounts = df.filter(labelCol.isNotNull)
        .groupBy(labelCol.cast("string").as("label"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(docCounts.nonEmpty, "no labeled rows to fit on")
      val labels = docCounts.keySet.toArray.sorted
      val nDocs = docCounts.values.sum.toDouble
      val idx = labels.zipWithIndex.toMap
      // labels seen only in docs with zero tokens have n_l = 0; smoothing
      // still defines their distribution (uniform 1/V)
      val nl = labels.map(l => totals.getOrElse(l, 0L).toDouble)
      val logPrior = labels.map(l => math.log(docCounts(l) / nDocs))
      val logUnk = labels.indices.map(i => math.log(1.0 / (nl(i) + vocabSize))).toArray
      val termLogp = counts.collect()
        .groupBy(_.getString(1))
        .map { case (term, rows) =>
          val v = logUnk.clone()
          rows.foreach { r =>
            val i = idx(r.getString(0))
            v(i) = math.log((r.getLong(2) + 1.0) / (nl(i) + vocabSize))
          }
          term -> v
        }
      NbModel(labels, logPrior, logUnk, termLogp)
    } finally counts.unpersist()
  }

  /** Score every document against every label and return the argmax:
    * `(id, pred, score)` with `score = logPrior + Σ_tokens logp` rounded
    * 4dp BEFORE the argmax (ties → alphabetically first label), so the
    * decision is engine-reproducible. Token-less documents score on the
    * prior alone. Compiled per-partition projection over the broadcast
    * model — zero exchanges. */
  def nbPredict(df: DataFrame, idCol: Column, textCol: Column,
      model: NbModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(idCol.cast("long").as("id"), textCol.cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val m = bc.value
        val nL = m.labels.length
        rows.map { case (id, text) =>
          val tk =
            if (text == null) Array.empty[String]
            else Dedup.trimSpaces(text).split("\\s+").filter(_.nonEmpty)
          val s = m.logPrior.clone()
          tk.foreach { t =>
            val lp = m.termLogp.getOrElse(t, m.logUnk)
            var i = 0
            while (i < nL) { s(i) += lp(i); i += 1 }
          }
          var best = 0
          var i = 1
          while (i < nL) { // labels sorted: strict > keeps the first max
            if (rnd4(s(i)) > rnd4(s(best))) best = i
            i += 1
          }
          (id, m.labels(best), rnd4(s(best)))
        }
      }
      .toDF("id", "pred", "score")
  }

  /** 4dp half-away-from-zero — the same rounding `round()` applies in
    * both Spark and DuckDB, so the argmax sees identical numbers. */
  private def rnd4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** `(label, term, c)` occurrence counts — the sufficient statistic.
    * NULL-label rows are unlabeled and excluded. */
  private def termCounts(df: DataFrame, labelCol: Column, textCol: Column) =
    df.filter(labelCol.isNotNull)
      .select(labelCol.cast("string").as("label"),
        explode(array_remove(split(trim(textCol), "\\s+"), "")).as("term"))
      .groupBy("label", "term").agg(count(lit(1)).as("c"))

  /** Hashed bag-of-words feature vector (fastText's hashing trick): each
    * token lands in md5-bucket `hex15(tok) % dim`, counts normalized by
    * token count so document length cancels. Row-local, engine-portable
    * ([[graft.expr.PortableHash]]). Empty docs featurize to the zero
    * vector (the bias alone decides them). */
  def hashFeatures(textCol: Column, dim: Int,
      binary: Boolean = false): Column = {
    val toks = array_remove(split(trim(textCol), "\\s+"), "")
    val n = size(toks)
    val bks = transform(toks,
      t => graft.expr.PortableHash.hex15Col(t) % dim)
    transform(sequence(lit(0), lit(dim - 1)), j => {
      val c = size(filter(bks, b => b === j))
      if (binary) when(c > 0, lit(1.0)).otherwise(lit(0.0))
      else when(n === 0, lit(0.0)).otherwise(c.cast("double") / n)
    })
  }

  /**
   * Distributed binary logistic regression over hashed features — the
   * fastText-lite quality/domain classifier NB cannot give you when the
   * decision needs learned feature WEIGHTS (correlated tokens, negative
   * evidence) rather than independent likelihoods. Full-batch gradient
   * descent: each of `iters` rounds is ONE partial-agg corpus pass
   * computing `avg((σ(w·x + b) − y) · x_j)` per dimension (dim+1 groups
   * — bytes on the exchange, never rows), and the driver applies the
   * step. Weights QUANTIZE to 1/2^20 after every step — the
   * [[Ivf.trainCentroids]] trick that makes the trajectory
   * engine-exact, so a SQL oracle replays the entire optimization
   * bit-for-bit. Returns the model as `(j, w)` rows, `j = dim` holding
   * the bias. Deterministic in (data, dim, iters, lr); zero-initialized.
   *
   * 100 TB shape: iterations scan the corpus (or an md5 sample — pass a
   * pre-sampled frame) but shuffle only dim+1 partial sums; the model
   * never exceeds dim+1 doubles. */
  def logisticTrain(df: DataFrame, labelCol: Column, textCol: Column,
      dim: Int = 64, iters: Int = 5, lr: Double = 0.5,
      binary: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(dim >= 1 && iters >= 1 && lr > 0, "need dim/iters >= 1, lr > 0")
    val feats = hashedFeatureRows(df.filter(labelCol.isNotNull),
        Seq("y" -> labelCol.cast("boolean").cast("int").cast("double")),
        textCol, dim, binary)
      .localCheckpoint() // featurize once; the GD passes re-read it
    var w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val wl = typedLit(w.toSeq)
      val z = aggregate(
        zip_with(col("x"), slice(wl, lit(1), lit(dim)), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v) + element_at(wl, dim + 1)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val grads = feats
        .select((p - col("y")).as("e"), col("x"))
        .select(col("e"), posexplode(concat(col("x"), array(lit(1.0)))))
        .groupBy("pos").agg(avg(col("e") * col("col")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wj, j) =>
        math.floor((wj - lr * grads.getOrElse(j, 0.0)) * 1048576.0 + 0.5) /
          1048576.0
      }
    }
    w.zipWithIndex.map { case (wj, j) => (j.toLong, wj) }.toSeq
      .toDF("j", "w")
  }

  /** Throughput featurization for the training sweep: explode tokens →
    * md5-bucket partial-agg counts → dense-vector assembly from each
    * row's ≤dim (bucket, count) map — every stage compiled, one shuffle
    * keyed by row. Produces exactly [[hashFeatures]]'s values (that
    * row-local column stays the zero-shuffle streaming-scoring shape;
    * this one is ~10× faster when the whole corpus featurizes at once,
    * because the per-dimension interpreted `filter` scan is replaced by
    * one compiled aggregation). The row key is minted and the base
    * frame checkpointed so both join branches see the same ids. */
  private def hashedFeatureRows(df: DataFrame,
      keys: Seq[(String, Column)], textCol: Column, dim: Int,
      binary: Boolean): DataFrame = {
    val base = df
      .select(keys.map { case (n, c) => c.as(n) } :+
        array_remove(split(trim(textCol), "\\s+"), "").as("_tk"): _*)
      .withColumn("_uid", monotonically_increasing_id())
      .localCheckpoint()
    val maps = base
      .select(col("_uid"), explode(col("_tk")).as("_t"))
      .select(col("_uid"),
        (graft.expr.PortableHash.hex15Col(col("_t")) % dim).cast("int")
          .as("_b"))
      .groupBy("_uid", "_b").agg(count(lit(1)).as("_c"))
      .groupBy("_uid")
      .agg(map_from_entries(collect_list(
        struct(col("_b").as("k"), col("_c").as("v")))).as("_m"))
    val x = transform(sequence(lit(0), lit(dim - 1)), j => {
      val c = element_at(col("_m"), j)
      if (binary) when(c.isNotNull, lit(1.0)).otherwise(lit(0.0))
      else coalesce(c.cast("double") / size(col("_tk")), lit(0.0))
    })
    base.join(maps, Seq("_uid"), "left")
      .select(keys.map { case (n, _) => col(n) } :+ x.as("x"): _*)
  }

  /** Score every document under a [[logisticTrain]] model frame:
    * `(id, p, pred)` with `p = σ(w·x + b)` rounded 4dp. The dot product
    * folds dimensions in ascending-j order (bit-identical across
    * engines); the model rides a literal-sized collect + broadcast
    * lit — scoring is a row-local projection, zero joins. */
  def logisticPredict(df: DataFrame, idCol: Column, textCol: Column,
      model: DataFrame, binary: Boolean = false): DataFrame = {
    val wRows = model.select(col("j").cast("int"), col("w").cast("double"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    val dim = wRows.length - 1
    val wl = typedLit(wRows.map(_._2).toSeq)
    val x = hashFeatures(textCol, dim, binary)
    val z = aggregate(
      zip_with(x, slice(wl, lit(1), lit(dim)), (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v) + element_at(wl, dim + 1)
    val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
    // p materializes as a named column FIRST so the featurize+dot chain
    // evaluates once; deriving pred in the same projection would
    // instantiate the whole expression tree twice
    df.select(idCol.cast("long").as("id"), p.as("p"))
      .select(col("id"), col("p"), (col("p") >= 0.5).as("pred"))
  }

  /** Bulk-scoring twin of [[logisticPredict]]: identical output, but
    * featurized through the compiled explode-and-aggregate path
    * ([[hashedFeatureRows]]) instead of the row-local interpreted HOF —
    * one extra shuffle keyed by id buys an order of magnitude on a
    * whole-corpus scoring sweep. Use [[logisticPredict]] where the
    * zero-exchange shape matters (streams, gates). */
  def logisticPredictBulk(df: DataFrame, idCol: Column, textCol: Column,
      model: DataFrame, binary: Boolean = false): DataFrame = {
    val wRows = model.select(col("j").cast("int"), col("w").cast("double"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    val dim = wRows.length - 1
    val wl = typedLit(wRows.map(_._2).toSeq)
    val feats = hashedFeatureRows(df, Seq("id" -> idCol.cast("long")),
      textCol, dim, binary)
    val z = aggregate(
      zip_with(col("x"), slice(wl, lit(1), lit(dim)), (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v) + element_at(wl, dim + 1)
    val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
    feats.select(col("id"), p.as("p"))
      .select(col("id"), col("p"), (col("p") >= 0.5).as("pred"))
  }

  /** Isotonic (PAV) score calibration — the distribution-free
    * monotone fit that turns a ranking score into a probability
    * (Zadrozny & Elkan, KDD'02; the classic alternative to Platt
    * scaling). Input rows carry a pre-binned score (`binCol`, the
    * caller picks the binning — round, floor-divide, quantile id) and
    * a 0/1 label; output one row per bin
    * `(bin, n, pos, rate, calibrated)` where `calibrated` is the
    * isotonic-regression fit of the empirical rate, non-decreasing in
    * `bin` (4dp).
    *
    * Scale shape — the segment-merge PAV: ONE grouped partial-agg pass
    * collapses the corpus to the bin table `(bin, n, pos)`; local
    * pool-adjacent-violators runs per range-partition over the
    * bin-sorted table (each task emits its violation-free BLOCK list);
    * the driver merges the concatenated block lists with the same
    * pooling stack — sound because PAV's pooling is confluent (the fit
    * is the unique L2 projection onto the isotone cone, so pooling in
    * any order converges to it), so pre-pooled per-range blocks only
    * ever need boundary merges. The driver never sees bins, only
    * blocks (≤ bins, typically far fewer); the corpus never shuffles
    * beyond the one bin aggregation. Block means are exact integer
    * ratios (`Σpos/Σn`), so an oracle computing the min-max formula
    * `ŷ_k = max_{i≤k} min_{j≥k} avg(i..j)` reproduces them bit-for-bit
    * at 4dp. */
  def isotonicCalibrate(df: DataFrame, binCol: Column,
      labelCol: Column): DataFrame = {
    val spark = df.sparkSession
    val binned = df.select(binCol.cast("long").as("bin"),
        labelCol.cast("long").as("y"))
      .filter(col("bin").isNotNull && col("y").isNotNull)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .localCheckpoint(eager = true) // read twice: PAV pass + final join
    def pav(rows: Iterator[(Long, Long, Long, Long)])
        : Seq[(Long, Long, Long, Long)] = {
      val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      rows.foreach { case (lo0, hi, p0, n0) =>
        var (lo, p, n) = (lo0, p0, n0)
        while (st.nonEmpty &&
            st.last._3.toDouble / st.last._4 > p.toDouble / n) {
          val t = st.remove(st.size - 1); lo = t._1; p += t._3; n += t._4
        }
        st += ((lo, hi, p, n))
      }
      st.toSeq
    }
    val perRange = binned.repartitionByRange(col("bin"))
      .sortWithinPartitions("bin")
      .select("bin", "n", "pos").rdd
      .mapPartitionsWithIndex { case (pi, it) =>
        val blocks = pav(it.map(r =>
          (r.getLong(0), r.getLong(0), r.getLong(2), r.getLong(1))))
        if (blocks.isEmpty) Iterator.empty else Iterator((pi, blocks))
      }.collect().sortBy(_._1).iterator.flatMap(_._2)
    val merged = pav(perRange)
    import spark.implicits._
    val fit = broadcast(merged.toDF("lo", "hi", "bpos", "bn"))
    binned.join(fit, col("bin").between(col("lo"), col("hi")))
      .select(col("bin"), col("n"), col("pos"),
        round(col("pos").cast("double") / col("n"), 4).as("rate"),
        round(col("bpos").cast("double") / col("bn"), 4).as("calibrated"))
  }

  /** Per-KEY isotonic calibration — [[isotonicCalibrate]] grouped by a
    * segmentation column (per-source / per-model-version calibration,
    * the "calibrate each cohort separately" story): each key's bin
    * table runs the identical PAV stack locally inside one
    * `flatMapGroups` (a key's bins are bounded — `maxBins` guards the
    * assumption), so no cross-key coordination exists at all. Output
    * `(k, bin, n, pos, rate, calibrated)` — the ratio columns UNROUNDED
    * (exact integer ratios; identical doubles format identically in
    * the compare layer).
    *
    * Scale shape: ONE grouped count collapses the corpus to (key, bin)
    * rows; the PAV fold then touches |keys| × |bins| rows inside the
    * same shuffle's tasks. */
  def isotonicCalibrateByKey(df: DataFrame, keyCol: Column,
      binCol: Column, labelCol: Column, maxBins: Int = 100000): DataFrame = {
    require(maxBins >= 1, "isotonicCalibrateByKey: maxBins >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val binned = df.select(keyCol.cast("string").as("k"),
        binCol.cast("long").as("bin"), labelCol.cast("long").as("y"))
      .filter(col("k").isNotNull && col("bin").isNotNull &&
        col("y").isNotNull)
      .groupBy("k", "bin")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .as[(String, Long, Long, Long)]
    binned.groupByKey(_._1).flatMapGroups { (k, it) =>
      val rows = it.toIndexedSeq.sortBy(_._2) // (k, bin, n, pos) by bin
      if (rows.size > maxBins) throw new IllegalStateException(
        s"isotonicCalibrateByKey: > $maxBins bins for key '$k' — bin " +
          "the score coarser or raise maxBins")
      // PAV stack of (loBin, hiBin, pos, n) blocks — the
      // isotonicCalibrate kernel, run per key
      val st = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      rows.foreach { case (_, bin, n0, p0) =>
        var (lo, p, n) = (bin, p0, n0)
        while (st.nonEmpty &&
            st.last._3.toDouble / st.last._4 > p.toDouble / n) {
          val t = st.remove(st.size - 1); lo = t._1; p += t._3; n += t._4
        }
        st += ((lo, bin, p, n))
      }
      rows.iterator.map { case (_, bin, n0, p0) =>
        val blk = st.find(b => bin >= b._1 && bin <= b._2).get
        (k, bin, n0, p0, p0.toDouble / n0, blk._3.toDouble / blk._4)
      }
    }.toDF("k", "bin", "n", "pos", "rate", "calibrated")
  }

  /** Exact ROC AUC of a score against a 0/1 label — the
    * rank-statistic identity `AUC = (R₁ − n₁(n₁+1)/2) / (n₁·n₀)` with
    * midranks on tied scores (ties contribute 1/2, the standard
    * convention), plus the Gini coefficient `2·AUC − 1`. Output ONE row
    * `(n_pos, n_neg, auc, gini)` (4dp).
    *
    * Scale shape (the [[Experiment.mannWhitney]] discipline — AUC IS a
    * normalized U statistic): one grouped pass collapses the corpus to
    * per-VALUE counted rows; midranks come from the range-partitioned
    * weighted prefix sum (no row-level global window, no single-task
    * sort); one final aggregate emits the row. */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val s = df.select(scoreCol.cast("double").as("m"),
        labelCol.cast("long").as("y"))
      .filter(col("m").isNotNull && col("y").isNotNull)
    val perVal = s.groupBy("m")
      .agg(count(lit(1)).as("t"), sum("y").as("n1v"))
    val ranked = Suffix.withWeightedOffset(perVal, Seq(col("m")),
      col("t"), "cb")
    ranked
      .select(col("t"), col("n1v"),
        (col("cb") + (col("t") + 1) / lit(2.0)).as("midrank"))
      .agg(sum("t").as("nn"), sum("n1v").as("n1"),
        sum(col("n1v") * col("midrank")).as("r1"))
      .select(col("n1").as("n_pos"), (col("nn") - col("n1")).as("n_neg"),
        when(col("n1") > 0 && col("nn") > col("n1"),
          (col("r1") - col("n1") * (col("n1") + 1) / lit(2.0)) /
            (col("n1") * (col("nn") - col("n1")))).as("auc0"))
      .select(col("n_pos"), col("n_neg"),
        round(col("auc0"), 4).as("auc"),
        round(col("auc0") * 2 - 1, 4).as("gini"))
  }

  /** Expected / maximum calibration error of a predicted probability
    * against a 0/1 label (Naeini et al., AAAI'15 shape): `bins`
    * equal-width probability buckets, per-bucket mean confidence vs
    * empirical accuracy, `ECE = Σ (n_b/N)·|conf_b − acc_b|`,
    * `MCE = max_b |conf_b − acc_b|`. Probabilities clamp into
    * `[0, 1)`-indexed buckets (p = 1.0 lands in the top bucket). Output
    * ONE row `(n, n_bins, ece, mce)` (4dp; `n_bins` counts OCCUPIED
    * buckets). One grouped partial-agg pass over the corpus; everything
    * after runs on a ≤`bins`-row frame. Pairs with
    * [[isotonicCalibrate]]: run before/after to show the fix. */
  def calibrationError(df: DataFrame, probCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "calibrationError: bins must be positive")
    val s = df.select(probCol.cast("double").as("p"),
        labelCol.cast("double").as("y"))
      .filter(col("p").isNotNull && col("y").isNotNull)
    val b = s.select(
        least(greatest(floor(col("p") * bins), lit(0)), lit(bins - 1))
          .cast("long").as("bin"),
        col("p"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg("p").as("conf"), avg("y").as("acc"))
    b.agg(sum("n").as("nn"), count(lit(1)).as("n_bins"),
        sum(abs(col("conf") - col("acc")) * col("n")).as("w"),
        max(abs(col("conf") - col("acc"))).as("mce0"))
      .select(col("nn").as("n"), col("n_bins"),
        round(col("w") / col("nn"), 4).as("ece"),
        round(col("mce0"), 4).as("mce"))
  }

  /** Split-conformal prediction intervals (Papadopoulos et al. 2002;
    * Lei et al. 2018 form) — distribution-free coverage for ANY point
    * predictor: the width is the k-th smallest absolute residual on a
    * held-out CALIBRATION set with `k = ⌈(n_cal+1)(1−alpha)⌉` (the
    * exact order statistic, not an interpolated quantile — that is
    * what makes the ≥ 1−alpha coverage guarantee finite-sample), and
    * every scoring row gets `[pred − q, pred + q]`. Input: one frame
    * with a boolean calibration flag plus prediction and (on
    * calibration rows) actual columns. Output scoring rows only:
    * `(id, pred, lo, hi)` (4dp on the bounds).
    *
    * Scale shape: calibration rows collapse to per-|residual| counted
    * rows; the order statistic resolves by the range-partitioned
    * weighted prefix sum (no global sort) + a 1-row min; the scoring
    * corpus picks the width up by a broadcast scalar cross. */
  def conformalInterval(df: DataFrame, idCol: Column, predCol: Column,
      actualCol: Column, calFlagCol: Column,
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "conformalInterval: alpha in (0, 1)")
    val base = df.select(idCol.as("id"), predCol.cast("double").as("pred"),
      actualCol.cast("double").as("actual"),
      calFlagCol.cast("boolean").as("cal"))
    val res = base.filter(col("cal") && col("actual").isNotNull)
      .select(abs(col("actual") - col("pred")).as("r"))
      .groupBy("r").agg(count(lit(1)).as("t"))
    val ranked = Suffix.withWeightedOffset(res, Seq(col("r")),
      col("t"), "cb")
    val nCal = ranked.agg(sum("t").as("nc"))
    // k-th smallest residual: the first counted row whose span covers k
    val q = ranked.crossJoin(broadcast(nCal))
      .select(col("r"), col("cb"), col("t"),
        ceil((col("nc") + 1) * lit(1.0 - alpha)).cast("long").as("k"))
      .filter(col("cb") < col("k") && col("cb") + col("t") >= col("k"))
      .agg(min("r").as("q"))
      // k = ⌈(n_cal+1)(1−alpha)⌉ > n_cal (tiny/empty calibration set)
      // leaves no covering row → q NULL → every bound silently NULL.
      // The guarantee is unattainable: fail fast at execution instead.
      .select(when(col("q").isNull, raise_error(lit(
          "conformalInterval: calibration set too small for the " +
            "requested coverage (k > n_cal) — enlarge it or raise alpha"))
          .cast("double"))
        .otherwise(col("q")).as("q"))
    base.filter(!col("cal"))
      .crossJoin(broadcast(q))
      .select(col("id"), col("pred"),
        round(col("pred") - col("q"), 4).as("lo"),
        round(col("pred") + col("q"), 4).as("hi"))
  }

  /** Decile lift & gains table — the campaign-targeting readout: rows
    * ranked by score descending are cut into `k` ntile groups, and each
    * group reports size, responders, response rate, lift vs the overall
    * rate, and cumulative gains (share of all responders captured so
    * far). Output `k` rows
    * `(decile, n, responders, rate, lift, cum_gains)` (1-based decile,
    * 4dp).
    *
    * Tie discipline: rows are ordered by `(score DESC, label ASC)`, so
    * rows tied on BOTH are interchangeable and every per-decile count
    * is deterministic — the same ordering makes an engine `ntile`
    * reproducible. Scale shape: one grouped pass collapses the corpus
    * to per-(score, label) counted rows; global positions come from the
    * range-partitioned weighted prefix sum (no row-level global
    * window); each counted row then splits its position span across the
    * ≤`k` ntile boundaries it overlaps (ntile semantics: the first
    * `N mod k` groups take `⌈N/k⌉` rows) via a broadcast k-row cross —
    * the final frame is k rows. */
  def liftTable(df: DataFrame, scoreCol: Column, labelCol: Column,
      k: Int = 10): DataFrame = {
    require(k > 0, "liftTable: k must be positive")
    val spark = df.sparkSession
    val s = df.select(scoreCol.cast("double").as("m"),
        labelCol.cast("long").as("y"))
      .filter(col("m").isNotNull && col("y").isNotNull)
    val perVal = s.groupBy("m", "y").agg(count(lit(1)).as("t"))
      .withColumn("negm", -col("m"))
    val ranked = Suffix.withWeightedOffset(perVal,
      Seq(col("negm"), col("y")), col("t"), "cb")
    val tot = ranked.agg(sum("t").as("nn"),
      sum(col("y") * col("t")).as("np"))
    val dec = spark.range(k).select(col("id").as("g"))
    val q = expr(s"nn div $k")
    val m0 = col("nn") % k
    val dlo = col("g") * q + least(col("g"), m0) + 1
    val dhi = dlo + q + when(col("g") < m0, 1).otherwise(0) - 1
    val olo = greatest(col("cb") + 1, col("dlo"))
    val ohi = least(col("cb") + col("t"), col("dhi"))
    val perDec = ranked.crossJoin(broadcast(tot))
      .crossJoin(broadcast(dec))
      .select(col("g"), col("y"), col("t"), col("cb"), col("nn"),
        col("np"), dlo.as("dlo"), dhi.as("dhi"))
      .select(col("g"), col("y"), col("nn"), col("np"),
        (ohi - olo + 1).as("c"))
      .filter(col("c") > 0)
      .groupBy("g", "nn", "np")
      .agg(sum("c").as("n"), sum(col("c") * col("y")).as("responders"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("g") // k rows — the tiny-frame window is deliberate
    perDec
      .select((col("g") + 1).as("decile"), col("n"), col("responders"),
        round(col("responders").cast("double") / col("n"), 4).as("rate"),
        round((col("responders").cast("double") / col("n")) /
          (col("np").cast("double") / col("nn")), 4).as("lift"),
        round(sum(col("responders")).over(w).cast("double") / col("np"), 4)
          .as("cum_gains"))
      .orderBy("decile")
  }
}
