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
}
