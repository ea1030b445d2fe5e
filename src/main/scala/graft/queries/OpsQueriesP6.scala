package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}
import graft.queries.QShared._

/** Part 6/6 of the ops query registry (q313_isotonic..q369_louvain_l2_rounds) — mechanical
  * wave split of the round-11 monolith; entry bodies are verbatim and
  * [[OpsQueries]] merges the parts, so keys, plans and oracle SQL are
  * unchanged. Rounds 12–13 append the graph-quality wave (q361–q369).
  * Each query keeps its DuckDB oracle co-located. */
private[queries] object OpsQueriesP6 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q313_isotonic" -> ((s, d) => {
      // monotone probability calibration of the raw event score:
      // segment-merge PAV over 5-unit value bins; the oracle replays
      // the min-max identity (max_{i≤k} min_{j≥k} avg(i..j)) over the
      // identical bin table — block means are exact integer ratios, so
      // the two agree bit-for-bit
      val e = ev(s, d).select(
        floor(col("value") / 5).cast("long").as("bin"),
        (col("event_type") === "purchase").cast("long").as("y"))
      graft.ops.Classify.isotonicCalibrate(e, col("bin"), col("y"))
        .orderBy("bin")
    }),
    "q314_roc_auc" -> ((s, d) =>
      // exact tie-aware AUC of the raw score against the purchase
      // label — a normalized Mann–Whitney U, midranks from the same
      // weighted prefix sum (no global window)
      graft.ops.Classify.rocAuc(ev(s, d), col("value"),
        (col("event_type") === "purchase").cast("long"))),
    "q315_calibration_error" -> ((s, d) =>
      // reliability audit of a pseudo-probability (value/500) against
      // the purchase label: 10-bucket ECE + MCE in one grouped pass
      graft.ops.Classify.calibrationError(
        ev(s, d).select((col("value") / 500).as("p"),
          (col("event_type") === "purchase").cast("int").as("y")),
        col("p"), col("y"), bins = 10)),
    "q316_lift" -> ((s, d) =>
      // decile lift & gains of the raw score on purchases: ntile cuts
      // from the weighted prefix sum with the (score DESC, label ASC)
      // tie discipline that makes per-decile counts deterministic
      graft.ops.Classify.liftTable(ev(s, d), col("value"),
        (col("event_type") === "purchase").cast("long"), k = 10)),
    "q317_target_encode" -> ((s, d) => {
      // leakage-safe categorical featurization: each event's type is
      // replaced by the smoothed out-of-fold mean of a binary target —
      // folds from the content-addressed md5 assignment, so both
      // engines agree bit-for-bit
      val e = ev(s, d)
      graft.ops.Curation.targetEncode(e, col("event_id"),
        col("event_type"), (col("value") > 50).cast("long"),
        graft.ops.Curation.crossFold(col("event_id"), 5),
        smoothing = 20.0).orderBy("id")
    }),
    "q318_quantile_normalize" -> ((s, d) =>
      // cross-type score equalization: every event type's value
      // distribution maps onto the pooled one by rank interpolation —
      // per-type windows + the exploded global position table, two int
      // equi-joins, no range join
      graft.ops.Profile.quantileNormalize(ev(s, d), col("event_id"),
        col("event_type"), col("value")).orderBy("id")),
    "q319_mutual_information" -> ((s, d) =>
      // feature-relevance screen: MI and sqrt-normalized MI between
      // document language and source over the one contingency pass
      graft.ops.Experiment.mutualInformation(t(s, d, "documents"),
        col("lang"), col("source"))),
    "q320_sgns_pairs" -> ((s, d) =>
      // word2vec SGNS training table: window-2 directed pairs over the
      // minCount-gated vocab plus two deterministic unigram negatives
      // per pair via md5 spans — the segment equi-join, never a scan
      graft.ops.TextAnalysis.sgnsPairs(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("text"), window = 2, minCount = 20, negatives = 2)
        .orderBy("center", "context", "j")),
    "q321_holt_winters_mult" -> ((s, d) => {
      // the q310 series through the MULTIPLICATIVE damped-trend
      // recurrence (seasonal ratios, Gardner-McKenzie phi=0.9); the
      // oracle replays it through the same list-carrying recursive CTE
      val series = ev(s, d)
        .groupBy((col("user_id") % 3).as("k"),
          to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.holtWintersMultiplicative(series, col("k"),
          col("day"), datediff(col("day"), to_date(lit("1970-01-01"))),
          col("v"), alpha = 0.5, beta = 0.3, gamma = 0.4, period = 7,
          phi = 0.9, horizon = 2)
        .orderBy("k")
    }),
    "q322_pacf" -> ((s, d) => {
      // lag-1..5 PARTIAL autocorrelation of each type's daily volume:
      // the q295 corpus shape plus a bounded Durbin-Levinson fold on
      // the |keys| frame; the oracle unrolls the same recursion over
      // DuckDB lists
      val series = ev(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum("value").as("v"))
      graft.ops.Temporal.pacf(series,
          datediff(col("day"), to_date(lit("1970-01-01"))),
          Seq("event_type"), col("day"), col("v"), maxLag = 5)
        .orderBy("event_type", "lag")
    }),
    "q323_sprt" -> ((s, d) =>
      // sequential A/B readout: Wald's SPRT over each type's ordered
      // high-value outcomes — first Wald-bound crossing in one keyed
      // window pass, identical running doubles in both engines
      graft.ops.Experiment.sprtTest(ev(s, d), col("event_type"),
        col("ts"), col("event_id"), (col("value") > 50).cast("int"),
        p0 = 0.45, p1 = 0.55, alpha = 0.05, beta = 0.2)
        .orderBy("k")),
    "q324_ktruss" -> ((s, d) => {
      // 4-truss of the co-purchase graph: synchronous support peeling
      // to the unique fixpoint — oriented triangle enumeration per
      // round, exploded to canonical edges; the oracle peels the same
      // rounds with a common-neighbor join
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      // broadcastClosing measured SLOWER here (10.5 vs 8.5 s at sf0.1:
      // the broadcast rebuilds per peel round; the shuffle join reuses
      // its exchange) — the option stays for single-round callers
      graft.ops.Graph.kTruss(e, col("a"), col("b"), k = 4)
        .orderBy("a", "b")
    }),
    "q325_sssp" -> ((s, d) => {
      // weighted shortest paths from the q303 seed set over directed
      // co-purchase edges (weight = source line quantity): 6 synchronous
      // Bellman-Ford rounds, integer-exact distances
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"),
          col("l_quantity").as("q"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
        .select(col("x.p").as("s"), col("y.p").as("t"),
          col("x.q").as("w"))
      val src = t(s, d, "part").filter(col("p_partkey") % 997 === 0)
      graft.ops.Graph.ssspBellmanFord(e, col("s"), col("t"), col("w"),
          src, col("p_partkey"), rounds = 6)
        .orderBy("id")
    }),
    "q326_dbscan" -> ((s, d) =>
      // density clustering of the first two embedding coordinates:
      // grid-cell candidate pairs (3×3 eps cells), exact eps filter,
      // path-halving components over the core graph, min-labelled
      // borders, noise at -1
      graft.ops.Ann.dbscan(t(s, d, "embeddings"), col("vec_id"),
          element_at(col("embedding"), 1),
          element_at(col("embedding"), 2),
          eps = 0.05, minPts = 5)
        .orderBy("id")),
    "q327_rake" -> ((s, d) =>
      // per-document RAKE keyphrases: stopword-run phrase candidates,
      // deg/freq word scores, top-3 phrase types ranked on the rounded
      // score — everything rides per-doc windows and (id, token) aggs
      graft.ops.TextAnalysis.rakeKeywords(
        t(s, d, "documents").filter(col("doc_id") % 7 === 0),
        col("doc_id"), col("text"),
        stopwords = Seq("a", "the", "value", "table"),
        maxPhraseLen = 4, topK = 3).orderBy("id", "rank")),
    "q328_anova" -> ((s, d) =>
      // does mean value differ across the five event types? one-way F
      // with eta-squared — one grouped moment pass, then a 5-row frame
      graft.ops.Experiment.anovaF(ev(s, d), col("event_type"),
        col("value"))),
    "q329_bh_fdr" -> ((s, d) => {
      // multiple-testing correction across per-cohort pseudo p-values
      // within each event-type family: BH step-up via per-family rank
      // + reverse running min — no global window
      val h = ev(s, d)
        .groupBy(col("event_type").as("family"),
          (col("user_id") % 20).cast("string").as("key"))
        .agg((avg("value") / 500).as("p"))
      graft.ops.Experiment.bhFdr(h, col("family"), col("key"), col("p"))
        .orderBy("family", "rank")
    }),
    "q330_mcnemar" -> ((s, d) => {
      // paired flip test: per user, did-click vs did-purchase — only
      // the discordant pairs carry signal; one counting aggregation
      val pairs = ev(s, d).groupBy("user_id")
        .agg(max((col("event_type") === "click").cast("int")).as("x"),
          max((col("event_type") === "purchase").cast("int")).as("y"))
      graft.ops.Experiment.mcnemarTest(pairs, col("x"), col("y"))
    }),
    "q331_brown_forsythe" -> ((s, d) =>
      // variance-equality gate before trusting q328's F: absolute
      // deviations from each type's exact median, then the same
      // one-way F on the transformed units
      graft.ops.Experiment.brownForsythe(ev(s, d), col("event_type"),
        col("value"))),
    "q332_conformal" -> ((s, d) => {
      // distribution-free intervals around a per-type mean model: the
      // width is the exact conformal order statistic on the held-out
      // fifth, every scoring row gets pred ± q
      val e = ev(s, d)
      val model = e.filter(col("event_id") % 5 === 0)
        .groupBy("event_type").agg(avg("value").as("pred"))
      val scored = e.join(model, "event_type")
      graft.ops.Classify.conformalInterval(scored, col("event_id"),
          col("pred"), col("value"), col("event_id") % 5 === 0,
          alpha = 0.1)
        .orderBy("id")
    }),
    "q333_event_sequences" -> ((s, d) =>
      // frequent 3-step journeys: per-user ordered type n-grams,
      // distinct-user support + occurrences, one key shuffle
      graft.ops.Analytics.frequentEventSequences(ev(s, d),
          col("user_id"), col("event_type"), col("ts"), col("event_id"),
          n = 3, minSupport = 3)
        .orderBy("seq")),
    "q334_ips" -> ((s, d) => {
      // off-policy value of "even cohorts get click, odd get view"
      // from the logged traffic: empirical propensities per (cohort,
      // type), Horvitz-Thompson reweighting, one final aggregate
      val pol = s.range(4).select(col("id").cast("string").as("ctx"),
        when(col("id") % 2 === 0, "click").otherwise("view").as("parm"))
      graft.ops.Experiment.ipsEstimate(ev(s, d), col("user_id") % 4,
        col("event_type"), col("value"), pol, col("ctx"), col("parm"))
    }),
    "q335_moments" -> ((s, d) =>
      // per-type distribution shape: mean/variance/skew/kurt from one
      // power-sum pass with explicit central-moment identities — the
      // one definition both engines reproduce (builtin conventions
      // differ); multiplication, never libm pow
      graft.ops.Profile.momentsProfile(ev(s, d), Seq("event_type"),
        col("value")).orderBy("event_type")),
    "q336_trimmed_mean" -> ((s, d) =>
      // 10-90 trimmed mean per type: exact percentile bounds then a
      // conditional average over the broadcast bounds join
      graft.ops.Profile.trimmedMean(ev(s, d), Seq("event_type"),
        col("value"), lo = 0.1, hi = 0.9).orderBy("event_type")),
    "q337_vocab_growth" -> ((s, d) =>
      // the Heaps-law curve: cumulative types vs tokens in doc order —
      // first occurrences from one grouped min, cumulatives from the
      // range-partitioned prefix sum
      graft.ops.TextAnalysis.vocabularyGrowth(t(s, d, "documents"),
        col("doc_id"), col("text")).orderBy("id")),
    "q338_knn_classify" -> ((s, d) =>
      // leave-one-out 5-NN vote over the embedding labels: the shared
      // knnGraph edge contract + the portable two-step argmax
      graft.ops.Ann.knnClassify(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), col("label"), k = 5).orderBy("id")),
    "q339_davies_bouldin" -> ((s, d) =>
      // cluster-quality score of the label partition: per-dim centroid
      // means, broadcast scatter pass, k-row max-ratio cross
      graft.ops.Ann.daviesBouldin(t(s, d, "embeddings"), col("vec_id"),
        col("embedding"), col("label"))),
    "q340_tfidf_pairs" -> ((s, d) =>
      // lexical related-document pairs through the inverted index:
      // df-capped terms bound the posting fan-out, cosine from summed
      // weight products
      graft.ops.Keyword.tfidfSimilarityPairs(
          t(s, d, "documents").filter(col("doc_id") % 5 === 0),
          col("doc_id"), col("text"), maxDf = 40, threshold = 0.3)
        .orderBy("a_id", "b_id")),
    "q341_assortativity" -> ((s, d) => {
      // does the co-purchase graph wire hubs to hubs? Pearson of
      // endpoint degrees over both edge orientations — exact integer
      // moments, one degree agg + one edge join
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.degreeAssortativity(e, col("a"), col("b"))
    }),
    "q342_modularity" -> ((s, d) => {
      // Newman-Girvan Q of the %7 part partition over the co-purchase
      // graph: intra-edge shares vs degree-mass expectation
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val asg = t(s, d, "part")
        .select(col("p_partkey"), (col("p_partkey") % 7).as("comm"))
      graft.ops.Graph.modularity(e, col("a"), col("b"), asg,
        col("p_partkey"), col("comm"))
    }),
    "q343_katz" -> ((s, d) => {
      // 3-hop attenuated walk counts in integer micro-units — the
      // pageRank discipline with the Katz recurrence; oracle unrolls
      // the identical integer rounds
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.ops.Graph.katzCentrality(e, col("src"), col("dst"),
          alphaPct = 10, iters = 3)
        .orderBy("id")
    }),
    "q344_betweenness" -> ((s, d) => {
      // pivot-sampled Brandes from the two smallest %997 parts, depth
      // 4: integer sigma counts forward, level-walked deltas back —
      // the broker-node centrality the other families lack
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val cand = t(s, d, "part").filter(col("p_partkey") % 997 === 0)
      // the oracle unrolls per-pivot CTEs and so must pin the pivot ids
      // as literals (0, 997). Assert the data-derived pivots are a
      // prefix of those literals — a generator change (e.g. keys
      // starting at 1) fails loudly here instead of silently diverging
      // the engines; at tiny scale only pivot 0 may exist, which is
      // fine (a pivot absent from the graph contributes nothing in
      // either engine). Bounded collect: 2 rows.
      val pivots = cand.select(col("p_partkey").cast("long"))
        .orderBy("p_partkey").limit(2).collect().map(_.getLong(0)).toSeq
      require(pivots.nonEmpty && pivots == Seq(0L, 997L).take(pivots.size),
        s"q344: oracle pins pivots (0, 997) but data yields $pivots — " +
          "regenerate betweennessOracle's literals")
      graft.ops.Graph.betweennessApprox(e, col("a"), col("b"), cand,
          col("p_partkey"), maxPivots = 2, maxDepth = 4)
        .orderBy("id")
    }),
    "q345_ppr" -> ((s, d) => {
      // random walk with restart to the %997 seed parts: integer
      // micro-unit rounds, teleport mass only on seeds
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      val seeds = t(s, d, "part").filter(col("p_partkey") % 997 === 0)
      graft.ops.Graph.personalizedPageRank(e, col("src"), col("dst"),
          seeds, col("p_partkey"), iters = 3)
        .orderBy("id")
    }),
    "q346_nelson_aalen" -> ((s, d) => {
      // the q277 subjects through the cumulative-hazard estimator —
      // sums of d/n instead of the KM product
      val e = ev(s, d)
      val first = e.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"))
      val conv = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("dp"))
      val subjects = first.join(conv, Seq("user_id"), "left")
        .select(
          when(col("dp").isNotNull && datediff(col("dp"), col("d0")) <= 2,
            datediff(col("dp"), col("d0"))).otherwise(2).as("dur"),
          (col("dp").isNotNull && datediff(col("dp"), col("d0")) <= 2)
            .as("obs"))
      graft.ops.Analytics.nelsonAalen(subjects, col("dur"), col("obs"))
        .orderBy("t")
    }),
    "q347_lorenz" -> ((s, d) =>
      // the value-concentration curve behind q283's gini scalar:
      // ascending ntile cuts from the weighted prefix sum, cumulative
      // shares over the 10-row frame
      graft.ops.Analytics.lorenzCurve(ev(s, d), col("value"), k = 10)),
    "q348_spearman" -> ((s, d) =>
      // monotone association between event value and user cohort:
      // Pearson over tie-averaged midranks (two prefix-sum rank
      // passes, value equi-joins back, one moment pass)
      graft.ops.Experiment.spearmanCorr(ev(s, d), col("value"),
        (col("user_id") % 100).cast("double"))),
    "q349_cohens_kappa" -> ((s, d) =>
      // chance-corrected agreement between two threshold raters of the
      // same events (value > 50 vs value > 60): one contingency pass
      graft.ops.Experiment.cohensKappa(ev(s, d),
        (col("value") > 50).cast("int"), (col("value") > 60).cast("int"))),
    "q351_kendall_tau" -> ((s, d) =>
      // concordance-based rank association on BINNED metrics (q348's
      // pair): one cell pass + the |cells|² half self-join, integer
      // products end to end
      graft.ops.Experiment.kendallTau(ev(s, d),
        floor(col("value") / 5), col("user_id") % 100)),
    "q352_chao1" -> ((s, d) =>
      // vocabulary-ceiling estimate per source: one (source, word)
      // count pass; chao1 ships unrounded (exact integer ratio)
      graft.ops.TextAnalysis.chao1Richness(t(s, d, "documents"),
          col("source"), col("text"))
        .withColumnRenamed("g", "source")
        .orderBy("source")),
    "q353_feature_screen" -> ((s, d) =>
      // one-pass info-gain screen of three candidate features against
      // the value>50 label — the corpus is read once via the melt
      graft.ops.Experiment.featureScreen(ev(s, d),
          Seq("event_type" -> col("event_type"),
            "user_decile" -> (col("user_id") % 10),
            "value_bin" -> floor(col("value") / 20)),
          col("value") > 50)
        .orderBy("feature")),
    "q354_forecast_backtest" -> ((s, d) => {
      // seasonal-naive MASE/sMAPE backtest of the q296 daily series:
      // last 7 days held out, forecast = value 7 days earlier, scale =
      // in-sample one-step naive MAE — one key shuffle
      val e = ev(s, d)
      val series = e.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(avg("value").as("v"))
        .withColumn("di",
          datediff(col("day"), to_date(lit("1970-01-01"))))
      graft.ops.Temporal.forecastBacktest(series, col("di"),
          Seq("event_type"), col("di"), col("v"), period = 7,
          horizon = 7)
        .orderBy("event_type")
    }),
    "q355_isotonic_by_key" -> ((s, d) =>
      // per-event-type monotone calibration: the q313 PAV kernel run
      // inside each key's group — no cross-key coordination
      graft.ops.Classify.isotonicCalibrateByKey(ev(s, d),
          col("event_type"), floor(col("value") / 5),
          (col("user_id") % 97 < col("value")).cast("long"))
        .orderBy("k", "bin")),
    "q356_theil_sen" -> ((s, d) => {
      // robust daily-trend slope per event type: median of pairwise
      // slopes over the bounded q296 series, explicit two-middle median
      val e = ev(s, d)
      val series = e.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(avg("value").as("v"))
        .withColumn("di",
          datediff(col("day"), to_date(lit("1970-01-01"))))
      graft.ops.Temporal.theilSenTrend(series, col("di"),
          Seq("event_type"), col("di"), col("v"), maxPoints = 60)
        .orderBy("event_type")
    }),
    "q357_gapped_sequences" -> ((s, d) =>
      // gap-allowed 2/3-item behavior patterns over each user's first
      // 12 events: bounded positional self-joins, support = users
      graft.ops.Analytics.gappedSequences(ev(s, d), col("user_id"),
          col("event_type"), col("ts"), col("event_id"),
          maxEventsPerKey = 12, minSupport = 10)
        .orderBy("len", "seq")),
    "q358_bootstrap_ci" -> ((s, d) =>
      // md5-deterministic Poisson bootstrap of the mean event value:
      // the fan-out ships (v, replicate) pairs only and partial-aggs
      // to 200 replicate rows; CI = nearest-rank order statistics
      graft.ops.Experiment.bootstrapMeanCI(ev(s, d), col("event_id"),
        col("value"), nBoot = 200, alpha = 0.05)),
    "q359_bleu_pairs" -> ((s, d) => {
      // BLEU-2 over the q43 LSH candidate pairs: n-gram-precision
      // similarity (order + multiplicity) where Jaccard sees only
      // sets — row-local scoring on the bounded candidate frame
      val docs = t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .filter(col("doc_id") < 200)
      val pairs = graft.ops.Dedup.lshCandidatePairs(docs, col("doc_id"),
        col("text"), shingleSize = 1)
      val withTexts = pairs
        .join(docs.select(col("doc_id").as("a_id"),
          col("text").as("ta")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"),
          col("text").as("tb")), "b_id")
      graft.ops.TextAnalysis.bleuPairs(withTexts, col("a_id"),
          col("b_id"), col("ta"), col("tb"))
        .orderBy("a_id", "b_id")
    }),
    "q360_bootstrap_diff" -> ((s, d) =>
      // distribution-free A/B readout: Poisson-bootstrap CI for the
      // click-vs-view mean-value difference — same B-row partial-agg
      // shape as q358, both arms drawn from one md5 stream
      graft.ops.Experiment.bootstrapDiffCI(ev(s, d), col("event_id"),
        col("event_type"), col("value"), armA = "click", armB = "view",
        nBoot = 200, alpha = 0.05)),
    "q361_louvain" -> ((s, d) => {
      // deterministic one-level Louvain over the q298 co-purchase
      // graph: integer modularity-gain scores, DIRECTION-ALTERNATED
      // synchronous moves (even rounds only admit moves to smaller
      // community ids, odd to larger — parity scheduling does NOT
      // stop same-parity swap oscillation, see Graph.scala:249),
      // 3 fixed rounds — the oracle unrolls them
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.louvainOneLevel(e, col("a"), col("b"), rounds = 3)
        .orderBy("id")
    }),
    "q362_louvain_two_level" -> ((s, d) => {
      // the full multi-level step: level-1 communities contract to a
      // weighted super-graph (intra mass → self-loops, m invariant)
      // and the WEIGHTED one-level pass coarsens further; members map
      // through both assignments
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read twice: level 1 + contract
      val l1 = graft.ops.Graph.louvainOneLevel(simple, col("a"),
        col("b"), rounds = 3)
      val contracted = graft.ops.Graph.louvainContract(simple, col("a"),
        col("b"), l1, col("id"), col("community"))
      val l2 = graft.ops.Graph.louvainOneLevelWeighted(contracted,
        col("a"), col("b"), col("w"), rounds = 3)
      l1.select(col("id"), col("community").as("c1"))
        .join(l2.select(col("id").as("c1"),
          col("community").as("community")), "c1")
        .select(col("id"), col("c1"), col("community"))
        .orderBy("id")
    }),
    "q363_louvain_modularity" -> ((s, d) => {
      // community QUALITY made adjudicable (round-11 ask #1): the
      // integer-exact modularity numerator Q·(2m)² of BOTH Louvain
      // levels, evaluated on the ORIGINAL graph (same m, directly
      // comparable), plus the level-2-did-not-degrade certificate —
      // the oracle recomputes every sum from the same assignments, so
      // a weak local optimum can no longer hide behind a membership
      // hash
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read 4x: l1, contract, 2 evals
      val l1 = graft.ops.Graph.louvainOneLevel(simple, col("a"),
          col("b"), rounds = 3)
        .localCheckpoint(eager = true) // read 3x: eval, contract, map
      val contracted = graft.ops.Graph.louvainContract(simple, col("a"),
        col("b"), l1, col("id"), col("community"))
      val l2 = graft.ops.Graph.louvainOneLevelWeighted(contracted,
        col("a"), col("b"), col("w"), rounds = 3)
      val full2 = l1.select(col("id"), col("community").as("c1"))
        .join(l2.select(col("id").as("c1"), col("community").as("c2")),
          "c1")
        .select(col("id"), col("c2"))
      // BOTH evaluations batch as one (level, community)-grouped pass
      // against the already-canonical `simple` (the q367 shape: a
      // modularityNumerator call per level re-canonicalizes the %3
      // edge list — the most expensive frame here — once per call;
      // the union rides one scan instead). Both assignments are
      // COMPLETE (every node carries a level-1 community), so the
      // op's unassigned-singleton defaulting can't trigger and the
      // inline sums are its exact integer math; this graph's m keeps
      // Q·(2m)² far inside Long
      val asgAll = l1.select(lit(1L).as("lvl"), col("id"),
          col("community").as("cm"))
        .unionByName(full2.select(lit(2L).as("lvl"), col("id"),
          col("c2").as("cm")))
        .localCheckpoint(eager = true) // read 3x: tot, inn x2
      val m = simple.count()
      val deg = simple.select(col("a").as("id"))
        .unionAll(simple.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tot = asgAll.join(deg, "id")
        .groupBy("lvl", "cm").agg(sum("deg").as("tot"))
      val xa = asgAll.select(col("lvl"), col("id").as("a"),
        col("cm").as("ca"))
      val xb = asgAll.select(col("lvl"), col("id").as("b"),
        col("cm").as("cb"))
      val inn = simple.join(xa, Seq("a")).join(xb, Seq("b", "lvl"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("lvl"), col("ca").as("cm"))
        .agg(count(lit(1)).as("inn"))
      tot.join(inn, Seq("lvl", "cm"), "left")
        .groupBy("lvl")
        .agg(sum(lit(4L * m) * coalesce(col("inn"), lit(0L)) -
          col("tot") * col("tot")).as("q"))
        .agg(max(when(col("lvl") === 1L, col("q"))).as("q1_num"),
          max(when(col("lvl") === 2L, col("q"))).as("q2_num"))
        .select(lit(2L * m).as("two_m"), col("q1_num"), col("q2_num"),
          (col("q2_num") >= col("q1_num")).as("level2_not_worse"))
    }),
    "q364_louvain_levels" -> ((s, d) => {
      // the FULL multi-level loop (ROADMAP #3): three Louvain levels
      // over a lighter (%9) co-purchase slice — level 1, counted
      // contraction, weighted level 2, SUMMED contraction (weights
      // carry forward; m invariant), weighted level 3 — with the
      // certified quality trajectory: per level the community count,
      // the integer-exact modularity numerator on the ORIGINAL graph,
      // and a not-worse-than-previous certificate (level 0 =
      // singletons anchors it); the oracle unrolls all three levels
      // and recomputes every sum
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true)
      val g = graft.ops.Graph
      val l1 = g.louvainOneLevel(simple, col("a"), col("b"), rounds = 3)
        .localCheckpoint(eager = true)
      val c1e = g.louvainContract(simple, col("a"), col("b"), l1,
          col("id"), col("community"))
        .localCheckpoint(eager = true) // read twice: level 2 + contract
      val l2 = g.louvainOneLevelWeighted(c1e, col("a"), col("b"),
          col("w"), rounds = 3)
        .localCheckpoint(eager = true) // read twice: map + contract
      val c2e = g.louvainContractWeighted(c1e, col("a"), col("b"),
        col("w"), l2, col("id"), col("community"))
      val l3 = g.louvainOneLevelWeighted(c2e, col("a"), col("b"),
        col("w"), rounds = 3)
      val full2 = l1.select(col("id"), col("community").as("c1"))
        .join(l2.select(col("id").as("c1"), col("community").as("cm")),
          "c1")
        .select(col("id"), col("cm"))
        .localCheckpoint(eager = true) // read twice: eval + level-3 map
      val full3 = full2.select(col("id"), col("cm").as("c2"))
        .join(l3.select(col("id").as("c2"), col("community").as("cm")),
          "c2")
        .select(col("id"), col("cm"))
      val sing = simple.select(col("a").as("id"))
        .unionAll(simple.select(col("b").as("id"))).distinct()
        .select(col("id"), col("id").as("cm"))
      // all FOUR evaluations batch as one (level, community)-grouped
      // pass against the original graph (the q367 shape — a
      // modularityNumerator call per level re-canonicalizes `simple`
      // once per call; measured on q367, batching halved the family's
      // cost). Assignments are complete, so the op's singleton
      // defaulting can't trigger and the inline sums are its exact
      // integer math; %9 m keeps Q·(2m)² far inside Long
      val a1 = l1.select(col("id"), col("community").as("cm"))
      val asgAll = Seq((0L, sing), (1L, a1), (2L, full2), (3L, full3))
        .map { case (lvl, a) =>
          a.select(lit(lvl).as("level"), col("id"), col("cm")) }
        .reduce(_.unionByName(_))
        .localCheckpoint(eager = true) // read 4x: tot, inn x2, n_comm
      val m = simple.count()
      val deg = simple.select(col("a").as("id"))
        .unionAll(simple.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tot = asgAll.join(deg, "id")
        .groupBy("level", "cm").agg(sum("deg").as("tot"))
      val xa = asgAll.select(col("level"), col("id").as("a"),
        col("cm").as("ca"))
      val xb = asgAll.select(col("level"), col("id").as("b"),
        col("cm").as("cb"))
      val inn = simple.join(xa, Seq("a")).join(xb, Seq("b", "level"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("level"), col("ca").as("cm"))
        .agg(count(lit(1)).as("inn"))
      val qs = tot.join(inn, Seq("level", "cm"), "left")
        .groupBy("level")
        .agg(sum(lit(4L * m) * coalesce(col("inn"), lit(0L)) -
          col("tot") * col("tot")).as("q_num"))
      val nc = asgAll.groupBy("level")
        .agg(countDistinct(col("cm")).as("n_comm"))
      val rows = qs.join(nc, "level")
        .localCheckpoint(eager = true) // read twice: self lag join
      rows.as("cur")
        .join(rows.select((col("level") + 1).as("level"),
          col("q_num").as("prev_q")).as("prv"), Seq("level"), "left")
        .select(col("level"), col("n_comm"), col("q_num"),
          coalesce(col("q_num") >= col("prev_q"), lit(true))
            .as("not_worse"))
        .orderBy("level")
    }),
    "q365_kcore_weighted" -> ((s, d) => {
      // dense backbone by WEIGHTED degree (ROADMAP weighted-variant
      // wave): co-purchase multiplicity is the edge weight — one pair
      // bought together 40 times is stronger evidence than 40
      // one-offs the unweighted core treats identically. Peel to
      // fixpoint at Σw >= 20; the oracle unrolls 8 passes (fixpoint
      // <= 6 at every tested scale, converged rounds idempotent)
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      graft.ops.Graph.kCoreWeighted(e, col("a"), col("b"), col("w"),
          k = 20)
        .orderBy("id")
    }),
    "q366_pagerank_weighted" -> ((s, d) => {
      // weighted centrality: each node's vote splits PROPORTIONAL to
      // co-purchase multiplicity instead of evenly — the q164 integer
      // micro-unit discipline with floor((rank·w) div Σw); top-25
      // most-central parts, ties pinned by id
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 5 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      graft.ops.Graph.pageRankWeighted(e, col("src"), col("dst"),
          col("w"), iters = 3)
        .orderBy(desc("rank_micro"), asc("id"))
        .limit(25)
    }),
    "q367_louvain_rounds" -> ((s, d) => {
      // the rounds-as-quality-knob certificate (round-12 verdict ask
      // #2): q363's gauge showed rounds = 3 leaves real modularity on
      // the table (Q·(2m)² 492M at r3 → 821M at r10 on the q361
      // graph). ONE 6-round level-1 pass keeps every round's
      // assignment (louvainOneLevelTrajectory — same cost as the
      // plain op), and all SEVEN modularity evaluations (rounds 0–6,
      // singletons anchoring) run as ONE batched pass: the per-round
      // assignments union under a round tag and tot/inn group by
      // (round, community), so evaluation cost is two equi-joins
      // regardless of the round count — the shape that survives
      // raising the knob at corpus scale (a per-round
      // modularityNumerator restart re-canonicalizes the graph 7×;
      // measured 15.1 s vs ~7 s batched at sf0.1). Integer sums in
      // Long — this graph's m keeps 4m·in far inside it; the oracle
      // recomputes identical sums per round, with round-over-round
      // not-worse flags: the knee is measured and hash-pinned
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read 4×: traj, m, deg, inn
      val g = graft.ops.Graph
      val traj = g.louvainOneLevelTrajectory(simple, col("a"),
        col("b"), rounds = 6)
      val sing = simple.select(col("a").as("id"))
        .unionAll(simple.select(col("b").as("id"))).distinct()
        .select(lit(0L).as("round"), col("id"), col("id").as("cm"))
      val asgAll = sing.unionByName(
          traj.select(col("round"), col("id"),
            col("community").as("cm")))
        .localCheckpoint(eager = true) // read 4×: tot, inn×2, n_comm
      val m = simple.count()
      val deg = simple.select(col("a").as("id"))
        .unionAll(simple.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tot = asgAll.join(deg, "id")
        .groupBy("round", "cm").agg(sum("deg").as("tot"))
      val xa = asgAll.select(col("round"), col("id").as("a"),
        col("cm").as("ca"))
      val xb = asgAll.select(col("round"), col("id").as("b"),
        col("cm").as("cb"))
      val inn = simple.join(xa, Seq("a")).join(xb, Seq("b", "round"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("round"), col("ca").as("cm"))
        .agg(count(lit(1)).as("inn"))
      val qs = tot.join(inn, Seq("round", "cm"), "left")
        .groupBy("round")
        .agg(sum(lit(4L * m) * coalesce(col("inn"), lit(0L)) -
          col("tot") * col("tot")).as("q_num"))
      val nc = asgAll.groupBy("round")
        .agg(countDistinct(col("cm")).as("n_comm"))
      val levels = qs.join(nc, "round")
        .localCheckpoint(eager = true) // read twice: self lag join
      levels.as("cur")
        .join(levels.select((col("round") + 1).as("round"),
          col("q_num").as("prev_q")).as("prv"), Seq("round"), "left")
        .select(col("round"), col("n_comm"), col("q_num"),
          coalesce(col("q_num") >= col("prev_q"), lit(true))
            .as("not_worse"))
        .orderBy("round")
    }),
    "q368_louvain_external_w" -> ((s, d) => {
      // EXTERNAL-weight Louvain (round-12 verdict ask #3):
      // louvainOneLevelWeighted had only ever seen
      // contraction-produced weights. Here the weights are a real
      // similarity signal — co-purchase multiplicity (the q365
      // construction) — plus genuine SELF-LOOPS (every part ≡ 0
      // mod 10 carries its slice lineitem count as loop weight), so
      // the loops-count-twice weighted-degree convention is
      // oracle-pinned end to end; the WEIGHTED modularity numerator
      // (in_c sums intra weight including loops, same m as the move
      // objective) certifies level 1 against singletons. The %9
      // slice (q364's graph, re-weighted): the op runs its prep 3×
      // here (louvain + both evals re-group the edge list), so the
      // lighter slice keeps the certificate at ~1/3 the bench cost
      // of the %3 construction with identical semantics
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      val loops = li.filter(col("p") % 10 === 0)
        .groupBy(col("p")).agg(count(lit(1)).as("w"))
        .select(col("p").as("a"), col("p").as("b"), col("w"))
      val e = pairs.unionByName(loops)
        .localCheckpoint(eager = true) // read 4x: louvain, m, deg, inn
      val g = graft.ops.Graph
      val l1 = g.louvainOneLevelWeighted(e, col("a"), col("b"),
          col("w"), rounds = 3)
        .localCheckpoint(eager = true) // read twice: asgAll + n_comm
      val sing = e.select(col("a").as("id"))
        .unionAll(e.select(col("b").as("id"))).distinct()
        .select(col("id"), col("id").as("cm"))
      // BOTH weighted evaluations batch as one (tag, community) pass
      // (the q367 shape): a modularityNumeratorWeighted call per
      // assignment re-groups the weighted edge list once per call;
      // here tot/inn sums ride one scan of the already-summed `e`.
      // The weighted convention is the op's exactly: loops contribute
      // 2w to their node's degree and w to intra mass (ca = cb is
      // vacuous on a loop row), m = Σw including loops; both
      // assignments are complete so singleton defaulting can't
      // trigger, and this slice's m keeps 4m·in far inside Long
      val asgAll = sing.select(lit(0L).as("lvl"), col("id"), col("cm"))
        .unionByName(l1.select(lit(1L).as("lvl"), col("id"),
          col("community").as("cm")))
        .localCheckpoint(eager = true) // read 3x: tot, inn x2
      val m = e.agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
      val nonLoop = e.filter(col("a") =!= col("b"))
      val deg = nonLoop.select(col("a").as("id"), col("w").as("deg"))
        .unionAll(nonLoop.select(col("b").as("id"), col("w").as("deg")))
        .unionAll(e.filter(col("a") === col("b"))
          .select(col("a").as("id"), (col("w") * 2).as("deg")))
        .groupBy("id").agg(sum("deg").as("deg"))
      val tot = asgAll.join(deg, "id")
        .groupBy("lvl", "cm").agg(sum("deg").as("tot"))
      val xa = asgAll.select(col("lvl"), col("id").as("a"),
        col("cm").as("ca"))
      val xb = asgAll.select(col("lvl"), col("id").as("b"),
        col("cm").as("cb"))
      val inn = e.join(xa, Seq("a")).join(xb, Seq("b", "lvl"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("lvl"), col("ca").as("cm"))
        .agg(sum("w").as("inn"))
      tot.join(inn, Seq("lvl", "cm"), "left")
        .groupBy("lvl")
        .agg(sum(lit(4L * m) * coalesce(col("inn"), lit(0L)) -
          col("tot") * col("tot")).as("q"))
        .agg(max(when(col("lvl") === 0L, col("q"))).as("q0_num"),
          max(when(col("lvl") === 1L, col("q"))).as("q1_num"))
        .crossJoin(broadcast(
          l1.agg(countDistinct(col("community")).as("n_comm"))))
        .select(lit(2L * m).as("two_m"), col("n_comm"), col("q0_num"),
          col("q1_num"),
          (col("q1_num") >= col("q0_num")).as("level1_not_worse"))
    }),
    "q369_louvain_l2_rounds" -> ((s, d) => {
      // the LEVEL-2 rounds knee (ROADMAP round-13 #3): q367 certified
      // the level-1 round knob, but level >= 2 always runs WEIGHTED
      // (contraction produces summed super-edge weights), so its knob
      // needs the weighted trajectory. Level 1 at the shipped r=3,
      // contract, then louvainOneLevelWeightedTrajectory keeps all 6
      // contracted rounds from ONE run; every round's super-assignment
      // maps back through level 1 and all SEVEN modularity evaluations
      // (round 0 = the level-1 assignment anchoring) batch as one
      // (round, community)-grouped pass against the ORIGINAL graph —
      // the q367 evaluation shape, two equi-joins regardless of the
      // round count. The certificate reads as "what each extra
      // level-2 round buys over stopping at level 1"
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read 5x: l1, contract, m, deg, inn
      val g = graft.ops.Graph
      val l1 = g.louvainOneLevel(simple, col("a"), col("b"), rounds = 3)
        .localCheckpoint(eager = true) // read 3x: contract, anchor, map
      val ce = g.louvainContract(simple, col("a"), col("b"), l1,
        col("id"), col("community"))
      val traj = g.louvainOneLevelWeightedTrajectory(ce, col("a"),
        col("b"), col("w"), rounds = 6)
      val a0 = l1.select(lit(0L).as("round"), col("id"),
        col("community").as("cm"))
      val mapped = l1.select(col("id"), col("community").as("sn"))
        .join(traj.select(col("round"), col("id").as("sn"),
          col("community").as("cm")), Seq("sn"))
        .select(col("round"), col("id"), col("cm"))
      val asgAll = a0.unionByName(mapped)
        .localCheckpoint(eager = true) // read 4x: tot, inn x2, n_comm
      val m = simple.count()
      val deg = simple.select(col("a").as("id"))
        .unionAll(simple.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tot = asgAll.join(deg, "id")
        .groupBy("round", "cm").agg(sum("deg").as("tot"))
      val xa = asgAll.select(col("round"), col("id").as("a"),
        col("cm").as("ca"))
      val xb = asgAll.select(col("round"), col("id").as("b"),
        col("cm").as("cb"))
      val inn = simple.join(xa, Seq("a")).join(xb, Seq("b", "round"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("round"), col("ca").as("cm"))
        .agg(count(lit(1)).as("inn"))
      val qs = tot.join(inn, Seq("round", "cm"), "left")
        .groupBy("round")
        .agg(sum(lit(4L * m) * coalesce(col("inn"), lit(0L)) -
          col("tot") * col("tot")).as("q_num"))
      val nc = asgAll.groupBy("round")
        .agg(countDistinct(col("cm")).as("n_comm"))
      val levels = qs.join(nc, "round")
        .localCheckpoint(eager = true) // read twice: self lag join
      levels.as("cur")
        .join(levels.select((col("round") + 1).as("round"),
          col("q_num").as("prev_q")).as("prv"), Seq("round"), "left")
        .select(col("round"), col("n_comm"), col("q_num"),
          coalesce(col("q_num") >= col("prev_q"), lit(true))
            .as("not_worse"))
        .orderBy("round")
    }),
    "q370_refine_louvain" -> ((s, d) => {
      // Leiden-style connectivity refinement of the level-1 Louvain
      // assignment (ROADMAP round-14 #3 pulled forward): local moves
      // can leave a community internally DISCONNECTED — the defect
      // contraction freezes into every later level — so each
      // community splits into the connected components of its
      // intra-community subgraph (Graph.refineConnectivity: two
      // assignment equi-joins + the duplicateClusters min-label loop).
      // The certificate: n_comm counts the defects repaired, and Q
      // strictly improves on any split ((x+y)² > x²+y²); both stages
      // evaluate in one batched (stage, community) pass
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read 5x: l1, intra, m, deg, inn
      val g = graft.ops.Graph
      val l1 = g.louvainOneLevel(simple, col("a"), col("b"), rounds = 3)
        .localCheckpoint(eager = true) // read twice: refine + stage 0
      val ref = g.refineConnectivity(simple, col("a"), col("b"), l1,
        col("id"), col("community"))
      refineCertificate(simple,
        0L -> l1.select(col("id"), col("community").as("cm")),
        1L -> ref.select(col("id"), col("community").as("cm")))
    }),
    "q371_refine_brands" -> ((s, d) => {
      // connectivity refinement of an ATTRIBUTE grouping: parts
      // grouped by brand over the co-purchase graph. Brand
      // "communities" are heavily disconnected (a brand's parts
      // mostly never co-occur in an order), so the refinement
      // demonstrates real work — n_comm jumps from 25 to the
      // component count and Q strictly improves — the
      // attribute-clustering → graph-connected-components step a
      // curation pipeline runs before treating a metadata group as a
      // cohesive unit
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read 5x: asg, intra, m, deg, inn
      val nodes = simple.select(col("a").as("id"))
        .unionAll(simple.select(col("b").as("id"))).distinct()
      val brand = t(s, d, "part").select(col("p_partkey").as("id"),
        substring(col("p_brand"), 7, 10).cast("long").as("cm"))
      val asg0 = nodes.join(brand, "id")
        .localCheckpoint(eager = true) // read twice: refine + stage 0
      val g = graft.ops.Graph
      val ref = g.refineConnectivity(simple, col("a"), col("b"), asg0,
        col("id"), col("cm"))
      refineCertificate(simple, 0L -> asg0,
        1L -> ref.select(col("id"), col("community").as("cm")))
    }),
    "q372_leiden_two_level" -> ((s, d) => {
      // the refine-then-contract pipeline — the step Leiden actually
      // runs (Traag et al. 2019): q370 proves level-1 Louvain leaves
      // internally-disconnected communities, and a q362-style
      // contraction would FREEZE those defects into the super-graph;
      // here contraction consumes the REFINED assignment, so every
      // super-node is a connected unit before level 2 moves them.
      // Three-stage certificate on the original graph: level 1 →
      // refined (Q strictly improves on any repaired defect) →
      // weighted level 2 over the refined super-graph (not worse
      // again); all three evaluations in one batched pass
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 9 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val e = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val simple = e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = true) // read 6x: l1, intra, contract, m, deg, inn
      val g = graft.ops.Graph
      val l1 = g.louvainOneLevel(simple, col("a"), col("b"), rounds = 3)
        .localCheckpoint(eager = true) // read twice: refine + stage 1
      val ref = g.refineConnectivity(simple, col("a"), col("b"), l1,
          col("id"), col("community"))
        .localCheckpoint(eager = true) // read 3x: contract, stage 2, map
      val ce = g.louvainContract(simple, col("a"), col("b"), ref,
        col("id"), col("community"))
      val l2 = g.louvainOneLevelWeighted(ce, col("a"), col("b"),
        col("w"), rounds = 3)
      val full2 = ref.select(col("id"), col("community").as("sn"))
        .join(l2.select(col("id").as("sn"), col("community").as("cm")),
          Seq("sn"))
        .select(col("id"), col("cm"))
      refineCertificate(simple,
        1L -> l1.select(col("id"), col("community").as("cm")),
        2L -> ref.select(col("id"), col("community").as("cm")),
        3L -> full2)
    })
  )

  /** The refine/Leiden queries' shared certificate tail: batched
    * multi-stage modularity evaluation of consecutively-tagged
    * assignments against the canonical simple edge list — the q367
    * evaluation shape, two equi-joins regardless of stage count —
    * emitting `(stage, n_comm, q_num, not_worse)` (first stage
    * anchors with not_worse = true). */
  private[queries] def refineCertificate(simple: DataFrame,
      stages: (Long, DataFrame)*): DataFrame = {
    val asgAll = stages.map { case (tag, a) =>
        a.select(lit(tag).as("stage"), col("id"), col("cm")) }
      .reduce(_.unionByName(_))
      .localCheckpoint(eager = true) // read 4x: tot, inn x2, n_comm
    val m = simple.count()
    val deg = simple.select(col("a").as("id"))
      .unionAll(simple.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val tot = asgAll.join(deg, "id")
      .groupBy("stage", "cm").agg(sum("deg").as("tot"))
    val xa = asgAll.select(col("stage"), col("id").as("a"),
      col("cm").as("ca"))
    val xb = asgAll.select(col("stage"), col("id").as("b"),
      col("cm").as("cb"))
    val inn = simple.join(xa, Seq("a")).join(xb, Seq("b", "stage"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("stage"), col("ca").as("cm"))
      .agg(count(lit(1)).as("inn"))
    val qs = tot.join(inn, Seq("stage", "cm"), "left")
      .groupBy("stage")
      .agg(sum(lit(4L * m) * coalesce(col("inn"), lit(0L)) -
        col("tot") * col("tot")).as("q_num"))
    val nc = asgAll.groupBy("stage")
      .agg(countDistinct(col("cm")).as("n_comm"))
    val rows = qs.join(nc, "stage")
      .localCheckpoint(eager = true) // read twice: self lag join
    rows.as("cur")
      .join(rows.select((col("stage") + 1).as("stage"),
        col("q_num").as("prev_q")).as("prv"), Seq("stage"), "left")
      .select(col("stage"), col("n_comm"), col("q_num"),
        coalesce(col("q_num") >= col("prev_q"), lit(true))
          .as("not_worse"))
      .orderBy("stage")
  }

  val oracle: Map[String, String] = Map(
    "q313_isotonic" ->
      """WITH s AS (SELECT CAST(floor(value / 5) AS BIGINT) AS bin,
                 CAST(event_type = 'purchase' AS BIGINT) AS y FROM events),
         b AS (SELECT bin, count(*) AS n, sum(y) AS pos FROM s GROUP BY bin),
         c AS (SELECT bin, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
                 row_number() OVER (ORDER BY bin) AS r,
                 CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
                 CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp FROM b),
         pr AS (SELECT i.r AS i, j.r AS j,
                  CAST(j.cp - i.cp + i.pos AS DOUBLE) /
                    (j.cn - i.cn + i.n) AS m
                FROM c i JOIN c j ON i.r <= j.r),
         mn AS (SELECT pr.i, k.r AS k, min(pr.m) AS v
                FROM pr JOIN c k ON pr.i <= k.r AND pr.j >= k.r
                GROUP BY pr.i, k.r),
         fit AS (SELECT k, max(v) AS cal FROM mn GROUP BY k)
         SELECT c.bin, c.n, c.pos,
           round(CAST(c.pos AS DOUBLE) / c.n, 4) AS rate,
           round(f.cal, 4) AS calibrated
         FROM c JOIN fit f ON f.k = c.r ORDER BY bin""",
    "q314_roc_auc" ->
      """WITH s AS (SELECT value AS m,
                 CAST(event_type = 'purchase' AS BIGINT) AS y FROM events),
         pv AS (SELECT m, count(*) AS t, sum(y) AS n1v FROM s GROUP BY m),
         r AS (SELECT t, n1v,
                 sum(t) OVER (ORDER BY m) - t + (t + 1) / 2.0 AS midrank
               FROM pv),
         a AS (SELECT CAST(sum(t) AS BIGINT) AS nn,
                 CAST(sum(n1v) AS BIGINT) AS n1,
                 CAST(sum(n1v * midrank) AS DOUBLE) AS r1 FROM r)
         SELECT n1 AS n_pos, nn - n1 AS n_neg,
           round((r1 - n1 * (n1 + 1) / 2.0) / (n1 * (nn - n1)), 4) AS auc,
           round((r1 - n1 * (n1 + 1) / 2.0) / (n1 * (nn - n1)) * 2 - 1, 4)
             AS gini
         FROM a""",
    "q315_calibration_error" ->
      """WITH s AS (SELECT value / 500 AS p,
                 CAST(event_type = 'purchase' AS INT) AS y FROM events),
         b AS (SELECT CAST(least(greatest(floor(p * 10), 0), 9) AS BIGINT)
                   AS bin,
                 count(*) AS n, avg(p) AS conf, avg(y) AS acc
               FROM s GROUP BY 1)
         SELECT CAST(sum(n) AS BIGINT) AS n, count(*) AS n_bins,
           round(sum(abs(conf - acc) * n) / sum(n), 4) AS ece,
           round(max(abs(conf - acc)), 4) AS mce
         FROM b""",
    "q316_lift" ->
      """WITH s AS (SELECT value AS m,
                 CAST(event_type = 'purchase' AS BIGINT) AS y FROM events),
         r AS (SELECT y, ntile(10) OVER (ORDER BY m DESC, y) AS decile
               FROM s),
         a AS (SELECT decile, count(*) AS n,
                 CAST(sum(y) AS BIGINT) AS responders
               FROM r GROUP BY decile),
         t AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
                 CAST(sum(responders) AS DOUBLE) AS np FROM a)
         SELECT CAST(decile AS BIGINT) AS decile, n, responders,
           round(responders / CAST(n AS DOUBLE), 4) AS rate,
           round((responders / CAST(n AS DOUBLE)) / (np / nn), 4) AS lift,
           round(sum(responders) OVER (ORDER BY decile) / np, 4)
             AS cum_gains
         FROM a, t ORDER BY decile""",
    "q317_target_encode" ->
      """WITH s AS (SELECT event_id AS id, event_type AS cat,
                 CAST(value > 50 AS BIGINT) AS y,
                 CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                   1, 15)) AS BIGINT) % 5 AS fold FROM events),
         cf AS (SELECT cat, fold, count(*) AS nf,
                  CAST(sum(y) AS BIGINT) AS tf FROM s GROUP BY cat, fold),
         ct AS (SELECT cat, CAST(sum(nf) AS BIGINT) AS nc,
                  CAST(sum(tf) AS BIGINT) AS tc FROM cf GROUP BY cat),
         g AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS gm FROM s)
         SELECT s.id, s.cat, s.fold,
           round((ct.tc - cf.tf + 20.0 * g.gm) /
             (ct.nc - cf.nf + 20.0), 4) AS encoded
         FROM s JOIN cf ON cf.cat = s.cat AND cf.fold = s.fold
           JOIN ct ON ct.cat = s.cat CROSS JOIN g
         ORDER BY id""",
    "q318_quantile_normalize" ->
      """WITH s AS (SELECT event_id AS id, event_type AS grp, value AS v
               FROM events),
         r AS (SELECT id, grp, v,
                 row_number() OVER (PARTITION BY grp ORDER BY v, id) AS rk,
                 count(*) OVER (PARTITION BY grp) AS ng FROM s),
         g AS (SELECT v AS gv, row_number() OVER (ORDER BY v) AS gp FROM s),
         n AS (SELECT count(*) AS nn FROM s),
         ip AS (SELECT id, grp, v,
                  CASE WHEN ng = 1 THEN 0.5
                       ELSE (rk - 1) / CAST(ng - 1 AS DOUBLE) END
                    * (nn - 1) AS gpos
                FROM r CROSS JOIN n),
         fp AS (SELECT *, CAST(floor(gpos) AS BIGINT) AS fl FROM ip)
         SELECT fp.id, fp.grp, fp.v,
           gl.gv + (fp.gpos - fp.fl) * (gh.gv - gl.gv) AS qnorm
         FROM fp CROSS JOIN n
           JOIN g gl ON gl.gp = fp.fl + 1
           JOIN g gh ON gh.gp = least(fp.fl + 2, n.nn)
         ORDER BY id""",
    "q319_mutual_information" ->
      """WITH cells AS (SELECT lang AS a, source AS b, count(*) AS o
               FROM documents
               WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
         rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a),
         ctt AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b),
         t AS (SELECT CAST(sum(o) AS DOUBLE) AS n,
                 count(DISTINCT a) AS r, count(DISTINCT b) AS c FROM cells),
         hx AS (SELECT -sum(ra / n * ln(ra / n)) AS hx FROM rt CROSS JOIN t),
         hy AS (SELECT -sum(cb / n * ln(cb / n)) AS hy FROM ctt CROSS JOIN t),
         mi AS (SELECT sum(o / n * ln(o * n / (ra * CAST(cb AS DOUBLE))))
                    AS mi0
                FROM cells JOIN rt USING (a) JOIN ctt USING (b)
                  CROSS JOIN t)
         SELECT CAST(t.n AS BIGINT) AS n, t.r, t.c,
           round(mi.mi0, 4) AS mi,
           round(CASE WHEN hx.hx > 0 AND hy.hy > 0
             THEN mi.mi0 / sqrt(hx.hx * hy.hy) END, 4) AS nmi
         FROM t CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""",
    "q320_sgns_pairs" ->
      """WITH toks AS (SELECT list_filter(string_split_regex(trim(text),
                   '\s+'), x -> x <> '') AS tk
               FROM documents WHERE doc_id % 5 = 0),
         flat AS (SELECT unnest(tk) AS w FROM toks),
         vocab AS (SELECT w, count(*) AS cnt FROM flat GROUP BY w
                   HAVING count(*) >= 20),
         vr AS (SELECT w, CAST(cnt AS BIGINT) AS cnt,
                  CAST(sum(cnt) OVER (ORDER BY w) - cnt AS BIGINT) AS lo
                FROM vocab),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
         p AS (SELECT tk, unnest(range(0, len(tk))) AS p FROM toks),
         pd AS (SELECT tk, p,
                  unnest(range(1, least(2, len(tk) - p - 1) + 1)) AS d
                FROM p WHERE len(tk) - p >= 2),
         pr AS (SELECT tk[p + 1] AS wa, tk[p + d + 1] AS wb FROM pd),
         dir AS (SELECT wa AS center, wb AS context FROM pr
                 UNION ALL SELECT wb, wa FROM pr),
         pp AS (SELECT center, context, count(*) AS n_pos FROM dir
                JOIN vr va ON va.w = dir.center
                JOIN vr vb ON vb.w = dir.context
                GROUP BY center, context),
         ex AS (SELECT center, context, CAST(n_pos AS BIGINT) AS n_pos,
                  unnest(range(1, 3)) AS j FROM pp),
         rr AS (SELECT ex.*, CAST(concat('0x', substr(md5(concat(center,
                    chr(1), context, chr(1), CAST(j AS VARCHAR))), 1, 15))
                  AS BIGINT) % tot.total AS r
                FROM ex CROSS JOIN tot)
         SELECT rr.center, rr.context, rr.n_pos, CAST(rr.j AS INT) AS j,
           vr.w AS neg
         FROM rr JOIN vr ON rr.r >= vr.lo AND rr.r < vr.lo + vr.cnt
         ORDER BY center, context, j""",
    "q321_holt_winters_mult" -> {
      // multiplicative twin of the q310 oracle: seasonal state seeds at
      // the identity 1 (the base row's own update is exactly
      // g*1 + (1-g)*1 = 1 in IEEE: ig is computed AS 1-g, so the pair
      // sums back to 1.0), damped-trend forecast uses the inlined
      // Scala-computed phi-power sum so both engines see one double
      val a = 0.5; val b = 0.3; val g = 0.4; val m = 7; val h = 2
      val phi = 0.9
      val (ia, ib, ig) = (1.0 - a, 1.0 - b, 1.0 - g)
      val dampSum = (1 to h).map(j => math.pow(phi, j)).sum
      val ones = Seq.fill(m)("1.0").mkString("[", ", ", "]")
      val pos = s"((sd.ord - 1) % $m)"
      val sOld = s"h.s[$pos + 1]"
      val l1 = s"($a * (sd.y / $sOld) + $ia * (h.l + $phi * h.b))"
      val s1 = s"($g * (sd.y / $l1) + $ig * $sOld)"
      s"""WITH RECURSIVE sd AS (
            SELECT k, row_number() OVER (PARTITION BY k ORDER BY day)
                AS ord, y
            FROM (SELECT user_id % 3 AS k, CAST(ts AS DATE) AS day,
                    sum(value) AS y
                  FROM events GROUP BY 1, 2)),
          n AS (SELECT k, max(ord) AS n FROM sd GROUP BY k),
          hw AS (
            SELECT k, ord, CAST(y AS DOUBLE) AS l,
              CAST(0.0 AS DOUBLE) AS b,
              CAST($ones AS DOUBLE[]) AS s
            FROM sd WHERE ord = 1
            UNION ALL
            SELECT sd.k, sd.ord,
              $l1 AS l,
              $b * ($l1 - h.l) + $ib * $phi * h.b AS b,
              list_concat(list_concat(h.s[1:$pos], [$s1]),
                h.s[$pos + 2:]) AS s
            FROM hw h JOIN sd ON sd.k = h.k AND sd.ord = h.ord + 1),
          fin AS (SELECT h.k, n.n, h.l, h.b,
                    h.s[((n.n + $h - 1) % $m) + 1] AS sf
                  FROM hw h JOIN n ON n.k = h.k AND h.ord = n.n)
          SELECT k, n, round(l, 4) AS level, round(b, 4) AS trend,
            round((l + $dampSum * b) * sf, 4) AS forecast
          FROM fin ORDER BY k"""
    },
    "q322_pacf" -> {
      // Durbin-Levinson unrolled over DuckDB lists: rho from the q295
      // machinery (unrounded), then one (pmm, list-update) CTE pair per
      // level — range(1, m) drives both the inner sums and the phi
      // update, the exact index sets the Spark fold walks
      val L = 5
      val lagCols = (1 to L).map(k =>
        s"lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS l$k")
        .mkString(", ")
      val numCols = (1 to L).map(k =>
        s"sum((v - mu) * (l$k - mu)) AS num$k").mkString(", ")
      val rhoList = (1 to L).map(k =>
        s"CASE WHEN den > 0 THEN num$k / den END")
        .mkString("[", ", ", "]")
      val steps = (2 to L).map { m =>
        s"""s$m AS (SELECT *,
             CASE WHEN (1 - list_sum(list_transform(range(1, $m),
                 j -> phis[j] * rho[j]))) <> 0 THEN
               (rho[$m] - list_sum(list_transform(range(1, $m),
                 j -> phis[j] * rho[$m - j]))) /
               (1 - list_sum(list_transform(range(1, $m),
                 j -> phis[j] * rho[j]))) END AS pmm
           FROM d${m - 1}),
         d$m AS (SELECT event_type, n, rho,
             list_concat(list_transform(range(1, $m),
               j -> phis[j] - pmm * phis[$m - j]), [pmm]) AS phis,
             list_concat(diag, [pmm]) AS diag
           FROM s$m)"""
      }.mkString(",\n         ")
      s"""WITH sday AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(value) AS v
               FROM events GROUP BY 1, 2),
         mm AS (SELECT event_type, v,
                 avg(v) OVER (PARTITION BY event_type) AS mu, $lagCols
               FROM sday),
         a AS (SELECT event_type, count(*) AS n,
                 sum(pow(v - mu, 2)) AS den, $numCols
               FROM mm GROUP BY event_type),
         r0 AS (SELECT event_type, n, $rhoList AS rho FROM a),
         d1 AS (SELECT event_type, n, rho,
                  [rho[1]] AS phis, [rho[1]] AS diag FROM r0),
         $steps
         SELECT event_type, unnest(range(1, $L + 1)) AS lag, n,
           round(unnest(diag), 4) AS pacf
         FROM d$L ORDER BY event_type, lag"""
    },
    "q323_sprt" -> {
      // the Wald constants are Scala-computed doubles inlined as
      // shortest-repr literals, and the running LLR is an ORDERED
      // window sum — the identical IEEE fold in both engines
      val p0 = 0.45; val p1 = 0.55; val al = 0.05; val be = 0.2
      val wp = math.log(p1 / p0); val wn = math.log((1 - p1) / (1 - p0))
      val lo = math.log(be / (1 - al)); val up = math.log((1 - be) / al)
      s"""WITH s AS (SELECT event_type AS k, ts, event_id AS tb,
                 CASE WHEN value > 50 THEN 1 ELSE 0 END AS x FROM events),
         w AS (SELECT k,
                 row_number() OVER (PARTITION BY k ORDER BY ts, tb)
                   AS ord,
                 sum(CASE WHEN x = 1 THEN $wp ELSE $wn END)
                   OVER (PARTITION BY k ORDER BY ts, tb
                         ROWS UNBOUNDED PRECEDING) AS llr
               FROM s),
         c AS (SELECT k, ord, llr,
                 CASE WHEN llr >= $up THEN 1
                      WHEN llr <= $lo THEN -1 END AS cr
               FROM w),
         fc AS (SELECT k, min(ord) AS n_at FROM c WHERE cr IS NOT NULL
                GROUP BY k),
         dec AS (SELECT c.k, c.cr FROM c
                 JOIN fc ON fc.k = c.k AND c.ord = fc.n_at),
         fin AS (SELECT k, count(*) AS n, arg_max(llr, ord) AS lf
                 FROM c GROUP BY k)
         SELECT fin.k AS k, fin.n,
           CASE WHEN fc.n_at IS NULL THEN 'continue'
                WHEN dec.cr = 1 THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           fc.n_at AS n_at_decision,
           round(fin.lf, 4) AS llr_final
         FROM fin LEFT JOIN fc ON fc.k = fin.k
           LEFT JOIN dec ON dec.k = fin.k
         ORDER BY fin.k"""
    },
    "q324_ktruss" -> kTrussOracle(k = 4, rounds = 8),
    "q325_sssp" -> ssspOracle(rounds = 6),
    "q326_dbscan" -> dbscanOracle(eps = 0.05, minPts = 5, rounds = 12),
    "q327_rake" ->
      """WITH d AS (SELECT doc_id AS id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                   x -> x <> '') AS tk
               FROM documents WHERE doc_id % 7 = 0),
         toks AS (SELECT id, unnest(tk) AS tok,
                    unnest(range(1, len(tk) + 1)) AS pos FROM d),
         mk AS (SELECT id, tok, pos,
                  tok IN ('a', 'the', 'value', 'table') AS stop
                FROM toks),
         ph AS (SELECT id, tok, pos,
                  sum(CASE WHEN stop THEN 1 ELSE 0 END)
                    OVER (PARTITION BY id ORDER BY pos) AS pid, stop
                FROM mk),
         kept AS (SELECT id, tok, pos, pid FROM ph WHERE NOT stop),
         wl AS (SELECT *, count(*) OVER (PARTITION BY id, pid) AS plen
                FROM kept),
         k2 AS (SELECT * FROM wl WHERE plen <= 4),
         ws AS (SELECT id, tok, count(*) AS freq,
                  CAST(sum(plen) AS BIGINT) AS deg
                FROM k2 GROUP BY id, tok),
         sc AS (SELECT k2.id, k2.pid,
                  string_agg(k2.tok, ' ' ORDER BY k2.pos) AS phrase,
                  sum(CAST(ws.deg AS DOUBLE) / ws.freq) AS score0
                FROM k2 JOIN ws ON ws.id = k2.id AND ws.tok = k2.tok
                GROUP BY k2.id, k2.pid),
         dd AS (SELECT id, phrase, max(round(score0, 4)) AS score
                FROM sc GROUP BY id, phrase),
         rk AS (SELECT id, phrase, score,
                  row_number() OVER (PARTITION BY id
                    ORDER BY score DESC, phrase) AS rank
                FROM dd)
         SELECT id, CAST(rank AS BIGINT) AS rank, phrase, score
         FROM rk WHERE rank <= 3 ORDER BY id, rank""",
    "q328_anova" ->
      """WITH s AS (SELECT event_type AS arm, value AS m FROM events),
         g AS (SELECT arm, count(*) AS ng, sum(m) AS sg,
                 sum(m * m) AS qg FROM s GROUP BY arm),
         t AS (SELECT CAST(sum(ng) AS BIGINT) AS nn, count(*) AS k,
                 sum(sg) AS st, sum(sg * sg / ng) AS sb0,
                 sum(qg) AS qt FROM g),
         d AS (SELECT nn, k, sb0 - st * st / nn AS ssb,
                 qt - sb0 AS ssw FROM t)
         SELECT nn AS n, k AS k_arms,
           round(CASE WHEN k > 1 AND nn > k AND ssw > 0
             THEN (ssb / (k - 1)) / (ssw / (nn - k)) END, 4) AS f,
           k - 1 AS df1, nn - k AS df2,
           round(CASE WHEN ssb + ssw > 0
             THEN ssb / (ssb + ssw) END, 4) AS eta_sq
         FROM d""",
    "q329_bh_fdr" ->
      """WITH h AS (SELECT event_type AS family,
                 CAST(user_id % 20 AS VARCHAR) AS key,
                 avg(value) / 500 AS p
               FROM events GROUP BY 1, 2),
         r AS (SELECT family, key, p,
                 row_number() OVER (PARTITION BY family
                   ORDER BY p, key) AS rank,
                 count(*) OVER (PARTITION BY family) AS nn FROM h)
         SELECT family, key, p, rank,
           round(least(min(p * nn / rank) OVER (PARTITION BY family
             ORDER BY p, key
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0), 4)
             AS p_adj
         FROM r ORDER BY family, rank""",
    "q330_mcnemar" ->
      """WITH pr AS (SELECT user_id,
                 max(CAST(event_type = 'click' AS INT)) AS x,
                 max(CAST(event_type = 'purchase' AS INT)) AS y
               FROM events GROUP BY user_id),
         a AS (SELECT count(*) AS n,
                 CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
                 CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS c
               FROM pr)
         SELECT n, b, c,
           round(CASE WHEN b + c > 0
             THEN pow(abs(b - c) - 1, 2) / (b + c) END, 4) AS chi2,
           coalesce(CASE WHEN b + c > 0
             THEN pow(abs(b - c) - 1, 2) / (b + c) END > 3.841, false)
             AS significant
         FROM a""",
    "q331_brown_forsythe" ->
      """WITH s AS (SELECT event_type AS arm, value AS m FROM events),
         md AS (SELECT arm, quantile_cont(m, 0.5) AS md FROM s
                GROUP BY arm),
         z AS (SELECT s.arm, abs(s.m - md.md) AS m
               FROM s JOIN md ON md.arm = s.arm),
         g AS (SELECT arm, count(*) AS ng, sum(m) AS sg,
                 sum(m * m) AS qg FROM z GROUP BY arm),
         t AS (SELECT CAST(sum(ng) AS BIGINT) AS nn, count(*) AS k,
                 sum(sg) AS st, sum(sg * sg / ng) AS sb0,
                 sum(qg) AS qt FROM g),
         d AS (SELECT nn, k, sb0 - st * st / nn AS ssb,
                 qt - sb0 AS ssw FROM t)
         SELECT nn AS n, k AS k_arms,
           round(CASE WHEN k > 1 AND nn > k AND ssw > 0
             THEN (ssb / (k - 1)) / (ssw / (nn - k)) END, 4) AS f,
           k - 1 AS df1, nn - k AS df2
         FROM d""",
    "q332_conformal" ->
      """WITH e AS (SELECT event_id AS id, event_type, value,
                 event_id % 5 = 0 AS cal FROM events),
         model AS (SELECT event_type, avg(value) AS pred FROM e
                   WHERE cal GROUP BY 1),
         s AS (SELECT e.id, e.value, e.cal, m.pred
               FROM e JOIN model m USING (event_type)),
         r AS (SELECT abs(value - pred) AS r FROM s WHERE cal),
         n AS (SELECT count(*) AS nc FROM r),
         kk AS (SELECT CAST(ceil((nc + 1) * 0.9) AS BIGINT) AS k FROM n),
         ranked AS (SELECT r, row_number() OVER (ORDER BY r) AS rn
                    FROM r),
         q AS (SELECT r AS q FROM ranked CROSS JOIN kk WHERE rn = kk.k)
         SELECT s.id, s.pred, round(s.pred - q.q, 4) AS lo,
           round(s.pred + q.q, 4) AS hi
         FROM s CROSS JOIN q WHERE NOT s.cal ORDER BY id""",
    "q333_event_sequences" ->
      """WITH s AS (SELECT user_id AS k, event_type AS tp, ts,
                 event_id AS tb FROM events),
         l AS (SELECT k, tp,
                 lead(tp, 1) OVER (PARTITION BY k ORDER BY ts, tb) AS n1,
                 lead(tp, 2) OVER (PARTITION BY k ORDER BY ts, tb) AS n2
               FROM s),
         g AS (SELECT concat(tp, '->', n1, '->', n2) AS seq, k FROM l
               WHERE n1 IS NOT NULL AND n2 IS NOT NULL),
         pk AS (SELECT seq, k, count(*) AS c FROM g GROUP BY seq, k)
         SELECT seq, count(*) AS support,
           CAST(sum(c) AS BIGINT) AS occurrences
         FROM pk GROUP BY seq HAVING count(*) >= 3 ORDER BY seq""",
    "q334_ips" ->
      """WITH s AS (SELECT CAST(user_id % 4 AS VARCHAR) AS ctx,
                 event_type AS arm, value AS r FROM events),
         prop AS (SELECT ctx, arm, count(*) AS na FROM s GROUP BY 1, 2),
         ct AS (SELECT ctx, CAST(sum(na) AS BIGINT) AS nc FROM prop
                GROUP BY ctx),
         pol AS (SELECT CAST(i AS VARCHAR) AS ctx,
                   CASE WHEN i % 2 = 0 THEN 'click' ELSE 'view' END
                     AS parm
                 FROM range(4) t(i)),
         j AS (SELECT s.r,
                 CASE WHEN s.arm = pol.parm
                   THEN s.r * ct.nc / prop.na ELSE 0.0 END AS w,
                 CASE WHEN s.arm = pol.parm THEN 1 ELSE 0 END AS m
               FROM s JOIN prop USING (ctx, arm) JOIN ct USING (ctx)
                 LEFT JOIN pol USING (ctx))
         SELECT count(*) AS n, CAST(sum(m) AS BIGINT) AS n_matched,
           round(sum(w) / count(*), 4) AS v_hat,
           round(avg(r), 4) AS v_logged
         FROM j""",
    "q335_moments" ->
      """WITH s AS (SELECT event_type, value AS v FROM events),
         g AS (SELECT event_type, count(*) AS n, sum(v) AS s1,
                 sum(v * v) AS s2, sum(v * v * v) AS s3,
                 sum(v * v * v * v) AS s4
               FROM s GROUP BY event_type),
         c AS (SELECT event_type, n, s1, s2, s3, s4,
                 CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS m
               FROM g),
         mm AS (SELECT *, s2 / nd - m * m AS m2,
                  s3 / nd - 3.0 * m * s2 / nd + 2.0 * m * m * m AS m3,
                  s4 / nd - 4.0 * m * s3 / nd + 6.0 * m * m * s2 / nd
                    - 3.0 * m * m * m * m AS m4
                FROM c)
         SELECT event_type, n, round(m, 4) AS mean,
           round(CASE WHEN n > 1
             THEN (s2 - s1 * s1 / nd) / (nd - 1) END, 4) AS variance,
           round(CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END, 4)
             AS skew,
           round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3 END, 4)
             AS kurt
         FROM mm ORDER BY event_type""",
    "q336_trimmed_mean" ->
      """WITH s AS (SELECT event_type, value AS v FROM events),
         b AS (SELECT event_type, quantile_cont(v, 0.1) AS lo,
                 quantile_cont(v, 0.9) AS hi
               FROM s GROUP BY event_type)
         SELECT s.event_type, count(*) AS n,
           CAST(sum(CASE WHEN v BETWEEN lo AND hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           round(avg(CASE WHEN v BETWEEN lo AND hi THEN v END), 4)
             AS trimmed_mean
         FROM s JOIN b USING (event_type)
         GROUP BY s.event_type ORDER BY s.event_type""",
    "q337_vocab_growth" ->
      """WITH d AS (SELECT doc_id AS id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                   x -> x <> '') AS tk
               FROM documents),
         pd AS (SELECT id, len(tk) AS n_tokens FROM d),
         fl AS (SELECT id, unnest(tk) AS term FROM d),
         fo AS (SELECT term, min(id) AS id FROM fl GROUP BY term),
         nt AS (SELECT id, count(*) AS new_types FROM fo GROUP BY id),
         j AS (SELECT pd.id, pd.n_tokens,
                 coalesce(nt.new_types, 0) AS new_types
               FROM pd LEFT JOIN nt USING (id))
         SELECT id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(sum(n_tokens) OVER (ORDER BY id) AS BIGINT)
             AS cum_tokens,
           CAST(sum(new_types) OVER (ORDER BY id) AS BIGINT)
             AS cum_types
         FROM j ORDER BY id""",
    "q338_knn_classify" -> {
      val cos = PortableSql.cosSql("a.v", "b.v")
      s"""WITH v AS (SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 CAST(label AS BIGINT) AS label FROM embeddings),
         px AS (SELECT a.id AS qid, b.id AS nbr,
                  round($cos, 4) AS sim
                FROM v a JOIN v b ON a.id <> b.id),
         ex AS (SELECT qid, nbr FROM (
                  SELECT qid, nbr, row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, nbr) AS rn FROM px)
                WHERE rn <= 5),
         vt AS (SELECT ex.qid AS id, v.label AS lbl, count(*) AS cv
                FROM ex JOIN v ON v.id = ex.nbr GROUP BY 1, 2),
         mx AS (SELECT id, max(cv) AS mv FROM vt GROUP BY id),
         pd AS (SELECT vt.id, min(vt.lbl) AS pred,
                  CAST(max(vt.cv) AS BIGINT) AS votes
                FROM vt JOIN mx ON mx.id = vt.id AND vt.cv = mx.mv
                GROUP BY vt.id)
         SELECT pd.id AS id, pd.pred, pd.votes, v.label AS actual,
           pd.pred = v.label AS correct
         FROM pd JOIN v ON v.id = pd.id ORDER BY pd.id"""
    },
    "q339_davies_bouldin" -> {
      val d2 = (a: String, b: String) =>
        s"sqrt(list_sum(list_transform(range(1, len($a) + 1), " +
          s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))))"
      s"""WITH v AS (SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 CAST(label AS BIGINT) AS c FROM embeddings),
         dims AS (SELECT c, unnest(v) AS x,
                    unnest(range(len(v))) AS i FROM v),
         cent AS (SELECT c, i, avg(x) AS m FROM dims GROUP BY c, i),
         ca AS (SELECT c, list(m ORDER BY i) AS cv FROM cent GROUP BY c),
         sc AS (SELECT v.c, avg(${d2("v.v", "ca.cv")}) AS s
                FROM v JOIN ca USING (c) GROUP BY v.c),
         pr AS (SELECT x.c AS c,
                  (x.s + y.s) / ${d2("xa.cv", "ya.cv")} AS ratio
                FROM sc x JOIN sc y ON x.c <> y.c
                  JOIN ca xa ON xa.c = x.c JOIN ca ya ON ya.c = y.c),
         w AS (SELECT c, max(ratio) AS r FROM pr GROUP BY c)
         SELECT count(*) AS n_clusters, round(avg(r), 4) AS db_index
         FROM w"""
    },
    "q340_tfidf_pairs" ->
      """WITH toks AS (SELECT doc_id AS id, unnest(list_filter(
                 string_split_regex(trim(text), '\s+'), x -> x <> ''))
                   AS term
               FROM documents WHERE doc_id % 5 = 0),
         tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nn
               FROM documents WHERE doc_id % 5 = 0),
         dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term
                 HAVING count(*) <= 40),
         w AS (SELECT tf.id, tf.term, tf.tf * ln(n.nn / dft.df) AS w
               FROM tf JOIN dft USING (term) CROSS JOIN n),
         nrm AS (SELECT id, sum(w * w) AS n2 FROM w GROUP BY id),
         d AS (SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_shared,
                 sum(a.w * b.w) AS dot
               FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
               GROUP BY a.id, b.id)
         SELECT d.a_id, d.b_id, d.n_shared,
           round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) AS sim
         FROM d JOIN nrm na ON na.id = d.a_id
           JOIN nrm nb ON nb.id = d.b_id
         WHERE round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 4) >= 0.3
         ORDER BY a_id, b_id""",
    "q341_assortativity" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
                   SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)
                 GROUP BY id),
         dir AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
         pr AS (SELECT da.d AS x, db.d AS y FROM dir
                JOIN deg da ON da.id = dir.a
                JOIN deg db ON db.id = dir.b),
         s AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy FROM pr)
         SELECT m // 2 AS n_edges,
           round(CASE WHEN m * sxx - sx * sx > 0 THEN
             (m * sxy - sx * sy) /
               (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(m * syy - sy * sy AS DOUBLE))) END, 4) AS r
         FROM s""",
    "q342_modularity" ->
      """WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
                FROM li x JOIN li y ON x.o = y.o AND x.p < y.p),
         m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
         asg AS (SELECT p_partkey AS id,
                   CAST(p_partkey % 7 AS BIGINT) AS c FROM part),
         wc AS (SELECT coalesce(ca.c, -e0.a - 1) AS ca,
                  coalesce(cb.c, -e0.b - 1) AS cb
                FROM e0 LEFT JOIN asg ca ON ca.id = e0.a
                  LEFT JOIN asg cb ON cb.id = e0.b),
         intra AS (SELECT ca AS c, CAST(count(*) AS BIGINT) AS ec
                   FROM wc WHERE ca = cb GROUP BY ca),
         dm AS (SELECT c, CAST(count(*) AS BIGINT) AS dc FROM (
                  SELECT ca AS c FROM wc UNION ALL SELECT cb FROM wc)
                GROUP BY c)
         SELECT m.m AS n_edges, count(*) AS n_communities,
           round(sum(CAST(coalesce(i.ec, 0) AS DOUBLE) / m.m -
             (dm.dc / (2.0 * m.m)) * (dm.dc / (2.0 * m.m))), 4) AS q
         FROM dm LEFT JOIN intra i ON i.c = dm.c CROSS JOIN m
         GROUP BY m.m""",
    "q343_katz" -> katzOracle(alphaPct = 10, iters = 3),
    "q344_betweenness" ->
      betweennessOracle(pivots = Seq(0L, 997L), depth = 4),
    "q345_ppr" -> {
      // base = (100-85)·10⁶/100 = 150000 only on seeds; 3 unrolled
      // integer rounds of the q164 shape
      val steps = (1 to 3).map { i =>
        s"""r$i AS MATERIALIZED (SELECT n.id,
             n.is_seed * 150000 + coalesce(s.s, 0) * 85 // 100 AS r
           FROM ns n LEFT JOIN (
             SELECT ew.dst, CAST(sum(r // outdeg) AS BIGINT) AS s
             FROM ew JOIN r${i - 1} v ON v.id = ew.src
             GROUP BY ew.dst) s ON s.dst = n.id)"""
      }.mkString(",\n         ")
      s"""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
               WHERE l_orderkey % 5 = 0),
         e AS (SELECT x.p AS src, y.p AS dst
               FROM li x JOIN li y ON x.o = y.o AND x.p <> y.p),
         ew AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN (
                  SELECT src, count(*) AS outdeg FROM e GROUP BY src) d
                  ON d.src = e.src),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         ns AS (SELECT n.id,
                  CASE WHEN p.p_partkey IS NOT NULL THEN 1 ELSE 0 END
                    AS is_seed
                FROM nodes n LEFT JOIN (
                  SELECT DISTINCT p_partkey FROM part
                  WHERE p_partkey % 997 = 0) p ON p.p_partkey = n.id),
         r0 AS (SELECT id, CAST(is_seed * 1000000 AS BIGINT) AS r
                FROM ns),
         $steps
         SELECT id, CAST(r AS BIGINT) AS ppr_micro
         FROM r3 ORDER BY id"""
    },
    "q346_nelson_aalen" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
               FROM events GROUP BY user_id),
         p AS (SELECT user_id, min(CAST(ts AS DATE)) AS dp
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id),
         subj AS (SELECT
                    CASE WHEN dp IS NOT NULL
                           AND date_diff('day', d0, dp) <= 2
                      THEN date_diff('day', d0, dp) ELSE 2 END AS t,
                    (dp IS NOT NULL AND date_diff('day', d0, dp) <= 2)
                      AS e
                  FROM f LEFT JOIN p USING (user_id)),
         pt AS (SELECT t,
                  CAST(count(*) FILTER (WHERE e) AS BIGINT) AS n_event,
                  count(*) AS n_at
                FROM subj GROUP BY t),
         k AS (SELECT t, n_event, n_at,
                 CAST(sum(n_at) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
               FROM pt),
         k2 AS (SELECT t, n_event, n_risk,
                  sum(n_event / CAST(n_risk AS DOUBLE))
                    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS h
                FROM k)
         SELECT t, n_risk, n_event, round(h, 4) AS cum_hazard,
           round(exp(-h), 4) AS survival_fh
         FROM k2 WHERE n_event > 0 ORDER BY t""",
    "q347_lorenz" ->
      """WITH s AS (SELECT value AS m FROM events WHERE value >= 0),
         r AS (SELECT m, ntile(10) OVER (ORDER BY m) AS bucket FROM s),
         a AS (SELECT bucket, count(*) AS n, sum(m) AS vs FROM r
               GROUP BY bucket),
         t AS (SELECT CAST(sum(vs) AS DOUBLE) AS tv FROM a)
         SELECT CAST(bucket AS BIGINT) AS bucket, n,
           round(vs, 4) AS value_sum,
           round(sum(vs) OVER (ORDER BY bucket) / tv, 4) AS cum_share
         FROM a CROSS JOIN t ORDER BY bucket""",
    "q348_spearman" ->
      """WITH s AS (SELECT value AS x, CAST(user_id % 100 AS DOUBLE) AS y
               FROM events),
         rx AS (SELECT x, sum(t) OVER (ORDER BY x) - t + (t + 1) / 2.0
                    AS rx
                FROM (SELECT x, count(*) AS t FROM s GROUP BY x)),
         ry AS (SELECT y, sum(t) OVER (ORDER BY y) - t + (t + 1) / 2.0
                    AS ry
                FROM (SELECT y, count(*) AS t FROM s GROUP BY y)),
         j AS (SELECT rx.rx, ry.ry FROM s JOIN rx USING (x)
               JOIN ry USING (y)),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(rx) AS DOUBLE) AS sx,
                 CAST(sum(ry) AS DOUBLE) AS sy,
                 CAST(sum(rx * rx) AS DOUBLE) AS sxx,
                 CAST(sum(ry * ry) AS DOUBLE) AS syy,
                 CAST(sum(rx * ry) AS DOUBLE) AS sxy FROM j)
         SELECT n,
           round(CASE WHEN n * sxx - sx * sx > 0
                   AND n * syy - sy * sy > 0 THEN
             (n * sxy - sx * sy) /
               (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END,
             4) AS rho
         FROM a""",
    "q349_cohens_kappa" ->
      """WITH s AS (SELECT CAST(value > 50 AS INT) AS a,
                 CAST(value > 60 AS INT) AS b FROM events),
         cells AS (SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR)
                     AS b, count(*) AS o FROM s GROUP BY 1, 2),
         t AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM cells),
         po AS (SELECT CAST(coalesce(sum(o), 0) AS DOUBLE) AS dg
                FROM cells WHERE a = b),
         pe AS (SELECT CAST(coalesce(sum(ra.ra * cb.cb), 0) AS DOUBLE)
                  AS mp FROM
                  (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells
                   GROUP BY a) ra
                JOIN (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells
                      GROUP BY b) cb ON ra.a = cb.b)
         SELECT CAST(t.n AS BIGINT) AS n,
           round(po.dg / t.n, 4) AS po,
           round(pe.mp / (t.n * t.n), 4) AS pe,
           round(CASE WHEN pe.mp / (t.n * t.n) < 1 THEN
             (po.dg / t.n - pe.mp / (t.n * t.n)) /
               (1.0 - pe.mp / (t.n * t.n)) END, 4) AS kappa
         FROM t CROSS JOIN po CROSS JOIN pe""",
    "q351_kendall_tau" ->
      """WITH s AS (SELECT CAST(floor(value / 5) AS DOUBLE) AS x,
                 CAST(user_id % 100 AS DOUBLE) AS y
               FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
         cells AS (SELECT x, y, count(*) AS c FROM s GROUP BY x, y),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
         tx AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) AS tpx
                FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells
                      GROUP BY x)),
         ty AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) AS tpy
                FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells
                      GROUP BY y)),
         pr AS (SELECT
                  CAST(coalesce(sum(CASE WHEN b.y > a.y
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS concordant,
                  CAST(coalesce(sum(CASE WHEN b.y < a.y
                    THEN a.c * b.c ELSE 0 END), 0) AS BIGINT) AS discordant
                FROM cells a JOIN cells b ON a.x < b.x),
         f AS (SELECT n, concordant, discordant,
                 n * (n - 1) // 2 AS n0, tpx // 2 AS n1, tpy // 2 AS n2
               FROM tot, pr, tx, ty)
         SELECT n, concordant, discordant,
           round(CASE WHEN n0 > n1 AND n0 > n2 THEN
             (concordant - discordant) /
               sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
             END, 4) AS tau_b
         FROM f""",
    "q352_chao1" ->
      """WITH tk AS (SELECT source,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
               x -> x <> '')) AS w
           FROM documents),
         wc AS (SELECT source, w, count(*) AS c FROM tk GROUP BY source, w)
         SELECT source, count(*) AS d_obs,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           count(*) +
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) *
                  (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1) AS BIGINT) /
             (2.0 * (CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
               AS BIGINT) + 1)) AS chao1
         FROM wc GROUP BY source ORDER BY source""",

    // q353: feature/value strings differ between engines (Spark casts
    // floor() longs, DuckDB doubles) but v is a grouping key only —
    // the contingency PARTITION is identical, and only per-feature
    // aggregates surface,
    "q353_feature_screen" ->
      """WITH m AS (
           SELECT 'event_type' AS f, event_type AS v,
                  CAST(value > 50 AS VARCHAR) AS y FROM events
           UNION ALL
           SELECT 'user_decile', CAST(user_id % 10 AS VARCHAR),
                  CAST(value > 50 AS VARCHAR) FROM events
           UNION ALL
           SELECT 'value_bin', CAST(floor(value / 20) AS VARCHAR),
                  CAST(value > 50 AS VARCHAR) FROM events),
         mm AS (SELECT f, v, y FROM m
                WHERE v IS NOT NULL AND y IS NOT NULL),
         cells AS (SELECT f, v, y, count(*) AS o FROM mm GROUP BY f, v, y),
         vt AS (SELECT f, v, CAST(sum(o) AS BIGINT) AS rv FROM cells
                GROUP BY f, v),
         yt AS (SELECT f, y, CAST(sum(o) AS BIGINT) AS cy FROM cells
                GROUP BY f, y),
         tt AS (SELECT f, CAST(sum(o) AS DOUBLE) AS n FROM cells GROUP BY f),
         hx AS (SELECT vt.f, -sum(rv / n * ln(rv / n)) AS hf
                FROM vt JOIN tt ON vt.f = tt.f GROUP BY vt.f),
         hy AS (SELECT yt.f, -sum(cy / n * ln(cy / n)) AS hl
                FROM yt JOIN tt ON yt.f = tt.f GROUP BY yt.f),
         mi AS (SELECT c.f, sum(o / n * ln(o * n / (rv * CAST(cy AS DOUBLE))))
                  AS mi0
                FROM cells c JOIN vt ON vt.f = c.f AND vt.v = c.v
                  JOIN yt ON yt.f = c.f AND yt.y = c.y
                  JOIN tt ON tt.f = c.f
                GROUP BY c.f)
         SELECT tt.f AS feature, CAST(tt.n AS BIGINT) AS n,
           round(hy.hl, 4) AS h_label,
           round(mi.mi0, 4) AS info_gain,
           round(CASE WHEN hx.hf > 0 THEN mi.mi0 / hx.hf END, 4)
             AS gain_ratio
         FROM tt JOIN hy ON hy.f = tt.f JOIN hx ON hx.f = tt.f
           JOIN mi ON mi.f = tt.f
         ORDER BY feature""",
    "q354_forecast_backtest" ->
      """WITH sd AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 avg(value) AS v FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, v,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY day) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n,
                 lag(v, 7) OVER (PARTITION BY event_type
                   ORDER BY day) AS f,
                 abs(v - lag(v, 1) OVER (PARTITION BY event_type
                   ORDER BY day)) AS d1
               FROM sd),
         g AS (SELECT event_type, any_value(n) AS n,
                 any_value(n) - 7 AS n_train,
                 avg(CASE WHEN rn > n - 7 THEN abs(f - v) END) AS mae,
                 avg(CASE WHEN rn >= 2 AND rn <= n - 7 THEN d1 END)
                   AS scale,
                 avg(CASE WHEN rn > n - 7 THEN
                   CASE WHEN abs(f) + abs(v) > 0 THEN
                     2.0 * abs(f - v) / (abs(f) + abs(v))
                   ELSE 0.0 END END) AS smape
               FROM w WHERE n >= 15 GROUP BY event_type)
         SELECT event_type, n, n_train, mae,
           CASE WHEN scale > 0 THEN mae / scale END AS mase, smape
         FROM g ORDER BY event_type""",

    // q355: per-key min-max identity replay of the per-key PAV —
    // max_{i<=k} min_{j>=k} avg(i..j) within each event_type,
    "q355_isotonic_by_key" ->
      """WITH s AS (SELECT event_type AS k,
                 CAST(floor(value / 5) AS BIGINT) AS bin,
                 CAST(user_id % 97 < value AS BIGINT) AS y FROM events),
         b AS (SELECT k, bin, count(*) AS n, sum(y) AS pos
               FROM s GROUP BY k, bin),
         c AS (SELECT k, bin, CAST(n AS BIGINT) AS n,
                 CAST(pos AS BIGINT) AS pos,
                 row_number() OVER (PARTITION BY k ORDER BY bin) AS r,
                 CAST(sum(n) OVER (PARTITION BY k ORDER BY bin)
                   AS BIGINT) AS cn,
                 CAST(sum(pos) OVER (PARTITION BY k ORDER BY bin)
                   AS BIGINT) AS cp FROM b),
         pr AS (SELECT i.k, i.r AS i, j.r AS j,
                  CAST(j.cp - i.cp + i.pos AS DOUBLE) /
                    (j.cn - i.cn + i.n) AS m
                FROM c i JOIN c j ON i.k = j.k AND i.r <= j.r),
         mn AS (SELECT pr.k, pr.i, x.r AS xr, min(pr.m) AS v
                FROM pr JOIN c x ON x.k = pr.k AND pr.i <= x.r
                  AND pr.j >= x.r
                GROUP BY pr.k, pr.i, x.r),
         fit AS (SELECT k, xr, max(v) AS cal FROM mn GROUP BY k, xr)
         SELECT c.k, c.bin, c.n, c.pos,
           CAST(c.pos AS DOUBLE) / c.n AS rate,
           f.cal AS calibrated
         FROM c JOIN fit f ON f.k = c.k AND f.xr = c.r
         ORDER BY c.k, c.bin""",

    // p mirrors the Spark op's maxPoints = 60 cap (first 60 days per
    // type by day order — id = t = di, so the orders coincide): the
    // current corpus spans 30 days, but a longer corpus must truncate
    // IDENTICALLY in both engines, not silently diverge,
    "q356_theil_sen" ->
      """WITH sd AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 avg(value) AS v FROM events GROUP BY 1, 2),
         p AS (SELECT event_type,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY day) AS rn,
                 CAST(date_diff('day', DATE '1970-01-01', day)
                   AS DOUBLE) AS t, v
               FROM sd QUALIFY rn <= 60),
         pr AS (SELECT a.event_type, (b.v - a.v) / (b.t - a.t) AS slope
                FROM p a JOIN p b ON a.event_type = b.event_type
                  AND a.rn < b.rn AND a.t <> b.t),
         r AS (SELECT event_type, slope,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY slope) AS sr,
                 count(*) OVER (PARTITION BY event_type) AS m FROM pr)
         SELECT event_type, any_value(m) AS n_pairs,
           sum(slope) / count(*) AS slope
         FROM r WHERE sr = (m + 1) // 2 OR sr = (m + 2) // 2
         GROUP BY event_type ORDER BY event_type""",
    "q357_gapped_sequences" ->
      """WITH p AS (SELECT user_id AS k, event_type AS tp,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS i
               FROM events QUALIFY i <= 12),
         two AS (SELECT a.k, a.i AS i1, b.i AS i2,
                   a.tp || '->' || b.tp AS seq
                 FROM p a JOIN p b ON a.k = b.k AND a.i < b.i),
         three AS (SELECT t.k, t.seq || '->' || c.tp AS seq
                   FROM two t JOIN p c ON t.k = c.k AND t.i2 < c.i),
         al AS (SELECT k, seq, 2 AS len FROM two
                UNION ALL SELECT k, seq, 3 FROM three),
         g AS (SELECT seq, len, k, count(*) AS c FROM al
               GROUP BY 1, 2, 3)
         SELECT seq, CAST(len AS BIGINT) AS len, count(*) AS support,
           CAST(sum(c) AS BIGINT) AS occurrences
         FROM g GROUP BY seq, len HAVING count(*) >= 10
         ORDER BY len, seq""",

    // q358: the Poisson thresholds interpolate from the ONE Scala
    // source (Experiment.poissonCum) — shortest-repr doubles round-trip,
    "q358_bootstrap_ci" -> {
      val caseW = graft.ops.Experiment.poissonCum.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString(" ")
      val loR = math.max(1, math.ceil(0.025 * 200).toInt)
      val hiR = math.min(200, math.ceil(0.975 * 200).toInt)
      s"""WITH s AS (SELECT event_id AS id, value AS v FROM events
               WHERE value IS NOT NULL),
         f AS (SELECT id, v, unnest(range(0, 200)) AS b FROM s),
         uu AS (SELECT v, b,
                  CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
                    CAST(b AS VARCHAR)), 1, 15) AS BIGINT)
                    / 1152921504606846976.0 AS u
                FROM f),
         w AS (SELECT v, b, CASE $caseW ELSE 8 END AS w FROM uu),
         reps AS (SELECT b, sum(w * v) AS sv, CAST(sum(w) AS BIGINT) AS sw
                  FROM w GROUP BY b),
         m AS (SELECT b, sv / sw AS m FROM reps WHERE sw > 0),
         r AS (SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM m),
         t AS (SELECT count(*) AS n, sum(v) / count(*) AS mean FROM s)
         SELECT t.n, CAST(200 AS BIGINT) AS n_boot, t.mean,
           lo.m AS lo, hi.m AS hi
         FROM t, (SELECT m FROM r WHERE r = $loR) lo,
              (SELECT m FROM r WHERE r = $hiR) hi"""
    },
    "q359_bleu_pairs" ->
      s"""WITH ${PortableSql.minhashVerifiedPairCtes},
         dt AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x <> '') AS tk
                FROM documents WHERE doc_id < 200),
         pairx AS (SELECT c.a_id, c.b_id, a.tk AS ta, b.tk AS tb
                   FROM cand c JOIN dt a ON a.doc_id = c.a_id
                     JOIN dt b ON b.doc_id = c.b_id),
         gg AS (SELECT a_id, b_id, len(ta) AS r, len(tb) AS c, ta, tb,
                  list_transform(range(len(ta) - 1),
                    i -> ta[i + 1] || ' ' || ta[i + 2]) AS ga2,
                  list_transform(range(len(tb) - 1),
                    i -> tb[i + 1] || ' ' || tb[i + 2]) AS gb2
                FROM pairx),
         sc AS (SELECT a_id, b_id, r, c,
                  CAST(coalesce(list_sum(list_transform(list_distinct(tb),
                    t -> least(len(list_filter(tb, x -> x = t)),
                               len(list_filter(ta, x -> x = t))))), 0)
                    AS DOUBLE) AS m1,
                  CASE WHEN c >= 2 THEN
                    CAST(coalesce(list_sum(list_transform(
                      list_distinct(gb2),
                      t -> least(len(list_filter(gb2, x -> x = t)),
                                 len(list_filter(ga2, x -> x = t))))), 0)
                      AS DOUBLE)
                  ELSE 0.0 END AS m2
                FROM gg),
         pp AS (SELECT a_id, b_id, r, c,
                  CASE WHEN c > 0 THEN m1 / c ELSE 0.0 END AS p1,
                  CASE WHEN c >= 2 THEN m2 / (c - 1) ELSE 0.0 END AS p2,
                  CASE WHEN c = 0 THEN 0.0 WHEN c >= r THEN 1.0
                    ELSE exp(1.0 - CAST(r AS DOUBLE) / c) END AS bp
                FROM sc)
         SELECT a_id, b_id, CAST(r AS BIGINT) AS n_ref,
           CAST(c AS BIGINT) AS n_cand,
           round(CASE WHEN p1 > 0 AND p2 > 0 THEN
             bp * exp((ln(p1) + ln(p2)) / 2) ELSE 0.0 END, 4) AS bleu
         FROM pp ORDER BY a_id, b_id""",
    "q360_bootstrap_diff" -> {
      val caseW = graft.ops.Experiment.poissonCum.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString(" ")
      val loR = math.max(1, math.ceil(0.025 * 200).toInt)
      val hiR = math.min(200, math.ceil(0.975 * 200).toInt)
      s"""WITH s AS (SELECT event_id AS id, event_type AS arm, value AS v
               FROM events WHERE value IS NOT NULL
                 AND event_type IN ('click', 'view')),
         f AS (SELECT id, arm, v, unnest(range(0, 200)) AS b FROM s),
         uu AS (SELECT arm, v, b,
                  CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
                    CAST(b AS VARCHAR)), 1, 15) AS BIGINT)
                    / 1152921504606846976.0 AS u
                FROM f),
         w AS (SELECT arm, v, b, CASE $caseW ELSE 8 END AS w FROM uu),
         reps AS (SELECT b,
             sum(CASE WHEN arm = 'click' THEN w * v END) AS sva,
             CAST(sum(CASE WHEN arm = 'click' THEN w END) AS BIGINT)
               AS swa,
             sum(CASE WHEN arm = 'view' THEN w * v END) AS svb,
             CAST(sum(CASE WHEN arm = 'view' THEN w END) AS BIGINT)
               AS swb
           FROM w GROUP BY b),
         m AS (SELECT b, sva / swa - svb / swb AS m FROM reps
               WHERE swa > 0 AND swb > 0),
         r AS (SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM m),
         t AS (SELECT
             CAST(sum(CASE WHEN arm = 'click' THEN 1 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 'view' THEN 1 END) AS BIGINT)
               AS n_b,
             sum(CASE WHEN arm = 'click' THEN v END) /
               sum(CASE WHEN arm = 'click' THEN 1 END) -
               sum(CASE WHEN arm = 'view' THEN v END) /
                 sum(CASE WHEN arm = 'view' THEN 1 END) AS diff
           FROM s)
         SELECT t.n_a, t.n_b, CAST(200 AS BIGINT) AS n_boot, t.diff,
           lo.m AS lo, hi.m AS hi
         FROM t, (SELECT m FROM r WHERE r = $loR) lo,
              (SELECT m FROM r WHERE r = $hiR) hi"""
    },
    "q361_louvain" -> louvainOracle(rounds = 3),
    "q362_louvain_two_level" -> louvainTwoLevelOracle(r1 = 3, r2 = 3),
    "q363_louvain_modularity" -> louvainModularityOracle(r1 = 3, r2 = 3),
    "q364_louvain_levels" -> louvainLevelsOracle(mod = 9, r = 3),
    "q365_kcore_weighted" -> kCoreWeightedOracle(k = 20, rounds = 8),
    "q366_pagerank_weighted" -> pageRankWeightedOracle(iters = 3),
    "q367_louvain_rounds" -> louvainRoundsKneeOracle(mod = 9, r = 6),
    "q369_louvain_l2_rounds" ->
      louvainLevel2KneeOracle(mod = 9, r1 = 3, r2 = 6),
    "q370_refine_louvain" ->
      refineLouvainOracle(mod = 9, r1 = 3, ccRounds = 10),
    "q371_refine_brands" -> refineBrandOracle(mod = 9, ccRounds = 10),
    "q372_leiden_two_level" ->
      leidenTwoLevelOracle(mod = 9, r = 3, ccRounds = 10),
    "q368_louvain_external_w" -> louvainExternalWOracle(rounds = 3,
      mod = 9)
  )
}
