package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, hash_embed, l2_norm, normalize_text}

/**
 * The 40 declared t2 verification queries (SURVEY §2.11), each implemented
 * with the DataFrame API (Catalyst-optimizable) plus, where SQL-expressible,
 * a DuckDB-dialect oracle the driver runs over the same parquet tables.
 *
 * Conventions (SURVEY §2.11): deterministic total order, floats rounded to 4
 * decimals (money to 2), aggregate/computed columns aliased identically on
 * both sides. Dialect notes: Spark `sha2(x,256)` ↔ DuckDB `sha256(x)`;
 * Spark `get_json_object` ↔ DuckDB `json_extract_string`; DuckDB
 * `regexp_replace` needs the `'g'` flag to match Spark's replace-all;
 * DuckDB `sum(BIGINT)` returns HUGEINT so oracles cast back to BIGINT;
 * DuckDB casts DOUBLE→BIGINT by rounding (Spark truncates) so integer sums
 * go through `floor` on both sides.
 */
object T2Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as both TIMESTAMP(NANOS) parquet (which Spark's
    // vectorized reader rejects — read as long nanos, truncate to µs, the
    // same coercion DuckDB applies) and plain TIMESTAMP(MICROS) (usable
    // as-is). Adapt to whichever this dataset carries so oracles agree.
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/$name.parquet")
      // Normalize to TIMESTAMP (LTZ): the NTZ→LTZ cast is instant-preserving
      // because every graft session pins spark.sql.session.timeZone=UTC, and
      // downstream epoch math (unix_micros) only accepts LTZ.
      val tsCol = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
        case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
      }
      raw.withColumn("ts", tsCol)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  /** Fixed 64-dim query vector for Q16/Q18 (SURVEY Q16: all-0.125). */
  private val qvecScala: Array[Float] = Array.fill(64)(0.125f)
  private val qvecSql: String = Array.fill(64)("0.125").mkString("[", ", ", "]")

  /** Scored embeddings scan shared by Q16/Q18: cosine vs the fixed query
    * vector, rounded before ordering so the order is reproducible across
    * engines despite float32 noise (ties broken by vec_id). */
  private def scored(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(
      col("vec_id"),
      round(cosine_similarity(col("embedding"), typedLit(qvecScala)), 4).as("sim"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / sinks (S1-S16) ----
    "q01_count_by_source" -> ((s, d) =>
      t(s, d, "documents").groupBy("source").agg(count("*").as("n")).orderBy("source")),
    "q02_flatten" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), concat_ws(" ", col("lang"), col("source")).as("flat"))
        .orderBy("doc_id").limit(50)),
    "q03_write_stats" -> ((s, d) =>
      t(s, d, "documents").agg(count("*").as("n"), sum("n_chars").as("c"))),
    "q04_count_by_lang" -> ((s, d) =>
      t(s, d, "documents").groupBy("lang").agg(count("*").as("n")).orderBy("lang")),
    "q05_meta_scan" -> ((s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 20)
        .select("doc_id", "source").orderBy("doc_id")),

    // ---- projections / scalar transforms (O1-O15) ----
    "q06_sha256" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .orderBy("doc_id").limit(100)),
    "q07_meta_projection" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), length(col("text")).as("len"),
        substring(col("text"), 1, 10).as("head")).orderBy("doc_id").limit(100)),
    "q08_normalize_ascii" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        trim(regexp_replace(col("text"), " +", " ")).as("norm"))
        .orderBy("doc_id").limit(100)),
    "q09_prompt_prefix" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        concat(lit("Query: "), substring(col("text"), 1, 20)).as("prompted"))
        .orderBy("doc_id").limit(50)),
    "q10_id_lookup_join" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("label") === 3)
      val doc = t(s, d, "documents")
      e.join(doc, e("vec_id") === doc("doc_id"))
        .select(e("vec_id"), doc("lang")).orderBy("vec_id")
    }),
    "q11_json_extract" -> ((s, d) =>
      t(s, d, "events").select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .orderBy("event_id").limit(200)),
    "q12_regex_replace" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "the", "THE").as("r"))
        .orderBy("doc_id").limit(50)),
    "q13_context_banner" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        concat(lit("CTX "), col("doc_id").cast("string"), lit(" | "), col("source"))
          .as("banner")).orderBy("doc_id").limit(50)),
    "q14_l2_norm" -> ((s, d) =>
      t(s, d, "embeddings").select(col("vec_id"),
        round(l2_norm(col("embedding")), 4).as("l2")).orderBy("vec_id").limit(100)),
    "q15_dist_to_sim" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), (col("label").cast("double") / 10).as("value"))
        .select(col("vec_id"),
          round(least(greatest(lit(1.0) - col("value"), lit(0.0)), lit(1.0)), 4).as("sim"))
        .orderBy("vec_id").limit(100)),
    "q16_topk_cosine" -> ((s, d) =>
      scored(s, d).orderBy(col("sim").desc, col("vec_id")).limit(6)),

    // ---- filters (F1-F7) ----
    "q17_nonempty_filter" -> ((s, d) =>
      t(s, d, "documents").filter(length(trim(col("text"))) > 0).agg(count("*").as("n"))),
    "q18_threshold_after_topk" -> ((s, d) =>
      // semantics pin (SURVEY §4.1): threshold applies AFTER the top-k limit
      // (0.2 splits the sf0.01 top-50 so the filter is non-trivial)
      scored(s, d).orderBy(col("sim").desc, col("vec_id")).limit(50)
        .filter(col("sim") >= 0.2).orderBy(col("sim").desc, col("vec_id"))),
    "q41_postfilter_after_topk" -> ((s, d) =>
      // non-monotone post-top-k filter — the ordering that Catalyst must NOT
      // "fix" by pushing the predicate through the limit (SURVEY §4.1.1):
      // result is the subset of the global top-50 with even vec_id, NOT the
      // top-50 even-id rows.
      scored(s, d).orderBy(col("sim").desc, col("vec_id")).limit(50)
        .filter(col("vec_id") % 2 === 0).orderBy(col("sim").desc, col("vec_id"))),
    "q19_term_filter" -> ((s, d) =>
      // case-insensitive containment via (?i) regex rather than
      // contains(lower(..)): Spark 4's collation-aware lower() pays a ~15 s
      // one-time ICU init on executors and ~5x per-row cost; the regex path
      // is equivalent for a quoted literal term and stays cheap at scale
      t(s, d, "documents").filter(col("text").rlike("(?i)spark"))
        .select("doc_id").orderBy("doc_id")),
    "q20_doctype_filter" -> ((s, d) =>
      t(s, d, "documents").filter(col("lang") === "es").select("doc_id").orderBy("doc_id")),

    // ---- joins (J1-J2 + extensions) ----
    "q21_chunk_doc_join" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val doc = t(s, d, "documents")
      e.join(doc, e("vec_id") === doc("doc_id"))
        .groupBy(doc("source")).agg(count("*").as("n")).orderBy("source")
    }),
    "q22_semi_join" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
        .select("o_orderkey").orderBy("o_orderkey").limit(500)
    }),
    "q23_anti_join" -> ((s, d) => {
      // every customer has an order at sf0.01, so anti-join against the
      // high-value subset to produce a non-degenerate result
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "q24_outer_join" -> ((s, d) => {
      val n = t(s, d, "nation")
      val sup = t(s, d, "supplier")
      n.join(sup, sup("s_nationkey") === n("n_nationkey"), "left")
        .groupBy(n("n_name")).agg(count(sup("s_suppkey")).as("n")).orderBy("n_name")
    }),

    // ---- aggregations (A1-A7 + extensions) ----
    "q25_citation_ranges" -> ((s, d) =>
      t(s, d, "documents").groupBy("source").agg(
        min("n_chars").as("lo"), max("n_chars").as("hi"), count("*").as("n"))
        .orderBy("lo", "source")),
    "q26_distinct_sets" -> ((s, d) =>
      t(s, d, "documents").groupBy("lang")
        .agg(countDistinct("source").as("nsrc")).orderBy("lang")),
    "q27_value_stats" -> ((s, d) =>
      t(s, d, "events").agg(round(min("value"), 4).as("mn"),
        round(max("value"), 4).as("mx"), round(avg("value"), 4).as("av"),
        count("*").as("n"))),
    "q28_sum_by_type" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(sum(floor(col("value"))).as("s")).orderBy("event_type")),
    "q29_count_lineitem" -> ((s, d) => t(s, d, "lineitem").agg(count("*").as("n"))),
    "q30_rollup" -> ((s, d) =>
      t(s, d, "lineitem").rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_extendedprice"), 2).as("s"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    "q31_distinct_agg" -> ((s, d) =>
      t(s, d, "lineitem").agg(countDistinct("l_partkey").as("n"))),

    // ---- sorts / limits (K1-K5) ----
    "q32_length_sort" -> ((s, d) =>
      t(s, d, "documents").orderBy(col("n_chars").desc, col("doc_id"))
        .select("doc_id").limit(100)),

    // ---- set operations (extensions) ----
    "q33_union" -> ((s, d) => {
      val doc = t(s, d, "documents")
      doc.filter(col("lang") === "es").select(col("doc_id").as("x"))
        .unionAll(doc.filter(col("lang") === "zh").select(col("doc_id").as("x")))
        .orderBy("x")
    }),
    "q34_intersect" -> ((s, d) => {
      val doc = t(s, d, "documents")
      doc.filter(col("lang") === "es").select("doc_id")
        .intersect(doc.filter(col("n_chars") > 200).select("doc_id"))
        .orderBy("doc_id")
    }),

    // ---- windows (extensions) ----
    "q35_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer").withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3).select("c_custkey", "rnk").orderBy("c_custkey")
    }),
    "q36_window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-2, 0)
      t(s, d, "orders")
        .select(col("o_orderkey"), round(sum("o_totalprice").over(w), 2).as("r"))
        .orderBy("o_orderkey").limit(500)
    }),

    // ---- dates / streaming-shape aggregations ----
    "q37_date_group" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderdate").cast("date").as("d"))
        .groupBy("d").agg(count("*").as("n")).orderBy("d").limit(365)),
    "q38_tumbling_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count("*").as("n"), round(sum("value"), 2).as("s"))
        .orderBy("h", "event_type")),
    "q39_per_user_stats" -> ((s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(count("*").as("n"), max("ts").as("last_ts")).orderBy("user_id")),

    "q77_approx_distinct" -> ((s, d) =>
      // HLL++ distinct-count sketch (mergeable partial aggregate — the
      // 100 TB cardinality path) verified within its rsd bound against the
      // exact distinct count, which stays the oracle row
      t(s, d, "events").groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users"),
          approx_count_distinct("user_id", 0.02).as("approx_users"),
          countDistinct("value").as("exact_values"),
          approx_count_distinct("value", 0.02).as("approx_values"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            greatest(col("exact_users") * 0.1, lit(5.0))).as("users_ok"),
          (abs(col("approx_values") - col("exact_values")) <=
            col("exact_values") * 0.1).as("values_ok"))
        .orderBy("event_type")),

    "q78_zorder_key" -> ((s, d) => {
      // Morton/z-order clustering key over two dimensions — the layout that
      // keeps parquet min/max stats tight on BOTH columns at write time
      val u = ((col("user_id") % 64) + 64) % 64
      val v = ((floor(col("value")).cast("bigint") % 64) + 64) % 64
      t(s, d, "events")
        .select(col("event_id"), graft.ops.Scale.zOrderKey(u, v).as("z"))
        .orderBy("z", "event_id").limit(100)
    }),

    "q73_asof_join" -> ((s, d) => {
      // as-of join, the temporal operator Spark lacks as a keyword: each
      // purchase matched to the user's most recent preceding-or-equal view.
      // Scale shape: ONE window over the union (partition by user, order by
      // time) carrying the last view id forward — no per-row range probe,
      // no nested-loop; the only shuffle is the user partitioning.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("view_id",
          when(col("event_type") === "view", col("event_id")))
        .withColumn("prior_view", last("view_id", ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("prior_view"))
        .orderBy("event_id")
    }),

    "q123_skew_report" -> ((s, d) => {
      // shuffle-skew diagnosis: per-key row counts of the orders->customer
      // join key reduced to the stats a salting/AQE decision needs (max,
      // mean, skew factor, share of the hottest key). Two partial-agg
      // reductions; nothing wide survives
      val counts = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      counts.agg(count(lit(1)).as("n_keys"),
          max("n").as("max_n"),
          sum("n").as("total"))
        .select(col("n_keys"), col("max_n"),
          round(col("max_n") / (col("total") / col("n_keys")).cast("double"), 4)
            .as("skew_factor"),
          round(col("max_n") / col("total").cast("double"), 6).as("top_share"))
    }),

    "q121_retention" -> ((s, d) => {
      // weekly retention cohorts: cohort = a user's first active ISO
      // week; retained = active again exactly `offset` weeks later.
      // Two partial-agg shuffles (user-week distinct, then cohort join on
      // user) — the cohort table is one row per user
      val ev = t(s, d, "events")
        .select(col("user_id"),
          floor(unix_micros(col("ts")) / (7L * 86400 * 1000000)).as("wk"))
        .distinct()
      val cohorts = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      ev.join(cohorts, "user_id")
        .withColumn("offset", (col("wk") - col("cohort_wk")).cast("int"))
        .groupBy("cohort_wk", "offset")
        .agg(count_distinct(col("user_id")).as("users"))
        .filter(col("offset") <= 3)
        .orderBy("cohort_wk", "offset")
    }),

    "q119_funnel" -> ((s, d) => {
      // conversion funnel: purchases preceded by the same user's view
      // within one hour — q73's carry-forward window plus a time bound,
      // reduced to funnel totals; no per-row range probe, one user shuffle
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val hourUs = 3600L * 1000000
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), unix_micros(col("ts")).as("us"))
        .withColumn("view_us",
          when(col("event_type") === "view", col("us")))
        .withColumn("pv", last("view_us", ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .agg(count(lit(1)).as("purchases"),
          sum(when(col("us") - col("pv") <= hourUs, 1L).otherwise(0L))
            .as("converted"),
          count_distinct(when(col("us") - col("pv") <= hourUs, col("user_id")))
            .as("users_converted"))
    }),

    "q74_sessionize_batch" -> ((s, d) => {
      // batch twin of StreamingOps.sessionize: 30-min inactivity gap via
      // lag + cumulative-flag windows (both share the per-user partition —
      // one shuffle), then per-session aggregation
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(col("us") - lag("us", 1).over(byUser) > 30L * 60 * 1000000, 1L)
            .otherwise(lit(0L)))
        .withColumn("sess", sum("new_sess")
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count("*").as("n_events"), round(sum("value"), 2).as("value_sum"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("value_sum"))
        .orderBy("user_id", "session_start")
    }),

    // ---- end-to-end retrieval slice (Q40; rows-only check, SURVEY §5.5) ----
    "q40_retrieval_e2e" -> ((s, d) => {
      import graft.functions.{chunk_document, normalize_query_text}
      val qv = hash_embed(normalize_query_text(
        lit("the quick analysis of lineitem shipping data")))
      val chunks = t(s, d, "documents")
        .select(col("doc_id"), chunk_document(col("text"), lit(120), lit(60)))
        .select(col("doc_id"), col("chunk_index"),
          normalize_text(col("chunk_text")).as("text"))
        .filter(col("text").isNotNull)
        // portable chunk id (md5, like Curation.splitAssign) so the DuckDB
        // oracle reproduces it; xxhash64 would be Spark-only
        .withColumn("id", graft.expr.PortableHash.hex15Col(concat(
          col("doc_id").cast("string"), lit(":"),
          col("chunk_index").cast("string"))))
      chunks
        .select(col("id"), col("doc_id"), col("text"),
          round(cosine_similarity(hash_embed(col("text")), qv), 4).as("sim"))
        .orderBy(col("sim").desc, col("id")).limit(6)
        .filter(col("sim") >= 0.15)
        .orderBy(col("sim").desc, col("id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_count_by_source" ->
      "SELECT source, count(*) AS n FROM documents GROUP BY source ORDER BY source",
    "q02_flatten" ->
      "SELECT doc_id, concat_ws(' ', lang, source) AS flat FROM documents ORDER BY doc_id LIMIT 50",
    "q03_write_stats" ->
      "SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS c FROM documents",
    "q04_count_by_lang" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
    "q05_meta_scan" ->
      "SELECT doc_id, source FROM documents WHERE doc_id < 20 ORDER BY doc_id",
    "q06_sha256" ->
      "SELECT doc_id, sha256(text) AS h FROM documents ORDER BY doc_id LIMIT 100",
    "q07_meta_projection" ->
      "SELECT doc_id, length(text) AS len, substr(text, 1, 10) AS head FROM documents ORDER BY doc_id LIMIT 100",
    "q08_normalize_ascii" ->
      "SELECT doc_id, trim(regexp_replace(text, ' +', ' ', 'g')) AS norm FROM documents ORDER BY doc_id LIMIT 100",
    "q09_prompt_prefix" ->
      "SELECT doc_id, concat('Query: ', substr(text, 1, 20)) AS prompted FROM documents ORDER BY doc_id LIMIT 50",
    "q10_id_lookup_join" ->
      "SELECT e.vec_id, d.lang FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id WHERE e.label = 3 ORDER BY e.vec_id",
    "q11_json_extract" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id LIMIT 200",
    "q12_regex_replace" ->
      "SELECT doc_id, regexp_replace(text, 'the', 'THE', 'g') AS r FROM documents ORDER BY doc_id LIMIT 50",
    "q13_context_banner" ->
      "SELECT doc_id, concat('CTX ', CAST(doc_id AS VARCHAR), ' | ', source) AS banner FROM documents ORDER BY doc_id LIMIT 50",
    "q14_l2_norm" ->
      "SELECT vec_id, round(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)*x), 'sum')), 4) AS l2 FROM embeddings ORDER BY vec_id LIMIT 100",
    "q15_dist_to_sim" ->
      "SELECT vec_id, round(least(greatest(1.0 - value, 0.0), 1.0), 4) AS sim FROM (SELECT vec_id, CAST(label AS DOUBLE)/10 AS value FROM embeddings) t ORDER BY vec_id LIMIT 100",
    "q16_topk_cosine" ->
      s"SELECT vec_id, round(list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), $qvecSql), 4) AS sim FROM embeddings ORDER BY sim DESC, vec_id LIMIT 6",
    "q17_nonempty_filter" ->
      "SELECT count(*) AS n FROM documents WHERE length(trim(text)) > 0",
    "q18_threshold_after_topk" ->
      s"SELECT * FROM (SELECT vec_id, round(list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), $qvecSql), 4) AS sim FROM embeddings ORDER BY sim DESC, vec_id LIMIT 50) t WHERE sim >= 0.2 ORDER BY sim DESC, vec_id",
    "q41_postfilter_after_topk" ->
      s"SELECT * FROM (SELECT vec_id, round(list_cosine_similarity(list_transform(embedding, x -> CAST(x AS DOUBLE)), $qvecSql), 4) AS sim FROM embeddings ORDER BY sim DESC, vec_id LIMIT 50) t WHERE vec_id % 2 = 0 ORDER BY sim DESC, vec_id",
    "q19_term_filter" ->
      "SELECT doc_id FROM documents WHERE regexp_matches(text, '(?i)spark') ORDER BY doc_id",
    "q20_doctype_filter" ->
      "SELECT doc_id FROM documents WHERE lang = 'es' ORDER BY doc_id",
    "q21_chunk_doc_join" ->
      "SELECT d.source, count(*) AS n FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id GROUP BY d.source ORDER BY d.source",
    "q22_semi_join" ->
      "SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') ORDER BY o_orderkey LIMIT 500",
    "q23_anti_join" ->
      "SELECT c_custkey FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000) ORDER BY c_custkey",
    "q24_outer_join" ->
      "SELECT n.n_name, count(s.s_suppkey) AS n FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY n.n_name",
    "q25_citation_ranges" ->
      "SELECT source, min(n_chars) AS lo, max(n_chars) AS hi, count(*) AS n FROM documents GROUP BY source ORDER BY lo, source",
    "q26_distinct_sets" ->
      "SELECT lang, count(DISTINCT source) AS nsrc FROM documents GROUP BY lang ORDER BY lang",
    "q27_value_stats" ->
      "SELECT round(min(value), 4) AS mn, round(max(value), 4) AS mx, round(avg(value), 4) AS av, count(*) AS n FROM events",
    "q28_sum_by_type" ->
      "SELECT event_type, CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS s FROM events GROUP BY event_type ORDER BY event_type",
    "q29_count_lineitem" ->
      "SELECT count(*) AS n FROM lineitem",
    "q30_rollup" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS s FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST",
    "q31_distinct_agg" ->
      "SELECT count(DISTINCT l_partkey) AS n FROM lineitem",
    "q32_length_sort" ->
      "SELECT doc_id FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100",
    "q33_union" ->
      "SELECT x FROM (SELECT doc_id AS x FROM documents WHERE lang='es' UNION ALL SELECT doc_id AS x FROM documents WHERE lang='zh') t ORDER BY x",
    "q34_intersect" ->
      "SELECT doc_id FROM documents WHERE lang='es' INTERSECT SELECT doc_id FROM documents WHERE n_chars > 200 ORDER BY doc_id",
    "q35_window_rank" ->
      "SELECT c_custkey, rnk FROM (SELECT c_custkey, rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk FROM customer) t WHERE rnk <= 3 ORDER BY c_custkey",
    "q36_window_frame" ->
      "SELECT o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS r FROM orders ORDER BY o_orderkey LIMIT 500",
    "q37_date_group" ->
      "SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n FROM orders GROUP BY d ORDER BY d LIMIT 365",
    "q38_tumbling_window" ->
      "SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n, round(sum(value), 2) AS s FROM events GROUP BY h, event_type ORDER BY h, event_type",
    "q39_per_user_stats" ->
      "SELECT user_id, count(*) AS n, max(ts) AS last_ts FROM events GROUP BY user_id ORDER BY user_id",
    "q77_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
                TRUE AS users_ok, TRUE AS values_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q78_zorder_key" -> {
      val terms = (0 until 8).map(b =>
        s"((u >> $b) & 1) * ${1L << (2 * b)} + ((v >> $b) & 1) * ${1L << (2 * b + 1)}")
        .mkString(" + ")
      s"""WITH e AS (
           SELECT event_id, ((user_id % 64) + 64) % 64 AS u,
                  ((CAST(floor(value) AS BIGINT) % 64) + 64) % 64 AS v
           FROM events)
         SELECT event_id, $terms AS z FROM e ORDER BY z, event_id LIMIT 100"""
    },
    "q73_asof_join" ->
      """SELECT event_id, user_id, prior_view FROM (
           SELECT event_id, user_id, event_type,
                  last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_view
           FROM events) t
         WHERE event_type = 'purchase' ORDER BY event_id""",
    "q123_skew_report" ->
      """WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
                    FROM orders GROUP BY o_custkey)
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
                CAST(max(n) AS BIGINT) AS max_n,
                round(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)), 4) AS skew_factor,
                round(max(n) / CAST(sum(n) AS DOUBLE), 6) AS top_share
         FROM c""",

    "q121_retention" ->
      """WITH ev AS (
           SELECT DISTINCT user_id,
                  CAST(floor(epoch_us(ts) / (7::BIGINT * 86400 * 1000000)) AS BIGINT) AS wk
           FROM events),
         c AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
         SELECT c.cohort_wk, CAST(ev.wk - c.cohort_wk AS INT) AS "offset",
                CAST(count(DISTINCT ev.user_id) AS BIGINT) AS users
         FROM ev JOIN c ON ev.user_id = c.user_id
         WHERE ev.wk - c.cohort_wk <= 3
         GROUP BY c.cohort_wk, "offset" ORDER BY cohort_wk, "offset" """,

    "q119_funnel" ->
      """WITH p AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
                  last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv
           FROM events)
         SELECT CAST(count(*) AS BIGINT) AS purchases,
                CAST(sum(CASE WHEN us - pv <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS converted,
                CAST(count(DISTINCT CASE WHEN us - pv <= 3600000000 THEN user_id END) AS BIGINT) AS users_converted
         FROM p WHERE event_type = 'purchase'""",

    "q74_sessionize_batch" ->
      """WITH g AS (
           SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
                  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                       THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts, value,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM g)
         SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events, round(sum(value), 2) AS value_sum
         FROM s GROUP BY user_id, sess ORDER BY user_id, session_start""",
    // q40: the full retrieval slice — chunk(120/60) → normalize → md5
    // hash-embed → top-6 cosine → threshold 0.15 after top-k — replicated
    // relationally from the portable kernels (SURVEY §5.5, PortableSql).
    "q40_retrieval_e2e" ->
      s"""WITH ${PortableSql.chunkCtes(size = 120, step = 60)},
         ids AS (
           SELECT CAST('0x' || substr(md5(doc_id || ':' || chunk_index), 1, 15)
                  AS BIGINT) AS id, doc_id, chunk_index, ntext
           FROM chunks),
         ${PortableSql.bucketCtes("c", "chunks", "doc_id, chunk_index")},
         ${PortableSql.queryBucketCtes(
             "'the quick analysis of lineitem shipping data'")},
         qn AS (SELECT sqrt(sum(wt * wt)) AS n FROM qbuck),
         norms AS (
           SELECT doc_id, chunk_index, sqrt(sum(wt * wt)) AS n
           FROM cbuck GROUP BY doc_id, chunk_index),
         dots AS (
           SELECT c.doc_id, c.chunk_index, sum(c.wt * q.wt) AS dot
           FROM cbuck c JOIN qbuck q ON c.b = q.b GROUP BY c.doc_id, c.chunk_index),
         sims AS (
           SELECT i.id, i.doc_id, i.ntext AS text,
                  round(coalesce(d.dot, 0) / (n.n * (SELECT n FROM qn)), 4) AS sim
           FROM ids i
           JOIN norms n ON i.doc_id = n.doc_id AND i.chunk_index = n.chunk_index
           LEFT JOIN dots d ON i.doc_id = d.doc_id AND i.chunk_index = d.chunk_index),
         topk AS (
           SELECT *, row_number() OVER (ORDER BY sim DESC, id) AS rn FROM sims)
         SELECT id, doc_id, text, sim FROM topk
         WHERE rn <= 6 AND sim >= 0.15 ORDER BY sim DESC, id"""
  )
}
