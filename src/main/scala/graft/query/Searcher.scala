package graft.query

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashEmbedder}
import graft.expr.TextNorm
import graft.functions.cosine_similarity
import graft.store.VectorStore

/**
 * Query path (SURVEY §3.2), re-expressing
 * `QueryVectorDB.search` (`/root/reference/vector_db_query.py:141-263`):
 *
 * embed query on the driver (O13) → brute-force cosine over the vectors
 * table (O15/K1: column-pruned `(id, vector)` scan fused with the cosine
 * expression, planned as `TakeOrderedAndProject` — per-partition heaps, no
 * global sort) → similarity threshold AFTER top-k (F5, §4.1 contract) →
 * broadcast id-lookup join back for text+metadata (J1) → post-top-k
 * search-term (F6) and document-type (F7) filters → score fields injected
 * (O14).
 *
 * One job; the only exchange is the k-row top-k merge onto the driver side
 * of the broadcast join — the shape that survives a 1000-executor scan.
 */
final class Searcher(spark: SparkSession, store: VectorStore) {

  // Process-cached query state (SURVEY §4.2), the Spark analogue of the
  // reference's thread-local QueryVectorDB cache
  // (`/root/reference/vector_db_query.py:289-317`): repeated queries against
  // the same db reuse one cached vectors DataFrame instead of re-reading
  // parquet footers per query. Opt-in via warm(db).
  private val cachedVectors =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Cache the db's vectors table in memory for repeated queries. */
  def warm(db: String): Unit =
    cachedVectors.getOrElseUpdate(db, store.vectors(db).cache())

  /** Drop the cached table (reference `close()`). */
  def cool(db: String): Unit =
    cachedVectors.remove(db).foreach(_.unpersist())

  private def vectorsOf(db: String): DataFrame =
    cachedVectors.getOrElse(db, store.vectors(db))

  /**
   * Two-phase search, the reference's own shape (§3.2: FLAT scan, then
   * `multi_index[ids]` point lookup):
   *
   * Phase 1 scores `(id, vector)` only — at 100 TB this is the whole read —
   * and lands ≤ k rows on the driver. Empty after threshold → return
   * without a lookup job (§4.1.2 short-circuit). Phase 2 re-reads only
   * `(id, text, metadata)` with an `id IN (...)` predicate pushed into
   * parquet: the vectors table is written range-partitioned and sorted by
   * id, so row-group min/max stats reduce the lookup to point reads — a
   * broadcast join here would rescan the full text+metadata columns.
   */
  def search(db: String, query: String, p: Searcher.Params = Searcher.Params()): DataFrame = {
    // O5 + O6 + O13 on the driver; the query vector ships as a literal, so
    // the executor-side scan needs no broadcast variable at all
    val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(query)) { fam =>
      graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
        TextNorm.normalizeQuery(query))
    }
    val qvec = p.embedder.embed(prompted)

    val vectors = vectorsOf(db)
    val topk = vectors
      .select(col("id"), cosine_similarity(col("vector"), typedLit(qvec)).as("sim"))
      .orderBy(col("sim").desc, col("id")) // deterministic tie-break (SURVEY §7.4.4)
      .limit(p.k)
      .filter(col("sim") >= p.threshold) // F5: threshold after top-k (§4.1)
      .collect()

    val spark2 = spark
    import spark2.implicits._
    if (topk.isEmpty) // §4.1.2: no lookup job when nothing passes
      return emptyHits(vectors)

    val sims = topk.map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val simDf = sims.toDF("id", "sim")
    val looked = vectors
      .filter(col("id").isin(sims.map(_._1): _*)) // pushed to parquet stats
      .select("id", "text", "metadata")
      .join(broadcast(simDf), Seq("id"))

    val termFiltered = p.searchTerm.filter(_.nonEmpty).fold(looked) { term =>
      // F6: case-insensitive containment, post-top-k; (?i)+quote instead of
      // contains(lower(..)) — see T2Queries q19 note on Spark 4 lower()
      looked.filter(col("text").rlike("(?i)" + Pattern.quote(term)))
    }
    val typeFiltered = p.documentTypeFilter.filter(_.nonEmpty).fold(termFiltered) { v =>
      termFiltered.filter(col("metadata.document_type") === v) // F7
    }

    typeFiltered
      .withColumn("similarity_score",
        least(greatest(col("sim"), lit(0.0)), lit(1.0))) // O14 clip
      .withColumn("distance", lit(1.0) - col("sim"))
      .drop("sim")
      .orderBy(col("similarity_score").desc, col("id"))
  }

  /** Collected `(context, metadata)` pairs formatted as the reference's
    * context blocks (`/root/reference/vector_db_query.py:61-74`). */
  def formattedContexts(db: String, query: String, p: Searcher.Params = Searcher.Params()): String = {
    val rows = search(db, query, p)
      .select(col("text"), col("metadata.file_name").as("file_name")).collect()
    graft.format.ContextFormatter.formatBlocks(
      rows.map(r => (r.getString(0), r.getString(1))).toIndexedSeq)
  }

  /**
   * Batched multi-query search — a Spark-native capability the one-query-
   * at-a-time reference cannot express: all queries score against ONE pass
   * over the vectors table (each row evaluates every query vector from a
   * small broadcast), then per-query top-k via [[graft.ops.TopKAggregator]]
   * — a bounded partial aggregate, NOT a window rank: each scan partition
   * reduces to ≤ k rows per query before the exchange, so the shuffle
   * carries ≤ partitions×queries×k structs and nothing ever sorts the full
   * table (the window formulation funneled every `(query_id, id, sim)`
   * triple into one task per query — the 100 TB killer). Threshold still
   * applies after the per-query top-k (§4.1).
   */
  def searchMany(db: String, queries: Seq[(String, String)],
      p: Searcher.Params = Searcher.Params()): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val qvecs = queries.map { case (qid, text) =>
      val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(text)) { fam =>
        graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
          TextNorm.normalizeQuery(text))
      }
      (qid, p.embedder.embed(prompted))
    }
    val qdf = qvecs.toDF("query_id", "qvec")
    val vectors = vectorsOf(db)
    val scored = vectors.select(col("id"), col("vector"))
      .crossJoin(broadcast(qdf))
      .select(col("query_id"), col("id"),
        cosine_similarity(col("vector"), col("qvec")).as("sim"))
    graft.ops.TopK.perGroup(scored, Seq(col("query_id")), col("id"), col("sim"), p.k)
      .filter(col("sim") >= p.threshold) // after top-k, per query
      .join(vectors.select("id", "text", "metadata"), Seq("id"))
      .withColumn("similarity_score", least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .select("query_id", "id", "text", "metadata", "similarity_score", "distance")
      .orderBy(col("query_id"), col("similarity_score").desc, col("id"))
  }

  /** Schema-correct empty result (the §4.1.2 short-circuit target). */
  private def emptyHits(vectors: DataFrame): DataFrame = {
    val hitSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      vectors.schema("metadata"),
      org.apache.spark.sql.types.StructField("similarity_score",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("distance",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], hitSchema)
  }

  /** Approximate search over a clustered store
    * ([[graft.store.VectorStore.writeVectorsClustered]]): probes only the
    * query's LSH cell plus `probes` 1-bit-flip neighbors — Spark partition
    * pruning turns the probe list into a directory-level scan reduction.
    * Same two-phase shape and post-top-k filter semantics as [[search]]. */
  def searchApprox(db: String, query: String, p: Searcher.Params = Searcher.Params(),
      nbits: Int = 4, seed: Long = 42L, probes: Int = 1): DataFrame = {
    val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(query)) { fam =>
      graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
        TextNorm.normalizeQuery(query))
    }
    val qvec = p.embedder.embed(prompted)
    val qBucket = graft.expr.SketchOps.lshBucket(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(qvec), nbits, seed)
    val targets = qBucket +: (0 until math.min(probes, nbits)).map(b => qBucket ^ (1 << b))

    val vectors = vectorsOf(db)
    val topk = vectors
      .filter(col("bucket").isin(targets: _*)) // partition pruning
      .select(col("id"), cosine_similarity(col("vector"), typedLit(qvec)).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(p.k)
      .filter(col("sim") >= p.threshold)
      .collect()
    if (topk.isEmpty) return emptyHits(vectors)

    val spark2 = spark
    import spark2.implicits._
    val sims = topk.map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val simDf = sims.toDF("id", "sim")
    vectors.filter(col("bucket").isin(targets: _*))
      .filter(col("id").isin(sims.map(_._1): _*))
      .select("id", "text", "metadata")
      .join(broadcast(simDf), Seq("id"))
      .withColumn("similarity_score", least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .drop("sim")
      .orderBy(col("similarity_score").desc, col("id"))
  }

  /** Approximate search over an IVF store
    * ([[graft.store.VectorStore.writeVectorsIvf]]): rank the learned
    * centroids against the query on the driver (nlist × dim floats), probe
    * the `nprobe` best clusters — partition pruning again turns the probe
    * list into a directory-level scan reduction, but with data-adaptive
    * cells the same probe fraction buys more recall than sign-LSH. Same
    * two-phase shape and post-top-k filter semantics as [[search]]. */
  def searchIvf(db: String, query: String, p: Searcher.Params = Searcher.Params(),
      nprobe: Int = 2): DataFrame = {
    val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(query)) { fam =>
      graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
        TextNorm.normalizeQuery(query))
    }
    val qvec = p.embedder.embed(prompted)
    val probes = graft.ops.Ivf.probeList(store.centroids(db), qvec, nprobe)

    val vectors = vectorsOf(db)
    val topk = vectors
      .filter(col("cluster").isin(probes: _*)) // partition pruning
      .select(col("id"), cosine_similarity(col("vector"), typedLit(qvec)).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(p.k)
      .filter(col("sim") >= p.threshold)
      .collect()
    if (topk.isEmpty) return emptyHits(vectors)

    val spark2 = spark
    import spark2.implicits._
    val sims = topk.map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val simDf = sims.toDF("id", "sim")
    vectors.filter(col("cluster").isin(probes: _*))
      .filter(col("id").isin(sims.map(_._1): _*))
      .select("id", "text", "metadata")
      .join(broadcast(simDf), Seq("id"))
      .withColumn("similarity_score", least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .drop("sim")
      .orderBy(col("similarity_score").desc, col("id"))
  }

  /** Batched [[searchHnsw]] — the `…Many` discipline for the graph
    * path: all queries embed driver-side and share ONE beam descent
    * ([[graft.ops.Hnsw.searchMany]]), so every hop is a single
    * adjacency job for the whole batch instead of per-query pointer
    * chasing; then one broadcast-joined text/metadata lookup for all
    * queries at once. Output matches [[searchManyIvf]]:
    * `(query_id, id, text, metadata, similarity_score, distance)`. */
  def searchHnswMany(db: String, queries: Seq[(String, String)],
      p: Searcher.Params = Searcher.Params(), ef: Int = 50): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val qrows = embedMany(queries, p)
    val names = qrows.map(_._1)
    val (_, maxLevel, buckets) = store.hnswMeta(db)
    val vectors = vectorsOf(db)
    val hits = graft.ops.Hnsw.searchMany(store.hnswEdges(db), vectors,
        col("id"), col("vector"),
        qrows.zipWithIndex.map { case ((_, qv), i) => (i.toLong, qv) },
        p.k, maxLevel, ef, srcBuckets = buckets)
      .filter(col("sim") >= p.threshold)
      .collect()
    val sims = hits.map(r =>
      (names(r.getLong(0).toInt), r.getLong(2), r.getDouble(3))).toSeq
    val simDf = broadcast(sims.toDF("query_id", "id", "sim"))
    val pruned =
      if (sims.isEmpty) vectors.limit(0)
      else vectors.filter(col("id").isin(sims.map(_._2).distinct: _*))
    pruned.select("id", "text", "metadata")
      .join(simDf, Seq("id"))
      .withColumn("similarity_score",
        least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .select("query_id", "id", "text", "metadata", "similarity_score",
        "distance")
      .orderBy(col("query_id"), col("similarity_score").desc, col("id"))
  }

  /** Graph-index search over a persisted HNSW layout
    * ([[graft.store.VectorStore.writeHnsw]]): the beam descends the
    * stored layered graph, each hop a directory-pruned point read of
    * the frontier's adjacency buckets, then the k survivors join back
    * to the vectors table for text/metadata exactly like the other
    * store paths. Cost is `hops × ef × M` adjacency rows — never a
    * corpus scan; the accuracy trade lives in `ef`. */
  def searchHnsw(db: String, query: String,
      p: Searcher.Params = Searcher.Params(), ef: Int = 50): DataFrame = {
    val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(query)) { fam =>
      graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
        TextNorm.normalizeQuery(query))
    }
    val qvec = p.embedder.embed(prompted)
    val (_, maxLevel, buckets) = store.hnswMeta(db)
    val vectors = vectorsOf(db)
    val hits = graft.ops.Hnsw.search(store.hnswEdges(db), vectors,
        col("id"), col("vector"), qvec, p.k, maxLevel, ef,
        srcBuckets = buckets)
      .filter(col("sim") >= p.threshold)
      .collect()
    if (hits.isEmpty) return emptyHits(vectors)
    val spark2 = spark
    import spark2.implicits._
    val sims = hits.map(r => r.getLong(1) -> r.getDouble(2)).toSeq
    val simDf = sims.toDF("id", "sim")
    vectors.filter(col("id").isin(sims.map(_._1): _*))
      .select("id", "text", "metadata")
      .join(broadcast(simDf), Seq("id"))
      .withColumn("similarity_score",
        least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .drop("sim")
      .orderBy(col("similarity_score").desc, col("id"))
  }

  /** Approximate search over an IVF-PQ store
    * ([[graft.store.VectorStore.writeVectorsPq]]) with exact re-ranking:
    * the CANDIDATE pass scans the `pq_codes` SIDE TABLE — m small ints per
    * row instead of the dim-float vector — pruned to the probed cluster
    * directories and ranked by the ADC table lookup
    * ([[graft.ops.Pq.adcTables]]); the k survivors are then REFINED with
    * the exact cosine against their stored vectors (an id-pushdown read of
    * k rows — the classic PQ refine step), so `p.threshold` and the
    * returned `similarity_score` keep the exact-path semantics whatever
    * the embedding's norm. Accuracy trade lives entirely in WHICH k
    * candidates the codes surface, never in their scores. */
  def searchPq(db: String, query: String, p: Searcher.Params = Searcher.Params(),
      nprobe: Int = 2): DataFrame = {
    val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(query)) { fam =>
      graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
        TextNorm.normalizeQuery(query))
    }
    val qvec = p.embedder.embed(prompted)
    val cents = store.centroids(db)
    val books = store.codebooks(db)
    val probes = graft.ops.Ivf.probeList(cents, qvec, nprobe)
    val tables = graft.ops.Pq.adcTables(qvec, books)
    val dist = tables.indices.map { s =>
      element_at(typedLit(tables(s)), element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)

    val codes = spark.read.parquet(s"${store.dbDir(db)}/pq_codes")
    val candidates = codes
      .filter(col("cluster").isin(probes: _*)) // directory pruning
      .select(col("id"), dist.as("adc"))
      .orderBy(col("adc").asc, col("id"))
      .limit(p.k)
      .collect().map(_.getLong(0))
    val vectors = vectorsOf(db)
    if (candidates.isEmpty) return emptyHits(vectors)

    // exact refine: k rows, id-pushdown into the pruned partitions
    vectors.filter(col("cluster").isin(probes: _*))
      .filter(col("id").isin(candidates: _*))
      .select(col("id"), col("text"), col("metadata"),
        cosine_similarity(col("vector"), typedLit(qvec)).as("sim"))
      .filter(col("sim") >= p.threshold)
      .withColumn("similarity_score", least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .drop("sim")
      .orderBy(col("similarity_score").desc, col("id"))
  }

  /** Approximate search over the quantized side table
    * ([[graft.store.VectorStore.writeVectorsQuantized]]) with exact
    * re-ranking: the candidate pass scans `quant_codes` only — int8 codes
    * (`mode = "sq8"`, ranked by the rescaled integer dot product) or the
    * packed sign-bit words (`mode = "binary"`, ranked by hamming) — and
    * the top `rerank` candidates refine with exact cosine against their
    * stored vectors (id-pushdown read), keeping `p.threshold` and the
    * returned scores exact-path semantics, same contract as
    * [[searchPq]]. */
  def searchQuantized(db: String, query: String,
      p: Searcher.Params = Searcher.Params(), mode: String = "sq8",
      rerank: Int = 50): DataFrame = {
    val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(query)) { fam =>
      graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
        TextNorm.normalizeQuery(query))
    }
    val qvec = p.embedder.embed(prompted)
    val quant = store.quantCodes(db)
    val ranked = mode match {
      case "sq8" =>
        val (qc, qs) = graft.ops.Quantize.quantizeQuery(qvec)
        quant.select(col("id"),
            graft.ops.Quantize.approxDotCol(col("codes"), col("sc"), qc, qs)
              .as("score"))
          .orderBy(col("score").desc, col("id"))
      case "binary" =>
        quant.select(col("id"),
            graft.ops.Ann.hammingCol(col("sig"), graft.ops.Ann.packWords(qvec))
              .as("h"))
          .orderBy(col("h").asc, col("id"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown quantized search mode '$other' (sq8 | binary)")
    }
    val candidates = ranked.limit(rerank).collect().map(_.getLong(0))
    val vectors = vectorsOf(db)
    if (candidates.isEmpty) return emptyHits(vectors)
    vectors.filter(col("id").isin(candidates: _*))
      .select(col("id"), col("text"), col("metadata"),
        cosine_similarity(col("vector"), typedLit(qvec)).as("sim"))
      .filter(col("sim") >= p.threshold)
      .withColumn("similarity_score", least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .drop("sim")
      .orderBy(col("similarity_score").desc, col("id"))
      .limit(p.k)
  }

  /** Embedded query vectors for a batch (prompt-prefix + normalize, O5/O6). */
  private def embedMany(queries: Seq[(String, String)],
      p: Searcher.Params): Seq[(String, Array[Float])] =
    queries.map { case (qid, text) =>
      val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(text)) { fam =>
        graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
          TextNorm.normalizeQuery(text))
      }
      (qid, p.embedder.embed(prompted))
    }

  /** Shared tail of the batched approximate searches: per-query bounded
    * top-k over the scored candidates, threshold AFTER top-k (§4.1), then
    * one broadcast-joined text/metadata lookup for all queries at once. */
  private def manyTail(vectors: DataFrame, scored: DataFrame,
      p: Searcher.Params): DataFrame =
    graft.ops.TopK.perGroup(scored, Seq(col("query_id")), col("id"), col("sim"), p.k)
      .filter(col("sim") >= p.threshold)
      .join(vectors.select("id", "text", "metadata"), Seq("id"))
      .withColumn("similarity_score", least(greatest(col("sim"), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("sim"))
      .select("query_id", "id", "text", "metadata", "similarity_score", "distance")
      .orderBy(col("query_id"), col("similarity_score").desc, col("id"))

  /** Batched [[searchIvf]]: all queries resolve their probe lists on the
    * driver, the store scans ONCE pruned to the union of probed clusters
    * (partition pruning — non-probed directories are never listed), and
    * each row scores only against the queries probing its cell (the
    * broadcast `array_contains` join). Per-query top-k is the bounded
    * [[graft.ops.TopKAggregator]] — no window rank, shuffle ≤
    * partitions × queries × k. */
  def searchManyIvf(db: String, queries: Seq[(String, String)],
      p: Searcher.Params = Searcher.Params(), nprobe: Int = 2): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val cents = store.centroids(db)
    val qrows = embedMany(queries, p).map { case (qid, qv) =>
      (qid, qv.toVector, graft.ops.Ivf.probeList(cents, qv, nprobe).toVector)
    }
    val unionProbes = qrows.flatMap(_._3).distinct
    val qdf = broadcast(qrows.toDF("query_id", "qvec", "probes"))
    val vectors = vectorsOf(db)
    val scored = vectors
      .filter(col("cluster").isin(unionProbes: _*)) // partition pruning
      .join(qdf, array_contains(col("probes"), col("cluster")))
      .select(col("query_id"), col("id"),
        cosine_similarity(col("vector"), col("qvec")).as("sim"))
    manyTail(vectors, scored, p)
  }

  /** Batched [[searchApprox]] over a sign-LSH clustered store: per-query
    * target buckets (own cell + 1-bit-flip neighbors) resolve driver-side;
    * one scan pruned to the bucket union; same broadcast probe join and
    * bounded per-query top-k as [[searchManyIvf]]. */
  def searchManyApprox(db: String, queries: Seq[(String, String)],
      p: Searcher.Params = Searcher.Params(), nbits: Int = 4,
      seed: Long = 42L, probes: Int = 1): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val qrows = embedMany(queries, p).map { case (qid, qv) =>
      val b = graft.expr.SketchOps.lshBucket(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(qv), nbits, seed)
      val targets = b +: (0 until math.min(probes, nbits)).map(x => b ^ (1 << x))
      (qid, qv.toVector, targets.distinct.toVector)
    }
    val unionBuckets = qrows.flatMap(_._3).distinct
    val qdf = broadcast(qrows.toDF("query_id", "qvec", "targets"))
    val vectors = vectorsOf(db)
    val scored = vectors
      .filter(col("bucket").isin(unionBuckets: _*)) // partition pruning
      .join(qdf, array_contains(col("targets"), col("bucket")))
      .select(col("query_id"), col("id"),
        cosine_similarity(col("vector"), col("qvec")).as("sim"))
    manyTail(vectors, scored, p)
  }

  /**
   * Hybrid search: reciprocal-rank fusion of the brute-force cosine top
   * `candidates` with BM25 over the store's chunk text for the query's own
   * tokens — lexical recall the embedding-only path misses (exact
   * names/ids) and vice versa. Both candidate lists are bounded BEFORE
   * fusion (TakeOrderedAndProject each side), so the rank windows only see
   * candidate-sized inputs; the text/metadata join touches the fused top-k
   * rows only. Returns hit rows + `hybrid_score` (RRF) with
   * `similarity_score`/`distance` from the cosine side (0/1 when the hit
   * was lexical-only).
   *
   * `p.threshold` applies to the COSINE leg only, after its top-k (the F5
   * §4.1 contract, same as [[search]]): vector candidates below the
   * threshold drop out of the fusion. Lexical candidates are never
   * thresholded — BM25 scores are not similarities — so lexical-only hits
   * still surface (with `similarity_score` 0) at any threshold.
   */
  def searchHybrid(db: String, query: String,
      p: Searcher.Params = Searcher.Params(), candidates: Int = 50,
      k0: Int = 60): DataFrame = {
    val prompted = p.promptFamily.fold(TextNorm.normalizeQuery(query)) { fam =>
      graft.embed.PromptPrefix.applyTo(fam, isQuery = true,
        TextNorm.normalizeQuery(query))
    }
    val qvec = p.embedder.embed(prompted)
    val terms = TextNorm.normalizeQuery(query).toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq

    val vectors = vectorsOf(db)
    val vec = vectors
      .select(col("id"),
        round(cosine_similarity(col("vector"), typedLit(qvec)), 4).as("s"))
      .orderBy(col("s").desc, col("id")).limit(candidates)
      .filter(col("s") >= p.threshold) // F5: threshold after top-k (§4.1)
    val kw = graft.ops.Keyword.bm25(vectors.select(col("id"), col("text")),
        col("id"), col("text"), terms)
      .select(col("id"), round(col("score"), 4).as("s"))
      .orderBy(col("s").desc, col("id")).limit(candidates)

    val fused = graft.ops.Keyword.rrfFuse(kw, col("s"), vec, col("s"), k0)
      .orderBy(col("rrf").desc, col("id")).limit(p.k)
    // k-row fused list and 50-row sim list broadcast; the store-side scan
    // joins them hash-side without shuffling text+metadata
    vectors.select("id", "text", "metadata")
      .join(broadcast(fused), Seq("id"))
      .join(broadcast(vec.withColumnRenamed("s", "sim")), Seq("id"), "left")
      .withColumn("similarity_score",
        least(greatest(coalesce(col("sim"), lit(0.0)), lit(0.0)), lit(1.0)))
      .withColumn("distance", lit(1.0) - col("similarity_score"))
      .select(col("id"), col("text"), col("metadata"),
        col("similarity_score"), col("distance"), col("rrf").as("hybrid_score"))
      .orderBy(col("hybrid_score").desc, col("id"))
  }

  /** S17 side files (`/root/reference/chat_llm.py:34-40`): write retrieved
    * contexts (`"---"`-separated) and one metadata JSON per line. */
  def writeSearchArtifacts(db: String, query: String, outDir: String,
      p: Searcher.Params = Searcher.Params()): Unit = {
    val hits = search(db, query, p)
    val rows = hits.select(col("text"),
      to_json(struct(col("metadata.*"), col("similarity_score"), col("distance")))
        .as("meta_json")).collect()
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("contexts.txt"),
      rows.map(_.getString(0)).mkString("", "\n\n---\n\n", "\n\n---\n\n"))
    java.nio.file.Files.writeString(dir.resolve("metadata.txt"),
      rows.map(_.getString(1)).mkString("", "\n", "\n"))
  }
}

object Searcher {
  /** Defaults from the reference config (`/root/reference/config.py:28-32`).
    * `promptFamily` opts into the model-family query prefix (O6); the stub
    * embedder path leaves it off (FIXTURES §4). */
  final case class Params(
      k: Int = 6,
      threshold: Double = 0.4,
      searchTerm: Option[String] = None,
      documentTypeFilter: Option[String] = None,
      embedder: Embedder = HashEmbedder(),
      promptFamily: Option[String] = None)
}
