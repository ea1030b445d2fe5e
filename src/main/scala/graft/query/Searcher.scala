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

  /** Defaults from the reference config (`/root/reference/config.py:28-32`). */
  final case class Params(
      k: Int = 6,
      threshold: Double = 0.4,
      searchTerm: Option[String] = None,
      documentTypeFilter: Option[String] = None,
      embedder: Embedder = HashEmbedder())

  def search(db: String, query: String, p: Params = Params()): DataFrame = {
    // O5 + O13 on the driver; the query vector ships as a literal, so the
    // executor-side scan needs no broadcast variable at all
    val qvec = p.embedder.embed(TextNorm.normalizeQuery(query))

    val vectors = store.vectors(db)
    val scored = vectors
      .select(col("id"), cosine_similarity(col("vector"), typedLit(qvec)).as("sim"))

    val topk = scored
      .orderBy(col("sim").desc, col("id")) // deterministic tie-break (SURVEY §7.4.4)
      .limit(p.k)
      .filter(col("sim") >= p.threshold) // F5: threshold after top-k (§4.1)

    // J1: k rows at most — broadcast them against the full table
    val looked = broadcast(topk)
      .join(vectors.select("id", "text", "metadata"), Seq("id"))

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
  def formattedContexts(db: String, query: String, p: Params = Params()): String = {
    val rows = search(db, query, p)
      .select(col("text"), col("metadata.file_name").as("file_name")).collect()
    graft.format.ContextFormatter.formatBlocks(
      rows.map(r => (r.getString(0), r.getString(1))).toIndexedSeq)
  }
}
