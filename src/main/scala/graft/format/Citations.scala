package graft.format

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.Citation

/**
 * Citation aggregation (SURVEY §2.5 A1-A4), re-expressing
 * `format_citations` (`/root/reference/utilities.py:24-77`): group hits by
 * `file_path`; per file keep the name/type, min-max similarity-score range,
 * and (PDFs only) the set of pages coalesced into consecutive ranges;
 * order citations by per-file min score ascending.
 *
 * Expressed as a DataFrame aggregation so it scales past the collected
 * result set, even though the reference only ever feeds it ≤ k rows.
 */
object Citations {

  /** A3: merge sorted pages into "s-e" ranges, comma-joined
    * (`utilities.py:42-56`), e.g. `[1,2,3,7] → "1-3, 7"`. */
  def coalesceRanges(pages: Seq[Int]): String = {
    if (pages == null || pages.isEmpty) return ""
    val sorted = pages.distinct.sorted
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var start = sorted.head
    var prev = sorted.head
    for (p <- sorted.tail) {
      if (p == prev + 1) prev = p
      else { out += fmt(start, prev); start = p; prev = p }
    }
    out += fmt(start, prev)
    out.mkString(", ")
  }
  private def fmt(s: Int, e: Int): String = if (s == e) s.toString else s"$s-$e"

  private val coalesceRangesUdf = udf((pages: Seq[Int]) => coalesceRanges(pages))

  /** A2: `"lo-hi"` (4dp) or the single value when equal (`utilities.py:59-61`). */
  def scoreRange(lo: Double, hi: Double): String =
    if (lo == hi) f"$lo%.4f" else f"$lo%.4f-$hi%.4f"

  /** Aggregate search hits `(metadata STRUCT, similarity_score)` into
    * citation rows ordered by ascending min score (A4). */
  def citationsDf(hits: DataFrame): DataFrame =
    hits.groupBy(col("metadata.file_path").as("file_path"))
      .agg(
        first(col("metadata.file_name")).as("file_name"),
        first(col("metadata.file_type")).as("file_type"),
        min(col("similarity_score")).as("min_score"),
        max(col("similarity_score")).as("max_score"),
        sort_array(collect_set(when(col("metadata.file_type") === ".pdf",
          col("metadata.page_number")))).as("page_set"))
      .select(col("file_name"), col("file_path"), col("file_type"),
        col("min_score"), col("max_score"),
        when(col("file_type") === ".pdf", coalesceRangesUdf(col("page_set")))
          .otherwise(lit("")).as("pages"))
      .orderBy(col("min_score"), col("file_path"))

  def citations(hits: DataFrame): Seq[Citation] =
    citationsDf(hits).collect().toIndexedSeq.map { (r: Row) =>
      Citation(
        file_name = r.getAs[String]("file_name"),
        file_path = r.getAs[String]("file_path"),
        file_type = r.getAs[String]("file_type"),
        score_range = scoreRange(r.getAs[Double]("min_score"), r.getAs[Double]("max_score")),
        pages = r.getAs[String]("pages"),
        min_score = r.getAs[Double]("min_score"))
    }
}
