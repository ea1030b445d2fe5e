package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, Multimodal, TextAnalysis}

/**
 * Verification queries for the training-data-pipeline extensions (dedup,
 * similarity search, text analysis, multimodal plumbing). Same contract as
 * [[T2Queries]]: DuckDB oracle where the computation is expressible in both
 * dialects. Since round 2 the sketch kernels (MinHash/SimHash/LSH/hash-embed)
 * are md5-derived ([[graft.expr.PortableHash]]), so even those have full
 * DuckDB oracles — the SQL replicas live in [[PortableSql]] — plus exact
 * ScalaTest verification.
 *
 * Since round 12 the registry is wave-split across [[OpsQueriesP1]]..
 * [[OpsQueriesP6]] (~53 queries each, file order preserved, each query's
 * oracle co-located) with shared helpers in [[QShared]]; this object is
 * the unchanged merged surface the driver consumes.
 */
object OpsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    OpsQueriesP1.queries ++ OpsQueriesP2.queries ++ OpsQueriesP3.queries ++
      OpsQueriesP4.queries ++ OpsQueriesP5.queries ++ OpsQueriesP6.queries ++
      OpsQueriesP7.queries ++ OpsQueriesP8.queries

  val oracle: Map[String, String] =
    OpsQueriesP1.oracle ++ OpsQueriesP2.oracle ++ OpsQueriesP3.oracle ++
      OpsQueriesP4.oracle ++ OpsQueriesP5.oracle ++ OpsQueriesP6.oracle ++
      OpsQueriesP7.oracle ++ OpsQueriesP8.oracle
}
