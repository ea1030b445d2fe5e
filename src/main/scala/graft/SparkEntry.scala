package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[graft.queries.T2Queries]] (declared t2
  * set) and the ops modules; this object is the stable entry surface. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the end-to-end retrieval slice (SURVEY §7.2) — chunk → normalize →
    * embed → top-k cosine over the documents table. */
  def entry(spark: SparkSession): DataFrame =
    queries("q40_retrieval_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline extension ops. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.T2Queries.queries ++ graft.queries.OpsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.T2Queries.oracle ++ graft.queries.OpsQueries.oracle
}
