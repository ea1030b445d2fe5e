package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Row
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Stats-reset local checkpoint — the fix for a double-exponential
  * Catalyst pathology in ITERATIVE plans (found live in round 12 when
  * three stacked Louvain levels hung the optimizer):
  *
  * `Dataset.localCheckpoint` (Spark ≥ 3.2, via `LogicalRDD.fromDataset`)
  * carries the origin plan's `Statistics` into the checkpoint's
  * `LogicalRDD` so the planner keeps size estimates across the
  * checkpoint. But `SizeInBytesOnlyStatsPlanVisitor` MULTIPLIES child
  * `sizeInBytes` through every inner join, so in a loop that joins the
  * previous round's checkpoint k times per round, the carried estimate
  * compounds like `size^k` PER ROUND — the BigInt digit count grows
  * ~k× each round, and by round 9 of a 5-join-per-round loop the
  * optimizer sits in million-digit Karatsuba multiplications for
  * hours. (Three Louvain rounds were fine, six noticeably slow, nine
  * effectively hung — measured via jstack, not guessed.)
  *
  * The checkpoint exists precisely to truncate lineage; truncating the
  * STATS lineage with it is the right semantic for a loop. This helper
  * re-wraps the freshly checkpointed RDD in a bare [[LogicalRDD]] with
  * `originStats = None` (sizeInBytes falls back to
  * `spark.sql.defaultSizeInBytes`), keeping the materialized blocks,
  * output attributes, partitioning and ordering. Static broadcast
  * planning loses the estimate, but AQE re-plans joins from ACTUAL
  * shuffle sizes at runtime, which is the regime every caller runs in.
  *
  * Lives under `org.apache.spark.sql` because [[Dataset.ofRows]] and
  * [[LogicalRDD]] are `private[sql]` — the standard extension-library
  * shim pattern; only public-behavior Spark APIs are touched otherwise.
  */
object StatsReset {

  /** `df.localCheckpoint(eager = true)` with the origin statistics
    * dropped — use inside iterative loops whose rounds JOIN the
    * previous round's checkpoint (see class doc). */
  def freshLocalCheckpoint(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ck = df.localCheckpoint(true).asInstanceOf[Dataset[Row]]
    val spark = ck.sparkSession
    ck.queryExecution.analyzed match {
      case l: LogicalRDD =>
        // keep the materialized RDD + physical properties; drop ONLY
        // the carried stats (and constraints, same compounding risk)
        Dataset.ofRows(spark, LogicalRDD(l.output, l.rdd,
          l.outputPartitioning, l.outputOrdering, l.isStreaming,
          None)(spark, None, None))
      case _ =>
        // not the checkpoint shape we expect — fail loudly rather than
        // silently keep compounding stats
        throw new IllegalStateException(
          "StatsReset.freshLocalCheckpoint: localCheckpoint did not " +
            s"produce a LogicalRDD plan: ${ck.queryExecution.analyzed}")
    }
  }
}
