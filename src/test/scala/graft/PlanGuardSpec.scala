package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression net over EVERY verification query: no query
  * may plan a `CartesianProduct` — the non-broadcast nested-loop join
  * whose cost is |left|×|right| with no pruning, the one operator that
  * cannot survive a 100× scale-up no matter how the data grows.
  * (Broadcast nested loops over one-row aggregates — the broadcast-scalar
  * cross joins several queries use deliberately — stay allowed: their
  * inner side is a single row by construction.) Planning only: nothing
  * executes, so the whole suite of plans checks in seconds. */
class PlanGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("no verification query plans a CartesianProduct") {
    spark.sparkContext.setLogLevel("WARN")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
