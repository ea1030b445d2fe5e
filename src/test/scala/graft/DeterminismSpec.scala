package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must be deterministic: two evaluations at
  * sf0.001 produce identical row sequences (the driver hash-compares
  * ordered output, so an unpinned tie anywhere is a latent gate failure). */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is deterministic") {
      spark.sparkContext.setLogLevel("WARN")
      def run(): Seq[String] =
        fn(spark, sf).collect().map(_.mkString("\u0001")).toIndexedSeq
      val a = run()
      val b = run()
      assert(a == b, s"$name differs between runs")
      assert(a.nonEmpty || name.startsWith("q45"), s"$name returned no rows")
    }
  }
}
