package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot demonstration that the dbscan density guard fails fast at
  * the DEFAULT knob on the 100× rehearsal point cloud (round-11 ask #3's
  * "Done" criterion): builds the same offset-replica cloud the
  * ScaleRehearsal dbscan family uses at scale N and calls `Ann.dbscan`
  * with the default `maxCandidatePairs`, expecting the sizing-formula
  * IllegalArgumentException BEFORE any point-level shuffle runs.
  * Usage: `runMain graft.tools.GuardDemo [sfDir] [N]`. */
object GuardDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val baseEv = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val ev = (0 until n).map { r =>
      baseEv.select(
        (col("event_id") + lit(r * 10000000L)).as("event_id"),
        (col("user_id") + lit(r * 10000000L)).as("user_id"),
        col("value"))
    }.reduce(_ unionByName _)
    val pts = ev.select(col("event_id").as("id"),
      (col("value") + expr("(user_id div 10000000) * 600")).as("x"),
      (col("user_id") % 10000000 % 100).cast("double").as("y"))
    val t0 = System.nanoTime()
    try {
      graft.ops.Ann.dbscan(pts, col("id"), col("x"), col("y"),
        eps = 0.4, minPts = 3).count() // default maxCandidatePairs
      println(s"[guard-demo] UNEXPECTED: dbscan at ${n}x completed " +
        "under the default knob")
    } catch {
      case e: IllegalArgumentException =>
        println(f"[guard-demo] guard fired after ${(System.nanoTime() - t0) / 1e9}%.1f s (pre-pass only):")
        println(s"[guard-demo] ${e.getMessage}")
    }
    spark.stop()
  }
}
