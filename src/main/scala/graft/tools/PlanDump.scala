package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: run one query twice and dump both post-AQE plan strings
  * to /tmp so run-varying tokens the bench plan-hash normalizer must
  * strip can be diffed directly. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("q149_knn_graph_recall")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 2) {
      val df = fn(spark, sfDir)
      df.queryExecution.toRdd.count()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/plan_$i.txt"),
        df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
