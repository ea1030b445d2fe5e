package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump `.explain("formatted")` for selected SparkEntry
  * queries to files — the plans/r{N}/<query>_{before,after}.txt
  * evidence the optimization rounds commit. Args:
  * `<outDir> <suffix> <substring...>` — each selected query's plan
  * lands in `<outDir>/<name>_<suffix>.txt`. The frame is EXECUTED
  * first (`toRdd.count()`) so AQE's final plan is also appended —
  * iterative operators additionally run their interior driver-loop
  * jobs during construction, which is unavoidable (the plan under
  * test does not exist until the loop has run). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <outDir> <suffix> [substr...]")
    val outDir = args(0)
    val suffix = args(1)
    val wanted = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val pre = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.queryExecution.toRdd.count()
        val post = df.queryExecution.executedPlan.toString
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          s"== explain(formatted), pre-execution ==\n$pre\n" +
            s"== executedPlan after execution (AQE final) ==\n$post\n")
        println(s"[explain] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
