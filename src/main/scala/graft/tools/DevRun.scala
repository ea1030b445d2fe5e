package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run one named query with timing + formatted explain.
  * Usage: runMain graft.tools.DevRun <queryName> [sfDir] [explain|show|time] */
object DevRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "time"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "sql") {
      // raw-SQL bisection mode: runMain graft.tools.DevRun sql <sfDir> <SQL...>
      graft.functions.registerAll(spark)
      for (tbl <- Seq("documents", "embeddings", "events", "lineitem", "orders",
          "customer", "supplier", "part", "nation", "region"))
        try spark.read.parquet(s"$sfDir/$tbl.parquet").createOrReplaceTempView(tbl)
        catch { case _: Throwable => }
      val sql = args.drop(2).mkString(" ")
      val t0 = System.nanoTime()
      spark.sql(sql).show(100, truncate = false)
      println(f"[devrun] sql: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.stop()
      return
    }
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    mode match {
      case "dump" =>
        // single-query Verify: <name> parquet + a one-entry oracle_sql.json
        // so `tools/compare.py <sfDir> <outDir>` gates just this query
        val outDir = args(3)
        new java.io.File(outDir).mkdirs()
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // MERGE into an existing oracle_sql.json (don't overwrite): a
        // loop of dump calls over several queries then one compare.py
        // run needs every dumped query's oracle present at once
        val path = java.nio.file.Paths.get(s"$outDir/oracle_sql.json")
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val existing: java.util.Map[String, String] =
          if (java.nio.file.Files.exists(path))
            try mapper.readValue(path.toFile,
              classOf[java.util.HashMap[String, String]])
            catch { case _: Throwable => new java.util.HashMap[String, String]() }
          else new java.util.HashMap[String, String]()
        graft.SparkEntry.oracleSql.get(name)
          .foreach(sql => existing.put(name, sql))
        mapper.writerWithDefaultPrettyPrinter()
          .writeValue(path.toFile, existing)
        println(s"[devrun] dumped $name to $outDir")
      case "explain" => df.explain("formatted")
      case "show" => df.show(50, truncate = false)
      case _ =>
        var t0 = System.nanoTime()
        df.count()
        println(f"[devrun] $name cold: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
        df.count()
        println(f"[devrun] $name warm: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
