package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.ingest.IngestJob

/** Create-pipeline throughput bench: synthesize N text files, run the full
  * ingest (decode → chunk → normalize → embed → store), report docs/s,
  * chunks/s and MB/s. Usage:
  * runMain graft.tools.IngestBench [nDocs] [docChars] [workDir] */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 5000
    val docChars = if (args.length > 1) args(1).toInt else 4000
    val work = if (args.length > 2) args(2)
      else Files.createTempDirectory("graft-ingest-bench").toString
    val docsDir = s"$work/docs"
    Files.createDirectories(Paths.get(docsDir))

    // deterministic synthetic prose (seeded; ~docChars chars per file)
    val rnd = new scala.util.Random(42)
    val vocab = Array("query", "table", "vector", "cosine", "spark", "data",
      "join", "merge", "batch", "window", "scan", "filter", "the", "and",
      "shuffle", "partition", "column", "index", "stream", "page")
    var bytesTotal = 0L
    for (i <- 0 until nDocs) {
      val sb = new StringBuilder(docChars + 16)
      while (sb.length < docChars) {
        sb.append(vocab(rnd.nextInt(vocab.length))).append(' ')
        if (rnd.nextInt(12) == 0) sb.append(". ")
      }
      val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
      bytesTotal += bytes.length
      Files.write(Paths.get(docsDir, f"doc_$i%06d.txt"), bytes)
    }

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

    val t0 = System.nanoTime()
    val res = IngestJob.run(spark, docsDir, s"$work/wh", "bench")
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = bytesTotal / 1e6
    println(f"""{"metric":"ingest","docs":${res.documents},"chunks":${res.chunks},"mb":$mb%.1f,"sec":$sec%.2f,"docs_per_sec":${res.documents / sec}%.0f,"chunks_per_sec":${res.chunks / sec}%.0f,"mb_per_sec":${mb / sec}%.2f}""")
    spark.stop()
  }
}
