package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.ingest.IngestJob
import graft.query.Searcher
import graft.store.VectorStore
import graft.streaming.StreamingIngest

/** Drive of the incremental-ingest stream: drop files, run AvailableNow
  * micro-batches, show the store growing and staying searchable.
  * Usage: runMain graft.tools.StreamDemo [workDir] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft-stream-demo").toString
    val docsDir = s"$work/docs"
    Files.createDirectories(Paths.get(docsDir))
    def put(name: String, content: String): Unit =
      Files.write(Paths.get(docsDir, name), content.getBytes(StandardCharsets.UTF_8))

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new VectorStore(spark, s"$work/wh")
    val cfg = IngestJob.Config(chunkSize = 100, chunkOverlap = 0)

    put("batch1.txt", "streaming arrival first document about vector engines " * 8)
    StreamingIngest.start(spark, docsDir, s"$work/wh", "sdb", cfg)
      .awaitTermination(120000)
    println(s"[stream] after batch 1: vectors=${store.vectors("sdb").count()} " +
      s"meta=${store.indexMetadata("sdb").num_vectors}")

    put("batch2.txt", "second arrival later with different cosine content " * 8)
    StreamingIngest.start(spark, docsDir, s"$work/wh", "sdb", cfg)
      .awaitTermination(120000)
    println(s"[stream] after batch 2: vectors=${store.vectors("sdb").count()} " +
      s"meta=${store.indexMetadata("sdb").num_vectors} " +
      s"docs=${store.documents("sdb").count()}")

    val searcher = new graft.query.Searcher(spark, store)
    val hits = searcher.search("sdb", "cosine content",
      Searcher.Params(k = 3, threshold = 0.0))
    println(s"[stream] search hits=${hits.count()}")
    println(s"[stream] OK work=$work")
    spark.stop()
  }
}
