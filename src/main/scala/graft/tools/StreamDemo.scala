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

    // micro-batch appends fragment the table; compact and re-check
    def nFiles = new java.io.File(s"$work/wh/sdb/vectors")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = nFiles
    store.compactVectors("sdb", targetPartitions = 1)
    println(s"[stream] compacted files $before -> $nFiles, " +
      s"rows=${store.vectors("sdb").count()}")

    // stateful sessionization over an in-memory event stream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Double)]
    val sessions = graft.streaming.StreamingOps.sessionize(
      input.toDF().toDF("ts", "user_id", "value"),
      gapMs = 10 * 60 * 1000L, watermark = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("demo_sessions").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((t("2024-01-01 09:00:00"), 1L, 1.0),
      (t("2024-01-01 09:05:00"), 1L, 2.0), (t("2024-01-01 09:40:00"), 1L, 5.0))
    q.processAllAvailable()
    input.addData((t("2024-01-01 12:00:00"), 2L, 1.0))
    q.processAllAvailable()
    val sess = spark.sql("SELECT user_id, n_events, value_sum FROM demo_sessions ORDER BY n_events DESC")
      .collect().map(r => s"u${r.getLong(0)}:${r.getLong(1)}ev/${r.getDouble(2)}").mkString(", ")
    println(s"[stream] closed sessions: $sess")
    q.stop()
    println(s"[stream] OK work=$work")
    spark.stop()
  }
}
