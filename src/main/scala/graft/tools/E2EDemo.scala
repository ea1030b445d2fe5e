package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.ingest.IngestJob
import graft.query.Searcher
import graft.store.VectorStore

/** End-to-end drive of the create + query pipelines (SURVEY §7.2) against a
  * scratch docs directory: txt/md/csv/paged/latin-1/empty fixtures →
  * IngestJob → Searcher (threshold/term/type filters) → contexts +
  * citations. Usage: runMain graft.tools.E2EDemo [workDir] */
object E2EDemo {
  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft-e2e").toString
    val docsDir = s"$work/docs"
    Files.createDirectories(Paths.get(docsDir))

    def put(name: String, content: Array[Byte]): Unit =
      Files.write(Paths.get(docsDir, name), content)
    val spark62 = "Apache Spark shuffles data between stages. " * 40
    put("spark_notes.txt", (spark62 + "Vector search with cosine similarity over embeddings.").getBytes(StandardCharsets.UTF_8))
    put("cooking.md", ("# Recipes\n\nWhisk eggs with sugar.\n\n\n\nBake at 180C until golden. " * 30).getBytes(StandardCharsets.UTF_8))
    put("paged.txt", "[[page1]]First page about distributed query engines. [[page2]]Second page about cosine similarity search. [[page3]]Third page about parquet storage layouts.".getBytes(StandardCharsets.UTF_8))
    put("table.csv", "name,desc\n\"Smith, J\",\"likes \"\"spark\"\" engines\"\nDoe,writes sql\n".getBytes(StandardCharsets.UTF_8))
    put("latin1.txt", ("café jalapeño curly quotes " * 20).getBytes(StandardCharsets.ISO_8859_1))
    put("empty.txt", Array.emptyByteArray)
    put("blank.txt", "   \n\t  ".getBytes(StandardCharsets.UTF_8))
    put("skipme.xyz", "unsupported extension".getBytes(StandardCharsets.UTF_8))

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warehouse = s"$work/warehouse"
    val res = IngestJob.run(spark, docsDir, warehouse, "demo",
      IngestJob.Config(chunkSize = 200, chunkOverlap = 100))
    println(s"[e2e] ingested documents=${res.documents} chunks=${res.chunks} matched=${res.filesMatched} skipped=${res.filesSkipped}")

    val store = new VectorStore(spark, warehouse)
    println(s"[e2e] index_metadata=${store.indexMetadata("demo")}")
    println(s"[e2e] catalog=${store.catalog}")

    val searcher = new Searcher(spark, store)
    val p = Searcher.Params(k = 4, threshold = 0.1)
    val hits = searcher.search("demo", "cosine similarity vector search", p)
    hits.show(20, 60)
    println(searcher.formattedContexts("demo", "cosine similarity vector search", p))

    val withTerm = searcher.search("demo", "cosine similarity vector search",
      p.copy(searchTerm = Some("parquet")))
    println(s"[e2e] term-filtered hits=${withTerm.count()}")
    val noType = searcher.search("demo", "cosine similarity vector search",
      p.copy(documentTypeFilter = Some("image")))
    println(s"[e2e] image-type hits=${noType.count()} (expect 0)")
    val hi = searcher.search("demo", "cosine similarity vector search",
      p.copy(threshold = 0.99))
    println(s"[e2e] threshold-0.99 hits=${hi.count()} (expect 0)")

    // clustered (LSH-partitioned) store + approximate search
    val store2 = new VectorStore(spark, warehouse)
    val raw = store2.vectors("demo").select("id", "vector", "text", "metadata")
    store2.writeVectorsClustered("demo_clustered", raw, nbits = 3)
    val approx = searcher.searchApprox("demo_clustered",
      "cosine similarity vector search", p, nbits = 3, probes = 1)
    println(s"[e2e] approx hits=${approx.count()} (clustered store, partition-pruned)")

    val cits = graft.format.Citations.citations(
      hits.select(org.apache.spark.sql.functions.col("metadata"),
        org.apache.spark.sql.functions.col("similarity_score")))
    cits.foreach(c => println(s"[e2e] citation: $c"))
    println("[e2e] prompt chars=" + graft.rag.RagPrompt.assemble("q",
      Seq("ctx1", "ctx2")).length)

    // typed public API (GraftSession): Dataset[Chunk] + Dataset[SearchHit] + SQL
    val sess = new graft.GraftSession(spark, warehouse)
    val chunks = sess.chunks("demo")
    println(s"[e2e] typed chunks=${chunks.count()} dim=${chunks.head().vector.length}")
    val typedHits = sess.search("demo", "cosine similarity vector search", p)
    println(s"[e2e] typed hits=${typedHits.collect().map(h => f"${h.metadata.file_name}:${h.similarity_score}%.2f").mkString(", ")}")
    sess.open("demo")
    val sqlTop = spark.sql(
      "SELECT count(*) FROM demo_vectors v JOIN demo_chunk_doc_map m ON v.id = m.chunk_id")
      .collect()(0).getLong(0)
    println(s"[e2e] sql-joined rows=$sqlTop")

    // RAG chat turn with the offline echo backend
    val answer = graft.rag.RagChat.ask(searcher, "demo",
      "how does cosine similarity search work", p)
    println(s"[e2e] rag answer='${answer.text.take(60)}' " +
      s"contexts=${answer.contexts.length} citations=${answer.citations.length}")
    println(s"[e2e] OK work=$work")
    spark.stop()
  }
}
