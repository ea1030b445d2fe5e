package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.store.VectorStore

/** The [[graft.ops.ScrubArtifact]] façade: one build/load/apply contract
  * over the whole `…Against` incremental family, chained through
  * [[VectorStore.scrubGate]] — including on an unbounded stream when the
  * chain is all streaming-safe members (the daily-ingest gate E2E). */
class ScrubArtifactSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val warehouse =
    Files.createTempDirectory("graft-scrub-artifacts").toString
  private lazy val store = new VectorStore(spark, warehouse)

  private val boiler = "SUBSCRIBE NOW for daily updates"

  private def frozenCorpus = {
    import spark.implicits._
    Seq(
      (1L, s"alpha bravo charlie delta echo\n$boiler"),
      (2L, s"foxtrot golf hotel india juliet\n$boiler"),
      (3L, "kilo lima mike november oscar papa quebec romeo sierra tango"))
      .toDF("doc_id", "body")
  }

  private def benchmark = {
    import spark.implicits._
    Seq("what is the capital of atlantis", "name the seventh prime number")
      .toDF("question")
  }

  test("write/load/apply round-trips every artifact kind through parquet") {
    import spark.implicits._
    val kinds: Seq[ScrubArtifact] = Seq(FrequentLineScrub(), SpanScrub(3),
      CdcScrub(), BloomGate(), WinnowGate(), NoveltyGate(), SimHashGate(),
      SemanticGate())
    for (a <- kinds) {
      val corpus = if (a.isInstanceOf[BloomGate]) benchmark
        .withColumn("doc_id", lit(0L)).select(col("doc_id"), col("question").as("body"))
        else frozenCorpus
      store.writeScrubArtifact("db1", a, corpus, col("doc_id"), col("body"))
      val loaded = store.scrubArtifact("db1", a)
      val direct = a.build(corpus, col("doc_id"), col("body"))
      assert(loaded.schema.map(_.name) == direct.schema.map(_.name), a.kind)
      assert(loaded.count() == direct.count(), a.kind)
      // native apply over the loaded table matches the direct call
      val batch = Seq((10L, s"new words only\n$boiler")).toDF("id", "text")
      val viaStore = store.scrubApply("db1", a, batch, col("id"), col("text"))
      val viaDirect = a.apply(batch, col("id"), col("text"), direct)
      assert(viaStore.collect().toSeq == viaDirect.collect().toSeq, a.kind)
    }
  }

  test("SimHashGate: exact frozen twin drops at hamming 0, perturbed " +
      "near-twin drops within the bound, fresh text passes") {
    import spark.implicits._
    val sim = SimHashGate(maxHamming = 8)
    store.writeScrubArtifact("dbsim", sim, frozenCorpus,
      col("doc_id"), col("body"))
    val batch = Seq(
      // exact copy of frozen doc 3 → hamming 0
      (30L, "kilo lima mike november oscar papa quebec romeo sierra tango"),
      // one token changed → small hamming, still gated
      (31L, "kilo lima mike november oscar papa quebec romeo sierra mango"),
      // unrelated → passes
      (32L, "utterly different vocabulary with no resemblance at all"))
      .toDF("id", "text")
    val report = store.scrubApply("dbsim", sim, batch, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(report.exists { case (id, ref, h) => id == 30L && ref == 3L && h == 0L })
    val gated = sim.gate(batch, col("id"), col("text"),
        store.scrubArtifact("dbsim", sim))
      .collect().map(_.getLong(0)).toSet
    assert(gated.contains(32L) && !gated.contains(30L))
    // the near-twin's hamming against doc 3 decides its fate — assert
    // consistency between report and gate rather than a magic number
    val nearFlagged = report.exists(_._1 == 31L)
    assert(gated.contains(31L) != nearFlagged)
  }

  test("SemanticGate: verbatim and near-verbatim benchmark items drop by " +
      "embedding cosine, fresh text passes") {
    import spark.implicits._
    val sem = SemanticGate(threshold = 0.9)
    store.writeScrubArtifact("dbsem", sem,
      benchmark.withColumn("doc_id", monotonically_increasing_id())
        .select(col("doc_id"), col("question").as("body")),
      col("doc_id"), col("body"))
    val batch = Seq(
      (40L, "what is the capital of atlantis"),        // verbatim → cos 1.0
      (41L, "what is the capital of atlantis today"),  // near-verbatim
      (42L, "completely unrelated training document about shipping"))
      .toDF("id", "text")
    val table = store.scrubArtifact("dbsem", sem)
    val report = sem.apply(batch, col("id"), col("text"), table)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(report.contains(40L) && report(40L) == 1.0)
    val gated = sem.gate(batch, col("id"), col("text"), table)
      .collect().map(_.getLong(0)).toSet
    assert(!gated.contains(40L) && gated.contains(42L))
    // near-verbatim consistency: gated iff not flagged
    assert(gated.contains(41L) != report.contains(41L))
  }

  test("scrubGate chains scrubbers and gates: boilerplate lines drop, " +
      "contaminated and near-copy documents filter out") {
    import spark.implicits._
    val line = FrequentLineScrub(minDocs = 2)
    val bloom = BloomGate(n = 3)
    val novelty = NoveltyGate(n = 3, minNovelty = 0.5)
    store.writeScrubArtifact("db2", line, frozenCorpus, col("doc_id"), col("body"))
    store.writeScrubArtifact("db2", bloom,
      benchmark.select(lit(0L).as("id"), col("question").as("q")),
      col("id"), col("q"))
    store.writeScrubArtifact("db2", novelty, frozenCorpus, col("doc_id"), col("body"))

    val batch = Seq(
      // clean doc carrying the frozen corpus's boilerplate line: line
      // scrubbed away, survives both gates
      (10L, s"completely fresh material here today\n$boiler"),
      // contaminated: contains a benchmark trigram → bloom gate drops it
      (11L, "students ask what is the capital of atlantis in class"),
      // near-copy of frozen doc 3 → novelty 0 → novelty gate drops it
      (12L, "kilo lima mike november oscar papa quebec romeo sierra tango"),
      (13L, "unrelated brand new content entirely different words"))
      .toDF("id", "text")

    val out = store.scrubGate("db2", Seq(line, bloom, novelty),
        batch, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(10L, 13L))
    assert(out(10L) == "completely fresh material here today")
    assert(out(13L) == "unrelated brand new content entirely different words")
  }

  test("streaming daily-ingest gate: an all-streaming-safe chain " +
      "(line scrub → cdc scrub → bloom gate) runs on an unbounded " +
      "stream and matches the batch result row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val line = FrequentLineScrub(minDocs = 2)
    val cdc = CdcScrub(minDocs = 2)
    val bloom = BloomGate(n = 3)
    store.writeScrubArtifact("db3", line, frozenCorpus, col("doc_id"), col("body"))
    store.writeScrubArtifact("db3", cdc, frozenCorpus, col("doc_id"), col("body"))
    store.writeScrubArtifact("db3", bloom,
      benchmark.select(lit(0L).as("id"), col("question").as("q")),
      col("id"), col("q"))
    val chain = Seq(line, cdc, bloom)

    val rows = Seq(
      (20L, s"fresh streaming content arrives\n$boiler"),
      (21L, "they wondered what is the capital of atlantis yesterday"),
      (22L, s"alpha bravo charlie delta echo\nplus novel trailing words"),
      (23L, "plain boring but original text"))

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("id", "text")
    val gated = store.scrubGate("db3", chain, stream, col("id"), col("text"))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("daily_gate").start()
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*) // across micro-batches
    q.processAllAvailable()
    val streamed = spark.sql("SELECT id, text FROM daily_gate ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    q.stop()

    val batched = store.scrubGate("db3", chain, rows.toDF("id", "text"),
        col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(streamed == batched)
    assert(streamed.map(_._1) == Seq(20L, 22L, 23L)) // 21 is contaminated
    assert(!streamed.exists(_._2.contains(boiler)))
  }
}
