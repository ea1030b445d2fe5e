package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{Embedder, HashEmbedder}
import graft.ingest.IngestJob

/** A production-shaped batching backend: buffers the incoming iterator,
  * "runs the model" per batch (here: the deterministic hash projection, so
  * results are comparable), and records every batch size it saw. Stands in
  * for an ONNX/JNI SentenceTransformer to prove the contract below is
  * implementation-agnostic — a real backend must pass the same suite. */
final class FakeBatchingEmbedder(val dim: Int = 64) extends Embedder {
  private val inner = HashEmbedder(dim)
  // records batch sizes per JVM (executor side); ok for local[n] tests
  def batchSizes: Seq[Int] = FakeBatchingEmbedder.sizes.synchronized {
    FakeBatchingEmbedder.sizes.toSeq
  }
  override def embed(text: String): Array[Float] = inner.embed(text)
  override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
    val batch = texts.toArray
    FakeBatchingEmbedder.sizes.synchronized { FakeBatchingEmbedder.sizes += batch.length }
    batch.iterator.map(inner.embed)
  }
}
object FakeBatchingEmbedder {
  private val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
  def reset(): Unit = sizes.synchronized { sizes.clear() }
}

/** No-arg-constructible backend standing in for an env-var-named real one
  * (the `GRAFT_EMBEDDER_CLASS` loading contract). */
final class NoArgEmbedder extends Embedder {
  private val inner = HashEmbedder(8)
  override def dim: Int = 8
  override def embed(text: String): Array[Float] = inner.embed(text)
}

/**
 * The contract every production [[Embedder]] backend must satisfy to slot
 * into the `mapPartitions` ingest path (O12). Run against the deterministic
 * stub AND a production-shaped batching fake; a real ONNX/JNI backend drops
 * into `backends` unchanged when the environment ever ships one.
 */
class EmbedderContractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Reflective backend loader for the env-var hook below: the named
    * class must be an [[Embedder]] with a public no-arg constructor
    * (model path / device configuration belongs in the backend's own
    * environment handling, not this contract). */
  private def loadBackend(className: String): Embedder =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[Embedder]

  // The day an inference runtime jar ships, point GRAFT_EMBEDDER_CLASS at
  // the real backend and every contract case below runs against it with
  // ZERO code change. Unset (this environment: offline resolution, no
  // ONNX/DJL jars — Embedder.scala:12-20), the hook stays dormant and the
  // documentation test at the bottom records that fact in the test report.
  private val envBackend: Option[(String, () => Embedder)] =
    sys.env.get("GRAFT_EMBEDDER_CLASS").map { cn =>
      s"env:$cn" -> (() => loadBackend(cn))
    }

  private val backends: Seq[(String, () => Embedder)] = Seq(
    "HashEmbedder" -> (() => HashEmbedder(64)),
    "FakeBatchingEmbedder" -> (() => new FakeBatchingEmbedder(64))) ++
    envBackend

  private val texts = Seq("alpha beta gamma", "", "Mixed CASE tokens",
    "xy", "a much longer text with many tokens to embed for the test", null)

  for ((name, mk) <- backends) {
    test(s"$name: dim holds for every input, including null and empty") {
      val e = mk()
      for (t <- texts) assert(e.embed(t).length == e.dim, s"input: $t")
    }

    test(s"$name: deterministic — equal input, equal vector") {
      val e = mk()
      for (t <- texts)
        assert(java.util.Arrays.equals(e.embed(t), mk().embed(t)), s"input: $t")
    }

    test(s"$name: embedBatch ≡ map(embed), order- and count-preserving") {
      val e = mk()
      val batched = e.embedBatch(texts.iterator.map(t => t)).toSeq
      assert(batched.length == texts.length)
      for ((t, i) <- texts.zipWithIndex)
        assert(java.util.Arrays.equals(batched(i), e.embed(t)), s"index $i")
    }

    test(s"$name: survives java serialization (ships to executors)") {
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(mk())
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[Embedder]
      assert(java.util.Arrays.equals(back.embed("round trip"), mk().embed("round trip")))
    }
  }

  test("env hook: loadBackend instantiates an Embedder by class name " +
      "(GRAFT_EMBEDDER_CLASS wires a real backend into this suite)") {
    // mechanism proof with a no-arg test class; the env var itself is
    // exercised the day a runtime jar exists — dormant today, and that
    // state is recorded here rather than silently skipped
    val e = loadBackend(classOf[NoArgEmbedder].getName)
    assert(e.dim == 8 && e.embed("x").length == 8)
    envBackend match {
      case Some((name, _)) => info(s"external backend under contract: $name")
      case None => info("GRAFT_EMBEDDER_CLASS unset — no inference runtime " +
        "in this environment (Embedder.scala:12-20); hook dormant")
    }
  }

  test("embedWith feeds bounded batches through embedBatch and keeps ids aligned") {
    import spark.implicits._
    FakeBatchingEmbedder.reset()
    val e = new FakeBatchingEmbedder(64)
    val chunked = (1L to 37L)
      .map(i => (i, ("tok " * (i % 11 + 1).toInt).trim))
      .toDF("id", "text")
      .withColumn("metadata", struct(lit("f").as("file_name")))
      .repartition(3)
    val out = IngestJob.embedWith(chunked, e, batchSize = 8)
      .select("id", "vector", "text").collect()
    assert(out.length == 37)
    // 1:1 id↔vector alignment: each row's vector is the embedding of ITS text
    val ref = HashEmbedder(64)
    out.foreach { r =>
      val expect = ref.embed(r.getAs[String]("text")).toSeq
      assert(r.getAs[scala.collection.Seq[Float]]("vector").toSeq == expect,
        s"id ${r.getAs[Long]("id")}")
    }
    // batching actually happened, and no batch exceeded the bound
    val sizes = e.batchSizes
    assert(sizes.nonEmpty && sizes.forall(s => s > 0 && s <= 8))
    assert(sizes.sum == 37)
  }
}
