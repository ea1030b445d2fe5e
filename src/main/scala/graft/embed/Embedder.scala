package graft.embed

/**
 * Embedding backend abstraction (SURVEY §2.2 O12/O13). The reference runs a
 * SentenceTransformer forward pass over padded token batches
 * (`/root/reference/embedding_models.py:373-487`); in the Spark engine an
 * `Embedder` is instantiated once per executor partition (heavyweight model
 * state stays off the driver) and applied via `mapPartitions`, or — for the
 * deterministic test stub — via the codegen'd [[graft.expr.HashEmbed]]
 * expression.
 */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  /** Batched entry point; backends with real batching override this. */
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = texts.map(embed)
}

/**
 * Deterministic hash-projection embedder (FIXTURES.md §4): lowercase → split
 * on whitespace → for each token, its character 3-grams (tokens shorter than
 * 3 chars contribute themselves); each gram `g` hashes with xxhash64(seed) —
 * the same XXH64 Spark's `xxhash64` built-in uses — adding weight
 * `1 + floorMod(h, 7)` into bucket `floorMod(h, dim)`; final vector is
 * L2-normalized (zero vector stays zeros).
 *
 * Stands in for the model forward pass in every test so results are
 * reproducible across JVMs (SURVEY §5.5); the production path swaps in a real
 * backend behind the same trait.
 */
final case class HashEmbedder(dim: Int = 64, seed: Long = 42L) extends Embedder {

  override def embed(text: String): Array[Float] = {
    val acc = new Array[Double](dim)
    if (text != null) {
      val lower = text.toLowerCase(java.util.Locale.ROOT)
      var tokStart = 0
      var i = 0
      val n = lower.length
      while (i <= n) {
        if (i == n || Character.isWhitespace(lower.charAt(i))) {
          if (i > tokStart) addToken(acc, lower, tokStart, i)
          tokStart = i + 1
        }
        i += 1
      }
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    val out = new Array[Float](dim)
    if (ss > 0.0) {
      val inv = 1.0 / math.sqrt(ss)
      j = 0
      while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    }
    out
  }

  private def addToken(acc: Array[Double], s: String, from: Int, until: Int): Unit = {
    val len = until - from
    if (len < 3) addGram(acc, s.substring(from, until))
    else {
      var i = from
      while (i + 3 <= until) { addGram(acc, s.substring(i, i + 3)); i += 1 }
    }
  }

  private def addGram(acc: Array[Double], g: String): Unit = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(g)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), seed)
    val bucket = java.lang.Math.floorMod(h, dim.toLong).toInt
    acc(bucket) += 1.0 + java.lang.Math.floorMod(h, 7L).toDouble
  }
}
