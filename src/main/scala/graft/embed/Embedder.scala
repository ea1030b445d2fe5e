package graft.embed

/**
 * Embedding backend abstraction (SURVEY §2.2 O12/O13). The reference runs a
 * SentenceTransformer forward pass over padded token batches
 * (`/root/reference/embedding_models.py:373-487`); in the Spark engine an
 * `Embedder` is instantiated once per executor partition (heavyweight model
 * state stays off the driver) and applied via `mapPartitions`, or — for the
 * deterministic test stub — via the codegen'd [[graft.expr.HashEmbed]]
 * expression.
 *
 * Environment constraint (re-verified 2026-08-13, round 5): this build
 * environment ships no inference runtime — `/opt/spark/jars` contains no
 * ONNX Runtime / DJL / TF-Java artifacts and dependency resolution is
 * offline-only — so a real transformer backend cannot be linked here. The
 * contract a production backend must satisfy is executable:
 * `EmbedderContractSpec` (batch≡single parity, dimension stability, null
 * handling, determinism) runs against any `Embedder` implementation;
 * swapping one in is a constructor call at the `IngestJob`/`Searcher`
 * call sites, no pipeline change.
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
 * 3 chars contribute themselves); each gram `g` hashes with
 * [[graft.expr.PortableHash.hex15]] (md5 — so the DuckDB verification oracle
 * reproduces the exact vector, SURVEY §5.5), adding integer weight
 * `1 + h % 7` into bucket `h % dim`.
 *
 * The vector is intentionally NOT normalized: bucket sums are small
 * integers, exactly representable in float32, so every engine computes
 * bit-identical vectors and (since cosine similarity is scale-invariant)
 * identical similarities — normalizing would re-introduce engine-specific
 * float rounding. Callers needing unit vectors apply `l2_normalize`.
 *
 * Stands in for the model forward pass in every test so results are
 * reproducible across JVMs and engines; the production path swaps in a real
 * backend behind the same trait. (`seed` participates only through gram
 * suffixing so distinct seeds give distinct spaces; seed 42 is the fixture
 * default and adds nothing to the gram.)
 */
final case class HashEmbedder(dim: Int = 64, seed: Long = 42L) extends Embedder {

  override def embed(text: String): Array[Float] = {
    val acc = new Array[Int](dim)
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
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toFloat; j += 1 }
    out
  }

  private def addToken(acc: Array[Int], s: String, from: Int, until: Int): Unit = {
    val len = until - from
    if (len < 3) addGram(acc, s.substring(from, until))
    else {
      var i = from
      while (i + 3 <= until) { addGram(acc, s.substring(i, i + 3)); i += 1 }
    }
  }

  private def addGram(acc: Array[Int], g: String): Unit = {
    val key = if (seed == 42L) g else g + " " + seed
    val h = graft.expr.PortableHash.hex15(key)
    acc((h % dim).toInt) += (1L + h % 7L).toInt
  }
}
