package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * Static vector kernels shared by interpreted eval and generated code.
 *
 * These are the numeric core of the FLAT (brute-force) cosine index of the
 * reference engine (`/root/reference/vector_db_creator.py:337-344`,
 * `/root/reference/vector_db_query.py:163` — there executed inside the
 * tiledb-vector-search C++ library). Here they run inside Spark whole-stage
 * codegen: the expressions in [[VectorExpressions]] emit direct static calls
 * to these methods, so a top-k scan stays a single tight loop over the
 * Parquet column batches.
 *
 * All kernels accumulate in double precision regardless of input element
 * width (embeddings are stored float32, FIXTURES.md §1).
 */
object VectorOps {

  /** Dot product of two float arrays; lengths must match. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"vector dims differ: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Cosine similarity in [-1, 1]; 0.0 when either vector has zero norm. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"vector dims differ: $n vs ${b.numElements()}")
    var dotp = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dotp += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dotp / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine distance = 1 - cosine similarity (the reference's FLAT metric). */
  def cosineDistance(a: ArrayData, b: ArrayData): Double = 1.0 - cosine(a, b)

  /** L2-normalize into a fresh float array; zero vector stays zeros
    * (reference normalizes embeddings at `embedding_models.py:437`). */
  def l2Normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; ss += x * x; i += 1 }
    val out = new Array[Float](n)
    if (ss > 0.0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { out(i) = (a.getFloat(i).toDouble * inv).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Euclidean norm of a float vector. */
  def l2Norm(a: ArrayData): Double = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; ss += x * x; i += 1 }
    math.sqrt(ss)
  }

  /** cid of the centroid with maximal cosine similarity to `v`; ties keep
    * the EARLIEST array element, so callers that sort centroids by cid get
    * ties → lowest cid (the IVF assignment contract, [[graft.ops.Ivf]]).
    * `cents` is `ARRAY<STRUCT<cid INT, c ARRAY<FLOAT>>>`. Row-local by
    * construction: the per-row argmax that previously needed a
    * crossJoin + re-aggregation (a full-corpus shuffle) runs as one fused
    * loop inside whole-stage codegen. */
  def nearestCentroid(v: ArrayData, cents: ArrayData): Int = {
    val n = cents.numElements()
    var best = -1
    var any = false
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      // null struct elements / null vectors are skipped, not NPE'd: the
      // SQL-registered nearest_centroid sees arbitrary user arrays, and
      // checkInputDataTypes can't guard runtime values
      if (!cents.isNullAt(i)) {
        val st = cents.getStruct(i, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val sim = cosine(v, st.getArray(1))
          if (!any || sim > bestSim) { bestSim = sim; best = st.getInt(0); any = true }
        }
      }
      i += 1
    }
    if (!any) throw new IllegalArgumentException(
      "nearest_centroid: centroids array is empty (or all-null) — no cid to return")
    best
  }
}
