package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/**
 * Result re-ranking: maximal marginal relevance (Carbonell & Goldstein,
 * SIGIR 1998) — greedy diversification of a retrieval candidate list, the
 * standard fix for top-k lists that return k near-copies of the same
 * passage (which a near-dup-heavy corpus guarantees; see [[Dedup]]).
 *
 * MMR(d) = λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s); pick the argmax
 * k times (first pick has an empty selected set — its penalty term is 0,
 * so it is the plain top-1). Ties break to the lowest id.
 *
 * Scale shape: the greedy loop is inherently sequential in k, so it runs
 * on a BOUNDED candidate list — the distributed work is the candidate
 * retrieval (one scan + TakeOrderedAndProject, or any [[Ann]]/[[Ivf]]
 * index path), after which `nCandidates × dim` floats collect to the
 * driver exactly like a top-k result does. k·n pairwise cosines on the
 * driver (50×50 doubles here) — never a distributed self-join. The
 * pairwise-sim arithmetic is [[graft.expr.VectorOps.cosine]]'s kernel, so
 * the DuckDB oracle replays the same greedy trace bit-for-bit.
 */
object Rerank {

  /** Same accumulation order as VectorOps.cosine / PortableSql.cosSql. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The greedy MMR trace over an in-memory candidate list
    * `(id, vec, simToQuery)`: returns `(rank, id, mmrScore)` in pick
    * order. Exposed for reuse by store-backed search paths. */
  def mmrSelect(cands: Seq[(Long, Array[Float], Double)], k: Int,
      lambda: Double): Seq[(Int, Long, Double)] = {
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.map { case (id, v, s) => id -> (v, s) }: _*)
    val picked = Seq.newBuilder[(Int, Long, Double)]
    val sel = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.foreach { case (id, (v, s)) =>
        val pen = if (sel.isEmpty) 0.0 else sel.map(cos(v, _)).max
        val score = lambda * s - (1.0 - lambda) * pen
        if (score > bestScore || (score == bestScore && (bestId < 0 || id < bestId))) {
          bestScore = score; bestId = id
        }
      }
      val (v, _) = remaining.remove(bestId).get
      sel += v
      picked += ((rank, bestId, bestScore))
      rank += 1
    }
    picked.result()
  }

  /** End-to-end diversified top-k: one distributed scan takes the
    * `nCandidates` highest-cosine rows (TakeOrderedAndProject), the
    * bounded MMR trace runs on the driver, and the picks return as a
    * `(rnk, id, mmr)` frame. */
  def mmrTopK(emb: DataFrame, idCol: Column, vecCol: Column,
      query: Array[Float], k: Int, nCandidates: Int = 50,
      lambda: Double = 0.7): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cands = emb
      .select(idCol.cast("long").as("id"), vecCol.cast("array<float>").as("v"),
        cosine_similarity(vecCol, typedLit(query)).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(nCandidates)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .toSeq
    mmrSelect(cands, k, lambda)
      .map { case (rnk, id, score) =>
        // HALF_UP to match SQL round() in both engines (rint is half-even)
        (rnk, id, BigDecimal(score).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("rnk", "id", "mmr")
  }

  /** Cross-encoder re-ranking over a BOUNDED candidate list: score each
    * `(query, candidate_text)` pair with a [[CrossScorer]] backend applied
    * per partition (`mapPartitions` — heavyweight model state initializes
    * once per task, exactly the [[graft.embed.Embedder]] deployment
    * shape), take the top `k` by `(score DESC, id)`. The input MUST
    * already be a candidate list (a first-stage retrieval output, ≤
    * thousands of rows) — a cross-encoder forward pass per corpus row is
    * never the plan at 100 TB; first stages prune, this op re-orders. */
  def crossRerank(cands: DataFrame, idCol: Column, textCol: Column,
      query: String, scorer: CrossScorer, k: Int): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(idCol.cast("long").as("id"), textCol.as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rows = it.toArray // bounded by the candidate-list contract
        val scores = scorer.scoreBatch(query, rows.iterator.map(_._2)).toArray
        // a zip would silently drop candidates on a miscounting backend
        require(scores.length == rows.length,
          s"CrossScorer returned ${scores.length} scores for ${rows.length} texts")
        rows.iterator.zip(scores.iterator).map { case ((id, _), s) => (id, s) }
      }
      .toDF("id", "score")
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Cross-encoder DISTILLATION pair mining: score every (query,
    * candidate) pair of a first-stage retrieval output with the teacher
    * [[CrossScorer]], then keep per query the top `posK` (positives) and
    * the bottom `negK` (hardest rejects) by teacher score — the
    * (query, passage, teacher_score) triples a bi-encoder student
    * trains on (the standard KD recipe behind models like TinyBERT
    * rerankers / margin-MSE). Output: `(qid, did, t_score, rnk,
    * is_pos)` with `rnk` 1-based by (score DESC, did ASC).
    *
    * Scale shape: the input MUST be a per-query candidate list (first
    * stages prune; a teacher forward pass per corpus row is never the
    * plan) — scoring batches one query's texts per [[CrossScorer
    * .scoreBatch]] call inside `mapPartitions`, and the per-query
    * windows sort candidate-list-bounded partitions only. */
  def distillationPairs(cands: DataFrame, qIdCol: Column, qTextCol: Column,
      dIdCol: Column, dTextCol: Column, scorer: CrossScorer,
      posK: Int, negK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = cands.sparkSession
    import spark.implicits._
    val scored = cands.select(qIdCol.cast("long").as("qid"),
        qTextCol.as("qt"), dIdCol.cast("long").as("did"), dTextCol.as("dt"))
      .as[(Long, String, Long, String)]
      .mapPartitions { it =>
        // group the partition's rows by query so real backends get one
        // batched forward pass per query, like crossRerank
        it.toSeq.groupBy { case (qid, qt, _, _) => (qid, qt) }
          .iterator.flatMap { case ((qid, qt), rows) =>
            val scores = scorer.scoreBatch(qt,
              rows.iterator.map(_._4)).toArray
            require(scores.length == rows.length,
              s"CrossScorer returned ${scores.length} scores for ${rows.length} texts")
            rows.iterator.zip(scores.iterator)
              .map { case ((_, _, did, _), s) => (qid, did, s) }
          }
      }
      .toDF("qid", "did", "t_score")
    val top = Window.partitionBy("qid")
      .orderBy(col("t_score").desc, col("did").asc)
    val bottom = Window.partitionBy("qid")
      .orderBy(col("t_score").asc, col("did").desc)
    scored
      .withColumn("rnk", row_number().over(top))
      .withColumn("__tail", row_number().over(bottom))
      .filter(col("rnk") <= posK || col("__tail") <= negK)
      .select(col("qid"), col("did"),
        round(col("t_score"), 4).as("t_score"), col("rnk"),
        (col("rnk") <= posK).as("is_pos"))
  }
}

/** Pair-scoring backend for cross-encoder re-ranking. Like
  * [[graft.embed.Embedder]]: one instance per executor partition, real
  * model state stays off the driver, batching via [[scoreBatch]]. */
trait CrossScorer extends Serializable {
  def score(query: String, text: String): Double
  /** Batched entry point; backends with real batching override this. */
  def scoreBatch(query: String, texts: Iterator[String]): Iterator[Double] =
    texts.map(score(query, _))
}

/** Deterministic md5 stub scorer (engine-portable: the DuckDB oracle
  * recomputes `hex15(md5(query || U+0001 || text)) % 10000 / 10000`), standing
  * in for a real cross-encoder forward pass exactly as
  * [[graft.embed.HashEmbedder]] stands in for the bi-encoder — the
  * production backend swaps in behind the same trait. */
final case class HashCrossScorer() extends CrossScorer {
  override def score(query: String, text: String): Double =
    (graft.expr.PortableHash.hex15(query + "\u0001" + text) % 10000L) / 10000.0
}
