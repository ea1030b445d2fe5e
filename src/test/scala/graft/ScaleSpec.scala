package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale

/** Physical-scale mechanics: salted aggregation equivalence and
  * shuffle-free bucketed joins. */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-scale").toString
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted aggregate equals plain groupBy") {
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val salted = Scale.saltedAggregate(li, col("l_returnflag"), col("l_quantity"))
      .orderBy("k").collect()
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(count("*").as("n"), sum("l_quantity").as("s"),
        min("l_quantity").as("mn"), max("l_quantity").as("mx"))
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq)
  }

  test("z-order key interleaves bits; z-ordered write round-trips sorted") {
    import spark.implicits._
    val df = Seq((3L, 5L), (1L, 0L), (0L, 1L), (0L, 0L)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Scale.zOrderKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // hand-interleaved: z(3,5) = 1+2+4+32 = 39; z(1,0)=1; z(0,1)=2
    assert(got == Set((3L, 5L, 39L), (1L, 0L, 1L), (0L, 1L, 2L), (0L, 0L, 0L)))

    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val data = spark.range(0, 1000).select(
      (col("id") % 32).as("a"), (col("id") / 32).as("b"), col("id"))
    Scale.writeZOrdered(data, s"$dir/t", col("a"), col("b"))
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 1000) // content preserved, _z dropped
    assert(back.columns.toSet == Set("a", "b", "id"))
  }

  test("IVF assignment is a shuffle-free projection: one row per input row") {
    import spark.implicits._
    // duplicate full rows on purpose: round 2's groupBy-argmax formulation
    // silently collapsed them (ADVICE r2); the NearestCentroid projection
    // must keep every row AND plan with zero exchanges
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.7f, 0.7f))
    ).toDF("id", "v")
    val cents = Seq(0 -> (Seq(1.0f, 0.0f): Seq[Float]),
      1 -> (Seq(0.0f, 1.0f): Seq[Float]))
    val assigned = graft.ops.Ivf.assignClusters(emb, col("id"), col("v"), cents)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    val rows = assigned.collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(rows.length == 4, "duplicate rows must survive assignment")
    assert(rows.count(_ == (1L, 0)) == 2)
    assert(rows.contains((2L, 1)))
    // equidistant vector ties to the LOWEST cid (the documented contract)
    assert(rows.contains((3L, 0)))
  }

  test("bucketed join plans without a shuffle exchange") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Scale.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", 4, Seq("o_custkey"))
    Scale.writeBucketed(c.select(col("c_custkey").as("o_custkey"), col("c_acctbal")),
      "customer_b", 4, Seq("o_custkey"))

    // force the sort-merge path (at this tiny scale Catalyst would rather
    // broadcast, which also avoids a shuffle but hides the bucketing story)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "orders_b", "customer_b", Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and the result is still correct
      assert(joined.count() ==
        o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("mixtureSample: integer copies exact, fractional in expectation, unlisted drop") {
    import spark.implicits._
    import graft.ops.Curation
    val rows = (0L until 400L).map(id =>
      (id, Seq("a", "b", "c", "d")((id % 4).toInt))).toDF("id", "src")
    val got = Curation.mixtureSample(rows, col("id"), col("src"),
      Map("a" -> 2.0, "b" -> 0.5, "c" -> 1.25)).collect()
    val bySrc = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(!bySrc.contains("d"))                  // unlisted stratum drops
    assert(bySrc("a") == 200)                     // w=2.0 → exactly 2 copies each
    assert(bySrc("b") >= 20 && bySrc("b") <= 80)  // w=0.5 of 100, md5-keyed
    assert(bySrc("c") >= 100 && bySrc("c") <= 160) // w=1.25 of 100
    // copy indices are 1..copies per id, and the whole thing re-runs identically
    val aCopies = got.filter(_.getString(1) == "a").groupBy(_.getLong(0))
    assert(aCopies.values.forall(_.map(_.getInt(2)).sorted.sameElements(Array(1, 2))))
    val again = Curation.mixtureSample(rows, col("id"), col("src"),
      Map("a" -> 2.0, "b" -> 0.5, "c" -> 1.25)).collect()
    assert(got.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("writeShards: deterministic layout, one file per shard, manifest") {
    import graft.ops.Curation
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = spark.range(0, 500).toDF("id")
      .withColumn("payload", concat(lit("doc-"), col("id")))
    val stats = Curation.writeShards(df, col("id"), nShards = 8, s"$dir/out")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats.values.sum == 500L)
    assert(stats.keySet == (0 until 8).toSet) // md5 spreads every shard
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 500)
    // shard column round-trips AND matches a fresh assignment (determinism)
    assert(back.filter(col("shard") =!=
      Curation.shardAssign(col("id"), 8)).count() == 0)
    // one data file per shard directory
    for (s <- 0 until 8) {
      val files = new java.io.File(s"$dir/out/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard=$s")
    }
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out/_manifest.json")))
    for ((s, n) <- stats)
      assert(manifest.contains(s"""{"shard": $s, "n_rows": $n}"""))

    // filesPerShard fans out even when gcd(nShards, filesPerShard) > 1:
    // the sub-key is h / nShards, not h % filesPerShard (which is constant
    // within a shard for power-of-two combos)
    Curation.writeShards(df, col("id"), nShards = 8, s"$dir/fan",
      filesPerShard = 2)
    val fanned = (0 until 8).map { s =>
      new java.io.File(s"$dir/fan/shard=$s")
        .listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(fanned.count(_ == 2) >= 6, fanned.mkString(",")) // ~500/8/2 rows per file
    assert(spark.read.parquet(s"$dir/fan").count() == 500)
  }

  test("rangeShardAssign/writeRangeShards: balanced, globally sorted, invariant") {
    import graft.ops.Curation
    val df = spark.range(0, 500).toDF("id")
      .withColumn("key", col("id") % 37) // heavy ties: id breaks them
    val order = Seq(col("key"), col("id"))
    val assigned = Curation.rangeShardAssign(df, order, 8)
    val sizes = assigned.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // ntile balance: 500 = 4×63 + 4×62, extras on the first shards
    assert(sizes == Map(0 -> 63L, 1 -> 63L, 2 -> 63L, 3 -> 63L,
      4 -> 62L, 5 -> 62L, 6 -> 62L, 7 -> 62L))
    // shard boundaries respect the total order: max(key,id) of shard s
    // precedes min(key,id) of shard s+1
    val spans = assigned
      .groupBy("shard")
      .agg(min(struct(col("key"), col("id"))).as("lo"),
        max(struct(col("key"), col("id"))).as("hi"))
      .orderBy("shard")
      .collect().map(r => (r.getStruct(1), r.getStruct(2)))
    for (Seq((_, hi), (lo, _)) <- spans.toSeq.sliding(2))
      assert(Seq(hi, lo).map(s => (s.getLong(0), s.getLong(1))) ==
        Seq(hi, lo).map(s => (s.getLong(0), s.getLong(1))).sorted)
    // assignment is a pure function of the data, not its partitioning
    val again = Curation.rangeShardAssign(df.repartition(13), order, 8)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(assigned.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(2))).sameElements(again))

    // the writer: sorted-on-read layout + range-pruning manifest
    val dir = java.nio.file.Files.createTempDirectory("graft-rs").toString
    Curation.writeRangeShards(df, order, 8, s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 500)
    val replay = (0 until 8).flatMap { s =>
      spark.read.parquet(s"$dir/out/shard=$s")
        .collect().map(r => (r.getLong(1), r.getLong(0))) // (key, id) file order
    }
    assert(replay == replay.sorted, "shard-order replay must be the global sort")
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out/_manifest.json")))
    assert(manifest.contains(""""shard": 0, "n_rows": 63""") &&
      manifest.contains(""""min_key""""))
  }

  test("binnedRangeJoin: matches naive BETWEEN join; no nested loop in plan") {
    import spark.implicits._
    val probe = Seq(0.5, 1.0, 3.9, 4.0, 7.2, 10.0, -1.0).toDF("x")
    val ranges = Seq((1L, 0.0, 4.0), (2L, 3.5, 8.0), (3L, 9.0, 9.5))
      .toDF("id", "lo", "hi")
    val binned = Scale.binnedRangeJoin(probe, col("x"), ranges,
      col("id"), col("lo"), col("hi"), binWidth = 2.0)
    val got = binned.select(col("range_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val naive = probe.join(ranges, col("x") >= col("lo") && col("x") <= col("hi"))
      .select(col("id"), col("x")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == naive && naive.nonEmpty)
    assert(!binned.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("suffixRanks: hand-computed order, tied identical suffixes, invariant") {
    import spark.implicits._
    import graft.ops.Suffix
    // suffix multiset: "a"×2 < "a b a"×2 < "b a"×2 < "b a b a" — three
    // identical cross-document suffixes pin the tie (dense-rank) rule
    val docs = Seq((1L, "b a b a"), (2L, "a b a")).toDF("id", "text")
    val got = Suffix.suffixRanks(docs, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq(
      (1L, 0, 3L), (1L, 1, 1L), (1L, 2, 2L), (1L, 3, 0L),
      (2L, 0, 1L), (2L, 1, 2L), (2L, 2, 0L)))
    val again = Suffix.suffixRanks(docs.repartition(7), col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(got.sameElements(again))
  }

  test("suffixRanks: pruned and dense loops agree; the size switch " +
      "records which ran") {
    import spark.implicits._
    import graft.ops.Suffix
    // tie-heavy fixture: repeated shared runs + identical whole suffixes
    val docs = (0 until 24).map { i =>
      val fill = (0 until 6).map(j => s"w${(i * 7 + j * 3) % 11}")
      (i.toLong, (fill :+ "end a b c").mkString(" "))
    }.toDF("id", "text")
    val dense = Suffix.suffixRanks(docs, col("id"), col("text"),
        pruneThresholdTokens = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(Suffix.lastLoop == "dense")
    val pruned = Suffix.suffixRanks(docs, col("id"), col("text"),
        pruneThresholdTokens = 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(Suffix.lastLoop == "pruned")
    assert(dense.sameElements(pruned))
    // the default threshold keeps bench-scale corpora on the dense loop
    assert(Suffix.DefaultPruneThresholdTokens > 100000L)
  }

  test("gramSpectrum: matches the brute-force per-length census, both loops") {
    import spark.implicits._
    import graft.ops.Suffix
    val texts = Seq("a b a b a", "b a b", "a b a c", "c c c c c c")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    def run(threshold: Long) =
      Suffix.gramSpectrum(docs, col("id"), col("text"), 1, 6,
          pruneThresholdTokens = threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val tok = texts.map(_.split(" ").toSeq)
    val expect = (1 to 6).flatMap { l =>
      val grams = tok.flatMap(t =>
        t.sliding(l).filter(_.length == l).map(_.mkString(" ")))
      if (grams.isEmpty) None
      else {
        val counts = grams.groupBy(identity).map(_._2.size)
        Some((l.toLong, grams.size.toLong, counts.size.toLong,
          counts.count(_ > 1).toLong))
      }
    }
    val dense = run(Long.MaxValue)
    assert(Suffix.lastLoop == "dense")
    assert(dense == expect)
    val pruned = run(1L)
    assert(Suffix.lastLoop == "pruned")
    assert(pruned == expect)
  }

  test("maximalRepeats: only runs extendable neither way survive; " +
      "shared boundary sentinel") {
    import spark.implicits._
    import graft.ops.Suffix
    val docs = Seq((1L, "x a b a b y"), (2L, "z a b w")).toDF("id", "text")
    val out = Suffix.maximalRepeats(docs, col("id"), col("text"),
        minLen = 1, maxLen = 4, minCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // "a" is always followed by b (not right-maximal); "b" is always
    // preceded by a (not left-maximal); "a b" has prevs {x,b,z} and
    // nexts {a,y,w} — the lone maximal repeat
    assert(out.toSeq == Seq((2L, "a b", 3L, 3L, 3L)))
    // doc-start occurrences share ONE sentinel: "s t" at two doc starts
    // with identical right context is maximal in NEITHER direction
    val starts = Seq((1L, "s t u"), (2L, "s t u")).toDF("id", "text")
    val so = Suffix.maximalRepeats(starts, col("id"), col("text"),
      minLen = 1, maxLen = 3, minCount = 2).collect()
    assert(so.isEmpty)
  }

  test("maximalRepeatsAll: equals brute force on randomized corpora and " +
      "the bounded miner on a shared length range") {
    import spark.implicits._
    import graft.ops.Suffix
    // brute force: enumerate every substring, count, collect neighbor
    // sets with the shared '' sentinel, filter maximal
    def brute(texts: Seq[String], minLen: Int,
        minCount: Int): Set[(Long, String, Long)] = {
      val toks = texts.map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
      val occ = scala.collection.mutable.HashMap
        .empty[(Int, String), (Long, Set[String], Set[String])]
      for (t <- toks; l <- 1 to t.length; p <- 0 to t.length - l) {
        val g = t.slice(p, p + l).mkString(" ")
        val prev = if (p > 0) t(p - 1) else ""
        val next = if (p + l < t.length) t(p + l) else ""
        val (c, ps, ns) = occ.getOrElse((l, g), (0L, Set[String](), Set[String]()))
        occ((l, g)) = (c + 1, ps + prev, ns + next)
      }
      occ.collect { case ((l, g), (c, ps, ns))
        if l >= minLen && c >= minCount && ps.size >= 2 && ns.size >= 2 =>
        (l.toLong, g, c)
      }.toSet
    }
    // deterministic pseudo-random corpora over a small alphabet (dense
    // repeat structure, whole-suffix ties, doc-boundary runs)
    for (seed <- 1 to 4) {
      val texts = (0 until 6).map { d =>
        (0 until 12).map(j =>
          s"t${(seed * 31 + d * 7 + j * j * 5) % 4}").mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = Suffix.maximalRepeatsAll(docs, col("id"), col("text"),
          minLen = 1, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(Suffix.lastAnsv == "stack")
      val want = brute(texts, 1, 2)
      assert(got == want,
        s"seed $seed: missing=${want -- got} extra=${got -- want}")
      // the distributed ladder answers identically (threshold forced)
      val ladder = Suffix.maximalRepeatsAll(docs, col("id"), col("text"),
          minLen = 1, minCount = 2, ansvThresholdPairs = 1L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(Suffix.lastAnsv == "doubling")
      assert(ladder == want,
        s"seed $seed ladder: missing=${want -- ladder} extra=${ladder -- want}")
    }
    // consistency with the bounded miner on its length range
    val docs2 = Seq((1L, "a b c a b c a b d"), (2L, "b c a b q"),
      (3L, "c a b c z")).toDF("id", "text")
    val all = Suffix.maximalRepeatsAll(docs2, col("id"), col("text"),
        minLen = 2, minCount = 2)
      .filter(col("len") <= 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val bounded = Suffix.maximalRepeats(docs2, col("id"), col("text"),
        minLen = 2, maxLen = 4, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(all == bounded, s"all=$all bounded=$bounded")
  }

  test("longestRepeat: cross-doc and within-doc runs via neighbor LCP") {
    import spark.implicits._
    import graft.ops.Suffix
    val shared = (0 until 13).map(i => s"s$i").mkString(" ")
    val cross = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta"),
      (3L, s"x y $shared z")).toDF("id", "text")
    val r = Suffix.longestRepeat(cross, col("id"), col("text")).head()
    // rank order puts "s0… delta" < "s0… gamma" < "s0… z"; the smallest
    // max-LCP witness is the (doc1,pos2)-(doc3,pos2) neighbor pair
    assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
      r.getInt(4)) == ((13L, 1L, 2, 3L, 2)))
    // a repeat INSIDE one document counts too (q144 only sees cross-doc)
    val within = Seq((7L, "x y x y"), (8L, "p q")).toDF("id", "text")
    val w = Suffix.longestRepeat(within, col("id"), col("text")).head()
    assert((w.getLong(0), w.getLong(1), w.getInt(2), w.getLong(3),
      w.getInt(4)) == ((2L, 7L, 2, 7L, 0)))
  }

  test("kmvDistinct: exact below k, estimator within KMV error above it, " +
      "duplicate-insensitive") {
    import spark.implicits._
    import graft.ops.Scale
    // 1000 distinct values (plus duplicates — the sketch must not care)
    val vals = ((0 until 1000) ++ (0 until 500)).map(i => ("g", s"v$i"))
      .toDF("grp", "v")
    val r = Scale.kmvDistinct(vals, Seq("grp"), col("v"), k = 64).head()
    val est = r.getDouble(r.fieldIndex("est_distinct"))
    // KMV relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 3σ
    assert(math.abs(est - 1000) / 1000 < 0.4, s"est $est")
    // small group: exact count, no estimation
    val small = (0 until 10).map(i => ("s", s"w$i")).toDF("grp", "v")
    val sr = Scale.kmvDistinct(small, Seq("grp"), col("v"), k = 64).head()
    assert(sr.getDouble(sr.fieldIndex("est_distinct")) == 10.0)
  }

  test("heavyHittersSketch: exact above capacity; MG bounds below it") {
    import spark.implicits._
    // skewed stream: "hot" 60×, "warm" 25×, eight rares 5× each = 125 tokens
    val words = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (0 until 8).flatMap(i => Seq.fill(5)(s"rare$i"))
    val df = words.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val exact = Scale.heavyHittersSketch(df, col("text"), capacity = 64, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(exact.take(2).toSeq == Seq(("hot", 60L), ("warm", 25L)))
    assert(exact.length == 10 && exact.map(_._2).sum == 60 + 25 + 8 * 5)
    // tight capacity: any term with count > N/cap = 125/4 must survive,
    // and reported counts undercount by at most N/cap
    val tight = Scale.heavyHittersSketch(df, col("text"), capacity = 4, topN = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(tight.contains("hot") && tight("hot") >= 60L - 125L / 4 &&
      tight("hot") <= 60L)
    assert(!tight.contains("rare0") || tight("rare0") <= 5L)
  }

  test("cdcChunks: boundaries resynchronize after an insertion; row-local") {
    import spark.implicits._
    import graft.ops.Dedup
    // deterministic ~240-token text; divisor 8 -> ~30 chunks
    val words = (0 until 240).map(i => s"w${i * 7 % 101}")
    val base = words.mkString(" ")
    val shifted = ("INS " + base) // one token inserted at the front
    val df = Seq((1L, base), (2L, shifted)).toDF("id", "text")
    val chunks = Dedup.cdcChunks(df, col("id"), col("text"))
    val byDoc = chunks.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // CDC property: the edit only perturbs chunks near the front — the
    // vast majority of the original's chunk hashes survive the shift
    // (fixed-size blocks would lose every block after the insertion)
    val kept = (byDoc(1L) & byDoc(2L)).size.toDouble / byDoc(1L).size
    assert(kept > 0.8, s"only ${(kept * 100).round}% of chunks resynced")
    // chunk lengths average ~divisor and cover the text exactly
    val lens = chunks.filter(col("id") === 1L)
      .select(sum("n_tok"), count(lit(1))).head()
    assert(lens.getLong(0) == 240L && lens.getLong(1) >= 15L)
    // row-local chunking: the only Exchange ever allowed is the
    // small-split spread (REPARTITION_BY_NUM on the narrow fixture);
    // the op itself adds no shuffle — and on an already-spread input
    // (>= cores/2 splits) the plan has none at all
    val p1 = chunks.queryExecution.executedPlan.toString
    assert(p1.linesIterator.filter(_.contains("Exchange "))
      .forall(_.contains("REPARTITION")), p1)
    val spreadIn = Dedup.cdcChunks(df.repartition(5), col("id"), col("text"))
    val p2 = spreadIn.queryExecution.executedPlan.toString
    // the op itself never adds an aggregation/join shuffle: every
    // Exchange in sight is a repartition (the fixture's own, or the
    // guard's — AQE may coalesce the tiny 5-way shuffle back under the
    // threshold, re-arming the guard, which is fine: both are
    // REPARTITION-origin, neither is op-semantics)
    assert(p2.linesIterator.filter(_.contains("Exchange "))
      .forall(_.contains("REPARTITION")), p2)
    val again = spreadIn
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(chunks.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.sameElements(again))
  }

  test("row-local scrub family: partition-invariant, zero exchanges") {
    import spark.implicits._
    import graft.ops.{Dedup, QualitySignals, TextAnalysis}
    val docs = (0L until 40L).map { i =>
      val boiler = "shared boiler line alpha beta"
      val uniq = s"unique body $i content word${i % 7} tail${i % 5}"
      (i, if (i % 3 == 0) s"$boiler\n$uniq\n$uniq" else uniq)
    }
    val bench = Seq((0L, "shared boiler line alpha beta")).toDF("id", "text")

    def results(parts: Int): Seq[Seq[(Long, Long)]] = {
      val df = docs.toDF("id", "text").repartition(parts)
      val freq = Seq("shared boiler line alpha beta").map(l =>
        (graft.ops.Dedup.xxh64(l), l)).toDF("h", "line")
      val grams = Dedup.repeatedGrams(docs.toDF("id", "text"),
        col("id"), col("text"), k = 3)
      Seq(
        Dedup.lineDedupAgainst(df, col("id"), col("text"), freq)
          .select(col("id"), col("n_removed")),
        Dedup.spanScrubAgainst(df, col("id"), col("text"), grams, k = 3)
          .select(col("id"), col("n_removed")),
        Dedup.dedupWithinDoc(df, col("id"), col("text"))
          .select(col("id"), col("n_removed")),
        QualitySignals.bloomContamination(df, col("id"), col("text"),
          bench, col("text")).select(col("id"), col("n_flagged")),
        TextAnalysis.winnowFingerprints(df, col("id"), col("text"))
          .select(col("id"), col("n_fp")))
        .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
    // identical answers whatever the partitioning — these ops carry no
    // cross-row state
    assert(results(1) == results(7))
    // and none of them puts an Exchange in the plan: pure projections
    val df1 = docs.toDF("id", "text")
    val freq1 = Seq(("shared boiler line alpha beta")).map(l =>
      (graft.ops.Dedup.xxh64(l), l)).toDF("h", "line")
    for ((name, plan) <- Seq(
        "lineDedupAgainst" -> Dedup.lineDedupAgainst(df1, col("id"),
          col("text"), freq1),
        "dedupWithinDoc" -> Dedup.dedupWithinDoc(df1, col("id"), col("text")),
        "winnowFingerprints" -> TextAnalysis.winnowFingerprints(df1,
          col("id"), col("text"))))
      assert(!plan.queryExecution.executedPlan.toString.contains("Exchange"),
        s"$name plan has an Exchange")
  }

  test("countMinEstimates: over-estimate bound, sequential parity, invariance") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a b c d d d d"), (3L, "e"))
      .toDF("id", "text")
    val exact = Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 4L, "e" -> 1L, "zz" -> 0L)
    val probes = exact.keys.toSeq.sorted
    def run(df: org.apache.spark.sql.DataFrame, w: Int, dep: Int) =
      Scale.countMinEstimates(df, col("text"), w, dep, probes)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = run(docs, 64, 4)
    // CMS never under-counts
    exact.foreach { case (t, c) => assert(est(t) >= c, s"$t under-counted") }
    // sequential reference: same buckets folded over the raw token list
    // must equal the distributed treeAggregate result
    val toks = Seq("a", "a", "a", "b", "b", "c", "a", "b", "c",
      "d", "d", "d", "d", "e")
    def bkt(t: String, r: Int, w: Int) = {
      val h15 = graft.expr.PortableHash.hex15(t)
      ((graft.expr.PortableHash.minhashH1(h15) +
        r * graft.expr.PortableHash.minhashH2(h15)) % w).toInt
    }
    val m = Array.fill(4 * 64)(0L)
    toks.foreach(t => (0 until 4).foreach(r => m(r * 64 + bkt(t, r, 64)) += 1L))
    probes.foreach { t =>
      val ref = (0 until 4).map(r => m(r * 64 + bkt(t, r, 64))).min
      assert(est(t) == ref, s"$t: est ${est(t)} != sequential $ref")
    }
    // degenerate 1×1 sketch: every estimate is the total occurrence count
    assert(run(docs, 1, 1).values.toSet == Set(toks.length.toLong))
    // integer merges ⇒ partitioning cannot change a single cell
    assert(run(docs.repartition(7), 64, 4) == est)
  }

  test("pageRank: hand-computed integer iterations; partition-invariant") {
    import spark.implicits._
    // a→b, c→b, b→a: outdeg 1 each; micro-unit walk:
    //   iter1: s(b)=2e6, s(a)=1e6 → r1 = (b 1,850,000; a 1,000,000; c 150,000)
    //   iter2: s(b)=r1(a)+r1(c)=1,150,000 → b 1,127,500
    //          s(a)=r1(b)=1,850,000      → a 1,722,500 ; c stays 150,000
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame, iters: Int) =
      graft.ops.Graph.pageRank(df, col("src"), col("dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = run(edges, 1)
    assert(r1 == Map(1L -> 1000000L, 2L -> 1850000L, 3L -> 150000L))
    val r2 = run(edges, 2)
    assert(r2 == Map(1L -> 1722500L, 2L -> 1127500L, 3L -> 150000L))
    // pure-sink dangling node: appears via dst, keeps base + inflow, leaks
    val dangle = Seq((1L, 2L), (2L, 1L), (1L, 4L)).toDF("src", "dst")
    val rd = run(dangle, 1)
    // node 1 outdeg 2: each contribution floor(1e6/2) = 500000
    assert(rd(4L) == 150000L + 500000L * 85 / 100)
    // integer arithmetic ⇒ identical ranks whatever the partitioning
    assert(run(edges.repartition(7), 2) == r2)
  }

  test("weightedSample: weight-proportional inclusion, deterministic, " +
      "degenerates to exactSample on constant weights") {
    import spark.implicits._
    // 200 light (w=1) + 200 heavy (w=20) keys: E-S inclusion probability
    // scales with weight, so the k=100 sample must be heavy-dominated
    val rows = ((0L until 200L).map(i => (i, 1.0)) ++
      (200L until 400L).map(i => (i, 20.0))).toDF("id", "w")
    val got = graft.ops.Curation.weightedSample(rows, col("id"), col("w"), 100)
      .collect().map(_.getLong(0)).toSet
    assert(got.size == 100)
    val heavy = got.count(_ >= 200L)
    assert(heavy > 75, s"heavy keys sampled: $heavy of 100")
    // deterministic across partitionings
    val again = graft.ops.Curation.weightedSample(rows.repartition(7),
      col("id"), col("w"), 100).collect().map(_.getLong(0)).toSet
    assert(again == got)
    // zero/negative/null weights never sample
    val withBad = rows.unionByName(
      Seq((1000L, 0.0), (1001L, -3.0)).toDF("id", "w"))
    val gotBad = graft.ops.Curation.weightedSample(withBad, col("id"),
      col("w"), 400).collect().map(_.getLong(0)).toSet
    assert(!gotBad.contains(1000L) && !gotBad.contains(1001L))
    // constant weights: u^(1/w) is monotone in u, so selection = the
    // md5-order k-subset exactSample picks (order of u preserved)
    val const = rows.withColumn("w", lit(1.0))
    val ws = graft.ops.Curation.weightedSample(const, col("id"), col("w"), 50)
      .collect().map(_.getLong(0)).toSet
    val es = graft.ops.Curation.exactSample(const, col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    // exactSample keeps SMALLEST hex15; E-S keeps LARGEST u^(1/1)=u —
    // complementary order statistics of the same hash: disjoint by
    // construction at k+k <= n, both deterministic
    assert(ws.intersect(es).isEmpty && ws.size == 50 && es.size == 50)
  }

  test("weightedSamplePerStratum: k per stratum, stratum-local selection " +
      "equals the global sampler run on that stratum alone") {
    import spark.implicits._
    val rows = (0L until 100L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", (i % 7 + 1).toDouble))
      .toDF("id", "s", "w")
    val got = graft.ops.Curation.weightedSamplePerStratum(
        rows, col("id"), col("s"), col("w"), k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    assert(got.count(_._1 == "even") == 5 && got.count(_._1 == "odd") == 5)
    // stratum independence: the "even" picks equal the global sampler
    // restricted to even rows
    val evenOnly = graft.ops.Curation.weightedSample(
        rows.filter(col("s") === "even"), col("id"), col("w"), 5)
      .collect().map(_.getLong(0)).toSet
    assert(got.filter(_._1 == "even").map(_._3).toSet == evenOnly)
    // ranks are 1..k within each stratum
    assert(got.filter(_._1 == "odd").map(_._2).sorted.toSeq == (1L to 5L))
  }

  test("mixtureBudget: alloc/cap/shortfall arithmetic, unlisted source " +
      "weight 0, epoch ceiling binds") {
    import spark.implicits._
    val docs = Seq(
      ("web", 100L), ("web", 100L),          // 200 tokens
      ("code", 50L),                          // 50 tokens
      ("tiny", 10L),                          // 10 tokens, unlisted
      ("books", 1000L))                       // plenty
      .toDF("src", "toks")
    val got = graft.ops.Curation.mixtureBudget(docs, col("src"), col("toks"),
        Map("web" -> 0.5, "code" -> 0.3, "books" -> 0.2),
        budget = 1000L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6),
         r.getDouble(7), r.getLong(8))).toMap
    // web: alloc 500, cap 400 → granted 400, epochs 2.0, shortfall 100
    assert(got("web") == ((200L, 500L, 400L, 400L, 2.0, 100L)))
    // code: alloc floor(1000·0.3) = 300 (the double product rounds to
    // exactly 300.0), cap 100 → granted 100, epochs 2.0, shortfall 200
    assert(got("code") == ((50L, 300L, 100L, 100L, 2.0, 200L)))
    // books: alloc 200, cap 2000 → granted 200, epochs 0.2, no shortfall
    assert(got("books") == ((1000L, 200L, 2000L, 200L, 0.2, 0L)))
    // unlisted: weight 0, everything 0, still reported
    assert(got("tiny") == ((10L, 0L, 20L, 0L, 0.0, 0L)))
  }

  test("collocations: hand-computed PMI, minCount prunes hapax pairs") {
    import spark.implicits._
    // "new york" 4 times, "of the" 4 times but from frequent unigrams,
    // one hapax pair that minCount must drop
    val docs = Seq(
      "new york new york of the of the",
      "new york new york of the of the",
      "hapax pair of the the the of of").toDF("text")
    val got = graft.ops.TextAnalysis.collocations(docs, col("text"),
        minCount = 2L, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(!got.contains(("hapax", "pair")))
    assert(got.contains(("new", "york")) && got.contains(("of", "the")))
    // replay the formula for (new, york): c=4... counts from the corpus
    val allToks = docs.collect().flatMap(_.getString(0).split("\\s+"))
    val t = allToks.length.toDouble
    val pairsAll = docs.collect().flatMap(r =>
      r.getString(0).split("\\s+").sliding(2).map(a => (a(0), a(1))))
    val b = pairsAll.length.toDouble
    def pmi(x: String, y: String): Double = {
      val nab = pairsAll.count(_ == ((x, y))).toDouble
      val ca = allToks.count(_ == x).toDouble
      val cb = allToks.count(_ == y).toDouble
      BigDecimal(math.log((nab / b) / ((ca / t) * (cb / t))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(("new", "york"))._2 == pmi("new", "york"))
    assert(got(("of", "the"))._2 == pmi("of", "the"))
    // higher association ranks higher: "new york" beats "of the"
    assert(got(("new", "york"))._2 > got(("of", "the"))._2)
  }

  test("splitLeakage: planted cross-split twins surface, boilerplate " +
      "grams pruned, same-split twins invisible") {
    import spark.implicits._
    val boiler = "b1 b2 b3 b4 b5" // planted in > maxDf docs
    val leak = "u1 u2 u3 u4 u5"   // rare 5-gram shared by two docs
    val docs = ((0L until 12L).map(i => (i, s"$boiler filler$i x$i y$i z$i")) ++
      Seq((100L, s"$leak alpha beta gamma delta"),
          (101L, s"$leak epsilon zeta eta theta"),
          (102L, "nothing shared here at all five"))).toDF("id", "text")
    // force splits: 100 train, 101 test; every boilerplate doc train
    val split = when(col("id") === 101L, "test").otherwise(
      when(col("id") === 102L, "val").otherwise(lit("train")))
    val got = graft.ops.Curation.splitLeakage(docs, col("id"), col("text"),
        split, n = 5, minShared = 1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    // the planted leak pair, exactly once, with 1 shared gram
    assert(got == Set((100L, 101L, "test", 1L)))
    // raise maxDf so boilerplate stops being pruned: still no extra
    // pairs because all boilerplate docs share one split (train x train
    // is not leakage)
    val loose = graft.ops.Curation.splitLeakage(docs, col("id"), col("text"),
        split, n = 5, minShared = 1, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((100L, 101L)))
  }
}
