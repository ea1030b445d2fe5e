package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QualitySignals

/** Repetition + contamination signals against hand-computed values. */
class QualitySignalsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("repetition signals: hand-computed bigram/trigram fractions") {
    import spark.implicits._
    val docs = Seq(
      // "a b" ×3 of 5 bigrams → top2 = 3/5; trigrams "a b a"×2 "b a b"×2 of
      // 4 → dup3 = 4/4
      (1L, "a b a b a b"),
      // all bigrams distinct → top2 = 1/4; no repeated trigram → dup3 = 0
      (2L, "v w x y z")).toDF("id", "text")
    val got = QualitySignals.repetitionSignals(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == (0.6, 1.0))
    assert(got(2L) == (0.25, 0.0))
  }

  test("contamination: shared distinct n-grams vs a benchmark set") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "the quick brown fox jumps"), // shares "the quick brown", "quick brown fox"
      (11L, "totally unrelated words here"),
      (12L, "quick brown fox again and the quick brown fox")).toDF("id", "text")
    val bench = Seq((0L, "the quick brown fox")).toDF("id", "text")
    val got = QualitySignals.contamination(corpus, col("id"), col("text"),
        bench, col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 2L, 12L -> 2L)) // distinct shared, 11 clean
  }

  test("contaminationMulti: per-benchmark distinct-shared counts, one pass") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "the quick brown fox jumps"),       // dev: 2 shared; test: 0
      (11L, "totally unrelated words here"),    // clean → absent
      (12L, "over the lazy dog we go"),         // test: 2 ("over the lazy", "the lazy dog")
      (13L, "the quick brown fox over the lazy dog")).toDF("id", "text") // both
    val dev = Seq((0L, "the quick brown fox")).toDF("id", "text")
    val tst = Seq((1L, "jumps over the lazy dog")).toDF("id", "text")
    val got = QualitySignals.contaminationMulti(corpus, col("id"), col("text"),
        Seq(("dev", dev, col("text")), ("test", tst, col("text"))), n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      10L -> (2L, 0L),
      12L -> (0L, 2L),
      13L -> (2L, 2L)))
    // column order follows the benches argument
    val cols = QualitySignals.contaminationMulti(corpus, col("id"), col("text"),
      Seq(("dev", dev, col("text")), ("test", tst, col("text"))), n = 3).columns
    assert(cols.toSeq == Seq("id", "shared_dev", "shared_test"))
  }

  test("bigramLmScore: add-one bigram LM, hand-computed") {
    import spark.implicits._
    // uni: a=3 b=3 c=1, V=3; model: (a,b)=3, (b,a)=1
    // P(b|a) = (3+1)/(3+3) = 2/3; P(a|b) = (1+1)/(3+3) = 1/3
    val docs = Seq(
      (1L, "a b a b"), // bigrams ab, ba, ab → avg(2·ln 2/3 + ln 1/3)/3
      (2L, "a b"),     // ln 2/3
      (3L, "c")).toDF("id", "text") // 1 token → absent
    val got = QualitySignals.bigramLmScore(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == (3L,
      BigDecimal((2 * math.log(2.0 / 3) + math.log(1.0 / 3)) / 3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(2L) == (1L,
      BigDecimal(math.log(2.0 / 3))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("bloomContamination: no false negatives; saturation and exactness bounds") {
    import spark.implicits._
    val bench = Seq((0L, "the quick brown fox jumps over")).toDF("id", "text")
    val corpus = Seq(
      (10L, "intro words the quick brown fox tail"), // shares 2 grams
      (11L, "quick brown fox jumps trailing words"), // shares 2 grams
      (12L, "completely unrelated text body here")).toDF("id", "text")
    val exact = QualitySignals.contamination(corpus, col("id"), col("text"),
        bench, col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // big filter (FP rate ~0 at this scale): equals the exact op
    val big = QualitySignals.bloomContamination(corpus, col("id"), col("text"),
        bench, col("text"), m = 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(big == exact)
    // any filter size: every exactly-shared count is a lower bound
    val small = QualitySignals.bloomContamination(corpus, col("id"), col("text"),
        bench, col("text"), m = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (id, n) =>
      assert(small.getOrElse(id, 0L) >= n, s"false negative for doc $id") }
  }

  test("tfidfKeywords: smoothed tf-idf ranks, deterministic term ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry date")).toDF("id", "text")
    val got = graft.ops.TextAnalysis.tfidfKeywords(docs, col("id"), col("text"), k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    def idf(df: Int): Double = math.log(4.0 / (df + 1)) // N = 3 docs
    def r4(x: Double): Double = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: apple tf=2 df=1 -> 2*ln(2); banana tf=1 df=2 -> ln(4/3)
    assert(got.filter(_._1 == 1L).map(t => (t._3, t._4)).toSeq ==
      Seq(("apple", r4(2 * idf(1))), ("banana", r4(idf(2)))))
    // doc 2: banana and cherry both tf=1 df=2 — tie breaks on term asc
    assert(got.filter(_._1 == 2L).map(_._3).toSeq == Seq("banana", "cherry"))
    // doc 3: cherry (df=2) vs date (df=1): date scores higher
    assert(got.filter(_._1 == 3L).map(_._3).toSeq == Seq("date", "cherry"))
  }

  test("winnowing: shared >= w+k-1 token runs share a fingerprint; density bounded") {
    import spark.implicits._
    val shared = "one two three four five six seven eight nine ten" // 10 tokens
    val docs = Seq(
      (1L, "prefix words here " + shared + " suffix body"),
      (2L, shared + " totally different ending text"),
      (3L, "no overlap with anything else at all in this document")).toDF("id", "text")
    val fp = graft.ops.TextAnalysis.winnowFingerprintTable(
        docs, col("id"), col("text"), k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: a shared 10-token run (>= w+k-1 = 6) yields >= 1 shared hash
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // doc 3 shares no 3-gram with the others -> no shared fingerprints
    assert((byDoc(3L) & (byDoc(1L) ++ byDoc(2L))).isEmpty)
    // density: selection keeps well under all grams (expected ~2/(w+1))
    val grams1 = 15L - 2 // doc 1 tokens - (k-1)
    assert(byDoc(1L).size < grams1)
    // digest form agrees with the table
    val dig = graft.ops.TextAnalysis.winnowFingerprints(
        docs, col("id"), col("text"), k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fpByDocList = fp.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    fpByDocList.foreach { case (id, hs) =>
      assert(dig(id)._1 == hs.length.toLong, s"n_fp doc $id")
      assert(dig(id)._2 == hs.map(_ % 1000000007L).sum % 1000000007L,
        s"fp_mod doc $id")
    }
  }

  test("quantileBins: exact deciles on 1..100, monotone and window-free") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val out = graft.ops.Curation.quantileBins(df, col("id"), col("x"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byBin = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBin.keySet == (1L to 10L).toSet)
    byBin.values.foreach(v => assert(v.length == 10))
    (1L to 9L).foreach(b => assert(byBin(b).max < byBin(b + 1).min))
    // plan shape: no window/global sort — one aggregate + broadcast join
    val plan = graft.ops.Curation.quantileBins(df, col("id"), col("x"), 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ntile-style window crept in")
  }

  test("exactSample: exact size, deterministic, partition-invariant") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"row$i")).toDF("id", "payload")
    val a = graft.ops.Curation.exactSample(df, col("id"), 37)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.Curation.exactSample(df.repartition(13), col("id"), 37)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.size == 37 && a == b)
    // plan is a TakeOrdered, not a global sort
    val plan = graft.ops.Curation.exactSample(df, col("id"), 37)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("vocabCoverage: hand-computed curve, count-then-token tie order") {
    import spark.implicits._
    // counts: a=4, b=3, c=2, d=1 (total 10); ranks a,b,c,d
    val docs = Seq("a a b c", "a b d", "a b c").map(Tuple1(_)).toDF("text")
    val got = graft.ops.Curation.vocabCoverage(docs, col("text"), Seq(1, 2, 10))
      .orderBy("vocab_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 4L, 10L, 0.4),   // top-1 = a
      (2L, 2L, 7L, 10L, 0.7),   // a+b
      (10L, 4L, 10L, 10L, 1.0))) // whole vocab
  }

  test("driftPsi: zero for identical batches, large under a vocabulary swap") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon"))
      .toDF("id", "text")
    // bucket count sized to the fixture: with buckets >> tokens the
    // add-one smoothing flattens every share toward 1/buckets and PSI
    // (correctly) reads tiny batches as no evidence of drift
    val same = QualitySignals.driftPsi(a, col("text"), a, col("text"),
      buckets = 8).head()
    assert(same.getLong(0) == 7L && same.getLong(1) == 7L)
    assert(same.getDouble(2) == 0.0) // p == q exactly, every term vanishes
    // disjoint vocabulary: every occupied bucket shifts -> well past the
    // 0.25 "investigate" line
    val b = Seq((3L, "zeta eta theta iota"), (4L, "zeta eta kappa"))
      .toDF("id", "text")
    val far = QualitySignals.driftPsi(a, col("text"), b, col("text"),
      buckets = 8).head()
    assert(far.getDouble(2) > 0.25, s"psi = ${far.getDouble(2)}")
    // symmetric in this construction's smoothing: swapping batches flips
    // the sign of each (p - q) AND its log, so psi is equal
    val rev = QualitySignals.driftPsi(b, col("text"), a, col("text"),
      buckets = 8).head()
    assert(math.abs(far.getDouble(2) - rev.getDouble(2)) < 1e-9)
  }

  test("kneserNeyScore: hand-computed discount/continuation formula") {
    import spark.implicits._
    // bigrams: (a,b)x2, (b,a), (b,c); types=3; ctx(a)=2 n1p(a)=1,
    // ctx(b)=2 n1p(b)=2; pcont = 1/3 each
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("id", "text")
    val got = QualitySignals.kneserNeyScore(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // p(b|a) = 1.25/2 + .75*1/2/3 = 0.75 ; p(a|b) = p(c|b) = 0.375
    val lp1 = (2 * math.log(0.75) + math.log(0.375)) / 3
    assert(got(1L) == ((3L, math.rint(lp1 * 1e4) / 1e4)))
    assert(got(2L) == ((1L, math.rint(math.log(0.375) * 1e4) / 1e4)))
  }

  test("langIdWithConfidence: margin semantics; calibration buckets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat and the dog of note"), // en=4 hits, others 0 -> margin 1
      (2L, "en", "the la"),                      // en=1, es=1, fr=1 tie -> margin 0
      (3L, "de", "xyzzy plugh"),                 // no hits -> und, margin 0
      (4L, "es", "el que y the"))                // es=3, en=1 -> margin 2/3
      .toDF("doc_id", "lang", "text")
    val c = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.langIdWithConfidence(col("text")).as("c"))
      .select(col("doc_id"), col("c.pred"), col("c.margin"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(c(1L) == ("en", 1.0))
    assert(c(2L)._2 == 0.0) // top-2 tie: zero confidence whatever wins
    assert(c(3L) == ("und", 0.0))
    assert(c(4L) == ("es", 0.6667))
    val cal = graft.ops.TextAnalysis.langIdCalibration(
        docs, col("text"), col("lang"), buckets = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // margins 1.0 and 2/3 share the top-closed bucket; both agree
    assert(cal.toSeq == Seq((0L, 2L, 1L, 0.5), (2L, 1L, 1L, 1.0), (3L, 1L, 1L, 1.0)))
  }

  test("boilerplate fraction: distinct-bigram df share, hand-computed") {
    import spark.implicits._
    // "c o m m o n" appears in all 3 docs: its 5 bigrams have df = 3;
    // each doc adds 2 unique tokens → 2 unique-bigram tails with df = 1
    // ("n u1" bridges common→unique; "u1 u2" is fully unique)
    val docs = Seq(
      (1L, "c o m m o n a1 a2"),
      (2L, "c o m m o n b1 b2"),
      (3L, "c o m m o n c1 c2"),
      (4L, "x")).toDF("id", "text") // 1 token: no bigram, absent from output
    val got = QualitySignals.boilerplateFraction(docs, col("id"), col("text"),
        n = 2, minDf = 3L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // per doc: 7 distinct bigrams — "c o","o m","m m","m o","o n" (df 3)
    // + "n x1","x1 x2" (df 1) → boiler_frac = 5/7
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == (7L, 0.7143))
    assert(got(2L) == (7L, 0.7143))
  }

  test("piiSignals/redactPii: counts, table-order masking, idempotence") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org, call 555-123-4567 or +4915112345678"),
      (2L, "server 192.168.0.1 ssn 123-45-6789"),
      // id-shaped digits INSIDE an email local part: email wins (table order)
      (3L, "reach 123-45-6789@ex.com today"),
      (4L, "clean text, no pii at all"),
      (5L, "(212) 555-0199 and 10.0.0.7")).toDF("id", "text")
    val sig = docs.select(col("id"), TextAnalysis.piiSignals(col("text")).as("p"))
      .select(col("id"), col("p.n_email"), col("p.n_ipv4"), col("p.n_id"), col("p.n_phone"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(sig(1L) == (2L, 0L, 0L, 2L))
    assert(sig(2L) == (0L, 1L, 1L, 0L))
    // n_id counts independently on raw text (audit semantics): the digit
    // run inside the address still counts as an id SIGNAL
    assert(sig(3L) == (1L, 0L, 1L, 0L))
    assert(sig(4L) == (0L, 0L, 0L, 0L))
    assert(sig(5L) == (0L, 1L, 0L, 1L))
    val red = docs.select(col("id"), TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "mail <EMAIL> and <EMAIL>, call <PHONE> or <PHONE>")
    assert(red(2L) == "server <IP> ssn <ID>")
    // redaction applies email FIRST: one <EMAIL>, no <ID> leftover
    assert(red(3L) == "reach <EMAIL> today")
    assert(red(4L) == "clean text, no pii at all")
    assert(red(5L) == "<PHONE> and <IP>")
    // idempotent: a second pass changes nothing
    val twice = docs.select(col("id"),
        (TextAnalysis.redactPii(TextAnalysis.redactPii(col("text"))) ===
          TextAnalysis.redactPii(col("text"))).as("same"))
      .collect().forall(_.getBoolean(1))
    assert(twice)
  }

  test("driftKl: zero for identical batches, asymmetric, swap-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x y z x y"), (2L, "x z z")).toDF("id", "text")
    val b = Seq((1L, "p q r p q"), (2L, "p r r")).toDF("id", "text")
    def kl(r: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      QualitySignals.driftKl(r, col("text"), c, col("text")).head()
    // identical corpora: every bucket's p == q, fold is exactly 0
    val same = kl(a, a)
    assert(same.getDouble(2) == 0.0 && same.getLong(0) == 8L)
    // disjoint vocabularies: large positive divergence both ways, and the
    // two directions need not agree (KL is asymmetric by construction)
    val ab = kl(a, b).getDouble(2)
    val ba = kl(b, a).getDouble(2)
    assert(ab > 0.01 && ba > 0.01)
  }

  test("ngramNovelty: hand-computed absent-gram fractions") {
    import spark.implicits._
    val ref = Seq((0L, "a b c d")).toDF("id", "text") // grams: "a b c","b c d"
    val cand = Seq(
      (10L, "a b c d"),     // both grams known → novelty 0
      (11L, "a b c x"),     // "a b c" known, "b c x" novel → 0.5
      (12L, "p q r s"),     // all novel → 1.0
      (13L, "a b")          // < n tokens → absent
    ).toDF("id", "text")
    val got = QualitySignals.ngramNovelty(cand, col("id"), col("text"),
        ref, col("text"), n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(10L -> ((2L, 0L, 0.0)), 11L -> ((2L, 1L, 0.5)),
      12L -> ((2L, 2L, 1.0))))
  }

  test("editDistanceJoin: equals brute force; deletes, inserts, substitutions") {
    import spark.implicits._
    val strs = Seq(
      (1L, "spark"), (2L, "spark"),  // dist 0
      (3L, "spark1"),                // insert  → 1 from spark
      (4L, "spak"),                  // delete  → 1 from spark
      (5L, "sparc"),                 // subst   → 1 from spark
      (6L, "stream"),                // far from everything
      (7L, "sparkly"))               // dist 2 from spark — excluded at d=1
      .toDF("id", "s")
    val got = graft.ops.Dedup.editDistanceJoin(strs, col("id"), col("s"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val rows = strs.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ai, sa) <- rows; (bi, sb) <- rows if ai < bi
      d = graft.ops.Dedup.levDistance(sa, sb) if d <= 1
    } yield (ai, bi, d.toLong)).sorted
    assert(got.toSeq == brute.toSeq && brute.nonEmpty)
    // the DP is the standard unit-cost metric
    assert(graft.ops.Dedup.levDistance("kitten", "sitting") == 3)
    assert(graft.ops.Dedup.levDistance("", "abc") == 3)
  }

  test("jaroWinkler kernel: textbook values, boost threshold, " +
      "empty convention") {
    def jw = graft.ops.Dedup.jaroWinkler _
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-9)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0) // DuckDB convention
    assert(jw("abc", "xyz") == 0.0)                 // no matches
    // below the 0.7 boost threshold the shared prefix must NOT boost:
    // jaro("aaaaaaaaaaaaaaaaaaab", "aab...") style pairs stay raw
    val raw = jw("abcdefghijklmnopqrst", "abzzzzzzzzzzzzzzzzzz")
    assert(raw < 0.7 + 1e-12) // jaro ≤ 0.7 → no Winkler term applied
  }

  test("jaroWinklerJoin: equals brute force within blocks; maxBucket " +
      "drops hot blocks only") {
    import spark.implicits._
    val strs = Seq(
      (1L, "martha stone"), (2L, "marhta stone"),  // transposed twin
      (3L, "martin stone"),                        // near
      (4L, "zeke wilder"),                         // other block
      (5L, "zeke wilde"))                          // near within z-block
      .toDF("id", "s")
    val blk = substring(col("s"), 1, 1)
    val got = graft.ops.Dedup.jaroWinklerJoin(strs, col("id"), col("s"),
        blk, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    val rows = strs.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ai, sa) <- rows; (bi, sb) <- rows
      if ai < bi && sa.charAt(0) == sb.charAt(0)
      sim = graft.ops.Dedup.jaroWinkler(sa, sb) if sim >= 0.9
    } yield (ai, bi, sim)).sortBy(p => (p._1, p._2))
    assert(got.toSeq == brute.toSeq && brute.size >= 2)
    // cap of 2 drops the 3-row m-block, keeps the 2-row z-block
    val capped = graft.ops.Dedup.jaroWinklerJoin(strs, col("id"), col("s"),
        blk, minSim = 0.9, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((4L, 5L)))
  }

  test("editDistanceJoin: maxBucket bounds candidate fan-out on " +
      "adversarial shared-prefix corpora; cold pairs survive the cap") {
    import spark.implicits._
    // adversarial corpus: 60 strings "hotXY" sharing the 3-char prefix —
    // every single-deletion variant bucket of the shared positions is hot
    // — plus two cold distance-1 twins far from the hot cluster
    val hotRows = (0 until 60).map(i => (i.toLong, f"hot${i}%02d"))
    val cold = Seq((100L, "zebra"), (101L, "zebr"))
    val df = (hotRows ++ cold).toDF("id", "s")
    val capped = graft.ops.Dedup.editDistanceJoin(df, col("id"), col("s"),
      maxDist = 1, maxBucket = 8)
    // candidate bound: with every bucket ≤ 8 rows, candidate pairs per
    // bucket ≤ 8·7/2 = 28; ≤ 6 variants/row · 62 rows = 372 buckets →
    // the capped run can never see the ~1.7k-pair hot blow-up. Verified
    // pairs are a subset of brute force (the verify never invents pairs)
    val got = capped.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ai, sa) <- rows; (bi, sb) <- rows if ai < bi
      d = graft.ops.Dedup.levDistance(sa, sb) if d <= 1
    } yield (ai, bi, d.toLong)).toSet
    assert(got.subsetOf(brute))
    // the cold twin pair shares only cold buckets → must survive
    assert(got.contains((100L, 101L, 1L)))
    // the hot cluster's pairs ("hot00"~"hot01" etc. at dist 1 share only
    // hot variant buckets) are the recall trade the scaladoc documents
    assert(got.size < brute.size)
    // uncapped run still equals brute force on the same corpus
    val uncapped = graft.ops.Dedup.editDistanceJoin(df, col("id"), col("s"),
        maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(uncapped == brute)
  }

  test("clusterTopics: distinctive terms rank above shared ones; " +
      "k bounds each cluster's list") {
    import spark.implicits._
    val docs = Seq(
      (1L, "koala koala eucalyptus common"),
      (2L, "koala gumtree common"),
      (3L, "piano sonata common"),
      (4L, "piano violin common common")).toDF("id", "text")
    val assign = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("id", "cluster")
    val got = graft.ops.TextAnalysis.clusterTopics(docs, col("id"),
        col("text"), assign, k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(got.count(_._1 == 0) == 2 && got.count(_._1 == 1) == 2)
    // "common" occurs in both clusters (df=2) → idf ln(3/3)=0 → never top
    assert(!got.exists(_._3 == "common"))
    // each cluster's rank-1 term is its highest-tf distinctive term
    assert(got.find(t => t._1 == 0 && t._2 == 1).get._3 == "koala")
    assert(got.find(t => t._1 == 1 && t._2 == 1).get._3 == "piano")
  }

  test("simHashDupAgainst: matches the self-join on the union; " +
      "self-matches at hamming 0; empty docs excluded") {
    import spark.implicits._
    val frozen = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "   ")).toDF("id", "text") // token-less → no signature
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // exact twin of 1
      (11L, "alpha beta gamma delta epsilon eta"),  // near twin
      (12L, "totally disjoint vocabulary entirely here")).toDF("id", "text")
    val table = graft.ops.Dedup.simHashTable(frozen, col("id"), col("text"))
    assert(!table.collect().map(_.getLong(0)).contains(3L))
    val got = graft.ops.Dedup.simHashDupAgainst(batch, col("id"),
        col("text"), table, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((10L, 1L, 0L)))
    // parity with the one-shot self-join restricted to cross-side pairs
    val selfJoin = graft.ops.Dedup.simHashDuplicates(
        frozen.unionByName(batch), col("id"), col("text"), maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => a < 10 && b >= 10 }
      .map { case (a, b, h) => (b, a, h) }.toSet
    assert(got == selfJoin)
  }

  test("langConfusion: rows sum to 1 per declared language and counts " +
      "match a direct classify") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the cat and the dog"), ("en", "is that with"),
      ("de", "der hund und die katze"), ("de", "the borrowed words"),
      ("zh", "wholly unmarked tokens")).toDF("lang", "text")
    val got = graft.ops.TextAnalysis.langConfusion(docs, col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("en", "en")) == ((2L, 1.0)))
    assert(got(("de", "de")) == ((1L, 0.5)) && got(("de", "en")) == ((1L, 0.5)))
    assert(got(("zh", "und")) == ((1L, 1.0)))
    // per-declared shares sum to 1 (4dp)
    got.keys.map(_._1).toSet.foreach { (d: String) =>
      val s = got.collect { case ((dd, _), (_, f)) if dd == d => f }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"shares for $d sum to $s")
    }
  }

  test("bigramLmScoreAgainst: scoring a corpus under its own table " +
      "reproduces bigramLmScore; unseen text smooths to the floor") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("id", "text")
    val table = QualitySignals.bigramLmTable(docs, col("text"))
    val self = QualitySignals.bigramLmScore(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val against = QualitySignals.bigramLmScoreAgainst(docs, col("id"),
        col("text"), table)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(against == self)
    // fully-unseen bigrams: cb=0, cu=0 → every term ln(1/V), V=3
    val alien = QualitySignals.bigramLmScoreAgainst(
        Seq((9L, "x y z")).toDF("id", "text"), col("id"), col("text"), table)
      .head()
    assert(alien.getLong(1) == 2L)
    assert(alien.getDouble(2) ==
      BigDecimal(math.log(1.0 / 3))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the gate keeps good text, drops gibberish below the threshold
    val gate = graft.ops.LmScoreGate(minAvgLp = math.log(1.0 / 3) + 0.01)
    val kept = gate.gate(
        Seq((1L, "a b a b"), (9L, "x y z")).toDF("id", "text"),
        col("id"), col("text"), table)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("driftKs: hand-computed supremum and location; identical " +
      "distributions give 0; disjoint give 1") {
    import spark.implicits._
    // ref = {1,1,2,3}, cand = {2,3,3,4}:
    // x=1: F_r=2/4, F_c=0    → d=.50  ← sup, smallest x
    // x=2: F_r=3/4, F_c=1/4  → d=.50
    // x=3: F_r=4/4, F_c=3/4  → d=.25 ; x=4: 0
    val ref = Seq(1, 1, 2, 3).toDF("m")
    val cand = Seq(2, 3, 3, 4).toDF("m")
    val r = QualitySignals.driftKs(ref, col("m"), cand, col("m")).head()
    assert((r.getLong(0), r.getLong(1)) == ((4L, 4L)))
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 1.0)
    val same = QualitySignals.driftKs(ref, col("m"), ref, col("m")).head()
    assert(same.getDouble(2) == 0.0)
    val disj = QualitySignals.driftKs(
      Seq(1, 2).toDF("m"), col("m"), Seq(9, 10).toDF("m"), col("m")).head()
    assert(disj.getDouble(2) == 1.0 && disj.getDouble(3) == 2.0)
  }

  test("encodingArtifacts: counts each artifact class; clean text clean") {
    import spark.implicits._
    val docs = Seq(
      (1L, "perfectly ordinary text"),
      (2L, "bad caf\uFFFD and caf\u00C3\u00A9 here"),
      (3L, "don\u00E2\u0080\u0099t panic"),
      (4L, "bell\u0007 and null \u0000 bytes"),
      (5L, "tabs\tand\nnewlines are fine"))
      .toDF("id", "text")
    val got = QualitySignals.encodingArtifacts(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L) == ((0L, 0L, 0L, true)))
    assert(got(2L) == ((1L, 1L, 0L, false))) // one U+FFFD, one Ã© pair
    assert(got(3L) == ((0L, 1L, 0L, false))) // one â-triple
    assert(got(4L) == ((0L, 0L, 2L, false))) // BEL + NUL
    assert(got(5L) == ((0L, 0L, 0L, true)))  // tab/LF excluded
  }

  test("distinctN: hand-computed diversity; empty-token docs contribute " +
      "nothing") {
    import spark.implicits._
    val docs = Seq("a b a b", "a b", "").toDF("text")
    // 1-grams: a,b,a,b,a,b → 6 total, 2 distinct
    // 2-grams: (a b),(b a),(a b) + (a b) → 4 total, 2 distinct
    val got = graft.ops.TextAnalysis.distinctN(docs, col("text"), Seq(1, 2))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((6L, 2L, 0.3333)))
    assert(got(2L) == ((4L, 2L, 0.5)))
  }

  test("zipfSlope: exact power law recovers its exponent") {
    import spark.implicits._
    // counts c(r) = 2^(8-r) for ranks 1..8 → ln c = ln(2^8) - r·ln 2, but
    // the regression is on ln r, so build c(r) = round(1000·r^-1) instead:
    // exact power law → slope == -1 within the 4dp round
    val rows = (1 to 50).flatMap { r =>
      val c = math.round(100000.0 * math.pow(r, -1.0)).toInt
      Seq.fill(c)(s"w$r")
    }
    val df = rows.grouped(1000).map(g => g.mkString(" ")).toSeq.toDF("text")
    val got = graft.ops.TextAnalysis.zipfSlope(df, col("text"), topN = 50).head()
    assert(got.getLong(0) == 50L)
    assert(math.abs(got.getDouble(1) + 1.0) < 0.001)
  }

  test("substringCounts: AC counts = split-count semantics, overlaps greedy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ababa and more data in the database"),
      (2L, "no needles here at all"),
      (3L, "data data data")).toDF("id", "text")
    val got = graft.ops.TextAnalysis.substringCounts(docs, col("id"),
        col("text"), Seq("aba", "data", "at", "zzz"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // "ababa" holds ONE non-overlapping "aba" (greedy left, like split())
    // and "database" a second — 2 total, not the 3 overlapping matches
    assert(got((1L, "aba")) == 2L)
    // "data" appears in "data" and "database"; "at" nests inside both
    assert(got((1L, "data")) == 2L)
    assert(got((1L, "at")) == 2L)
    assert(got((3L, "data")) == 3L)
    // the absent needle produces no rows anywhere
    assert(!got.keySet.exists(_._2 == "zzz"))
    // doc 2's only hit is "at" (in "at all") — zero-count rows are absent
    assert(got.keySet.filter(_._1 == 2L) == Set((2L, "at")))
    assert(got((2L, "at")) == 1L)
  }

  test("lmWorstWindow: localizes an injected gibberish span; full-doc window = bigramLmScore") {
    import spark.implicits._
    val predictable = Array.fill(30)("a b").mkString(" ") // 60 tokens of a-b chain
    val injected = predictable.split(" ").take(30).mkString(" ") +
      " zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 " +
      predictable.split(" ").take(30).mkString(" ")
    val docs = Seq((1L, predictable), (2L, injected)).toDF("id", "text")
    val got = graft.ops.QualitySignals.lmWorstWindow(docs, col("id"),
        col("text"), window = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // the injected doc's worst window starts inside/around the rare span
    // (gibberish bigrams begin at index 29)
    val (_, worstStart, worstLp) = got(2L)
    assert(worstStart >= 22L && worstStart <= 38L)
    assert(worstLp < got(1L)._3) // strictly worse than the clean doc's worst
    // window = the doc's full bigram count → the one window IS the doc
    // mean: must equal bigramLmScore on the same (single-doc) model
    val one = docs.filter(col("id") === 1L)
    val whole = graft.ops.QualitySignals.lmWorstWindow(one, col("id"),
        col("text"), window = 59)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
    val lm = graft.ops.QualitySignals.bigramLmScore(one, col("id"), col("text"))
      .collect().map(r => r.getDouble(2)).head
    assert(whole == ((1L, 0L, lm)))
  }

  test("lmWorstWindow: join path (broadcastModel=false) matches the " +
      "broadcast path row for row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat ran off the mat again"),
      (2L, "zq xv qj zq xv qj wk wk wk zq the cat sat on the mat here"),
      (3L, "too short"), // 1 bigram < window -> absent from both
      (4L, "the the the the the the the the the the the the"))
      .toDF("id", "text")
    def rows(bm: Boolean) = graft.ops.QualitySignals.lmWorstWindow(
        docs, col("id"), col("text"), window = 4, broadcastModel = bm)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val broadcastPath = rows(true)
    val joinPath = rows(false)
    assert(broadcastPath == joinPath)
    assert(broadcastPath.map(_._1) == Seq(1L, 2L, 4L)) // doc 3 absent
  }

  test("dedupCorpusKeepBest: NaN and null scores lose to any real score") {
    import spark.implicits._
    val docs = Seq[(Long, String, java.lang.Double)](
      (1L, "alpha beta gamma delta epsilon", Double.NaN),
      (2L, "alpha beta gamma delta epsilon zeta", 1.0),
      (3L, "alpha beta gamma delta epsilon zeta eta", null))
      .toDF("id", "text", "score")
    // NaN sorts above every double in Spark orderings: unguarded, doc 1
    // would win the cluster and the only cleanly-scored copy would drop
    val kept = graft.ops.Dedup.dedupCorpusKeepBest(docs, col("id"),
        col("text"), col("score"), threshold = 0.3, shingleSize = 1)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L))
    // all-unusable cluster: the id tie-break decides (smallest id)
    val unscored = Seq(
      (5L, "omega psi chi phi upsilon", Double.NaN),
      (6L, "omega psi chi phi upsilon tau", Double.NaN))
      .toDF("id", "text", "score")
    val kept2 = graft.ops.Dedup.dedupCorpusKeepBest(unscored, col("id"),
        col("text"), col("score"), threshold = 0.3, shingleSize = 1)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept2.toSeq == Seq(5L))
  }

  test("winnowOverlapAgainst: oversized frozen index fails with a sized, " +
      "actionable error instead of a driver OOM") {
    import spark.implicits._
    val frozen = Seq((1L, "the quick brown fox jumps over the lazy dog " +
      "while the quick brown cat naps")).toDF("id", "text")
    val fp = graft.ops.TextAnalysis.winnowFingerprintTable(
      frozen, col("id"), col("text"))
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog " +
      "too")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.winnowOverlapAgainst(batch, col("id"),
        col("text"), fp, maxIndexEntries = 1L).collect()
    }
    assert(e.getMessage.contains("maxIndexEntries") &&
      e.getMessage.contains("equi-join"))
    // generous cap: same call succeeds
    val ok = graft.ops.TextAnalysis.winnowOverlapAgainst(batch, col("id"),
      col("text"), fp, minShared = 1).collect()
    assert(ok.nonEmpty)
  }

  test("dedupCorpusKeepBest: longest survives its cluster, singletons kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),            // cluster A, short
      (2L, "alpha beta gamma delta epsilon zeta eta"),   // cluster A, longest
      (3L, "alpha beta gamma delta epsilon zeta"),       // cluster A, middle
      (9L, "totally unrelated isolated document text"))  // singleton
      .toDF("id", "text")
      .withColumn("len", length(col("text")))
    val kept = graft.ops.Dedup.dedupCorpusKeepBest(docs, col("id"),
        col("text"), col("len"), threshold = 0.5, shingleSize = 1)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(2L, 9L))
    // min-id rule would have kept doc 1 instead
    val minRule = graft.ops.Dedup.dedupCorpus(docs, col("id"), col("text"),
        threshold = 0.5, shingleSize = 1)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(minRule.toSeq == Seq(1L, 9L))
  }

  test("rendezvousShard: adding a shard moves keys only TO the new shard") {
    import spark.implicits._
    val keys = (1L to 500L).toDF("id")
    val s = keys.select(col("id"),
      graft.ops.Curation.rendezvousShard(col("id"), 8).as("s8"),
      graft.ops.Curation.rendezvousShard(col("id"), 9).as("s9"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    // every moved key lands on the NEW shard (8); nothing reshuffles
    // among the old shards — the rendezvous property mod-n lacks
    assert(s.forall { case (a, b) => a == b || b == 8 })
    val movedFrac = s.count { case (a, b) => a != b }.toDouble / s.length
    assert(movedFrac > 0.03 && movedFrac < 0.25) // ~1/9 expected
    // all shards used
    assert(s.map(_._1).distinct.sorted.toSeq == (0 until 8))
  }

  test("madOutliers: hand-computed modified z; MAD=0 degenerates to no flags") {
    import spark.implicits._
    // x = 1..9 plus a 100 spike: median 5.5, MAD = 2.5 over the evens...
    // compute expectations directly against the definition
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
    val got = graft.ops.Curation.madOutliers(df, col("id"), col("x"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val sorted = xs.sorted
    val med = (sorted(4) + sorted(5)) / 2  // 5.5
    val devs = xs.map(x => math.abs(x - med)).sorted
    val mad = (devs(4) + devs(5)) / 2
    val z100 = BigDecimal(0.6745 * (100.0 - med) / mad)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(9L) == ((z100, true)))   // the spike is flagged
    assert(!got(0L)._2 && !got(4L)._2)  // the bulk is not
    // constant metric: MAD 0 -> z 0 everywhere, nothing flagged
    val const = Seq((1L, 7.0), (2L, 7.0), (3L, 7.0)).toDF("id", "x")
    val g2 = graft.ops.Curation.madOutliers(const, col("id"), col("x"))
      .collect().map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(g2.forall(_ == ((0.0, false))))
  }

  test("maskDuplicateSpans: sentinel per covered token, strip-parity counts") {
    import spark.implicits._
    val boiler = "one two three four five six"
    val docs = Seq(
      (1L, boiler + " unique tail here"),
      (2L, "prefix words " + boiler),
      (3L, "no shared runs in this document at all")).toDF("id", "text")
    val masked = graft.ops.Dedup.maskDuplicateSpans(docs, col("id"),
        col("text"), k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val stripped = graft.ops.Dedup.stripDuplicateSpans(docs, col("id"),
        col("text"), k = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // masked count == stripped count per doc; token count preserved
    assert(masked.forall { case (id, (n, m, _)) => stripped(id) == m })
    assert(masked(1L)._1 == 9L && masked(1L)._2 == 6L)
    assert(masked(1L)._3 == "<DUP> <DUP> <DUP> <DUP> <DUP> <DUP> unique tail here")
    assert(masked(3L)._2 == 0L && masked(3L)._3.startsWith("no shared"))
  }

  test("contrastiveTriplets: positives in-cluster, negatives never in-cluster") {
    import spark.implicits._
    val near = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, near), (2L, near + " eta"),                     // cluster {1,2}
      (3L, "one two three four five six"),
      (4L, "one two three four five six seven"),           // cluster {3,4}
      (9L, "completely unrelated singleton text here"))
      .toDF("id", "text")
    // embeddings: cluster-mates close, 9 closest to everyone (the bait)
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(0.1f, 0.9f)),
      (9L, Array(0.7f, 0.7f))).toDF("id", "v")
    val edges = graft.ops.Ann.knnGraph(emb, col("id"), col("v"), 3)
    val got = graft.ops.Curation.contrastiveTriplets(docs, col("id"),
        col("text"), edges, threshold = 0.5, shingleSize = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every clustered doc anchors a triplet; positive is its cluster-mate
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L)._1 == 2L && got(2L)._1 == 1L)
    assert(got(3L)._1 == 4L && got(4L)._1 == 3L)
    // negatives are never the anchor's cluster-mate
    assert(got.forall { case (a, (p, n)) => n != p && n != a })
    // doc 9 (nearest non-dup bait) is a legal negative for all
    assert(got.values.map(_._2).toSet.subsetOf(Set(1L, 2L, 3L, 4L, 9L)))
  }

  test("ngramNoveltyAgainst: equals the two-corpus form; self-audit is zero novelty") {
    import spark.implicits._
    val ref = Seq((0L, "a b c d e")).toDF("id", "text")
    val cand = Seq((1L, "a b c d e"), (2L, "x y z w v")).toDF("id", "text")
    val table = QualitySignals.ngramHashTable(ref, col("text"), n = 3)
    val viaTable = QualitySignals.ngramNoveltyAgainst(cand, col("id"),
      col("text"), table, n = 3).collect().map(_.toSeq).toSet
    val direct = QualitySignals.ngramNovelty(cand, col("id"), col("text"),
      ref, col("text"), n = 3).collect().map(_.toSeq).toSet
    assert(viaTable == direct)
    val self = QualitySignals.ngramNoveltyAgainst(ref, col("id"),
      col("text"), table, n = 3).collect()
    assert(self.length == 1 && self.head.getDouble(3) == 0.0)
  }

  test("piiMatches: match strings with in-document order per class") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.co then c@d.org and ip 10.0.0.1"),
      (2L, "clean")).toDF("id", "text")
    val got = graft.ops.TextAnalysis.piiMatches(docs, col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)) -> r.getString(3)).toMap
    assert(got((1L, "email", 1L)) == "a@b.co")
    assert(got((1L, "email", 2L)) == "c@d.org")
    assert(got((1L, "ipv4", 1L)) == "10.0.0.1")
    assert(!got.keySet.exists(_._1 == 2L))
  }

  test("minhashCalibration: identical pairs err 0 in top bucket, disjoint in bucket 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // identical to 1: exact = 1, est = 1
      (3L, "one two three four"))       // disjoint from both: exact = 0
      .toDF("id", "text")
    val got = graft.ops.Dedup.minhashCalibration(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // identical pair: exact 1.0 -> bucket 9, zero estimate error
    assert(got(9L) == ((1L, 0.0, 0.0)))
    // two disjoint pairs: exact 0.0 -> bucket 0; signatures of disjoint
    // token sets can still collide per-position, so only bound the error
    assert(got(0L)._1 == 2L && got(0L)._3 <= 0.2)
  }

  test("leakageSafeSplit: near-dup clusters share one split bucket") {
    import spark.implicits._
    val near = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, near), (2L, near + " eta"), (3L, near),      // one cluster
      (50L, "totally different words entirely here"),   // singleton
      (60L, "another unrelated standalone document"))   // singleton
      .toDF("id", "text")
    val got = graft.ops.Curation.leakageSafeSplit(docs, col("id"),
        col("text"), threshold = 0.5, shingleSize = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the cluster's members carry the representative's id AND split
    assert(got(1L) == got(2L) && got(2L) == got(3L) && got(1L)._1 == 1L)
    // singletons represent themselves
    assert(got(50L)._1 == 50L && got(60L)._1 == 60L)
    // every split value is legal
    assert(got.values.map(_._2).forall(Set("train", "val", "test")))
  }

  test("curriculumOrder: bins ascend in ord; permutation; epochs reshuffle within bins") {
    import spark.implicits._
    val df = (1L to 120L).map(i => (i, i.toDouble)).toDF("id", "s")
    def run(e: Int) = graft.ops.Curation.curriculumOrder(df, col("id"),
        col("s"), nBins = 4, epoch = e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e0 = run(0)
    // global positions are a permutation and strictly bin-ordered
    assert(e0.map(_._3).sorted.toSeq == (1L to 120L))
    val byOrd = e0.sortBy(_._3).map(_._2)
    assert(byOrd.toSeq == byOrd.sorted.toSeq)
    // every bin holds a quarter (scores 1..120 are distinct)
    assert(e0.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map(1L -> 30, 2L -> 30, 3L -> 30, 4L -> 30))
    // a different epoch keeps bins but reshuffles inside them
    val e1 = run(1)
    assert(e1.map(t => t._1 -> t._2).toMap == e0.map(t => t._1 -> t._2).toMap)
    assert(e1.map(t => t._1 -> t._3).toMap != e0.map(t => t._1 -> t._3).toMap)
  }

  test("epochShuffle: permutation, determinism, epochs differ, partition-invariant") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    val e1 = graft.ops.Curation.epochShuffle(df, col("id"), epoch = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation: every position 1..n exactly once
    assert(e1.values.toSeq.sorted == (1L to 200L))
    // deterministic across partitionings
    val e1b = graft.ops.Curation.epochShuffle(df.repartition(7), col("id"),
      epoch = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 == e1b)
    // different epochs give different orders
    val e2 = graft.ops.Curation.epochShuffle(df, col("id"), epoch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 != e2)
  }

  test("tokenBudgetTruncate: head/tail/both semantics, within-budget passthrough") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b c")).toDF("id", "text")
    def run(st: String) = graft.ops.Curation.tokenBudgetTruncate(docs,
        col("id"), col("text"), budget = 5, strategy = st)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val h = run("head")
    assert(h(1L) == ("t1 t2 t3 t4 t5", 10L, 5L, true))
    assert(h(2L) == ("a b c", 3L, 3L, false))
    assert(run("tail")(1L)._1 == "t6 t7 t8 t9 t10")
    // both at budget 5: 2 head + ellipsis + 2 tail
    assert(run("both")(1L)._1 == "t1 t2 … t9 t10")
    intercept[IllegalArgumentException] {
      graft.ops.Curation.tokenBudgetTruncate(docs, col("id"), col("text"),
        5, "middle")
    }
  }

  test("extractLinks: href + anchor extraction, inner tags stripped, multi-link docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, """<p>x</p><a href="https://a.com/1">first</a> mid
             |<a class="z" href="http://b.org/2?q=1"><b>bold</b> two</a>""".stripMargin),
      (2L, "no links here")).toDF("id", "html")
    val got = graft.ops.TextAnalysis.extractLinks(docs, col("id"),
        col("html"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSet == Set(
      (1L, "https://a.com/1", "first"),
      (1L, "http://b.org/2?q=1", "bold two")))
  }

  test("sectionSplit: preamble, heading bodies, adjacent headings, empty doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "intro line\n# A\nbody a1\nbody a2\n## B\n# C\nbody c"),
      (2L, "# Only\n"),
      (3L, "")).toDF("id", "md")
    val got = graft.ops.TextAnalysis.sectionSplit(docs, col("id"), col("md"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3))).toMap
    assert(got((1L, 1L)) == ("", "intro line"))
    assert(got((1L, 2L)) == ("# A", "body a1\nbody a2"))
    assert(got((1L, 3L)) == ("## B", ""))   // adjacent headings: empty body
    assert(got((1L, 4L)) == ("# C", "body c"))
    assert(got((2L, 1L)) == ("# Only", ""))
    assert(!got.keySet.exists(_._1 == 3L))  // fully empty doc yields nothing
  }

  test("packingReport: hand-computed utilization and waste over known bins") {
    import spark.implicits._
    val packed = Seq((0L, 3L, 512L), (1L, 2L, 256L), (2L, 1L, 300L))
      .toDF("bin", "n_docs", "tokens")
    val r = graft.ops.Curation.packingReport(packed, budget = 512L).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 1068)
    assert(r.getDouble(3) == 0.5)  // min util = 256/512
    assert(r.getDouble(4) == 1.0)  // max util
    assert(r.getDouble(5) ==
      math.rint((1.0 - 1068.0 / (3 * 512)) * 1e4) / 1e4)
  }

  test("dedupSaturation: planted duplicates appear only past their prefix; rate monotone setup") {
    import spark.implicits._
    // docs 0-9 unique; 10-14 duplicate docs 0-4 verbatim
    val docs = ((0 until 10).map(i =>
      (i.toLong, s"alpha$i bravo$i charlie$i delta$i echo$i")) ++
      (10 until 15).map(i =>
        (i.toLong, s"alpha${i - 10} bravo${i - 10} charlie${i - 10} delta${i - 10} echo${i - 10}")))
      .toDF("id", "text")
    val got = graft.ops.Dedup.dedupSaturation(docs, col("id"), col("text"),
        0.9, prefixes = Seq(10L, 15L), shingleSize = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(10L) == (10L, 0L))  // the unique prefix has no duplicates
    assert(got(15L)._1 == 15L && got(15L)._2 == 5L) // all five copies caught
  }

  test("groupCentroidSimilarity: parallel groups near 1, orthogonal near 0, upper triangle") {
    import spark.implicits._
    val emb = Seq(
      (1L, 0, Seq(1f, 0f, 0f, 0f)), (2L, 0, Seq(0.9f, 0.1f, 0f, 0f)),
      (3L, 1, Seq(0.95f, 0.05f, 0f, 0f)),                 // ≈ group 0
      (4L, 2, Seq(0f, 0f, 1f, 0f)), (5L, 2, Seq(0f, 0f, 0.8f, 0.2f)))
      .toDF("id", "grp", "v")
    val got = graft.ops.Ann.groupCentroidSimilarity(emb, col("id"),
        col("v"), col("grp"))
      .collect().map(r => (r.get(0).toString.toInt, r.get(1).toString.toInt)
        -> r.getDouble(4)).toMap
    assert(got.keySet == Set((0, 1), (0, 2), (1, 2))) // upper triangle only
    assert(got((0, 1)) > 0.99)
    assert(got((0, 2)) < 0.2 && got((1, 2)) < 0.2)
  }

  test("lshPlan: S-curve formula hand-check, budget respected, more bands = more permissive") {
    val plan = graft.ops.Dedup.lshPlan(spark, threshold = 0.7,
      maxHashes = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(plan.keys.forall { case (b, r) => b * r <= 64 })
    // hand-check (16, 4): p(0.7) = 1 - (1 - 0.7^4)^16
    val exp = 1.0 - math.pow(1.0 - math.pow(0.7, 4), 16)
    assert(plan((16L, 4L))._3 == math.rint(exp * 1e6) / 1e6)
    // at fixed r, more bands catch more: p increases, fn decreases
    assert(plan((16L, 4L))._3 > plan((8L, 4L))._3)
    assert(plan((16L, 4L))._4 < plan((8L, 4L))._4)
  }

  test("urlCanonicalize/urlDedup: every hazard normalizes; distinct pages survive") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://www.shop.example.com:443/cart/?utm_source=mail&fbclid=xyz#top"),
      (2L, "https://shop.example.com/cart"),          // same page as 1
      (3L, "http://shop.example.com:80/cart"),        // http ≠ https: distinct
      (4L, "https://shop.example.com/cart?page=2"),   // real param survives
      (5L, "https://shop.example.com/cart?page=2&utm_medium=x")) // = 4
      .toDF("id", "url")
    val canon = urls.select(col("id"),
        graft.ops.TextAnalysis.urlCanonicalize(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(1L) == "https://shop.example.com/cart")
    assert(canon(2L) == canon(1L))
    assert(canon(3L) == "http://shop.example.com/cart")
    assert(canon(4L) == "https://shop.example.com/cart?page=2")
    assert(canon(5L) == canon(4L))
    val dups = graft.ops.TextAnalysis.urlDedup(urls, col("id"), col("url"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dups == Map(
      "https://shop.example.com/cart" -> (2L, 1L),
      "https://shop.example.com/cart?page=2" -> (2L, 4L)))
  }

  test("fleschReadability: hand-computed score, floor of one sentence, empty doc null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sentences, 6 syllables
      (2L, "no punctuation here"),         // sentences floor = 1
      (3L, "")).toDF("id", "text")
    val got = graft.ops.TextAnalysis.fleschReadability(docs, col("id"),
        col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L)._1 == 6 && got(1L)._2 == 2 && got(1L)._3 == 6)
    val expected = math.rint((206.835 - 1.015 * 6 / 2.0 - 84.6 * 6 / 6.0) * 1e4) / 1e4
    assert(got(1L)._4.contains(expected))
    assert(got(2L)._2 == 1)
    assert(got(3L) == ((0L, 1L, 0L, None)))
  }

  test("silhouetteSimplified: separated clusters score near 1, one merged blob scores lower") {
    import spark.implicits._
    // two tight orthogonal bundles → silhouette ≈ 1 in both cells
    val tight = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Seq(1f, 0f, 0f, 0f) else Seq(0f, 1f, 0f, 0f)
      (i.toLong, base.map(x => x + (i % 5) * 0.001f))
    }.toDF("id", "v")
    val sep = graft.ops.Ivf.silhouetteSimplified(tight, col("id"), col("v"),
      nlist = 2, iters = 2, sampleFraction = 100).collect()
    assert(sep.forall(_.getDouble(2) > 0.8),
      sep.map(r => (r.getLong(0), r.getDouble(2))).mkString(", "))
    // one isotropic blob split into 2 cells → much weaker separation
    val blob = (0 until 20).map { i =>
      val a = i * 0.314
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat, 0.5f, 0.5f))
    }.toDF("id", "v")
    val merged = graft.ops.Ivf.silhouetteSimplified(blob, col("id"), col("v"),
      nlist = 2, iters = 2, sampleFraction = 100).collect()
    val wMean = merged.map(r => r.getLong(1) * r.getDouble(2)).sum /
      merged.map(_.getLong(1)).sum
    val sepMean = sep.map(r => r.getLong(1) * r.getDouble(2)).sum /
      sep.map(_.getLong(1)).sum
    assert(wMean < sepMean, s"blob $wMean should score below separated $sepMean")
  }

  test("temperatureSample: smallest stratum keeps all, T=1 passes through, deterministic") {
    import spark.implicits._
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 100).map(i => (i.toLong, "small"))).toDF("id", "st")
    val s2 = graft.ops.Curation.temperatureSample(df, col("id"), col("st"),
      temperature = 2.0)
    val rates = s2.select("st", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") == 1.0) // the minority stratum never downsamples
    // big's rate = (80/20)^-0.5 = 0.5
    assert(rates("big") == 0.5)
    val kept = s2.collect().map(_.getLong(0)).toSet
    assert((81L to 100L).forall(kept.contains))
    // deterministic & partition-invariant
    val again = graft.ops.Curation.temperatureSample(df.repartition(7),
      col("id"), col("st"), temperature = 2.0)
      .collect().map(_.getLong(0)).toSet
    assert(again == kept)
    // T=1: every rate is 1 → pass-through
    val t1 = graft.ops.Curation.temperatureSample(df, col("id"), col("st"),
      temperature = 1.0)
    assert(t1.count() == 100)
  }

  test("conversationAssemble: template order, alternation verdicts, single turn") {
    import spark.implicits._
    val turns = Seq(
      (1L, 1L, "user", "hi"), (1L, 2L, "assistant", "hello"),
      (1L, 3L, "user", "bye"),
      (2L, 1L, "user", "a"), (2L, 2L, "user", "b"),        // double user
      (3L, 1L, "assistant", "hm"),                           // assistant-led
      (4L, 2L, "assistant", "later"), (4L, 1L, "user", "first")) // order by o
      .toDF("conv", "o", "role", "txt")
    val got = graft.ops.TextAnalysis.conversationAssemble(turns, col("conv"),
        col("role"), col("txt"), col("o"), col("o"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getString(3))).toMap
    assert(got(1L) == (3L, true,
      "<|user|> hi\n<|assistant|> hello\n<|user|> bye"))
    assert(got(2L)._2 == false)
    assert(got(3L) == (1L, false, "<|assistant|> hm"))
    assert(got(4L) == (2L, true, "<|user|> first\n<|assistant|> later"))
  }

  test("domainReweight: hard domain gains mass, unlisted stays zero, weights sum to 1") {
    import spark.implicits._
    val docs = Seq(
      ("easy", 1.0), ("easy", 1.0), ("hard", 3.0), ("hard", 3.0),
      ("ghost", 9.0)) // not in refWeights
      .toDF("src", "loss")
    val got = graft.ops.Curation.domainReweight(docs, col("src"),
        col("loss"), Map("easy" -> 0.5, "hard" -> 0.5), eta = 1.0, eps = 0.1)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // hand-computed: raw_easy = .5e^1, raw_hard = .5e^3, raw_ghost = 0
    val z = 0.5 * math.exp(1.0) + 0.5 * math.exp(3.0)
    def w(raw: Double) = math.rint((0.9 * raw / z + 0.1 / 3) * 1e6) / 1e6
    assert(got("easy") == (0.5, w(0.5 * math.exp(1.0))))
    assert(got("hard") == (0.5, w(0.5 * math.exp(3.0))))
    assert(got("ghost") == (0.0, w(0.0)))
    assert(got("hard")._2 > got("easy")._2)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("scoreRankCalibrate: mid-rank CDF with ties, per-source independence, NaN dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 30.0),
      (5L, "b", 999.0), (6L, "b", 1000.0), (7L, "a", Double.NaN))
      .toDF("id", "src", "sc")
    val got = graft.ops.Curation.scoreRankCalibrate(docs, col("id"),
        col("src"), col("sc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // source a, n=4: 10 → 0.5/4; 20,20 → (1+1)/4; 30 → 3.5/4
    assert(got(1L) == 0.125 && got(2L) == 0.5 && got(3L) == 0.5
      && got(4L) == 0.875)
    // source b calibrates on its own scale: 999 is its LOW score
    assert(got(5L) == 0.25 && got(6L) == 0.75)
    assert(!got.contains(7L))
  }

  test("domainRollup/domainFilter: gate arithmetic, NaN-only source fails, filter drops") {
    import spark.implicits._
    val docs = Seq(
      ("good", 1L, 100.0), ("good", 2L, 200.0),       // mean 150, low_share 0
      ("short", 3L, 10.0), ("short", 4L, 20.0),       // mean 15 < 50 → drop
      ("nan", 5L, Double.NaN))                        // no scorable docs → drop
      .toDF("src", "id", "sc")
    val roll = graft.ops.Curation.domainRollup(docs, col("src"), col("sc"),
      minMean = 50.0, lowFloor = 50.0, maxLowShare = 0.5)
    val got = roll.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(4)))
      .toMap
    assert(got("good") == (2L, 150.0, true))
    assert(got("short") == (2L, 15.0, false))
    assert(!got.contains("nan")) // no scorable rows → absent from rollup…
    val kept = graft.ops.Curation.domainFilter(docs, col("src"), roll)
      .collect().map(_.getLong(1)).toSet
    // …and absent sources survive the anti-join (no verdict ≠ bad verdict)
    assert(kept == Set(1L, 2L, 5L))
  }

  test("embeddingDrift: identical snapshots show zero PSI and zero cosine shift") {
    import spark.implicits._
    // every vector twice: once ref, once new — per-cell shares and mean
    // cosines must agree exactly, whatever the trained clustering is
    val base = (0 until 40).map { i =>
      val ang = i * 0.157
      (i.toLong, Seq(math.cos(ang).toFloat, math.sin(ang).toFloat,
        (i % 5).toFloat / 5, 1f))
    }
    val both = base.map { case (id, v) => (id, v, false) } ++
      base.map { case (id, v) => (id + 1000L, v, true) }
    val df = both.toDF("id", "v", "is_new")
    val got = QualitySignals.embeddingDrift(df, col("id"), col("v"),
      col("is_new"), nlist = 4, iters = 2, sampleFraction = 100).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      assert(r.getLong(1) == r.getLong(2),
        s"ref/new counts differ in cell ${r.getLong(0)}")
      assert(r.getDouble(3) == 0.0, "psi_term must be exactly 0")
      assert(r.getDouble(6) == 0.0, "cos_shift must be exactly 0")
    }
  }

  test("bitextMine: planted translation pair wins with mutual=true; hub normalized") {
    import spark.implicits._
    // a0 ↔ b0 nearly parallel (the true pair); b9 is a hub moderately
    // close to every a — margin normalization must rank the true pair higher
    val a = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f))).toDF("id", "v")
    val b = Seq(
      (10L, Seq(0.98f, 0.02f, 0f, 0f)), // ≈ a0
      (11L, Seq(0f, 0.97f, 0.03f, 0f)), // ≈ a1
      (12L, Seq(0f, 0f, 0f, 1f)),       // orthogonal to all
      (19L, Seq(0.5f, 0.5f, 0.5f, 0.1f))) // hub
      .toDF("id", "v")
    val got = graft.ops.Ann.bitextMine(a, col("id"), col("v"),
        b, col("id"), col("v"), k = 2, threshold = 0.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got(0L)._1 == 10L && got(0L)._3, "a0's best must be b10, mutual")
    assert(got(1L)._1 == 11L && got(1L)._3)
    // a2 has no true pair: its best is the hub, NOT mutual-best-of-a2…
    assert(got(2L)._1 == 19L)
    // …and its margin sits below the true pairs'
    assert(got(2L)._2 < got(0L)._2 && got(2L)._2 < got(1L)._2)
  }

  test("fimTransform: PSM parts reconstruct the original; rate=1 rewrites all non-empty") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, ""), (4L, "hello world"))
      .toDF("doc_id", "text")
    val got = graft.ops.Curation.fimTransform(docs, col("doc_id"),
        col("text"), rate = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    val orig = Map(1L -> "abcdefghij", 2L -> "xy", 3L -> "", 4L -> "hello world")
    for ((id, (fim, out)) <- got) {
      if (orig(id).isEmpty) { assert(!fim && out == "") }
      else {
        assert(fim && out.startsWith("<PRE>"))
        val pre = out.stripPrefix("<PRE>")
        val Array(p, rest) = pre.split("<SUF>", 2)
        val Array(sfx, mid) = rest.split("<MID>", 2)
        assert(p + mid + sfx == orig(id), s"round-trip failed for $id: $out")
      }
    }
    // deterministic
    val again = graft.ops.Curation.fimTransform(docs, col("doc_id"),
      col("text"), rate = 1.0).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again == got.view.mapValues(_._2).toMap)
  }

  test("spanCorruption: token conservation, one sentinel per full block, empty doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 toks → blocks 8,8,4
      (2L, "a"),                                      // 1 tok < spanLen → untouched
      (3L, "")).toDF("doc_id", "text")
    val got = graft.ops.Curation.spanCorruption(docs, col("doc_id"),
        col("text"), stride = 8, spanLen = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    val (in1, tg1, ns1) = got(1L)
    assert(ns1 == 3) // all three blocks (8, 8, 4 >= spanLen) corrupted
    assert(Seq(0, 1, 2).forall(b => in1.contains(s"<extra_id_$b>")
      && tg1.contains(s"<extra_id_$b>")))
    // conservation: input tokens minus sentinels + target tokens minus
    // sentinels = the original multiset, and per-span target pairs are 2 long
    val sent = "<extra_id_\\d+>".r
    val inToks = in1.split(" ").filterNot(t => sent.matches(t))
    val tgToks = tg1.split(" ").filterNot(t => sent.matches(t))
    assert((inToks ++ tgToks).sorted.toSeq ==
      (1 to 20).map(i => s"t$i").sorted.toSeq)
    assert(tgToks.length == 6) // 3 spans × 2 tokens
    assert(got(2L) == (("a", "", 0L)))
    assert(got(3L) == (("", "", 0L)))
  }

  test("semanticContamination: planted paraphrase flagged, orthogonal clean, removal form") {
    import spark.implicits._
    // 4-dim toy space: corpus row 100 nearly parallel to bench 1 (cos≈1),
    // row 101 orthogonal, row 102 anti-parallel (cos=-1, never flagged)
    val bench = Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("bid", "bv")
    val corpus = Seq(
      (100L, Seq(0.9f, 0.1f, 0f, 0f)),
      (101L, Seq(0f, 0f, 1f, 0f)),
      (102L, Seq(-1f, 0f, 0f, 0f)),
      (103L, Seq(0.7f, 0.7f, 0f, 0f))) // matches BOTH; best = bench 1 (tie by sim)
      .toDF("id", "v")
    val got = QualitySignals.semanticContamination(corpus, col("id"),
        col("v"), bench, col("bid"), col("bv"), 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got.keySet == Set(100L, 103L))
    assert(got(100L)._1 == 1L && got(100L)._2 == 1L)
    assert(got(103L)._2 == 2L) // both bench vecs matched
    val kept = QualitySignals.semanticDecontaminate(corpus, col("id"),
      col("v"), bench, col("bid"), col("bv"), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(101L, 102L))
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG, zero-hit query present") {
    import spark.implicits._
    // truth qa: docs 1,2,3; system qa ranks (1:d9, 2:d2, 3:d3) → 2 hits,
    // first at rank 2; truth qb: docs 7,8; system qb misses both
    val truth = Seq(("qa", 1, 1L), ("qa", 2, 2L), ("qa", 3, 3L),
      ("qb", 1, 7L), ("qb", 2, 8L)).toDF("query_id", "rnk", "id")
    val system = Seq(("qa", 1, 9L), ("qa", 2, 2L), ("qa", 3, 3L),
      ("qb", 1, 11L), ("qb", 2, 12L)).toDF("query_id", "rnk", "id")
    val got = graft.ops.Ann.retrievalMetrics(system, truth, 3)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    assert(got("qa")._1 == math.rint(2.0 / 3 * 1e4) / 1e4)
    assert(got("qa")._2 == 0.5) // first hit at rank 2
    val dcg = 1.0 / log2(3.0) + 1.0 / log2(4.0)
    val idcg = 1.0 + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(got("qa")._3 - math.rint(dcg / idcg * 1e4) / 1e4) < 1e-9)
    assert(got("qb") == ((0.0, 0.0, 0.0)))
  }

  test("bruteForceTopKMany: per-query exact top-k equals single-query bruteForceTopK") {
    import spark.implicits._
    val emb = (0 until 30).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 7 + j * 3) % 13 - 6).toFloat)))
      .toDF("id", "v")
    val q1 = Array.tabulate(8)(j => (j % 3 - 1).toFloat)
    val q2 = Array.tabulate(8)(j => (1 - j % 2).toFloat)
    val many = graft.ops.Ann.bruteForceTopKMany(emb, col("id"), col("v"),
        Seq("a" -> q1, "b" -> q2), 5)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
        r.getDouble(3)))
    for ((qid, qv) <- Seq("a" -> q1, "b" -> q2)) {
      val single = graft.ops.Ann.bruteForceTopK(emb, col("id"), col("v"),
        qv, 5).collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1L, r.getLong(0), r.getDouble(1)) }
      assert(many.filter(_._1 == qid).sortBy(_._2).toSeq == single.toSeq)
    }
  }

  test("softDedupWeights: 1/cluster_size for members, 1.0 singletons, mass preserved") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // cluster 1 = {1,2,3}, cluster 4 = {4}… members-only frame, as
    // duplicateClusters emits (a singleton never appears there)
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_id")
    val got = graft.ops.Curation.softDedupWeights(docs, col("doc_id"), cc)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getDouble(2))).toMap
    assert(got(1L) == (Some(1L), 1.0 / 3) && got(2L) == (Some(1L), 1.0 / 3)
      && got(3L) == (Some(1L), 1.0 / 3))
    assert(got(4L) == (None, 1.0) && got(5L) == (None, 1.0))
    // expected copies per epoch: one per distinct unit (1 cluster + 2 singletons)
    assert(math.abs(got.values.map(_._2).sum - 3.0) < 1e-12)
  }

  test("latestSnapshot: max version per key, tie to smallest id, null version loses") {
    import spark.implicits._
    val rows = Seq(
      ("k1", 3L, 10L, "old"), ("k1", 7L, 11L, "new"),
      ("k2", 5L, 20L, "tieA"), ("k2", 5L, 21L, "tieB"),
      ("k3", 9L, 30L, "only")).toDF("k", "ver", "id", "body")
    val got = graft.ops.Dedup.latestSnapshot(rows, Seq(col("k")),
        col("ver"), col("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got == Map("k1" -> (11L, "new"), "k2" -> (20L, "tieA"),
      "k3" -> (30L, "only")))
    // a null version never beats a real one
    val withNull = Seq(("k1", Some(1L), 1L), ("k1", None, 2L))
      .toDF("k", "ver", "id")
    val g2 = graft.ops.Dedup.latestSnapshot(withNull, Seq(col("k")),
      col("ver"), col("id")).collect()
    assert(g2.length == 1 && g2(0).getLong(2) == 1L)
  }

  test("preferencePairs: extremes, deterministic ties, NaN excluded, degenerate dropped") {
    import spark.implicits._
    val df = Seq(
      ("p1", 1L, 5.0), ("p1", 2L, 9.0), ("p1", 3L, 1.0),
      ("p2", 4L, 7.0), ("p2", 5L, 7.0),             // all tied → margin 0 → dropped
      ("p3", 6L, 2.0),                               // singleton → dropped
      ("p4", 7L, Double.NaN), ("p4", 8L, 3.0), ("p4", 9L, 1.0))
      .toDF("grp", "id", "sc")
    val got = graft.ops.Curation.preferencePairs(df, col("grp"), col("id"),
        col("sc"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(5), r.getLong(6))).toMap
    assert(got == Map(
      "p1" -> (2L, 3L, 8.0, 3L),
      "p4" -> (8L, 9L, 2.0, 2L))) // NaN row can be neither side nor counted
    // tie on the chosen side resolves to the smaller id
    val tied = Seq(("t", 11L, 4.0), ("t", 10L, 4.0), ("t", 12L, 1.0))
      .toDF("grp", "id", "sc")
    val g2 = graft.ops.Curation.preferencePairs(tied, col("grp"), col("id"),
      col("sc")).collect()
    assert(g2.length == 1 && g2(0).getLong(1) == 10L && g2(0).getLong(3) == 12L)
  }
}
