package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot demonstrations that the SIZED guards fail fast with their
  * sizing formulas BEFORE the work they bound runs.
  *
  * Default mode (round-11 ask #3's "Done" criterion): the dbscan
  * density guard at the DEFAULT knob on the 100× rehearsal point
  * cloud — builds the same offset-replica cloud the ScaleRehearsal
  * dbscan family uses at scale N and calls `Ann.dbscan`, expecting
  * the sizing-formula IllegalArgumentException before any point-level
  * shuffle. Usage: `runMain graft.tools.GuardDemo [sfDir] [N]`.
  *
  * `sized` mode (round-12 ask #7): recorded firing evidence for the
  * remaining sized `require` knobs —
  * `TextAnalysis.winnowOverlapAgainst`'s maxIndexEntries at the
  * DEFAULT knob (a synthetic 21M-hash persisted fingerprint index —
  * larger than the 2·10⁷ default broadcast cap) and
  * `Unigram.trainPieces`' maxSingles (at an explicitly lowered knob:
  * the DEFAULT 65536 equals the UTF-16 single-unit space, so no text
  * corpus can fire it — the knob only bites when lowered
  * deliberately, which is itself the recorded finding). Usage:
  * `runMain graft.tools.GuardDemo sized`. */
object GuardDemo {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sized")) { sizedDemos(); return }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val baseEv = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val ev = (0 until n).map { r =>
      baseEv.select(
        (col("event_id") + lit(r * 10000000L)).as("event_id"),
        (col("user_id") + lit(r * 10000000L)).as("user_id"),
        col("value"))
    }.reduce(_ unionByName _)
    val pts = ev.select(col("event_id").as("id"),
      (col("value") + expr("(user_id div 10000000) * 600")).as("x"),
      (col("user_id") % 10000000 % 100).cast("double").as("y"))
    val t0 = System.nanoTime()
    try {
      graft.ops.Ann.dbscan(pts, col("id"), col("x"), col("y"),
        eps = 0.4, minPts = 3).count() // default maxCandidatePairs
      println(s"[guard-demo] UNEXPECTED: dbscan at ${n}x completed " +
        "under the default knob")
    } catch {
      case e: IllegalArgumentException =>
        println(f"[guard-demo] guard fired after ${(System.nanoTime() - t0) / 1e9}%.1f s (pre-pass only):")
        println(s"[guard-demo] ${e.getMessage}")
    }
    spark.stop()
  }

  private def sizedDemos(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // winnowOverlapAgainst at the DEFAULT maxIndexEntries (2e7): a
    // synthetic persisted fingerprint index with 21M distinct hashes —
    // the pruned index the op would have to collect and broadcast
    val fp = spark.range(21000000L)
      .select(col("id"), col("id").as("h"))
    val probe = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "text")
    var t0 = System.nanoTime()
    try {
      graft.ops.TextAnalysis.winnowOverlapAgainst(probe, col("id"),
        col("text"), fp).count()
      println("[guard-demo] UNEXPECTED: winnowOverlapAgainst completed " +
        "under the default maxIndexEntries")
    } catch {
      case e: IllegalArgumentException =>
        println(f"[guard-demo] winnowOverlapAgainst guard fired after " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (index count only):")
        println(s"[guard-demo] ${e.getMessage}")
    }
    // trainPieces maxSingles — the DEFAULT (65536) equals the UTF-16
    // single-unit space, so text can never exceed it; the guard bites
    // at a deliberately lowered knob (here 1000 vs 1101 distinct CJK
    // chars), which is the recorded semantics
    // built driver-side: Spark's char()/chr() wraps codes mod 256
    val chars = Seq.tabulate(1101)(i =>
        "x " + (0x4E00 + i).toChar + " y")
      .toDF("text")
    t0 = System.nanoTime()
    try {
      graft.ops.Unigram.trainPieces(chars, col("text"),
        maxSingles = 1000).count()
      println("[guard-demo] UNEXPECTED: trainPieces completed under " +
        "maxSingles=1000 with 1101 distinct chars")
    } catch {
      case e: IllegalArgumentException =>
        println(f"[guard-demo] trainPieces guard fired after " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (bounded collect):")
        println(s"[guard-demo] ${e.getMessage}")
    }
    spark.stop()
  }
}
