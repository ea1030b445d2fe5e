package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Diagnostic main: run selected SparkEntry queries (substring filters as
  * args, like Bench) and report, per query, the number of Spark JOBS,
  * STAGES, and TASKS the run launched alongside wall time.
  *
  * Why this exists: a query whose wall time is `#jobs x per-job scheduler
  * overhead` (iterative label propagation, prefix-doubling rounds,
  * driver-cadence model builds) amplifies host load multiplicatively —
  * 25 ms/job on an idle host vs 100+ ms/job on a loaded one is a 4x
  * swing with ZERO plan change — while a throughput-bound scan drifts
  * 5-8%. This probe separates the two populations mechanically, which is
  * the evidence PLANS.md's bench-variance entries cite. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })

    graft.SparkEntry.entry(spark).queryExecution.toRdd.count() // warmup

    val wanted = args.toSeq
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
    println(f"${"query"}%-36s ${"sec"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskSec"}%8s")
    selected.foreach { case (name, fn) =>
      // settle listener counters from the previous query (the bus is
      // private; a short sleep after the blocking count is enough for a
      // diagnostic — counts are per-query approximate, not accounting)
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$name%-36s $sec%8.3f ${jobs.get}%5d ${stages.get}%6d ${tasks.get}%6d ${taskMs.get / 1e3}%8.2f")
    }
    spark.stop()
  }
}
