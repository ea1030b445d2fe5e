package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the round-13 sf0.1 sweep finding: is
  * [[graft.ops.Scale.withGlobalIndex]] a total 1..n rank on a large
  * input under AQE? Prints (rows, distinct gidx, min, max) plus the
  * executed plan's exchange/reuse lines, AQE on vs off. */
object ProbeGidx {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    for (aqe <- Seq(true, false)) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      val g = graft.ops.Scale.withGlobalIndex(orders,
        Seq(col("o_orderdate"), col("o_orderkey")))
      val r = g.agg(count(lit(1)), countDistinct(col("gidx")),
        min("gidx"), max("gidx")).head()
      println(s"AQE=$aqe rows=${r.getLong(0)} distinct=${r.getLong(1)} " +
        s"min=${r.getLong(2)} max=${r.getLong(3)}")
      val plan = g.queryExecution.executedPlan.toString
      plan.split("\n").filter(l => l.contains("Exchange") ||
          l.contains("Reused") || l.contains("AQEShuffleRead"))
        .foreach(l => println(s"AQE=$aqe PLAN ${l.trim.take(120)}"))
      spark.stop()
    }
  }
}
