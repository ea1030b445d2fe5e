package graft.tools

/** Dev harness: print the DuckDB oracle SQL for one query name, for
  * single-query bisection against `tools/compare.py`'s full run.
  * Usage: runMain graft.tools.PrintOracle <queryName> [outFile] */
object PrintOracle {
  def main(args: Array[String]): Unit = {
    val sql = graft.SparkEntry.oracleSql(args(0))
    if (args.length > 1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), sql)
    else println(sql)
  }
}
