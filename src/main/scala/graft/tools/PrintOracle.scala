package graft.tools

/** Print one declared oracle SQL to stdout (iteration helper: pipe it
  * into DuckDB without a full Verify dump).
  * Usage: runMain graft.tools.PrintOracle <query_name>
  */
object PrintOracle {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.oracleSql(args(0)))
}
