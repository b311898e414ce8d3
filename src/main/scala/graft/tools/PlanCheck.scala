package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.EntryQueries

/** Prints how many times expensive expressions appear in the optimized
  * plan of each query (duplication = Catalyst inlined a projection) and
  * the number of exchanges (shuffles). Args: [sfDir] [names...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else EntryQueries.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = EntryQueries.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      def cnt(s: String) = s.r.findAllIn(plan).size
      println(f"[plan] $name%-28s parse=${cnt("parse_test_decoding")}%3d " +
        f"exchanges=${cnt("Exchange")}%3d scans=${cnt("Scan parquet")}%3d " +
        f"wscg=${cnt("WholeStageCodegen")}%3d len=${plan.length}%7d")
    }
    spark.stop()
  }
}
