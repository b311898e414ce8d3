package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.EntryQueries

/** Prints the formatted executed plan of named queries — the
  * `.explain("formatted")` audit loop. Args: [sfDir] [names...]
  */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_cdc_pipeline")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"===== $name =====")
      EntryQueries.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
