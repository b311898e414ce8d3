package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.EntryQueries

object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq("q_agg_pricing", "q_join_revenue", "q_cdc_pipeline", "q_filter_whitelist", "q_similarity_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(EntryQueries.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(3500))
    }
    spark.stop()
  }
}
