package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.EntryQueries

/** Repeat-timing harness: runs selected queries N times in one session
  * to separate per-query fixed overhead (planning, first parquet
  * footer read, codegen) from steady-state cost. Args: [sfDir] [reps]
  * [query names...] (default: all).
  */
object BenchRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq else EntryQueries.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) as s").collect()

    names.foreach { name =>
      val fn = EntryQueries.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchrep] $name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}  min=${times.min}%6.2f")
    }
    spark.stop()
  }
}
