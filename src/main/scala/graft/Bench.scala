package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR with full materialization (internal-row scan, so
  * projections/JSON rendering are actually computed — a bare `count()`
  * would let Catalyst prune all the work away) and prints the one-line
  * JSON the driver records as BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def evalFully(df: DataFrame): Long = df.queryExecution.toRdd.count()

    // Warm the JVM/codegen paths once so the first measured query isn't
    // paying one-time session costs.
    evalFully(spark.range(1000000).selectExpr("sum(id) as s"))

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try evalFully(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
