package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Cost decomposition of adjacentPairCounts: pair generation alone,
  * generation+aggregation, and the full top-100 query. Args: [sfDir]
  */
object PairCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_docs1000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Any): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[pcost] $tag%-16s rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(col("text")))
    val n = size(toks)
    val pairs = when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), n - lit(1)),
        slice(toks, lit(2), n - lit(1)),
        (a, b) => concat(a, lit(" "), b)))
    time("explode-zipwith")(docs.select(explode(pairs).as("pair")).count())
    time("explode-native") {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      docs.select(explode(column(graft.functions.AdjacentPairs(
        expression(col("text"))))).as("pair")).count()
    }
    time("agg-distinct")(
      TextAnalysis.adjacentPairCounts(docs, "text").count())
    time("full-top100")(
      TextAnalysis.adjacentPairCounts(docs, "text")
        .orderBy(desc("cnt"), asc("pair")).limit(100).collect().length)
    spark.stop()
  }
}
