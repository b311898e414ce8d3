package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Expression-level cost decomposition of the window segmenter:
  * normalize regex, marker regex, split, explode — each cumulative
  * layer timed twice. Args: [sfDir] [w]
  */
object SegCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_docs1000")
    val w = args.lift(1).map(_.toInt).getOrElse(20)
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
        println(f"[cost] $tag%-18s rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
    val norm = TextAnalysis.normalize(col("text"))
    val marked = regexp_replace(norm, s"((?:\\S+ ){${w - 1}}\\S+) ", "$1")
    time("scan-only")(docs.select(length(col("text"))).agg(sum("length(text)")).first().getLong(0))
    time("normalize")(docs.select(length(norm).as("l")).agg(sum("l")).first().getLong(0))
    time("marker")(docs.select(length(marked).as("l")).agg(sum("l")).first().getLong(0))
    time("split-size")(docs.select(size(split(marked, "")).as("s")).agg(sum("s")).first().getLong(0))
    time("explode")(docs.select(explode(Dedup.windowSegments(col("text"), w))).count())
    spark.stop()
  }
}
