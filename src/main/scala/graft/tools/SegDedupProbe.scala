package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Stage-level timing probe for [[Dedup.dropDuplicateSegments]]:
  * segmentation-only, occurrence aggregation, and the full query,
  * each run twice (second number is the warm one). Args: [sfDir] [w]
  */
object SegDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val w = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $tag%-22s rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      }
    }
    val segs = Dedup.windowSegments(col("text"), w)
    time("segment-only")(docs.select(explode(segs)).count())
    time("occ-hash-agg") {
      docs.select(col("doc_id"), posexplode(segs).as(Seq("__pos", "__seg")))
        .groupBy(xxhash64(col("__seg"))).agg(min(col("doc_id"))).count()
    }
    time("full")(Dedup.dropDuplicateSegments(docs, "text", "doc_id", segs).count())
    spark.stop()
  }
}
