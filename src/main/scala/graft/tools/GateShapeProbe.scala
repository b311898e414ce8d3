package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolates which SHAPE of the quality-gate consumption is slow: the
  * bare metrics frame benches at sf10 in ~1.4 s while the pipeline's
  * `.where(keep).select(id)` consumption of the same frame measured
  * ~58 s — a ~40× gap that can only be plan shape (e.g. the profile
  * subtree evaluating once per referencing expression instead of once
  * per row).
  */
object GateShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def evalFully(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[shape] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def gate = graft.ops.Curation.qualityGate(docs, "text", "doc_id",
      20, 5000, 0.45, 0.12)

    evalFully(docs.select(sum(length(col("text"))))) // warm
    time("bare metrics")(evalFully(gate))
    time("bare metrics 2")(evalFully(gate))
    time("where(keep)")(evalFully(gate.where(col("keep"))))
    time("where+select(id)")(evalFully(gate.where(col("keep")).select(col("doc_id"))))
    time("select(id,keep)")(evalFully(gate.select(col("doc_id"), col("keep"))))
    time("where via filter col")(evalFully(
      gate.select(col("doc_id"), col("keep")).where(col("keep")).select(col("doc_id"))))
    spark.stop()
  }
}
