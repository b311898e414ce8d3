package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

import graft.queries.EntryQueries

/** Writes each named query's FULL `explain("formatted")` output to
  * `<outDir>/<query><suffix>.txt` under the bench session confs
  * (local master, 32 shuffle partitions, AQE on), so plan-shape claims
  * in OPTIMIZATION notes are checkable from committed artifacts.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [q1 q2 ...]
  * (no query args = every declared query). Streaming-harness queries
  * (q_dedup_streaming_*) EXECUTE their stream when the frame is built;
  * the dumped plan is the post-stream batch read — still useful for
  * the final aggregation shape, noted in the file header.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [queries...]")
    val outDir = new File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new PrintWriter(new File(outDir, s"$n$suffix.txt"), "UTF-8")
        try {
          w.println(s"== $n (sf dir: $dir, suffix: $suffix) ==")
          if (n.startsWith("q_dedup_streaming_"))
            w.println("NOTE: streaming-harness query; this is the post-stream batch plan.")
          w.println(txt)
        } finally w.close()
        println(s"[plandump] wrote $n$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
