package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ops.Dedup

/** Prints the Catalyst `sizeInBytes` estimate the span auto-selector
  * ([[Dedup]] `resolveSpanStrategy`) sees for each corpus directory
  * passed as an argument (default: sf0.01 and sf0.1 — the two scales
  * always present under /root/testdata), plus
  * the strategy the CURRENT threshold picks. The estimate is the
  * optimized-plan statistic of the pruned (doc_id, text) projection —
  * compressed-file-size based for parquet, so it tracks on-disk bytes,
  * not decoded string bytes. Used to calibrate
  * `spark.graft.span.boundedMinBytes` against measured
  * window-vs-bounded crossover points (SCALE.md round 17).
  */
object SpanEstimateProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-span-estimate-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try dirs.foreach { d =>
      val df = spark.read.parquet(s"$d/documents.parquet")
      val est = df.select(col("doc_id"), col("text"))
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val threshold = BigInt(spark.conf.get(
        Dedup.SpanBoundedMinBytesKey, Dedup.SpanBoundedMinBytesDefault.toString))
      val pick = if (est >= threshold) "bounded" else "window"
      println(f"[span-estimate] $d%-24s est=$est%12d bytes (${est / 1048576}%5d MiB) threshold=$threshold -> $pick")
    } finally spark.stop()
  }
}
