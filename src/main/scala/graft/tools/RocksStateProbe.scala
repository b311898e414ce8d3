package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale floor for the RocksDB streaming-state path: drives
  * [[Dedup.streamingSegmentDedup]] over an amplified document corpus
  * via a FILE stream (maxFilesPerTrigger cuts it into micro-batches —
  * no driver-side MemoryStream feed, so the probe scale is bounded by
  * disk, not heap), with every event inside one watermark horizon so
  * dedup state grows monotonically to the corpus' full distinct-segment
  * count (~15 M keys on the x1000 corpus). Per micro-batch it prints
  * each stateful operator's rows-total, rows-updated, update/commit
  * times, and memory/SST footprint — the per-decade commit-time series
  * the 100 TB claim rests on.
  *
  * Usage: runMain graft.tools.RocksStateProbe [srcDir] [batches] [provider] [mode]
  *   provider: rocks (default) | hdfs
  *   mode: static (default) | drain
  *
  * `static` stamps every event with one fixed time inside the horizon,
  * so state grows monotonically to the corpus total — the WORST-CASE
  * floor the r20 evidence measured. `drain` stamps each micro-batch
  * with its processing time (`current_timestamp()` is the batch
  * timestamp in streaming) under a short watermark delay, so the
  * watermark advances every batch and both stateful operators EVICT:
  * the per-document aggregation flushes each batch's groups as the
  * next batch's watermark passes them, and the segment-dedup keys age
  * out of the horizon — the STEADY-STATE profile the 100 TB claim
  * needs (r20 verdict ask #3: agg state must plateau ≪ corpus size).
  */
object RocksStateProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/tmp/graft_docs5m")
    val batches = args.lift(1).map(_.toInt).getOrElse(10)
    val provider = args.lift(2).getOrElse("rocks")
    val mode = args.lift(3).getOrElse("static")
    require(mode == "static" || mode == "drain", s"unknown mode '$mode'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      // the streaming-harness state partition count (state-store count
      // binds at query start; see evidence/streaming_media)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    if (provider == "rocks")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"$srcDir/documents.parquet"
    val schema = spark.read.parquet(src).schema
    val nFiles = new java.io.File(src).listFiles()
      .count(_.getName.startsWith("part-"))
    val mft = math.max(1, (nFiles + batches - 1) / batches)
    println(s"[rocksprobe] corpus=$src files=$nFiles maxFilesPerTrigger=$mft " +
      s"provider=$provider mode=$mode")

    val ckpt = java.nio.file.Files
      .createTempDirectory("rocksprobe_ckpt").toString
    val tsCol =
      if (mode == "drain")
        // the batch timestamp: fixed within a micro-batch, strictly
        // advancing across batches — so the watermark moves every batch
        current_timestamp().as("ts")
      else lit(new Timestamp(1700000000000L)).as("ts")
    val delay = if (mode == "drain") "2 seconds" else "10 minutes"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", mft).parquet(src)
      .select(col("doc_id"), col("text"), tsCol)
    val q = Dedup.streamingSegmentDedup(stream, "text", "doc_id", "ts",
        w = 20, sep = "\n", watermarkDelay = delay)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val totalSec = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { p =>
      val ops = p.stateOperators.zipWithIndex.map { case (so, i) =>
        val sst = Option(so.customMetrics.get("rocksdbSstFileSize"))
          .map(_.longValue()).getOrElse(0L)
        f"op$i[${so.operatorName}] rows=${so.numRowsTotal}%,d " +
          f"upd=${so.numRowsUpdated}%,d updMs=${so.allUpdatesTimeMs} " +
          f"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes / 1048576}%dMB " +
          f"sst=${sst / 1048576}%dMB"
      }.mkString("  ")
      println(s"[rocksprobe] batch=${p.batchId} in=${p.numInputRows} $ops")
    }
    println(f"[rocksprobe] TOTAL ${totalSec}%.1f s over ${q.recentProgress.length} batches")
    q.stop()
    spark.stop()
  }
}
