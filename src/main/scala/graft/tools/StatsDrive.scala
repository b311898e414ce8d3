package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Stat, StatsAggregator}
import graft.streaming.StatsReporters

object StatsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.streams.addListener(new StatsReporters.ProgressStatsReporter())

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Stat]
    val agg = StatsAggregator.aggregateStream(mem.toDF())
    val q = agg.writeStream.outputMode("append")
      .foreachBatch(StatsReporters.reportAggregates()).start()
    val t0 = 1700000000000L
    mem.addData(
      Stat("marshaller", "count", "success", "msgs", 5, new Timestamp(t0)),
      Stat("marshaller", "count", "success", "msgs", 7, new Timestamp(t0 + 30000)),
      Stat("batcher", "histogram", "batch_size", "msgs", 100, new Timestamp(t0 + 10000)))
    q.processAllAvailable()
    // advance watermark past the window so append-mode emits it
    mem.addData(Stat("marshaller", "count", "success", "msgs", 1, new Timestamp(t0 + 180000)))
    q.processAllAvailable()
    q.stop()
    spark.stop()
  }
}
