package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.StatsAggregator

/** Pins the TIMESTAMP_NTZ tolerance of every events-consuming
  * operator: tz-naive parquet (`timestamp[us]`, no `isAdjustedToUTC`)
  * reads back as `TIMESTAMP_NTZ` in Spark 4, and any operator calling
  * `unix_micros` on the raw column fails analysis
  * (`DATATYPE_MISMATCH`). Round 9 broke q_sessionize and
  * q_range_attribution exactly this way; this spec feeds a naive-ts
  * parquet through the whole operator class so it can't recur.
  */
class NaiveTimestampSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val t0 = 1700000000000L

  // Events with both dtypes: ltz is the historical fixture shape, ntz
  // is what a tz-naive parquet reads back as.
  private lazy val (ltzEvents, ntzEvents): (DataFrame, DataFrame) = {
    val raw = Seq(
      (1L, 10L, "click", new Timestamp(t0)),
      (2L, 10L, "click", new Timestamp(t0 + 60000)),
      (3L, 10L, "purchase", new Timestamp(t0 + 120000)),
      (4L, 10L, "click", new Timestamp(t0 + 45 * 60000)),
      (5L, 20L, "purchase", new Timestamp(t0 + 30000)),
      (6L, 20L, "click", new Timestamp(t0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val dir = Files.createTempDirectory("graft-ntz").toString
    raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(dir)
    val ntz = spark.read.parquet(dir)
    assert(ntz.schema("ts").dataType == TimestampNTZType,
      "fixture must read back as TIMESTAMP_NTZ for this spec to pin anything")
    (raw, ntz)
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("epochMicros is identical on NTZ and LTZ under UTC session tz") {
    val l = ltzEvents.select(TimeCols.epochMicros(col("ts")).as("us"))
    val n = ntzEvents.select(TimeCols.epochMicros(col("ts")).as("us"))
    assert(collectSorted(l) == collectSorted(n))
  }

  test("Sessionize.sessions accepts a naive-ts parquet and matches LTZ") {
    val l = Sessionize.sessions(ltzEvents, gapMinutes = 30)
    val n = Sessionize.sessions(ntzEvents, gapMinutes = 30)
    assert(collectSorted(n) == collectSorted(l))
    assert(l.count() > 0)
  }

  test("RangeJoin.pointInInterval accepts a naive-ts parquet and matches LTZ") {
    def attribution(ev: DataFrame): DataFrame = {
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("w_start"), col("ts").as("w_end"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      RangeJoin.pointInInterval(clicks, purchases,
          Seq("user_id"), "ts", "w_start", "w_end")
        .select(col("user_id"), col("click_id"), col("purchase_id"))
    }
    val l = attribution(ltzEvents)
    val n = attribution(ntzEvents)
    assert(collectSorted(n) == collectSorted(l))
    assert(l.count() > 0)
  }

  test("Asof backward/forward joins accept a naive-ts parquet") {
    def asof(ev: DataFrame): DataFrame = {
      val right = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      Asof.joinBackward(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        right, Seq("user_id"), "ts", Seq("purchase_id"))
    }
    // Same-dtype comparisons only (mixing NTZ/LTZ inside one join is
    // not a shape the fixtures produce); both dtypes must analyze and
    // agree on the attribution.
    val l = asof(ltzEvents).select("event_id", "purchase_id")
    val n = asof(ntzEvents).select("event_id", "purchase_id")
    assert(collectSorted(n) == collectSorted(l))
    assert(l.count() > 0)
  }

  test("StatsAggregator windowed stats accept a naive-ts parquet") {
    val stats = ntzEvents.select(
      lit("transport").as("component"), lit("count").as("statType"),
      lit("written").as("statName"), lit("records").as("unit"),
      col("event_id").as("value"), col("ts"))
    // window() supports NTZ natively; this pins that the stats path
    // keeps analyzing if the fixture dtype shifts again.
    val out = StatsAggregator.aggregate(stats, "60 seconds")
    assert(out.count() > 0)
  }
}
