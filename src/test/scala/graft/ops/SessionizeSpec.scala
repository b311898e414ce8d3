package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val t0 = 1700000000000L

  test("batch sessionization splits on gap and aggregates per session") {
    val events = Seq(
      (1L, 10L, new Timestamp(t0)),
      (2L, 10L, new Timestamp(t0 + 60000)), // same session (+1 min)
      (3L, 10L, new Timestamp(t0 + 45 * 60000)), // new session (+45 min)
      (4L, 20L, new Timestamp(t0))) // other user
      .toDF("event_id", "user_id", "ts")
    val s = Sessionize.sessions(events, gapMinutes = 30)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s == Seq(
      (10L, 1L, 2L, 60000000L),
      (10L, 2L, 1L, 0L),
      (20L, 1L, 1L, 0L)))
  }

  test("streaming session windows merge within gap, split across it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "user_id", "ts")
    val q = Sessionize.sessionsStream(df, gapMinutes = 30, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 10L, new Timestamp(t0)),
        (2L, 10L, new Timestamp(t0 + 60000)),
        (3L, 10L, new Timestamp(t0 + 45 * 60000)))
      q.processAllAvailable()
      // advance watermark far past all sessions so append emits them
      mem.addData((9L, 99L, new Timestamp(t0 + 10L * 3600000)))
      q.processAllAvailable()
      val got = spark.table("sessions_stream")
        .where($"user_id" === 10)
        .select("n_events").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L))
    } finally q.stop()
  }
}
