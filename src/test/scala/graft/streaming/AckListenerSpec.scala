package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.WalOffset

class AckListenerSpec extends AnyFunSuite {
  import TestSpark.spark

  test("listener surfaces committed end-offsets as monotone LSN acks") {
    val dir = Files.createTempDirectory("graft_ack").toString
    Files.write(Paths.get(dir, "000.wal"),
      (Seq("BEGIN 1") ++ (1 to 10).map(i =>
        s"table public.t: INSERT: id[integer]:$i") ++ Seq("COMMIT 1"))
        .mkString("\n").getBytes("UTF-8"))

    val acks = new ArrayBuffer[Long]()
    val listener = new AckListener(
      queryName = "ack_listener_test",
      extractLsn = json => scala.util.Try(WalOffset.fromJson(json).lsn).toOption,
      onAck = lsn => acks.synchronized(acks += lsn))
    spark.streams.addListener(listener)
    try {
      val q = CdcPipeline.transform(
        CdcPipeline.fromWalSource(spark, dir, maxLinesPerTrigger = Some(4)),
        CdcConfig())
        .writeStream.format("memory").queryName("ack_listener_test")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // listener events are async — give the bus a moment
        val deadline = System.currentTimeMillis() + 10000
        while (acks.synchronized(acks.isEmpty) && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      } finally q.stop()
      val got = acks.synchronized(acks.toList)
      assert(got.nonEmpty, "no acks surfaced")
      assert(got == got.sorted, s"acks not monotone: $got")
      assert(got.max <= 12L)
    } finally spark.streams.removeListener(listener)
  }
}
