package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.StatsAggregator

class StatsReportersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("dogstatsd lines: count -> |c, histogram -> gauge + _avg/_max/_min sub-stats") {
    val stats = Seq(
      ("batcher", "count", "batches", "n", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")),
      ("batcher", "count", "batches", "n", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20")),
      ("sink", "histogram", "latency", "ms", 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      ("sink", "histogram", "latency", "ms", 30L, java.sql.Timestamp.valueOf("2024-01-01 00:00:15")),
      ("sink", "histogram", "latency", "ms", 20L, java.sql.Timestamp.valueOf("2024-01-01 00:00:25")))
      .toDF("component", "statType", "statName", "unit", "value", "ts")

    val agg = StatsAggregator.aggregate(stats)
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    StatsReporters.reportStatsd(lines += _)(agg, 0L)

    assert(lines.contains("bifrost.batcher.batches.n:2|c"))
    assert(lines.contains("bifrost.sink.latency.ms:60|g"), "histogram main value = window sum")
    assert(lines.contains("bifrost.sink.latency_avg.ms:20|g"))
    assert(lines.contains("bifrost.sink.latency_max.ms:30|g"))
    assert(lines.contains("bifrost.sink.latency_min.ms:10|g"))
    // count stats do not multiplex sub-stats
    assert(!lines.exists(_.contains("batches_avg")))
  }

  test("SIGIO-style progress dump: depth stats + one entry line per in-flight txn") {
    import graft.operators.{InMemoryLedger, Seen, Written}
    val l = new InMemoryLedger
    assert(l.updateSeen(Seen("800", "800-1", 3, 0x130L)).isRight)
    l.updateWritten(Written("800", "800-1", 2))
    l.updateWritten(Written("801", "801-1", 5)) // written before its seen

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    StatsReporters.dumpProgress(l, spoolDepth = 42L, lines += _)

    assert(lines(0) == "progress_tracker.ledger_size type=histogram unit=count value=2")
    assert(lines(1) == "progress_tracker.spool_depth type=gauge unit=lines value=42")
    // insertion order, full entry state — the reference's `entry: k:v` dump
    assert(lines(2) == "entry: 800-1:{txn=800 commitWalStart=304 count=2 totalMsgs=3}")
    assert(lines(3) == "entry: 801-1:{txn=801 commitWalStart=0 count=5 totalMsgs=0}")
    assert(lines.size == 4)

    // an emptied ledger dumps its emptiness explicitly, not zero lines
    l.updateWritten(Written("800", "800-1", 1))
    assert(l.emitProgress().contains(0x130L))
    val l2 = new InMemoryLedger
    val empty = scala.collection.mutable.ArrayBuffer[String]()
    StatsReporters.dumpProgress(l2, spoolDepth = 0L, empty += _)
    assert(empty.last == "progress_tracker.ledger empty")
  }

  test("signal registration delivers the dump on raise") {
    val fired = new java.util.concurrent.CountDownLatch(1)
    val ok = StatsReporters.registerSignalDump("IO")(() => fired.countDown())
    assume(ok, "SIGIO not available on this platform/JVM")
    sun.misc.Signal.raise(new sun.misc.Signal("IO"))
    assert(fired.await(5, java.util.concurrent.TimeUnit.SECONDS))
  }
}
