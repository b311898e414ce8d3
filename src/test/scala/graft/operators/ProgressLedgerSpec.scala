package graft.operators

import org.apache.spark.sql.functions.{col, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProgressLedgerSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("in-memory ledger: contiguous prefix only") {
    val l = new InMemoryLedger
    assert(l.updateSeen(Seen("1", "1-0", 2, 100L)).isRight)
    assert(l.updateSeen(Seen("2", "2-0", 1, 200L)).isRight)
    assert(l.updateSeen(Seen("3", "3-0", 1, 300L)).isRight)
    l.updateWritten(Written("1", "1-0", 2))
    l.updateWritten(Written("3", "3-0", 1))
    // txn 2 incomplete → only txn 1 ackable
    assert(l.emitProgress() == Some(100L))
    assert(l.size == 2)
    l.updateWritten(Written("2", "2-0", 1))
    // now 2 and 3 are both complete → ack jumps to 300
    assert(l.emitProgress() == Some(300L))
    assert(l.size == 0)
    assert(l.emitProgress() == None)
  }

  test("in-memory ledger: written before seen; partial counts accumulate") {
    val l = new InMemoryLedger
    l.updateWritten(Written("5", "5-0", 3))
    assert(l.emitProgress() == None) // no COMMIT seen yet (totalMsgs=0 but commit=0)
    assert(l.updateSeen(Seen("5", "5-0", 5, 500L)).isRight)
    assert(l.emitProgress() == None) // 3 of 5 written
    l.updateWritten(Written("5", "5-0", 2))
    assert(l.emitProgress() == Some(500L))
  }

  test("in-memory ledger: re-delivered txn supersedes stale instance") {
    val l = new InMemoryLedger
    assert(l.updateSeen(Seen("9", "9-100", 2, 900L)).isRight)
    l.updateWritten(Written("9", "9-100", 1))
    // reconnect: same txn arrives under a newer time-based key
    assert(l.updateSeen(Seen("9", "9-200", 2, 900L)).isRight)
    l.updateWritten(Written("9", "9-200", 2))
    assert(l.emitProgress() == Some(900L))
    assert(l.size == 0)
  }

  test("in-memory ledger: duplicate seen for same instance rejected") {
    val l = new InMemoryLedger
    assert(l.updateSeen(Seen("1", "1-0", 1, 10L)).isRight)
    assert(l.updateSeen(Seen("1", "1-0", 1, 10L)).isLeft)
  }

  test("distributed contiguousAck matches the prefix rule") {
    val seen = Seq(
      (1L, "1-0", 2L, 100L),
      (2L, "2-0", 1L, 200L),
      (3L, "3-0", 1L, 300L),
      (4L, "4-0", 1L, 0L)) // commit not yet observed
      .toDF("ord", "timeBasedKey", "totalMsgs", "commitWalStart")
    val written = Seq(
      ("1-0", 1L), ("1-0", 1L), ("3-0", 1L))
      .toDF("timeBasedKey", "count")

    val ack = ProgressLedger.contiguousAck(seen, written)
      .as[Option[Long]].head()
    assert(ack == Some(100L)) // txn 2 blocks 3

    val written2 = written.union(Seq(("2-0", 1L)).toDF("timeBasedKey", "count"))
    assert(ProgressLedger.contiguousAck(seen, written2).as[Option[Long]].head() == Some(300L))

    // nothing complete → NULL ack
    val ack0 = ProgressLedger.contiguousAck(seen, Seq.empty[(String, Long)].toDF("timeBasedKey", "count"))
    assert(ack0.as[Option[Long]].head().isEmpty)
  }

  test("contiguousAck on a sparse ord space: every txn its own bucket, many super-buckets") {
    // bucketWidth=1 + superFanout=4 forces the degenerate shape the
    // two-level combine exists for: 40 txns → 40 buckets → 10+ super
    // summaries, prefix logic crossing super boundaries.
    val n = 40
    val seen = (0 until n).map { i =>
      (i * 7L, s"$i-0", 1L, if (i == 25) 0L else 1000L + i) // txn 25 commit unseen
    }.toDF("ord", "timeBasedKey", "totalMsgs", "commitWalStart")
    val written = (0 until n).filter(_ != 30) // txn 30 unwritten
      .map(i => (s"$i-0", 1L)).toDF("timeBasedKey", "count")

    val ack = ProgressLedger.contiguousAck(seen, written,
      bucketWidth = 1L, superFanout = 4L).as[Option[Long]].head()
    assert(ack == Some(1000L + 24)) // txn 25 blocks everything after

    // heal txn 25: frontier advances to just before unwritten txn 30
    val seen2 = seen.withColumn("commitWalStart",
      when(col("ord") === 25L * 7L, 1025L).otherwise(col("commitWalStart")))
    val ack2 = ProgressLedger.contiguousAck(seen2, written,
      bucketWidth = 1L, superFanout = 4L).as[Option[Long]].head()
    assert(ack2 == Some(1000L + 29))

    // first txn incomplete → nothing ackable at all
    val written3 = written.where(col("timeBasedKey") =!= "0-0")
    val ack3 = ProgressLedger.contiguousAck(seen, written3,
      bucketWidth = 1L, superFanout = 4L).as[Option[Long]].head()
    assert(ack3.isEmpty)

    // no unpartitioned window anywhere (the old final combine moved all
    // bucket summaries to a single partition and warned about it)
    val optimized = ProgressLedger.contiguousAck(seen, written, 1L, 4L)
      .queryExecution.optimizedPlan
    val unpartitioned = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"plan must not contain an unpartitioned window:\n$optimized")
  }
}
