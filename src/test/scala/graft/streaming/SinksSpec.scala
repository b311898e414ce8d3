package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {

  private def rec(key: String, txn: String, lsn: Long, size: Int): SinkRecord =
    SinkRecord(key, txn, lsn, Array.fill(size)('x'.toByte))

  test("greedy chunking honors record-count cap") {
    val recs = (1 to 1203).map(i => rec("k", s"t${i / 100}", i, 10))
    val chunks = Chunker.greedyChunks(recs.iterator, BatchCaps(500, Long.MaxValue, Long.MaxValue)).toSeq
    assert(chunks.map(_.records.size) == Seq(500, 500, 203))
  }

  test("greedy chunking honors byte cap and keeps order") {
    val recs = Seq(rec("k", "t", 1, 400), rec("k", "t", 2, 400), rec("k", "t", 3, 400))
    val chunks = Chunker.greedyChunks(recs.iterator, BatchCaps(100, 1000, 500)).toSeq
    assert(chunks.map(_.records.map(_.walStart)) == Seq(Vector(1L, 2L), Vector(3L)))
  }

  test("oversized records are dropped but counted toward the txn (no ledger stall)") {
    val recs = Seq(rec("k", "t1", 1, 10), rec("k", "t1", 2, 2000), rec("k", "t2", 3, 10))
    val chunks = Chunker.greedyChunks(recs.iterator, BatchCaps(500, 5000, 1000)).toSeq
    assert(chunks.head.records.size == 2)
    assert(chunks.head.droppedOversize.map(_.walStart) == Vector(2L))
    assert(chunks.head.writtenCountsByTxn == Map("t1" -> 2, "t2" -> 1))
  }

  test("backoff retries until success with capped exponential delays") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val b = new Backoff(1500, 1.5, 5000, 60000, delays += _)
    var calls = 0
    val ok = b.retry { () => calls += 1; calls >= 4 }
    assert(ok && calls == 4)
    assert(delays.toSeq == Seq(1500, 2250, 3375))
  }

  test("backoff gives up after the elapsed budget") {
    var now = 0L // fake nanos, advanced by the fake sleeper
    val b = new Backoff(1000, 2.0, 4000, 10000, d => now += d * 1000000L, () => now)
    var calls = 0
    val ok = b.retry { () => calls += 1; false }
    assert(!ok && calls >= 4)
  }

  test("backoff budget is wall-clock: slow attempts count toward it") {
    var now = 0L
    val b = new Backoff(1000, 2.0, 4000, 10000, d => now += d * 1000000L, () => now)
    var calls = 0
    val ok = b.retry { () => calls += 1; now += 4000L * 1000000L; false } // each attempt takes 4 s
    assert(!ok)
    // 4 s attempt + 1 s sleep + 4 s attempt + 2 s sleep = 11 s > 10 s budget
    // → gives up after the 3rd attempt instead of retrying on sleep-time alone
    assert(calls == 3)
  }

  test("degenerate caps still make progress (no infinite chunk loop)") {
    // maxRecordBytes > maxBatchBytes would admit a record no batch can
    // carry (the transport's hard batch limit rejects it at send time):
    // rejected at construction instead
    intercept[IllegalArgumentException](BatchCaps(100, 500, 1000))
    // maxRecords = 0: first record still accepted, one record per chunk
    val recs = Seq(rec("k", "t", 1, 800), rec("k", "t", 2, 800))
    val chunks0 = Chunker.greedyChunks(recs.iterator, BatchCaps(0, Long.MaxValue, Long.MaxValue)).toSeq
    assert(chunks0.map(_.records.size) == Seq(1, 1))
  }

  test("epoch tracker makes batch replays idempotent: open returns false, nothing re-sent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_epochs").toString
    val tracker = EpochTracker.fileBacked(dir)
    val transport = new InMemoryTransport()
    val writer = ChunkedSink.foreachWriter(BatchCaps.kinesis, () => transport, tracker)

    def row(i: Int): org.apache.spark.sql.Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any]("k", s"t$i-0", i.toLong, s"""{"i":$i}"""),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("partitionKey", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("timeBasedKey", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("walStart", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("json", org.apache.spark.sql.types.StringType))))

    // first delivery of (partition 0, epoch 7)
    assert(writer.open(0, 7))
    (1 to 3).foreach(i => writer.process(row(i)))
    writer.close(null)
    assert(transport.totalRecords == 3)

    // Spark replays the same epoch after a failure before offset commit:
    // open must decline and nothing may be re-sent
    assert(!writer.open(0, 7))
    writer.close(null)
    assert(transport.totalRecords == 3)

    // a FAILED first attempt leaves no marker: the replay re-delivers
    assert(writer.open(1, 7))
    writer.process(row(9))
    writer.close(new RuntimeException("task died before delivery"))
    assert(writer.open(1, 7), "no marker after failure -> replay proceeds")
    writer.process(row(9))
    writer.close(null)
    assert(transport.totalRecords == 4)

    // later epochs proceed normally
    assert(writer.open(0, 8))
  }

  test("writePartition: partial failures are retried; written counts reported per txn") {
    val transport = new InMemoryTransport(partialFailOnce = Seq(1, 3))
    val recs = (1 to 5).map(i => rec("k", s"t${i % 2}", i, 10))
    val written = ChunkedSink.writePartition(
      recs.iterator, BatchCaps.kinesis, transport,
      () => new Backoff(sleeper = _ => ()))
    assert(written == Map("t1" -> 3, "t0" -> 2))
    // all 5 landed exactly once across the initial send + retry
    assert(transport.totalRecords == 5)
    val landed = transport.sent.flatten.map(_.walStart).sorted
    assert(landed == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("writePartition: full outage then recovery delivers everything") {
    val transport = new InMemoryTransport(failFirst = 2)
    val recs = (1 to 10).map(i => rec("k", "t", i, 10))
    val written = ChunkedSink.writePartition(
      recs.iterator, BatchCaps.kinesis, transport,
      () => new Backoff(sleeper = _ => ()))
    assert(written == Map("t" -> 10))
    assert(transport.totalRecords == 10)
  }

  test("sink key semantics match the reference") {
    assert(ChunkedSink.rabbitRoutingKey("public.users", "INSERT") == "public.users.INSERT")
    val r = rec("pk7", "t", 42, 1)
    assert(ChunkedSink.kinesisPartitionKey(r, keyed = true) == "pk7")
    assert(ChunkedSink.kinesisPartitionKey(r, keyed = false) == "42")
    assert(ChunkedSink.kinesisPartitionKey(r.copy(partitionKey = ""), keyed = true) == "42")
  }
}
