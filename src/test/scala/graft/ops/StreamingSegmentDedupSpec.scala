package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming twin of C4 line dedup ([[Dedup.streamingSegmentDedup]]):
  * segment-level first-arrival-wins within the watermark horizon, with
  * per-document reassembly emitted once the watermark passes the
  * document's event time. The kept segment SET must equal the batch
  * distinct-segment set under ANY micro-batch cut (the order-invariant
  * contract the streaming media twins pin); per-doc attribution
  * follows arrival order.
  */
class StreamingSegmentDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: Int): Timestamp = new Timestamp(1700000000000L + s * 1000L)
  // far past the 10-minute default watermark delay: flushes every group
  private val flushTs = new Timestamp(1700000000000L + 3600 * 1000L)

  private def run(
      batches: Seq[Seq[(Long, String, Timestamp)]],
      w: Int): Map[Long, (String, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = Dedup.streamingSegmentDedup(
      mem.toDF().toDF("doc_id", "text", "ts"), "text", "doc_id", "ts",
      w = w, sep = "\n")
    val sink = s"seg_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData((-1L, "flushsentinel unique tokens", flushTs))
      q.processAllAvailable()
      spark.table(sink)
        .filter($"doc_id" >= 0)
        .select($"doc_id", $"text_dedup", $"n_kept", $"n_dropped")
        .as[(Long, String, Long, Long)].collect()
        .map { case (id, t, k, d) => id -> ((t, k, d)) }.toMap
    } finally q.stop()
  }

  test("first arrival wins across batches; all-dup docs vanish; within-doc repeats dedup") {
    val out = run(Seq(
      Seq((1L, "a b c d", ts(0)), (2L, "g h g h", ts(1))),
      Seq((3L, "c d e f", ts(2)), (4L, "a b c d", ts(3)))), w = 2)
    assert(out(1L) == (("a b\nc d", 2L, 0L)))
    assert(out(2L) == (("g h", 1L, 1L)))       // within-doc repeat
    assert(out(3L) == (("e f", 1L, 1L)))       // "c d" claimed by doc 1
    assert(!out.contains(4L))                  // every segment claimed
  }

  test("kept segment set is micro-batch-cut invariant and equals the batch distinct set") {
    val docs = Seq(
      (1L, "a b c d a b", ts(0)), (2L, "c d e f", ts(1)),
      (3L, "e f g h", ts(2)), (4L, "a b g h", ts(3)), (5L, "x y", ts(4)))
    val distinctSegs = docs.flatMap { case (_, t, _) =>
      t.split(" ").grouped(2).map(_.mkString(" "))
    }.toSet
    for (cut <- Seq(Seq(docs), docs.map(Seq(_)), Seq(docs.take(2), docs.drop(2)))) {
      val out = run(cut, w = 2)
      val keptSegs = out.values.flatMap(_._1.split("\n")).toSet
      assert(keptSegs == distinctSegs, s"cut=${cut.map(_.size)}")
      val totalKept = out.values.map(_._2).sum
      assert(totalKept == distinctSegs.size.toLong)
    }
  }

  test("matches batch dropDuplicateSegments when arrival order is id order") {
    val docs = Seq(
      (10L, "p q r s", ts(0)), (11L, "r s t u", ts(1)), (12L, "p q t u", ts(2)))
    val streamed = run(docs.map(Seq(_)), w = 2)
    val batch = Dedup.dropDuplicateSegments(
        docs.map(d => (d._1, d._2)).toDF("doc_id", "text"),
        "text", "doc_id", Dedup.windowSegments($"text", 2), sep = "\n",
        segmentHashes = Some(Dedup.windowSegmentHashes($"text", 2)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_dedup"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))))
      .toMap
    assert(streamed == batch)
  }
}
