package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming twins of the media near-dedup family
  * ([[Multimodal.streamingMediaDedup]] / [[Multimodal.streamingMediaNearDedup]]
  * / [[Multimodal.streamingVideoDedup]]): the dedup DECISION at ingest
  * must match the batch fingerprints' semantics regardless of where
  * micro-batch boundaries fall, with undecodable payloads degrading to
  * byte-exact dedup instead of collapsing or vanishing. Same contract
  * pattern as StreamingCurationSpec: a batch-only regression (a new
  * shuffle or non-streamable node) fails at stream start.
  */
class StreamingMediaDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: Int): Timestamp = new Timestamp(1700000000000L + s * 1000L)

  private def pngBytes(ids: Long*): Map[Long, Array[Byte]] =
    Multimodal.syntheticPng(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  private def wavBytes(ids: Long*): Map[Long, Array[Byte]] =
    Multimodal.syntheticWav(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  private def gifBytes(ids: Long*): Map[Long, Array[Byte]] =
    Multimodal.syntheticGif(ids.toDF("doc_id"), frames = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  test("streamingMediaDedup(image): perceptual re-arrivals drop, undecodables dedup byte-exactly") {
    implicit val sqlCtx = spark.sqlContext
    val png = pngBytes(1L, 2L)
    val junk1 = "not an image".getBytes("UTF-8")
    val junk2 = "also not an image, differently".getBytes("UTF-8")
    val mem = MemoryStream[(Long, Array[Byte], Timestamp)]
    val out = Multimodal.streamingMediaDedup(
      mem.toDF().toDF("media_id", "content", "ts"), "image", "ts")
    val q = out.writeStream.format("memory").queryName("media_exact")
      .outputMode("append").start()
    try {
      mem.addData((1L, png(1L), ts(0)), (2L, png(2L), ts(1)),
        (3L, junk1, ts(2)))
      q.processAllAvailable()
      // batch 2: a byte-identical re-arrival of png(1) under a new id,
      // the SAME junk payload again, and a NEW junk payload
      mem.addData((4L, png(1L), ts(3)), (5L, junk1, ts(4)),
        (6L, junk2, ts(5)))
      q.processAllAvailable()
      val kept = spark.table("media_exact").select("media_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L, 6L),
        s"kept=$kept: 4 is a perceptual dup of 1, 5 a byte dup of 3")
    } finally q.stop()
  }

  test("streamingMediaDedup survivors are batch-cut invariant (content-set equality)") {
    implicit val sqlCtx = spark.sqlContext
    val png = pngBytes(1L, 2L, 3L)
    val rows = Seq(
      (1L, png(1L), ts(0)), (2L, png(2L), ts(1)), (3L, png(1L), ts(2)),
      (4L, png(3L), ts(3)), (5L, png(2L), ts(4)), (6L, png(3L), ts(5)))
    def run(batches: Seq[Seq[(Long, Array[Byte], Timestamp)]],
            name: String): Set[Long] = {
      val mem = MemoryStream[(Long, Array[Byte], Timestamp)]
      val q = Multimodal.streamingMediaDedup(
          mem.toDF().toDF("media_id", "content", "ts"), "image", "ts")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        // survivors compared by CONTENT hash: which of two same-batch
        // duplicates survives is arrival-order-arbitrary by contract
        spark.table(name).select(xxhash64(col("content")))
          .as[Long].collect().toSet
      } finally q.stop()
    }
    val oneBatch = run(Seq(rows), "media_cut_a")
    val threeBatches = run(rows.grouped(2).toSeq, "media_cut_b")
    val perRow = run(rows.map(Seq(_)), "media_cut_c")
    assert(oneBatch == threeBatches && threeBatches == perRow)
    assert(oneBatch.size == 3, "three distinct contents must survive")
  }

  test("streamingMediaNearDedup(audio): a near-dup clip (hamming 1..3) is dropped, distinct groups kept") {
    implicit val sqlCtx = spark.sqlContext
    // find a same-group pair (id, id+50) whose energy hashes differ by
    // 1..3 bits: near but NOT identical, so this pins the banded path,
    // not exact-key equality
    val cands = (0L until 50L).map(i => (i, i + 50L))
    val allIds = cands.flatMap(p => Seq(p._1, p._2))
    val wav = wavBytes(allIds: _*)
    def ham(a: Long, b: Long): Int = {
      val ha = Multimodal.energyHash63(wav(a))
      val hb = Multimodal.energyHash63(wav(b))
      java.lang.Long.bitCount(ha ^ hb)
    }
    val nearPair = cands.find { case (a, b) => (1 to 3).contains(ham(a, b)) }
    assert(nearPair.nonEmpty, "fixture yielded no same-group pair at hamming 1..3")
    val (a, b) = nearPair.get
    // a distinct-group clip far from `a` in hamming (> 3 so no
    // guaranteed band steal; require > 16 so probabilistic 16-bit band
    // collisions can't flake the test)
    val far = allIds.find(i => i != a && i != b && ham(a, i) > 16 && ham(b, i) > 16)
    assert(far.nonEmpty, "fixture yielded no far clip")

    val mem = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = Multimodal.streamingMediaNearDedup(
        mem.toDF().toDF("media_id", "content", "ts"), "audio", "ts",
        watermarkDelay = "5 seconds", windowDuration = "10 seconds")
      .writeStream.format("memory").queryName("media_near")
      .outputMode("append").start()
    try {
      mem.addData((1L, wav(a), ts(0)))
      q.processAllAvailable()
      mem.addData((2L, wav(b), ts(1)), (3L, wav(far.get), ts(2)))
      q.processAllAvailable()
      // flush: watermark must pass the [0,10s) window end
      mem.addData((99L, "flush".getBytes("UTF-8"), ts(60)))
      q.processAllAvailable()
      val kept = spark.table("media_near").select("media_id")
        .as[Long].collect().toSet.filter(_ != 99L)
      assert(kept == Set(1L, 3L),
        s"kept=$kept: 2 is hamming-${ham(a, b)} from 1 and must lose a band")
    } finally q.stop()
  }

  test("streamingVideoDedup: full frame-wise duplicates drop, distinct videos and junk pass") {
    implicit val sqlCtx = spark.sqlContext
    val gif = gifBytes(1L, 2L)
    val junk = "not a video".getBytes("UTF-8")
    val mem = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = Multimodal.streamingVideoDedup(
        mem.toDF().toDF("media_id", "content", "ts"), n = 4, tsCol = "ts",
        watermarkDelay = "5 seconds", windowDuration = "10 seconds")
      .writeStream.format("memory").queryName("video_dedup")
      .outputMode("append").start()
    try {
      mem.addData((1L, gif(1L), ts(0)), (2L, gif(2L), ts(1)),
        (3L, junk, ts(2)))
      q.processAllAvailable()
      mem.addData((4L, gif(1L), ts(3)), // every frame slot already owned by 1
        (5L, junk, ts(4))) // byte dup of 3's sentinel
      q.processAllAvailable()
      mem.addData((99L, "flush".getBytes("UTF-8"), ts(60)))
      q.processAllAvailable()
      val kept = spark.table("video_dedup").select("media_id")
        .as[Long].collect().toSet.filter(_ != 99L)
      assert(kept == Set(1L, 2L, 3L),
        s"kept=$kept: 4 owns no frame slot, 5 is a byte dup of 3")
    } finally q.stop()
  }
}
