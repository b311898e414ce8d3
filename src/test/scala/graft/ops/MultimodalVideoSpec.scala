package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The video pillar's independent anchors, mirroring
  * MultimodalImageSpec with a frame axis: the multi-frame GIF
  * encode→decode path roundtrips every pixel of every frame exactly
  * (identity gray palette + lossless LZW), per-frame dHashes from
  * DECODED frames equal an analytic reimplementation that never
  * touches a codec (the same math the DuckDB oracle replays), frame
  * sampling picks evenly spaced source frames, undecodable payloads
  * degrade to zero rows, and the per-frame banded near-dedup pairs
  * behave.
  */
class MultimodalVideoSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val W = 36
  private val H = 32
  private val F = 8
  private val G = 50

  /** The syntheticGif pixel formula, standalone. */
  private def pixel(id: Long, f: Int, x: Int, y: Int): Int =
    (((id % G + 1) * (x + 3) * (y + 7) * (f + 11)) % 251 +
      (id * 31 + f * 13 + x * 7 + y * 3) % 5).toInt

  /** Analytic per-frame dHash — block means and bits derived from the
    * formula only, mirroring the oracle SQL; shares no code with the
    * operator's hash path.
    */
  private def analyticDHash(id: Long, f: Int): Long = {
    val m = Array.ofDim[Long](9, 8)
    for (y <- 0 until H; x <- 0 until W) m(x / 4)(y / 4) += pixel(id, f, x, y)
    var hash = 0L
    for (by <- 0 until 8; bx <- 0 until 8) {
      val b = by * 8 + bx
      if (b < 63 && m(bx)(by) / 16 < m(bx + 1)(by) / 16) hash |= 1L << b
    }
    hash
  }

  test("GIF encode->decode roundtrips every pixel of every frame exactly") {
    val ids = Seq(0L, 7L, 123L)
    val gifs = Multimodal.syntheticGif(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    ids.foreach { id =>
      val bytes = gifs(id)
      // a real GIF container, not a re-labeled buffer
      assert(bytes.take(3).map(_.toChar).mkString == "GIF")
      val frames = Multimodal.readFrames(bytes).get
      assert(frames.length == F, s"expected $F frames, got ${frames.length}")
      frames.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == W && img.getHeight == H)
        val raster = img.getRaster
        for (y <- 0 until H; x <- 0 until W)
          assert(raster.getSample(x, y, 0) == pixel(id, f, x, y),
            s"pixel mismatch id=$id f=$f x=$x y=$y")
      }
    }
  }

  test("videoFrameHashes samples evenly spaced frames with analytic hashes") {
    val ids = (0L until 30L).toSeq
    val rows = Multimodal.videoFrameHashes(
      Multimodal.syntheticGif(ids.toDF("doc_id")), n = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // n=4 of 8 frames -> source frames i*8/4 = {0, 2, 4, 6}
    assert(rows.keys.map(_._2).toSet == Set(0, 2, 4, 6))
    assert(rows.size == ids.size * 4)
    ids.foreach { id =>
      Seq(0, 2, 4, 6).foreach { f =>
        assert(rows((id, f)) == analyticDHash(id, f),
          s"frame hash mismatch id=$id f=$f")
      }
    }
    // bit 63 never set: sign-free for engines without unsigned 64-bit
    assert(rows.values.forall(_ >= 0L))
  }

  test("n >= frame count keeps every source frame; undecodable -> zero rows") {
    val gif = Multimodal.syntheticGif(Seq(1L).toDF("doc_id"))
      .select("content").as[Array[Byte]].head()
    val media = Seq(
      (1L, gif),
      (2L, "not a video at all".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "content")
    val out = Multimodal.videoFrameHashes(media, n = 99).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(out.count(_._1 == 1L) == F, "all 8 source frames when n >= count")
    assert(out.filter(_._1 == 1L).map(_._2).toSet == (0 until F).toSet)
    assert(!out.exists(_._1 != 1L), "undecodable payloads contribute no rows")
  }

  test("per-frame near-dedup pairs same-group videos within frame positions") {
    // ids 10 and 60 share a group (id % 50); 11 is a different group
    val ids = Seq(10L, 60L, 110L, 11L).toDF("doc_id")
    val pairs = Multimodal.videoFrameDuplicates(
      Multimodal.syntheticGif(ids), n = 4, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val within = pairs.filter(p => p._1 % G == p._2 % G)
    assert(within.nonEmpty, "same-group perturbed videos must pair")
    within.foreach { case (_, _, _, hm) => assert(hm <= 10) }
    // exact analytic cross-check of one (pair, frame)'s hamming
    pairs.find(p => p._1 == 10L && p._2 == 60L && p._3 == 2).foreach {
      case (_, _, f, hm) =>
        assert(hm == java.lang.Long.bitCount(
          analyticDHash(10L, f) ^ analyticDHash(60L, f)))
    }
  }
}
