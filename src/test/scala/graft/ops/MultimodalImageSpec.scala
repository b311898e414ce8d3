package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The image pillar's independent anchors: PNG encode→decode roundtrips
  * pixel-exactly, the dHash from DECODED bytes equals an analytic
  * reimplementation that never touches PNG (the same math the DuckDB
  * oracle replays), and the banded near-dedup pairs behave.
  */
class MultimodalImageSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val W = 36
  private val H = 32
  private val G = 50

  /** The syntheticPng pixel formula, standalone. */
  private def pixel(id: Long, x: Int, y: Int): Int =
    (((id % G + 1) * (x + 3) * (y + 7)) % 251 + (id * 31 + x * 7 + y * 3) % 5).toInt

  /** Analytic dHash — block means and bits derived from the formula
    * only, mirroring the oracle SQL; shares no code with dHash63.
    */
  private def analyticDHash(id: Long): Long = {
    val m = Array.ofDim[Long](9, 8)
    for (y <- 0 until H; x <- 0 until W) m(x / 4)(y / 4) += pixel(id, x, y)
    var hash = 0L
    for (by <- 0 until 8; bx <- 0 until 8) {
      val b = by * 8 + bx
      if (b < 63 && m(bx)(by) / 16 < m(bx + 1)(by) / 16) hash |= 1L << b
    }
    hash
  }

  test("PNG encode->decode roundtrips every pixel exactly") {
    val ids = Seq(0L, 1L, 7L, 49L, 123L, 499L)
    val pngs = Multimodal.syntheticPng(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(pngs.size == ids.size)
    ids.foreach { id =>
      val bytes = pngs(id)
      // a real PNG, not a re-labeled buffer
      assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      val gray = Multimodal.decodeGray(bytes).get
      assert(gray.length == W * H)
      for (y <- 0 until H; x <- 0 until W)
        assert(gray(y * W + x) == pixel(id, x, y),
          s"pixel mismatch id=$id x=$x y=$y")
    }
  }

  test("dHash from decoded PNG equals the analytic (oracle) dHash") {
    val ids = (0L until 60L).toSeq
    val hashed = Multimodal.imageDHash(Multimodal.syntheticPng(ids.toDF("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(hashed(id) == analyticDHash(id), s"dHash mismatch id=$id")
    }
    // bit 63 never set: the hash stays sign-free for engines without
    // unsigned 64-bit
    assert(hashed.values.forall(_ >= 0L))
  }

  test("undecodable payloads get NULL phash, decodable rows survive") {
    val rows = Seq(
      (1L, Multimodal.syntheticPng(Seq(1L).toDF("doc_id"))
        .select("content").as[Array[Byte]].head()),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, Array.emptyByteArray)).toDF("media_id", "content")
    val out = Multimodal.imageDHash(rows).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty && out(3L).isEmpty)
  }

  test("perceptual near-dedup pairs same-group perturbed images only") {
    // ids 10 and 60 share a group (id % 50); 11 is a different group
    val ids = Seq(10L, 60L, 110L, 11L).toDF("doc_id")
    val pairs = Multimodal.imagePhashDuplicates(
      Multimodal.syntheticPng(ids), maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val within = pairs.filter(p => p._1 % 50 == p._2 % 50)
    assert(within.nonEmpty, "same-group perturbed images must pair")
    within.foreach { case (_, _, hm) => assert(hm <= 10) }
    // exact analytic cross-check of one pair's hamming
    pairs.find(p => p._1 == 10L && p._2 == 60L).foreach { case (_, _, hm) =>
      assert(hm == java.lang.Long.bitCount(analyticDHash(10L) ^ analyticDHash(60L)))
    }
  }

  test("16-bit grayscale PNG decodes to the 8-bit domain, no task poison") {
    // TYPE_USHORT_GRAY samples go up to 65535; decodeGray's contract is
    // 8-bit luminance — a raw 16-bit sample once indexed a 16-bucket
    // histogram out of bounds and killed the task.
    val img = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val r = img.getRaster
    for (y <- 0 until 32; x <- 0 until 36)
      r.setSample(x, y, 0, (pixel(7L, x, y) << 8) | 0x5A) // 16-bit samples
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val gray = Multimodal.decodeGray(baos.toByteArray).get
    for (y <- 0 until 32; x <- 0 until 36)
      assert(gray(y * 36 + x) == pixel(7L, x, y), s"16-bit downshift x=$x y=$y")
    // and the full pipeline path survives it
    val hashed = Multimodal.imageDHash(
      Seq((1L, baos.toByteArray)).toDF("media_id", "content")).collect()
    assert(!hashed(0).isNullAt(1))
  }

  test("gray+alpha (2-band) PNG decodes via the gray band, alpha ignored") {
    import java.awt.image.{ComponentColorModel, DataBuffer, BufferedImage}
    val cs = java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY)
    val cm = new ComponentColorModel(
      cs, true, false, java.awt.Transparency.TRANSLUCENT, DataBuffer.TYPE_BYTE)
    val raster = cm.createCompatibleWritableRaster(36, 32)
    val img = new BufferedImage(cm, raster, false, null)
    for (y <- 0 until 32; x <- 0 until 36) {
      raster.setSample(x, y, 0, pixel(3L, x, y)) // gray
      raster.setSample(x, y, 1, 128 + (x + y) % 64) // alpha, must be ignored
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    assume(decoded.getRaster.getNumBands == 2, "writer produced gray+alpha")
    val gray = Multimodal.decodeGray(baos.toByteArray).get
    for (y <- 0 until 32; x <- 0 until 36)
      assert(gray(y * 36 + x) == pixel(3L, x, y), s"gray+alpha x=$x y=$y")
    val hashed = Multimodal.imageDHash(
      Seq((1L, baos.toByteArray)).toDF("media_id", "content")).collect()
    assert(!hashed(0).isNullAt(1))
  }

  test("truncated PNG degrades to NULL, not a poisoned task") {
    val whole = Multimodal.syntheticPng(Seq(9L).toDF("doc_id"))
      .select("content").as[Array[Byte]].head()
    val truncated = whole.take(whole.length / 3) // valid magic, cut body
    assert(Multimodal.decodeGray(truncated).isEmpty)
    val out = Multimodal.imageDHash(
      Seq((1L, truncated)).toDF("media_id", "content")).collect()
    assert(out(0).isNullAt(1))
  }

  test("extractFeatures: image kind decodes pixels; others keep byte stats") {
    val png = Multimodal.syntheticPng(Seq(5L).toDF("doc_id"))
      .select("content").as[Array[Byte]].head()
    val media = Seq(
      MediaRecord(1L, "image", png, W, H, 0, 0L),
      MediaRecord(2L, "audio", png, 0, 0, 16000, 100L)).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    // image histogram is over W*H luminance values from the analytic
    // pixels; recompute independently
    val counts = new Array[Double](16)
    for (y <- 0 until H; x <- 0 until W) counts(pixel(5L, x, y) >> 4) += 1.0
    val expect = counts.map(c => math.rint(c / (W * H) * 1e6) / 1e6).toSeq
    assert(f(1L).histogram.toSeq == expect)
    // audio kind with the same bytes takes the byte-stats fallback:
    // different histogram (PNG bytes, not pixels), same n_bytes
    assert(f(2L).n_bytes == f(1L).n_bytes)
    assert(f(2L).histogram.toSeq != f(1L).histogram.toSeq)
  }
}
