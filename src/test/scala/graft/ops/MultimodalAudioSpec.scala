package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The audio pillar's independent anchors, mirroring
  * MultimodalImageSpec: the WAV encode→decode path roundtrips every
  * 16-bit sample exactly (PCM is lossless), the energy hash from
  * DECODED bytes equals an analytic reimplementation that never touches
  * a codec (the same math the DuckDB oracle replays), undecodable
  * payloads degrade to NULL, and the banded near-dedup pairs behave.
  */
class MultimodalAudioSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 2048
  private val G = 50

  /** The syntheticWav sample formula, standalone. */
  private def sample(id: Long, i: Int): Int =
    (((id % G + 1) * (i + 3) * 131) % 60000 + (id * 31 + i * 7) % 9 - 30000).toInt

  /** Analytic energy hash — window energies and bits derived from the
    * formula only, mirroring the oracle SQL; shares no code with
    * energyHash63.
    */
  private def analyticEnergyHash(id: Long): Long = {
    val e = new Array[Long](64)
    for (i <- 0 until N) e(i / (N / 64)) += sample(id, i).toLong * sample(id, i)
    var hash = 0L
    for (b <- 0 until 63) if (e(b) < e(b + 1)) hash |= 1L << b
    hash
  }

  test("WAV encode->decode roundtrips every sample exactly") {
    val ids = Seq(0L, 1L, 7L, 49L, 123L, 499L)
    val wavs = Multimodal.syntheticWav(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(wavs.size == ids.size)
    ids.foreach { id =>
      val bytes = wavs(id)
      // a real RIFF/WAVE container, not a re-labeled buffer
      assert(bytes.take(4).map(_.toChar).mkString == "RIFF")
      assert(bytes.slice(8, 12).map(_.toChar).mkString == "WAVE")
      val pcm = Multimodal.decodePcm16(bytes).get
      assert(pcm.length == N)
      for (i <- 0 until N)
        assert(pcm(i) == sample(id, i), s"sample mismatch id=$id i=$i")
    }
  }

  test("energy hash from decoded WAV equals the analytic (oracle) hash") {
    val ids = (0L until 60L).toSeq
    val hashed = Multimodal.audioEnergyHash(Multimodal.syntheticWav(ids.toDF("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(hashed(id) == analyticEnergyHash(id), s"energy hash mismatch id=$id")
    }
    // bit 63 never set: sign-free for engines without unsigned 64-bit
    assert(hashed.values.forall(_ >= 0L))
  }

  test("undecodable payloads get NULL hash, decodable rows survive") {
    val wav = Multimodal.syntheticWav(Seq(1L).toDF("doc_id"))
      .select("content").as[Array[Byte]].head()
    val rows = Seq(
      (1L, wav),
      (2L, "not audio at all".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      // a real WAV whose sample count is not a multiple of 64
      (4L, wav.dropRight(2 * 37))).toDF("media_id", "content")
    val out = Multimodal.audioEnergyHash(rows).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty && out(3L).isEmpty)
    assert(out(4L).isEmpty, "truncated WAV must degrade to NULL, not a skewed hash")
  }

  test("perceptual near-dedup pairs same-group perturbed clips only") {
    // ids 10 and 60 share a group (id % 50); 11 is a different group
    val ids = Seq(10L, 60L, 110L, 11L).toDF("doc_id")
    val pairs = Multimodal.audioFingerprintDuplicates(
      Multimodal.syntheticWav(ids), maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val within = pairs.filter(p => p._1 % G == p._2 % G)
    assert(within.nonEmpty, "same-group perturbed clips must pair")
    within.foreach { case (_, _, hm) => assert(hm <= 10) }
    // exact analytic cross-check of one pair's hamming
    pairs.find(p => p._1 == 10L && p._2 == 60L).foreach { case (_, _, hm) =>
      assert(hm == java.lang.Long.bitCount(
        analyticEnergyHash(10L) ^ analyticEnergyHash(60L)))
    }
  }

  test("AIFF and AU containers hash bit-identically to the WAV twin") {
    val ids = (0L until 40L).toSeq
    def hashes(container: String): Map[Long, Long] =
      Multimodal.audioEnergyHash(
        Multimodal.syntheticAudio(ids.toDF("doc_id"), container = container))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wav = hashes("wav")
    val aiff = hashes("aiff")
    val au = hashes("au")
    ids.foreach { id =>
      assert(wav(id) == analyticEnergyHash(id), s"wav hash mismatch id=$id")
      assert(aiff(id) == wav(id), s"aiff hash != wav twin id=$id")
      assert(au(id) == wav(id), s"au hash != wav twin id=$id")
    }
  }

  test("AIFF/AU are real containers whose PCM roundtrips exactly") {
    val ids = Seq(0L, 7L, 123L)
    def bytesOf(container: String): Map[Long, Array[Byte]] =
      Multimodal.syntheticAudio(ids.toDF("doc_id"), container = container)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val aiff = bytesOf("aiff")
    val au = bytesOf("au")
    ids.foreach { id =>
      // genuine container magics, not re-labeled buffers
      assert(aiff(id).take(4).map(_.toChar).mkString == "FORM")
      assert(aiff(id).slice(8, 12).map(_.toChar).mkString == "AIFF")
      assert(au(id).take(4).map(_.toChar).mkString == ".snd")
      Seq(aiff(id), au(id)).foreach { bytes =>
        val pcm = Multimodal.decodePcm16(bytes).get
        assert(pcm.length == N)
        for (i <- 0 until N)
          assert(pcm(i) == sample(id, i), s"sample mismatch id=$id i=$i")
      }
    }
    intercept[IllegalArgumentException] {
      Multimodal.syntheticAudio(ids.toDF("doc_id"), container = "mp3")
    }
  }

  test("extractFeatures: audio kind with WAV payload decodes real samples") {
    val wav = Multimodal.syntheticWav(Seq(5L).toDF("doc_id"))
      .select("content").as[Array[Byte]].head()
    val media = Seq(
      MediaRecord(1L, "audio", wav, 0, 0, 16000, 128L),
      MediaRecord(2L, "video", wav, 0, 0, 16000, 128L)).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    // audio histogram is over the requantized decoded samples;
    // recompute independently from the analytic formula
    val counts = new Array[Double](16)
    for (i <- 0 until N) counts(((sample(5L, i) + 32768) >> 8) >> 4) += 1.0
    val expect = counts.map(c => math.rint(c / N * 1e6) / 1e6).toSeq
    assert(f(1L).histogram.toSeq == expect)
    // video kind with the same bytes keeps the byte-stats fallback
    assert(f(2L).histogram.toSeq != f(1L).histogram.toSeq)
  }
}
