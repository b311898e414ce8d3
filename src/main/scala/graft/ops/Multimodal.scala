package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: media payloads are opaque binary columns with
  * typed metadata alongside — the schema contract for image/audio/video
  * at 100 TB scale (content stays binary until a worker-local decode).
  */
final case class MediaRecord(
    media_id: Long,
    kind: String, // image | audio | video
    content: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Long)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    byte_entropy: Double,
    histogram: Array[Double])

/** Multimodal column plumbing.
  *
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK, so the image
  * path decodes actual PNG/JPEG/BMP/GIF bytes to pixels
  * ([[extractFeatures]] pixel features, [[imageDHash]] perceptual
  * hashing, [[imagePhashDuplicates]] Hamming-banded near-dedup). AUDIO
  * decode is REAL for WAV/PCM: `javax.sound.sampled` also ships in the
  * JDK, so the audio path decodes actual WAV containers to 16-bit
  * samples ([[audioEnergyHash]] fingerprinting,
  * [[audioFingerprintDuplicates]] Hamming-banded near-dedup,
  * real-sample features in [[extractFeatures]]) — and for the other
  * JDK lossless-PCM containers AIFF and AU ([[syntheticAudio]]; the
  * decoder follows the container's declared endianness, so all three
  * hash bit-identically). MULTI-FRAME decode is REAL for animated GIF:
  * [[videoFrameHashes]] walks an `ImageReader` frame sequence and
  * perceptually hashes evenly-sampled frames — the video-shaped path.
  * Compressed audio (MP3/AAC/OGG) and true video codecs are not
  * available in this build environment, so those payloads fall back to
  * deterministic byte-level
  * statistics — the production shape stands for them too: binary
  * columns partition and spill like any other column; feature
  * extraction runs as a typed `mapPartitions` (one JVM-local pass per
  * partition, the same call pattern a JNI/FFI codec would use — swap
  * the body, keep the plumbing); frame sampling is pure Catalyst on
  * binary slices.
  */
object Multimodal {

  // ImageIO's default disk-backed stream cache serializes decodes on a
  // temp-file lock; executors decode from in-memory byte arrays, so the
  // cache only costs. Safe to set from any thread, idempotent.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic synthetic media derived from the documents table, so
    * the pipeline is testable without real assets: content bytes are
    * the doc text, kind/dims derived from the id.
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol), lit(4)) * 256 + 256).cast("int").as("width"),
      (pmod(col(idCol), lit(3)) * 256 + 256).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (length(col(textCol)) * 10).cast("long").as("duration_ms"))

  /** Feature extraction. IMAGE kind with decodable content (PNG/JPEG/
    * BMP/GIF via `javax.imageio`) gets REAL pixel features: the
    * histogram is over 16 luminance buckets of the decoded pixels and
    * the entropy is pixel-luminance entropy. Audio/video (and image
    * payloads ImageIO cannot parse, e.g. the text-byte synthetic media)
    * fall back to byte-histogram + byte-entropy — a clearly-marked stub
    * until those codecs exist in the environment. Typed mapPartitions
    * keeps per-partition setup (codec init, native buffers) amortized.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec setup would go here (ImageIO is static)
      it.map { m =>
        val bytes = if (m.content == null) Array.emptyByteArray else m.content
        val vals: Array[Int] =
          if (m.kind == "image") decodeGray(bytes).getOrElse(byteVals(bytes))
          else if (m.kind == "audio")
            // real decoded 16-bit samples, requantized to the 8-bit
            // histogram domain; non-WAV payloads fall back to byte stats
            decodePcm16(bytes).map(_.map(s => (s + 32768) >> 8))
              .getOrElse(byteVals(bytes))
          else byteVals(bytes)
        val hist = new Array[Double](16)
        var i = 0
        while (i < vals.length) { hist(vals(i) >> 4) += 1.0; i += 1 }
        val n = math.max(vals.length, 1)
        var entropy = 0.0
        var b = 0
        while (b < 16) {
          val p = hist(b) / n
          if (p > 0) entropy -= p * math.log(p) / math.log(2)
          hist(b) = hist(b) / n
          b += 1
        }
        MediaFeatures(m.media_id, m.kind, bytes.length.toLong,
          math.rint(entropy * 1e6) / 1e6, hist.map(h => math.rint(h * 1e6) / 1e6))
      }
    }
  }

  private def byteVals(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xFF; i += 1 }
    out
  }

  /** Per-pixel 8-bit luminance function for a raster, layout-aware:
    * 1 band = gray verbatim, 2 bands = gray + alpha (alpha ignored),
    * >=3 bands = integer ITU-R 601 luma over the first three bands.
    * Samples wider than 8 bits (e.g. TYPE_USHORT_GRAY, 16-bit PNG) are
    * down-shifted to the 8-bit domain so the documented "8-bit
    * luminance" contract holds for every decodable layout — indexing a
    * 16-value histogram with a raw 16-bit sample was an
    * ArrayIndexOutOfBounds task poison.
    */
  private def lumaFn(raster: java.awt.image.Raster): Array[Int] => Int = {
    val sm = raster.getSampleModel
    val bands = raster.getNumBands
    val sh = Array.tabulate(bands)(b => math.max(0, sm.getSampleSize(b) - 8))
    def c8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    if (bands <= 2) px => c8(px(0) >> sh(0))
    else px => (299 * c8(px(0) >> sh(0)) + 587 * c8(px(1) >> sh(1)) +
      114 * c8(px(2) >> sh(2))) / 1000
  }

  /** Image-aware luma selection: palette images (GIF, indexed BMP/PNG)
    * carry palette INDICES in their raster, not intensities — treating
    * an index as gray is only right when the palette happens to be an
    * identity gray ramp. Map each index through the color table to its
    * integer ITU-R 601 luma via a precomputed LUT; every other layout
    * takes the band-based raster path above.
    */
  private def lumaFnImg(img: java.awt.image.BufferedImage): Array[Int] => Int =
    img.getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val lut = Array.tabulate(icm.getMapSize)(i =>
          (299 * icm.getRed(i) + 587 * icm.getGreen(i) + 114 * icm.getBlue(i)) / 1000)
        // clamp: a malformed palette image whose raster sample exceeds
        // the palette size degrades one pixel, not the whole image
        px => lut(math.min(math.max(px(0), 0), lut.length - 1))
      case _ => lumaFn(img.getRaster)
    }

  /** Decode image bytes to row-major 8-bit luminance samples, or None
    * when the payload is not a parseable image. Reads the RASTER, not
    * `getRGB` — `getRGB` routes gray through an sRGB ColorModel whose
    * non-linear transfer curve would destroy exact roundtrips. Any
    * decode failure — malformed container, codec RuntimeException
    * (CMMException, IllegalArgumentException), exotic layout — degrades
    * to None per the NULL-not-poisoned-task contract.
    */
  private[ops] def decodeGray(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      if (bytes.length == 0) return None
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val luma = lumaFnImg(img)
        val out = new Array[Int](w * h)
        val px = new Array[Int](raster.getNumBands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.getPixel(x, y, px)
            out(y * w + x) = luma(px)
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic synthetic grayscale PNGs derived from an id column —
    * the image-fixture path. Pixel values are an analytic function of
    * (id, x, y) so an external engine can re-derive every pixel without
    * decoding anything, while Spark's consumers exercise the REAL
    * encode→decode path ([[imageDHash]] reads these bytes back through
    * `javax.imageio`). Images in the same `id % groups` class differ
    * only by a ±4 perturbation — perceptual near-duplicates with small
    * dHash Hamming distance; distinct classes differ structurally.
    *
    * pixel(id,x,y) = ((id%groups + 1)·(x+3)·(y+7)) mod 251
    *              + (id·31 + x·7 + y·3) mod 5            ∈ [0, 254]
    */
  def syntheticPng(
      docs: DataFrame, idCol: String = "doc_id",
      width: Int = 36, height: Int = 32, groups: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      val baos = new java.io.ByteArrayOutputStream(4096)
      it.map { id =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = (((id % groups + 1) * (x + 3) * (y + 7)) % 251 +
              (id * 31 + x * 7 + y * 3) % 5).toInt
            raster.setSample(x, y, 0, v)
            x += 1
          }
          y += 1
        }
        baos.reset()
        javax.imageio.ImageIO.write(img, "png", baos)
        (id, baos.toByteArray)
      }
    }.toDF("media_id", "content")
  }

  /** 63-bit difference hash (dHash) over REAL decoded image bytes:
    * decode via `javax.imageio`, area-average down to a 9×8 luminance
    * grid (integer math — block mean = floor(sum / area) so external
    * engines reproduce it exactly), then one bit per horizontally
    * adjacent pair: bit b = by·8+bx set iff m(bx,by) < m(bx+1,by),
    * b < 63 (the 64th comparison is dropped to keep the hash
    * sign-bit-free in engines without unsigned BIGINT). Rows whose
    * payload fails to decode or whose dimensions aren't grid multiples
    * get a NULL hash rather than a poisoned task.
    */
  def imageDHash(
      images: DataFrame, idCol: String = "media_id",
      contentCol: String = "content"): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ph = dHash63(if (bytes == null) Array.emptyByteArray else bytes)
          (id, if (ph == Long.MinValue) None else Some(ph))
        }
      }.toDF(idCol, "phash")
  }

  /** dHash of one image payload; Long.MinValue = undecodable sentinel
    * (not a reachable hash value — bit 63 is never set by construction).
    * Decode failures of any kind (IO, codec RuntimeExceptions, exotic
    * band layouts) return the sentinel rather than poisoning the task.
    */
  private[ops] def dHash63(bytes: Array[Byte]): Long = try {
    val img =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) Long.MinValue else dHash63Of(img)
  } catch { case scala.util.control.NonFatal(_) => Long.MinValue }

  /** dHash core over an already-decoded frame — shared by the
    * whole-image path above and the per-frame video path
    * ([[videoFrameHashes]]). Same sentinel convention.
    */
  private def dHash63Of(img: java.awt.image.BufferedImage): Long = try {
    val (w, h) = (img.getWidth, img.getHeight)
    if (w % 9 != 0 || h % 8 != 0) return Long.MinValue
    val (bw, bh) = (w / 9, h / 8)
    val raster = img.getRaster
    val luma = lumaFnImg(img)
    val m = Array.ofDim[Long](9, 8)
    if (raster.getNumBands == 1) {
      // row-wise reads for single-band rasters (gray PNG, indexed GIF):
      // one getSamples call per row instead of w per-pixel getPixel
      // calls — the per-call overhead dominated the per-frame hash
      val row = new Array[Int](w)
      val px = new Array[Int](1)
      var y = 0
      while (y < h) {
        raster.getSamples(0, y, w, 1, 0, row)
        var x = 0
        while (x < w) {
          px(0) = row(x)
          m(x / bw)(y / bh) += luma(px)
          x += 1
        }
        y += 1
      }
    } else {
      val px = new Array[Int](raster.getNumBands)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.getPixel(x, y, px)
          m(x / bw)(y / bh) += luma(px)
          x += 1
        }
        y += 1
      }
    }
    val area = bw.toLong * bh
    var hash = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val b = by * 8 + bx
        if (b < 63 && m(bx)(by) / area < m(bx + 1)(by) / area) hash |= 1L << b
        bx += 1
      }
      by += 1
    }
    hash
  } catch { case scala.util.control.NonFatal(_) => Long.MinValue }

  /** Perceptual near-duplicate image pairs: dHash each payload (real
    * decode), band the 63-bit hash into 4×16-bit LSH keys, pair within
    * buckets only, verify by Hamming distance. The same bucketed
    * not-all-pairs shape as SimHash text dedup — at 100 TB the band
    * join is the only shuffle and its width is (band, key, id, hash).
    */
  def imagePhashDuplicates(
      images: DataFrame, idCol: String = "media_id",
      contentCol: String = "content", maxHamming: Int = 10): DataFrame =
    hammingBandPairs(
      imageDHash(images, idCol, contentCol).where(col("phash").isNotNull),
      idCol, maxHamming)

  /** Hamming-banded pairing over a (id, phash) frame: band the 63-bit
    * hash into 4×16-bit LSH keys, pair within buckets only, verify by
    * exact Hamming distance. Shared by the image and audio perceptual
    * dedups — the same bucketed not-all-pairs shape as SimHash text
    * dedup; at 100 TB the band join is the only shuffle and its width
    * is (band, key, id, hash). `extraKeys` names columns of `hashed`
    * folded into the bucket key AND carried through the output (the
    * video path passes `frame_idx`, pairing hashes within each
    * source-frame position); the recall bound below applies per
    * extra-key group.
    *
    * RECALL BOUND (by design, not a bug): with 4 bands, a candidate
    * pair is only GUARANTEED to share a band when Hamming ≤ 3
    * (pigeonhole); pairs at distance 4..maxHamming are found
    * probabilistically — a pair differing in all four bands is missed.
    * This is the standard LSH recall/cost trade (more, narrower bands
    * raise recall and bucket sizes); the DuckDB oracles replay the SAME
    * banding so correctness checks are exact over the contract, and
    * deployments needing guaranteed recall at maxHamming=h should band
    * with h+1 bands.
    */
  private def hammingBandPairs(
      hashed: DataFrame, idCol: String, maxHamming: Int,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val bandExprs = (0 until 4).map(b =>
      shiftrightunsigned(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = hashed.select(
      Seq(col(idCol).as("id"), col("phash")) ++ extraKeys.map(col) :+
        posexplode(array(bandExprs: _*)): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandKey")
    val joinKeys = extraKeys ++ Seq("band", "bandKey")
    val a = banded.select(joinKeys.map(col) ++
      Seq(col("id").as("id_a"), col("phash").as("h_a")): _*)
    val b = banded.select(joinKeys.map(col) ++
      Seq(col("id").as("id_b"), col("phash").as("h_b")): _*)
    a.join(b, joinKeys)
      .where(col("id_a") < col("id_b"))
      .select((Seq("id_a", "id_b") ++ extraKeys ++ Seq("h_a", "h_b")).map(col): _*)
      .distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("hamming") <= maxHamming)
      .drop("h_a", "h_b")
  }

  /** Deterministic synthetic 16-bit PCM mono WAVs derived from an id
    * column — the audio-fixture path, the exact analogue of
    * [[syntheticPng]]: sample values are an integer-analytic function
    * of (id, i) so an external engine can re-derive every sample
    * without touching a codec, while Spark's consumers exercise the
    * REAL encode→decode path (`javax.sound.sampled.AudioSystem` writes
    * the WAV container here and reads it back in [[audioEnergyHash]];
    * PCM is lossless, so bit-exact recovery is required). Clips in the
    * same `id % groups` class differ only by a 0..8 per-sample
    * perturbation — perceptual near-duplicates with small
    * energy-envelope Hamming distance; distinct classes differ
    * structurally.
    *
    * sample(id,i) = ((id%groups + 1)·(i+3)·131) mod 60000
    *              + (id·31 + i·7) mod 9 − 30000   ∈ [−30000, 30007]
    */
  def syntheticWav(
      docs: DataFrame, idCol: String = "doc_id",
      sampleRate: Int = 16000, nSamples: Int = 2048,
      groups: Int = 50): DataFrame =
    syntheticAudio(docs, idCol, sampleRate, nSamples, groups, "wav")

  /** [[syntheticWav]] generalized over the JDK's lossless-PCM container
    * types: `wav` (RIFF, little-endian), `aiff` (big-endian), `au`
    * (big-endian). Same sample formula regardless of container, so the
    * SAME analytic oracle covers every variant — a decoded AIFF or AU
    * clip must hash bit-identically to its WAV twin. The PCM bytes are
    * laid out in the container's native endianness up front so
    * `AudioSystem.write` never resamples or converts.
    */
  def syntheticAudio(
      docs: DataFrame, idCol: String = "doc_id",
      sampleRate: Int = 16000, nSamples: Int = 2048,
      groups: Int = 50, container: String = "wav"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Validate eagerly on the driver, but capture only the String:
    // AudioFileFormat.Type is NOT Serializable, so the Type instance
    // must be re-resolved inside the mapPartitions body.
    val containerLc = container.toLowerCase match {
      case c @ ("wav" | "aiff" | "au") => c
      case other => throw new IllegalArgumentException(
        s"unsupported audio container '$other' (wav|aiff|au)")
    }
    val bigEndian = containerLc != "wav"
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      val fileType = containerLc match {
        case "wav"  => javax.sound.sampled.AudioFileFormat.Type.WAVE
        case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
        case _      => javax.sound.sampled.AudioFileFormat.Type.AU
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, bigEndian)
      it.map { id =>
        val pcm = new Array[Byte](nSamples * 2)
        var i = 0
        while (i < nSamples) {
          val s = (((id % groups + 1) * (i + 3) * 131) % 60000 +
            (id * 31 + i * 7) % 9 - 30000).toInt
          val (lo, hi) = if (bigEndian) (2 * i + 1, 2 * i) else (2 * i, 2 * i + 1)
          pcm(lo) = (s & 0xFF).toByte
          pcm(hi) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val baos = new java.io.ByteArrayOutputStream(pcm.length + 64)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        javax.sound.sampled.AudioSystem.write(ais, fileType, baos)
        (id, baos.toByteArray)
      }
    }.toDF("media_id", "content")
  }

  /** Audio container readers, resolved ONCE per JVM. Every
    * `AudioSystem.getAudioInputStream` call re-runs a ServiceLoader
    * provider scan for `AudioFileReader`s (`JDK13Services.getProviders`
    * does not cache), so per-payload container parsing paid a
    * classpath-scan dispatch tax per ROW. The provider list is
    * resolved through the same ServiceLoader source AudioSystem uses
    * (same readers, same order — first successful parse wins either
    * way), the JDK reader instances are stateless, and the lazy val
    * is per-JVM, so sharing it across tasks is safe.
    */
  @transient private lazy val audioReaders
      : List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Decode an audio payload to 16-bit signed samples, or None when it
    * is not a parseable 16-bit mono PCM stream (wrong container, wrong
    * encoding, compressed formats this environment has no codec for).
    * Endianness follows the container's declared format.
    */
  private[ops] def decodePcm16(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length == 0) return None
    // first reader that parses the container wins — AudioSystem's own
    // resolution semantics, minus its per-call provider re-scan; a
    // fresh ByteArrayInputStream per probe replaces its mark/reset
    var ais: javax.sound.sampled.AudioInputStream = null
    val rs = audioReaders.iterator
    while (ais == null && rs.hasNext) {
      val r = rs.next()
      ais =
        try r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch {
          // unsupported container for this reader, or a malformed one
          // throwing RuntimeExceptions from the format parser: try the
          // next reader, degrade to None per the decode contract
          case scala.util.control.NonFatal(_) => null
        }
    }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        if (fmt.isBigEndian)
          while (i < n) {
            out(i) = (((raw(2 * i) << 8) | (raw(2 * i + 1) & 0xFF)).toShort).toInt
            i += 1
          }
        else
          while (i < n) {
            out(i) = (((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toShort).toInt
            i += 1
          }
        Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally ais.close()
  }

  /** 63-bit energy-envelope difference hash over REAL decoded audio:
    * decode the WAV via `javax.sound.sampled`, split the samples into
    * 64 equal windows, compute each window's integer energy
    * Σ sample² (exact in 64-bit — 32 × 30008² ≪ 2⁶³), then one bit per
    * adjacent window pair: bit b set iff e(b) < e(b+1), b < 63 (the
    * 64th comparison is dropped to keep the hash sign-bit-free, same
    * convention as [[imageDHash]]). Rows whose payload fails to decode
    * or whose sample count isn't a multiple of 64 get a NULL hash.
    */
  def audioEnergyHash(
      audio: DataFrame, idCol: String = "media_id",
      contentCol: String = "content"): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ph = energyHash63(if (bytes == null) Array.emptyByteArray else bytes)
          (id, if (ph == Long.MinValue) None else Some(ph))
        }
      }.toDF(idCol, "phash")
  }

  /** Energy hash of one audio payload; Long.MinValue = undecodable
    * sentinel (bit 63 is never set by construction).
    */
  private[ops] def energyHash63(bytes: Array[Byte]): Long = {
    decodePcm16(bytes) match {
      case Some(s) if s.length >= 64 && s.length % 64 == 0 =>
        val win = s.length / 64
        val e = new Array[Long](64)
        var i = 0
        while (i < s.length) {
          e(i / win) += s(i).toLong * s(i)
          i += 1
        }
        var hash = 0L
        var b = 0
        while (b < 63) {
          if (e(b) < e(b + 1)) hash |= 1L << b
          b += 1
        }
        hash
      case _ => Long.MinValue
    }
  }

  /** Perceptual near-duplicate audio pairs: energy-hash each payload
    * (real WAV decode), then the shared Hamming-banded pairing —
    * bucketed, never all-pairs.
    */
  def audioFingerprintDuplicates(
      audio: DataFrame, idCol: String = "media_id",
      contentCol: String = "content", maxHamming: Int = 10): DataFrame =
    hammingBandPairs(
      audioEnergyHash(audio, idCol, contentCol).where(col("phash").isNotNull),
      idCol, maxHamming)

  /** Deterministic synthetic multi-frame (animated) GIFs derived from
    * an id column — the video-shaped fixture, extending the
    * [[syntheticPng]] pattern with a frame axis. Every frame's pixels
    * are an integer-analytic function of (id, f, x, y), the palette is
    * an identity 256-gray ramp, and GIF's LZW coding is lossless over
    * palette indices, so an external engine re-derives every pixel of
    * every frame without a codec while Spark consumers exercise a REAL
    * multi-frame container decode ([[videoFrameHashes]] reads the
    * frames back through an `ImageReader` sequence).
    *
    * pixel(id,f,x,y) = ((id%groups + 1)·(x+3)·(y+7)·(f+11)) mod 251
    *                 + (id·31 + f·13 + x·7 + y·3) mod 5     ∈ [0, 254]
    */
  def syntheticGif(
      docs: DataFrame, idCol: String = "doc_id",
      width: Int = 36, height: Int = 32, frames: Int = 8,
      groups: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      // identity gray ramp: palette index i -> (i,i,i), so the indices
      // the LZW coder preserves ARE the luminance values
      val ramp = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
      it.map { id =>
        val baos = new java.io.ByteArrayOutputStream(8192)
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < frames) {
            val img = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            // fill the backing byte buffer directly (row-major, stride
            // = width for this constructor) — ~9k setSample calls per
            // frame made this fixture the most expensive encode in the
            // bench suite
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            var y = 0
            while (y < height) {
              val rowBase = y * width
              var x = 0
              while (x < width) {
                val v = (((id % groups + 1) * (x + 3) * (y + 7) * (f + 11)) % 251 +
                  (id * 31 + f * 13 + x * 7 + y * 3) % 5).toInt
                data(rowBase + x) = v.toByte
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally {
          writer.dispose()
          ios.close()
        }
        (id, baos.toByteArray)
      }
    }.toDF("media_id", "content")
  }

  /** REAL frame extraction over multi-frame containers: decode the
    * payload's frame sequence through an `ImageReader` (the JDK ships a
    * multi-frame GIF reader; the same call shape covers any registered
    * sequence codec), sample `n` evenly spaced frames —
    * frame(i) = i·nFrames/k, k = min(n, nFrames), i < k — and dHash
    * each sampled frame. Output: one row per (media_id, frame_idx)
    * with the 63-bit perceptual hash; frame_idx is the SOURCE frame
    * number so downstream joins align on container positions.
    * Undecodable payloads or frames degrade to zero rows / dropped
    * frames per the NULL-not-poisoned-task contract. Decode runs in
    * `mapPartitions` (JVM-local, no shuffle); at 100 TB the only
    * shuffle is whatever the consumer does with the hashes.
    */
  def videoFrameHashes(
      media: DataFrame, n: Int, idCol: String = "media_id",
      contentCol: String = "content"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          readSampledFrames(
            if (bytes == null) Array.emptyByteArray else bytes, n) match {
            case Some(fs) =>
              fs.iterator.flatMap { case (src, img) =>
                val h = dHash63Of(img)
                if (h == Long.MinValue) Iterator.empty
                else Iterator((id, src, h))
              }
            case _ => Iterator.empty
          }
        }
      }.toDF(idCol, "frame_idx", "phash")
  }

  /** Per-frame perceptual near-dedup over multi-frame containers —
    * the video twin of [[imagePhashDuplicates]]: sample `n` evenly
    * spaced frames per payload ([[videoFrameHashes]]), then
    * Hamming-band candidate pairing WITHIN each source-frame position
    * (two videos are frame-f near-dups when their frame-f dHashes are
    * within `maxHamming`). Banding keys are (frame_idx, band,
    * bandKey), so candidate generation stays a bucketed equi-join —
    * never all-pairs — and scales exactly like the image path with the
    * frame axis folded into the shuffle key. Output: (id_a, id_b,
    * frame_idx, hamming), id_a < id_b.
    */
  def videoFrameDuplicates(
      media: DataFrame, n: Int, idCol: String = "media_id",
      contentCol: String = "content", maxHamming: Int = 10): DataFrame =
    hammingBandPairs(videoFrameHashes(media, n, idCol, contentCol),
      idCol, maxHamming, extraKeys = Seq("frame_idx"))

  /** Decode only the k = min(n, nFrames) evenly-sampled frames of a
    * multi-frame container — frame(i) = i·nFrames/k, the exact sampling
    * [[videoFrameHashes]] documents — or None when no registered reader
    * parses the payload or it holds no frames. The frame COUNT comes
    * from the reader's stream scan (`getNumImages(true)`: structure
    * parse only, no pixel decode), so an N-frame payload sampled at n
    * pays n LZW decodes instead of N — the sampled-frame hashers were
    * paying a 2× decode tax at n=4 over 8-frame fixtures, and the tax
    * grows with container length. A sampled frame that fails to decode
    * is dropped (not task-poisoning), matching the hashers' dropped-
    * frame contract; payloads whose frame STRUCTURE is unscannable
    * degrade to None like any undecodable payload.
    */
  private[ops] def readSampledFrames(
      bytes: Array[Byte], n: Int): Option[Vector[(Int, java.awt.image.BufferedImage)]] =
    try {
      if (bytes.length == 0 || n <= 0) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          // default setInput: seekForwardOnly=false, which
          // getNumImages(true) and the index-addressed reads need
          reader.setInput(iis)
          val total =
            try reader.getNumImages(true)
            catch { case scala.util.control.NonFatal(_) => -1 }
          if (total <= 0)
            // structure scan failed (truncated/corrupt container whose
            // frame count is unscannable): fall back to the sequential
            // prefix decode the pre-sampling path used, sampling over
            // the decodable prefix — damaged media keep their partial
            // frame hashes instead of degrading to None (r21 advisor).
            // Well-formed containers never take this branch, so the
            // fast path's decode count is unchanged.
            return readFrames(bytes).filter(_.nonEmpty).map { fs =>
              val nf = fs.length
              val k = math.min(n, nf)
              Vector.tabulate(k) { i => val src = i * nf / k; (src, fs(src)) }
            }
          val k = math.min(n, total)
          val out = Vector.newBuilder[(Int, java.awt.image.BufferedImage)]
          var i = 0
          while (i < k) {
            val src = i * total / k
            try out += ((src, reader.read(src)))
            catch { case scala.util.control.NonFatal(_) => () }
            i += 1
          }
          val v = out.result()
          if (v.isEmpty) None else Some(v)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode every frame of a multi-frame image container, or None when
    * no registered reader parses it. Frames that fail mid-sequence
    * truncate the result rather than poisoning the task.
    */
  private[ops] def readFrames(
      bytes: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
    try {
      if (bytes.length == 0) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val out = Vector.newBuilder[java.awt.image.BufferedImage]
          var i = 0
          var done = false
          while (!done) {
            // -1 = unknown count without a full scan: read until the
            // reader runs out instead of forcing a second pass
            try { out += reader.read(i); i += 1 }
            catch {
              case _: IndexOutOfBoundsException => done = true
              case scala.util.control.NonFatal(_) => done = true
            }
          }
          val v = out.result()
          if (v.isEmpty) None else Some(v)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  // -------- streaming twins of the media near-dedup family ----------
  //
  // The batch pairing paths above find duplicate PAIRS; the streaming
  // twins make the dedup DECISION at ingest — drop a later arrival
  // whose fingerprint collides with an earlier one inside the
  // watermark horizon — with the same machinery as the text path
  // (graft.ops.Dedup.streamingExactDedup / streamingNearDedupBanded):
  // state-backed dropDuplicatesWithinWatermark, bounded by the
  // horizon. Decode stays a stateless JVM-local mapPartitions pass, so
  // the fingerprinting composes with Structured Streaming unchanged.

  /** Append the 63-bit perceptual fingerprint of each payload as a
    * column while PRESERVING every other column — the streaming-
    * composable form of [[imageDHash]] / [[audioEnergyHash]] (whose
    * (id, phash) projection fits the batch pairing path). `kind`:
    * `image` (grid dHash) or `audio` (energy-envelope hash).
    * Undecodable payloads get a NULL hash. No shuffle; stateless.
    */
  def withPerceptualHash(
      media: DataFrame, kind: String,
      contentCol: String = "content", hashCol: String = "phash"): DataFrame = {
    val kindLc = kind.toLowerCase match {
      case s @ ("image" | "audio") => s
      case other => throw new IllegalArgumentException(
        s"unsupported media kind '$other' (image|audio)")
    }
    val schema = media.schema.add(hashCol,
      org.apache.spark.sql.types.LongType, nullable = true)
    val idx = media.schema.fieldIndex(contentCol)
    media.mapPartitions { it =>
      // resolve the hash fn INSIDE the task: eta-expanding a module
      // method at driver scope would capture the (non-serializable)
      // module instance in the closure
      val hashFn: Array[Byte] => Long =
        if (kindLc == "image") b => dHash63(b) else b => energyHash63(b)
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val h = hashFn(if (bytes == null) Array.emptyByteArray else bytes)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+
          (if (h == Long.MinValue) null else java.lang.Long.valueOf(h)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Streaming perceptual-exact media dedup — the media twin of
    * [[graft.ops.Dedup.streamingExactDedup]]: drop later arrivals
    * whose payload fingerprints identically within the watermark
    * horizon. The state key is (decodable, coalesce(phash,
    * xxhash64(content))): decodable payloads dedup by perceptual hash
    * (re-encoded pixel-identical copies collapse), undecodable ones
    * degrade to byte-exact dedup in a disjoint keyspace instead of all
    * collapsing onto one NULL key. One stateful operator; rows emit
    * immediately; state is one key per survivor, horizon-bounded.
    */
  def streamingMediaDedup(
      media: DataFrame, kind: String, tsCol: String,
      contentCol: String = "content",
      watermarkDelay: String = "10 minutes"): DataFrame =
    withPerceptualHash(media, kind, contentCol, "__phash")
      .withColumn("__dk", struct(
        col("__phash").isNotNull.as("dec"),
        coalesce(col("__phash"), xxhash64(col(contentCol))).as("k")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__dk")
      .drop("__phash", "__dk")

  /** Streaming banded media NEAR-dedup — the media twin of
    * [[graft.ops.Dedup.streamingNearDedupBanded]], banding the 63-bit
    * fingerprint into the SAME 4×16-bit keys as the batch pairing
    * ([[imagePhashDuplicates]] / [[audioFingerprintDuplicates]]): the
    * first arrival owns each (band, key); a document survives iff it
    * owns ALL 4 of its bands, so any band stolen by an earlier doc —
    * guaranteed whenever Hamming ≤ 3 (pigeonhole over 4 bands),
    * probabilistic above, the batch paths' documented recall bound —
    * drops it. Transitivity matches the batch cluster rule: a dropped
    * doc still owns its non-stolen bands, catching later docs that
    * collide with those. Undecodable payloads band a byte hash keyed
    * in a disjoint (`__dec` = false) keyspace — byte-exact degrade.
    * Two stateful operators (band dedup, then windowed ownership
    * count): kept rows emit when the watermark passes their
    * `windowDuration` window. State: one row per live band key + one
    * per open (window, doc), both horizon-bounded.
    */
  def streamingMediaNearDedup(
      media: DataFrame, kind: String, tsCol: String,
      idCol: String = "media_id", contentCol: String = "content",
      watermarkDelay: String = "10 minutes",
      windowDuration: String = "1 minute"): DataFrame = {
    val hashed = withPerceptualHash(media, kind, contentCol, "__phash")
      .withColumn("__k", coalesce(col("__phash"), xxhash64(col(contentCol))))
      .withColumn("__dec", col("__phash").isNotNull)
    val bandExprs = (0 until 4).map(b =>
      shiftrightunsigned(col("__k"), b * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = hashed
      .select(col("*"), posexplode(array(bandExprs: _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bandKey")
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__dec", "__band", "__bandKey")
    val payload = media.columns.filter(_ != idCol).toSeq
    val aggs = count(lit(1)).as("__owned") +:
      payload.map(c => first(col(c)).as(c))
    banded
      .groupBy(window(col(tsCol), windowDuration), col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .where(col("__owned") === 4)
      .select(media.columns.map(col).toSeq: _*)
  }

  /** Column-preserving frame fingerprints for the streaming video
    * path: explode each payload into one row per sampled frame
    * (same even sampling as [[videoFrameHashes]]) carrying
    * `__frame_idx` (source frame number) and `__frame_phash` (63-bit
    * dHash, NULL when the frame fails to hash). Undecodable payloads
    * emit ONE sentinel row (`__frame_idx` = −1, NULL hash) so they
    * pass through downstream dedup instead of vanishing.
    */
  private[ops] def withFrameHashes(
      media: DataFrame, n: Int, contentCol: String = "content"): DataFrame = {
    val schema = media.schema
      .add("__frame_idx", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("__frame_phash", org.apache.spark.sql.types.LongType, nullable = true)
    val idx = media.schema.fieldIndex(contentCol)
    media.mapPartitions { it =>
      it.flatMap { r =>
        val bytes0 = r.getAs[Array[Byte]](idx)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        readSampledFrames(bytes, n) match {
          case Some(fs) =>
            fs.iterator.map { case (src, img) =>
              val h = dHash63Of(img)
              org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(src,
                if (h == Long.MinValue) null else java.lang.Long.valueOf(h)))
            }
          case _ => Iterator(
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(-1, null)))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Streaming frame-wise video dedup: a video is dropped when EVERY
    * one of its sampled frame hashes was already claimed at the same
    * source-frame position by an earlier video inside the watermark
    * horizon — i.e. only full frame-wise duplicates (the Hamming-0
    * diagonal of [[videoFrameDuplicates]]) are dropped; a video that
    * owns ANY new frame position survives. First arrival owns each
    * (frame_idx, hash) slot; survivors are videos owning ≥ 1 slot.
    * Undecodable payloads degrade to byte-exact dedup via their
    * sentinel row. Emits when the watermark passes the window.
    */
  def streamingVideoDedup(
      media: DataFrame, n: Int, tsCol: String,
      idCol: String = "media_id", contentCol: String = "content",
      watermarkDelay: String = "10 minutes",
      windowDuration: String = "1 minute"): DataFrame = {
    val framed = withFrameHashes(media, n, contentCol)
      .withColumn("__fk",
        coalesce(col("__frame_phash"), xxhash64(col(contentCol))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__frame_idx", "__fk")
    val payload = media.columns.filter(_ != idCol).toSeq
    val aggs = count(lit(1)).as("__owned") +:
      payload.map(c => first(col(c)).as(c))
    framed
      .groupBy(window(col(tsCol), windowDuration), col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(media.columns.map(col).toSeq: _*)
  }

  /** Sample `n` evenly spaced fixed-size "frames" from the binary
    * payload — pure Catalyst (binary substring), no decode. Output:
    * one row per (media_id, frame_idx) with the frame bytes.
    */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int = 64): DataFrame = {
    val len = length(col("content"))
    val step = greatest((len / n).cast("int"), lit(1))
    media.select(col("media_id"), col("kind"),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => col("content").substr(i * step + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .where(length(col("frame_bytes")) > 0)
  }
}
