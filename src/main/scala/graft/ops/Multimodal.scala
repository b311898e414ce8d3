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
  * The decode step is a STUB: real codec libraries (JPEG/PNG/audio)
  * are not available in this build environment, so `extractFeatures`
  * computes deterministic byte-level statistics instead of pixel/sample
  * decoding. Everything around the stub is the real production shape:
  * binary columns partition and spill like any other column; feature
  * extraction runs as a typed `mapPartitions` (one JVM-local pass per
  * partition, the same call pattern a JNI/FFI codec would use — swap
  * the body, keep the plumbing); frame sampling is pure Catalyst on
  * binary slices.
  */
object Multimodal {

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

  /** STUB DECODE: byte-histogram + entropy instead of real pixel/sample
    * features. Typed mapPartitions keeps per-partition setup (codec
    * init, native buffers) amortized — the real decoder drops in here.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" setup would go here
      it.map { m =>
        val bytes = if (m.content == null) Array.emptyByteArray else m.content
        val hist = new Array[Double](16)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xFF) >> 4) += 1.0
          i += 1
        }
        val n = math.max(bytes.length, 1)
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
