package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{MediaFixtures, Multimodal}

/** The streaming-media ENTRY queries (`q_dedup_streaming_media`,
  * `q_dedup_streaming_video`) must produce their order-invariant
  * contracts against the batch fingerprint path on a real sf
  * directory — the same invariants their DuckDB oracles assert
  * analytically, checked here against the batch operators instead:
  *
  *  - exact media dedup keeps exactly ONE representative per distinct
  *    perceptual hash (n_kept = 1 ∀ rows; hash set = batch dHash set);
  *  - frame-wise video dedup's survivors COVER exactly the corpus's
  *    distinct (frame_idx, phash) slots (first-arrival claimers always
  *    survive, so no slot is lost; survivors can't invent slots).
  */
class EntryStreamingMediaSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("q_dedup_streaming_media keeps one representative per perceptual hash") {
    val out = EntryQueries.qDedupStreamingMedia(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    assert(out.forall(_._2 == 1L), "a perceptual key was kept twice or lost")
    val batch = Multimodal.imageDHash(MediaFixtures.pngs(spark, dir))
      .select("phash").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == batch)
  }

  test("q_dedup_streaming_video survivors cover exactly the corpus frame-slot set") {
    val out = EntryQueries.qDedupStreamingVideo(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val batch = Multimodal.videoFrameHashes(MediaFixtures.gifs(spark, dir), n = 4)
      .select(col("frame_idx"), col("phash")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out == batch)
    assert(out.nonEmpty)
  }
}
