package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The materialized-media contract: the parquet cache is BYTE-identical
  * to in-plan synthesis for every kind (so swapping the queries onto
  * [[MediaFixtures]] cannot move an oracle), the cache is built once
  * and re-read after, the fingerprint tracks the source table's file
  * listing (regenerating testdata re-keys the cache), and the
  * materialize=false escape restores in-plan synthesis.
  */
class MediaFixturesSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def freshRoot(): String =
    Files.createTempDirectory("graft_media_spec").toString

  test("materialized bytes are identical to in-plan synthesis, per kind") {
    spark.conf.set("spark.graft.media.dir", freshRoot())
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      MediaFixtures.Kinds.foreach { kind =>
        val cached = MediaFixtures.table(spark, sfDir, kind)
        val live = MediaFixtures.synthesize(docs, kind)
          .withColumnsRenamed(Map("media_id" -> "lid", "content" -> "lcontent"))
        val joined = cached.join(live, col("media_id") === col("lid"), "full")
        val bad = joined.where(
          col("media_id").isNull || col("lid").isNull ||
            col("content") =!= col("lcontent")).count()
        assert(bad == 0, s"$kind: $bad rows differ between cache and synthesis")
        val n = cached.count()
        assert(n == docs.count(), s"$kind: cache has $n rows")
      }
    } finally spark.conf.unset("spark.graft.media.dir")
  }

  test("second call reads the cache without rebuilding it") {
    spark.conf.set("spark.graft.media.dir", freshRoot())
    try {
      val dest = MediaFixtures.cachePath(spark, sfDir, "png")
      MediaFixtures.table(spark, sfDir, "png").count()
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stamp = fs.getFileStatus(dest).getModificationTime
      val n = MediaFixtures.table(spark, sfDir, "png").count()
      assert(n > 0)
      assert(fs.getFileStatus(dest).getModificationTime == stamp,
        "cache directory was rewritten on the second call")
    } finally spark.conf.unset("spark.graft.media.dir")
  }

  test("fingerprint tracks the source listing and the kind") {
    val a = MediaFixtures.fingerprint(spark, sfDir, "png")
    assert(a == MediaFixtures.fingerprint(spark, sfDir, "png"), "not stable")
    assert(a != MediaFixtures.fingerprint(spark, sfDir, "gif"), "kind ignored")
    // a copy of the source table with a different mtime/len listing
    // must address a DIFFERENT cache directory
    val alt = Files.createTempDirectory("graft_media_src").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(5)
    docs.write.parquet(s"$alt/documents.parquet")
    assert(MediaFixtures.fingerprint(spark, alt, "png") != a,
      "source listing ignored")
  }

  test("materialize=false falls back to in-plan synthesis") {
    spark.conf.set("spark.graft.media.dir", freshRoot())
    spark.conf.set("spark.graft.media.materialize", "false")
    try {
      val dest = MediaFixtures.cachePath(spark, sfDir, "wav")
      val n = MediaFixtures.table(spark, sfDir, "wav").count()
      assert(n > 0)
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(dest), "materialize=false still wrote a cache")
    } finally {
      spark.conf.unset("spark.graft.media.materialize")
      spark.conf.unset("spark.graft.media.dir")
    }
  }
}
