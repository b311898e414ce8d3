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
        // null-SAFE inequality: a NULL on one side must count as a
        // mismatch, not evaluate to NULL and slip past the filter
        val bad = joined.where(
          col("media_id").isNull || col("lid").isNull ||
            !(col("content") <=> col("lcontent"))).count()
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

  test("a nested tmp dir inside an installed cache is scrubbed on access") {
    // RawLocalFileSystem's rename fallback can copy a losing builder's
    // tmp INSIDE the winner's dataset; the next access must scrub it
    // (and the row count must come back right, not doubled)
    spark.conf.set("spark.graft.media.dir", freshRoot())
    try {
      val expected = MediaFixtures.table(spark, sfDir, "png").count()
      val dest = MediaFixtures.cachePath(spark, sfDir, "png")
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val nested = new org.apache.hadoop.fs.Path(dest, "png.parquet.tmp.loser")
      fs.mkdirs(nested)
      fs.createNewFile(new org.apache.hadoop.fs.Path(nested, "part-junk"))
      assert(MediaFixtures.table(spark, sfDir, "png").count() == expected)
      assert(!fs.exists(nested), "nested tmp dir survived the scrub")
    } finally spark.conf.unset("spark.graft.media.dir")
  }

  test("a superseded fingerprint for the same (source, kind) is GC'd on install") {
    val root = freshRoot()
    spark.conf.set("spark.graft.media.dir", root)
    try {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sfName = new org.apache.hadoop.fs.Path(sfDir).getName
      val stale = new org.apache.hadoop.fs.Path(root, s"$sfName-png-deadbeef0000")
      fs.mkdirs(new org.apache.hadoop.fs.Path(stale, "png.parquet"))
      val otherKind = new org.apache.hadoop.fs.Path(root, s"$sfName-gif-deadbeef0000")
      fs.mkdirs(otherKind)
      assert(MediaFixtures.table(spark, sfDir, "png").count() > 0)
      assert(!fs.exists(stale), "superseded png cache dir survived the GC")
      assert(fs.exists(otherKind), "GC crossed kinds")
      assert(fs.exists(MediaFixtures.cachePath(spark, sfDir, "png")))
    } finally spark.conf.unset("spark.graft.media.dir")
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
