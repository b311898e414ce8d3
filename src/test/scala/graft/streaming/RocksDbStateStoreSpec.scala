package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{Dedup, Multimodal}

/** The streaming dedup family on the RocksDB state store — the
  * provider a real cluster runs at 100 TB, where dedup state (one key
  * per survivor inside the watermark horizon) cannot live on the JVM
  * heap the way the default HDFSBacked provider keeps it. The
  * operators themselves are provider-agnostic (plain
  * `dropDuplicatesWithinWatermark` + windowed aggregates), so this
  * spec pins two things: the queries RUN under
  * `RocksDBStateStoreProvider` (the rocksdbjni native load, state
  * encoding, and commit path all engage), and the kept sets are
  * IDENTICAL to the default provider's.
  */
class RocksDbStateStoreSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[A](provider: Option[String])(f: => A): A = {
    provider.foreach(spark.conf.set(ProviderKey, _))
    try f finally spark.conf.unset(ProviderKey)
  }

  private def ts(s: Int): Timestamp = new Timestamp(1700000000000L + s * 1000L)

  /** Run a streaming transform over `rows` in 3 micro-batches under
    * the given provider and collect a result projection.
    */
  private def run[A](rows: Seq[(Long, A, Timestamp)],
                     provider: Option[String], name: String,
                     transform: DataFrame => DataFrame,
                     project: DataFrame => Set[Long])
                    (implicit enc: org.apache.spark.sql.Encoder[(Long, A, Timestamp)]): Set[Long] =
    withProvider(provider) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, A, Timestamp)]
      val q = transform(mem.toDF().toDF("media_id", "payload", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rows.grouped(math.max(1, (rows.size + 2) / 3)).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
        project(spark.table(name))
      } finally q.stop()
    }

  test("streamingExactDedup is provider-invariant and runs on RocksDB") {
    val rows = Seq(
      (1L, "alpha doc", ts(0)), (2L, "beta doc", ts(1)),
      (3L, "alpha doc", ts(2)), (4L, "gamma doc", ts(3)),
      (5L, "beta doc", ts(4)), (6L, "alpha doc", ts(5)))
    def dedup(df: DataFrame): DataFrame =
      Dedup.streamingExactDedup(
        df.withColumnRenamed("payload", "text"), "text", "ts")
    def ids(t: DataFrame): Set[Long] =
      t.select("media_id").as[Long].collect().toSet
    val default = run(rows, None, "rocks_exact_default", dedup, ids)
    val rocks = run(rows, Some(RocksProvider), "rocks_exact_rocksdb", dedup, ids)
    assert(rocks == default)
    assert(rocks.size == 3, "three distinct texts must survive")
  }

  test("streamingMediaDedup(image) is provider-invariant and runs on RocksDB") {
    val png = Multimodal.syntheticPng(Seq(1L, 2L, 3L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rows = Seq(
      (1L, png(1L), ts(0)), (2L, png(2L), ts(1)), (3L, png(1L), ts(2)),
      (4L, png(3L), ts(3)), (5L, png(2L), ts(4)))
    def dedup(df: DataFrame): DataFrame =
      Multimodal.streamingMediaDedup(
        df.withColumnRenamed("payload", "content"), "image", "ts")
    // survivors compared by content hash: which same-batch duplicate
    // survives is arrival-order-arbitrary by contract
    def contents(t: DataFrame): Set[Long] =
      t.select(xxhash64(col("content"))).as[Long].collect().toSet
    val default = run(rows, None, "rocks_media_default", dedup, contents)
    val rocks = run(rows, Some(RocksProvider), "rocks_media_rocksdb", dedup, contents)
    assert(rocks == default)
    assert(rocks.size == 3, "three distinct images must survive")
  }

  test("streamingNearDedupBanded (2 stateful ops) is provider-invariant on RocksDB") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", ts(0)),
      (2L, "a completely different document about spark state stores", ts(1)),
      // token-identical reordering of doc 1: full-signature collision
      (3L, "the quick brown fox jumps over the lazy dog", ts(2)),
      (4L, "yet another unrelated text with its own shingles", ts(3)))
    def dedup(df: DataFrame): DataFrame =
      Dedup.streamingNearDedupBanded(
        df.withColumnRenamed("payload", "text"),
        "text", "media_id", "ts")
    def ids(t: DataFrame): Set[Long] = {
      // windowed append output: flush with a far-future row is not
      // needed because processAllAvailable + a later max ts would be;
      // instead read the windowed result after pushing a flush row
      t.select("media_id").as[Long].collect().toSet
    }
    // windowed aggregate needs the watermark past the window: append a
    // flush row an hour ahead in a final batch
    val flush = (99L, "flush row far in the future zzz", ts(3600))
    def runWith(provider: Option[String], name: String): Set[Long] =
      run(rows :+ flush, provider, name, dedup, ids)
    val default = runWith(None, "rocks_banded_default")
    val rocks = runWith(Some(RocksProvider), "rocks_banded_rocksdb")
    assert(rocks == default)
    assert(rocks == Set(1L, 2L, 4L),
      "doc 3 (full-signature dup of 1) must drop; flush row stays unflushed")
  }

  test("streamingSegmentDedup (2 stateful ops) is provider-invariant on RocksDB") {
    val rows = Seq(
      (1L, "a b c d", ts(0)), (2L, "c d e f", ts(1)),
      (3L, "a b c d", ts(2)), (4L, "e f g h", ts(3)),
      // flush sentinel: far-future ts closes every per-doc group;
      // negative id keeps it out of the projection
      (-1L, "flushsentinel unique tokens", ts(3600)))
    def dedup(df: DataFrame): DataFrame =
      Dedup.streamingSegmentDedup(
        df.withColumnRenamed("payload", "text")
          .withColumnRenamed("media_id", "doc_id"),
        "text", "doc_id", "ts", w = 2, sep = "\n")
    // kept segment SET is the order-invariant contract
    def segs(t: DataFrame): Set[Long] =
      t.filter(col("doc_id") >= 0)
        .select(explode(split(col("text_dedup"), "\n")).as("seg"))
        .select(xxhash64(col("seg"))).as[Long].collect().toSet
    val default = run(rows, None, "rocks_seg_default", dedup, segs)
    val rocks = run(rows, Some(RocksProvider), "rocks_seg_rocksdb", dedup, segs)
    assert(rocks == default)
    assert(rocks.size == 4, "distinct segments: a b, c d, e f, g h")
  }
}
