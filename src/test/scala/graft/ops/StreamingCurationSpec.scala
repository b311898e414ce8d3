package graft.ops

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The curation pipeline on a STREAM: the quality gate and repetition
  * metrics are stateless whole-stage-codegen projections, so they
  * compose with Structured Streaming unchanged — an ingest topology
  * can gate/score documents in-flight and dedup within the watermark
  * before anything lands in the corpus. This spec pins that contract
  * (no "batch-only" regressions: an op that grows a shuffle or a
  * non-streamable node here would fail to start).
  */
class StreamingCurationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("qualityGate gates a document stream micro-batch by micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = Curation.qualityGate(docs, "text", "doc_id",
        minTokens = 5, minDistinctRatio = 0.45, maxDup2Frac = 0.5)
      .writeStream.format("memory").queryName("gate_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "a varied document with enough distinct words here"),
        (2L, "spam spam spam spam spam spam spam spam"))
      q.processAllAvailable()
      mem.addData((3L, "tiny"))
      q.processAllAvailable()
      val got = spark.table("gate_test")
        .select("doc_id", "keep", "failed_rules")
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
      assert(got(1L) == (true, ""))
      assert(!got(2L)._1 && got(2L)._2.contains("low_diversity"))
      assert(got(3L) == (false, "too_short"))
    } finally q.stop()
  }

  test("streamed gate verdicts match the batch gate on the same docs") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "dup dup dup dup dup dup"),
      (3L, ""),
      (4L, "plain words that are all different from each other"))
    val mem = MemoryStream[(Long, String)]
    val q = Curation.qualityGate(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", minTokens = 5)
      .writeStream.format("memory").queryName("gate_parity")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("gate_parity").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("keep"), r.getAs[String]("failed_rules"))).toMap
      val batch = Curation.qualityGate(rows.toDF("doc_id", "text"),
          "text", "doc_id", minTokens = 5).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("keep"), r.getAs[String]("failed_rules"))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming as-of enrichment matches the batch as-of join") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    // keyed feature snapshot: two versions for key 100, one for 200,
    // plus a null-ts row that must not leak into any event
    val snapshot = Seq(
      (100L, ts(1), 10.0), (100L, ts(3), 30.0), (200L, ts(4), 99.0),
      (100L, null.asInstanceOf[Timestamp], 666.0))
      .toDF("user_id", "ts", "v")
    val events = Seq(
      (1L, 100L, ts(5)),  // after both versions -> v=30
      (2L, 100L, ts(3)),  // equal ts -> inclusive -> v=30
      (3L, 100L, ts(2)),  // between -> v=10
      (4L, 100L, ts(0)),  // before any -> NULL
      (5L, 200L, ts(9)),  // other key -> v=99
      (6L, 999L, ts(9)))  // key absent from the snapshot -> NULL

    val mem = MemoryStream[(Long, Long, Timestamp)]
    val stream = mem.toDF().toDF("event_id", "user_id", "ts")
    val q = Asof.snapshotJoinBackward(stream, snapshot,
        Seq("user_id"), "ts", Seq("v"))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      mem.addData(events.take(3): _*)
      q.processAllAvailable()
      mem.addData(events.drop(3): _*) // across micro-batch cuts
      q.processAllAvailable()
      val streamed = spark.table("asof_stream")
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      // the batch as-of join on identical inputs is the contract
      val batch = Asof.joinBackward(events.toDF("event_id", "user_id", "ts"),
          snapshot, Seq("user_id"), "ts", Seq("v"))
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      assert(streamed == batch)
      assert(streamed == Map(1L -> Some(30.0), 2L -> Some(30.0),
        3L -> Some(10.0), 4L -> None, 5L -> Some(99.0), 6L -> None))
    } finally q.stop()
  }

  test("streaming as-of: tolerance and forward direction, batch-consistent") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val snapshot = Seq((100L, ts(1), 10.0), (100L, ts(3), 30.0))
      .toDF("user_id", "ts", "v")
    val events = Seq(
      (1L, 100L, ts(5)),   // backward tol 3s: r@3 inside; forward: NULL
      (2L, 100L, ts(10)),  // backward tol 3s: r@3 too stale -> NULL
      (3L, 100L, ts(0)))   // backward: nothing earlier; forward: r@1 ahead by 1s

    val mem = MemoryStream[(Long, Long, Timestamp)]
    val stream = mem.toDF().toDF("event_id", "user_id", "ts")
    val tolQ = Asof.snapshotJoinBackward(stream, snapshot,
        Seq("user_id"), "ts", Seq("v"), tolerance = Some("3 seconds"))
      .writeStream.format("memory").queryName("asof_tol_stream")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      tolQ.processAllAvailable()
      val got = spark.table("asof_tol_stream")
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      val batch = Asof.joinBackward(events.toDF("event_id", "user_id", "ts"),
          snapshot, Seq("user_id"), "ts", Seq("v"), tolerance = Some("3 seconds"))
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      assert(got == batch)
      assert(got == Map(1L -> Some(30.0), 2L -> None, 3L -> None))
    } finally tolQ.stop()

    val mem2 = MemoryStream[(Long, Long, Timestamp)]
    val fwdQ = Asof.snapshotJoinForward(mem2.toDF().toDF("event_id", "user_id", "ts"),
        snapshot, Seq("user_id"), "ts", Seq("v"))
      .writeStream.format("memory").queryName("asof_fwd_stream")
      .outputMode("append").start()
    try {
      mem2.addData(events: _*)
      fwdQ.processAllAvailable()
      val got = spark.table("asof_fwd_stream")
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      val batch = Asof.joinForward(events.toDF("event_id", "user_id", "ts"),
          snapshot, Seq("user_id"), "ts", Seq("v"))
        .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
      assert(got == batch)
      assert(got == Map(1L -> None, 2L -> None, 3L -> Some(10.0)))
    } finally fwdQ.stop()
  }
}
