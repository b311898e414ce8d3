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
}
