package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Partitioner

class CdcPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val cfg = CdcConfig(
    filterTables = Seq("public.passwords"),
    whitelist = false,
    partitionMethod = Partitioner.TableName)

  private val lines = Seq(
    "BEGIN 600",
    "table public.users: INSERT: id[integer]:1 name[text]:'ann'",
    "table public.passwords: INSERT: id[integer]:1 hash[text]:'x'",
    "table public.users: UPDATE: id[integer]:1 name[text]:'bob'",
    "COMMIT 600")

  test("batch transform: parse → filter → key → marshal in one plan") {
    val df = lines.toDF("line").withColumn("txn", lit("600"))
    val out = CdcPipeline.transform(df, cfg)
    val rows = out.select("operation", "table", "partitionKey", "json").collect()
    assert(rows.length == 4) // passwords dropped; BEGIN/COMMIT retained
    val ops = rows.map(_.getString(0)).toSeq
    assert(ops.count(_ == "INSERT") == 1 && ops.count(_ == "UPDATE") == 1)
    assert(rows.filter(r => r.getString(0) == "INSERT").forall(_.getString(2) == "public.users"))
    // BEGIN/COMMIT marshal to null json
    assert(rows.filter(r => r.getString(0) == "BEGIN").forall(_.isNullAt(3)))
    val insertJson = rows.find(_.getString(0) == "INSERT").get.getString(3)
    assert(insertJson.contains(""""table":"public.users""""))
    assert(insertJson.contains(""""name":{"new":{"v":"ann","t":"text","q":"true"}"""))
  }

  test("streaming micro-batches produce the same records as batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val streamDf = mem.toDF().withColumnRenamed("value", "line")
    val q = CdcPipeline.transform(streamDf, cfg)
      .writeStream.format("memory").queryName("cdc_test")
      .outputMode("append").start()
    try {
      mem.addData(lines.take(2): _*)
      q.processAllAvailable()
      mem.addData(lines.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("cdc_test").select("operation", "json").collect()
      assert(got.length == 4)
      val batch = CdcPipeline.transform(lines.toDF("line"), cfg)
        .select("operation", "json").collect()
      assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
        batch.map(r => (r.getString(0), r.getString(1))).toSet)
    } finally q.stop()
  }

  test("gzip file sink writes date-partitioned NDJSON") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s3").toString
    val df = CdcPipeline.transform(lines.toDF("line"), cfg)
    CdcPipeline.withDateColumns(df)
      .where(col("json").isNotNull)
      .select("json", "year", "month", "day", "hour")
      .write.partitionBy("year", "month", "day", "hour")
      .option("compression", "gzip")
      .mode("overwrite").text(dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.exists(_.getName.startsWith("year=")))
    val back = spark.read.text(dir)
    assert(back.count() == 2)
  }
}
