package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming._
import graft.operators.Partitioner
import graft.sources.{FileSlotAdmin, WalSource}

/** Library-user sample: slot admin → WAL segments → graft-wal source →
  * CDC pipeline → date-partitioned gzip sink, with acks observed.
  */
object E2EDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Files.createTempDirectory("graft_e2e").toString
    val admin = new FileSlotAdmin(base)
    println(s"[e2e] createSlot fresh=${admin.createSlot("slot1")} again=${admin.createSlot("slot1")}")
    val walDir = Paths.get(base, "slot1").toString

    Files.write(Paths.get(walDir, "000.wal"), Seq(
      "BEGIN 900",
      "table public.users: INSERT: id[integer]:1 name[text]:'it''s \"ann\"'",
      "table public.secrets: INSERT: id[integer]:1 key[text]:'k'",
      "this line is garbage and must be dropped by the parser",
      "table public.users: UPDATE: old-key: id[integer]:1 name[text]:'x' new-tuple: id[integer]:1 name[text]:unchanged-toast-datum",
      "COMMIT 900").mkString("\n").getBytes("UTF-8"))

    val acks = new scala.collection.mutable.ArrayBuffer[Long]()
    WalSource.ackHooks.put(walDir, l => acks.synchronized(acks += l))

    val cfg = CdcConfig(filterTables = Seq("public.secrets"), whitelist = false,
      partitionMethod = Partitioner.TableName)
    val out = Files.createTempDirectory("graft_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val q = CdcPipeline.toGzipFiles(
      CdcPipeline.transform(CdcPipeline.fromWalSource(spark, walDir, Some(4)), cfg)
        .where(col("json").isNotNull),
      out, ckpt, cfg).start()
    q.processAllAvailable()
    // second segment arrives while running
    Files.write(Paths.get(walDir, "001.wal"), Seq(
      "BEGIN 901",
      "table public.users: DELETE: id[integer]:1",
      "COMMIT 901").mkString("\n").getBytes("UTF-8"))
    q.processAllAvailable()
    q.stop()

    val files = Files.walk(Paths.get(out)).filter(_.toString.endsWith(".gz")).toArray
    println(s"[e2e] gz files: ${files.length}")
    val back = spark.read.text(out).collect().map(_.getString(0)).sorted
    back.foreach(l => println(s"[e2e] out: $l"))
    println(s"[e2e] acks: ${acks.synchronized(acks.toList)}")
    println(s"[e2e] rows=${back.length} (expect 3: insert+toast-update+delete; secrets filtered, garbage dropped)")
    admin.dropSlot("slot1")
    println(s"[e2e] slot dropped, dir exists=${Files.exists(Paths.get(walDir))}")
    spark.stop()
  }
}
