package graft.sources

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.{CdcConfig, CdcPipeline}
import graft.operators.Partitioner

class WalSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  private def writeSegment(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))

  test("WalOffset json roundtrips, including quotes/backslashes in keys") {
    for (tbk <- Seq("700-123", """q"uo\te-1""", "")) {
      val o = WalOffset(42L, "700", tbk)
      assert(WalOffset.fromJson(o.json()) == o)
    }
    // round-1 checkpoint format still parses
    assert(WalOffset.fromJson("""{"lsn":7,"txn":"700","timeBasedKey":"700-0"}""") ==
      WalOffset(7L, "700", "700-0"))
    intercept[IllegalArgumentException](WalOffset.fromJson("""{"nope":1}"""))
  }

  test("segment line counts are cached by (path,size); readLines skips closed segments") {
    val dir = Files.createTempDirectory("graft_wal_cache").toString
    writeSegment(dir, "000.wal", Seq("a", "b", "c"))
    writeSegment(dir, "001.wal", Seq("d", "e"))
    assert(WalSource.countLines(dir) == 5)
    // tail segment grows → size changes → recount sees the new line
    writeSegment(dir, "001.wal", Seq("d", "e", "f"))
    assert(WalSource.countLines(dir) == 6)
    assert(WalSource.readLines(dir, 4, 6) == Seq("e", "f"))
  }

  test("wal source: LSN offsets, txn stamping across batches, commit acks") {
    val dir = Files.createTempDirectory("graft_wal").toString
    writeSegment(dir, "000.wal", Seq(
      "BEGIN 700",
      "table public.users: INSERT: id[integer]:1 name[text]:'a'",
      "table public.users: INSERT: id[integer]:2 name[text]:'b'",
      "COMMIT 700",
      "BEGIN 701",
      "table public.users: UPDATE: id[integer]:1 name[text]:'z'",
      "COMMIT 701"))

    val acks = new ArrayBuffer[Long]()
    WalSource.ackHooks.put(dir, lsn => acks.synchronized { acks += lsn })

    // 3 lines per trigger → stamping must survive micro-batch cuts
    val src = CdcPipeline.fromWalSource(spark, dir, maxLinesPerTrigger = Some(3))
    val out = CdcPipeline.transform(src,
      CdcConfig(partitionMethod = Partitioner.Transaction))
    val q = out.writeStream.format("memory").queryName("wal_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wal_test")
        .select("operation", "txn", "timeBasedKey", "walStart", "partitionKey")
        .collect()
      assert(rows.length == 7)
      // every DML row stamped with its enclosing BEGIN's txn
      val byOp = rows.groupBy(_.getString(0))
      assert(byOp("INSERT").map(_.getString(1)).toSet == Set("700"))
      assert(byOp("UPDATE").map(_.getString(1)).toSet == Set("701"))
      assert(rows.forall(r => r.getString(2) == r.getString(1) + "-0"))
      // LSNs are the 1-based global line numbers
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 7L))
      // partition key = txn
      assert(byOp("UPDATE").head.getString(4) == "701")
      // commits fire per completed batch, one batch behind (Spark
      // commits batch N's offset as batch N+1 starts) — a contiguous
      // prefix of the stream is acked, never more than written
      assert(acks.synchronized(acks.nonEmpty))
      assert(acks.synchronized(acks.max) >= 3L && acks.synchronized(acks.max) <= 7L)
      assert(acks.synchronized(acks.toSeq) == acks.synchronized(acks.toSeq.sorted))

      // new segment arrives → source picks it up, stamping continues
      writeSegment(dir, "001.wal", Seq(
        "BEGIN 702",
        "table public.users: DELETE: id[integer]:2",
        "COMMIT 702"))
      q.processAllAvailable()
      val rows2 = spark.table("wal_test").collect()
      assert(rows2.length == 10)
      assert(acks.synchronized(acks.max) >= 7L)
    } finally {
      q.stop()
      WalSource.ackHooks.remove(dir)
    }
  }
}
