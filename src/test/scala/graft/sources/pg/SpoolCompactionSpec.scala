package graft.sources.pg

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WalSource

/** Spool compaction: a long-running receiver bounds disk by deleting
  * fully-acked whole segments and folding their line count into the idx
  * `@base` header. Offsets stay global (line N keeps meaning "the Nth
  * line ever spooled"), so checkpointed restarts replay correctly from
  * any offset at or past the base.
  */
class SpoolCompactionSpec extends AnyFunSuite {

  private def client() =
    new PgReplicationClient("127.0.0.1", 1, "u", "db", None,
      statusIntervalMillis = 100L, readPollMillis = 20)

  private def dir(): String =
    Files.createTempDirectory("graft_spool_compact").toString

  private def write(d: String, name: String, content: String): Unit =
    Files.write(Paths.get(d, name), content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  private def readFile(d: String, name: String): String =
    new String(Files.readAllBytes(Paths.get(d, name)), "UTF-8")

  /** 5 receiver-named segments x 10 lines, idx entry i = 0x1000 + 16i. */
  private def spool50(d: String): Unit = {
    (0 until 5).foreach { s =>
      val body = (0 until 10).map(i => s"line ${s * 10 + i}\n").mkString
      write(d, f"${s * 10}%012d.wal", body)
    }
    write(d, ".wal.idx",
      (0 until 50).map(i => java.lang.Long.toHexString(0x1000L + i * 0x10L) + "\n").mkString)
  }

  test("acked whole segments are compacted; base persisted; offsets stay global") {
    val d = dir()
    spool50(d)
    val c = client()
    val r = new PgWalReceiver(() => c, d, 10, 0, 2)
    r.ackLines(35) // 35 acked lines >= 2 segments' worth -> auto-compact
    assert(c.currentAckLsn == 0x1000L + 34 * 0x10L)

    assert(r.compactedLines == 30) // segments 0..2 fully below 35
    assert(!new File(d, f"${0}%012d.wal").exists())
    assert(!new File(d, f"${10}%012d.wal").exists())
    assert(!new File(d, f"${20}%012d.wal").exists())
    assert(new File(d, f"${30}%012d.wal").exists())
    assert(readFile(d, ".wal.idx").startsWith("@30\n"))
    assert(readFile(d, ".wal.idx").linesIterator.size == 21) // header + 20 entries

    // the source's global arithmetic is unchanged by compaction
    assert(WalSource.compactedBase(d) == 30)
    assert(WalSource.countLines(d) == 50)
    assert(WalSource.readLines(d, 30, 50) == (30 until 50).map(i => s"line $i"))
    assert(WalSource.readLines(d, 42, 44) == Seq("line 42", "line 43"))
    // reading below the base is an explicit error, not silent garbage
    val e = intercept[IllegalStateException](WalSource.readLines(d, 10, 20))
    assert(e.getMessage.contains("compacted base"))

    // acks keep translating through the surviving suffix
    r.ackLines(45)
    assert(c.currentAckLsn == 0x1000L + 44 * 0x10L)
    assert(r.spoolDepth == 5)
  }

  test("restart on a compacted spool recovers the base and keeps translating") {
    val d = dir()
    spool50(d)
    val c1 = client()
    new PgWalReceiver(() => c1, d, 10, 0, 2).ackLines(35)

    val c2 = client()
    val r2 = new PgWalReceiver(() => c2, d, 10, 0, 2)
    assert(r2.linesSpooled == 50)
    assert(r2.compactedLines == 30)
    r2.ackLines(50)
    assert(c2.currentAckLsn == 0x1000L + 49 * 0x10L)
    // an ack replayed from before the base is a no-op, not an error
    val c3 = client()
    val r3 = new PgWalReceiver(() => c3, d, 10, 0, 2)
    r3.ackLines(20)
    assert(c3.currentAckLsn == 0L)
  }

  test("crash between idx publish and segment delete: leftovers reconciled") {
    val d = dir()
    // idx already carries @20, but segments 0 and 10 were not yet deleted
    (0 until 5).foreach { s =>
      val body = (0 until 10).map(i => s"line ${s * 10 + i}\n").mkString
      write(d, f"${s * 10}%012d.wal", body)
    }
    write(d, ".wal.idx", "@20\n" +
      (20 until 50).map(i => java.lang.Long.toHexString(0x1000L + i * 0x10L) + "\n").mkString)

    // readers already skip the stale segments (base published first)
    assert(WalSource.countLines(d) == 50)
    assert(WalSource.readLines(d, 20, 22) == Seq("line 20", "line 21"))

    val r = new PgWalReceiver(client(), d)
    assert(!new File(d, f"${0}%012d.wal").exists())
    assert(!new File(d, f"${10}%012d.wal").exists())
    assert(new File(d, f"${20}%012d.wal").exists())
    assert(r.linesSpooled == 50)
    assert(r.compactedLines == 20)
  }

  test("stale-base reader race: offsets anchor to segment names, not the old base") {
    val d = dir()
    // The reader-side TOCTOU: a reader loads .wal.idx (base 10), then the
    // compactor publishes @20 and deletes segment 10 BEFORE the reader
    // lists the directory. The reader's snapshot is base=10 + segments
    // {20,30,40} — cumulative arithmetic from the stale base would shift
    // every offset down by 10. Simulate exactly that snapshot on disk.
    (2 until 5).foreach { s =>
      write(d, f"${s * 10}%012d.wal", (0 until 10).map(i => s"line ${s * 10 + i}\n").mkString)
    }
    write(d, ".wal.idx", "@10\n" +
      (20 until 50).map(i => java.lang.Long.toHexString(0x1000L + i * 0x10L) + "\n").mkString)

    // name-anchored arithmetic: the count and every read window are the
    // same as they would be under the up-to-date base
    assert(WalSource.countLines(d) == 50)
    assert(WalSource.readLines(d, 20, 22) == Seq("line 20", "line 21"))
    assert(WalSource.readLines(d, 25, 27) == Seq("line 25", "line 26"))
    assert(WalSource.readLines(d, 48, 50) == Seq("line 48", "line 49"))
  }

  test("a segment straddling the base is refused, not silently mangled") {
    val d = dir()
    write(d, f"${10}%012d.wal", (10 until 20).map(i => s"line $i\n").mkString)
    write(d, ".wal.idx", "@15\n" +
      (15 until 20).map(i => java.lang.Long.toHexString(0x1000L + i * 0x10L) + "\n").mkString)
    val e = intercept[IllegalStateException](new PgWalReceiver(client(), d))
    assert(e.getMessage.contains("straddles"))
  }

  test("the newest segment is never compacted, even when fully acked") {
    val d = dir()
    (0 until 2).foreach { s =>
      write(d, f"${s * 10}%012d.wal", (0 until 10).map(i => s"line ${s * 10 + i}\n").mkString)
    }
    write(d, ".wal.idx",
      (0 until 20).map(i => java.lang.Long.toHexString(0x1000L + i * 0x10L) + "\n").mkString)
    val r = new PgWalReceiver(() => client(), d, 10, 0, 0)
    r.ackLines(20)
    assert(r.compact() == 10)   // only the older segment goes
    assert(new File(d, f"${10}%012d.wal").exists())
    assert(WalSource.countLines(d) == 20)
    assert(r.compact() == 0)    // one segment left: nothing more to do
  }

  test("e2e: stream -> commit-driven compaction -> checkpointed restart replays clean") {
    import graft.TestSpark.spark
    val lines: Seq[(Long, String)] = (0 until 3).flatMap { t =>
      val txn = 900 + t
      val b = 0x2000L + t * 0x40L
      Seq(
        b -> s"BEGIN $txn",
        (b + 0x10L) -> s"table public.users: INSERT: id[integer]:${2 * t} name[text]:'a'",
        (b + 0x20L) -> s"table public.users: INSERT: id[integer]:${2 * t + 1} name[text]:'b'",
        (b + 0x30L) -> s"COMMIT $txn")
    }
    val srv = new FakePgServer(lines)
    val d = dir()
    val ckpt = Files.createTempDirectory("graft_compact_ckpt").toString
    val c = client0(srv.port)
    var r: PgWalReceiver = null
    try {
      c.connect()
      r = new PgWalReceiver(() => c, d, 3, 0, 2)
      r.start("s", 0L)
      assert(r.awaitLines(lines.size.toLong))

      val out = Files.createTempDirectory("graft_compact_out").toString
      val src = graft.streaming.CdcPipeline.fromWalSource(spark, d, maxLinesPerTrigger = Some(3))
      val q = src.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      assert(spark.read.parquet(out).count() == lines.size.toLong)

      // the sink commits drove acks, acks drove compaction: early
      // segments are gone and the idx shrank, but offsets stayed global
      assert(r.compactedLines >= 6, s"compactedLines=${r.compactedLines}")
      assert(!new File(d, f"${0}%012d.wal").exists())
      assert(WalSource.countLines(d) == lines.size.toLong)

      // a restart from the checkpoint neither loses nor duplicates rows
      val q2 = src.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q2.processAllAvailable()
      q2.stop()
      assert(spark.read.parquet(out).count() == lines.size.toLong)
    } finally {
      if (r != null) r.stop()
      srv.stop()
    }
  }

  private def client0(port: Int) =
    new PgReplicationClient("127.0.0.1", port, "u", "db", None,
      statusIntervalMillis = 100L, readPollMillis = 20)
}
