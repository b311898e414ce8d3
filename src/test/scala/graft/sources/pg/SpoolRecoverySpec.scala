package graft.sources.pg

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** Startup repair of the spool after a crash mid-`spool()`: the data
  * line and its `.wal.idx` entry are two independent appends, so a
  * crash can tear either file's tail or leave the streams one line
  * apart. A torn idx tail is the dangerous case — an append-mode
  * reopen would concatenate the next hex LSN onto the torn one,
  * producing a valid-looking but larger LSN and acking the slot past
  * undelivered data.
  */
class SpoolRecoverySpec extends AnyFunSuite {

  private def client() =
    new PgReplicationClient("127.0.0.1", 1, "u", "db", None,
      statusIntervalMillis = 100L, readPollMillis = 20)

  private def dir(): String =
    Files.createTempDirectory("graft_spool_recovery").toString

  private def write(d: String, name: String, content: String): Unit =
    Files.write(Paths.get(d, name), content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  private def readFile(d: String, name: String): String =
    new String(Files.readAllBytes(Paths.get(d, name)), "UTF-8")

  test("torn idx tail (no newline) is dropped, data trimmed to match") {
    val d = dir()
    write(d, "000000000000.wal", "BEGIN 1\nline a\nline b\n")
    // crash tore the third entry: '3f2' is a prefix of some larger LSN
    write(d, ".wal.idx", "100\n110\n3f2")
    val r = new PgWalReceiver(client(), d)
    assert(r.linesSpooled == 2)
    assert(readFile(d, ".wal.idx") == "100\n110\n")
    assert(readFile(d, "000000000000.wal") == "BEGIN 1\nline a\n")
    // acks translate only through surviving entries
    val c = client()
    val r2 = new PgWalReceiver(c, d)
    r2.ackLines(5) // clamped to the 2 indexed lines
    assert(c.currentAckLsn == 0x110L)
  }

  test("torn data tail with a complete idx entry: idx trimmed back") {
    val d = dir()
    write(d, "000000000000.wal", "BEGIN 1\nline a\nline partial") // no \n
    write(d, ".wal.idx", "100\n110\n120\n")
    val r = new PgWalReceiver(client(), d)
    assert(r.linesSpooled == 2)
    assert(readFile(d, ".wal.idx") == "100\n110\n")
    assert(readFile(d, "000000000000.wal") == "BEGIN 1\nline a\n")
  }

  test("data line spooled but crash before its idx entry: unindexed tail dropped") {
    val d = dir()
    write(d, "000000000000.wal", "BEGIN 1\nline a\nline b\n")
    write(d, ".wal.idx", "100\n110\n")
    val r = new PgWalReceiver(client(), d)
    assert(r.linesSpooled == 2)
    assert(readFile(d, "000000000000.wal") == "BEGIN 1\nline a\n")
  }

  test("surplus whole segments beyond the idx are removed") {
    val d = dir()
    write(d, "000000000000.wal", "l0\nl1\n")
    write(d, "000000000002.wal", "l2\nl3\n")
    write(d, ".wal.idx", "100\n")
    val r = new PgWalReceiver(client(), d)
    assert(r.linesSpooled == 1)
    assert(readFile(d, "000000000000.wal") == "l0\n")
    assert(!new File(d, "000000000002.wal").exists())
  }

  test("non-hex garbage mid-idx: valid prefix kept, both streams trimmed") {
    val d = dir()
    write(d, "000000000000.wal", "l0\nl1\nl2\n")
    write(d, ".wal.idx", "100\nnot-hex\n120\n")
    val r = new PgWalReceiver(client(), d)
    assert(r.linesSpooled == 1)
    assert(readFile(d, ".wal.idx") == "100\n")
    assert(readFile(d, "000000000000.wal") == "l0\n")
  }

  test("clean spool passes through untouched") {
    val d = dir()
    write(d, "000000000000.wal", "l0\nl1\n")
    write(d, ".wal.idx", "100\n110\n")
    val r = new PgWalReceiver(client(), d)
    assert(r.linesSpooled == 2)
    assert(readFile(d, ".wal.idx") == "100\n110\n")
    assert(readFile(d, "000000000000.wal") == "l0\nl1\n")
  }
}
