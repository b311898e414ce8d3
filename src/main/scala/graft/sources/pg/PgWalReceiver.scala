package graft.sources.pg

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import graft.sources.WalSource

/** Bridges the live replication socket to the `graft-wal` DSv2 source:
  * spools each XLogData line into the segment directory the source
  * reads, and translates the source's committed line offsets back into
  * server WAL LSNs for StandbyStatusUpdate.
  *
  * This completes the reference's O1/O16 loop (replication/client/
  * client.go:224-380 receive path, :128-217 ack path) in Spark terms:
  *
  *   socket → spool segments → DSv2 micro-batches → sink
  *      ▲                                            │
  *      └── StandbyStatusUpdate ◀── commit(offset) ──┘
  *
  * The spool doubles as the reference's bounded client buffer (U2) —
  * but durable, so a restart replays from the checkpointed offset
  * instead of forcing a slot rewind. A `wal.idx` sidecar records each
  * line's walStart (one hex per line); on restart it is reloaded so
  * acks for lines spooled by a previous run still translate.
  */
final class PgWalReceiver(
    clientFactory: () => PgReplicationClient,
    spoolDir: String,
    linesPerSegment: Int = 10000,
    maxRecoveries: Int = 3,
    compactAfterSegments: Int = 0) {

  /** Single-connection convenience (no reconnect after stream error). */
  def this(client: PgReplicationClient, spoolDir: String) =
    this(() => client, spoolDir, 10000, 0)
  def this(client: PgReplicationClient, spoolDir: String, linesPerSegment: Int) =
    this(() => client, spoolDir, linesPerSegment, 0)

  // walStarts holds lines [base, base + size): line (base + i) → walStarts(i).
  // `base` counts lines compacted away from the front; it is persisted as
  // the idx header (`@<base>`, WalSource.compactedBase) so offsets stay
  // global across restarts. Guarded (with `base`) by walStarts.synchronized.
  private val walStarts = ArrayBuffer[Long]()
  private var base = 0L
  private val spooled = new AtomicLong(0L)
  private val ackedLines = new AtomicLong(0L)
  // Serializes segment/idx file mutation: spool() appends (receiver
  // thread) vs compact() rewriting the idx and deleting segments (ack
  // thread) vs stop() closing the writers.
  private val spoolLock = new Object
  private var writer: java.io.FileOutputStream = _
  private var idxWriter: java.io.FileOutputStream = _
  private var linesInSegment = 0
  private var thread: Thread = _
  private val started = new CountDownLatch(1)
  @volatile private var failure: Throwable = _
  @volatile private var client: PgReplicationClient = _
  @volatile private var openTxn: String = null // BEGIN seen, COMMIT not yet
  @volatile private var highestWalStart = 0L
  @volatile private var stopping = false
  @volatile var recoveries: Int = 0

  Files.createDirectories(Paths.get(spoolDir))
  // Recover the line→LSN index left by a previous receiver session.
  // Dot-prefixed so the segment source never mistakes it for WAL data;
  // a spool written before the rename is migrated on sight.
  private val idxFile = new File(spoolDir, ".wal.idx")
  locally {
    val legacy = new File(spoolDir, "wal.idx")
    if (legacy.exists() && !idxFile.exists()) {
      if (!legacy.renameTo(idxFile)) {
        // rename denied (e.g. cross-device): copy, then the original
        // MUST go away or the segment source would read it as WAL data
        Files.copy(legacy.toPath, idxFile.toPath)
        if (!legacy.delete())
          throw new IllegalStateException(
            s"cannot migrate legacy index $legacy: delete failed; remove it manually")
      }
    } else if (legacy.exists()) {
      // both present (old receiver ran after the rename): ambiguous
      throw new IllegalStateException(
        s"both $legacy and $idxFile exist; reconcile the spool manually")
    }
  }
  // --- torn-write recovery ---
  // spool() appends the data line and its idx entry as two independent
  // writes with no ordering barrier between the streams; a crash can
  // leave either file with a trailing line missing its newline (a torn
  // line that an append-mode reopen would silently extend into a
  // valid-looking but WRONG entry — e.g. a truncated hex LSN that
  // later translates an ack past undelivered data), or the data spool
  // one line ahead of the idx. Repair on startup: truncate each file
  // to its last complete line, then trim both streams to the shorter.
  // Trimmed lines were never ack-translatable, so the slot never
  // advanced past them — the server redelivers after reconnect (the
  // same at-least-once window the reference's error recovery accepts,
  // replication/client/client.go:386-424).
  locally {
    truncateTornTail(idxFile)
    if (idxFile.exists()) {
      val src = scala.io.Source.fromFile(idxFile, "UTF-8")
      val allValid =
        try {
          var first = true
          src.getLines().forall { l =>
            val isHeader = first && l.startsWith("@")
            first = false
            if (isHeader) {
              // compaction header: lines dropped from the front. Written
              // only by the atomic rewriteIdx, so it is never torn.
              base = java.lang.Long.parseLong(l.substring(1).trim); true
            } else
              try { walStarts += java.lang.Long.parseLong(l.trim, 16); true }
              catch { case _: NumberFormatException => false }
          }
        } finally src.close()
      if (!allValid) rewriteIdx() // keep only the valid prefix
    }
    // Reconcile a crash between the compactor's idx replace and its
    // segment deletes: any segment wholly below the base is already
    // accounted for by the header — remove the leftover.
    val segs = WalSource.segmentFiles(spoolDir).filter { f =>
      val start = WalSource.segmentStartLine(f)
      if (base > 0 && start.exists(_ < base)) {
        if (start.exists(s => s + WalSource.fileLineCount(f) > base))
          throw new IllegalStateException(
            s"segment $f straddles the compacted base $base; reconcile the spool manually")
        if (!f.delete())
          throw new IllegalStateException(s"cannot remove compacted leftover segment $f")
        false
      } else true
    }
    segs.lastOption.foreach(truncateTornTail) // only the newest can be torn
    val dataLines = segs.map(WalSource.fileLineCount).sum
    if (walStarts.size > dataLines) {
      walStarts.remove(dataLines.toInt, walStarts.size - dataLines.toInt)
      rewriteIdx()
    } else if (dataLines > walStarts.size) {
      truncateDataTo(segs, walStarts.size.toLong)
    }
    spooled.set(base + walStarts.size)
    ackedLines.set(base) // everything below the base was acked pre-compaction
  }

  /** Drop a trailing line that is missing its newline (torn write). */
  private def truncateTornTail(f: File): Unit = {
    if (!f.exists() || f.length() == 0) return
    val raf = new java.io.RandomAccessFile(f, "rw")
    try {
      raf.seek(raf.length() - 1)
      if (raf.read() == '\n') return
      var pos = raf.length() - 1
      var cut = 0L
      while (cut == 0L && pos > 0) {
        pos -= 1
        raf.seek(pos)
        if (raf.read() == '\n') cut = pos + 1
      }
      raf.setLength(cut)
    } finally raf.close()
  }

  /** Atomically replace the idx with the current `walStarts` prefix
    * (plus the `@base` compaction header once any compaction happened —
    * header and entries land in ONE atomic move, so the base and the
    * entry list can never disagree after a crash).
    */
  private def rewriteIdx(): Unit = {
    val tmp = new File(spoolDir, ".wal.idx.tmp")
    val w = new java.io.FileOutputStream(tmp)
    try {
      if (base > 0) w.write(s"@$base\n".getBytes("UTF-8"))
      walStarts.foreach(ws =>
        w.write((java.lang.Long.toHexString(ws) + "\n").getBytes("UTF-8")))
    } finally w.close()
    Files.move(tmp.toPath, idxFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Trim the data spool to its first `keep` lines (drop the unindexed
    * tail; segments are bounded by `linesPerSegment`, so reading one
    * whole segment to find the cut point is cheap).
    */
  private def truncateDataTo(segs: Seq[File], keep: Long): Unit = {
    var before = 0L
    segs.foreach { f =>
      val n = WalSource.fileLineCount(f)
      if (before >= keep) {
        if (!f.delete())
          throw new IllegalStateException(s"cannot remove surplus segment $f")
      } else if (before + n > keep) {
        val bytes = Files.readAllBytes(f.toPath)
        var lines = 0L
        var pos = 0
        while (lines < keep - before && pos < bytes.length) {
          if (bytes(pos) == '\n') lines += 1
          pos += 1
        }
        val raf = new java.io.RandomAccessFile(f, "rw")
        try raf.setLength(pos.toLong) finally raf.close()
      }
      before += n
    }
  }

  /** Lines spooled so far (existing + this session), compacted included. */
  def linesSpooled: Long = spooled.get()

  /** Lines compacted away from the front of the spool. */
  def compactedLines: Long = walStarts.synchronized(base)

  /** Unacked backlog: lines spooled but not yet committed by the sink —
    * the reference's queue depth (the bounded client buffer's fill).
    */
  def spoolDepth: Long = spooled.get() - ackedLines.get()

  /** Translate a committed line offset (the graft-wal LSN = number of
    * lines consumed) to the server LSN of the last consumed line and
    * forward it to the socket's standby-status sender.
    */
  def ackLines(lineLsn: Long): Unit = {
    // translate under ONE lock so a concurrent compact() can't shift
    // `base` between the clamp and the lookup
    val translated = walStarts.synchronized {
      val idx = math.min(lineLsn, base + walStarts.size) - 1
      if (idx >= base) Some((idx, walStarts((idx - base).toInt))) else None
      // idx < base: an ack for already-compacted lines (a replayed ack
      // after restart) — the slot is already at or past it, nothing to send
    }
    translated.foreach { case (idx, walLsn) =>
      // before start() the ack is parked on a fresh client and carried
      // by the first status update once the loop begins
      if (client == null) synchronized { if (client == null) client = clientFactory() }
      client.updateAckLsn(walLsn)
      ackedLines.getAndAccumulate(idx + 1, math.max)
      // opportunistic compaction once a configured number of segments'
      // worth of lines is fully acked beyond the current base
      if (compactAfterSegments > 0 &&
          ackedLines.get() - compactedLines >= compactAfterSegments.toLong * linesPerSegment)
        compact()
    }
  }

  /** Drop fully-acked whole segments from the front of the spool and
    * fold their line count into the idx `@base` header — the bounded-
    * disk guarantee for a long-running receiver (SCALE.md's "compactable
    * line→LSN index", reference analog: Postgres itself recycling WAL
    * below the slot's restart_lsn).
    *
    * Crash-safe ordering: the trimmed idx (entries + new base in one
    * atomic move) is published BEFORE any segment is deleted; a crash in
    * between leaves leftover segments wholly below the base, which
    * startup reconciliation (and WalSource's readers) recognize by their
    * filename-encoded start line and drop. The newest segment is never
    * deleted, so `WalSource.countLines` keeps its meaning on an idle,
    * fully-acked spool.
    *
    * @return lines compacted away by this call
    */
  def compact(): Long = spoolLock.synchronized {
    val acked = ackedLines.get()
    val segs = WalSource.segmentFiles(spoolDir)
    if (segs.size <= 1) return 0L
    var cum = walStarts.synchronized(base)
    val deletable = ArrayBuffer[File]()
    var scanning = true
    segs.init.foreach { f => // never the newest (possibly open) segment
      if (scanning) {
        val n = WalSource.fileLineCount(f)
        if (cum + n <= acked) { deletable += f; cum += n } else scanning = false
      }
    }
    if (deletable.isEmpty) return 0L
    val dropped = walStarts.synchronized {
      val d = cum - base
      walStarts.remove(0, d.toInt)
      base = cum
      d
    }
    // publish the new base atomically with the trimmed entries, pausing
    // the appender so the rewrite can't race a concurrent spool()
    val reopen = idxWriter != null
    if (reopen) idxWriter.close()
    rewriteIdx()
    if (reopen) idxWriter = new java.io.FileOutputStream(idxFile, true)
    deletable.foreach { f =>
      if (!f.delete())
        throw new IllegalStateException(s"cannot remove compacted segment $f")
    }
    dropped
  }

  /** Register this receiver as the ack hook for its spool directory. */
  def registerAckHook(): Unit =
    WalSource.ackHooks.put(spoolDir, ackLines)

  private def rollIfNeeded(): Unit = {
    if (writer == null || linesInSegment >= linesPerSegment) {
      if (writer != null) writer.close()
      val startLine = spooled.get()
      writer = new java.io.FileOutputStream(
        new File(spoolDir, f"$startLine%012d.wal"), true)
      linesInSegment = 0
    }
  }

  private def spool(x: XLogData): Unit = {
    // one write() per full line (content + newline): the source's
    // reader polls these files concurrently, and a buffered writer
    // could expose a half-flushed line as a complete one. A single
    // write of the whole record into the page cache is the strongest
    // line-level atomicity a plain file offers. spoolLock keeps the
    // appends out from under a concurrent compact()'s idx rewrite.
    spoolLock.synchronized {
      rollIfNeeded()
      writer.write((x.line + "\n").getBytes("UTF-8"))
      idxWriter.write((java.lang.Long.toHexString(x.walStart) + "\n").getBytes("UTF-8"))
      walStarts.synchronized { walStarts += x.walStart }
      spooled.incrementAndGet()
      linesInSegment += 1
    }
    if (x.walStart > highestWalStart) highestWalStart = x.walStart
    if (x.line.startsWith("BEGIN ")) openTxn = x.line.substring(6).trim
    else if (x.line.startsWith("COMMIT")) openTxn = null
  }

  /** Connect-equivalent of the reference's client Start: enters the
    * copy-both loop on a daemon thread; on a mid-stream server error it
    * applies the reference's recovery (client.go:386-424): spool a
    * synthetic COMMIT so downstream closes the open transaction, drop
    * the broken connection, reconnect, and fast-forward to the server's
    * current LSN (a data gap is accepted by design). `startLsn` 0 = the
    * slot's position.
    */
  def start(slot: String, startLsn: Long = 0L,
            pluginOptions: Seq[(String, String)] = Nil): Unit = {
    idxWriter = new java.io.FileOutputStream(idxFile, true)
    registerAckHook()
    thread = new Thread(() => {
      var lsn = startLsn
      var proceed = true
      try {
        // reuse a client parked by a pre-start ackLines call
        synchronized { if (client == null) client = clientFactory() }
        client.connect()
        started.countDown()
        while (proceed) {
          proceed = false
          try client.startReplication(slot, lsn, pluginOptions)(spool)
          catch {
            // recover from server errors AND connection-level failures
            // (EOF, reset, mid-frame timeout) — any of them breaks the
            // stream the same way; but never "recover" from our own
            // shutdown closing the socket
            case e @ (_: PgError | _: java.io.IOException)
                if !stopping && recoveries < maxRecoveries =>
              recoveries += 1
              // close the open transaction for the ledger's benefit
              if (openTxn != null)
                spool(XLogData(highestWalStart, highestWalStart, 0L, s"COMMIT $openTxn"))
              val prevAck = client.currentAckLsn
              try client.close() catch { case _: Throwable => () }
              client = clientFactory()
              // carry the committed position over so a quiet stream
              // after recovery still trims the slot to it
              client.updateAckLsn(prevAck)
              client.connect()
              val (_, _, xlogpos) = client.identifySystem()
              lsn = xlogpos
              // a stop() racing this reconnect may have signalled only
              // the discarded client — re-check before streaming again
              proceed = !stopping
          }
        }
      } catch {
        // an error after stop() began is shutdown fallout (our own
        // close breaking the read loop), not a stream failure
        case t: Throwable => if (!stopping) failure = t
      } finally started.countDown()
    }, s"graft-pg-receiver-$slot")
    thread.setDaemon(true)
    thread.start()
    started.await()
  }

  /** Wait until at least `n` lines are spooled (test/drain helper). */
  def awaitLines(n: Long, timeoutMillis: Long = 90000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMillis * 1000000L
    while (spooled.get() < n && System.nanoTime() < deadline) {
      if (failure != null) throw failure
      Thread.sleep(10)
    }
    spooled.get() >= n
  }

  def stop(): Unit = {
    stopping = true
    if (client != null) client.requestStop()
    if (thread != null) {
      thread.join(5000)
      if (thread.isAlive) {
        // a recovery swapped clients mid-stop: signal the current one
        if (client != null) client.requestStop()
        thread.join(5000)
      }
    }
    // Close the replication connection so the server releases the slot:
    // a stopped receiver that leaves its walsender attached makes the
    // slot unacquirable (SQLSTATE 55006) for the next run — a slot leak
    // on every restart. requestStop only exits the copy-both loop; the
    // socket (and the server's walsender) lives until this close. The
    // reference releases it by tearing down the whole connection on
    // shutdown (replication/client/conn/manager.go Close path).
    if (client != null) { try client.close() catch { case _: Throwable => () } }
    spoolLock.synchronized {
      if (writer != null) { writer.close(); writer = null }
      if (idxWriter != null) { idxWriter.close(); idxWriter = null }
    }
    WalSource.ackHooks.remove(spoolDir)
    if (failure != null) throw failure
  }
}

/** [[graft.sources.SlotAdmin]] over the live replication connection —
  * the reference's `pg-bifrost create|drop` (utils/utils.go:38-77).
  */
final class PgSlotAdmin(client: PgReplicationClient) extends graft.sources.SlotAdmin {
  override def createSlot(name: String): Boolean = client.createSlot(name)
  override def dropSlot(name: String): Unit = client.dropSlot(name)
}
