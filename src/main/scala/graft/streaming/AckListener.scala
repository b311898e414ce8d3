package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** The ack feedback loop (SURVEY §2 O16), Spark-style.
  *
  * The reference acks Postgres by walking its ledger and sending a
  * StandbyStatusUpdate for the last contiguous fully-written LSN. In
  * Structured Streaming the equivalent guarantee is structural: a
  * micro-batch's offsets are committed to the checkpoint only after
  * the sink write succeeds, so "committed offset" ≡ "contiguous prefix
  * durably written". This listener surfaces each committed end-offset
  * to an `onAck` callback — a CDC source maps it back to an LSN and
  * sends the standby status; the file harness just logs it.
  */
final class AckListener(
    queryName: String,
    extractLsn: String => Option[Long],
    onAck: Long => Unit)
  extends StreamingQueryListener {

  @volatile private var lastAcked: Long = -1L

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (p.name == queryName && p.sources.nonEmpty) {
      val lsns = p.sources.toSeq.flatMap(s => Option(s.endOffset).flatMap(extractLsn))
      if (lsns.nonEmpty) {
        val lsn = lsns.max
        if (lsn > lastAcked) { // monotone, like the client's max-LSN drain
          lastAcked = lsn
          onAck(lsn)
        }
      }
    }
  }
}
