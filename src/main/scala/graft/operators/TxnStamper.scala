package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transaction stamping (SURVEY §2 O4; reference
  * replication/client/client.go:470-566).
  *
  * In `test_decoding` output, the transaction id appears only on the
  * BEGIN/COMMIT markers; every DML line in between must be stamped with
  * the enclosing BEGIN's id, plus a `timeBasedKey = txn + "-" + epochNanos`
  * that distinguishes re-deliveries of the same transaction after a
  * source reconnect.
  *
  * This batch implementation replays a WAL text capture in `ord` order
  * with an ordered running-`last` window. The WAL is a single totally
  * ordered stream, so this is a sequential scan by nature — same as the
  * reference's single replication reader. Use it for replay/backfill and
  * tests; in live streaming the stamp is applied record-at-a-time inside
  * the source (per-connection ordered), not here.
  *
  * @param epochNanos the re-delivery discriminator to embed in
  *                   timeBasedKey; the reference uses wall-clock nanos
  *                   captured at BEGIN — injectable here so tests and
  *                   replays are deterministic.
  */
object TxnStamper {

  def stamp(parsed: DataFrame, ordCol: String = "ord", epochNanos: Long = 0L): DataFrame = {
    val w = Window.orderBy(col(ordCol)).rowsBetween(Window.unboundedPreceding, 0)
    val ownTxn = when(col("txn") =!= "", col("txn"))
    val beginTxn = last(when(col("operation") === "BEGIN", col("txn")), ignoreNulls = true).over(w)
    parsed
      .withColumn("txn", coalesce(ownTxn, beginTxn))
      .withColumn("timeBasedKey", concat(col("txn"), lit("-"), lit(epochNanos)))
  }
}
