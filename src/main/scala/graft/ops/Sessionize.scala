package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the standard
  * user-behavior primitive a training-data pipeline needs for
  * interaction data (and absent from the reference, which has no
  * event-time operators beyond fixed stats windows).
  *
  * Batch form: per-user ordered scan (one shuffle on the user key;
  * the sort is per-user-partition, never global) assigning a session
  * index wherever the gap to the previous event exceeds `gapMinutes`,
  * then one aggregation per (user, session).
  *
  * Streaming form: Spark's native `session_window` with a watermark —
  * state is bounded by the watermark horizon and merges windows
  * incrementally, the correct shape at 100 TB/day event volumes.
  */
object Sessionize {

  def sessions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val us = TimeCols.epochMicros(col(tsCol))
    val prevUs = lag(us, 1).over(w)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val isNew = when(prevUs.isNull || (us - prevUs) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(us).as("start_us"),
        max(us).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Streaming sessionization via native session windows. */
  def sessionsStream(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        session_window(col(tsCol), s"$gapMinutes minutes"),
        col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
