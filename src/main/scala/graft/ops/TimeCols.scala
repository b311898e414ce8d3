package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp-column helpers shared by the event-time operators.
  *
  * Parquet written with tz-naive timestamps (`timestamp[us]`, no
  * `isAdjustedToUTC`) reads back in Spark 4 as `TIMESTAMP_NTZ`, and
  * `unix_micros` rejects NTZ input at analysis time
  * (`DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE`). Every event-time
  * operator must therefore go through [[TimeCols.epochMicros]] rather
  * than calling `unix_micros` on a raw column.
  */
object TimeCols {

  /** Microseconds since the epoch, tolerant of both timestamp dtypes.
    *
    * `cast("timestamp")` is a no-op on a `TIMESTAMP` (LTZ) column and
    * reinterprets a `TIMESTAMP_NTZ` wall-clock under the session time
    * zone. The whole project pins `spark.sql.session.timeZone=UTC`, so
    * on naive input this is numerically identical to DuckDB's
    * `epoch_us(CAST(ts AS TIMESTAMP))` — the oracle convention.
    */
  def epochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))
}
