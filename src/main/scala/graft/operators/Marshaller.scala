package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** JSON marshaller (SURVEY §2 O7; reference marshaller/marshaller.go:147-334).
  *
  * Merges the parsed `columns`/`oldColumns` maps into the output
  * `{"old","new"}` pair map and serializes the full change envelope to
  * JSON. The merge branch matrix (marshaller.go:258-302):
  *
  *  - DELETE: every parsed column is emitted as old-only (the tuple in
  *    a DELETE is the key's final value);
  *  - value changed and new value is the TOAST sentinel
  *    (`unchanged-toast-datum`): substitute the previous value for the
  *    new one (old repeated unless `noMarshalOldValue`);
  *  - value changed: `{new, old}` (old dropped when `noMarshalOldValue`);
  *  - UPDATE where the old tuple lacks the column and the new value is
  *    not SQL NULL: a NULL→value transition under REPLICA IDENTITY
  *    FULL — inject a synthetic old `null` so consumers see the
  *    transition (suppressed by `noMarshalOldValue`);
  *  - otherwise: new-only.
  *
  * Old-only keys (present in `oldColumns` but absent from `columns`)
  * are dropped, exactly as the reference iterates `Pr.Columns` only.
  *
  * Everything is built from `map_zip_with`/`map_filter`/`to_json`, so
  * the whole operator lives inside whole-stage codegen — no UDFs, no
  * typed-map deserialization.
  */
object Marshaller {

  /** `q` is serialized as the strings "true"/"false" (reference
    * marshaller.go:218-230 — even booleans are strings on the wire).
    */
  private def cvJson(cv: Column): Column =
    when(cv.isNull, lit(null).cast("struct<v:string,t:string,q:string>"))
      .otherwise(struct(
        cv.getField("v").as("v"),
        cv.getField("t").as("t"),
        when(cv.getField("q"), "true").otherwise("false").as("q")))

  private val absent: Column = lit(null).cast("struct<v:string,t:string,q:string>")

  private def pair(newV: Option[Column], oldV: Option[Column]): Column =
    struct(
      newV.map(cvJson).getOrElse(absent).as("new"),
      oldV.map(cvJson).getOrElse(absent).as("old"))

  /** The merged `columns` map expression. */
  def mergedColumns(
      operation: Column,
      columns: Column,
      oldColumns: Column,
      noMarshalOldValue: Boolean): Column = {
    // Typed empty map (plain `map()` would be map<null,null> and break
    // coalesce's type resolution).
    val emptyCols = map_filter(columns, (_, _) => lit(false))
    val zipped = map_zip_with(columns, coalesce(oldColumns, emptyCols), (_, v, o) => {
      val changed = o.isNotNull && v.getField("v") =!= o.getField("v")
      val isToast = v.getField("v") === "unchanged-toast-datum"
      val isSqlNull = v.getField("v") === "null" && !v.getField("q")
      val nullCv = struct(
        lit("null").as("v"), v.getField("t").as("t"), lit(false).as("q"))
      when(v.isNull, lit(null)) // key existed only in oldColumns: drop
        .when(operation === "DELETE", pair(None, Some(v)))
        .when(changed && isToast,
          if (noMarshalOldValue) pair(Some(o), None) else pair(Some(o), Some(o)))
        .when(changed,
          if (noMarshalOldValue) pair(Some(v), None) else pair(Some(v), Some(o)))
        .when(
          if (noMarshalOldValue) lit(false)
          else o.isNull && !isSqlNull && operation === "UPDATE",
          pair(Some(v), Some(nullCv)))
        .otherwise(pair(Some(v), None))
    })
    map_filter(zipped, (_, p) => p.isNotNull)
  }

  /** RFC3339 timestamp; PG 9–11 report ServerTime=0, for which the
    * reference emits a fixed epoch-ish constant (marshaller.go:42,304-310).
    *
    * Rendered with an explicit UTC zone on the formatter itself
    * (Catalyst's `DateFormatClass` carries a timeZoneId) — a
    * `to_utc_timestamp(_, current_timezone())` shift would re-interpret
    * wall-clock fields and lands one hour off for instants inside the
    * session timezone's spring-forward DST gap. This is exact in any
    * session tz, matching the UTC-fixed native
    * [[graft.functions.MarshalJson]].
    */
  private def timeExpr(serverTimeMs: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{DateFormatClass, Literal}
    when(serverTimeMs =!= 0,
      column(DateFormatClass(
        expression(timestamp_millis(serverTimeMs)),
        Literal("yyyy-MM-dd'T'HH:mm:ss'Z'"),
        Some("UTC"))))
      .otherwise("1970-01-01T00:00:01Z")
  }

  /** Full output JSON for one change record; NULL for BEGIN/COMMIT
    * (they are never marshalled — marshaller.go:187-190).
    */
  def jsonExpr(
      operation: Column,
      relation: Column,
      columns: Column,
      oldColumns: Column,
      serverTimeMs: Column,
      timeBasedKey: Column,
      walStart: Column,
      noMarshalOldValue: Boolean): Column =
    when(operation.isin("BEGIN", "COMMIT"), lit(null))
      .otherwise(to_json(struct(
        timeExpr(serverTimeMs).as("time"),
        serverTimeMs.as("time_ms"),
        timeBasedKey.as("txn"),
        GraftFunctions.format_lsn(walStart).as("lsn"),
        relation.as("table"),
        operation.as("operation"),
        mergedColumns(operation, columns, oldColumns, noMarshalOldValue).as("columns")),
        // Absent old/new sides must be omitted from the JSON, not
        // rendered as null (golden-output contract).
        Map("ignoreNullFields" -> "true")))

  /** Native single-pass form of [[jsonExpr]] (see
    * [[graft.functions.MarshalJson]]): byte-identical output, no
    * intermediate merged map, no per-row Jackson generator. The default
    * hot path; [[jsonExpr]] remains as the declarative reference the
    * parity spec checks it against.
    */
  def jsonExprNative(
      operation: Column,
      relation: Column,
      columns: Column,
      oldColumns: Column,
      serverTimeMs: Column,
      timeBasedKey: Column,
      walStart: Column,
      noMarshalOldValue: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{LongType, StringType}
    // MarshalJson.eval casts its long/string inputs directly; tolerate
    // Int/Timestamp/typed columns the same way the declarative jsonExpr
    // and the SQL-registered builder (GraftExtensions) do.
    def str(c: Column) = Cast(expression(c), StringType)
    def lng(c: Column) = Cast(expression(c), LongType)
    column(graft.functions.MarshalJson(
      Seq(str(operation), str(relation), expression(columns), expression(oldColumns),
        lng(serverTimeMs), str(timeBasedKey), lng(walStart)),
      noMarshalOldValue))
  }

  /** DataFrame transform: expects the change-record schema (FIXTURES §4)
    * and appends a `json` column.
    */
  def apply(noMarshalOldValue: Boolean = false): DataFrame => DataFrame = df =>
    df.withColumn("json", jsonExprNative(
      col("operation"), col("relation"), col("columns"), col("oldColumns"),
      col("serverTimeMs"), col("timeBasedKey"), col("walStart"),
      noMarshalOldValue))
}
