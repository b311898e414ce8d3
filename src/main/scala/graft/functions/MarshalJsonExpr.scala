package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `marshal_json(...)` → string: the full change-record JSON envelope
  * in ONE native pass — the hot-path form of
  * [[graft.operators.Marshaller.jsonExpr]] (reference
  * marshaller/marshaller.go:147-334).
  *
  * The Catalyst `map_zip_with`/`map_filter`/`to_json` formulation is
  * semantically identical (a parity spec holds them byte-for-byte
  * equal) but materializes the merged map and runs Jackson per row;
  * this expression applies the merge branch matrix while serializing,
  * straight into one string builder: no intermediate map, no
  * generator, ~4× fewer per-row allocations on the CDC flagship path.
  *
  * Output is byte-identical to `to_json(..., ignoreNullFields=true)`
  * of the merged struct: same field order, same Jackson-style string
  * escaping (`"`, `\`, control chars as \b \t \n \f \r or \u00XX),
  * `time` rendered in UTC (the reference's RFC3339 contract).
  *
  * Children: operation, relation, columns, oldColumns, serverTimeMs,
  * timeBasedKey, walStart.
  */
case class MarshalJson(children: Seq[Expression], noMarshalOldValue: Boolean)
  extends Expression {
  require(children.length == 7, "marshal_json takes 7 inputs")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "marshal_json"

  override def eval(input: InternalRow): Any = {
    val op = children(0).eval(input).asInstanceOf[UTF8String]
    val rel = children(1).eval(input).asInstanceOf[UTF8String]
    val cols = children(2).eval(input).asInstanceOf[MapData]
    val oldCols = children(3).eval(input).asInstanceOf[MapData]
    val tMs = children(4).eval(input)
    val tbk = children(5).eval(input).asInstanceOf[UTF8String]
    val ws = children(6).eval(input)
    MarshalJson.marshal(op, rel, cols, oldCols,
      if (tMs == null) 0L else tMs.asInstanceOf[Long],
      tbk,
      if (ws == null) 0L else ws.asInstanceOf[Long],
      noMarshalOldValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val args = Seq(
      s"${evals(0).isNull} ? null : ${evals(0).value}",
      s"${evals(1).isNull} ? null : ${evals(1).value}",
      s"${evals(2).isNull} ? null : ${evals(2).value}",
      s"${evals(3).isNull} ? null : ${evals(3).value}",
      s"${evals(4).isNull} ? 0L : ${evals(4).value}",
      s"${evals(5).isNull} ? null : ${evals(5).value}",
      s"${evals(6).isNull} ? 0L : ${evals(6).value}").mkString(", ")
    val resultType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${evals.map(_.code).mkString("\n")}
        $resultType ${ev.value} = graft.functions.MarshalJson.marshal($args, $noMarshalOldValue);
        boolean ${ev.isNull} = (${ev.value} == null);
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MarshalJson =
    copy(children = newChildren)
}

object MarshalJson {

  private val ToastSentinel = UTF8String.fromString("unchanged-toast-datum")
  private val NullLit = UTF8String.fromString("null")
  private val OpBegin = UTF8String.fromString("BEGIN")
  private val OpCommit = UTF8String.fromString("COMMIT")
  private val OpDelete = UTF8String.fromString("DELETE")
  private val OpUpdate = UTF8String.fromString("UPDATE")

  /** One change record → JSON envelope (null for BEGIN/COMMIT/null op). */
  def marshal(op: UTF8String, rel: UTF8String, cols: MapData, oldCols: MapData,
              serverTimeMs: Long, tbk: UTF8String, walStart: Long,
              noMarshalOldValue: Boolean): UTF8String = {
    if (op == null || cols == null) return null
    if (op.equals(OpBegin) || op.equals(OpCommit)) return null

    val sb = new java.lang.StringBuilder(256)
    sb.append("{\"time\":\"")
    appendTime(sb, serverTimeMs)
    sb.append("\",\"time_ms\":").append(serverTimeMs)
    if (tbk != null) { // omitted when null, like to_json(ignoreNullFields)
      sb.append(",\"txn\":")
      appendJsonString(sb, tbk)
    }
    sb.append(",\"lsn\":\"")
    sb.append(java.lang.Long.toHexString(walStart >>> 32).toUpperCase)
    sb.append('/')
    sb.append(java.lang.Long.toHexString(walStart & 0xffffffffL).toUpperCase)
    sb.append("\",\"table\":")
    appendJsonString(sb, rel)
    sb.append(",\"operation\":")
    appendJsonString(sb, op)
    sb.append(",\"columns\":{")

    val isDelete = op.equals(OpDelete)
    val isUpdate = op.equals(OpUpdate)
    val keys = cols.keyArray()
    val vals = cols.valueArray()
    val n = cols.numElements()
    val oKeys = if (oldCols == null) null else oldCols.keyArray()
    val oVals = if (oldCols == null) null else oldCols.valueArray()
    val oN = if (oldCols == null) 0 else oldCols.numElements()

    var first = true
    var i = 0
    while (i < n) {
      if (!vals.isNullAt(i)) {
        val k = keys.getUTF8String(i)
        val v = vals.getStruct(i, 3)
        val vv = v.getUTF8String(0)
        val vt = v.getUTF8String(1)
        val vq = v.getBoolean(2)
        // linear old lookup: column counts are small (a table's width)
        var o: InternalRow = null
        var j = 0
        while (o == null && j < oN) {
          if (!oVals.isNullAt(j) && oKeys.getUTF8String(j).equals(k)) o = oVals.getStruct(j, 3)
          j += 1
        }

        if (!first) sb.append(',')
        first = false
        appendJsonString(sb, k)
        sb.append(":{")
        if (isDelete) {
          appendSide(sb, "old", vv, vt, vq)
        } else {
          val changed = o != null && !vv.equals(o.getUTF8String(0))
          val isToast = vv.equals(ToastSentinel)
          if (changed && isToast) {
            appendSide(sb, "new", o.getUTF8String(0), o.getUTF8String(1), o.getBoolean(2))
            if (!noMarshalOldValue) {
              sb.append(',')
              appendSide(sb, "old", o.getUTF8String(0), o.getUTF8String(1), o.getBoolean(2))
            }
          } else if (changed) {
            appendSide(sb, "new", vv, vt, vq)
            if (!noMarshalOldValue) {
              sb.append(',')
              appendSide(sb, "old", o.getUTF8String(0), o.getUTF8String(1), o.getBoolean(2))
            }
          } else if (!noMarshalOldValue && o == null && isUpdate &&
                     !(vv.equals(NullLit) && !vq)) {
            // NULL→value transition under REPLICA IDENTITY FULL:
            // synthetic old `null` (marshaller.go:290-298)
            appendSide(sb, "new", vv, vt, vq)
            sb.append(',')
            appendSide(sb, "old", NullLit, vt, q = false)
          } else {
            appendSide(sb, "new", vv, vt, vq)
          }
        }
        sb.append('}')
      }
      i += 1
    }
    sb.append("}}")
    UTF8String.fromString(sb.toString)
  }

  private def appendSide(sb: java.lang.StringBuilder, side: String,
                         v: UTF8String, t: UTF8String, q: Boolean): Unit = {
    sb.append('"').append(side).append("\":{\"v\":")
    appendJsonString(sb, v)
    sb.append(",\"t\":")
    appendJsonString(sb, t)
    sb.append(",\"q\":\"").append(if (q) "true" else "false").append("\"}")
  }

  /** Jackson-compatible string escaping: `"`, `\`, control chars. */
  private def appendJsonString(sb: java.lang.StringBuilder, s: UTF8String): Unit = {
    if (s == null) { sb.append("null"); return }
    sb.append('"')
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** `yyyy-MM-dd'T'HH:mm:ss'Z'` in UTC; 0 → the reference's PG 9–11
    * epoch fallback (marshaller.go:42,304-310).
    */
  private def appendTime(sb: java.lang.StringBuilder, ms: Long): Unit = {
    if (ms == 0L) { sb.append("1970-01-01T00:00:01Z"); return }
    val dt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(ms, 1000L), 0, java.time.ZoneOffset.UTC)
    pad4(sb, dt.getYear); sb.append('-')
    pad2(sb, dt.getMonthValue); sb.append('-')
    pad2(sb, dt.getDayOfMonth); sb.append('T')
    pad2(sb, dt.getHour); sb.append(':')
    pad2(sb, dt.getMinute); sb.append(':')
    pad2(sb, dt.getSecond); sb.append('Z')
  }
  private def pad2(sb: java.lang.StringBuilder, v: Int): Unit = {
    if (v < 10) sb.append('0')
    sb.append(v)
  }
  private def pad4(sb: java.lang.StringBuilder, v: Int): Unit = {
    if (v < 1000) sb.append(if (v < 10) "000" else if (v < 100) "00" else "0")
    sb.append(v)
  }
}
