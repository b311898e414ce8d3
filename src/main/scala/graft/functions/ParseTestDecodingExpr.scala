package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

import graft.model.ChangeRecord
import graft.parser.TestDecodingParser

/** Catalyst expression `parse_test_decoding(line)` → struct<txn, relation,
  * operation, noTupleData, columns, oldColumns> (see
  * [[graft.model.ChangeRecord.parsedType]]). Returns NULL for lines the
  * automaton rejects.
  *
  * Participates in whole-stage codegen: the generated code is a single
  * static call into [[ParseTestDecoding.parseToRow]], so the surrounding
  * filter/projection pipeline stays fused (no CodegenFallback iterator
  * break).
  */
case class ParseTestDecoding(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ChangeRecord.parsedType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_test_decoding"

  override def nullSafeEval(input: Any): Any =
    ParseTestDecoding.parseToRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ParseTestDecoding.parseToRow($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ParseTestDecoding =
    copy(child = newChild)
}

/** `parse_prelude(line, field)` → string: relation (field 0) or
  * operation (field 1) from the prelude-only parse — the automaton
  * stops after the operation and allocates no column maps. This is the
  * reference's two-phase design (parselogical.go:89-95): the table
  * filter runs on the cheap prelude so predicate pushdown can duplicate
  * it freely, and the full `parse_test_decoding` is evaluated exactly
  * once, above the filter.
  */
case class ParsePreludeField(child: Expression, field: Int) extends UnaryExpression {
  require(field == 0 || field == 1, "field: 0 = relation, 1 = operation")

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (field == 0) "prelude_relation" else "prelude_operation"

  override def nullSafeEval(input: Any): Any =
    ParseTestDecoding.preludeField(input.asInstanceOf[UTF8String], field)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ParseTestDecoding.preludeField($c, $field);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ParsePreludeField =
    copy(child = newChild)
}

object ParseTestDecoding {

  /** Static prelude entry shared by interpreted eval and codegen. */
  def preludeField(line: UTF8String, field: Int): UTF8String = {
    if (line == null) return null
    val o = TestDecodingParser.parsePreludeOrNull(line.toString)
    if (o == null) null
    else UTF8String.fromString(if (field == 0) o.relation else o.operation)
  }

  /** Array-backed sink: columns land directly as UTF8String rows, no
    * intermediate immutable maps (this is the per-record hot path).
    */
  private final class RowSink extends TestDecodingParser.ColumnSink {
    val newKeys = new ArrayBuffer[Any](8)
    val newVals = new ArrayBuffer[Any](8)
    val oldKeys = new ArrayBuffer[Any](8)
    val oldVals = new ArrayBuffer[Any](8)
    def add(oldSection: Boolean, name: String, v: String, t: String, q: Boolean): Unit = {
      val row = new GenericInternalRow(Array[Any](
        UTF8String.fromString(v), UTF8String.fromString(t), q))
      if (oldSection) { oldKeys += UTF8String.fromString(name); oldVals += row }
      else { newKeys += UTF8String.fromString(name); newVals += row }
    }
  }

  /** Static entry shared by interpreted eval and generated code. */
  def parseToRow(line: UTF8String): InternalRow = {
    if (line == null) return null
    val sink = new RowSink
    val o = TestDecodingParser.parseInto(line.toString, sink)
    if (o == null) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(o.txn),
      UTF8String.fromString(o.relation),
      UTF8String.fromString(o.operation),
      o.noTupleData,
      ArrayBasedMapData(sink.newKeys.toArray, sink.newVals.toArray),
      ArrayBasedMapData(sink.oldKeys.toArray, sink.oldVals.toArray)))
  }
}
