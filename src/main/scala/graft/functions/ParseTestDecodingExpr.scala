package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.immutable.VectorMap

import graft.model.{ChangeRecord, ColumnValue}
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

object ParseTestDecoding {

  /** Static entry shared by interpreted eval and generated code. */
  def parseToRow(line: UTF8String): InternalRow = {
    if (line == null) return null
    val parsed = TestDecodingParser.parseOrNull(line.toString)
    if (parsed == null) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(parsed.txn),
      UTF8String.fromString(parsed.relation),
      UTF8String.fromString(parsed.operation),
      parsed.noTupleData,
      toMapData(parsed.columns),
      toMapData(parsed.oldColumns)))
  }

  private def toMapData(m: VectorMap[String, ColumnValue]): ArrayBasedMapData = {
    val n = m.size
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    var i = 0
    m.foreach { case (k, cv) =>
      keys(i) = UTF8String.fromString(k)
      values(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(cv.v), UTF8String.fromString(cv.t), cv.q))
      i += 1
    }
    ArrayBasedMapData(keys, values)
  }
}
