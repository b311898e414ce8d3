package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `repetition_profile(tokens)` → one struct with every per-document
  * repetition statistic the Gopher/MassiveText-style quality filters
  * need, computed in a single compiled pass over the token array:
  *
  *   - `tok_cnt` / `tok_distinct` — token count and distinct-token
  *     count (→ the distinct-token ratio);
  *   - per requested gram order `n`: `top{n}` (occurrences of the most
  *     frequent word n-gram), `dup{n}` (total occurrences of n-grams
  *     appearing at least twice), `cnt{n}` (number of gram positions).
  *
  * Gram semantics match [[graft.ops.Dedup.wordShingles]]: a document
  * with ≤ n tokens contributes its whole text as ONE shingle (so
  * `cnt = 1, top = 1, dup = 0`), which keeps the empty-document and
  * short-document behavior identical to the declarative form and the
  * DuckDB oracle.
  *
  * Why native: the declarative version (sorted gram list folded with
  * the `aggregate` higher-order function) is interpreted per element
  * with a struct accumulator — ~70× slower at sf0.1. Here the per-row
  * work is one compiled hash-count pass; grams are compared by content
  * (joined with a single space — injective, since tokens contain no
  * whitespace), so there is no hash-collision caveat.
  */
case class RepetitionProfile(child: Expression, ns: Seq[Int])
  extends UnaryExpression {
  require(ns.nonEmpty && ns.forall(_ >= 1), "gram orders must be positive")

  override def dataType: DataType = StructType(
    StructField("tok_cnt", LongType, nullable = false) +:
    StructField("tok_distinct", LongType, nullable = false) +:
    ns.flatMap(n => Seq(
      StructField(s"top$n", LongType, nullable = false),
      StructField(s"dup$n", LongType, nullable = false),
      StructField(s"cnt$n", LongType, nullable = false))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_profile needs array<string> tokens, got ${other.sql}")
  }

  override def prettyName: String = "repetition_profile"

  @transient private lazy val nsArr: Array[Int] = ns.toArray

  override def nullSafeEval(input: Any): Any =
    RepetitionProfile.compute(input.asInstanceOf[ArrayData], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", nsArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionProfile.compute($c, $nsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionProfile =
    copy(child = newChild)
}

object RepetitionProfile {

  private val Space = UTF8String.fromString(" ")

  /** The gram at position `p`: tokens `p .. p+n-1` joined by a single
    * space. Injective over n-token windows (tokens are whitespace-free).
    */
  private def gram(toks: Array[UTF8String], p: Int, n: Int): UTF8String = {
    if (n == 1) return toks(p)
    val parts = new Array[UTF8String](2 * n - 1)
    var i = 0
    while (i < n) {
      parts(2 * i) = toks(p + i)
      if (i < n - 1) parts(2 * i + 1) = Space
      i += 1
    }
    UTF8String.concat(parts: _*)
  }

  def compute(arr: ArrayData, ns: Array[Int]): InternalRow = {
    val t = arr.numElements()
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) UTF8String.EMPTY_UTF8 else s
      i += 1
    }

    val out = new Array[Any](2 + 3 * ns.length)
    out(0) = t.toLong
    val distinct = new java.util.HashSet[UTF8String](Math.max(16, t * 2))
    i = 0
    while (i < t) { distinct.add(toks(i)); i += 1 }
    out(1) = distinct.size.toLong

    var j = 0
    while (j < ns.length) {
      val n = ns(j)
      var top = 0L
      var dup = 0L
      var cnt = 0L
      if (t <= n) {
        // whole text as a single shingle: one gram, seen once
        top = 1L; dup = 0L; cnt = 1L
      } else {
        val positions = t - n + 1
        cnt = positions.toLong
        val freq = new java.util.HashMap[UTF8String, Array[Long]](positions * 2)
        var p = 0
        while (p < positions) {
          val g = gram(toks, p, n)
          val c = freq.get(g)
          if (c == null) freq.put(g, Array(1L)) else c(0) += 1L
          p += 1
        }
        val it = freq.values().iterator()
        while (it.hasNext) {
          val c = it.next()(0)
          if (c > top) top = c
          if (c >= 2L) dup += c
        }
      }
      out(2 + 3 * j) = top
      out(3 + 3 * j) = dup
      out(4 + 3 * j) = cnt
      j += 1
    }
    new GenericInternalRow(out)
  }
}
