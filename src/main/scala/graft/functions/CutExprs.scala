package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `apply_normalized_cuts(text, cuts)` → string: excise from the RAW
  * text the character ranges that a list of cut intervals denotes in
  * NORMALIZED coordinates.
  *
  * The span detector ([[graft.ops.Dedup.repeatedSpans]]) measures
  * positions over `TextAnalysis.normalize(text)` — `lower(trim(text))`
  * with `\s+` runs collapsed to one space — because matching must be
  * case- and whitespace-insensitive. The surgery, however, should not
  * destroy the surviving text's case and spacing (the reference
  * ExactSubstr edits the original token stream). This expression
  * closes that gap: it re-derives the normalization as a POSITION MAP
  * (normalized codepoint index → raw codepoint index) by one walk over
  * the raw text, then removes the raw ranges corresponding to each
  * normalized cut interval, leaving every kept character byte-exact.
  *
  * `cuts` is `array<struct<s:int, l:int>>` — 1-based normalized start
  * and length, sorted ascending by `s` (the caller's `sort_array`);
  * overlapping and nested intervals merge through a running
  * max-end cursor, the same fold semantics as the normalized-text
  * surgery. A cut whose boundary falls inside a collapsed whitespace
  * run maps to the run's start, so the run survives whenever any of it
  * is outside the cut. The leading/trailing spaces `trim` would strip
  * are never inside any normalized interval and are always kept.
  *
  * Position-map details mirror Spark's `lower`/`trim`/`regexp_replace`
  * exactly for the cases that shift positions: `trim` strips only
  * U+0020; Java-regex `\s` is the six ASCII whitespace chars; and a
  * codepoint whose lowercase form expands (e.g. U+0130 → "i̇")
  * contributes that many normalized positions, all mapping back to the
  * single raw codepoint.
  */
case class ApplyNormalizedCuts(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "apply_normalized_cuts"

  override def nullSafeEval(text: Any, cuts: Any): Any =
    ApplyNormalizedCuts.compute(
      text.asInstanceOf[UTF8String], cuts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.ApplyNormalizedCuts.compute($t, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ApplyNormalizedCuts =
    copy(left = newLeft, right = newRight)
}

object ApplyNormalizedCuts {

  // Java regex \s (what normalize's regexp_replace collapses): the six
  // ASCII whitespace chars, NOT Unicode whitespace.
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def compute(text: UTF8String, cuts: ArrayData): UTF8String = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    // trim() strips only U+0020 at the ends
    var a = 0
    while (a < n && cps(a) == ' ') a += 1
    var b = n
    while (b > a && cps(b - 1) == ' ') b -= 1

    // norm2raw(j) = raw codepoint index owning normalized position j
    // (0-based); sentinel norm2raw(normLen) = b. Sized for the no-
    // expansion common case; grown only if a lowercase mapping expands.
    var map = new Array[Int](b - a + 1)
    var m = 0
    def push(raw: Int): Unit = {
      if (m == map.length) map = java.util.Arrays.copyOf(map, map.length * 2)
      map(m) = raw
      m += 1
    }
    var i = a
    while (i < b) {
      if (isWs(cps(i))) {
        push(i) // the whole run is one normalized space
        while (i < b && isWs(cps(i))) i += 1
      } else {
        val lower = new String(Character.toChars(cps(i))).toLowerCase
        val w = lower.codePointCount(0, lower.length)
        var j = 0
        while (j < w) { push(i); j += 1 }
        i += 1
      }
    }
    val normLen = m
    def rawAt(normIdx: Int): Int = if (normIdx >= normLen) b else map(normIdx)

    val sb = new java.lang.StringBuilder(n)
    def append(from: Int, until: Int): Unit = {
      var p = from
      while (p < until) { sb.appendCodePoint(cps(p)); p += 1 }
    }

    var cursor = 0   // raw codepoints emitted so far
    var nextNorm = 1 // 1-based: first normalized position not yet cut
    val nc = cuts.numElements()
    var ci = 0
    while (ci < nc) {
      val cut = cuts.getStruct(ci, 2)
      val s = cut.getInt(0)
      val e = s + cut.getInt(1) // exclusive, 1-based
      val cs = math.max(s, nextNorm)
      if (e > cs) {
        var rawStart = rawAt(cs - 1)
        // Keep-if-any-part-survives, expansion edition: when the cut
        // starts MID lowercase-expansion (the preceding normalized
        // position maps to the same raw codepoint) and that preceding
        // position was not itself cut, the raw codepoint is only
        // partially inside the cut — keep it, advancing the excision
        // start to the next distinct raw index. Mirrors the whitespace
        // -run rule and the (already partial-keeping) cut-END side.
        if (cs >= 2 && cs - 1 >= nextNorm && cs - 1 < normLen &&
            map(cs - 2) == rawStart) {
          var r = cs - 1
          while (r < normLen && map(r) == rawStart) r += 1
          rawStart = rawAt(r)
        }
        if (rawStart > cursor) append(cursor, rawStart)
        // rawStart may now exceed rawAt(e-1) (cut fully inside one
        // expansion); the cursor must not fall back before text
        // already emitted or the next append would duplicate it
        cursor = math.max(cursor, math.max(rawStart, rawAt(e - 1)))
        nextNorm = e
      }
      ci += 1
    }
    if (cursor < n) append(cursor, n)
    UTF8String.fromString(sb.toString)
  }
}
