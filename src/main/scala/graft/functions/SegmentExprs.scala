package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `window_segments(text)` → array<string>: the text normalized
  * (lowercase, ASCII-whitespace runs → single space, outer whitespace
  * dropped) and cut into windows of `w` tokens, the final window
  * possibly shorter — [[graft.ops.Dedup.windowSegments]]' contract in
  * ONE byte-level pass.
  *
  * Why native: the compositional form needs either a
  * `transform(sequence, i -> slice(toks, ...))` (lambda bodies defeat
  * common-subexpression elimination — the tokenizer re-runs per
  * window) or a marker-insert regex whose `((?:\S+ ){w-1}\S+) `
  * pattern measured ~24 s alone over the 5M-doc probe corpus (90 % of
  * the segmentation stage). This pass is O(bytes) with no regex.
  * Whitespace is the ASCII `\s` class of the regex it replaces
  * (space, TAB, LF, VT, FF, CR); multi-byte UTF-8 is untouched
  * (continuation bytes are never in that class), and lowercasing is
  * `UTF8String.toLowerCase` — the same call `lower()` makes.
  */
case class WindowSegments(child: Expression, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_segments"

  override def nullSafeEval(input: Any): Any =
    WindowSegments.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowSegments.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowSegments =
    copy(child = newChild)
}

/** `window_segment_hashes(text)` → array<bigint>: element `i` is
  * EXACTLY `xxhash64(window_segments(text)[i])` (same bytes, same
  * seed 42), without ever allocating the segment strings — the
  * occurrence side of [[graft.ops.Dedup.dropDuplicateSegments]] needs
  * only (position, content-hash) pairs, so the aggregation path stays
  * allocation-free while the reassembly side keeps the strings.
  */
case class WindowSegmentHashes(child: Expression, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_segment_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowSegments.computeHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowSegments.computeHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowSegmentHashes =
    copy(child = newChild)
}

/** `adjacent_pairs(text)` → array<string>: every adjacent token
  * bigram "a b" of the normalized text — the pair stream behind
  * [[graft.ops.TextAnalysis.adjacentPairCounts]]. In the normalized
  * buffer tokens are single-space separated, so each pair is a
  * CONTIGUOUS byte range: one normalize pass, then zero-copy slices —
  * no per-pair concat. (The compositional
  * `zip_with(slice(toks,...), slice(toks,...), concat)` measured
  * ~30 s of the 41 s pair-count job at 5 M docs.) < 2 tokens → empty.
  */
case class AdjacentPairs(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "adjacent_pairs"

  override def nullSafeEval(input: Any): Any =
    WindowSegments.computePairs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowSegments.computePairs($c);")

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
}

object WindowSegments {

  /** Spark's `xxhash64` default seed. */
  private val XxSeed = 42L

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Lowercase + collapse into a fresh buffer; returns the buffer and
    * its used length. No leading/trailing space survives.
    */
  private def normalizeBuf(text: UTF8String): (Array[Byte], Int) = {
    val b = text.toLowerCase.getBytes
    val buf = new Array[Byte](b.length)
    var n = 0
    var i = 0
    var pending = false
    while (i < b.length) {
      val c = b(i)
      if (isWs(c)) {
        if (n > 0) pending = true
      } else {
        if (pending) { buf(n) = 0x20; n += 1; pending = false }
        buf(n) = c
        n += 1
      }
      i += 1
    }
    (buf, n)
  }

  /** Flattened (start, end) byte bounds of each `w`-token window of
    * the normalized buffer.
    */
  private def windowBounds(buf: Array[Byte], n: Int, w: Int): Array[Int] = {
    if (n == 0) return Array.emptyIntArray
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](16)
    var start = 0
    var tok = 0
    var j = 0
    while (j <= n) {
      if (j == n || buf(j) == 0x20) {
        tok += 1
        if (tok == w || j == n) {
          bounds += start
          bounds += j
          tok = 0
          start = j + 1
        }
      }
      j += 1
    }
    bounds.toArray
  }

  def compute(text: UTF8String, w: Int): ArrayData = {
    val (buf, n) = normalizeBuf(text)
    val bounds = windowBounds(buf, n, w)
    val out = new Array[AnyRef](bounds.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = UTF8String.fromBytes(buf, bounds(2 * i), bounds(2 * i + 1) - bounds(2 * i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def computePairs(text: UTF8String): ArrayData = {
    val (buf, n) = normalizeBuf(text)
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    // token bounds: starts/ends within the single-spaced buffer
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var j = 0
    var start = 0
    while (j <= n) {
      if (j == n || buf(j) == 0x20) {
        starts += start
        ends += j
        start = j + 1
      }
      j += 1
    }
    val nTok = starts.length
    if (nTok < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](nTok - 1)
    var i = 0
    while (i < nTok - 1) {
      out(i) = UTF8String.fromBytes(buf, starts(i), ends(i + 1) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def computeHashes(text: UTF8String, w: Int): ArrayData = {
    val (buf, n) = normalizeBuf(text)
    val bounds = windowBounds(buf, n, w)
    val out = new Array[Long](bounds.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = XXH64.hashUnsafeBytes(
        buf, Platform.BYTE_ARRAY_OFFSET + bounds(2 * i),
        bounds(2 * i + 1) - bounds(2 * i), XxSeed)
      i += 1
    }
    new GenericArrayData(out)
  }
}
