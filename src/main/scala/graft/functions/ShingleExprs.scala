package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text)` → array<bigint>: the distinct 64-bit hashes
  * of the word k-shingles of the normalized text (lowercased, trimmed,
  * whitespace-collapsed). Texts with ≤ k tokens produce the single
  * shingle of the whole normalized text — the same contract as
  * [[graft.ops.Dedup.wordShingles]] followed by per-shingle hashing,
  * but in ONE pass over the string.
  *
  * Why native: the compositional Column form (`split` → `transform` →
  * `slice` → `concat_ws` → `xxhash64` → `array_distinct`) re-evaluates
  * the token array per shingle position once Catalyst inlines the
  * common subexpression — O(tokens²) string work per row that showed up
  * as the dominant cost of LSH dedup at bench scale. This expression is
  * O(chars + shingles).
  */
case class ShingleHashes(child: Expression, k: Int, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $k, $seed);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  def compute(text: UTF8String, k: Int, seed: Int): ArrayData = {
    val s = text.toString.toLowerCase
    // tokenize on runs of whitespace (≡ trim + split("\\s+"))
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) tokens += s.substring(start, i)
    }
    val hashes = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    if (tokens.length <= k) {
      sb.setLength(0)
      var j = 0
      while (j < tokens.length) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(j)); j += 1
      }
      hashes.add(StringHash64.hash(sb.toString, seed))
    } else {
      var p = 0
      val last = tokens.length - k
      while (p <= last) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(p + j)); j += 1
        }
        hashes.add(StringHash64.hash(sb.toString, seed))
        p += 1
      }
    }
    val out = new Array[Long](hashes.size)
    val it = hashes.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `minhash_from_hashes(hashes)` → array<bigint> of length `numHashes`:
  * MinHash signature derived from pre-hashed shingles with a splitmix64
  * remix per hash function (no further string work).
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_from_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashFromHashes.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashFromHashes.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

object MinHashFromHashes {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = mix(base ^ (j * 0xd6e8feb86659fd93L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** `jaccard_long(a, b)` → double: exact Jaccard similarity of two
  * bigint-array SETS (inputs must already be distinct, which
  * [[ShingleHashes]] guarantees). Primitive sort + linear merge — no
  * per-element boxing, unlike composing array_intersect/array_union,
  * which dominated the pair-verification stage of LSH dedup.
  */
case class JaccardLong(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardLong.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardLong.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLong =
    copy(left = newLeft, right = newRight)
}

object JaccardLong {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = xs(i); val y = ys(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }
}
