package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/** Shared 64-bit string hashing for the sketch expressions: two
  * Murmur3 32-bit passes with different seeds packed into a long —
  * deterministic across JVMs and sessions (no object identity hashing).
  */
object StringHash64 {
  def hash(s: String, seed: Int): Long = {
    val h1 = MurmurHash3.stringHash(s, seed)
    val h2 = MurmurHash3.stringHash(s, seed ^ 0x5bd1e995)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }
}

/** `minhash_signature(tokens)` → array<bigint> of length `numHashes`:
  * element i is the minimum over all tokens of a 64-bit hash seeded
  * with `seed + i`. Equal token multisets → equal signatures; the
  * probability that two sets agree on element i equals their Jaccard
  * similarity — the standard MinHash estimator used for LSH
  * deduplication. Computed per-row with no shuffle (contrast with the
  * explode/groupBy formulation, which pays two exchanges).
  *
  * Codegen emits a single static call, keeping whole-stage fusion.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $numHashes, $seed);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** splitmix64 finalizer — turns one base hash into `numHashes`
    * independent-enough hash functions with two multiply-xor rounds,
    * instead of re-hashing the token string per function (64× fewer
    * string traversals; this is the per-row hot loop of LSH dedup).
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(tokens: ArrayData, numHashes: Int, seed: Int): ArrayData = {
    val n = tokens.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val base = StringHash64.hash(tokens.getUTF8String(i).toString, seed)
        var j = 0
        while (j < numHashes) {
          val h = mix(base ^ (j * 0xd6e8feb86659fd93L))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** `simhash64(tokens)` → bigint: 64-bit SimHash. Each token votes its
  * hash bits up/down; the sign of each bit-sum forms the fingerprint.
  * Near-duplicate texts differ in few bits (small Hamming distance),
  * so equality on 16-bit bands is a sound blocking key.
  */
case class SimHash64(child: Expression, seed: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c, $seed);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(tokens: ArrayData, seed: Int): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = StringHash64.hash(tokens.getUTF8String(i).toString, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
