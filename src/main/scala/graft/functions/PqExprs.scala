package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization expressions (Jégou, Douze, Schmid — "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split a
  * D-dim vector into M subvectors, quantize each against a per-subspace
  * codebook of K centroids, store M small codes instead of D floats.
  * Search scores a code sequence against a per-query lookup table
  * (asymmetric distance computation) — M array reads per candidate
  * instead of a D-element dot product.
  *
  * Codebook matrices ride as referenced objects (never plan literals),
  * like the other vector expressions.
  */

/** `pq_encode(vec)` → array<int> of M codes: per subspace, the index of
  * the nearest codebook centroid (ties toward the lower index).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqEncode.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def compute(vec: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val len = vec.numElements() // dims past the vector's end read as 0,
    val out = new Array[Int](m) // like HyperplaneBuckets/NearestCells
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0d
        var i = 0
        while (i < dsub) {
          val x = (if (base + i < len) vec.getDouble(base + i) else 0.0d) - c(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_lut(vec)` → array<double> of M·K entries: the query's lookup
  * table — entry m·K + j is the dot product of the query's m-th
  * subvector with centroid j of codebook m. Executor-side twin of the
  * driver loop in `Similarity.pqTopK` (same loop order, bit-identical
  * results), so a query set too large to collect can build its LUTs
  * distributed. Input must already be L2-normalized.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any =
    PqLut.compute(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqLut.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  def compute(vec: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    val len = vec.numElements() // dims past the end read as 0, like PqEncode
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var j = 0
      while (j < ksub) {
        val c = codebooks(s)(j)
        var dot = 0.0d
        var i = 0
        while (i < dsub) {
          dot += (if (base + i < len) vec.getDouble(base + i) else 0.0d) * c(i)
          i += 1
        }
        lut(s * ksub + j) = dot
        j += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }
}

/** `pq_adc_score(codes, lut)` → double: Σ_m lut[m·K + codes[m]] — the
  * asymmetric distance (here: approximate dot product) of an encoded
  * candidate against a query's flattened M×K lookup table.
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcScore.compute(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqAdcScore.compute($a, $b, $ksub);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def compute(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var score = 0.0d
    var s = 0
    while (s < m) {
      score += lut.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    score
  }
}
