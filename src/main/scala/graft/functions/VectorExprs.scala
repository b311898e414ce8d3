package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector expressions for the similarity/dedup operators.
  *
  * The compositional forms (per-plane `zip_with`/`aggregate` column
  * trees) work but bloat the plan: 8–48 unrolled dot products inline
  * 64-element literal arrays into the plan tree (30k–100k characters),
  * which costs seconds of planning + Janino compilation per query and
  * re-allocates intermediate arrays per row. Each expression here is
  * one static call over a broadcast-referenced `double[][]` — constant
  * plan size, tight loops, no intermediate allocation — mirroring the
  * round-1 lesson from the MinHash expressions.
  */
/** `cosine_sim(a, b)` → double: cosine similarity of two array<double>
  * columns in one fused loop (dot product and both norms accumulated
  * together, left-to-right — bit-identical to the former
  * `zip_with`+`aggregate` formulation). NULL if either side is NULL or
  * lengths differ.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Double r = graft.functions.CosineSim.compute($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** `hyperplane_buckets(vec)` → array<int> of length `bands`: element b
  * packs the sign bits of the vector's projections onto that band's
  * `nBits` random hyperplanes (bit i set iff dot ≥ 0). Plane matrices
  * are derived deterministically from (seed, bands, nBits, dim) inside
  * the expression — they never appear in the plan — and ride to
  * executors as one referenced object.
  */
case class HyperplaneBuckets(child: Expression, dim: Int, nBits: Int, bands: Int, seed: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneBuckets.planes(dim, nBits, bands, seed)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hbPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneBuckets.compute($c, $ref, $nBits);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** Deterministic Gaussian planes; generation order matches the former
    * `Array.fill(bands, nBits)(Array.fill(dim)(rnd.nextGaussian()))`
    * column-tree builders, so bucket assignments are unchanged.
    */
  def planes(dim: Int, nBits: Int, bands: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands * nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def compute(vec: ArrayData, planes: Array[Array[Double]], nBits: Int): ArrayData = {
    val bands = planes.length / nBits
    val n = vec.numElements()
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var i = 0
      while (i < nBits) {
        val p = planes(b * nBits + i)
        var dot = 0.0d
        val d = math.min(n, p.length)
        var j = 0
        while (j < d) { dot += vec.getDouble(j) * p(j); j += 1 }
        if (dot >= 0) bucket |= (1 << i)
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `nearest_cells(vec)` → array<int>: indices of the `nprobe` centroids
  * nearest to the vector (by squared distance, equivalently descending
  * `2·dot − ‖c‖²`), ties broken toward the lower index. The centroid
  * matrix is a referenced object, not plan literals.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  @transient private lazy val normsSq: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum)

  override def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], centroids, normsSq, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("ivfNormsSq", normsSq, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCells.compute($c, $cRef, $nRef, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  // centroids is an Array — exclude it from case-class equality noise in
  // plan comparisons by relying on reference semantics (each call site
  // builds its own instance; canonicalization is not load-bearing here).
}

object NearestCells {
  def compute(vec: ArrayData, centroids: Array[Array[Double]], normsSq: Array[Double],
              nprobe: Int): ArrayData = {
    val k = centroids.length
    val n = vec.numElements()
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = centroids(c)
      var dot = 0.0d
      val d = math.min(n, cv.length)
      var j = 0
      while (j < d) { dot += vec.getDouble(j) * cv(j); j += 1 }
      scores(c) = 2.0d * dot - normsSq(c)
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && scores(i) > bestS) { bestS = scores(i); best = i }
        i += 1
      }
      if (best < 0) {
        // all remaining scores are NaN (dirty vector): fall back to the
        // first untaken cell instead of crashing the task
        var i2 = 0
        while (best < 0 && i2 < k) { if (!taken(i2)) best = i2; i2 += 1 }
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}
