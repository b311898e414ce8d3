package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is
  *    broadcast (queries ≪ corpus), so the corpus is scanned once with
  *    no shuffle of the corpus itself; per-query ranking shuffles only
  *    (queries × corpus) similarity rows — at large scale pre-reduce
  *    with a per-partition top-k before the final window if k ≪ rows.
  *  - [[lshTopK]]: random-hyperplane LSH — bucket by sign bits of
  *    projections onto `nBits` fixed random directions, probe the
  *    query's bucket (plus neighboring buckets by flipping bits up to
  *    `probeHamming`), rank only within candidates. The scale path:
  *    candidate count is corpus/2^nBits per probe on average.
  *
  * Ranking ties are broken by id and similarity is ranked on a
  * 6-decimal rounding, making results reproducible across engines and
  * partitionings.
  */
object Similarity {

  private def rankedTopK(scored: DataFrame, k: Int): DataFrame = {
    // Pre-reduce before the ranking shuffle: each scan partition keeps
    // only its own top-k per query (bounded heap, same ordering as the
    // final rank), so the exchange moves ≤ partitions × queries × k
    // rows instead of queries × corpus — the difference between a
    // broadcast-scan plan that scales to a 100 TB corpus and one whose
    // window exchange IS the corpus. Falls back to the plain window
    // when ids aren't integral (the heap is typed).
    import org.apache.spark.sql.types.{LongType, IntegerType}
    val integralIds = Seq("query_id", "neighbor_id").forall { c =>
      scored.schema(c).dataType == LongType || scored.schema(c).dataType == IntegerType
    }
    val reduced =
      if (!integralIds) scored
      else {
        val spark = scored.sparkSession
        import spark.implicits._
        // "worst" = lower sim, then higher neighbor id (the final
        // ordering reversed) — the heap's head is the eviction victim
        val worstFirst: Ordering[(Long, Long, Double)] = (a, b) => {
          val c = java.lang.Double.compare(b._3, a._3)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
        scored
          .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
            col("sim_r").cast("double"))
          .as[(Long, Long, Double)]
          .mapPartitions { it =>
            val heaps = scala.collection.mutable.HashMap
              .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long, Double)]]
            it.foreach { row =>
              val h = heaps.getOrElseUpdate(row._1,
                scala.collection.mutable.PriorityQueue.empty(worstFirst))
              if (h.size < k) h.enqueue(row)
              else if (worstFirst.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row) }
            }
            heaps.valuesIterator.flatMap(_.iterator)
          }
          .toDF("query_id", "neighbor_id", "sim_r")
          // restore the caller's id types — the optimization must be
          // schema-invariant, not silently widen int ids to bigint
          .select(
            col("query_id").cast(scored.schema("query_id").dataType),
            col("neighbor_id").cast(scored.schema("neighbor_id").dataType),
            col("sim_r"))
      }
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim_r").desc, col("neighbor_id"))
    reduced
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim_r")
  }

  /** Exact cosine top-k of `queries` against `corpus`; both must have
    * (`idCol`, `vecCol`). Self-matches (same id) are excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(GraftFunctions.cosine_similarity(col("q_vec"), col("c_vec")), 6))
    rankedTopK(scored, k)
  }

  /** LSH-bucketed approximate top-k. `dim` must match the embedding
    * length. Probing flips up to `probeHamming` sign bits of the query
    * signature (1 + nBits buckets for probeHamming=1).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nBits: Int = 8, probeHamming: Int = 1, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nBits <= 30, "bucket key packs into an int")

    // Single-band native signature: constant plan size, one fused loop
    // (the unrolled per-bit trees cost ~30 kB of plan per query).
    def signature(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      element_at(
        GraftFunctions.hyperplane_buckets(vec, dim, nBits, bands = 1, seed), 1)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("bucket", signature(col("c_vec")))

    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("sig", signature(col("q_vec")))
    // probe buckets: the signature itself plus single-bit flips
    val flips = 0 until (if (probeHamming >= 1) nBits else 0)
    val probes = array((lit(0) +: flips.map(b => lit(1 << b))): _*)
    val q = broadcast(qBase
      .withColumn("bucket", explode(transform(probes, m => col("sig").bitwiseXOR(m))))
      .drop("sig"))

    val scored = c.join(q, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(GraftFunctions.cosine_similarity(col("q_vec"), col("c_vec")), 6))
      .select("query_id", "neighbor_id", "sim_r").distinct()
    rankedTopK(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: k-means the corpus into
    * `nlist` cells, search only the `nprobe` cells whose centroids are
    * closest to the query. The standard billion-scale ANN layout —
    * at 100 TB the corpus is *stored* partitioned by cell (partition
    * pruning skips the rest), so a query touches nprobe/nlist of the
    * data. Centroids are fit on a bounded sample (driver-side KMeans
    * over ≤ `fitSampleSize` rows) and broadcast as plain arrays; cell
    * assignment is a codegen'd argmin over the broadcast, no MLlib
    * runtime on the hot path.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      fitSampleSize: Int = 10000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ---- fit centroids on a bounded sample (simple Lloyd's, driver-side)
    val centroids = fitCentroids(corpus, nlist, seed, fitSampleSize, vecCol)

    // ---- native cell assignment against the referenced centroid array
    // (argmin over squared distance == argmax over 2·dot − ‖c‖²): one
    // expression call — centroids never appear as plan literals, so the
    // plan stays constant-size regardless of nlist × dim.
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("cell",
        element_at(GraftFunctions.nearest_cells(col("c_vec"), centroids, 1), 1))

    // queries probe their nprobe nearest cells
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("cell",
        explode(GraftFunctions.nearest_cells(col("q_vec"), centroids, nprobe))))

    val scored = c.join(q, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(GraftFunctions.cosine_similarity(col("q_vec"), col("c_vec")), 6))
      .select("query_id", "neighbor_id", "sim_r")
    rankedTopK(scored, k)
  }

  /** Fit IVF centroids on a bounded sample (driver-side Lloyd's) —
    * shared by [[ivfTopK]] and the stored-layout path.
    */
  def fitCentroids(
      corpus: DataFrame, nlist: Int, seed: Long = 42L,
      fitSampleSize: Int = 10000, vecCol: String = "embedding"): Array[Array[Double]] = {
    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .limit(fitSampleSize).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    lloyd(sample, math.min(nlist, sample.length), seed)
  }

  /** The 100 TB IVF layout: materialize the corpus PARTITIONED BY its
    * cell assignment. Queries then touch only their probed cells'
    * partitions — the scan prunes at the file-listing level, so a
    * query reads ~nprobe/nlist of the data no matter how large the
    * corpus grows.
    */
  def writeCellPartitioned(
      corpus: DataFrame, centroids: Array[Array[Double]], path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    corpus.select(col(idCol), col(vecCol),
      element_at(GraftFunctions.nearest_cells(col(vecCol), centroids, 1), 1).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Top-k against a cell-partitioned corpus: probe cells are computed
    * driver-side from the (small, broadcastable) centroid matrix and
    * pushed as a STATIC partition filter — `.explain` shows
    * `PartitionFilters: [cell IN (…)]` and the scan lists only those
    * directories.
    */
  def ivfTopKPartitioned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, centroids: Array[Array[Double]], nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    // one pass: (query row, its probe cells) — duplicate ids are kept
    // as distinct query rows, same as the non-partitioned path
    val probeRows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .flatMap { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Double](1).toArray
        nearestCells(v, centroids, nprobe).map(c => (id, v.toSeq, c))
      }
    val cells = probeRows.map(_._3).distinct.sorted.toSeq

    val corpus = spark.read.parquet(path)
      .where(col("cell").isin(cells: _*)) // static partition pruning
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("cell"))

    val qDf = broadcast(probeRows.toSeq.toDF("query_id", "q_vec", "cell"))

    val scored = corpus.join(qDf, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(GraftFunctions.cosine_similarity(col("q_vec"), col("c_vec")), 6))
      .select("query_id", "neighbor_id", "sim_r")
    rankedTopK(scored, k)
  }

  /** Product-quantization codebooks: M subspaces × K centroids × D/M
    * dims, fit driver-side on a bounded sample of L2-NORMALIZED vectors
    * (so the ADC score approximates cosine). The standard
    * billion-scale compression: codes are M ints instead of D floats.
    */
  def pqTrain(
      corpus: DataFrame, m: Int, ksub: Int = 16, seed: Long = 42L,
      fitSampleSize: Int = 10000, vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    val sample = corpus.select(col(vecCol).cast("array<double>"))
      .limit(fitSampleSize).collect()
      .map(r => normalize(r.getSeq[Double](0).toArray))
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloyd(sub, math.min(ksub, sub.length), seed + s)
    }.toArray
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0d
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    // divide (don't multiply by the reciprocal): bit-identical to
    // normalizeExpr, so driver-built and executor-built LUTs agree
    if (n == 0) v else { val s = math.sqrt(n); v.map(_ / s) }
  }

  private def lloyd(points: Array[Array[Double]], k: Int, seed: Long): Array[Array[Double]] = {
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    var cs = rnd.shuffle(points.toSeq).take(k).toArray
    var it = 0
    while (it < 10) {
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Int](cs.length)
      points.foreach { p =>
        val c = nearestCentroid(p, cs)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += p(d); d += 1 }
      }
      cs = cs.indices.map { c =>
        if (counts(c) == 0) cs(c)
        else { val s = sums(c); var d = 0; while (d < dim) { s(d) /= counts(c); d += 1 }; s }
      }.toArray
      it += 1
    }
    cs
  }

  /** Encode the corpus: M small codes per row (8–32× smaller than the
    * float vector — at 100 TB, THIS is what you store and scan).
    */
  def pqEncode(
      corpus: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val normed = normalizeExpr(col(vecCol))
    corpus.select(col(idCol),
      column(graft.functions.PqEncode(expression(normed), codebooks)).as("pq_codes"))
  }

  private def normalizeExpr(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val vd = vec.cast("array<double>")
    val n = sqrt(aggregate(vd, lit(0.0d), (acc, x) => acc + x * x))
    // zero vectors stay zero (NOT 0/0 = NaN), matching the driver-side
    // normalize() so training and encoding agree on degenerate input
    when(n === 0.0d, vd).otherwise(transform(vd, x => x / n))
  }

  /** Approximate cosine top-k over PQ codes via asymmetric distance:
    * each query's M×K lookup table (subvector · centroid dot products)
    * is broadcast; scoring a candidate is M table reads. Ranking reuses
    * the per-partition pre-reduce.
    */
  def pqTopK(
      encoded: DataFrame, queries: DataFrame, k: Int,
      codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val spark = encoded.sparkSession
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length

    val qRows = queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), normalize(r.getSeq[Double](1).toArray)))
    val lutRows = qRows.map { case (id, q) =>
      val lut = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var j = 0
        while (j < ksub) {
          var dot = 0.0d
          var i = 0
          while (i < dsub) { dot += q(s * dsub + i) * codebooks(s)(j)(i); i += 1 }
          lut(s * ksub + j) = dot
          j += 1
        }
        s += 1
      }
      (id, lut.toSeq)
    }
    import spark.implicits._
    val qDf = broadcast(lutRows.toSeq.toDF("query_id", "lut"))

    val scored = encoded.select(col(idCol).as("neighbor_id"), col("pq_codes"))
      .join(qDf, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(column(graft.functions.PqAdcScore(
          expression(col("pq_codes")), expression(col("lut")), ksub)), 6))
      .select("query_id", "neighbor_id", "sim_r")
    rankedTopK(scored, k)
  }

  /** Executor-side twin of [[ivfTopKPartitioned]] for query sets too
    * large to collect: probe cells come from the native
    * `nearest_cells` expression over the broadcast centroid matrix —
    * the query DataFrame is never driver-materialized. The cell join
    * prunes the partitioned store at runtime (dynamic partition
    * pruning / AQE) instead of via a static PartitionFilter; use the
    * driver path when queries fit in driver memory and you want the
    * file listing itself pruned.
    */
  def ivfTopKPartitionedDistributed(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, centroids: Array[Array[Double]], nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val q = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("cell",
        explode(GraftFunctions.nearest_cells(col("q_vec"), centroids, nprobe)))
    // The distinct PROBED CELLS are bounded by nlist — independent of
    // query count — so collecting them is always driver-safe, and the
    // static isin pushes a PartitionFilter exactly like the driver
    // path. Without this, a sort-merge cell join scans the full
    // corpus (DPP only fires for broadcast joins by default).
    val cells = q.select(col("cell")).distinct().as[Int].collect().toSeq.sorted
    val corpus = spark.read.parquet(path)
      .where(col("cell").isin(cells: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("cell"))
    val scored = corpus.join(q, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(GraftFunctions.cosine_similarity(col("q_vec"), col("c_vec")), 6))
      .select("query_id", "neighbor_id", "sim_r")
    rankedTopK(scored, k)
  }

  /** The canonical billion-vector layout, composed: PQ codes stored
    * INSIDE the cell-partitioned IVF store. At 100 TB this is what ANN
    * storage looks like — the corpus on disk is M small codes per row
    * (8–32× smaller than the floats), laid out by IVF cell so a query
    * reads only its probed cells' directories. Cell assignment is on
    * the RAW vector (same rule as [[writeCellPartitioned]]); codes
    * encode the NORMALIZED vector (same rule as [[pqEncode]]), so both
    * halves stay bit-compatible with their standalone forms.
    */
  def writeCellPartitionedPq(
      corpus: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    corpus.select(col(idCol),
      column(graft.functions.PqEncode(
        expression(normalizeExpr(col(vecCol))), codebooks)).as("pq_codes"),
      element_at(GraftFunctions.nearest_cells(col(vecCol), centroids, 1), 1).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** Incremental index maintenance: append an ingest batch to an
    * existing [[writeCellPartitioned]] store under the store's FROZEN
    * centroid matrix — the standard billion-scale ingest contract
    * (re-fitting is a scheduled rebuild decided by [[cellDriftReport]],
    * never a per-batch cost). Assignment uses the SAME expression as
    * the full write, so the grown store's per-cell contents are
    * identical to a one-shot write over the union (file boundaries
    * differ; readers see the union with unchanged partition pruning),
    * and the append plan touches ONLY the batch: one scan, no shuffle,
    * and no read or rewrite of the existing store's files
    * (spec-asserted on the pre-existing file set).
    */
  def appendCellPartitioned(
      newVecs: DataFrame, centroids: Array[Array[Double]], path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    newVecs.select(col(idCol), col(vecCol),
      element_at(GraftFunctions.nearest_cells(col(vecCol), centroids, 1), 1).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)

  /** [[appendCellPartitioned]] for the PQ sibling store: the batch is
    * encoded with the FROZEN codebooks (same expression as the full
    * write), so exhaustive-probe search over the grown store stays
    * bit-identical to [[pqTopK]] over the union corpus.
    */
  def appendCellPartitionedPq(
      newVecs: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    newVecs.select(col(idCol),
      column(graft.functions.PqEncode(
        expression(normalizeExpr(col(vecCol))), codebooks)).as("pq_codes"),
      element_at(GraftFunctions.nearest_cells(col(vecCol), centroids, 1), 1).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** The re-fit trigger for an incrementally-grown store: per-cell
    * occupancy and mean angular quantization error of `vecs` (a store
    * read-back, or just a candidate batch) against the frozen
    * centroids. Fully distributed — one hash aggregation; the only
    * small data is the nlist-sized centroid table (broadcast) and the
    * one-row total (broadcast). Rising `mean_qerr` or a growing
    * `occupancy` skew versus the fit-time report is the standard
    * "schedule a rebuild" signal; the store keeps answering queries
    * correctly either way (assignment stays frozen-consistent), it
    * just prunes less effectively as the data drifts.
    */
  def cellDriftReport(
      vecs: DataFrame, centroids: Array[Array[Double]],
      vecCol: String = "embedding"): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val centDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "__centroid")
    val assigned = vecs.select(
      element_at(GraftFunctions.nearest_cells(col(vecCol), centroids, 1), 1).as("cell"),
      col(vecCol).as("__v"))
      .join(broadcast(centDf), Seq("cell"))
      .select(col("cell"),
        (lit(1.0) - GraftFunctions.cosine_similarity(col("__v"), col("__centroid"))).as("__qerr"))
    val perCell = assigned.groupBy("cell").agg(
      count(lit(1)).as("n"),
      round(avg(col("__qerr")), 6).as("mean_qerr"))
    // outer-join against the full centroid list so a fully-starved
    // cell shows up as n=0 / occupancy=0 — an empty cell is exactly
    // the skew signal the rebuild trigger watches for
    val filled = centDf.select(col("cell"))
      .join(perCell.hint("broadcast"), Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n"),
        col("mean_qerr"))
    val total = filled.agg(sum(col("n")).as("__total"))
    filled.crossJoin(broadcast(total))
      .select(col("cell"), col("n"),
        round(col("n") / col("__total"), 6).as("occupancy"),
        col("mean_qerr"))
  }

  /** IVF-PQ search over a [[writeCellPartitionedPq]] store: probe the
    * `nprobe` nearest cells (static partition filter — the scan lists
    * only those directories), score ONLY the probed cells' codes via
    * asymmetric distance (each query's M×K LUT built executor-side by
    * the native `pq_lut`), rank with the per-partition pre-reduce.
    * Per query the work is (nprobe/nlist · corpus) LUT reads — the
    * compressed, pruned scale path. With `nprobe = nlist` the candidate
    * set is the whole corpus and the result is bit-identical to
    * [[pqTopK]] (the PQ value oracle applies verbatim); partial-probe
    * recall is pinned by spec.
    */
  def ivfpqTopK(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int,
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      nprobe: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import spark.implicits._
    val ksub = codebooks(0).length
    val q = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("cell",
        explode(GraftFunctions.nearest_cells(col("q_vec"), centroids, nprobe)))
      .withColumn("lut", column(graft.functions.PqLut(
        expression(normalizeExpr(col("q_vec"))), codebooks)))
      .drop("q_vec")
    // distinct probed cells are bounded by nlist — always driver-safe;
    // the static isin pushes a PartitionFilter (see
    // ivfTopKPartitionedDistributed for why DPP alone is not enough)
    val cells = q.select(col("cell")).distinct().as[Int].collect().toSeq.sorted
    val corpus = spark.read.parquet(path)
      .where(col("cell").isin(cells: _*))
      .select(col(idCol).as("neighbor_id"), col("pq_codes"), col("cell"))
    val scored = corpus.join(q, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(column(graft.functions.PqAdcScore(
          expression(col("pq_codes")), expression(col("lut")), ksub)), 6))
      .select("query_id", "neighbor_id", "sim_r")
      // a corpus row sits in ONE cell, so cell-join candidates are
      // already distinct; no dedup needed before ranking
    rankedTopK(scored, k)
  }

  /** IVF-PQ with exact re-ranking — closes the standard recall gap of
    * asymmetric-distance search. Stage 1 is [[ivfpqTopK]]'s plan ranked
    * to `rerank` candidates per query (c ≈ 4·k) instead of k; stage 2
    * joins those candidates back to their TRUE vectors in the raw
    * cell-partitioned store (`rawPath`, a [[writeCellPartitioned]]
    * layout over the same centroids — the SAME probed-cell partition
    * filter applies, so the re-rank read is as pruned as the code
    * scan) and re-scores exact cosine. Per query the exact work is c
    * dot products over a candidates×queries-sized join — compressed
    * ADC does the heavy sweep, floats are touched only for the sliver.
    *
    * With `nprobe = nlist` and `rerank ≥` the probed candidate count,
    * stage 2 rescoring covers every corpus vector and the result is
    * exactly brute-force top-k — the value-oracle mode (the
    * [[ivfpqTopK]] exhaustive-probe convention); partial-probe recall
    * is pinned by spec.
    */
  def ivfpqRerankTopK(
      spark: org.apache.spark.sql.SparkSession, pqPath: String,
      rawPath: String, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]], codebooks: Array[Array[Array[Double]]],
      nprobe: Int, rerank: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import spark.implicits._
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val ksub = codebooks(0).length
    val q = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("cell",
        explode(GraftFunctions.nearest_cells(col("q_vec"), centroids, nprobe)))
      .withColumn("lut", column(graft.functions.PqLut(
        expression(normalizeExpr(col("q_vec"))), codebooks)))
      .drop("q_vec")
    val cells = q.select(col("cell")).distinct().as[Int].collect().toSeq.sorted
    val codes = spark.read.parquet(pqPath)
      .where(col("cell").isin(cells: _*))
      .select(col(idCol).as("neighbor_id"), col("pq_codes"), col("cell"))
    val adc = codes.join(q, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(column(graft.functions.PqAdcScore(
          expression(col("pq_codes")), expression(col("lut")), ksub)), 6))
      .select("query_id", "neighbor_id", "sim_r")
    val cand = rankedTopK(adc, rerank).select("query_id", "neighbor_id")
    // exact re-score: true vectors only for the c survivors, read from
    // the raw store under the same probed-cell partition filter
    val raw = spark.read.parquet(rawPath)
      .where(col("cell").isin(cells: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"))
    val qv = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val exact = cand.join(raw, Seq("neighbor_id")).join(qv, Seq("query_id"))
      .withColumn("sim_r",
        round(GraftFunctions.cosine_similarity(col("q_vec"), col("n_vec")), 6))
      .select("query_id", "neighbor_id", "sim_r")
    rankedTopK(exact, k)
  }

  /** Executor-side twin of [[pqTopK]]: each query's M×K lookup table is
    * built by the native `pq_lut` expression against the broadcast
    * codebooks — no driver collect, so the query set can be any size.
    * Scores are bit-identical to the driver path (same normalization,
    * same loop order).
    */
  def pqTopKDistributed(
      encoded: DataFrame, queries: DataFrame, k: Int,
      codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val ksub = codebooks(0).length
    val qDf = queries.select(col(idCol).cast("long").as("query_id"),
      column(graft.functions.PqLut(
        expression(normalizeExpr(col(vecCol))), codebooks)).as("lut"))
    val scored = encoded.select(col(idCol).as("neighbor_id"), col("pq_codes"))
      .join(qDf, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim_r",
        round(column(graft.functions.PqAdcScore(
          expression(col("pq_codes")), expression(col("lut")), ksub)), 6))
      .select("query_id", "neighbor_id", "sim_r")
    rankedTopK(scored, k)
  }

  /** Driver-side nprobe-nearest cells — delegates to the SAME scoring
    * the executor-side expression runs, so the cells a query probes are
    * bit-identical to the cells the corpus was written under.
    */
  private def nearestCells(v: Array[Double], cs: Array[Array[Double]], nprobe: Int): Seq[Int] = {
    val out = graft.functions.NearestCells.compute(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
      cs, cs.map(c => c.map(x => x * x).sum), nprobe)
    (0 until out.numElements()).map(out.getInt)
  }

  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}
