package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across retries and
  * re-partitions — a failed stage re-executes with different rows kept,
  * which corrupts exactly-once accounting and makes experiments
  * unrepeatable. Hash sampling keys the keep/drop decision on a STABLE
  * column: the same row always lands on the same side, any engine can
  * reproduce the sample (the DuckDB oracle re-derives it from md5),
  * and the sample composes with incremental ingestion — new data
  * joins the same sample universe without reshuffling old decisions.
  *
  * Scale: a per-row predicate, no shuffle, fully codegen'd; the
  * stratified variant broadcasts only the strata→rate map.
  */
object Sampling {

  /** Bucket 0..buckets-1 from the md5 of the key — the same
    * first-8-hex-chars construction as `Partitioner.Md5`, so the
    * decision is portable across engines (md5 is universal).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Keep rows whose hash bucket falls below `keep` of `buckets` —
    * a deterministic `keep/buckets` sample.
    */
  def hashSample(df: DataFrame, keyCol: String,
                 keep: Int, buckets: Int = 100): DataFrame = {
    require(keep >= 0 && keep <= buckets, s"keep=$keep outside 0..$buckets")
    df.where(hashBucket(col(keyCol), buckets) < keep)
  }

  /** Per-stratum deterministic sampling: each stratum keeps
    * `rates(stratum)` of `buckets` (strata absent from the map keep
    * `defaultKeep`). The rate map rides as a literal map expression —
    * broadcast-sized by construction (strata are enum-like).
    */
  def stratifiedHashSample(
      df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Int], defaultKeep: Int,
      buckets: Int = 100): DataFrame = {
    require((defaultKeep +: rates.values.toSeq).forall(k => k >= 0 && k <= buckets),
      s"rates outside 0..$buckets")
    val rateMap = map(rates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val keep = coalesce(element_at(rateMap, col(strataCol).cast("string")), lit(defaultKeep))
    df.where(hashBucket(col(keyCol), buckets) < keep)
  }

  /** Downsample to a target domain MIXTURE (DoReMi/Pile-style domain
    * weighting at ingest): given relative weights over the strata,
    * emit the largest sample achievable WITHOUT upsampling whose
    * composition matches the weights — the stratum with the scarcest
    * supply relative to its weight is kept whole and every other
    * stratum is hash-downsampled pro rata. Strata absent from the
    * weight map are dropped.
    *
    * The per-stratum keep rates are derived IN the plan: one tiny
    * aggregation for the per-stratum counts, a one-row broadcast for
    * the binding-stratum scale, and a broadcast join of the resulting
    * parts-per-million thresholds back onto the data — no driver
    * collect, no full-data shuffle; the keep decision itself is the
    * same per-row md5 predicate as [[hashSample]] (reproducible
    * across engines, retries, and incremental re-runs).
    *
    * Rates are materialized as ppm (md5 bucket of 1 000 000), so the
    * realized mixture tracks the target to ±0.1 % per stratum.
    */
  def domainMix(df: DataFrame, strataCol: String, keyCol: String,
                weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val wMap = map(weights.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("w", element_at(wMap, col(strataCol).cast("string")))
      .where(col("w").isNotNull)
    val scale = counts.agg(min(col("n") / col("w")).as("scale"))
    val rates = counts.crossJoin(broadcast(scale)).select(
      col(strataCol),
      least(lit(1000000L),
        floor(col("scale") * col("w") / col("n") * 1000000d)).as("__ppm"))
    df.join(broadcast(rates), Seq(strataCol))
      .where(hashBucket(col(keyCol), 1000000).cast("long") < col("__ppm"))
      .select(df.columns.map(col): _*)
  }

  /** Temperature-flattened domain mixture (the multilingual-LM
    * resampling rule, XLM-R/mBERT style): target composition
    * q_i ∝ p_i^alpha where p_i is the domain's natural share. With
    * alpha < 1 the head domains are downsampled toward the tail
    * (alpha → 0 approaches uniform; alpha = 1 is the identity mix).
    * Emits the largest sample achievable WITHOUT upsampling whose
    * composition matches q — the rule is [[domainMix]] with weights
    * p_i^alpha derived IN the plan from the per-domain counts, so no
    * weight map needs to be known up front.
    *
    * Same scale shape as [[domainMix]]: one tiny count aggregation, a
    * one-row broadcast total and binding scale, broadcast ppm
    * thresholds joined back, md5-keyed per-row keep decision
    * (reproducible across engines, retries, incremental re-runs).
    */
  def temperatureMix(df: DataFrame, strataCol: String, keyCol: String,
                     alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha outside (0, 1]")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
    // "__total", not "N": Spark's default resolver is case-insensitive,
    // so an "N" column would collide with "n"
    val total = counts.agg(sum(col("n")).as("__total"))
    val weighted = counts.crossJoin(broadcast(total))
      .withColumn("w", pow(col("n").cast("double") / col("__total"), alpha))
    val scale = weighted.agg(min(col("n") / col("w")).as("scale"))
    val rates = weighted.crossJoin(broadcast(scale)).select(
      col(strataCol),
      least(lit(1000000L),
        floor(col("scale") * col("w") / col("n") * 1000000d)).as("__ppm"))
    df.join(broadcast(rates), Seq(strataCol))
      .where(hashBucket(col(keyCol), 1000000).cast("long") < col("__ppm"))
      .select(df.columns.map(col): _*)
  }

  /** Deterministic global shuffle for training order: ranks every row
    * by the md5 of `(seed, key)` — the canonical "shuffle the corpus
    * before epoch N" step, reproducible across engines, retries, and
    * re-partitions (`rand()`-orderings are none of those). Different
    * seeds give independent permutations for different epochs.
    *
    * Scale: the total order is a range-partitioned distributed sort
    * (the hash is uniform, so range partitions are balanced regardless
    * of key skew), and rank assignment is `zipWithIndex` — one extra
    * count-per-partition job, then per-partition offsets. NOT a global
    * `row_number` window, which would funnel the corpus through a
    * single task. (The RDD hop is the documented legitimate use:
    * per-partition imperative indexing that Catalyst cannot express.)
    */
  def shuffleRank(df: DataFrame, keyCol: String, seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val h = md5(concat(lit(seed.toString), lit(":"), col(keyCol).cast("string")))
    val sorted = df.withColumn("__h", h).orderBy(col("__h"), col(keyCol))
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ StructField("shuffle_rank", LongType, nullable = false))
    val ranked = sorted.drop("__h").rdd.zipWithIndex().map {
      case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(ranked, schema)
  }

  /** Exact global token-budget selection — the corpus-assembly step
    * of a budgeted pretraining mix: keep the highest-score documents
    * whose running weight total, taken in (score DESC, id ASC) order,
    * stays within `budget`. A document survives iff its prefix cumsum
    * ≤ budget — deterministic, ties inside a score break on id.
    *
    * EXACT result with no global sort (the naive form is a
    * single-partition window over the whole corpus), and no skewed
    * per-score window either — a corpus scored on a coarse grid (the
    * quality gate emits ~6 distinct values) would otherwise funnel
    * millions of rows through one window partition per score
    * (measured 207 s at the 50 M-doc probe; 40 s bucketized):
    *  1. one hash aggregation builds the per-score weight histogram
    *     (plus the global id range) — distinct-score sized, so
    *     REQUIRE a discretized score (the quality scores here round
    *     to 4 places; round a raw continuous score first); the driver
    *     derives each score's PRIOR cumulative weight;
    *  2. a second aggregation splits each score group into id-RANGE
    *     buckets (bucket index monotone in id, so bucket order IS id
    *     order); the driver extends the priors to (score, bucket) —
    *     the two-level bucketized prefix scan, same shape as
    *     `ProgressLedger.contiguousAck`;
    *  3. a window cumsum partitioned by (score, bucket) — parallelism
    *     scores × buckets, bounded partition size — finishes the
    *     prefix; survive iff prior + within-bucket cumsum ≤ budget.
    *
    * Needs an integral id column (the range bucketing; the ordering
    * contract is numeric id ASC) and an integral weight column (the
    * prefix total is an exact Long cumsum — scale fractional weights
    * to an integer grid first; a non-integral type fails loudly
    * rather than truncating). Rows with a NULL score, weight, or id
    * are excluded up front — they are unrankable under the
    * (score DESC, id ASC) total order. Returns the surviving rows of
    * `df` plus `cum_weight` (the global prefix cumsum that admitted
    * the row).
    */
  def budgetSelect(
      df: DataFrame, scoreCol: String, weightCol: String, idCol: String,
      budget: Long, maxDistinctScores: Int = 100000,
      idBuckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val spark = df.sparkSession
    import spark.implicits._
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(idCol).dataType),
      s"budgetSelect needs an integral id column; $idCol is " +
        s"${df.schema(idCol).dataType}")
    // the running total is an exact Long cumsum (budget is a Long), so
    // a fractional weight column must fail loudly, not truncate per
    // row toward zero — callers with real-valued weights scale to an
    // integer grid first (e.g. milli-tokens)
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(weightCol).dataType),
      s"budgetSelect needs an integral weight column (the budget prefix " +
        s"is an exact Long cumsum); $weightCol is " +
        s"${df.schema(weightCol).dataType} — scale fractional weights to " +
        "an integer grid first")
    // NULL score/weight/id rows are unrankable and are excluded up
    // front (null score/weight would otherwise NPE the histogram
    // decode or poison the cumsum; a null id has no place in the
    // (score, id) total order); callers wanting them must impute first.
    val ranked = df.where(col(scoreCol).isNotNull && col(weightCol).isNotNull
      && col(idCol).isNotNull)
    val hist = ranked
      .groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(sum(col(weightCol).cast("long")).as("__w"),
        min(col(idCol).cast("long")).as("__min"),
        max(col(idCol).cast("long")).as("__max"))
      .limit(maxDistinctScores + 1)
      .as[(Double, Long, Long, Long)].collect()
    require(hist.length <= maxDistinctScores,
      s"budgetSelect: > $maxDistinctScores distinct values in '$scoreCol' — " +
        "the histogram two-phase needs a DISCRETIZED score (round it " +
        "first), or raise maxDistinctScores")
    if (hist.isEmpty) {
      return ranked.withColumn("cum_weight", lit(0L)).where(lit(false))
    }
    var cum = 0L
    val scorePrior = hist.sortBy(-_._1).map { case (s, w, _, _) =>
      val p = cum; cum += w; (s, p)
    }.toMap
    // id-range buckets: monotone in id, so (score, bucket, id) order
    // equals (score, id) order; bucket count adapts so the driver's
    // (score, bucket) table stays bounded
    val minId = hist.map(_._3).min
    val maxId = hist.map(_._4).max
    val nb = math.max(1, math.min(idBuckets, 2000000 / hist.length))
    val width = math.max(1L, (maxId - minId) / nb + 1)
    val bCol = ((col(idCol).cast("long") - lit(minId)) / lit(width))
      .cast("long").as("__b")
    val bHist = ranked
      .groupBy(col(scoreCol).cast("double").as("__s"), bCol)
      .agg(sum(col(weightCol).cast("long")).as("__w"))
      .as[(Double, Long, Long)].collect()
    val bucketPrior = bHist.groupBy(_._1).toSeq.flatMap { case (s, rows) =>
      var c = scorePrior(s)
      rows.sortBy(_._2).map { case (_, b, w) =>
        val p = c; c += w; (s, b, p)
      }
    }
    val priorDf = bucketPrior.toDF("__s", "__b", "__prior")
    val w = Window.partitionBy(col("__s"), col("__b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.withColumn("__s", col(scoreCol).cast("double"))
      .withColumn("__b", bCol)
      .join(broadcast(priorDf), Seq("__s", "__b"))
      .withColumn("cum_weight",
        col("__prior") + sum(col(weightCol).cast("long")).over(w))
      .where(col("cum_weight") <= budget)
      .drop("__s", "__b", "__prior")
  }

  /** Leakage-safe train/val/test split: the split key is the doc's
    * duplicate-CLUSTER canonical id ([[Dedup.duplicateClusters]] over
    * the given near-dup pairs; singletons key on their own id), so
    * near-duplicates can NEVER straddle a split boundary — the
    * eval-contamination failure mode a per-doc hash split has whenever
    * the corpus contains near-dups. Assignment is the same md5-bucket
    * rule as [[hashSample]]: deterministic, engine-portable,
    * reproducible across retries.
    *
    * `splits` are (name, bucketCount) in order, summing to `buckets`.
    * Adds `split`; every input row is returned exactly once.
    */
  def leakageSafeSplit(
      df: DataFrame, pairs: DataFrame, idCol: String,
      splits: Seq[(String, Int)], buckets: Int = 100): DataFrame =
    leakageSafeSplitLabeled(df, Dedup.duplicateClusters(pairs), idCol,
      splits, buckets)

  /** [[leakageSafeSplit]] keyed on PRE-COMPUTED cluster labels
    * (`(doc_id, cluster_id)` — [[Dedup.duplicateClusters]] output), so
    * a pipeline that already resolved clusters (or maintains them
    * incrementally via [[Dedup.mergeDuplicateClusters]]) doesn't pay
    * for a recompute. The canonical id is only a HASH KEY: members
    * absent from `df` (dropped by later stages) don't affect the
    * bucket of the survivors.
    */
  def leakageSafeSplitLabeled(
      df: DataFrame, clusterLabels: DataFrame, idCol: String,
      splits: Seq[(String, Int)], buckets: Int = 100): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == buckets,
      s"split buckets must sum to $buckets")
    val labels = clusterLabels.select(col("doc_id").as(idCol), col("cluster_id"))
    val keyed = df.join(labels, Seq(idCol), "left")
      .withColumn("__sk", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    val b = hashBucket(col("__sk"), buckets)
    val assign = splits.tail.scanLeft((splits.head._1, splits.head._2)) {
      case ((_, cum), (name, w)) => (name, cum + w)
    }.foldRight(lit(null).cast("string")) {
      case ((name, cum), other) => when(b < cum, lit(name)).otherwise(other)
    }
    keyed.withColumn("split", assign).drop("__sk")
  }
}
