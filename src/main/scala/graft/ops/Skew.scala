package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand-rolled complement to AQE's
  * runtime skew-join splitting, for the cases AQE does not cover
  * (aggregations, and joins where one key dominates a whole stage).
  *
  * `saltedAggregate` runs group-by in two phases: phase 1 groups by
  * (key, salt) spreading a hot key over `saltBuckets` reducers, phase 2
  * merges the partials per key. Results are identical to a direct
  * group-by for any algebraic aggregate; wall-clock stops being bounded
  * by the hottest key's single reducer.
  */
object Skew {

  /** Deterministic salt column (hash of a spread column mod buckets —
    * NOT rand(), so retried tasks and re-runs stay stable).
    */
  def salt(spreadCol: Column, saltBuckets: Int): Column =
    pmod(xxhash64(spreadCol), lit(saltBuckets.toLong)).cast("int")

  /** Two-phase salted count per key. */
  def saltedCount(
      df: DataFrame, keyCol: String, spreadCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(spreadCol), saltBuckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("n"))

  /** Two-phase salted sum per key (decimal-exact for a given column). */
  def saltedSum(
      df: DataFrame, keyCol: String, valueCol: String, spreadCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(spreadCol), saltBuckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("total"))

  /** Broadcast-salted join for a skewed fact side: replicate each
    * build-side row `saltBuckets` times (one per salt value) and join
    * on (key, salt) — every hot-key partition shrinks by the bucket
    * factor. Use when the build side is small enough to replicate but
    * too big (or the key too hot) for a plain broadcast.
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int = 16, spreadCol: String): DataFrame = {
    val salted = probe.withColumn("__salt", salt(col(spreadCol), saltBuckets))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
