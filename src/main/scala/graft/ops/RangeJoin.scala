package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval (range) join: pairs every left point
  * `(key, ts)` with every right interval `(key, start, end)` that
  * contains it (closed on both ends).
  *
  * Spark's built-in plan for an inequality join condition is a
  * per-key cross product (BroadcastNestedLoop or sort-merge with a
  * range condition) — O(|points|·|intervals|) per key. Bucketizing
  * restores a hash-equi-join: each interval is exploded into the
  * fixed-width time buckets it overlaps, points join on
  * `(key, bucket)`, and the exact containment predicate filters the
  * candidates. A (point, interval) pair can only meet in the point's
  * own bucket, so the join needs NO distinct afterwards.
  *
  * The 100 TB story: candidate volume is |points| + Σ span/width per
  * interval — pick `bucketWidthUs` near the median interval length so
  * a typical interval lands in ~2 buckets. Both sides shuffle once on
  * `(key, bucket)`; skew falls to AQE like any equi-join.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tsCol: String,
      startCol: String, endCol: String,
      bucketWidthUs: Long = 3600000000L): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    val p = points.withColumn("__b",
      floor(TimeCols.epochMicros(col(tsCol)) / bucketWidthUs))
    val iv = intervals.withColumn("__b", explode(sequence(
      floor(TimeCols.epochMicros(col(startCol)) / bucketWidthUs),
      floor(TimeCols.epochMicros(col(endCol)) / bucketWidthUs))))
    p.join(iv, keyCols :+ "__b")
      .where(col(startCol) <= col(tsCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
