package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-store staple a training
  * pipeline needs to attach "the latest state known at event time"
  * without leaking the future: for each left row, the single right row
  * with the greatest right timestamp ≤ the left timestamp, per key.
  *
  * Implementation is the union + running-last trick, NOT a range join:
  * tag both sides, union, and take `last(value, ignoreNulls)` over a
  * window partitioned by key and ordered by (ts, side) with right rows
  * sorting before left rows at equal timestamps (as-of is inclusive).
  * Left rows carry NULL in the value columns, so they never pollute
  * the running state, and every left row reads the most recent right
  * values at its position.
  *
  * The 100 TB story: ONE hash shuffle on the key for both inputs and a
  * per-key sort — the same cost as any keyed window. No per-row range
  * probe, no interval explosion, no broadcast of either side; skewed
  * keys are AQE's problem exactly as in any groupBy. A sort-merge
  * range join (`l.ts >= r.ts`) would instead build O(|L|·|R|) pairs
  * per key before taking the max.
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate with
  * [[latestPerKeyTs]] or any deterministic reducer; ties would
  * otherwise make the filled values order-dependent.
  */
object Asof {

  /** Backward as-of join (the common, leak-free direction). Output =
    * every left row (left join semantics) + `valueCols` filled from
    * the latest right row at-or-before its timestamp, NULL when no
    * right row precedes it.
    */
  def joinBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val rightCols = keyCols.map(col) ++ Seq(col(tsCol)) ++ valueCols.map(col)
    // a NULL-ts right row would sort first (nulls-first) and leak into
    // every left row's running state; there is no "time" it is valid at
    val r = right.select(rightCols: _*)
      .where(col(tsCol).isNotNull)
      .withColumn("__side", lit(0))
    val l = valueCols.foldLeft(left) { (d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }.withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(unioned) { (d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** Deterministic right-side reducer: one row per (key, ts), keeping
    * the lexicographic maximum of the value columns (struct max — the
    * same tie rule the language-id argmax uses).
    */
  def latestPerKeyTs(
      right: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val g = right.groupBy((keyCols :+ tsCol).map(col): _*)
      .agg(max(struct(valueCols.map(col): _*)).as("__m"))
    valueCols.foldLeft(g)((d, c) => d.withColumn(c, col(s"__m.$c"))).drop("__m")
  }
}
