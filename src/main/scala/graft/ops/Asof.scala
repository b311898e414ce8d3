package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * right row precedes it — or none within `tolerance` when given.
    *
    * `tolerance` is a Spark SQL interval body (e.g. "30 days",
    * "90 seconds"): a match older than `l.ts - tolerance` is discarded
    * (all value columns NULL), the pandas `merge_asof(tolerance=...)`
    * contract. Same single keyed shuffle — the matched right timestamp
    * rides the running state as one extra column and the bound is a
    * post-window filter, not a join condition.
    */
  def joinBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], tolerance: Option[String] = None): DataFrame =
    asofJoin(left, right, keyCols, tsCol, valueCols, tolerance, forward = false)

  /** Forward as-of join: `valueCols` filled from the EARLIEST right row
    * at-or-after each left timestamp (next-event attribution — "the
    * first shipment after the order", "the next error after the
    * deploy"). Mirror of [[joinBackward]]: the window runs from the
    * current row forward and takes `first` instead of `last`;
    * `tolerance` bounds how far ahead a match may be.
    */
  def joinForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], tolerance: Option[String] = None): DataFrame =
    asofJoin(left, right, keyCols, tsCol, valueCols, tolerance, forward = true)

  /** Validate a tolerance string BEFORE it reaches plan text. The bound
    * is built as `expr("INTERVAL '<tol>'")`; unvalidated interpolation
    * would let a quote-bearing string inject arbitrary expression text,
    * and a merely-malformed one would surface as an opaque analysis-time
    * parse error far from the call site. Accepted shape: one or more
    * `<number> <unit>` terms (`"5 minutes"`, `"1 hour 30 minutes"`).
    */
  private def toleranceInterval(tol: String): Column = {
    val term = """\d+(\.\d+)?\s+[A-Za-z]+"""
    require(tol.trim.matches(s"$term(\\s+$term)*"),
      s"invalid as-of tolerance '$tol': expected '<n> <unit>' terms " +
        "like '5 minutes' or '1 hour 30 minutes'")
    try expr(s"INTERVAL '${tol.trim}'")
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"invalid as-of tolerance '$tol': ${e.getMessage}")
    }
  }

  private def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], tolerance: Option[String],
      forward: Boolean): DataFrame = {
    val rightCols = keyCols.map(col) ++ Seq(col(tsCol)) ++ valueCols.map(col)
    // a NULL-ts right row would sort first (nulls-first) and leak into
    // every left row's running state; there is no "time" it is valid at.
    // Backward: right rows sort BEFORE left at equal ts (side 0 < 1) so
    // the inclusive bound sees them; forward mirrors (side 1 > 0).
    val rightSide = if (forward) 1 else 0
    // The matched row's entire payload rides ONE struct: filling value
    // columns independently with last/first(ignoreNulls) would let a
    // NULL field in the nearest right row reach back past it to an
    // OLDER row's value — per-column instead of per-ROW as-of, wrong
    // under tolerance and divergent from [[snapshotJoin]]'s single
    // picked entry. A struct from the right side is never null (even
    // when its fields are), so ignoreNulls skips exactly the left rows.
    val r = right.select(rightCols: _*)
      .where(col(tsCol).isNotNull)
      .withColumn("__rv",
        struct(col(tsCol).as("__rts") +: valueCols.map(col): _*))
      .withColumn("__side", lit(rightSide))
      .select((keyCols.map(col) :+ col(tsCol) :+ col("__rv") :+ col("__side")): _*)
    val rvType = r.schema("__rv").dataType
    val l = left
      .withColumn("__rv", lit(null).cast(rvType))
      .withColumn("__side", lit(1 - rightSide))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
    val w = if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fill =
      if (forward) first(col("__rv"), ignoreNulls = true).over(w)
      else last(col("__rv"), ignoreNulls = true).over(w)
    val filled = unioned.withColumn("__rv", fill)
      .where(col("__side") === (1 - rightSide))
    // match too far away ⇒ as if absent: NULL every value column
    val inRange = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        if (forward) col("__rv.__rts") <= col(tsCol) + toleranceInterval(tol)
        else col("__rv.__rts") >= col(tsCol) - toleranceInterval(tol)
    }
    valueCols.foldLeft(filled) { (d, c) =>
        d.withColumn(c, when(inRange, col(s"__rv.$c")))
      }
      .drop("__side", "__rv")
  }

  /** Streaming as-of enrichment (feature-store lookup): attach "the
    * latest snapshot state at-or-before event time" to a STREAM.
    *
    * The union + window plan of [[joinBackward]] cannot run on a stream
    * (an unbounded running window over append mode). The stream-static
    * shape that can: collapse the snapshot to ONE row per key holding
    * its (ts, values) timeline sorted ascending, stream-static
    * equi-join on the key (stateless — no watermark state, every
    * micro-batch is a pure projection), then pick the last timeline
    * entry at-or-before the event timestamp with a higher-order filter.
    *
    * Scale: the join is broadcast/shuffle on the KEY only; per-key
    * state is the key's snapshot timeline (feature stores keep these
    * bounded — latest-N versions per entity). The same call works on a
    * batch `left` and is asserted result-identical to [[joinBackward]]
    * by spec.
    */
  def snapshotJoinBackward(
      left: DataFrame, snapshot: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], tolerance: Option[String] = None): DataFrame =
    snapshotJoin(left, snapshot, keyCols, tsCol, valueCols, tolerance, forward = false)

  /** Forward twin of [[snapshotJoinBackward]]: earliest snapshot entry
    * at-or-after each event timestamp.
    */
  def snapshotJoinForward(
      left: DataFrame, snapshot: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], tolerance: Option[String] = None): DataFrame =
    snapshotJoin(left, snapshot, keyCols, tsCol, valueCols, tolerance, forward = true)

  private def snapshotJoin(
      left: DataFrame, snapshot: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], tolerance: Option[String],
      forward: Boolean): DataFrame = {
    // one row per (key, ts) (deterministic reducer), then one row per
    // key: its full timeline, sorted ascending by ts (struct sort
    // orders by the first field; ts is unique per key after reduction)
    val reduced = latestPerKeyTs(
      snapshot.where(col(tsCol).isNotNull), keyCols, tsCol, valueCols)
    val timeline = reduced
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(
        struct((tsCol +: valueCols).map(col): _*))).as("__timeline"))
    val joined = left.join(timeline, keyCols, "left")
    val evTs = col(tsCol)
    def inRange(entry: Column): Column = {
      val ts = entry(tsCol)
      val dir = if (forward) ts >= evTs else ts <= evTs
      tolerance match {
        case None => dir
        case Some(tol) =>
          val bound =
            if (forward) ts <= evTs + toleranceInterval(tol)
            else ts >= evTs - toleranceInterval(tol)
          dir && bound
      }
    }
    // backward: last qualifying entry; forward: first. try_element_at
    // (not element_at): an empty filtered timeline must be NULL —
    // left-join semantics — not an ANSI out-of-bounds error.
    val picked = try_element_at(filter(col("__timeline"), inRange _),
      lit(if (forward) 1 else -1))
    valueCols.foldLeft(joined.withColumn("__m", picked)) { (d, c) =>
        d.withColumn(c, col(s"__m.$c"))
      }
      .drop("__timeline", "__m")
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
