package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side bucketing for shuffle-free joins — the storage-layout
  * lever for the 100 TB case: land both fact and dimension bucketed by
  * the join key and repeated joins skip the exchange entirely (the
  * scan's `HashPartitioning` already satisfies the join's required
  * distribution). One-time cost at write, every downstream join free.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `keyCols` as a managed
    * table; `buckets` should be sized so a bucket of the largest table
    * fits one task's memory at target scale.
    */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, keyCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      keyCols: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCols)

  /** True when the physical plan contains no shuffle exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
