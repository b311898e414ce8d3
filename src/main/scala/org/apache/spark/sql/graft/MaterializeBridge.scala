package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Persist-based eager materialization with the recoverability
  * properties the other materialization modes trade away, without
  * `Dataset.persist`'s CacheManager membership: the materialized
  * internal-row RDD is persisted at the RDD level (never registered
  * with the SQL CacheManager, so no structural plan matching can serve
  * it to OTHER queries — the r13–r20 timing-contamination vector), its
  * lineage is kept (a lost executor recomputes lost blocks instead of
  * failing the job, unlike `localCheckpoint` whose truncated lineage
  * makes block loss fatal), and the blocks are ContextCleaner-released
  * once the returned frame is garbage-collected (the same release
  * contract as `localCheckpoint`).
  *
  * Mirrors `Dataset.checkpoint`'s internal construction (execute →
  * copy rows → wrap in a [[LogicalRDD]] via `fromDataset`, preserving
  * output partitioning/ordering so downstream exchanges are not
  * re-introduced), with `persist` in place of the checkpoint.
  */
object MaterializeBridge {

  def persisted(df: DataFrame, level: StorageLevel): DataFrame = {
    val out = persistedLazy(df, level)
    out.queryExecution.toRdd.count() // eager: same contract as localCheckpoint()
    out
  }

  /** [[persisted]] without the materializing action — the first
    * downstream job fills the persisted blocks.
    */
  def persistedLazy(df: DataFrame, level: StorageLevel): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[Row]]
    val internalRdd: RDD[InternalRow] =
      classic.queryExecution.toRdd.map(_.copy())
    internalRdd.persist(level)
    ClassicDataset.ofRows(
      classic.sparkSession,
      LogicalRDD.fromDataset(internalRdd, classic, isStreaming = false))
  }

  /** Unpersist the RDD-level blocks behind a frame returned by
    * [[persisted]] (deterministic release, instead of waiting on the
    * ContextCleaner). No-op for other plan shapes.
    */
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
