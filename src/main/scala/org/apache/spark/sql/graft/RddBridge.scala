package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge for RDD-level persistence housekeeping the public Dataset
  * API cannot reach: `Dataset.localCheckpoint` persists its
  * materialized RDD at the RDD level, and `Dataset.unpersist` only
  * clears CacheManager entries — so checkpoint blocks linger until the
  * ContextCleaner happens to GC the RDD object. A long-lived session
  * running iterative operators (connected-components rounds) wants
  * deterministic release instead.
  */
object RddBridge {

  /** Unpersist the RDD behind a `localCheckpoint`ed Dataset (no-op for
    * any other plan shape). Only call once nothing will recompute
    * through the checkpoint's truncated lineage — after every
    * downstream consumer has materialized (cached/written) its result.
    */
  def unpersistLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
