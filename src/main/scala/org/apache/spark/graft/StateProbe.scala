package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` session-state accounting, for the
  * long-running-session retention probe (`SPARK_GRAFT_BENCH_HEAP=1` in
  * `graft.Bench`): how many blocks (broadcast pieces, cached RDD
  * partitions, spilled shuffle state) the block manager still tracks,
  * and how much storage memory they pin. A healthy session returns to
  * a flat baseline after each query + GC; monotone growth here is the
  * accumulated state that eventually OOMs a one-JVM multi-query sweep
  * (SCALE_sf10_r12.json's Context Cleaner failure mode).
  */
object StateProbe {

  /** (total tracked blocks, storage bytes used, broadcast-block count)
    * across all block managers.
    */
  def blockState(sc: SparkContext): (Long, Long, Long) = {
    val statuses = sc.env.blockManager.master.getStorageStatus
    val blocks = statuses.map(_.blocks.size.toLong).sum
    val mem = statuses.map(_.memUsed).sum
    val bcast = statuses.map(_.blocks.keys.count(
      _.name.startsWith("broadcast_")).toLong).sum
    (blocks, mem, bcast)
  }
}
