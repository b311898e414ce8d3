package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Mode-selectable eager materialization for in-query intermediates
  * that are consumed more than once (shingle tables, candidate-pair
  * lists, label sets). Every mode shares the same contract — EAGER
  * (building the frame runs a Spark job), result-identical, no SQL
  * CacheManager entry (so no structural plan matching can serve a
  * materialized intermediate to other queries or later bench reps, the
  * r13–r20 timing-contamination vector) — and they differ only in
  * failure semantics and storage:
  *
  *  - `localCheckpoint` (default): executor-local blocks, lineage CUT.
  *    Cheapest, but a lost executor (or decommissioning/dynamic
  *    allocation) makes the blocks unrecoverable and FAILS the query —
  *    fine in local mode and for bounded bench runs, a reliability
  *    liability on long cluster jobs.
  *  - `checkpoint`: reliable checkpoint files under the SparkContext
  *    checkpoint dir (set it directly, or via
  *    `spark.graft.checkpointDir`). Survives executor loss; costs a
  *    write+read of the intermediate through the checkpoint filesystem.
  *  - `persist`: RDD-level MEMORY_AND_DISK persistence with lineage
  *    KEPT — lost blocks recompute instead of failing, blocks are
  *    ContextCleaner-released like a localCheckpoint's, and because the
  *    persistence is RDD-level (not `Dataset.persist`) it never enters
  *    the SQL CacheManager.
  *
  * The default stays `localCheckpoint` so bench numbers are comparable
  * across rounds; a cluster deployment that cannot afford
  * fail-on-executor-loss sets `spark.graft.materialize=persist` (or
  * `checkpoint` for cross-job durability).
  */
object Materialize {

  /** Session conf selecting the materialization mode. */
  val ModeKey = "spark.graft.materialize"

  /** Conf naming a reliable-checkpoint directory; read once per call
    * when mode=`checkpoint` and the SparkContext has no checkpoint dir.
    */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  val ModeLocalCheckpoint = "localCheckpoint"
  val ModeCheckpoint = "checkpoint"
  val ModePersist = "persist"

  /** Materialize `df` eagerly under the session's configured mode and
    * return a frame reading the materialized blocks/files.
    */
  def frame(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ModeKey, ModeLocalCheckpoint) match {
      case ModeLocalCheckpoint => df.localCheckpoint()
      case ModeCheckpoint =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          df.sparkSession.conf.getOption(CheckpointDirKey) match {
            case Some(d) => sc.setCheckpointDir(d)
            case None => throw new IllegalStateException(
              s"$ModeKey=$ModeCheckpoint needs SparkContext.setCheckpointDir " +
                s"or $CheckpointDirKey")
          }
        df.checkpoint()
      case ModePersist =>
        org.apache.spark.sql.graft.MaterializeBridge
          .persisted(df, StorageLevel.MEMORY_AND_DISK)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be $ModeLocalCheckpoint|$ModeCheckpoint|$ModePersist" +
          s" (got '$other')")
    }

  /** Lazy variant for loop-carried frames whose first downstream
    * action doubles as the materializing job (the connected-components
    * star loop folds checkpoint + convergence probe into one job per
    * round). Same mode semantics as [[frame]], materialized on first
    * use instead of eagerly.
    */
  def frameLazy(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ModeKey, ModeLocalCheckpoint) match {
      case ModeLocalCheckpoint => df.localCheckpoint(false)
      case ModeCheckpoint =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          df.sparkSession.conf.getOption(CheckpointDirKey) match {
            case Some(d) => sc.setCheckpointDir(d)
            case None => throw new IllegalStateException(
              s"$ModeKey=$ModeCheckpoint needs SparkContext.setCheckpointDir " +
                s"or $CheckpointDirKey")
          }
        df.checkpoint(false)
      case ModePersist =>
        org.apache.spark.sql.graft.MaterializeBridge
          .persistedLazy(df, StorageLevel.MEMORY_AND_DISK)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be $ModeLocalCheckpoint|$ModeCheckpoint|$ModePersist" +
          s" (got '$other')")
    }
}
