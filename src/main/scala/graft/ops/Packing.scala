package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: concatenate documents into
  * fixed token-budget bins (the standard trick to avoid padding waste
  * when assembling LLM training batches).
  *
  * Deterministic, shard-parallel definition — the property that makes
  * it both scalable and oracle-checkable:
  *
  *  - shard = id / shardSize (contiguous id ranges → shards are
  *    independent, so packing parallelizes and adding data only
  *    repacks the tail shard);
  *  - within a shard, walk docs in id order and greedily append to the
  *    current bin while the token budget holds; an oversized doc gets
  *    a bin of its own (it would be truncated downstream, never
  *    dropped silently).
  *
  * Implemented with `flatMapSortedGroups` — Spark sorts each group by
  * id for us; one shuffle on the shard key, O(docs) work.
  */
object Packing {

  /** Returns (id, shard, bin, n_tokens): bin is the 0-based bin index
    * within the shard.
    */
  def packGreedy(
      df: DataFrame, budget: Int, shardSize: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0 && shardSize > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
      col(idCol).cast("long").as("id"),
      floor(col(idCol).cast("long") / shardSize).cast("long").as("shard"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
    base.groupByKey(_._2)
      .flatMapSortedGroups($"id") { (shard, docs) =>
        var bin = 0L
        var used = 0L
        var first = true
        docs.map { case (id, _, n) =>
          if (!first && used + n > budget) { bin += 1; used = 0L }
          first = false
          used += n
          (id, shard, bin, n)
        }
      }(Encoders.product[(Long, Long, Long, Long)])
      .toDF("id", "shard", "bin", "n_tokens")
  }

  /** Per-bin summary: docs, tokens, budget utilization. */
  def binStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
      .withColumn("utilization", round(col("tokens").cast("double") / budget, 6))
}
