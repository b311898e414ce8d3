package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Measures the operational claims behind incremental cluster
  * maintenance, against PERSISTED state (the driver oracle row
  * `q_dedup_clusters_incremental` pins value equivalence but builds
  * its precondition in-query, so it measures setup+merge). Two
  * experiments, state written to disk untimed, contenders timed:
  *
  * 1. clustering isolated (pair discovery excluded — pairs on disk):
  *      recompute : duplicateClusters(all pairs)
  *      merge     : mergeClusterLabelStore(label store, batch pairs)
  *    Isolates [[Dedup.mergeDuplicateClusters]] itself. NOTE at test
  *    scales both sides are fixed-latency bound (rounds × job cost,
  *    tiny shuffles), so this ratio reflects round counts, not bytes.
  *
  * 2. end-to-end daily ingest (the triple a 100 TB pipeline runs):
  *      full : minhashDuplicates(history ∪ batch) → duplicateClusters
  *      incr : incrementalNearDedup(batch, persisted nearDedupIndex)
  *             → mergeClusterLabelStore(persisted labels)
  *    Here discovery dominates and the incremental path touches only
  *    batch-sized state — the ≪ that justifies the maintenance ops.
  *
  * Batch = docs above the 95th doc_id percentile (~5%, a daily slice)
  * — an id THRESHOLD, not a modulus, because [[Dedup.incrementalNearDedup]]
  * contracts that every history id precedes every batch id.
  *
  * Usage: runMain graft.tools.MergeBench [sfDir] [workDir]
  * Prints one JSON line: {"metric":"merge_vs_recompute",...}
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val work = args.lift(1).getOrElse("/tmp/graft_mergebench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def evalFully(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // ---- setup (untimed): id-threshold batch split + persisted state
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cutoff = docs.stat.approxQuantile("doc_id", Array(0.95), 0.001)(0)
    val history = docs.where(col("doc_id") <= cutoff).cache()
    val batch = docs.where(col("doc_id") > cutoff).cache()
    val (nHist, nBatch) = (history.count(), batch.count())

    val allPairsPath = s"$work/all_pairs.parquet"
    val newPairsPath = s"$work/new_pairs.parquet"
    val storePath = s"$work/label_store.parquet"
    val indexPath = s"$work/near_index.parquet"
    val mhStorePath = s"$work/mh_label_store.parquet"

    // experiment-1 state: ngram pair graph split by the batch boundary
    Dedup.ngramJaccardDuplicates(docs, "text", "doc_id")
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .write.mode("overwrite").parquet(allPairsPath)
    val stored = spark.read.parquet(allPairsPath)
    stored.where(col("id_a") > cutoff || col("id_b") > cutoff)
      .write.mode("overwrite").parquet(newPairsPath)
    val oldLabels = Dedup.duplicateClusters(
      stored.where(col("id_a") <= cutoff && col("id_b") <= cutoff))
    Dedup.writeClusterLabelStore(oldLabels, storePath)
    oldLabels.unpersist()

    // experiment-2 state: MinHash index (id-sorted for row-group
    // pruning of the hs column) + labels over the history corpus
    Dedup.writeNearDedupIndex(history, "text", "doc_id", indexPath)
    val histMhLabels = Dedup.duplicateClusters(
      Dedup.minhashDuplicates(history, "text", "doc_id")
        .select(col("id_a"), col("id_b")))
    Dedup.writeClusterLabelStore(histMhLabels, mhStorePath)
    histMhLabels.unpersist()

    val nAll = spark.read.parquet(allPairsPath).count()
    val nNew = spark.read.parquet(newPairsPath).count()
    System.err.println(s"[mergebench] docs: hist=$nHist batch=$nBatch; " +
      s"ngram pairs: all=$nAll new=$nNew")

    // warm JVM/codegen so rep 1 isn't paying one-time session costs
    evalFully(spark.range(1000000).selectExpr("sum(id) as s"))

    // ---- timed contenders, interleaved rep-major like graft.Bench
    val t = Map(
      "recompute" -> scala.collection.mutable.ArrayBuffer[Double](),
      "merge" -> scala.collection.mutable.ArrayBuffer[Double](),
      "full_e2e" -> scala.collection.mutable.ArrayBuffer[Double](),
      "incr_e2e" -> scala.collection.mutable.ArrayBuffer[Double]())
    def clear(): Unit = spark.sharedState.cacheManager.clearCache()
    (1 to reps).foreach { r =>
      t("recompute") += time {
        val l = Dedup.duplicateClusters(spark.read.parquet(allPairsPath))
        evalFully(l); clear()
      }
      t("merge") += time {
        val m = Dedup.mergeClusterLabelStore(
          spark, storePath, spark.read.parquet(newPairsPath))
        evalFully(m); clear()
      }
      t("full_e2e") += time {
        val l = Dedup.duplicateClusters(
          Dedup.minhashDuplicates(docs, "text", "doc_id")
            .select(col("id_a"), col("id_b")))
        evalFully(l); clear()
      }
      t("incr_e2e") += time {
        val np = Dedup.incrementalNearDedup(batch, "text", "doc_id",
          spark.read.parquet(indexPath)).select(col("id_a"), col("id_b"))
        val m = Dedup.mergeClusterLabelStore(spark, mhStorePath, np)
        evalFully(m); clear()
      }
      System.err.println(f"[mergebench] rep $r: " +
        t.map { case (k, v) => f"$k=${v.last}%.3f" }.toSeq.sorted.mkString(" "))
    }

    // ---- equivalence: both incremental paths == their from-scratch runs
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(doc_id, cluster_id))"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    val fullNgram = sig(Dedup.duplicateClusters(spark.read.parquet(allPairsPath)))
    val mergedNgram = sig(Dedup.mergeClusterLabelStore(
      spark, storePath, spark.read.parquet(newPairsPath)))
    require(fullNgram == mergedNgram,
      s"ngram merge diverged from recompute: $fullNgram vs $mergedNgram")
    val fullMh = sig(Dedup.duplicateClusters(
      Dedup.minhashDuplicates(docs, "text", "doc_id").select(col("id_a"), col("id_b"))))
    val incrMh = sig(Dedup.mergeClusterLabelStore(spark, mhStorePath,
      Dedup.incrementalNearDedup(batch, "text", "doc_id",
        spark.read.parquet(indexPath)).select(col("id_a"), col("id_b"))))
    require(fullMh == incrMh,
      s"incremental e2e diverged from full recompute: $fullMh vs $incrMh")

    // ---- experiment 3: the bytes-dominated regime. The documents
    // corpus yields tiny pair graphs (25.6k pairs even at 100×), so
    // experiments 1–2 are round-LATENCY bound and cannot show the
    // merge win the operator exists for: per-round shuffle bytes
    // proportional to the FULL edge set vs the touched sliver. A
    // synthetic graph shaped like a web-scale near-dup graph (many
    // short chains — duplicate clusters are shallow and numerous)
    // supplies the missing regime: `synthEdges` chain edges, batch =
    // bridges over 1% of chains.
    val synthN = sys.env.getOrElse("SPARK_GRAFT_SYNTH_EDGES", "4000000").toLong
    val sAllPath = s"$work/synth_all_pairs.parquet"
    val sNewPath = s"$work/synth_new_pairs.parquet"
    val sStorePath = s"$work/synth_label_store.parquet"
    val nodes = synthN * 5 / 4 // chains of 5 → 4 edges per 5 nodes
    val oldE = spark.range(nodes).where(pmod(col("id"), lit(5)) =!= 4)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val newE = spark.range(nodes / 5).where(pmod(col("id"), lit(100)) === 0)
      .select((col("id") * 5 + 4).as("id_a"), (col("id") * 5 + 5).as("id_b"))
    oldE.unionByName(newE).write.mode("overwrite").parquet(sAllPath)
    newE.write.mode("overwrite").parquet(sNewPath)
    val sLabels = Dedup.duplicateClusters(oldE)
    Dedup.writeClusterLabelStore(sLabels, sStorePath)
    sLabels.unpersist(); clear()

    val sT = Map(
      "recompute" -> scala.collection.mutable.ArrayBuffer[Double](),
      "merge" -> scala.collection.mutable.ArrayBuffer[Double]())
    (1 to reps).foreach { r =>
      sT("recompute") += time {
        val l = Dedup.duplicateClusters(spark.read.parquet(sAllPath))
        evalFully(l); clear()
      }
      sT("merge") += time {
        val mg = Dedup.mergeClusterLabelStore(
          spark, sStorePath, spark.read.parquet(sNewPath))
        evalFully(mg); clear()
      }
      System.err.println(f"[mergebench] synth rep $r: " +
        f"recompute=${sT("recompute").last}%.3f merge=${sT("merge").last}%.3f")
    }
    val sFull = sig(Dedup.duplicateClusters(spark.read.parquet(sAllPath)))
    val sMerged = sig(Dedup.mergeClusterLabelStore(
      spark, sStorePath, spark.read.parquet(sNewPath)))
    require(sFull == sMerged,
      s"synth merge diverged from recompute: $sFull vs $sMerged")

    val m = t.map { case (k, v) => k -> median(v.toSeq) }
    val sm = sT.map { case (k, v) => k -> median(v.toSeq) }
    println(f"""{"metric":"merge_vs_recompute","sf":"$sfDir","recompute_sec":${m("recompute")}%.3f,"merge_sec":${m("merge")}%.3f,"merge_speedup":${m("recompute") / m("merge")}%.2f,"full_e2e_sec":${m("full_e2e")}%.3f,"incr_e2e_sec":${m("incr_e2e")}%.3f,"e2e_speedup":${m("full_e2e") / m("incr_e2e")}%.2f,"n_hist":$nHist,"n_batch":$nBatch,"n_all_pairs":$nAll,"n_new_pairs":$nNew,"synth_edges":$synthN,"synth_recompute_sec":${sm("recompute")}%.3f,"synth_merge_sec":${sm("merge")}%.3f,"synth_merge_speedup":${sm("recompute") / sm("merge")}%.2f,"equal":true}""")
    spark.stop()
  }
}
