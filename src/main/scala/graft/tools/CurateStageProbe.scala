package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-decomposition of the curation pipeline's quality_gate stage,
  * which the round-12 per-stage breakdown showed dominating the sf10
  * run (78.7 s of ~103 s) even though the gate COMPUTE alone benches at
  * 3.4 s (q_quality_gate, SCALE_sf10_rest_r11). Times, separately:
  *
  *   gate_metrics — qualityGate verdicts materialized (no join)
  *   semi_nocache — docs ⋉ keep materialized as rows (join + full-text
  *                  row materialization, no cache)
  *   semi_cache   — the same with .cache(), i.e. + InMemoryRelation
  *                  columnar encode of the full corpus text
  *   pairs_on_cached / pairs_on_plain — the stage-2 pair detection on
  *                  the cached vs uncached gated frame (what the cache
  *                  actually buys downstream)
  */
object CurateStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def evalFully(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod(col("doc_id"), lit(50)) =!= 0)
    def keep = graft.ops.Curation.qualityGate(docs, "text", "doc_id",
        20, 5000, 0.45, 0.12)
      .where(col("keep")).select(col("doc_id"))

    evalFully(docs.select(sum(length(col("text"))))) // warm scan + JIT
    time("gate_metrics")(evalFully(keep))
    time("gate_metrics2")(evalFully(keep)) // steady state
    val plain = docs.join(keep, Seq("doc_id"), "left_semi")
    time("semi_nocache")(evalFully(plain))
    time("semi_nocache2")(evalFully(plain))
    val cached = docs.join(keep, Seq("doc_id"), "left_semi").cache()
    time("semi_cache")(cached.count())
    time("count_on_cached")(cached.count())
    def pairsOf(d: DataFrame) = graft.ops.Dedup.ngramJaccardDuplicates(
      d, "text", "doc_id", 3, 0.2, 10)
    time("pairs_on_cached")(evalFully(pairsOf(cached)))
    cached.unpersist()
    time("pairs_on_plain")(evalFully(pairsOf(plain)))
    println("[probe] join plan: " + (if (plain.queryExecution.executedPlan
      .toString.contains("Broadcast")) "broadcast" else "shuffle"))
    spark.stop()
  }
}
