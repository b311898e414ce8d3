package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Direct cost measurement of the winnow-prefilter density guard on a
  * duplicate-saturated corpus — the regime where the guard's job is
  * to bail. Times the two ways it can reach that decision:
  *
  *  - full-pass guard (round-19 shape, and still the exact deciding
  *    authority): complete anchor pass + candidate count + doc count
  *    over the whole corpus;
  *  - sampled pre-probe (round-20): the same candidate test within a
  *    `frac` slice (within-sample candidacy implies full candidacy,
  *    so a sampled bail is conservative).
  *
  * Each timed twice (second rep is warm). The k/w pair matches the
  * span-family default (k = 20 tokens ≈ the bench span queries'
  * shared-gram length; w from minLen − k + 1).
  *
  * Usage: runMain graft.tools.DensityGuardProbe [sfDir] [k] [w] [frac]
  */
object DensityGuardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_docs500k")
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val w = args.lift(2).map(_.toInt).getOrElse(21)
    val frac = args.lift(3).map(_.toDouble).getOrElse(0.01)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(tag: String)(f: => String): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[densguard] $tag%-18s rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
      }

    time("full-pass-guard") {
      val perDocH = Dedup.winnowPerDocAnchors(docs, "text", "doc_id", k, w)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nCand = Dedup.winnowCandidateIds(perDocH, includeSelf = false).count()
        val nDocs = docs.select(col("doc_id")).count()
        f"cand_frac=${nCand.toDouble / nDocs}%.4f"
      } finally perDocH.unpersist()
    }
    time(s"pre-probe-$frac") {
      val sample = docs.sample(withReplacement = false, frac, seed = 42L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nS = sample.count()
        val nCandS = Dedup.winnowCandidateIds(
          Dedup.winnowPerDocAnchors(sample, "text", "doc_id", k, w),
          includeSelf = false).count()
        f"sampled_frac=${nCandS.toDouble / math.max(1L, nS)}%.4f n=$nS"
      } finally sample.unpersist()
    }
    spark.stop()
  }
}
