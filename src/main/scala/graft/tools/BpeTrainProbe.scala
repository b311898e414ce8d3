package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Floor probe for [[TextAnalysis.bpeLearnMerges]] at realistic merge
  * counts: times the driver-side pair-heap path at `numMerges`, times
  * the distributed fallback at `distMerges` (its cost is a fixed
  * per-merge distributed agg + 1-row collect + localCheckpoint, so a
  * small run measures the per-merge overhead a 30–50 k-merge real
  * train would multiply), and checks the two paths' merge tables are
  * identical over the first `distMerges` steps.
  *
  * Usage: runMain graft.tools.BpeTrainProbe [sfDir] [numMerges] [distMerges]
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val distMerges = args.lift(2).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[bpeprobe] corpus=$sfDir docs=${docs.count()}")

    def run(tag: String, merges: Int, driverMax: String): Seq[(Int, String, Long)] = {
      spark.conf.set(TextAnalysis.BpeDriverMaxVocabKey, driverMax)
      val t0 = System.nanoTime()
      val out = TextAnalysis.bpeLearnMerges(docs, "text", merges)
        .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] $tag%-28s merges=$merges%-6d ${sec}%.2f s " +
        f"(${sec / merges * 1000}%.1f ms/merge, learned=${out.length})")
      out
    }

    run("driver-warmup", distMerges, TextAnalysis.BpeDriverMaxVocabDefault.toString)
    val drvSmall = run("driver-pair-heap", distMerges,
      TextAnalysis.BpeDriverMaxVocabDefault.toString)
    val drv = run("driver-pair-heap", numMerges,
      TextAnalysis.BpeDriverMaxVocabDefault.toString)
    val dist = run("distributed-fallback", distMerges, "0")
    val same = drvSmall == dist && drv.take(dist.length) == dist
    println(s"[bpeprobe] merge tables identical over first ${dist.length} steps: $same")
    require(same, "driver and distributed merge sequences diverged")

    // encode the whole corpus under the learned table: the apply-side
    // floor (expression ships the merge table once per executor; the
    // per-word cache makes repeated words free)
    val merges = drv.map { m =>
      val i = m._2.indexOf(' '); (m._2.substring(0, i), m._2.substring(i + 1))
    }
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val nTok = docs.select(
          sum(size(TextAnalysis.bpeEncode(col("text"), merges)))
            .cast("long"))
        .first().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpeprobe] encode-${merges.length}-merges       rep$rep ${sec}%.2f s " +
        f"($nTok%,d subword tokens, ${nTok / sec / 1e6}%.1f M tok/s)")
    }
    spark.stop()
  }
}
