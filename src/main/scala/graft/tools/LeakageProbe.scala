package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase decomposition of `q_leakage_split` for the scale audit: the
  * query's sf1→sf10 step is the steepest non-span exponent
  * (9.29×/decade, SCALE_sf10_r11.json), and the verdict asked whether
  * the growth lives in the chars-proportional pair detection (fine) or
  * in the connected-components machinery (then the driver fast-path
  * ceiling or round fusion is the fix). This main times the three
  * phases separately against SPARK_GRAFT_SF_DIR:
  *
  *   pairs   — ngramJaccardDuplicates materialized (the blocking +
  *             verify pipeline, chars-proportional)
  *   cluster — duplicateClusters over the CACHED pair list (isolates
  *             CC: fast path collect + union-find, or the star loop)
  *   assign  — label join + md5 bucket assignment + full materialize
  *             of the split column over the corpus (rows-proportional)
  *
  * One untimed warmup pass then `reps` timed passes (trimmed to the
  * min — phase isolation wants the floor, not the mean).
  */
object LeakageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
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
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ids = docs.select(col("doc_id"))
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)

    var out = Map.empty[String, Double]
    for (rep <- 0 to reps) {
      val (pairs, tPairs) = time {
        val p = graft.ops.Dedup.ngramJaccardDuplicates(
          docs, "text", "doc_id", 3, 0.2, 10).cache()
        p.count()
        p
      }
      val nPairs = pairs.count()
      val (labels, tCc) = time {
        graft.ops.Dedup.duplicateClusters(pairs)
      } // duplicateClusters caches + materializes internally
      val (_, tAssign) = time {
        evalFully(graft.ops.Sampling.leakageSafeSplitLabeled(
          ids, labels, "doc_id", splits))
      }
      pairs.unpersist(); labels.unpersist()
      if (rep > 0) { // rep 0 is warmup
        def keep(k: String, v: Double): Unit =
          out = out.updated(k, out.get(k).map(math.min(_, v)).getOrElse(v))
        keep("pairs_secs", tPairs); keep("cc_secs", tCc)
        keep("assign_secs", tAssign)
        out = out.updated("n_pairs", nPairs.toDouble)
      }
      System.gc()
    }
    println(f"""{"sf":"$sfDir","n_pairs":${out("n_pairs").toLong},""" +
      f""""pairs_secs":${out("pairs_secs")}%.3f,"cc_secs":${out("cc_secs")}%.3f,""" +
      f""""assign_secs":${out("assign_secs")}%.3f}""")
    spark.stop()
  }
}
