package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Documents-only corpus amplifier for decade-scaling probes of the
  * span family: replicates `documents.parquet` `factor`× with the same
  * bijective per-copy token-suffix trick as [[Amplify]] (within-copy
  * gram/duplicate structure preserved exactly, cross-copy equality
  * eliminated), but with doc_ids REMAPPED DENSE — `copy · 10⁷ + rank`
  * — instead of [[Amplify]]'s `copy · 10⁸ + id` shift, because a
  * second amplification round on an already-amplified corpus would
  * either collide ids or push them past the packed-posting bound
  * (2³⁴; graft_sf10 already reaches 9.9·10⁹). The rank pass is one
  * global window over the SOURCE only (≤ a few hundred k rows — this
  * is a one-off generator, not a pipeline operator).
  *
  * Only documents.parquet is written: the span probes read nothing
  * else. Compose with [[SparseCorpusGen]] to build a larger
  * span-sparse corpus (apply DocAmplify first; its per-copy suffix is
  * disjoint from SparseCorpusGen's per-doc suffix).
  *
  * Usage: runMain graft.tools.DocAmplify <srcSfDir> <destDir> [factor]
  */
object DocAmplify {
  private val CopyStride = 10000000L // 10^7: rank < stride, factor*stride < 2^34

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/tmp/graft_sf10")
    val dest = args.lift(1).getOrElse("/tmp/graft_sf100docs")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1 && factor * CopyStride < (1L << 34),
      s"factor $factor would push doc_ids past the packed-posting bound")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = docs.count()
    require(n < CopyStride, s"source has $n docs >= stride $CopyStride")
    val ranked = docs.withColumn("__r",
      row_number().over(Window.orderBy("doc_id")) - 1)
    val out = (0 until factor).map { c =>
      val text = if (c == 0) col("text")
      else regexp_replace(col("text"), "(\\S+)",
        "$1y" + java.lang.Long.toString(c, 36))
      ranked
        .withColumn("doc_id", col("__r") + lit(c * CopyStride))
        .withColumn("text", text)
        .drop("__r")
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ union _)
    out.repartition(cpus.toInt * factor)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")
    val m = spark.read.parquet(s"$dest/documents.parquet").count()
    System.err.println(s"[docamplify] $src x$factor -> $dest: $m docs")
    spark.stop()
  }
}
