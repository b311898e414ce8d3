package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Measures the quantity that decides whether the winnowed anchor
  * prefilter ([[Dedup.SpanWinnowPrefilterKey]]) pays off on a corpus:
  * the CANDIDATE-DOCUMENT fraction — how many documents hold a
  * winnowed anchor value shared with another document (or repeated
  * within themselves). Phase 1 of the prefilter runs the posting
  * index over exactly this subset, so `cand_frac` is the posting
  * volume multiplier; near 1.0 the prefilter can only lose (its
  * bailout conf exists for that regime), near 0.0 the posting
  * shuffle/sort collapses proportionally.
  *
  * Also prints the anchor-stream size against the gram-stream size
  * (the winnow pass's own shuffle volume, expected ≈ 2/(w+1) of the
  * grams) and, with `--spans`, the exact span-participating doc set
  * for comparison (candidates are a superset by the winnowing
  * guarantee).
  *
  * Usage: runMain graft.tools.SpanDensityProbe <sfDir>... [--spans]
  *        [--k N] [--minLen N] [--cap N]
  */
object SpanDensityProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args.filterNot(_.startsWith("--")).toSeq match {
      case Seq() => Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
      case ds => ds
    }
    def intArg(name: String, default: Int): Int = {
      val i = args.indexOf(s"--$name")
      if (i >= 0 && i + 1 < args.length) args(i + 1).toInt else default
    }
    val withSpans = args.contains("--spans")
    val k = intArg("k", 20)
    val minLen = intArg("minLen", 40)
    val cap = intArg("cap", 50)
    val w = minLen - k + 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-span-density-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .where(col("doc_id").isNotNull)
      val nDocs = docs.count()
      val gramVol = docs.select(
        sum(greatest(length(graft.ops.TextAnalysis.normalize(col("text"))) - (k - 1),
          lit(0)))).head.getLong(0)
      val perDocH = Dedup.winnowPerDocAnchors(docs, "text", "doc_id", k, w)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val anchorVol = perDocH.select(sum("c")).head.getLong(0)
        val nCross = Dedup.winnowCandidateIds(perDocH, includeSelf = false).count()
        val nSelf = Dedup.winnowCandidateIds(perDocH, includeSelf = true).count()
        // --spans also CHECKS the winnowing guarantee at corpus scale:
        // every doc participating in an emitted span must be a winnow
        // candidate (candidates ⊇ span docs), so a non-zero
        // span_docs_outside_cand is a prefilter-correctness violation,
        // not just a density datum.
        val (spanDocs, spanDocsOutsideCand) =
          if (!withSpans) (-1L, -1L)
          else {
            val s = Dedup.repeatedSpans(docs, "text", "doc_id", k, minLen, cap)
            // persist: count() and except().count() below would each
            // re-run the full span pipeline otherwise
            val ids = s.select(explode(array(col("id_a"), col("id_b"))).as("id"))
              .distinct().persist()
            try {
              val cand = Dedup.winnowCandidateIds(perDocH, includeSelf = false)
              (ids.count(), ids.except(cand).count())
            } finally ids.unpersist()
          }
        println(s"""{"dir":"$d","k":$k,"w":$w,"minLen":$minLen,"cap":$cap,""" +
          s""""n_docs":$nDocs,"gram_vol":$gramVol,"anchor_vol":$anchorVol,""" +
          f""""anchor_ratio":${anchorVol.toDouble / math.max(1L, gramVol)}%.4f,""" +
          s""""cand_cross":$nCross,"cand_incl_self":$nSelf,""" +
          f""""cand_frac":${nCross.toDouble / math.max(1L, nDocs)}%.4f,""" +
          s""""span_docs":$spanDocs,"span_docs_outside_cand":$spanDocsOutsideCand}""")
      } finally perDocH.unpersist()
    } finally spark.stop()
  }
}
