package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc equivalence check between two declared queries: collects both
  * and compares row SETS (the driver's oracle hashes sorted rows; for
  * "one oracle, two physical forms" query pairs — bloom vs plain
  * incremental dedup, incremental vs full clustering — set equality is
  * exactly the claim). Usage:
  *   runMain graft.tools.QueryDiff <sfDir> <queryA> <queryB>
  */
object QueryDiff {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, qa, qb) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = SparkEntry.queries(qa)(spark, sfDir).collect().map(_.toString).toSet
    val b = SparkEntry.queries(qb)(spark, sfDir).collect().map(_.toString).toSet
    println(s"[querydiff] $qa=${a.size} rows, $qb=${b.size} rows, " +
      s"equal=${a == b}")
    if (a != b) {
      (a -- b).take(5).foreach(r => println(s"[querydiff] only in $qa: $r"))
      (b -- a).take(5).foreach(r => println(s"[querydiff] only in $qb: $r"))
    }
    spark.stop()
    if (a != b) sys.exit(1)
  }
}
