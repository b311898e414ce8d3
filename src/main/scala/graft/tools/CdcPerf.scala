package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.EntryQueries
import graft.streaming.{CdcConfig, CdcPipeline}
import graft.operators.Partitioner

object CdcPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String, rows: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime()-t0)/1e9
      println(f"[perf] $name%-24s $s%7.2f s   ${rows/s/1e6}%8.2f M rows/s (n=$n)")
    }
    // big line corpus in memory: replicate events lines 30x ≈ 3M lines
    val lines = spark.range(0, 3000000).select(
      concat(lit("table public.t"), pmod($"id", lit(7)), lit(": INSERT: id[bigint]:"), $"id",
        lit(" name[text]:'user "), $"id", lit("''s data' value[double precision]:'"),
        format_string("%.2f", $"id" / 7.0), lit("' props[jsonb]:'{\"k\": "), pmod($"id", lit(100)), lit("}'")).as("line"),
      $"id".cast("string").as("txn"))
      .withColumn("timeBasedKey", concat($"txn", lit("-0")))
      .withColumn("ord", $"txn".cast("long"))
    lines.cache().count()
    time("render lines only", 3000000)( lines.queryExecution.toRdd.count() )
    // small-corpus JIT warmup: does first-run slowness follow the JVM
    // (disappears after this) or the plan (still slow on 3M)?
    val small = lines.limit(200000)
      .select(graft.functions.GraftFunctions.parse_test_decoding($"line").as("p"))
    time("parse 200k (jvm cold)", 200000)( small.queryExecution.toRdd.count() )
    val parsed = lines.select(graft.functions.GraftFunctions.parse_test_decoding($"line").as("p"))
    time("parse (cold)", 3000000)( parsed.queryExecution.toRdd.count() )
    time("parse (warm)", 3000000)( parsed.queryExecution.toRdd.count() )
    val full = CdcPipeline.transform(
      graft.fixtures.CdcFixture.withSourceMeta(lines), 
      CdcConfig(filterTables = Seq("public.t3"), whitelist = false,
        partitionMethod = Partitioner.TableName))
    time("full pipeline (cold)", 3000000)( full.queryExecution.toRdd.count() )
    time("full pipeline (warm)", 3000000)( full.queryExecution.toRdd.count() )
    spark.stop()
  }
}
