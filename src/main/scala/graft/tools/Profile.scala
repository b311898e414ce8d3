package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.cache().count()
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingle_hashes(col("text"), 3).as("hs"))
    time("hashed sets native")( sh.queryExecution.toRdd.count() )
    val inv = sh.select(col("id"), explode(col("hs")).as("shingle"))
    time("inverted index")( inv.queryExecution.toRdd.count() )
    val rare = inv.groupBy("shingle").count().where(col("count") <= 10)
    time("rare")( rare.queryExecution.toRdd.count() )
    val blocked = inv.join(rare.select("shingle"), Seq("shingle"))
    time("blocked")( blocked.queryExecution.toRdd.count() )
    val pairs = blocked.as("x").join(blocked.as("y"), Seq("shingle"))
      .where(col("x.id") < col("y.id")).select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    time("pairs")( pairs.queryExecution.toRdd.count() )
    val full = pairs
      .join(sh.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("jaccard", round(Dedup.jaccard_long(col("hs_a"), col("hs_b")), 6))
      .where(col("jaccard") >= 0.2).select("id_a", "id_b", "jaccard")
    time("full ngram (native jac)")( full.queryExecution.toRdd.count() )
    time("operator ngram")( Dedup.ngramJaccardDuplicates(docs, "text", "doc_id", 3, 0.2, 10).queryExecution.toRdd.count() )
    time("operator minhash")( Dedup.minhashDuplicates(docs, "text", "doc_id", threshold = 0.2).queryExecution.toRdd.count() )
    spark.stop()
  }
}
