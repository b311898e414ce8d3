package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      Bucketing.writeBucketed(li, "li_b", 4, Seq("l_orderkey"))
      Bucketing.writeBucketed(o, "o_b", 4, Seq("l_orderkey"))

      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", Seq("l_orderkey"))
      assert(Bucketing.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)

      // same join on the unbucketed parquet shuffles
      val plain = li.join(o, Seq("l_orderkey"))
      assert(!Bucketing.isShuffleFree(plain))

      // and the bucketed join is correct
      assert(joined.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
