package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key
  private val skewed = ((1 to 900).map(i => ("hot", i.toLong, 1.0)) ++
    (1 to 100).map(i => (s"cold${i % 10}", i.toLong + 1000, 2.0)))
    .toDF("k", "id", "v")

  test("salted count equals plain count") {
    val plain = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, "k", "id", saltBuckets = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted sum equals plain sum") {
    val plain = skewed.groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(skewed, "k", "v", "id", saltBuckets = 8)
      .as[(String, Double)].collect().toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("k", "label")
    val plain = skewed.join(dim, "k").count()
    val salted = Skew.saltedJoin(skewed, dim, "k", saltBuckets = 8, spreadCol = "id").count()
    assert(salted == plain)
  }
}
