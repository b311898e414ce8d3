package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, words: Int): (Long, String) =
    (id, Seq.fill(words)("w").mkString(" "))

  test("greedy packing: budget respected, oversized docs isolated, order-deterministic") {
    val docs = Seq(
      doc(0, 100), doc(1, 200), doc(2, 250), // bin 0: 100+200 = 300, +250 > 512? 550 -> bin 1
      doc(3, 600), // oversized: own bin
      doc(4, 10), doc(5, 10),
      doc(1000, 500), doc(1001, 500) // next shard restarts at bin 0
    ).toDF("doc_id", "text")

    val packed = Packing.packGreedy(docs, budget = 512, shardSize = 1000)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(packed.map(_._3).toSeq == Seq(0, 0, 1, 2, 3, 3, 0, 1))
    assert(packed.map(_._4).toSeq == Seq(100, 200, 250, 600, 10, 10, 500, 500))

    // per-bin totals: within budget unless the bin is a single oversized doc
    val stats = Packing.binStats(
      Packing.packGreedy(docs, budget = 512, shardSize = 1000), budget = 512)
      .collect()
    stats.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val nDocs = r.getAs[Long]("n_docs")
      assert(tokens <= 512 || nDocs == 1, s"bin over budget with $nDocs docs: $tokens")
    }

    // shard independence: packing is unchanged for shards whose docs
    // didn't change when more data arrives in a LATER shard
    val more = docs.unionAll(Seq(doc(2000, 50)).toDF("doc_id", "text"))
    val repacked = Packing.packGreedy(more, budget = 512, shardSize = 1000)
      .where(col("id") < 2000).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(repacked.map(_._2).toSeq == packed.map(_._3).toSeq)
  }
}
