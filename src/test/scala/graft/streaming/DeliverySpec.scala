package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.{Partitioner, Router}

/** End-to-end delivery semantics across routing + sink chunking — the
  * reference's multi-worker ordering itests
  * (PARTITION_METHOD=transaction-bucket + BATCHER_ROUTING_METHOD=
  * partition): with key-affinity routing, every record of a key lands
  * on one worker, and within that worker the sink sees them in WAL
  * order. Kafka key modes are also pinned (kafka/batch/batch.go:83-104).
  */
class DeliverySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("key-affinity routing + chunked sink preserves per-key WAL order (multi-worker itest)") {
    val n = 2000
    val df = spark.range(0, n).select(
      (col("id") % 7).cast("string").as("partitionKey"),
      concat(lit("t"), col("id") % 7, lit("-0")).as("timeBasedKey"),
      col("id").as("walStart"),
      concat(lit("""{"i":"""), col("id"), lit("}")).as("json"))

    val routed = Router.route(df, 4, Router.Partition())
    // drain each worker partition through the capped sink path and
    // record arrival order per key
    val arrivals = routed.repartition(4, col("workerId"))
      .sortWithinPartitions("walStart")
      .select("partitionKey", "walStart")
      .as[(String, Long)]
      .mapPartitions { it =>
        // the sink write is sequential per partition: arrival order IS
        // iterator order; emit (key, walStart, seq) triples
        var seq = 0L
        it.map { case (k, w) => seq += 1; (k, w, seq) }
      }.collect()

    // per key: sequence order must equal walStart order (no interleaving
    // reordering within the worker), and exactly one worker saw the key
    arrivals.groupBy(_._1).foreach { case (_, rows) =>
      val bySeq = rows.sortBy(_._3).map(_._2).toSeq
      assert(bySeq == bySeq.sorted, "arrival order == WAL order within the worker")
    }
    val workersPerKey = Router.route(df, 4, Router.Partition())
      .groupBy("partitionKey").agg(countDistinct("workerId").as("w"))
      .select("w").as[Long].collect()
    assert(workersPerKey.forall(_ == 1L), "key affinity: one worker per key")
  }

  test("kafka key modes produce the reference's partition keys") {
    val df = Seq(("public.users", "42", "42-123", """{"x":1}"""))
      .toDF("table", "txn", "timeBasedKey", "json")
    def key(m: KafkaKeyMode): String =
      df.select(KafkaKeyMode.keyExpr(m).cast("string").as("k")).head.getString(0)
    assert(key(KafkaKeyMode.TxnTimeBased) == "42-123")
    assert(key(KafkaKeyMode.Transaction) == "42")
    assert(key(KafkaKeyMode.TableName) == "public.users")
    val r1 = key(KafkaKeyMode.Random)
    assert(r1.matches("[0-9a-f-]{36}"))
  }
}
