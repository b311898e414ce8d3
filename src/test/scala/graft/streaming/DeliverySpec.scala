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

    // the full delivery path: affinity routing, the sink-edge WAL-order
    // sort (a shuffle does not preserve order — the sort is part of the
    // delivery contract), then the REAL chunked-sink machinery; the
    // transport must receive every key's records in WAL order across
    // chunk boundaries. (Like the reference's ordering itest, this runs
    // without sink errors: a partial-failure resend re-delivers later
    // by design in both systems.)
    val routed = Router.route(df, 4, Router.Partition())
    val transports = routed.repartition(4, col("workerId"))
      .sortWithinPartitions("walStart")
      .select("partitionKey", "timeBasedKey", "walStart", "json")
      .as[(String, String, Long, String)]
      .mapPartitions { it =>
        val transport = new InMemoryTransport()
        val recs = it.map { case (k, tbk, w, j) =>
          SinkRecord(k, tbk, w, j.getBytes("UTF-8"))
        }
        ChunkedSink.writePartition(recs, BatchCaps(100, Long.MaxValue, Long.MaxValue),
          transport, () => new Backoff(sleeper = _ => ()))
        // arrival order per key as the transport saw it
        transport.sent.flatten.map(r => (r.partitionKey, r.walStart)).iterator
      }.collect()

    // per key: the transport's arrival order is WAL order (chunking and
    // the retry resend never reorder), and every record arrived
    transports.groupBy(_._1).foreach { case (_, rows) =>
      val order = rows.map(_._2).toSeq
      assert(order == order.sorted, s"arrival order != WAL order: ${order.take(10)}")
    }
    assert(transports.length == n, "every record delivered exactly once")
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

  test("kafka writer contract: projection and options land in the plan, per key mode") {
    // O14's full DataStreamWriter contract, asserted WITHOUT the
    // connector jar: kafkaSinkPlan is exactly what toKafka hands the
    // kafka-format writer — (key, value) string projection + the
    // topic/bootstrap/checkpoint/record-cap options
    // (reference kafka/config.go:43-64)
    val df = Seq(
      ("public.users", "42", "42-123", """{"op":"INSERT"}"""),
      ("public.posts", "43", "43-9", """{"op":"DELETE"}"""))
      .toDF("table", "txn", "timeBasedKey", "json")

    val plan = CdcPipeline.kafkaSinkPlan(df, "b1:9092,b2:9092", "wal_topic",
      KafkaKeyMode.TxnTimeBased, "/tmp/ckpt")
    assert(plan.options("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(plan.options("topic") == "wal_topic")
    assert(plan.options("checkpointLocation") == "/tmp/ckpt")
    // reference per-record cap: 1 MB (kafka/config.go KafkaMaxMessageBytes)
    assert(plan.options("kafka.max.request.size") == "1000000")
    assert(plan.projected.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq ==
      Seq("key" -> "string", "value" -> "string"))

    def keys(m: KafkaKeyMode): Seq[String] =
      CdcPipeline.kafkaSinkPlan(df, "b", "t", m, "c")
        .projected.select("key").as[String].collect().toSeq.sorted
    assert(keys(KafkaKeyMode.TxnTimeBased) == Seq("42-123", "43-9"))
    assert(keys(KafkaKeyMode.Transaction) == Seq("42", "43"))
    assert(keys(KafkaKeyMode.TableName) == Seq("public.posts", "public.users"))
    assert(keys(KafkaKeyMode.Random).forall(_.matches("[0-9a-f-]{36}")))
    // values are the marshalled json, untouched, for every mode
    assert(CdcPipeline.kafkaSinkPlan(df, "b", "t", KafkaKeyMode.TableName, "c")
      .projected.select("value").as[String].collect().toSet ==
      Set("""{"op":"INSERT"}""", """{"op":"DELETE"}"""))
  }
}
