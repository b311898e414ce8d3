package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStreamBaseClass, MemoryStreamInputPartition}

/** [[org.apache.spark.sql.execution.streaming.runtime.MemoryStream]]
  * whose micro-batch data ships as ONE Spark broadcast per batch
  * instead of riding inside the task binary.
  *
  * Stock MemoryStream's `planInputPartitions` returns partitions that
  * EMBED their `UnsafeRow[]` slices; those partition objects are
  * serialized into the stage's task binary, so a driver-fed batch of
  * payload rows (documents, PNG/GIF bytes) is (a) re-serialized per
  * micro-batch into a multi-MiB task binary ("Broadcasting large task
  * binary with size 12.0 MiB" on the video feed) and (b) DESERIALIZED
  * IN FULL BY EVERY SCAN TASK — with 16 feed partitions each scan task
  * pays a full-batch deserialization to read its 1/16th slice. Here
  * the batch rows are broadcast once (deserialized once per executor
  * JVM, cached by the BlockManager) and the partitions carry only
  * (broadcast handle, from, until) — same rows, same slicing, same
  * order, because the parent's own `planInputPartitions` computes the
  * distribution and this class only re-packages it.
  *
  * Per-batch broadcasts are reclaimed by the ContextCleaner once the
  * batch's RDD is unreferenced (the same lifecycle as the task-binary
  * broadcasts they replace).
  */
class BroadcastMemoryStream[A: Encoder](
    id: Int, spark: SparkSession, numPartitions: Int)
  extends MemoryStreamBaseClass[A](id, spark, Some(numPartitions)) {

  override def planInputPartitions(
      start: OffsetV2, end: OffsetV2): Array[InputPartition] = {
    val parents = super.planInputPartitions(start, end)
    val slices = parents.map(_.asInstanceOf[MemoryStreamInputPartition].records)
    val all = Array.concat(slices: _*)
    val bc = spark.sparkContext.broadcast(all)
    val out = new Array[InputPartition](slices.length)
    var i = 0
    var off = 0
    while (i < slices.length) {
      out(i) = BroadcastRowsInputPartition(bc, off, off + slices(i).length)
      off += slices(i).length
      i += 1
    }
    out
  }

  override def createReaderFactory(): PartitionReaderFactory =
    BroadcastRowsReaderFactory
}

/** One feed partition: a slice [from, until) of the per-batch
  * broadcast row array.
  */
case class BroadcastRowsInputPartition(
    bc: Broadcast[Array[UnsafeRow]], from: Int, until: Int)
  extends InputPartition

object BroadcastRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BroadcastRowsInputPartition]
    new PartitionReader[InternalRow] {
      private val rows = p.bc.value
      private var i = p.from - 1
      override def next(): Boolean = { i += 1; i < p.until }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}
