package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.functions.GraftFunctions
import graft.operators.{Marshaller, Partitioner, Router, TableFilter}

/** Pipeline configuration mirroring the reference's CLI surface
  * (main/main.go replicate flags).
  */
final case class CdcConfig(
    filterTables: Seq[String] = Nil,
    whitelist: Boolean = false, // reference default: empty blacklist = passthrough
    regexFilter: Boolean = false,
    partitionMethod: Partitioner.Method = Partitioner.NoKey,
    noMarshalOldValue: Boolean = false,
    workers: Int = 1,
    routing: Router.Mode = Router.RoundRobin,
    triggerMillis: Long = 1000L) // reference batcher tick: 1 s

/** The Structured-Streaming CDC pipeline: raw `test_decoding` lines →
  * parse → filter → partition-key → marshal → sink, with micro-batch
  * cadence standing in for the reference's flush ages and Spark
  * checkpointing + the ack listener standing in for the ledger
  * (SURVEY §3.1, §7).
  *
  * The whole stateless middle is ONE Catalyst pipeline — parse, filter,
  * key and JSON-render fuse into a single whole-stage-codegen loop per
  * micro-batch; the only exchange is the optional worker routing.
  */
object CdcPipeline {

  /** Stateless transform: a DataFrame with (`line`, and optionally
    * `walStart`/`serverWalEnd`/`serverTimeMs`/`txn`/`timeBasedKey`
    * metadata) → marshalled change records. Works identically on batch
    * and streaming frames.
    */
  def transform(lines: DataFrame, cfg: CdcConfig): DataFrame = {
    val withMeta = Seq("walStart", "serverWalEnd", "serverTimeMs")
      .foldLeft(lines)((df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(0L)))

    // Table filtering runs on the PRELUDE parse (relation + operation
    // only, the reference's two-phase design, parselogical.go:89-95),
    // BEFORE the full parse. Filtering on fields of the full parse
    // would let predicate pushdown substitute the parse expression into
    // the filter — evaluating the column automaton 3-4× per row; the
    // prelude is cheap enough to duplicate, and rows that don't pass
    // never pay column parsing at all (the reference's own intent).
    val tf = TableFilter(cfg.filterTables, cfg.whitelist, cfg.regexFilter)
    val preFiltered = withMeta.where(tf.predicate(
      GraftFunctions.prelude_relation(col("line")),
      GraftFunctions.prelude_operation(col("line"))))

    // Source-provided metadata wins over parsed fields (a CDC source
    // stamps txn/timeBasedKey itself; the parsed txn is only set on
    // BEGIN/COMMIT lines anyway).
    val parsedFields = Seq("txn", "relation", "operation", "noTupleData", "columns", "oldColumns")
    val inputCols = withMeta.columns.filter(_ != "line")
    val parsed = preFiltered
      .withColumn("p", GraftFunctions.parse_test_decoding(col("line")))
      .where(col("p").isNotNull)
      .select(inputCols.map(col) ++
        parsedFields.filterNot(inputCols.contains).map(f => col(s"p.$f").as(f)): _*)

    val stamped =
      if (parsed.columns.contains("timeBasedKey")) parsed
      else parsed.withColumn("timeBasedKey", concat(col("txn"), lit("-0")))

    val keyed = Partitioner(cfg.partitionMethod)(stamped)
    val marshalled = Marshaller(cfg.noMarshalOldValue)(keyed)
      .select("operation", "relation", "json", "timeBasedKey", "walStart", "txn", "partitionKey")
      .withColumnRenamed("relation", "table")
    if (cfg.workers > 1) Router.route(marshalled, cfg.workers, cfg.routing)
    else marshalled
  }

  /** File-based line source: behavior-equivalent stand-in for the
    * replication client while a DSv2 CDC source is not wired (SURVEY §7
    * step 3) — each text file is a WAL segment of raw lines.
    */
  def fromTextFiles(spark: SparkSession, path: String): DataFrame =
    spark.readStream.option("maxFilesPerTrigger", 16).text(path)
      .withColumnRenamed("value", "line")

  /** The DSv2 CDC source ([[graft.sources.WalSourceProvider]]): LSN
    * offsets, source-side txn stamping, per-trigger admission control,
    * commit→ack. Rows feed [[transform]] directly.
    */
  def fromWalSource(spark: SparkSession, path: String,
                    maxLinesPerTrigger: Option[Int] = None,
                    epochNanos: Long = 0L): DataFrame = {
    val r = spark.readStream.format("graft-wal")
      .option("path", path)
      .option("epochNanos", epochNanos.toString)
    maxLinesPerTrigger.foreach(n => r.option("maxLinesPerTrigger", n.toString))
    r.load()
  }

  /** Console sink (reference stdout transporter O10). */
  def toConsole(df: DataFrame, cfg: CdcConfig): DataStreamWriter[Row] =
    df.writeStream
      .format("console")
      .trigger(Trigger.ProcessingTime(cfg.triggerMillis))
      .option("truncate", value = false)

  /** Date-partitioned gzip NDJSON file sink — the S3 transporter's
    * `keyspace/YYYY/MM/DD/HH/...gz` layout (O12,
    * reference transport/transporters/s3). On a cluster, pointing the
    * path at `s3a://bucket/keyspace` is the complete story: one object
    * per partition file, gzip-compressed, date-bucketed.
    */
  def toGzipFiles(df: DataFrame, path: String, checkpoint: String,
                  cfg: CdcConfig): DataStreamWriter[Row] =
    withDateColumns(df)
      .select("json", "year", "month", "day", "hour")
      .writeStream
      .format("text")
      .option("compression", "gzip")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("year", "month", "day", "hour")
      .trigger(Trigger.ProcessingTime(cfg.triggerMillis))

  /** Attach the S3 layout's date-partition columns (the reference keys
    * objects by wall-clock at write time — s3/transporter key_join).
    */
  def withDateColumns(df: DataFrame): DataFrame =
    df.withColumn("__t", current_timestamp())
      .withColumn("year", date_format(col("__t"), "yyyy"))
      .withColumn("month", date_format(col("__t"), "MM"))
      .withColumn("day", date_format(col("__t"), "dd"))
      .withColumn("hour", date_format(col("__t"), "HH"))
      .drop("__t")

  /** Transport-backed sink (Kinesis O11 / RabbitMQ O13): every record
    * flows through [[ChunkedSink.foreachWriter]] — greedy chunking
    * under the per-sink caps, partial-failure retry under exponential
    * backoff, and the epoch-replay guard for exactly-once across
    * micro-batch replays. The RPC edge is a [[RecordTransport]]
    * factory, resolved per-partition at `open` time.
    */
  def toTransport(df: DataFrame, caps: BatchCaps,
                  transportFactory: () => RecordTransport,
                  cfg: CdcConfig,
                  tracker: EpochTracker = EpochTracker.none): DataStreamWriter[Row] =
    df.writeStream
      .foreach(ChunkedSink.foreachWriter(caps, transportFactory, tracker))
      .trigger(Trigger.ProcessingTime(cfg.triggerMillis))

  /** The kafka writer's full contract — key/value projection for the
    * chosen [[KafkaKeyMode]] plus every option handed to the
    * `DataStreamWriter` — separated from the (connector-jar-dependent)
    * `writeStream` call so specs can assert it without the jar:
    * topic, bootstrap servers, checkpoint, and the reference's 1 MB
    * record cap (kafka/config.go:43-64) as the producer's
    * `max.request.size`.
    */
  final case class KafkaSinkPlan(projected: DataFrame, options: Map[String, String])

  def kafkaSinkPlan(df: DataFrame, bootstrap: String, topic: String,
                    keyMode: KafkaKeyMode, checkpoint: String): KafkaSinkPlan =
    KafkaSinkPlan(
      df.select(
        KafkaKeyMode.keyExpr(keyMode).cast("string").as("key"),
        col("json").cast("string").as("value")),
      Map(
        "kafka.bootstrap.servers" -> bootstrap,
        "topic" -> topic,
        "checkpointLocation" -> checkpoint,
        "kafka.max.request.size" -> BatchCaps.kafka.maxRecordBytes.toString))

  /** Kafka sink wiring (O14): built-in connector with the reference's
    * partition-key modes (kafka/batch/batch.go:83-104). Not runnable in
    * this build environment (no spark-sql-kafka connector jar), but the
    * full writer contract is [[kafkaSinkPlan]], which is spec-asserted.
    */
  def toKafka(df: DataFrame, bootstrap: String, topic: String,
              keyMode: KafkaKeyMode, checkpoint: String,
              cfg: CdcConfig): DataStreamWriter[Row] = {
    val plan = kafkaSinkPlan(df, bootstrap, topic, keyMode, checkpoint)
    plan.projected.writeStream
      .format("kafka")
      .options(plan.options)
      .trigger(Trigger.ProcessingTime(cfg.triggerMillis))
  }
}

/** Kafka partition-key modes (reference kafka/batch/batch.go:83-104). */
sealed trait KafkaKeyMode
object KafkaKeyMode {
  case object TxnTimeBased extends KafkaKeyMode // timeBasedKey per message
  case object Transaction extends KafkaKeyMode // txn id
  case object TableName extends KafkaKeyMode
  case object Random extends KafkaKeyMode

  def keyExpr(mode: KafkaKeyMode): org.apache.spark.sql.Column = mode match {
    case TxnTimeBased => col("timeBasedKey")
    case Transaction => col("txn")
    case TableName => col("table")
    case Random => expr("uuid()")
  }
}
