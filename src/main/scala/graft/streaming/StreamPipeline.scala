package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import java.util.concurrent.ConcurrentLinkedQueue

/** Structured-Streaming surface of the reference (SURVEY.md §2.9):
  * source → JSON parse → stateless derive → {console, foreachBatch} sinks on
  * a 5 s processing-time trigger, plus the reference's CONFIGURED-but-unwired
  * roadmap (watermarked windowed aggregation, stream scoring against the
  * saved GBT model — `streaming/streaming_config.yaml:17-55`).
  *
  * Sources are pluggable (SURVEY §7.1.6): the zero-egress environment swaps
  * Kafka (`spark_streaming.py:26-30`) for file/memory sources behind the same
  * envelope shape — a `value: string` column carrying JSON, exactly what the
  * Kafka source yields after `CAST(value AS STRING)`
  * (`kafka_to_influxdb.py:80`).
  *
  * Scale: the stateless path has no state store and no shuffle — each
  * micro-batch is a narrow scan+project, so throughput is source-bound.
  * The windowed aggregate keeps per-(window, key) state bounded by the
  * watermark horizon; `foreachBatch` writes PARTITION-side (foreachPartition),
  * deliberately fixing the reference's driver-side `collect()` bottleneck
  * (`kafka_to_influxdb.py:91` — its documented scalability ceiling,
  * SURVEY §4.2).
  */
object StreamPipeline {

  /** The stream's JSON event schema (explicit, like the reference's
    * `StructType` for Kafka JSON — `kafka_to_influxdb.py:33-65`).
    */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", TimestampType)))

  /** JSON envelope parse (P8): `from_json(value, schema)` → star-expand. */
  def parse(envelope: DataFrame): DataFrame =
    envelope
      .select(from_json(col("value").cast("string"), EventSchema).as("data"))
      .select("data.*")

  /** The stateless derive stage (P2/P5/P6/P7/P12) — identical logic to the
    * batch q16 so stream and batch semantics provably agree (asserted in
    * StreamingSpec): CASE tag, null-fill, cents cast, processing-time stamp.
    */
  def derive(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("type_tag",
        when(col("event_type") === "error", "fraud")
          .when(col("event_type") === "purchase", "money")
          .otherwise("normal"))
      .withColumn("value_filled", coalesce(col("value"), lit(0.0)))
      .withColumn("value_cents",
        round(col("value_filled") * 100).cast("long"))
      .withColumn("processed_at", current_timestamp())

  /** Roadmap item (streaming_config.yaml:17-18): event-time windowed counts
    * with a 5-minute watermark — per-(window, tag) state, bounded by the
    * watermark horizon, shuffled on the window key like any streaming agg.
    */
  def windowedCounts(derived: DataFrame): DataFrame =
    derived
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("type_tag"))
      .agg(count(lit(1)).as("n"),
        sum(col("value_filled")).as("sum_value"))

  /** S5 — the REAL Kafka reader (reference `kafka_to_influxdb.py:69-75`,
    * `spark_streaming.py:26-30`): `subscribe` + `startingOffsets=latest`,
    * with `maxOffsetsPerTrigger` bounding each micro-batch. Returns the
    * configured reader; [[kafkaSource]] adds the `.load()` +
    * `CAST(value AS STRING)` so the envelope is identical to
    * [[fileSource]]'s — downstream [[parse]]/[[derive]] don't know which
    * source fed them.
    *
    * The spark-sql-kafka connector jar must be on the CLUSTER classpath
    * (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark
    * version>`); this zero-egress container carries no connector, so specs
    * assert construction/config here and `.load()` fails with "Failed to
    * find data source: kafka" — an environment gap, not a code gap.
    */
  def kafkaReader(s: SparkSession, brokers: String, topic: String,
      maxOffsetsPerTrigger: Long = 10000L): DataStreamReader =
    s.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)

  /** Kafka envelope → the same `value: string` column every other source
    * yields (`kafka_to_influxdb.py:80`).
    */
  def kafkaSource(s: SparkSession, brokers: String, topic: String): DataFrame =
    kafkaReader(s, brokers, topic).load()
      .select(col("value").cast("string").as("value"))

  /** Kafka SINK: rows JSON-serialized into `value`, exactly-once via the
    * checkpoint dir. The write side of the reference's pipeline, which it
    * configures (`streaming_config.yaml`) but never wires.
    */
  def kafkaSink(derived: DataFrame, brokers: String, topic: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    derived
      .select(to_json(struct(derived.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)

  /** File source standing in for Kafka (S5): a directory of JSON lines with
    * the envelope shape; `maxFilesPerTrigger` plays `maxOffsetsPerTrigger`.
    */
  def fileSource(s: SparkSession, dir: String): DataFrame =
    s.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("maxFilesPerTrigger", 10)
      .text(dir)
      .select(col("value"))

  /** Console sink (S6): append mode, 5 s processing-time trigger,
    * truncate=false — `kafka_to_influxdb.py:139-149`.
    */
  def consoleSink(derived: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    derived.writeStream
      .format("console")
      .outputMode("append")
      .option("truncate", value = false)
      .trigger(trigger)

  /** InfluxDB line protocol for one event row — plain Scala string building,
    * as the reference does per-row (`kafka_to_influxdb.py:97-110`):
    * `measurement,tag=... field=... timestamp_ns`.
    */
  def lineProtocol(measurement: String, typeTag: String, eventId: Long,
      valueFilled: Double, tsMicros: Long): String =
    s"$measurement,type_tag=$typeTag event_id=${eventId}i," +
      s"value=$valueFilled ${tsMicros * 1000L}"

  /** foreachBatch sink (S7) shipping line-protocol to a pluggable writer.
    * The reference collects every batch to the driver and POSTs row-by-row;
    * here rows are formatted and emitted per PARTITION (executor-side), so
    * the sink scales with the cluster — the writer is the only pluggable
    * bit (an HTTP client in production, a queue in tests).
    */
  def foreachBatchSink(derived: DataFrame, writer: Iterator[String] => Unit,
      epochs: ConcurrentLinkedQueue[Long],
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): DataStreamWriter[Row] =
    derived.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        epochs.add(epochId)
        batch
          .select(col("type_tag"), col("event_id"), col("value_filled"),
            unix_micros(col("ts")).as("ts_us"))
          .foreachPartition { rows: Iterator[Row] =>
            writer(rows.map(r => lineProtocol("transactions",
              r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))))
          }
        ()
      }

  /** Event-time SESSIONIZATION on the stream: native `session_window` with
    * a 30-minute gap, per-user — the streaming twin of the batch
    * `WindowOps.w05Sessionize` (same gap rule; the batch op carries the
    * exact oracle, this one carries the state-store semantics: per-(user,
    * open-session) state, merged on overlap, emitted once the watermark
    * passes the session close).
    */
  def sessionCounts(derived: DataFrame): DataFrame =
    derived
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_filled")).as("session_value"))

  /** Roadmap item (streaming_config.yaml:21-55): score the stream with the
    * saved GBT model at a probability threshold — `model.transform` is a
    * row-wise projection, so it composes with any streaming plan.
    */
  def scoreStream(s: SparkSession, derived: DataFrame, modelPath: String,
      threshold: Double): DataFrame = {
    import org.apache.spark.ml.classification.GBTClassificationModel
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.functions.vector_to_array
    val model = GBTClassificationModel.load(modelPath)
    val assembled = new VectorAssembler()
      .setInputCols(Array("value_filled", "value_cents_d", "user_id_d",
        "hour_d", "zero"))
      .setOutputCol("features")
      .transform(derived
        .withColumn("value_cents_d", col("value_cents").cast("double"))
        .withColumn("user_id_d", col("user_id").cast("double"))
        .withColumn("hour_d", hour(col("ts")).cast("double"))
        .withColumn("zero", lit(0.0)))
    model.transform(assembled)
      .withColumn("fraud_prob", element_at(vector_to_array(col("probability")), 2))
      .withColumn("is_alert", col("fraud_prob") >= threshold)
      .select("event_id", "type_tag", "fraud_prob", "is_alert")
  }

  /** Run a bounded micro-batch pass: start, drain everything available,
    * stop. Used by specs and the demo main.
    */
  def runDrain(q: DataStreamWriter[Row]): StreamingQuery = {
    val query = q.start()
    query.processAllAvailable()
    query.stop()
    query
  }
}
