package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sensor stream sources behind one shape: a streaming (or batch)
  * DataFrame with a single string column `value` holding one JSON wire
  * record per row — exactly what SensorStream.transform consumes.
  *
  * Reference mapping (SURVEY.md §2.A): R1/R11 (MQTT/Kafka ingest) →
  * `fromKafka`; R20 (file replay mock) → `fromNdjsonDir`; the stress
  * drivers' paced emission → `fromRate`.
  */
object SensorSources {

  /** Streaming file source over a directory of NDJSON files (the engine's
    * offline stand-in for the broker edge; also the replay path). */
  def fromNdjsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", "1")
      .load(dir)

  /** Batch form of the same source. */
  def fromNdjsonBatch(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** The exact reader options [[fromKafka]] wires, factored PURE so the
    * offline spec locks them down: multi-topic subscribe, earliest
    * offsets (the checkpoint owns progress — strictly stronger than the
    * reference's timer-based auto-commit, SURVEY.md §4.3), and the
    * per-trigger admission cap. What remains untestable offline is the
    * connector call itself, nothing of ours. */
  private[graft] def kafkaSourceOptions(bootstrap: String,
                                        topics: Seq[String],
                                        maxOffsetsPerTrigger: Long)
      : Map[String, String] = {
    require(bootstrap.nonEmpty, "fromKafka: empty bootstrap servers")
    require(topics.nonEmpty && topics.forall(t => t.nonEmpty && !t.contains(",")),
      s"fromKafka: bad topic list $topics")
    require(maxOffsetsPerTrigger > 0,
      s"fromKafka: maxOffsetsPerTrigger=$maxOffsetsPerTrigger")
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString)
  }

  /** Kafka's fixed wire schema (key/value BINARY + metadata) → the
    * one-string-column `value` shape the pipeline consumes. Pure
    * Catalyst — spec-covered offline against a hand-built wire-shaped
    * frame. */
  private[graft] def kafkaWireValue(kafka: DataFrame): DataFrame =
    kafka.select(col("value").cast("string").as("value"))

  /** Kafka source (R11): one topic per sensor_group, earliest offsets,
    * offsets tracked by the query checkpoint.
    *
    * NOTE: the `.format("kafka").load()` call requires the
    * spark-sql-kafka connector on the classpath and a broker — neither
    * exists in this offline environment. Everything around it
    * ([[kafkaSourceOptions]], [[kafkaWireValue]]) is spec-tested. */
  def fromKafka(spark: SparkSession, bootstrap: String, topics: Seq[String],
                maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    kafkaWireValue(
      spark.readStream
        .format("kafka")
        .options(kafkaSourceOptions(bootstrap, topics, maxOffsetsPerTrigger))
        .load())

  /** Rate source → synthetic wire records (load/soak testing without any
    * external system; the moral equivalent of the reference's paced mock
    * sensor, mocks/sensor.py:88-145). */
  def fromRate(spark: SparkSession, rowsPerSecond: Int, nSensors: Int = 40): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(to_json(struct(
        (pmod(col("value"), lit(nSensors)) + 100).cast("int").as("id"),
        (col("value") % 100000).cast("int").as("uptime"),
        (pmod(col("value"), lit(56)) - 10).cast("int").as("T"),
        (pmod(col("value"), lit(100)) + 950).cast("int").as("P"),
        pmod(col("value"), lit(101)).cast("int").as("H"),
        (pmod(col("value"), lit(201)) - 100).cast("int").as("Ix"),
        (pmod(col("value") * 7, lit(201)) - 100).cast("int").as("Iy"),
        (pmod(col("value") * 13, lit(201)) - 100).cast("int").as("Iz"),
        pmod(col("value"), lit(256)).cast("int").as("M"),
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").as("time_received"),
        col("value").as("seq"))).as("value"))

  /** The sink's wire projection (R9/R10): per-row DYNAMIC topic
    * routing (topic := sensor_group), sensor_id as the partitioning
    * key (per-sensor ordering within a topic), the full record as the
    * JSON value. Pure Catalyst — spec-covered offline. */
  private[graft] def kafkaWireRecords(records: DataFrame): DataFrame =
    records
      .select(col("sensor_group").as("topic"),
        col("sensor_id").cast("string").as("key"),
        to_json(struct(records.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** The exact writer options [[toKafkaWriter]] wires — pure, spec-
    * locked like [[kafkaSourceOptions]]. */
  private[graft] def kafkaSinkOptions(bootstrap: String,
                                      checkpoint: String): Map[String, String] = {
    require(bootstrap.nonEmpty, "toKafkaWriter: empty bootstrap servers")
    require(checkpoint.nonEmpty, "toKafkaWriter: empty checkpoint location")
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "checkpointLocation" -> checkpoint)
  }

  /** Kafka sink with per-row dynamic topic routing (R9/R10). Same
    * offline caveat as [[fromKafka]] — only the `.format("kafka")`
    * connector call is beyond the specs. */
  def toKafkaWriter(records: DataFrame, bootstrap: String, checkpoint: String) =
    kafkaWireRecords(records)
      .writeStream
      .format("kafka")
      .options(kafkaSinkOptions(bootstrap, checkpoint))

  /** The spark-cassandra-connector options of the declared Cassandra
    * swap-point (reference cassandra_storage.py:17-129; SURVEY §7.4) —
    * pure, spec-locked like [[kafkaSinkOptions]]. */
  private[graft] def cassandraSinkOptions(keyspace: String,
                                          table: String): Map[String, String] = {
    require(keyspace.nonEmpty, "toCassandraBatch: empty keyspace")
    require(table.nonEmpty, "toCassandraBatch: empty table")
    Map("keyspace" -> keyspace, "table" -> table)
  }

  /** Cassandra sink as a foreachBatch body — the exact slot
    * [[graft.streaming.SensorStream.upsertBatch]] occupies today, so a
    * connected deployment swaps the parquet store for Cassandra by
    * changing ONE argument. Semantics line up by construction:
    * Cassandra's append IS a primary-key upsert (per-cell
    * last-write-wins), the same contract the parquet store reproduces
    * and the replay/exactly-once specs prove. Offline caveat: the
    * connector jar and a cluster are absent here, so only the
    * `.format(...)` call is beyond the specs. */
  def toCassandraBatch(keyspace: String, table: String)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      batch.write
        .format("org.apache.spark.sql.cassandra")
        .options(cassandraSinkOptions(keyspace, table))
        .mode("append")
        .save()
}
