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

  /** Kafka source (R11): one topic per sensor_group, earliest offsets,
    * offsets tracked by the query checkpoint (strictly stronger than the
    * reference's timer-based auto-commit — SURVEY.md §4.3).
    *
    * NOTE: compiles against the public DataStreamReader API; running it
    * requires the spark-sql-kafka connector on the classpath and a broker
    * — neither exists in this offline environment, so this path is
    * exercised only in connected deployments. */
  def fromKafka(spark: SparkSession, bootstrap: String, topics: Seq[String],
                maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .load()
      .select(col("value").cast("string").as("value"))

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

  /** Kafka sink with per-row dynamic topic routing (R9/R10: topic :=
    * sensor_group). Same offline caveat as fromKafka. */
  def toKafkaWriter(records: DataFrame, bootstrap: String, checkpoint: String) =
    records
      .select(col("sensor_group").as("topic"),
        col("sensor_id").cast("string").as("key"),
        to_json(struct(records.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpoint)
}
