package graft.core

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed core record (SURVEY.md §1.5): the storage-shaped sensor reading.
  * The DataFrame pipeline is the primary surface (dynamic schema at the
  * parse edge); this typed view is for consumers that want compile-time
  * field checks on the clean, enriched output. */
case class SensorReading(
    time_received: Timestamp,
    sensor_group: String,
    sensor_id: Int,
    uptime: Int,
    temperature: Int,
    pressure: Int,
    humidity: Int,
    ix: Int,
    iy: Int,
    iz: Int,
    mask: Int)

object SensorReading {
  implicit val encoder: Encoder[SensorReading] = Encoders.product[SensorReading]

  /** Typed view over the batch pipeline output. */
  def pipeline(spark: SparkSession, ndjsonPath: String, dimPath: String): Dataset[SensorReading] =
    graft.pipeline.SensorPipeline.run(spark, ndjsonPath, dimPath).as[SensorReading]
}
