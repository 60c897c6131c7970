package graft

import org.apache.spark.sql.functions._
import graft.pipeline.SensorPipeline
import graft.sources.{LineMicroBatchStream, LineOffset, LineSlice, LineStreamSource}
import graft.streaming.SensorStream

/** The custom DataSourceV2 micro-batch source (graft's in-engine stand-in
  * for the reference's MQTT/Kafka edge, R1/R11): offset-contract unit
  * checks plus the end-to-end exactly-once discipline — sensor pipeline
  * through the source equals the batch form, and a kill-and-restart from
  * the checkpoint resumes without loss or duplication. */
class LineStreamSpec extends SparkSpec {

  private def ndjsonLines: Seq[String] =
    scala.io.Source.fromFile(Fixtures.sensorNdjson).getLines().toSeq

  private def write(path: String, lines: Seq[String]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes("UTF-8"))

  test("offset contract: latestOffset counts all segments, ranges slice exactly") {
    val dir = java.nio.file.Files.createTempDirectory("linesrc").toString
    write(s"$dir/a.txt", Seq("a1", "a2", "a3"))
    write(s"$dir/b.txt", Seq("b1", "b2"))
    val stream = new LineMicroBatchStream(dir)
    assert(stream.initialOffset() == LineOffset(0L))
    assert(stream.latestOffset() == LineOffset(5L))
    // a batch spanning the tail of segment a and the head of segment b
    val slices = stream.planInputPartitions(LineOffset(1L), LineOffset(4L))
      .map(_.asInstanceOf[LineSlice])
      .map(s => (new java.io.File(s.path).getName, s.startLine, s.endLine)).toSeq
    assert(slices == Seq(("a.txt", 1L, 3L), ("b.txt", 0L, 1L)))
    // an empty range plans nothing; offsets survive a serde round-trip
    assert(stream.planInputPartitions(LineOffset(5L), LineOffset(5L)).isEmpty)
    assert(stream.deserializeOffset(LineOffset(3L).json()) == LineOffset(3L))
    // new segment appended after the old ones: offsets extend monotonically
    write(s"$dir/c.txt", Seq("c1"))
    assert(stream.latestOffset() == LineOffset(6L))
    val again = stream.planInputPartitions(LineOffset(1L), LineOffset(4L))
      .map(_.asInstanceOf[LineSlice])
      .map(s => (new java.io.File(s.path).getName, s.startLine, s.endLine)).toSeq
    assert(again == slices, "already-planned ranges must be stable as the log grows")
  }

  test("maxLinesPerTrigger caps every micro-batch; rows still arrive exactly once") {
    // R5's runtime face: admission control clamps each batch's end offset
    // to start + cap, so a backlog drains in bounded bites instead of one
    // giant first batch
    val dir = java.nio.file.Files.createTempDirectory("linecap").toString
    val lines = (1 to 23).map(i => s"line-$i")
    write(s"$dir/seg-000.txt", lines.take(11))
    write(s"$dir/seg-001.txt", lines.drop(11))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = spark.readStream.format(LineStreamSource.format)
      .option("maxLinesPerTrigger", "5")
      .load(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(_.getString(0))
        batchSizes.synchronized { batchSizes += rows.length; seen ++= rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batchSizes.nonEmpty && batchSizes.forall(_ <= 5),
      s"micro-batch exceeded the cap: $batchSizes")
    assert(batchSizes.count(_ > 0) >= 5, // 23 lines / cap 5 -> at least 5 bites
      s"backlog not drained in capped bites: $batchSizes")
    assert(seen.sorted.toSeq == lines.sorted, "lines lost or duplicated under the cap")

    // unit face: the clamp itself, plus all-available when uncapped
    val s = new LineMicroBatchStream(dir, Some(5L))
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    assert(s.latestOffset(LineOffset(0L), ReadLimit.maxRows(5L)) == LineOffset(5L))
    assert(s.latestOffset(LineOffset(20L), ReadLimit.maxRows(5L)) == LineOffset(23L))
    assert(s.latestOffset(LineOffset(0L), ReadLimit.allAvailable()) == LineOffset(23L))
    assert(s.reportLatestOffset() == LineOffset(23L))
  }

  test("sensor pipeline through the DSv2 source survives restart without loss or dupes") {
    // the custom-source image of the reference's consumer restart: commit
    // offsets (checkpoint), die, come back, resume from the committed
    // offset — no record lost, none duplicated.
    val base = java.nio.file.Files.createTempDirectory("linesrc2").toString
    val inDir = s"$base/in"; val store = s"$base/store"; val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()
    val lines = ndjsonLines
    val (part1, part2) = lines.splitAt(lines.length / 2)
    write(s"$inDir/seg-000.ndjson", part1)

    val dim = SensorPipeline.loadDim(spark, Fixtures.sensorDim)
    def startQuery() = SensorStream.transform(
        spark.readStream.format(LineStreamSource.format).load(inDir), dim)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch(SensorStream.upsertBatch(spark, store) _)
      .start()

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(store).count() > 0)

    write(s"$inDir/seg-001.ndjson", part2)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    // a third restart with no new data must not replay anything
    val before = spark.read.parquet(store).collect().toSet
    val q3 = startQuery()
    q3.processAllAvailable(); q3.stop()
    assert(spark.read.parquet(store).collect().toSet == before)

    val streamed = spark.read.parquet(store).drop("seq")
      .orderBy("sensor_group", "sensor_id", "time_received")
    val batch = SensorPipeline.run(spark, Fixtures.sensorNdjson, Fixtures.sensorDim)
    assert(streamed.count() == batch.count(), "restart lost or duplicated rows")
    assert(streamed.select(batch.columns.map(col): _*).collect().toSeq ==
      batch.collect().toSeq)
  }
}
