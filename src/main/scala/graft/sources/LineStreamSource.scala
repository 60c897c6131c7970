package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** File-backed DataSourceV2 micro-batch source — the in-engine stand-in
  * for the reference's MQTT/Kafka edge (R1/R11:
  * simpss/producers/mqtt_kafka_producer.py:56-85 subscribes the broker,
  * simpss_persistence/kafka_consumer/consumer.py:16-48 consumes with
  * committed offsets). It proves the streaming-source contract the Kafka
  * connector can't exercise offline: monotonic offset tracking, planning
  * exactly the [start, end) range, and loss/duplication-free replay from
  * a checkpointed offset after a restart.
  *
  * Model: the source directory is an append-only log of immutable line
  * files (Kafka-segment discipline). Files are ordered by name and every
  * line gets a global sequential offset; `latestOffset` is the total line
  * count, and a micro-batch reads the global range its offsets span.
  * Contract (documented, asserted nowhere cheaper): once a file is
  * visible it never changes, and new files sort lexicographically AFTER
  * existing ones — exactly a log segment's lifecycle.
  *
  * Scale shape: one input partition per (file, range) slice, so
  * parallelism tracks the segment count like Kafka's partition readers;
  * the driver holds only (name, lineCount) pairs per segment.
  */
class LineStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineStreamSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LineStreamTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object LineStreamSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
  /** format() name for readStream (resolved by class name). */
  val format: String = classOf[LineStreamProvider].getName
}

private[graft] class LineStreamTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft line stream: .load(path) or option(\"path\", ...) is required")
  override def name(): String = s"graft-lines:$path"
  override def schema(): StructType = LineStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // R5's runtime face (bounded buffer / backpressure): cap the lines
    // admitted per micro-batch, the maxOffsetsPerTrigger analogue.
    val maxLines = Option(options.get("maxLinesPerTrigger")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxLinesPerTrigger must be positive, got $n")
      n
    }
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = LineStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new LineMicroBatchStream(path, maxLines)
      }
    }
  }
}

/** Offset = count of lines ever visible across the ordered segment files
  * (monotonic by the immutability contract). */
private[graft] case class LineOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[graft] class LineMicroBatchStream(path: String,
    maxLinesPerTrigger: Option[Long] = None)
  extends MicroBatchStream with SupportsAdmissionControl {

  /** Driver-side (fileName -> lineCount) memo for SEALED segments. A
    * segment is sealed once a later-sorting file exists (the log-segment
    * lifecycle: new files sort after existing ones, so only the newest
    * can still be mid-write). Sealed segments are counted ONCE ever; the
    * ACTIVE (last) segment is recounted each trigger, so a file observed
    * mid-write self-heals on the next trigger instead of having a partial
    * count memoized forever. Per-trigger driver cost stays proportional
    * to new data + one active segment (the Kafka consumer likewise gets
    * end offsets from the broker, not by re-reading the log). */
  private val countMemo = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def countLines(f: java.io.File): Long = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().size.toLong finally src.close()
  }

  /** Ordered (file, lineCount) snapshot of the log. */
  private def segments(): Seq[(java.io.File, Long)] = {
    val files = graft.core.Fs.listOrEmpty(new java.io.File(path))
      .filter(_.isFile).sortBy(_.getName).toSeq
    files.zipWithIndex.map { case (f, i) =>
      if (i < files.length - 1)
        f -> countMemo.computeIfAbsent(f.getName, _ => countLines(f))
      else f -> countLines(f) // active segment: never memoized
    }
  }

  override def initialOffset(): Offset = LineOffset(0L)
  override def latestOffset(): Offset = LineOffset(segments().map(_._2).sum)
  override def deserializeOffset(json: String): Offset = LineOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // ---- SupportsAdmissionControl: runtime backpressure (reference R5).
  // When the source declares a read limit, the engine calls THIS
  // latestOffset instead of the parameterless one, and the batch end is
  // clamped to start + maxRows — Spark 4's maxOffsetsPerTrigger contract.
  override def getDefaultReadLimit: ReadLimit =
    maxLinesPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val available = segments().map(_._2).sum
    val lo = start.asInstanceOf[LineOffset].n
    limit match {
      case r: ReadMaxRows => LineOffset(math.min(available, lo + r.maxRows()))
      case _ => LineOffset(available)
    }
  }

  /** True head of the log for progress metrics, independent of the cap. */
  override def reportLatestOffset(): Offset = LineOffset(segments().map(_._2).sum)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LineOffset].n
    val hi = end.asInstanceOf[LineOffset].n
    val slices = Seq.newBuilder[InputPartition]
    var base = 0L
    segments().foreach { case (f, count) =>
      // intersect this file's global range [base, base+count) with [lo, hi)
      val from = math.max(lo, base)
      val until = math.min(hi, base + count)
      if (from < until)
        slices += LineSlice(f.getPath, from - base, until - base)
      base += count
    }
    slices.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val s = partition.asInstanceOf[LineSlice]
        new PartitionReader[InternalRow] {
          private val src = scala.io.Source.fromFile(s.path, "UTF-8")
          // Long-safe positioning (Iterator.slice takes Int and would
          // silently wrap past 2^31 lines): skip with a Long counter,
          // then emit exactly endLine - startLine lines.
          private val it = {
            val raw = src.getLines()
            var skipped = 0L
            while (skipped < s.startLine && raw.hasNext) { raw.next(); skipped += 1 }
            raw
          }
          private var remaining = s.endLine - s.startLine
          private var current: String = _
          override def next(): Boolean =
            if (remaining > 0 && it.hasNext) { current = it.next(); remaining -= 1; true }
            else false
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(current))
          override def close(): Unit = src.close()
        }
      }
    }
}

/** One micro-batch slice: lines [startLine, endLine) of one segment file. */
private[graft] case class LineSlice(path: String, startLine: Long, endLine: Long)
  extends InputPartition
