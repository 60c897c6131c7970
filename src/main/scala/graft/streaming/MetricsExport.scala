package graft.streaming

import org.apache.spark.sql.SparkSession

/** Metrics export — the reference deployment scaffolds a Graphite +
  * Grafana stack next to the pipeline (unimib-simpss
  * docker-compose.yml:74-100) but ships no emitting code; this closes
  * the parity gap at the same evidence level as the Kafka wiring:
  * everything OURS (line formatting, name sanitization, the durable
  * offline sink) is a pure spec-locked function; only the TCP write to
  * a live Graphite daemon is beyond the offline sandbox.
  *
  * Two faces over one snapshot shape (the counter map
  * [[graft.streaming.SensorStream.CountingListener]] accumulates):
  *
  *   - [[graphiteLines]] + [[pushGraphite]] — Graphite's plaintext
  *     protocol, `metric.path value timestamp\n` per line, for
  *     connected deployments;
  *   - [[appendSnapshot]] — a parquet metrics store for everywhere
  *     else (and the shape a dashboard can read back without any
  *     external system).
  */
object MetricsExport {

  /** Graphite metric-path segment from an arbitrary query name: the
    * plaintext protocol delimits on spaces and newlines and dots are
    * path separators, so everything outside [A-Za-z0-9_-] folds to
    * '_'. Pure — spec-locked, including the injection cases (a name
    * carrying a space would otherwise smuggle a fake value field). */
  def sanitize(segment: String): String = {
    require(segment.nonEmpty, "metrics: empty name segment")
    segment.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_' || c == '-') c else '_')
  }

  /** One plaintext line per counter: `<prefix>.<name> <value> <epoch>`.
    * Deterministically sorted by name so a snapshot is reproducible. */
  def graphiteLines(prefix: String, counters: Map[String, Long],
                    epochSec: Long): Seq[String] = {
    require(epochSec >= 0, s"metrics: epochSec=$epochSec")
    // the prefix is a dotted HIERARCHY — sanitize per segment, keep dots
    val p = prefix.split('.').map(sanitize).mkString(".")
    counters.toSeq.sortBy(_._1).map { case (name, v) =>
      s"$p.${sanitize(name)} $v $epochSec"
    }
  }

  /** Push one snapshot to a Graphite daemon over its plaintext TCP
    * port. NOTE: requires a reachable daemon — none exists in this
    * offline sandbox, so this path is exercised only in connected
    * deployments; the payload it writes is exactly
    * [[graphiteLines]]' spec-locked text. */
  def pushGraphite(host: String, port: Int, lines: Seq[String]): Unit = {
    val socket = new java.net.Socket(host, port)
    try {
      val out = socket.getOutputStream
      out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      out.flush()
    } finally socket.close()
  }

  /** Durable offline sink: append one counter snapshot to a parquet
    * metrics store — (epoch_sec, name, value) rows, one small file per
    * snapshot, readable as a plain time series. The counter map is
    * driver-resident (|queries| entries), so this is a driver-local
    * append, never a corpus job. */
  def appendSnapshot(spark: SparkSession, counters: Map[String, Long],
                     path: String, epochSec: Long): Unit = {
    import spark.implicits._
    counters.toSeq.sortBy(_._1)
      .map { case (name, v) => (epochSec, name, v) }
      .toDF("epoch_sec", "name", "value")
      .coalesce(1)
      .write.mode("append").parquet(path)
  }

  /** Snapshot a [[graft.streaming.SensorStream.CountingListener]]'s
    * accumulated per-query row counts as an immutable Map. */
  def snapshot(listener: graft.streaming.SensorStream.CountingListener)
      : Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    listener.rowsByQuery.asScala.toMap
  }
}
