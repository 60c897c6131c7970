package graft.streaming

import org.apache.spark.sql.DataFrame

/** Dynamic per-row topic routing — the streaming write side of the
  * reference's Kafka fan-out, where each record's destination topic is a
  * COLUMN VALUE, not a static sink config (mqtt_kafka_producer.py:117
  * publishes to `topic := sensor_group`; R9/R10 in SURVEY.md §2.A). The
  * offline mapping is one directory per topic under a root — the same
  * layout `batch.write.partitionBy(topicCol)` produces, built
  * incrementally and exactly-once by a `foreachBatch` sink.
  *
  * Exactly-once under checkpoint replay: every published file name is
  * prefixed `batch<id>-`, and publishing a batch first deletes any files
  * of the SAME batch id already in the destination topic dirs (a crashed
  * or replayed previous attempt), then moves the staged files in. A
  * micro-batch is deterministic from its checkpointed source offsets, so
  * replay converges per topic — no loss (the delete only ever removes
  * this batch's own partial output) and no duplication (re-published
  * files replace, never accumulate). The stage itself is ONE distributed
  * partitioned write; publish is driver-side renames only, same
  * discipline as [[SensorStream.upsertBatch]].
  *
  * Scale shape: the one shuffle-free job writes only the topics present
  * in the batch; cost per batch is O(batch), independent of how many
  * topics already exist under the root. A connected deployment swaps
  * this sink for the Kafka writer ([[graft.sources.SensorSources]]
  * `toKafkaWriter`, `topic` column) behind the same transform.
  */
object TopicRouter {

  /** foreachBatch body: route `batch` into `<outDir>/<topicCol>=<v>/`
    * dirs, exactly-once per (topic, batchId). Null topics fail fast —
    * Kafka rejects a null topic, and silently filing rows under the
    * Hive default partition would un-route them. */
  def routeToTopicDirs(outDir: String, topicCol: String = "topic")
                      (batch: DataFrame, batchId: Long): Unit = {
    // parent + name, not string concat: a trailing slash on outDir would
    // otherwise place staging INSIDE the output root, where the sweep
    // below (which scans the parent) could never reclaim it
    val root = new java.io.File(outDir).getAbsoluteFile
    val staging = new java.io.File(root.getParentFile, root.getName + s"._staging_$batchId")

    // stale staging from other (crashed, renumbered-checkpoint) batch
    // ids — this query is the single writer of the root, so anything
    // not this batch's own is dead weight
    val stagingPrefix = root.getName + "._staging_"
    graft.core.Fs.listOrEmpty(root.getParentFile)
      .filter(f => f.getName.startsWith(stagingPrefix) && f.getName != staging.getName)
      .foreach(graft.core.Fs.deleteRecursively)

    graft.core.Fs.deleteRecursively(staging)
    batch.write.mode("overwrite").partitionBy(topicCol).parquet(staging.getPath)

    val staged = graft.core.Fs.listOrEmpty(staging)
      .filter(f => f.isDirectory && f.getName.startsWith(topicCol + "="))
    if (staged.exists(_.getName == topicCol + "=__HIVE_DEFAULT_PARTITION__")) {
      graft.core.Fs.deleteRecursively(staging)
      throw new IllegalArgumentException(
        s"routeToTopicDirs: null $topicCol in batch $batchId — filter or enrich upstream")
    }
    root.mkdirs()
    staged.sortBy(_.getName).foreach { td =>
      val dest = new java.io.File(root, td.getName)
      dest.mkdirs()
      // replay idempotence: drop THIS batch's previous (possibly partial)
      // publication before re-publishing. The trailing '-' keeps batch1
      // from matching batch10.
      graft.core.Fs.listOrEmpty(dest)
        .filter(_.getName.startsWith(s"batch$batchId-"))
        .foreach(f => graft.core.Fs.deleteRecursively(f))
      val files = graft.core.Fs.listOrThrow(td)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
      files.zipWithIndex.foreach { case (f, i) =>
        val out = new java.io.File(dest, s"batch$batchId-$i.parquet")
        if (!f.renameTo(out))
          throw new java.io.IOException(s"topic publish: cannot move $f to $out")
      }
    }
    graft.core.Fs.deleteRecursively(staging)
  }
}
