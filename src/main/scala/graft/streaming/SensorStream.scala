package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.SensorPipeline

/** Structured Streaming face of the SIMPSS pipeline (SURVEY.md §7.1 step 4).
  *
  * The batch stages (parseStrict → enrich → renameToStorage) are reused
  * verbatim on the streaming DataFrame — they are all narrow or
  * stream-static-broadcast operations, so the incremental planner accepts
  * them unchanged. The PK upsert (Cassandra's INSERT semantics in the
  * reference, cassandra_storage.py:88) becomes an idempotent foreachBatch
  * merge: batch-local last-write-wins, then last-write-wins against the
  * store. Re-running a batch (checkpoint replay) converges to the same
  * store state, giving end-to-end exactly-once — strictly stronger than
  * the reference's auto-commit at-least-once (SURVEY.md §4.3).
  */
object SensorStream {

  /** Wire transform shared by every sensor source: JSON lines → clean,
    * enriched, storage-named records (dead letters dropped). */
  def transform(lines: DataFrame, dim: DataFrame): DataFrame = {
    val (clean, _) = SensorPipeline.quarantine(SensorPipeline.parseStrict(lines))
    SensorPipeline.renameToStorage(SensorPipeline.enrich(clean, dim, failFast = false))
  }

  /** Idempotent keyed upsert into a parquet store, for use with
    * `writeStream.foreachBatch`. In a connected deployment this is the
    * Cassandra/Delta MERGE; offline it is read-merge-overwrite, which is
    * correct for the single-writer streaming query that owns the store. */
  def upsertBatch(spark: SparkSession, storePath: String)(batch: DataFrame, batchId: Long): Unit = {
    // crash recovery: a previous invocation may have died between the two
    // swap renames, leaving the store only under ._old — restore it
    // BEFORE reading, so no history is lost and no backup is clobbered.
    locally {
      val target = new java.io.File(storePath)
      val orphan = new java.io.File(storePath + "._old")
      if (!target.exists() && orphan.exists() && !orphan.renameTo(target))
        throw new java.io.IOException(s"upsertBatch: cannot restore $orphan")
    }
    val incoming = SensorPipeline.dedupLastWins(batch)
    val merged =
      if (new java.io.File(storePath).exists()) {
        val store = spark.read.parquet(storePath)
        // Store rows carry no seq anymore; incoming batch wins ties by
        // construction (later arrival). Tag and max_by on the tag.
        val tagged = store.withColumn("_w", lit(0L))
          .unionByName(incoming.withColumn("_w", lit(1L)))
        SensorPipeline.dedupLastWins(tagged, SensorPipeline.pkCols, "_w")
      } else incoming
    // Swap via backup rename rather than delete-then-rename: the previous
    // store stays on disk (as ._old) until the new one is in place, and
    // the recovery preamble above restores it if a crash lands between
    // the renames — the store is always recoverable from either target
    // or ._old. (A connected deployment uses a transactional table
    // format; this is the honest offline equivalent.)
    val tmp = new java.io.File(storePath + s"._staging_$batchId")
    merged.write.mode("overwrite").parquet(tmp.getPath)
    val target = new java.io.File(storePath)
    val backup = new java.io.File(storePath + "._old")
    graft.core.Fs.deleteRecursively(backup)
    if (target.exists() && !target.renameTo(backup))
      throw new java.io.IOException(s"upsertBatch: cannot move $target aside")
    if (!tmp.renameTo(target)) {
      backup.renameTo(target) // roll back
      throw new java.io.IOException(s"upsertBatch: cannot publish $tmp to $target")
    }
    graft.core.Fs.deleteRecursively(backup)
  }

  /** Pub/sub fan-out (reference R14: one consumed message → every
    * registered subscriber): one foreachBatch delivering the SAME batch
    * to N sinks. The batch is cached so each subscriber reads it once. */
  def fanOutBatch(sinks: Seq[(DataFrame, Long) => Unit])(batch: DataFrame, batchId: Long): Unit = {
    batch.persist()
    try sinks.foreach(s => s(batch, batchId))
    finally batch.unpersist()
  }

  /** Metrics counters (reference R22 — the vestigial messages_read/sent
    * counters, done properly): a StreamingQueryListener accumulating
    * rows processed per query. */
  class CountingListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val rowsByQuery = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      rowsByQuery.merge(e.progress.name, e.progress.numInputRows, _ + _)
  }

  /** Tumbling-window aggregate over the sensor stream (batch-equivalent
    * form is Relational.q19 over events; this one keys on time_received). */
  def tumblingStats(records: DataFrame, width: String): DataFrame =
    records
      .groupBy(window(col("time_received"), width), col("sensor_group"))
      .agg(count(lit(1)).as("n"), avg(col("temperature")).as("avg_temp"))
      .select(col("window.start").as("window_start"), col("sensor_group"),
        col("n"), col("avg_temp"))
}
