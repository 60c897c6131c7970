package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Determinism.dsum
import graft.core.Tables

/** Gap-based sessionization of an event stream (batch form): events of
  * one user separated by more than `gap` fall into distinct sessions —
  * the standard clickstream/behavioral-analytics operator (the streaming
  * faces live in [[graft.streaming.StreamingOps]]: built-in
  * `session_window` and the arbitrary-state `sensorSessions`; the spec
  * proves this batch form and `session_window` agree on the same input).
  *
  * Scale shape: one shuffle on the user key, then two windows over the
  * SAME (user, time) ordering — Catalyst plans them into a single sort,
  * no second exchange. Sessions never span users, so a 100 TB clickstream
  * parallelizes by user; per-user event counts are the only skew axis
  * (bounded in practice — one user's history fits a partition by
  * construction of the key space).
  */
object Sessionize {

  /** Per-event session index (1-based, per user): an event starts a new
    * session when it is the user's first or arrives more than `gapUs`
    * microseconds after the previous event. Ties on `ts` are ordered by
    * `eventId` so the running sum is deterministic. */
  def sessionIndex(user: Column, ts: Column, eventId: Column, gapUs: Long): Column = {
    val order = Window.partitionBy(user).orderBy(ts, eventId)
    val prev = lag(unix_micros(ts), 1).over(order)
    val newSession = when(prev.isNull || unix_micros(ts) - prev > gapUs, 1L)
      .otherwise(0L)
    sum(newSession).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** Session rollup: one row per (user, session) with event count, span,
    * and exact (decimal-summed, order-independent) value total. */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame =
    events
      .withColumn("session_idx",
        sessionIndex(col("user_id"), col("ts"), col("event_id"), gapUs))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        dsum(col("value")).as("sum_value"))

  /** x24: 12-hour-gap sessions over the events table. (The corpus is
    * sparse — ~3 events per session at this gap; a clickstream would use
    * minutes.) */
  val DefaultGapUs: Long = 12L * 3600 * 1000000

  def sessionQuery(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events"), DefaultGapUs)
      .orderBy(col("user_id"), col("session_idx"))
}
