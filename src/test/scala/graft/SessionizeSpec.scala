package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sessionize

/** Semantic coverage for batch gap sessionization (x24's operator):
  * boundary rule, per-user isolation, determinism, and agreement with
  * Spark's built-in session_window on the real events table. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, Double)*) =
    rows.toSeq.map { case (eid, uid, sec, v) =>
      (eid, uid, new Timestamp(sec * 1000), v)
    }.toDF("event_id", "user_id", "ts", "value")

  test("gap rule: diff > gap starts a session, diff == gap does not; users isolated") {
    val gapUs = 60L * 1000000 // 1 minute
    val d = ev(
      (1L, 1L, 0L, 1.0),
      (2L, 1L, 60L, 2.0),   // exactly the gap → same session
      (3L, 1L, 121L, 3.0),  // 61s → new session
      (4L, 2L, 0L, 4.0))    // other user → own session
    val out = Sessionize.sessionize(d, gapUs)
      .orderBy($"user_id", $"session_idx")
      .select($"user_id", $"session_idx", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 4.0)))
  }

  test("session bounds are the min/max event times of the session") {
    val d = ev((1L, 1L, 100L, 0.0), (2L, 1L, 130L, 0.0), (3L, 1L, 500L, 0.0))
    val out = Sessionize.sessionize(d, 60L * 1000000)
      .orderBy($"session_idx")
      .select($"session_start", $"session_end").collect()
    assert(out(0).getTimestamp(0) == new Timestamp(100000L))
    assert(out(0).getTimestamp(1) == new Timestamp(130000L))
    assert(out(1).getTimestamp(0) == new Timestamp(500000L))
  }

  test("sessionization is stable under repartitioning") {
    val events = Tables.load(spark, sf("sf0.001"), "events")
    val a = Sessionize.sessionQuery(spark, sf("sf0.001")).collect().toSeq
    val b = Sessionize.sessionize(events.repartition(11), Sessionize.DefaultGapUs)
      .orderBy($"user_id", $"session_idx").collect().toSeq
    assert(a == b)
  }

  test("agrees with built-in session_window on the events table") {
    // session_window merges on diff < gap where the lag rule uses
    // diff <= gap; no pair of one user's events in this corpus is at the
    // exact microsecond gap (measure-zero), so the two faces must emit
    // the identical session set
    val events = Tables.load(spark, sf("sf0.001"), "events")
    val viaLag = Sessionize.sessionize(events, Sessionize.DefaultGapUs)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .orderBy($"user_id", $"session_start")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
    val viaWindow = events
      .groupBy(session_window($"ts", "12 hours"), $"user_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .orderBy($"user_id", $"session_start")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
    assert(viaLag == viaWindow,
      "lag/cumsum sessions disagree with session_window sessions")
  }

  test("plan: the two windows share one sort — a single exchange on the user key") {
    val events = Tables.load(spark, sf("sf0.001"), "events")
    val df = Sessionize.sessionize(events, Sessionize.DefaultGapUs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one shuffle for the user-key windows + one for the final groupBy
    // on (user_id, session_idx)... which Catalyst also satisfies from the
    // same partitioning, so at most the window exchange plus the
    // aggregate's — but never a THIRD for the second window
    assert(exchanges <= 2, s"window pair re-shuffled:\n$plan")
    assert("Sort ".r.findAllIn(plan).size <= 2, s"window pair re-sorted:\n$plan")
  }
}
