package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TTLConfig}

/** Event-time streaming operators over the sensor stream (SURVEY.md §2.B
  * streaming rows): watermarks, tumbling/sliding/session windows,
  * watermarked dedup, stream-stream joins, and arbitrary state
  * (flatMapGroupsWithState sessionization). All are standard Structured
  * Streaming constructs — state lives in the engine's state store,
  * checkpointed, and scales horizontally by group key.
  */
object StreamingOps {

  /** Watermarked tumbling counts (append mode capable): late rows beyond
    * `delay` are dropped by the engine. */
  def tumblingWithWatermark(records: DataFrame, width: String, delay: String): DataFrame =
    records
      .withWatermark("time_received", delay)
      .groupBy(window(col("time_received"), width), col("sensor_group"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("sensor_group"), col("n"))

  /** Sliding window stats. */
  def slidingStats(records: DataFrame, width: String, slide: String): DataFrame =
    records
      .groupBy(window(col("time_received"), width, slide), col("sensor_group"))
      .agg(count(lit(1)).as("n"), avg(col("temperature")).as("avg_temp"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("sensor_group"), col("n"), col("avg_temp"))

  /** Session windows (gap-based); works identically in batch and
    * streaming, which the spec exploits for equivalence. */
  def sessionStats(records: DataFrame, gap: String): DataFrame =
    records
      .groupBy(session_window(col("time_received"), gap), col("sensor_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("sensor_id"), col("n"))

  /** Streaming keyed dedup with bounded state: duplicates arriving within
    * the watermark horizon are dropped, state older than the horizon is
    * evicted (the streaming face of the PK upsert semantics). */
  def dedupWithinWatermark(records: DataFrame, delay: String): DataFrame =
    records
      .withWatermark("time_received", delay)
      .dropDuplicatesWithinWatermark("sensor_group", "sensor_id", "time_received")

  /** Watermarked stream-stream inner join: pairs each sensor reading with
    * group-mates within ±tolerance (interval join). Both sides bounded by
    * watermarks so join state is evictable. */
  def selfJoinWithinTolerance(records: DataFrame, delay: String,
                              toleranceSeconds: Int): DataFrame = {
    val a = records.select(col("sensor_group"), col("sensor_id").as("id_a"),
      col("time_received").as("t_a")).withWatermark("t_a", delay)
    val b = records.select(col("sensor_group").as("g_b"), col("sensor_id").as("id_b"),
      col("time_received").as("t_b")).withWatermark("t_b", delay)
    a.join(b,
      col("sensor_group") === col("g_b") &&
        col("id_a") < col("id_b") &&
        col("t_b") >= col("t_a") - expr(s"INTERVAL $toleranceSeconds SECONDS") &&
        col("t_b") <= col("t_a") + expr(s"INTERVAL $toleranceSeconds SECONDS"))
      .select(col("sensor_group"), col("id_a"), col("id_b"), col("t_a"), col("t_b"))
  }

  // ------------------------------------------- arbitrary state (FMGWS) --

  case class SensorEvent(sensor_id: Int, time_received: java.sql.Timestamp, temperature: Int)
  case class SessionAgg(sensor_id: Int, start: java.sql.Timestamp, end: java.sql.Timestamp,
                        n: Int, max_temp: Int)
  case class SessionState(start: Long, end: Long, n: Int, maxTemp: Int)

  // -------------------------------------- transformWithState (Spark 4) --

  case class TempAnomaly(sensor_id: Int, time_received: java.sql.Timestamp,
                         temperature: Int, prev_avg: Double)

  /** Spark 4 transformWithState: per-sensor running mean/count in typed
    * ValueState (RocksDB-backed store required); emits readings that
    * deviate from the sensor's running average by more than `delta`.
    * The arbitrary-state successor API to mapGroupsWithState. */
  class AnomalyProcessor(delta: Double)
    extends StatefulProcessor[Int, SensorEvent, TempAnomaly] {
    @transient private var stats: org.apache.spark.sql.streaming.ValueState[(Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Double, Long)]("stats",
        org.apache.spark.sql.Encoders.product[(Double, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[SensorEvent],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[TempAnomaly] = {
      val out = scala.collection.mutable.ListBuffer.empty[TempAnomaly]
      var (sum, n) = if (stats.exists()) stats.get() else (0.0, 0L)
      rows.toSeq.sortBy(_.time_received.getTime).foreach { e =>
        if (n > 0) {
          val avg = sum / n
          if (math.abs(e.temperature - avg) > delta)
            out += TempAnomaly(key, e.time_received, e.temperature, avg)
        }
        sum += e.temperature; n += 1
      }
      stats.update((sum, n))
      out.iterator
    }
  }

  /** Anomaly stream via transformWithState. */
  def temperatureAnomalies(events: Dataset[SensorEvent], delta: Double): Dataset[TempAnomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.sensor_id)
      .transformWithState(new AnomalyProcessor(delta),
        TimeMode.None(), OutputMode.Append())
  }

  // ------------------------- streaming MinHash near-dup (x02's face) --

  /** One (doc, LSH bucket) assignment: the doc's shingle set rides along
    * so candidate pairs verify with exact Jaccard at emission time. */
  case class BucketRow(doc_id: Long, sh: Seq[String], band: Int, bsig: Long)
  /** Verified near-dup pair — same shape as the batch minhashLshPairs. */
  case class NearDupPair(d1: Long, d2: Long, inter: Int, uni: Int)
  private case class BucketEntry(doc_id: Long, sh: Seq[String])

  /** Incremental MinHash bucket index: per-(band, bsig) ListState of the
    * docs seen in that bucket. A new arrival pairs against every earlier
    * member, verifies with exact Jaccard over the carried shingle sets,
    * and is appended — so each qualifying pair is emitted exactly when
    * its later endpoint arrives, never recomputed. State grows with the
    * corpus (it IS the index); production bounds it with a TTL on the
    * state handle when the dedup horizon is finite. */
  class MinhashBucketProcessor(threshold: Double)
    extends StatefulProcessor[(Int, Long), BucketRow, NearDupPair] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[BucketEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[BucketEntry]("members",
        org.apache.spark.sql.Encoders.product[BucketEntry], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[BucketRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[NearDupPair] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[BucketEntry]
      members.get().foreach(seen += _)
      // ids alongside the list: the replay guard is then O(1) per doc
      // instead of a list scan (quadratic in a degenerate hot bucket)
      val seenIds = scala.collection.mutable.HashSet.empty[Long]
      seen.foreach(seenIds += _.doc_id)
      val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
      val appended = scala.collection.mutable.ArrayBuffer.empty[BucketEntry]
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        // replay/duplicate guard: a doc already indexed in this bucket
        // must not pair against itself or re-emit its pairs
        if (!seenIds.contains(r.doc_id)) {
          val shSet = r.sh.toSet
          seen.foreach { e =>
            val inter = e.sh.count(shSet) // e.sh is distinct by construction
            val uni = shSet.size + e.sh.size - inter
            // integer-exact threshold test, same as the batch operator
            if (inter.toDouble >= threshold * uni.toDouble)
              out += NearDupPair(math.min(r.doc_id, e.doc_id),
                math.max(r.doc_id, e.doc_id), inter, uni)
          }
          val entry = BucketEntry(r.doc_id, r.sh)
          seen += entry
          seenIds += r.doc_id
          appended += entry
        }
      }
      if (appended.nonEmpty) members.appendList(appended.toArray)
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Dedup.minhashLshPairs]]: the
    * same native signature kernel and banding expressions run under the
    * incremental planner; candidates come from per-bucket state instead
    * of a self-join. A replayed corpus emits exactly the batch pair set
    * (spec-asserted). The trailing pair-level dropDuplicates collapses
    * multi-band hits; it keeps one (d1, d2) per pair ever seen —
    * unbounded by design here, watermark-bounded in a TTL deployment. */
  def minhashNearDupStream(docs: DataFrame, n: Int = 3, bands: Int = 16,
                           rowsPerBand: Int = 4,
                           jaccardThreshold: Double = 0.5): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    import graft.operators.Dedup
    val withShingles = docs
      .select(col("doc_id"), Dedup.wordShingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val buckets = withShingles
      .select(col("doc_id"), col("sh"),
        explode(graft.functions.VectorFunctions.bindArray(
          Dedup.minhashSignature(col("sh"), bands * rowsPerBand))(
          sig => Dedup.lshBands(sig, bands, rowsPerBand))).as("bk"))
      .select(col("doc_id"), col("sh"),
        col("bk.band").cast("int").as("band"), col("bk.bsig").as("bsig"))
      .as[BucketRow]
    buckets.groupByKey(r => (r.band, r.bsig))
      .transformWithState(new MinhashBucketProcessor(jaccardThreshold),
        TimeMode.None(), OutputMode.Append())
      .dropDuplicates("d1", "d2")
      .as[NearDupPair]
  }

  // ------------------------- streaming decontamination (x16's face) --

  /** Streaming face of [[graft.operators.Dedup.decontaminate]]: score
    * each arriving training-candidate document against a STATIC held-out
    * reference corpus, via the stream-static equi-join + one streaming
    * aggregate keyed on doc_id. Same output schema and values as the
    * batch operator on replay (spec-asserted): `(doc_id, n_spans,
    * n_hit_spans)`, n_hit_spans counting POSITIONAL gram occurrences,
    * duplicates included. The gram key and span count come from the SAME
    * [[graft.operators.Dedup]] helpers the batch face uses, so the two
    * faces cannot drift.
    *
    * The static side is persist()ed here: Spark re-executes a
    * stream-static join's static sub-plan EVERY micro-batch, so without
    * the cache the reference corpus would be re-read, re-exploded, and
    * re-deduped per trigger. The cache lives as long as the query plan
    * references it and is reclaimed by the context cleaner afterwards;
    * the broadcast build itself still runs per batch (that is the
    * stream-static contract), but over the cached distinct grams.
    *
    * Run in UPDATE output mode. A document's grams all travel in the one
    * micro-batch that carries the document row, so each doc_id emits its
    * final counts exactly once, in its arrival batch. Aggregation state
    * grows with distinct doc_ids (it is the corpus scorecard); a finite
    * dedup horizon bounds it the usual way — add an event-time column +
    * watermark upstream, exactly as the other stateful ops here. */
  def decontaminateStream(docs: DataFrame, reference: DataFrame,
                          k: Int = 4, hashGrams: Boolean = false): DataFrame = {
    import graft.operators.Dedup
    val refGrams = Dedup.referenceGrams(reference, k, hashGrams)
      .withColumn("_hit", lit(1L))
      .persist()
    // explode_outer keeps zero-gram docs (shorter than k tokens) in the
    // report with n_hit_spans 0, matching the batch operator's left join
    val exploded = docs.select(
        col("doc_id"),
        Dedup.nSpansExpr(col("text"), k).as("n_spans"),
        explode_outer(Dedup.wordShinglesAll(col("text"), k)).as("g"))
      .select(col("doc_id"), col("n_spans"), Dedup.gramKey(col("g"), hashGrams).as("gram"))
    exploded
      // refGrams is distinct → the left join marks, never fans out
      .join(broadcast(refGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"), col("n_spans"))
      .agg(coalesce(sum(col("_hit")), lit(0L)).as("n_hit_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_hit_spans"))
  }

  /** Streaming z-score anomaly gate: scores live rows against a FROZEN
    * per-group moments baseline ([[graft.operators.Analytics.momentsOf]]
    * over a reference corpus, persisted as a KB-scale artifact) via a
    * stream-static broadcast join — the stream side never shuffles and
    * carries no state, so the gate adds no backpressure at any scale.
    * Matches batch [[graft.operators.Analytics.flagOutliers]] on replay
    * with the same moments (spec-proven), the same discipline as the
    * decontamination and minhash streaming twins.
    *
    * `flagUnseen` defaults ON here (unlike the batch face): a frozen
    * baseline will eventually meet groups it has never seen, and for a
    * live gate those rows are anomalies (emitted with null z), not rows
    * to silently drop. */
  def anomalyStream(stream: DataFrame, moments: DataFrame, groupCol: String,
                    valueCol: String, k: Double,
                    flagUnseen: Boolean = true): DataFrame =
    graft.operators.Analytics.flagOutliers(stream, moments, groupCol, valueCol, k,
      flagUnseen)

  // -------------------- streaming funnel / retention (x34/x35 faces) --

  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long, event_id: Long)
  /** One user's first qualifying arrival at a funnel stage — emitted
    * exactly once per (user, stage); `COUNT(1) GROUP BY stage` over this
    * stream IS the batch funnel's (stage, n_users) table. */
  case class StageAdvance(user_id: Long, stage: String, ts_us: Long)
  private case class FunnelTimes(times: Seq[Long])

  /** Per-user funnel progress in ValueState: `times(i)` is the micros of
    * the user's first qualifying stage-i event. An event advances the
    * funnel iff it is the NEXT stage, strictly after the previous stage's
    * time, and within the window — the same rule the batch sequential
    * joins apply. In-order contract: within a batch rows sort by
    * (ts, event_id); across micro-batches per-user event-time order is
    * assumed (same contract as every first-arrival stream here) — the
    * replay spec feeds batches in event order. */
  class FunnelProcessor(stages: Seq[String], windowUs: Long)
    extends StatefulProcessor[Long, FunnelEvent, StageAdvance] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[FunnelTimes] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelTimes]("times",
        org.apache.spark.sql.Encoders.product[FunnelTimes], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[StageAdvance] = {
      var times = if (st.exists()) st.get().times.toVector else Vector.empty[Long]
      val out = scala.collection.mutable.ListBuffer.empty[StageAdvance]
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val i = stages.indexOf(e.event_type)
        if (i == 0 && times.isEmpty) {
          times = Vector(e.ts_us)
          out += StageAdvance(key, graft.operators.Analytics.stageLabel(0, e.event_type), e.ts_us)
        } else if (i > 0 && i == times.length &&
            e.ts_us > times(i - 1) && e.ts_us - times(i - 1) <= windowUs) {
          times = times :+ e.ts_us
          out += StageAdvance(key, graft.operators.Analytics.stageLabel(i, e.event_type), e.ts_us)
        }
        // i < 0 (type outside the funnel), an already-reached stage, or a
        // stage ahead of the user's progress: no effect — in event order
        // a stage-(k+1) event before stage k's time can never qualify.
      }
      st.update(FunnelTimes(times))
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Analytics.funnel]] (x34): emits
    * a [[StageAdvance]] the moment a user first completes each stage.
    * Counting advances per stage label reproduces the batch (stage,
    * n_users) table on in-order replay (spec-asserted). State per user is
    * one Seq of at most |stages| longs — bounded, keyed, horizontally
    * scalable; a TTL bounds it further when the funnel window is finite. */
  def funnelStream(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String, stages: Seq[String],
                   windowUs: Long): Dataset[StageAdvance] = {
    require(stages.nonEmpty, "funnelStream: at least one stage")
    require(windowUs > 0, s"funnelStream: windowUs=$windowUs")
    import events.sparkSession.implicits._
    events.select(col(userCol).cast("long").as("user_id"),
        col(typeCol).as("event_type"), unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).cast("long").as("event_id"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(stages, windowUs),
        TimeMode.None(), OutputMode.Append())
  }

  /** One user-week activity cell: the user's cohort week plus the offset
    * (in weeks) of an active week. Distinct cells counted per
    * (cohort_week, week_k) reproduce the batch retention table. */
  case class WeekActivity(user_id: Long, cohort_week: java.sql.Date, week_k: Int)
  case class WeekEvent(user_id: Long, week_day: Int)

  /** Per-user cohort anchor in ValueState (the epoch-day of the
    * Monday-truncated week of the user's FIRST event, in-order contract
    * as [[FunnelProcessor]]) plus a per-user MapState of already-emitted
    * week offsets. The processor emits each (cohort, week_k) cell
    * EXACTLY ONCE itself, so no downstream dedup operator is needed —
    * dedup state lives with the user key, bounded by the number of
    * distinct active weeks per user (≤ corpus span in weeks), instead of
    * an unbounded global dropDuplicates store (ADVICE r6 item 3).
    *
    * The anchor is FIXED once written: both sides are Monday epoch-days
    * so week differences are exact multiples of 7 (no truncation), and a
    * cross-batch straggler OLDER than the anchor — an in-order-contract
    * violation — surfaces as a visibly impossible negative week_k
    * (floorDiv) rather than silently re-anchoring and corrupting every
    * previously emitted offset. */
  class RetentionProcessor
    extends StatefulProcessor[Long, WeekEvent, WeekActivity] {
    @transient private var cohort: org.apache.spark.sql.streaming.ValueState[Int] = _
    @transient private var emitted: org.apache.spark.sql.streaming.MapState[Int, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cohort = getHandle.getValueState[Int]("cohort",
        org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)
      emitted = getHandle.getMapState[Int, Boolean]("emittedWeeks",
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[WeekEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[WeekActivity] = {
      val sorted = rows.toSeq.sortBy(_.week_day)
      if (sorted.isEmpty) return Iterator.empty
      val c = if (cohort.exists()) cohort.get() else {
        // sorted ⇒ head is this batch's min, so a first-batch straggler
        // can never undercut the anchor we just wrote
        val first = sorted.head.week_day
        cohort.update(first)
        first
      }
      val cohortDate = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(c.toLong))
      sorted.iterator.flatMap { e =>
        val k = Math.floorDiv(e.week_day - c, 7)
        if (emitted.containsKey(k)) None
        else {
          emitted.updateValue(k, true)
          Some(WeekActivity(key, cohortDate, k))
        }
      }
    }
  }

  /** Streaming face of [[graft.operators.Analytics.weeklyRetention]]
    * (x35): each event maps to its user's (cohort_week, week_k) cell,
    * emitted exactly once by [[RetentionProcessor]]'s keyed state, so
    * `COUNT(1) GROUP BY cohort_week, week_k` downstream equals the batch
    * table on in-order replay (spec-asserted). Week truncation runs in
    * the Spark plan (`date_trunc('week', ts)` — Monday-based, session
    * UTC), not re-derived in JVM date code, so the two faces share one
    * calendar. */
  def retentionStream(events: DataFrame, userCol: String, tsCol: String): Dataset[WeekActivity] = {
    import events.sparkSession.implicits._
    events.select(col(userCol).cast("long").as("user_id"),
        unix_date(date_trunc("week", col(tsCol)).cast("date")).as("week_day"))
      .as[WeekEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RetentionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  // ---------------------- streaming moving average (x32's face) ------

  case class MavgEvent(event_id: Long, user_id: Long, ts_us: Long, value: Double)
  /** One event's trailing-window average — the streaming image of an
    * x32 output row. */
  case class MavgPoint(event_id: Long, user_id: Long, ts_us: Long, mavg: Double)
  private case class MavgSample(ts_us: Long, scaled4: Long)
  private case class MavgBuf(rows: Seq[MavgSample])

  /** A double value as the unscaled long of its DECIMAL(18,4) image —
    * the exact same rounding Spark's `cast(v AS DECIMAL(18,4))` applies
    * (valueOf = shortest-string reading, HALF_UP), so the streaming sum
    * is bit-for-bit the batch face's order-independent decimal sum.
    * Mirrors the cast's edge semantics too: NaN/Infinity -> None (the
    * ANSI cast yields null, and the batch sum AND count both skip it);
    * a magnitude beyond DECIMAL(18,4) throws, as the batch cast does. */
  private def scaled4(v: Double): Option[Long] =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) None
    else {
      val bd = java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP)
      if (bd.precision > 18)
        throw new ArithmeticException(
          s"$v cannot be represented as DECIMAL(18,4) — failing like the batch face's ANSI cast")
      Some(bd.unscaledValue().longValueExact())
    }

  /** Per-user trailing-window buffer in ValueState: the samples inside
    * the last `windowUs` microseconds, evicted as event time advances —
    * state per user is ONE window's worth of (ts, decimal-scaled value)
    * pairs, bounded by the user's event rate × window, never the full
    * history. Same in-order contract as the sibling processors, plus:
    * same-timestamp events must share a micro-batch (the batch face's
    * RANGE window puts simultaneous events in each other's window, so
    * an avg emitted before a tie arrives would be missing that value —
    * within a batch the processor groups ties and emits one shared avg).
    *
    * Averages reproduce the batch arithmetic exactly: exact decimal sum
    * over the window (scale-4 longs, summed as BigInt), one double cast,
    * one double division — [[graft.core.Determinism]]'s discipline. */
  class MovingAvgProcessor(windowUs: Long)
    extends StatefulProcessor[Long, MavgEvent, MavgPoint] {
    @transient private var buf: org.apache.spark.sql.streaming.ValueState[MavgBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[MavgBuf]("mavgBuf",
        org.apache.spark.sql.Encoders.product[MavgBuf], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[MavgEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[MavgPoint] = {
      var b = if (buf.exists()) buf.get().rows.toVector else Vector.empty[MavgSample]
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).toIndexedSeq
      if (sorted.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ListBuffer.empty[MavgPoint]
      var i = 0
      while (i < sorted.length) {
        val ts = sorted(i).ts_us
        var j = i
        while (j < sorted.length && sorted(j).ts_us == ts) j += 1
        val ties = sorted.slice(i, j)
        // append the WHOLE tie group before emitting: the range window
        // [ts - w, ts] contains every simultaneous event's value.
        // Non-representable values (scaled4 = None, i.e. the batch
        // cast's null) enter neither the sum nor the divisor — they
        // still get an output point over the surviving window.
        b = (b ++ ties.flatMap(e =>
            scaled4(e.value).map(s => MavgSample(e.ts_us, s))))
          .filter(_.ts_us >= ts - windowUs)
        val n = b.length
        val sum = b.iterator.foldLeft(BigInt(0))(_ + _.scaled4)
        // empty window (every value in range was null-equivalent):
        // batch emits SQL null; the typed streaming row carries NaN
        val mavg =
          if (n == 0) Double.NaN
          else new java.math.BigDecimal(sum.bigInteger, 4).doubleValue() / n
        ties.foreach(e => out += MavgPoint(e.event_id, key, e.ts_us, mavg))
        i = j
      }
      buf.update(MavgBuf(b))
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Analytics.movingAvgQuery]]
    * (x32): emits each event's trailing-`windowUs` average the moment
    * the event arrives, equal to the batch RANGE-window column on
    * in-order replay (spec-asserted). The one windowed analytic that
    * previously had no replay==batch twin (x33/x34/x35 all do). */
  def movingAvgStream(events: DataFrame, userCol: String, tsCol: String,
                      valueCol: String, idCol: String,
                      windowUs: Long): Dataset[MavgPoint] = {
    require(windowUs >= 0, s"movingAvgStream: windowUs=$windowUs")
    import events.sparkSession.implicits._
    events.select(col(idCol).cast("long").as("event_id"),
        col(userCol).cast("long").as("user_id"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(valueCol).cast("double").as("value"))
      .as[MavgEvent]
      .groupByKey(_.user_id)
      .transformWithState(new MovingAvgProcessor(windowUs),
        TimeMode.None(), OutputMode.Append())
  }

  /** Gap-based sessionization with arbitrary state: emits a session when
    * the event-time timeout fires (no event for `gapMillis` past the
    * watermark). Custom state logic the built-in session_window cannot
    * express (e.g. carrying max_temp per session). */
  def sensorSessions(events: Dataset[SensorEvent], gapMillis: Long,
                     delay: String): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("time_received", delay)
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (id: Int, rows: Iterator[SensorEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionAgg(id, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n, s.maxTemp))
          } else {
            val sorted = rows.toSeq.sortBy(_.time_received.getTime)
            var closed = List.empty[SessionAgg]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.time_received.getTime
              cur match {
                // in-gap on either side of the open session (a later
                // micro-batch can deliver an event just BEFORE the open
                // session, within the watermark): extend both bounds
                case Some(s) if t >= s.start - gapMillis && t <= s.end + gapMillis =>
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                    s.n + 1, math.max(s.maxTemp, e.temperature)))
                case Some(s) if t > s.end + gapMillis =>
                  closed ::= SessionAgg(id, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n, s.maxTemp)
                  cur = Some(SessionState(t, t, 1, e.temperature))
                case Some(_) =>
                  // straggler more than a gap OLDER than the open session:
                  // it can no longer merge with anything still open —
                  // emit it directly as its own single-event session
                  closed ::= SessionAgg(id, e.time_received, e.time_received,
                    1, e.temperature)
                case None =>
                  cur = Some(SessionState(t, t, 1, e.temperature))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMillis)
            }
            closed.reverseIterator
          }
        })
  }

  // --------------- streaming quantile monitoring (x49's face) --------

  case class QuantileEvent(grp: String, value: Double)
  /** A group's running quantile estimates after a micro-batch. */
  case class QuantileEstimate(grp: String, n: Long, p50: Double, p95: Double)

  /** Per-group KLL sketch in ValueState: the streaming face of the x49
    * quantile rollup. Each micro-batch folds its values into the
    * group's sketch image and emits refreshed p50/p95 estimates — a
    * live latency/price dashboard whose per-group state is the ~KB
    * sketch, BOUNDED regardless of stream length (unlike buffering
    * values, which grows linearly). The state IS the portable
    * Datasketches image, so a batch job (or [[graft.operators.Sketches]]
    * `kll_union_agg` over a persisted copy) can merge it directly.
    * getN is exact and deterministic; estimates carry the sketch's
    * rank-error bound (spec-asserted vs exact ranks, like the batch
    * face). */
  class QuantileProcessor(k: Int)
    extends StatefulProcessor[String, QuantileEvent, QuantileEstimate] {
    import graft.functions.expressions.KllOps
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    @transient private var img: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      img = getHandle.getValueState[Array[Byte]]("kllImage",
        org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[QuantileEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[QuantileEstimate] = {
      val sk =
        if (img.exists()) KllDoublesSketch.heapify(Memory.wrap(img.get()))
        else KllDoublesSketch.newHeapInstance(k)
      var any = false
      rows.foreach { e =>
        // mirror the aggregate's null handling: NaN never enters a
        // sketch (KLL update on NaN throws); nulls were filtered before
        // the typed boundary
        if (!java.lang.Double.isNaN(e.value)) { sk.update(e.value); any = true }
      }
      // nothing absorbed this batch: state is unchanged — skip the
      // RocksDB rewrite and emit no duplicate estimate row
      if (!any) return Iterator.empty
      img.update(sk.toByteArray)
      // quantiles straight off the live sketch — no re-heapify
      Iterator.single(QuantileEstimate(key, sk.getN,
        sk.getQuantile(0.5), sk.getQuantile(0.95)))
    }
  }

  /** Streaming quantile estimates per group: emits each group's
    * refreshed (n, p50, p95) after every micro-batch that touched it. */
  def quantileStream(events: DataFrame, grpCol: String, valueCol: String,
                     k: Int = graft.functions.expressions.KllOps.DefaultK)
      : Dataset[QuantileEstimate] = {
    import events.sparkSession.implicits._
    events.select(col(grpCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("value"))
      // null values skip the sketch exactly as in KllSketchAgg.update —
      // and a null cannot cross into the non-nullable
      // QuantileEvent.value primitive (it would kill the query). Null
      // GROUPS are dropped too: a monitoring key must be present.
      .filter(col("value").isNotNull && col("grp").isNotNull)
      .as[QuantileEvent]
      .groupByKey(_.grp)
      .transformWithState(new QuantileProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming median/MAD outlier gate (x60's face): scores live rows
    * against a FROZEN per-group (med, mad) baseline
    * ([[graft.operators.Analytics.madBaselineOf]] over a reference
    * corpus, persisted as a |groups|-row artifact) via a stream-static
    * broadcast join — stateless, no backpressure, the [[anomalyStream]]
    * discipline with the breakdown-resistant statistics. Matches batch
    * [[graft.operators.Analytics.madGate]] on replay with the same
    * baseline (spec-proven). `flagUnseen` defaults ON, as for the
    * z-score gate: a frozen baseline meeting a never-seen group should
    * surface it, not drop it. */
  def madStream(stream: DataFrame, baseline: DataFrame, groupCol: String,
                valueCol: String,
                k: java.math.BigDecimal = new java.math.BigDecimal("4.4478"),
                flagUnseen: Boolean = true): DataFrame =
    graft.operators.Analytics.madGate(stream, baseline, Seq(groupCol), valueCol,
      k, flagUnseen)

  /** Streaming winsorize clip gate (x58's live form): every arriving
    * row gets `v_w`, its value clipped to its group's FROZEN [p_lo,
    * p_hi] bounds ([[graft.operators.Analytics.winsorBoundsOf]] over a
    * reference corpus) via a stream-static broadcast join — stateless,
    * the third frozen-baseline gate alongside [[anomalyStream]] and
    * [[madStream]]. Unseen groups pass through unclipped (the
    * [[graft.operators.Analytics.clipGate]] contract). Matches the
    * batch gate on replay (spec-proven). */
  def clipStream(stream: DataFrame, bounds: DataFrame, groupCol: String,
                 valueCol: String): DataFrame =
    graft.operators.Analytics.clipGate(stream, bounds, Seq(groupCol), valueCol)

  /** Streaming OOV gate (x63's live form): score each arriving document
    * against a FROZEN vocabulary ([[graft.operators.TextAnalysis
    * .corpusVocab]] persisted once, or any external vocab) — same
    * output schema and values as [[graft.operators.TextAnalysis
    * .oovGate]] on replay (spec-asserted). The batch gate's
    * doc-side self-join is not streamable, so this face rides the
    * [[decontaminateStream]] shape instead: explode_outer the tokens
    * (zero-token docs stay in the report), mark vocabulary hits via a
    * broadcast left join, collapse in ONE streaming aggregate whose
    * grouping key carries n_tokens. Run in UPDATE mode; each doc emits
    * its final counts in its arrival batch. The static vocabulary is
    * persist()ed — the stream-static join re-executes its static
    * sub-plan per micro-batch. */
  def oovStream(docs: DataFrame, vocab: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis.wsTokens
    // distinct() before the _hit marker: the batch gate's left_semi join
    // is set-semantics, but this face COUNTS hits — a vocabulary frame
    // with duplicate term rows ("any external vocab" is the contract)
    // would double-count _n_iv and could drive n_oov negative
    val v = vocab.select(col("term")).distinct()
      .withColumn("_hit", lit(1L)).persist()
    docs.select(col("doc_id"),
        size(wsTokens(col("text"))).cast("long").as("n_tokens"),
        explode_outer(wsTokens(col("text"))).as("term"))
      .join(broadcast(v), Seq("term"), "left")
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(coalesce(sum(col("_hit")), lit(0L)).as("_n_iv"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("_n_iv")).as("n_oov"))
  }

  // --------------------- streaming interval attribution (x59's face) --

  /** Streaming face of the binned interval join: each arriving point
    * row is annotated with every STATIC interval containing its date —
    * the attribution gate (event → campaign/fulfillment window) run at
    * ingestion. Same binning arithmetic as
    * [[graft.operators.IntervalJoin.pointInIntervalCount]] (shared
    * constant `binDays` contract), so stream and batch agree row-for-row
    * on replay (spec-asserted). The static side explodes to its bin
    * buckets ONCE and persists — the stream-static join re-executes the
    * static sub-plan every micro-batch, and without the cache the
    * explode would re-run per trigger (the decontaminateStream
    * discipline). Stateless: no watermark, no store — the stream side
    * just equi-joins its one bucket and residual-filters, so the gate
    * adds no backpressure at any scale. Inner join: unmatched points
    * drop (the attribution contract); use the batch face for
    * zero-count reports. */
  def intervalMatchStream(points: DataFrame, intervals: DataFrame,
                          binDays: Int): DataFrame = {
    require(binDays > 0, s"intervalMatchStream: binDays=$binDays")
    def bin(d: org.apache.spark.sql.Column) =
      floor(unix_date(d).cast("long").cast("double") / binDays).cast("long")
    val binnedIv = intervals
      .withColumn("_bin", explode(sequence(bin(col("d0")), bin(col("d1")))))
      .persist()
    points.withColumn("_bin", bin(col("d")))
      .join(binnedIv, Seq("_bin"))
      .filter(col("d").between(col("d0"), col("d1")))
      .drop("_bin", "d0", "d1")
  }

  /** Streaming face of the interval TOP-K (x61's live form): each
    * arriving interval row (id, d0 DATE, d1 DATE) gets its top-k points
    * from a FROZEN day-calendar built once over a static point corpus —
    * the fourth frozen-baseline gate alongside the x58/x60/x63 shapes.
    * The calendar ([[graft.operators.IntervalJoin.collectDayCalendar]])
    * is the same bounded days × k artifact the batch broadcast plan
    * collects, and the projection is the same stateless codegen kernel,
    * so replay equals batch CELL-FOR-CELL (spec-asserted) and the gate
    * adds no state, watermark, or backpressure. Over-bound calendars
    * FAIL FAST: the batch fallback is a window-over-interval-id join,
    * which Structured Streaming cannot run — silently switching plans
    * would break the query at start-up anyway, so the bound violation
    * surfaces as the error. */
  def intervalTopKStream(intervals: DataFrame, points: DataFrame, k: Int,
                         maxCalendarEntries: Int = 1 << 20): DataFrame =
    graft.operators.IntervalJoin
      .collectDayCalendar(points, k, maxCalendarEntries) match {
      case Some(cal) =>
        graft.operators.IntervalJoin.calendarKernelProject(intervals, cal, k)
      case None => throw new IllegalArgumentException(
        s"intervalTopKStream: day calendar exceeds $maxCalendarEntries " +
          "entries/span — the distributed fallback is not streamable; " +
          "raise the bound or gate batches with topKPointsPerIntervalJoin")
    }

  /** Streaming temperature-mix admission (x68's live form): arriving
    * rows are kept at their source's FROZEN sqrt-scaled rate
    * ([[graft.operators.Sampling.temperatureRatesOf]] over a reference
    * corpus, persisted as a |sources|-row artifact) — the fifth
    * frozen-baseline gate. Stateless broadcast join + hash filter, so
    * the gate adds no watermark, store, or backpressure; decisions are
    * the [[graft.operators.Sampling.keepAtRate]] md5 arithmetic, so
    * replay equals the batch mix against the same rates (spec-asserted)
    * and admission is reproducible across restarts. Unseen sources pass
    * whole (rate 1.0) — surface new feeds downstream, don't silently
    * drop them. */
  def temperatureMixStream(stream: DataFrame, rates: DataFrame, key: Column,
                           salt: String): DataFrame =
    graft.operators.Sampling.applyRates(stream, rates, key, salt)

  // ------------------------ streaming token budget (x56's face) ------

  case class TokenDoc(doc_id: Long, source: String, n_tokens: Long)
  /** One document's admission decision — the streaming image of an x56
    * output row. */
  case class TokenDecision(doc_id: Long, source: String, n_tokens: Long,
                           cum_tokens: Long, kept: Boolean)

  /** Per-source consumed-token counter in ValueState: admit documents
    * while the tokens consumed BEFORE each one are under the budget —
    * the batch face's greedy fill-then-overflow cut, decided at
    * ingestion time. State per source is ONE long, bounded forever.
    * Docs are ordered by doc_id within a batch (the sibling processors'
    * sort-the-batch discipline); the in-order contract across batches is
    * the same as retention/moving-average: replay in doc_id order
    * reproduces [[graft.operators.Sampling.tokenBudget]] exactly
    * (spec-asserted). */
  class TokenBudgetProcessor(budget: Long)
    extends StatefulProcessor[String, TokenDoc, TokenDecision] {
    @transient private var used: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      used = getHandle.getValueState[Long]("usedTokens",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TokenDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[TokenDecision] = {
      var cum = if (used.exists()) used.get() else 0L
      val out = rows.toSeq.sortBy(_.doc_id).map { d =>
        val kept = cum < budget
        cum += d.n_tokens
        TokenDecision(d.doc_id, d.source, d.n_tokens, cum, kept)
      }
      if (out.nonEmpty) used.update(cum)
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Sampling.tokenBudget]] (x56):
    * corpus assembly as ingestion — each arriving document is admitted
    * or rejected against its source's remaining token budget the moment
    * it lands, with the same token counter expression as the batch face
    * so the two cannot drift. */
  def tokenBudgetStream(docs: DataFrame, budget: Long): Dataset[TokenDecision] = {
    require(budget > 0, s"tokenBudgetStream: budget=$budget")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"),
        size(graft.operators.TextAnalysis.wsTokens(col("text"))).cast("long").as("n_tokens"))
      .as[TokenDoc]
      .groupByKey(_.source)
      .transformWithState(new TokenBudgetProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[TokenBudgetProcessor]] with a PER-SOURCE cap table instead of
    * one uniform budget — x56's exact fill-then-overflow rule, keyed
    * by the x160 provisioning plan. A source absent from the plan has
    * cap 0: nothing was provisioned for it, so every arrival is
    * emitted rejected (surfaced, never silently dropped — the budget
    * analogue of the temperature gate's unseen-source contract, with
    * the opposite default because admitting unbudgeted mass breaks the
    * plan's total). */
  class PlannedBudgetProcessor(caps: Map[String, Long])
    extends StatefulProcessor[String, TokenDoc, TokenDecision] {
    @transient private var used: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      used = getHandle.getValueState[Long]("usedTokens",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TokenDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[TokenDecision] = {
      val budget = caps.getOrElse(key, 0L)
      var cum = if (used.exists()) used.get() else 0L
      val out = rows.toSeq.sortBy(_.doc_id).map { d =>
        val kept = cum < budget
        cum += d.n_tokens
        TokenDecision(d.doc_id, d.source, d.n_tokens, cum, kept)
      }
      if (out.nonEmpty) used.update(cum)
      out.iterator
    }
  }

  /** x160 → x56 COMPOSITION: the data-budget PROVISIONING TABLE as a
    * live admission gate. [[graft.operators.Sampling.dataBudget]]
    * plans each source's token allocation (DoReMi demand under the
    * epoch cap); this face freezes that plan — the ≤|sources|-row
    * `alloc` column, collected once at plan-build time (the
    * frozen-moments discipline) — and admits arriving documents
    * against their source's own allocation with x56's exact greedy
    * fill-then-overflow rule. State per source stays ONE long. Per
    * source, replay in doc_id order equals batch
    * [[graft.operators.Sampling.tokenBudget]] run at that source's cap
    * (spec-asserted), so the provisioning table and the ingestion edge
    * cannot drift. */
  def budgetAdmissionStream(docs: DataFrame,
                            allocPlan: DataFrame): Dataset[TokenDecision] = {
    val caps = allocPlan.select(col("source"), col("alloc").cast("double"))
      .collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1)).toLong).toMap
    require(caps.nonEmpty, "budgetAdmissionStream: empty allocation plan")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"),
        size(graft.operators.TextAnalysis.wsTokens(col("text"))).cast("long").as("n_tokens"))
      .as[TokenDoc]
      .groupByKey(_.source)
      .transformWithState(new PlannedBudgetProcessor(caps),
        TimeMode.None(), OutputMode.Append())
  }

  // ---------------------- streaming dialog audit (x125's face) -------

  case class Turn(thread_id: Long, role: String, ts_us: Long, event_id: Long)
  case class DialogState(n_turns: Long, n_breaks: Long, min_ts: Long,
                         max_ts: Long, last_role: String, roles: List[String])
  case class DialogAudit(thread_id: Long, n_turns: Long, n_roles: Long,
                         n_breaks: Long, span_sec: Long)

  private class DialogProcessor
    extends StatefulProcessor[Long, Turn, DialogAudit] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[DialogState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DialogState]("dialog",
        org.apache.spark.sql.Encoders.product[DialogState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Turn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[DialogAudit] = {
      var s = if (st.exists()) st.get()
              else DialogState(0L, 0L, Long.MaxValue, Long.MinValue, null, Nil)
      // the sibling processors' in-order contract: (ts, event_id) within
      // the batch; cross-batch order is the caller's replay contract
      // order on MICROSECONDS (the batch face's lag window orders on
      // the full-precision timestamp); the span floors to seconds only
      // at emission, exactly like batch's unix_timestamp(max)-(min)
      rows.toSeq.sortBy(t => (t.ts_us, t.event_id)).foreach { t =>
        val breaks = s.n_breaks + (if (t.role == s.last_role) 1L else 0L)
        val roles = if (s.roles.contains(t.role)) s.roles else t.role :: s.roles
        s = DialogState(s.n_turns + 1, breaks,
          math.min(s.min_ts, t.ts_us), math.max(s.max_ts, t.ts_us),
          t.role, roles)
      }
      st.update(s)
      Iterator.single(DialogAudit(key, s.n_turns, s.roles.size.toLong,
        s.n_breaks, s.max_ts / 1000000L - s.min_ts / 1000000L))
    }
  }

  /** Streaming face of [[graft.operators.Analytics.dialogAudit]]
    * (x125): the live malformed-conversation screen — each thread's
    * turn count, distinct roles, alternation breaks, and span update
    * the moment a turn lands (Update mode; the latest row per thread
    * is the audit). State per thread is a handful of scalars plus the
    * DISTINCT role list — bounded by the role vocabulary (a dialog
    * format has a handful), not by turns. In-(ts, event_id)-order
    * replay equals batch x125 (spec-asserted); the batch face stays
    * the backfill tool. */
  def dialogAuditStream(events: DataFrame): Dataset[DialogAudit] = {
    import events.sparkSession.implicits._
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id").cast("long").as("thread_id"),
        col("event_type").as("role"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("event_id"))
      .as[Turn]
      .groupByKey(_.thread_id)
      .transformWithState(new DialogProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  // ---------------------- streaming pack assignment (x21/x143's face)

  case class PackArrival(doc_id: Long, n_tokens: Long, shard: Long)
  case class PackDecision(doc_id: Long, n_tokens: Long, shard: Long,
                          pack_id: Long)

  private class PackProcessor(budget: Long)
    extends StatefulProcessor[Long, PackArrival, PackDecision] {
    @transient private var cum: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cumTokens",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[PackArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[PackDecision] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toSeq.sortBy(_.doc_id).map { r =>
        c += r.n_tokens
        // (c - n) / budget over non-negative longs == the batch face's
        // floor((cum - n_tokens) / budget), without the double detour
        PackDecision(r.doc_id, r.n_tokens, key,
          key * graft.operators.Sampling.ShardStride + (c - r.n_tokens) / budget)
      }
      cum.update(c)
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Sampling.packSequences]]
    * (x21, and the assignment grain under x143's manifest): bin-fill
    * AS ingestion — each arriving document lands in the pack its
    * STARTING offset falls in, per shard, exactly the batch
    * streaming-fill rule run live. State per shard is ONE long (the
    * running token count) — bounded by the shard count, never by the
    * corpus. On in-doc_id-order replay the assignments equal batch
    * x21 row-for-row (spec-asserted); x143's manifest is then a
    * consumer-side rollup of the emitted (pack_id, doc_id, offset)
    * stream, the same aggregation the batch face runs. */
  def packStream(docs: DataFrame, budget: Long = 2000L,
                 shards: Int = 32): Dataset[PackDecision] = {
    // mirror packSequences' guards: budget=0 would otherwise surface as a
    // per-row ArithmeticException inside the processor, and an oversized
    // shard count would wrap pack_id negative via the ShardStride multiply
    require(budget > 0 && shards > 0, s"budget=$budget shards=$shards")
    require(shards <= (1 << 22), s"shards=$shards exceeds the 2^22 id-space bound")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"),
        size(graft.operators.TextAnalysis.wsTokens(col("text"))).cast("long")
          .as("n_tokens"),
        (col("doc_id") % shards).cast("long").as("shard"))
      .as[PackArrival]
      .groupByKey(_.shard)
      .transformWithState(new PackProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }

  // ---------------------- streaming contamination excision (x151's face)

  case class ExciseArrival(doc_id: Long, g: Int, text: Option[String])
  case class ExciseResult(doc_id: Long, n_tokens: Long, n_dropped: Long,
                          out_key: String)

  private class ExciseProcessor(k: Int)
    extends StatefulProcessor[Long, ExciseArrival, ExciseResult] {

    // stateless, like LineDedupProcessor: the doc row and its hit rows
    // arrive in the same batch (one input row explodes within the
    // batch), so nothing persists between batches
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[ExciseArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ExciseResult] = {
      val rs = rows.toVector
      rs.collectFirst { case r if r.g < 0 => r.text }.flatten match {
        case None => Iterator.empty // no doc row this batch: nothing to rebuild
        case Some(t) =>
          val w = t.split(" ").filter(_.nonEmpty)
          val dropped = scala.collection.mutable.BitSet.empty
          rs.foreach { r =>
            if (r.g >= 0)
              (r.g until math.min(r.g + k, w.length)).foreach(dropped += _)
          }
          val kept = w.zipWithIndex.collect { case (tok, i) if !dropped(i) => tok }
          Iterator.single(ExciseResult(key, w.length.toLong,
            dropped.size.toLong, md5Hex(kept.mkString(" "))))
      }
    }
  }

  /** Streaming face of [[graft.operators.Dedup.exciseContamination]]
    * (x151): benchmark-span excision AS ingestion — each arriving
    * document's k-grams probe the FROZEN reference gram index
    * ([[graft.operators.Dedup.saveDecontamIndex]]'s `grams` leg —
    * benchmark-grain, a stream-static semi-join), hit spans union, and
    * the document re-emits rewritten. Like the x139 line face the
    * processor registers NO state: a document's gram rows explode from
    * its one input row, so doc and hits share a batch by construction
    * and the state store holds nothing between batches. Against the
    * same reference, replay equals the batch x151 report row-for-row
    * (spec-asserted). */
  def exciseStream(docs: DataFrame, indexPath: String, k: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = spark.read.parquet(s"$indexPath/grams")
    // null-text documents are dropped EXPLICITLY, matching the batch
    // face's filter (Dedup.exciseContamination) — before this filter the
    // live face silently emitted nothing for them while the batch face
    // emitted a null-metrics row; both now agree on "absent"
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val hits = toks
      .select(col("doc_id"), posexplode(
        graft.functions.expressions.NativeExpressions.wordShinglesAll(
          graft.operators.TextAnalysis.wsTokens(col("text")), k)))
      .toDF("doc_id", "g", "gram")
      .join(grams, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("g"), lit(null).cast("string").as("text"))
    toks.select(col("doc_id"), lit(-1).as("g"), col("text"))
      .unionByName(hits)
      .as[ExciseArrival]
      .groupByKey(_.doc_id)
      .transformWithState(new ExciseProcessor(k),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  // ---------------------- streaming SFT pair extraction (x146's face)

  case class SftState(turn_idx: Long, last_role: String, last_event: Long,
                      last_ts_us: Long)
  case class SftPair(thread_id: Long, turn_idx: Long, prompt_event: Long,
                     response_event: Long, prompt_role: String,
                     response_role: String, gap_sec: Long)

  private class SftPairsProcessor
    extends StatefulProcessor[Long, Turn, SftPair] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SftState]("sft",
        org.apache.spark.sql.Encoders.product[SftState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Turn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SftPair] = {
      var s = if (st.exists()) st.get() else SftState(0L, null, 0L, 0L)
      val out = scala.collection.mutable.ListBuffer.empty[SftPair]
      // same in-(ts, event_id)-order contract as DialogProcessor; the
      // gap floors each endpoint to seconds BEFORE subtracting, exactly
      // like batch's unix_timestamp(ts) - unix_timestamp(prev_ts)
      rows.toSeq.sortBy(t => (t.ts_us, t.event_id)).foreach { t =>
        val idx = s.turn_idx + 1L
        if (s.last_role != null && s.last_role != t.role)
          out += SftPair(key, idx, s.last_event, t.event_id, s.last_role,
            t.role, t.ts_us / 1000000L - s.last_ts_us / 1000000L)
        s = SftState(idx, t.role, t.event_id, t.ts_us)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Analytics.sftPairs]] (x146):
    * prompt→response pair extraction AS the turn stream arrives — the
    * live form of the step x125's audit gates. Each thread's state is
    * the LAST turn only ((role, event, ts) plus the running turn
    * index — O(threads), the x125 shape, never O(turns)); an arriving
    * turn that alternates against it emits the pair immediately,
    * same-role repeats (x125's breaks) emit nothing, exactly the batch
    * lag-filter semantics. Append mode: a pair, once emitted, is
    * final. In-(ts, event_id)-order replay equals batch x146
    * row-for-row (spec-asserted). */
  def sftPairsStream(events: DataFrame): Dataset[SftPair] = {
    import events.sparkSession.implicits._
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id").cast("long").as("thread_id"),
        col("event_type").as("role"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("event_id"))
      .as[Turn]
      .groupByKey(_.thread_id)
      .transformWithState(new SftPairsProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  // ---------------------- streaming epoch-order keys (x141's face)

  /** Streaming face of [[graft.operators.Sampling.epochOrder]] (x141):
    * the per-epoch permutation KEY, emitted live as documents land.
    * The x141 rank is a pure function of the corpus's sorted
    * (k, doc_id) sets, so the only streamable grain is the key
    * itself — md5(doc:ord:epoch), stateless, one row per (doc,
    * epoch) — and any consumer (or any worker, independently)
    * materializes an epoch's order by sorting its accumulated keys;
    * after full replay that sort IS the batch x141 permutation
    * (spec-asserted). No state, no shuffle on the stream side. */
  def epochKeyStream(docs: DataFrame,
                     epochs: Int = graft.operators.Sampling.EpochCount): DataFrame = {
    // epochs=0 would build sequence(0, -1), which Spark evaluates as the
    // DESCENDING array [0, -1] — two bogus epoch rows per doc, not zero
    require(epochs > 0, s"epochs=$epochs")
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("k", md5(concat(col("doc_id").cast("string"),
        lit(":ord:"), col("epoch").cast("string"))))
      .select(col("epoch"), col("doc_id"), col("k"))
  }

  // --------------- streaming per-doc leakage probe (x152's face) -----

  /** Streaming face of [[graft.operators.Sampling.leakageProbe]]
    * (x152): each arriving document's distinct grams probe the FROZEN
    * split-gram index ([[graft.operators.Sampling.saveLeakageIndex]]'s
    * hashed (split, gram) artifact) and the doc emits its per-split
    * shared-gram counts — the live "does this new document leak a held-
    * out split" audit, the x55/x91 frozen-reference discipline at doc
    * grain. The probe IS the batch body run on the stream (one
    * stream-static equi-join on 8-byte gram keys + one streaming
    * aggregate keyed (doc, split) — the oovStream shape). Run in UPDATE
    * mode; replay equals the batch probe against the same index
    * (spec-asserted). */
  def leakageProbeStream(docs: DataFrame, indexPath: String): DataFrame = {
    val spark = docs.sparkSession
    val root = graft.core.Artifacts.readablePath(spark, indexPath)
    graft.operators.Sampling.leakageProbe(docs,
      spark.read.parquet(s"$root/grams"))
  }

  // ------------- streaming quality panel (x163's face) ---------------

  /** Streaming face of
    * [[graft.operators.TextAnalysis.qualityPanel]] (x163): the fused
    * x147/x148/x154/x97 projection run AS-IS on the stream — it is a
    * pure stateless narrow map, so the batch function IS the streaming
    * gate (the x147/x148 pattern, now one pass for the whole audit
    * battery). Replay equals batch row-for-row (spec-asserted). */
  def qualityPanelStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.qualityPanel(docs)

  // ------------- streaming PCA projection (x158/x162's face) ---------

  /** Streaming face of [[graft.operators.Similarity.pcaProjection2]]
    * (x158/x162): project each arriving vector into the FROZEN
    * principal plane ([[graft.operators.Similarity.savePcaAxes]]'s
    * 2×d-row artifact) — the live embedding-drift monitor (arrivals
    * whose (proj1, proj2) cloud wanders off the trained corpus's
    * signal a distribution shift in the exact coordinates batch x162
    * plotted). The artifact is collected once at plan-build time
    * (bounded by 2d — the frozen-moments discipline) and compiled into
    * ONE stateless literal-array map: no join, no state, no shuffle —
    * the clipStream shape. Same-corpus replay is bit-identical to
    * batch x162's (proj1, proj2) (spec-asserted). */
  def pcaProjectionStream(emb: DataFrame, axesPath: String): DataFrame = {
    val spark = emb.sparkSession
    val root = graft.core.Artifacts.readablePath(spark, axesPath)
    graft.operators.Similarity.pcaProjectAgainst(emb,
      spark.read.parquet(s"$root/axes"))
  }

  // ------------------ streaming DSIR scoring gate (x153's face) ------

  /** Streaming face of [[graft.operators.Sampling.dsirWeights]] (x153):
    * score each arriving document against the FROZEN DSIR model
    * ([[graft.operators.Sampling.saveDsirModel]]'s B-row λ table) — the
    * live importance gate a target-driven selection pipeline runs at
    * the ingestion edge, the frozen-baseline discipline of the
    * temperature/OOV/clip gates. One stream-static broadcast join of
    * exploded token buckets to the λ table plus one UPDATE-mode
    * aggregate (the oovStream shape); zero-token docs stay in the
    * report via explode_outer. Over the model's own raw corpus, replay
    * equals batch x153 row-for-row (spec-asserted). */
  def dsirStream(docs: DataFrame, modelPath: String,
                 buckets: Int = graft.operators.Sampling.DsirBuckets): DataFrame = {
    val spark = docs.sparkSession
    val root = graft.core.Artifacts.readablePath(spark, modelPath)
    graft.operators.Sampling.dsirScoreAgainst(docs,
      spark.read.parquet(s"$root/lambda"), buckets)
  }

  // --------------- streaming NB quality gate (x155's face) -----------

  /** Streaming face of
    * [[graft.operators.TextAnalysis.nbQualityClassifier]] (x155):
    * score each arriving document's curated-vs-crawl log-odds against
    * the FROZEN NB model ([[graft.operators.TextAnalysis.saveNbModel]]'s
    * weight + prior artifact) and emit the gate decision — the live
    * quality classifier every CCNet-style ingestion front-end runs
    * (train on seeds batch-side, gate the crawl live). Stateless: one
    * broadcast join per micro-batch plus a per-doc aggregate; the
    * dsirStream frozen-model discipline. Same-corpus replay equals the
    * batch x155 report row-for-row modulo the label column no live
    * document carries (spec-asserted). */
  def nbGateStream(docs: DataFrame, modelPath: String,
                   buckets: Int = graft.operators.TextAnalysis.NbBuckets)
      : DataFrame = {
    val spark = docs.sparkSession
    val root = graft.core.Artifacts.readablePath(spark, modelPath)
    graft.operators.TextAnalysis.nbScoreAgainst(docs,
      spark.read.parquet(s"$root/weights"),
      spark.read.parquet(s"$root/prior"), buckets)
  }

  // -------------- streaming CCNet LM gate (x67 + x159's face) --------

  /** Streaming face of the CCNet selection pair (x67's LM score +
    * x159's buckets): each arriving document scores against the FROZEN
    * bigram LM ([[graft.operators.TextAnalysis.saveLmModel]]'s lp
    * artifact — the KenLM deployment shape) and lands in the band of
    * the FROZEN x159 edges ([[graft.operators.Sampling.ccnetEdgesOf]],
    * a ≤|bands|-row table compiled into one stateless CASE chain, the
    * curriculumStream discipline). One stream-static equi-join plus one
    * UPDATE-mode doc aggregate; state bounded by in-flight docs, never
    * the corpus. Same-corpus replay equals batch x159 row-for-row
    * modulo the global rank no per-row gate can know and boundary score
    * ties (spec-asserted on the tie-free regime); unscored docs keep
    * the null-band report contract. */
  def lmGateStream(docs: DataFrame, modelPath: String,
                   edges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val root = graft.core.Artifacts.readablePath(spark, modelPath)
    val scored = graft.operators.TextAnalysis.lmScoreAgainst(docs,
      spark.read.parquet(s"$root/lp"))
    val es = edges.select(col("bucket").cast("long"), col("lo").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    require(es.nonEmpty, "lmGateStream: empty edge table")
    val band = es.tail.foldLeft(lit(es.head._1): Column) {
      case (acc, (b, lo)) => when(col("avg_logp") >= lo, b).otherwise(acc)
    }
    scored.withColumn("bucket", when(col("avg_logp").isNotNull, band))
  }

  // ----------------- streaming curriculum band gate (x150's face) ----

  /** Streaming face of [[graft.operators.Sampling.curriculumBands]]
    * (x150): assign each arriving document its length band against the
    * FROZEN band edges ([[graft.operators.Sampling.curriculumEdgesOf]]
    * over a reference corpus — a ≤|bands|-row artifact), the
    * madStream/clipStream frozen-baseline shape. The edge table is
    * collected once at plan-build time (bounded by the band count, the
    * frozen-moments discipline of [[rateBursts]]'s face) and compiled
    * into ONE stateless integer CASE chain — no join, no state, no
    * shuffle: the gate fuses into the ingestion scan like x147/x148.
    *
    * A document lands in the HIGHEST band whose edge ≤ its n_tokens
    * (docs shorter than every reference doc clamp to the lowest band,
    * longer ones to the top — the unseen-value contract). Replay over
    * a boundary-tie-free corpus equals batch x150's band column
    * row-for-row (spec-asserted); the live face necessarily omits the
    * batch face's global `rank`, which no per-row gate can know. */
  def curriculumStream(docs: DataFrame, edges: DataFrame): DataFrame = {
    val es = edges.select(col("band").cast("long"), col("lo").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(es.nonEmpty, "curriculumStream: empty edge table")
    val nTok = size(graft.operators.TextAnalysis.wsTokens(col("text")))
      .cast("long")
    // ascending fold: later (higher) bands overwrite when their edge is
    // met, so the result is the highest band whose lo <= n_tokens
    val band = es.tail.foldLeft(lit(es.head._1): Column) {
      case (acc, (b, lo)) => when(nTok >= lo, b).otherwise(acc)
    }
    docs.select(col("doc_id").cast("long").as("doc_id"),
      nTok.as("n_tokens"), band.as("band"))
  }

  // ------------------- streaming host-reputation gate (x119's face) --

  /** Streaming face of [[graft.operators.WebPrep.hostReputation]]
    * (x119): the live domain filter — each arriving document is
    * admitted or rejected by its HOST's FROZEN reputation (the
    * host-grain (host_docs, host_pass) aggregate computed over a
    * reference crawl and handed in as a bounded table — the
    * frozen-baseline discipline of the temperature/OOV/clip gates).
    * Stateless: a broadcast join plus the SAME all-integer
    * `2·host_pass ≥ host_docs` cut as the batch face, so replay over
    * any chunking equals batch x119 against the same reputation
    * (spec-asserted). An UNSEEN host passes with null reputation
    * fields rather than being silently dropped — new domains surface
    * downstream, the x68 unseen-source contract. */
  def hostRepGateStream(docs: DataFrame, reputation: DataFrame,
                        host: Column): DataFrame =
    docs.withColumn("host", host)
      .join(broadcast(reputation.select(col("host"), col("host_docs"),
        col("host_pass"))), Seq("host"), "left")
      .select(col("doc_id"), col("host"), col("host_docs"), col("host_pass"),
        when(col("host_docs").isNull, 1L)
          .otherwise(when(col("host_pass") * 2 >= col("host_docs"), 1L)
            .otherwise(0L)).as("admitted"))

  // ------------------------ streaming rate bursts (x126's face) ------

  /** Streaming face of [[graft.operators.Analytics.rateBursts]] (x126):
    * the live volume-anomaly monitor — a watermarked tumbling 1-hour
    * count per event type, z-scored against FROZEN per-type hourly
    * moments (n, Σc, Σc² from a reference window — the frozen-baseline
    * discipline) the moment the hour closes. Append mode: each (type,
    * hour) verdict emits exactly once, when the watermark passes the
    * window end. The z arithmetic is the SAME closed form as the batch
    * face (identical parenthesization), so replay over in-horizon data
    * equals batch x126 against the same moments (spec-asserted). A
    * type absent from the moments yields null z / burst=0 rather than
    * dropping (the unseen-key contract). */
  def burstStream(events: DataFrame, moments: DataFrame,
                  zThreshold: Double = graft.operators.Analytics.BurstZ,
                  watermark: String = "2 hours"): DataFrame = {
    // freeze the moments AS VALUES, not as a plan: a stream-static join
    // re-executes the static subplan every micro-batch, so a moments
    // DataFrame derived from a live table would silently recompute (and
    // drift) per batch AND re-pay its aggregation each hour. The table
    // is |event types| rows — collecting it is the cheap way to make
    // "frozen" true by construction.
    val spark = events.sparkSession
    val frozen = spark.createDataFrame(
      spark.sparkContext.parallelize(
        moments.select(col("event_type"), col("n").cast("long"),
          col("sc").cast("long"), col("scc").cast("long")).collect().toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sc",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("scc",
          org.apache.spark.sql.types.LongType))))
    val counted = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("hour_sec"), col("c"))
    val (n, sc, scc) = (col("n").cast("double"), col("sc").cast("double"),
      col("scc").cast("double"))
    val mean = sc / n
    val variance = (n * scc - sc * sc) / nullif(n * (n - 1), lit(0d))
    val z = (col("c").cast("double") - mean) / nullif(sqrt(variance), lit(0d))
    counted
      .join(broadcast(frozen), Seq("event_type"), "left")
      .select(col("event_type"), col("hour_sec"), col("c"),
        round(z, 6).as("z"),
        when(round(z, 6) >= zThreshold, 1L).otherwise(0L).as("burst"))
  }

  // --------------------- streaming decayed popularity (x111's face) --

  case class DecayScore(event_type: String, n_events: Long,
                        decayed_count: Double)

  /** Per-type (count, micro-unit weight sum) in ValueState — the weight
    * arithmetic lives in the PLAN (same expression as the batch face),
    * the processor only adds exact integers. */
  private class DecayProcessor
    extends StatefulProcessor[String, (String, Long), DecayScore] {
    @transient private var acc: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[(Long, Long)]("decayAcc",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[DecayScore] = {
      var (n, micro) = if (acc.exists()) acc.get() else (0L, 0L)
      rows.foreach { case (_, m) => n += 1; micro += m }
      acc.update((n, micro))
      Iterator.single(DecayScore(key, n, micro / 1e6))
    }
  }

  /** Streaming face of [[graft.operators.Analytics.decayPopularity]]
    * (x111): the LIVE decayed leaderboard — each arriving event adds
    * its exponential recency weight to its type's score the moment it
    * lands. The reference day is FROZEN as a parameter (the batch face
    * derives it from the corpus max; a live gate pins it per
    * deployment window — the frozen-artifact discipline of the other
    * gate faces), so every event's weight is a pure function of the
    * row and the accumulation is order-independent: replay over any
    * chunking equals the batch face at the same reference day,
    * cell-exactly (spec-asserted).
    *
    * Exactness across the two faces: the weight is computed by the
    * SAME plan expression as batch (round(pow,6) into DECIMAL(18,6)),
    * then carried into state as its UNSCALED micro-units long
    * (`unscaledValueExact`, no double round-trip), so the streamed sum
    * is the batch face's exact decimal sum; the one double division
    * happens only at emission. State per event type is two longs,
    * bounded forever; per-batch cost is map-only plus a |types|-key
    * state update. */
  def decayStream(events: DataFrame, refDay: java.time.LocalDate,
                  halflifeDays: Double =
                    graft.operators.Analytics.DecayHalflifeDays): Dataset[DecayScore] = {
    require(halflifeDays > 0, s"decayStream: halflifeDays=$halflifeDays")
    import events.sparkSession.implicits._
    events
      .filter(col("ts").isNotNull)
      .select(col("event_type"),
        round(pow(lit(0.5),
          datediff(lit(java.sql.Date.valueOf(refDay)), to_date(col("ts")))
            .cast("double") / lit(halflifeDays)), 6)
          .cast("decimal(18,6)").as("w"))
      .as[(String, java.math.BigDecimal)]
      .map { case (t, w) =>
        // w is null only when the DECIMAL(18,6) image overflowed — an
        // event so far AFTER the frozen reference day that 0.5^(-age)
        // exceeds 12 integer digits. That's a misconfigured refDay
        // (the reference must sit at or after the deployment window's
        // data), not a value to silently drop or zero.
        require(w != null,
          s"decayStream: weight overflow for '$t' — event far after refDay")
        (t, w.setScale(6).unscaledValue().longValueExact()) }
      .groupByKey(_._1)
      .transformWithState(new DecayProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  // ----------------------- streaming ANN probe (x06's live face) -----

  /** Streaming face of [[graft.operators.DocPrep.piiAudit]] (x97): the
    * live privacy gate — each arriving document is redacted and
    * admitted/flagged the moment it lands. Stateless (the regex
    * battery is frozen in the plan), so replay trivially equals batch
    * under any chunking (spec-asserted); map-only cost per batch.
    * Emits every doc with its redacted text, the finding count, and
    * the admission verdict: admitted iff the RAW text carried ≤ maxPii
    * DETECTED findings (pre-redaction count — the redactor uses the
    * same regex battery, so a post-redaction "residual" count would be
    * trivially zero and gate nothing; the detected count is what a
    * privacy budget actually caps). maxPii=0 admits only docs that
    * needed no redaction at all. The audit shape, so the quarantine
    * leg is a filter away. */
  def piiGateStream(docs: DataFrame, maxPii: Long = 0L): DataFrame = {
    import graft.operators.DocPrep
    val t = col("text")
    val total = (regexp_count(t, lit(DocPrep.PiiEmailRe)) +
      regexp_count(t, lit(DocPrep.PiiPhoneRe)) +
      regexp_count(t, lit(DocPrep.PiiIpRe))).cast("long")
    docs.select(col("doc_id"), DocPrep.redactPii(t).as("text"),
      total.as("pii_total"),
      when(total <= maxPii, lit(true)).otherwise(lit(false)).as("admitted"))
  }

  case class UrlArrival(doc_id: Long, canon: String)
  case class FrontierDecision(doc_id: Long, canon: String, keep_id: Long,
                              admitted: Boolean)

  private class UrlFrontierProcessor
    extends StatefulProcessor[String, UrlArrival, FrontierDecision] {
    @transient private var keeper: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long]("keeperId",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[UrlArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[FrontierDecision] = {
      var keep = if (keeper.exists()) keeper.get() else -1L
      val out = rows.toSeq.sortBy(_.doc_id).map { u =>
        val first = keep < 0L
        if (first) { keep = u.doc_id; keeper.update(keep) }
        FrontierDecision(u.doc_id, u.canon, keep, first)
      }
      out.iterator
    }
  }

  /** Streaming URL FRONTIER — [[graft.operators.WebPrep.urlDedup]]'s
    * (x104) live form, and the shape a crawler actually runs: each
    * arriving record's URL is canonicalized (same x102 ladder, frozen
    * in the plan) and admitted iff its canonical key was never seen;
    * later arrivals carry the keeper's id (the dedup audit trail).
    * State is ONE long per DISTINCT canonical key — the frontier set
    * itself, which is exactly the state any crawler must hold; it
    * lives in the state store (RocksDB at scale), partitioned by the
    * canon hash, never on the driver. On in-order replay the
    * first-arrival keeper IS the batch face's min-id keeper, so
    * replay equals batch verdict-for-verdict (spec-asserted). */
  def urlFrontierStream(docs: DataFrame, urlCol: String = "url"): Dataset[FrontierDecision] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"),
        graft.operators.WebPrep.canonicalUrl(col(urlCol)).as("canon"))
      .as[UrlArrival]
      .groupByKey(_.canon)
      .transformWithState(new UrlFrontierProcessor(),
        TimeMode.None(), OutputMode.Append())
  }

  case class DedupArrival(doc_id: Long, text: String, corpus_keep: Long)
  case class DedupDecision(doc_id: Long, keep_id: Long, dup: Boolean)

  private class DedupStreamProcessor
    extends StatefulProcessor[String, DedupArrival, DedupDecision] {
    @transient private var keeper: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long]("keeperId",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DedupArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[DedupDecision] = {
      var keep = if (keeper.exists()) keeper.get() else -1L
      val out = rows.toSeq.sortBy(_.doc_id).map { d =>
        // the frozen corpus keeper always wins; otherwise the first
        // stream arrival claims the key
        val k = if (d.corpus_keep >= 0L) d.corpus_keep
        else {
          if (keep < 0L) { keep = d.doc_id; keeper.update(keep) }
          keep
        }
        DedupDecision(d.doc_id, k, d.doc_id != k)
      }
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Dedup.dedupAgainst]] (x106):
    * exact dedup AS ingestion — each arriving document is checked
    * against the frozen corpus keeper index (stream-static equi-join
    * on the content key, O(batch keys) per micro-batch) and against
    * everything that already streamed (one keeper id of keyed state
    * per distinct NEW key — corpus-known keys never enter state). On
    * in-order replay the first-arrival keeper is the batch face's
    * min-id batch keeper, so replay equals batch verdict-for-verdict
    * (spec-asserted). Keys here are raw text (cross-engine exactness);
    * the 100 TB form keys both sides on xxhash64(text). */
  def dedupStream(docs: DataFrame, indexPath: String): Dataset[DedupDecision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idx = graft.operators.Dedup.loadDedupIndex(spark, indexPath)
      .select(col("text"), col("keep_id").as("_corpus_keep"))
    docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(idx, Seq("text"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("_corpus_keep"), lit(-1L)).as("corpus_keep"))
      .as[DedupArrival]
      .groupByKey(_.text)
      .transformWithState(new DedupStreamProcessor(),
        TimeMode.None(), OutputMode.Append())
  }

  case class LineArrival(doc_id: Long, idx: Option[Int],
                         line: Option[String], boiler: Option[Long])
  case class LineDedupRow(doc_id: Long, n_lines: Long, n_dropped: Long,
                          n_tokens_kept: Long, out_key: String)

  /** Spark's md5(): lowercase hex over UTF-8 bytes — recomputed here so
    * the processor's driver-free reassembly emits the same out_key the
    * batch face derives with the SQL function. */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private class LineDedupProcessor
    extends StatefulProcessor[Long, LineArrival, LineDedupRow] {

    // Deliberately registers NO state: the per-doc grouping is batch-
    // local (a document's lines arrive together), so the processor
    // reassembles from the batch's rows alone and the state store holds
    // nothing between batches — an ingestion gate must not grow state
    // with corpus size. A plain streaming groupBy/agg here would keep
    // every doc_id's aggregation state forever.
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[LineArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[LineDedupRow] = {
      // buffer bound: lines-per-document (doc tokens / LineTokens), the
      // same grain one batch task holds — never corpus-sized
      val rs = rows.toVector
      val nLines = rs.count(_.idx.isDefined)
      val nDropped = rs.count(r => r.idx.isDefined && r.boiler.isDefined)
      val out = rs.filter(r => r.idx.isDefined && r.boiler.isEmpty)
        .sortBy(_.idx.get).flatMap(_.line).mkString(" ")
      val nKept = out.split(" ").count(_.nonEmpty).toLong
      Iterator.single(LineDedupRow(key, nLines, nDropped, nKept, md5Hex(out)))
    }
  }

  /** Streaming face of [[graft.operators.Dedup.lineDedup]] (x139):
    * line-level boilerplate scrubbing AS ingestion — each arriving
    * document's fixed-width lines check against the FROZEN boilerplate
    * line set ([[graft.operators.Dedup.saveLineIndex]], broadcast:
    * boilerplate is the repeated tail of the line distribution, not
    * the corpus) and the document reassembles from what survives.
    *
    * The reassembly runs in a [[LineDedupProcessor]] that registers NO
    * state — each batch's rows group per doc, emit, and vanish, so the
    * state store is empty between batches (a plain streaming
    * groupBy/agg would retain every doc_id's aggregate forever and
    * silently MERGE a redelivered doc into its old row). Under
    * at-least-once redelivery a doc_id re-arriving in a LATER batch
    * re-emits a fresh, identical row instead — duplicate-visible, never
    * divergent; a doc whose lines straddle a batch boundary emits one
    * partial row per batch (the ingestion contract is doc-atomic
    * arrival, as with the other per-doc faces). Against an index built
    * from the replayed corpus itself, replay equals the batch x139
    * report row-for-row (spec-asserted). */
  def lineDedupStream(docs: DataFrame, indexPath: String,
                      lineTokens: Int = graft.operators.Dedup.LineTokens): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val boiler = graft.operators.Dedup
      .loadLineIndex(spark, indexPath)
      .withColumn("_boiler", lit(1L))
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode_outer(graft.operators.Dedup.lineChunks(col("text"), lineTokens)))
      .toDF("doc_id", "idx", "line")
      .join(broadcast(boiler), Seq("line"), "left")
      .select(col("doc_id"), col("idx"), col("line"),
        col("_boiler").as("boiler"))
      .as[LineArrival]
      .groupByKey(_.doc_id)
      .transformWithState(new LineDedupProcessor(),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  case class EffArrival(doc_id: Long, source: String, k: String,
                        n_tokens: Long)
  case class EffFamilyUpdate(k: String, source: String, fam: Long,
                             n_docs: Long, n_tokens: Long)

  private class EffTokensProcessor
    extends StatefulProcessor[String, EffArrival, EffFamilyUpdate] {
    @transient private var fam: org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private var perSource:
      org.apache.spark.sql.streaming.MapState[String, (Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      fam = getHandle.getValueState[Long]("famSize",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      perSource = getHandle.getMapState[String, (Long, Long)]("perSource",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[EffArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[EffFamilyUpdate] = {
      var k = if (fam.exists()) fam.get() else 0L
      rows.foreach { r =>
        k += 1L
        val (d, t) = if (perSource.containsKey(r.source))
          perSource.getValue(r.source) else (0L, 0L)
        perSource.updateValue(r.source, (d + 1L, t + r.n_tokens))
      }
      fam.update(k)
      // snapshot the WHOLE family, not just the arriving sources: a
      // grown family size k retroactively shrinks every member's 1/k
      // credit, so consumers need fresh rows for the silent sources too
      perSource.iterator().map { p =>
        EffFamilyUpdate(key, p._1, k, p._2._1, p._2._2)
      }
    }
  }

  /** Streaming face of [[graft.operators.Dedup.effectiveTokens]] (x136):
    * dedup-discounted token mass AS ingestion. Documents arrive keyed on
    * their md5 content key (the x44/x106 hashed-family discipline); per
    * key the processor maintains the family size and each source's
    * (docs, tokens) inside the family, and on every arrival emits the
    * family's full per-source snapshot at the NEW size — update-stream
    * semantics, because a grown family retroactively dilutes every
    * member's 1/k credit. A consumer keeps the latest row per
    * (k, source) and folds `tokens · round(1/fam, 6)::DECIMAL(18,6)`
    * per source — after full replay that fold is row-identical to the
    * batch x136 report (spec-asserted). State per distinct content key:
    * one long + |sources-in-family| counters, RocksDB-backed. */
  def effectiveTokensStream(docs: DataFrame): Dataset[EffFamilyUpdate] = {
    import docs.sparkSession.implicits._
    // Null-text rows are dropped EXPLICITLY: the batch face sheds them
    // implicitly (md5(null) keys never match the inner family join),
    // but here a null size(...) would hit EffArrival's non-nullable
    // n_tokens and throw at the encoder — the live face must not be
    // stricter than the batch face it mirrors.
    docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        md5(col("text")).as("k"),
        size(graft.operators.TextAnalysis.wsTokens(col("text"))).cast("long")
          .as("n_tokens"))
      .as[EffArrival]
      .groupByKey(_.k)
      .transformWithState(new EffTokensProcessor(),
        TimeMode.None(), OutputMode.Update())
  }

  case class LpArrival(host: String, nseed: Long, w: Long, hseed: Long)
  case class LpUpdate(host: String, seed: Long, votes_ok: Long,
                      votes_bad: Long, propagated: Long)

  private class LabelPropProcessor
    extends StatefulProcessor[String, LpArrival, LpUpdate] {
    @transient private var votes:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      votes = getHandle.getValueState[(Long, Long)]("votes",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[LpArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[LpUpdate] = {
      var (ok, bad) = if (votes.exists()) votes.get() else (0L, 0L)
      var hseed = -1L
      rows.foreach { r =>
        hseed = r.hseed
        if (r.nseed == 1L) ok += r.w else if (r.nseed == 0L) bad += r.w
      }
      votes.update((ok, bad))
      Iterator.single(LpUpdate(key, hseed, ok, bad,
        if (ok > bad) 1L else if (bad > ok) 0L else hseed))
    }
  }

  /** Streaming face of [[graft.operators.WebPrep.labelPropagation]]
    * (x138): guilt-by-association labeling AS the link stream arrives.
    * Each edge event symmetrizes into two keyed vote updates (self-
    * loops drop), seeds join statically (broadcast — host-label tables
    * are registrable-domain scale), and per-host state is TWO counters;
    * every batch re-emits each touched host's current verdict (update
    * semantics — votes only accumulate, so the majority can flip as
    * links arrive; a consumer keeps the latest row per host). Additive
    * votes make replay order-invariant: after full replay the last
    * emission per host equals the batch x138 row (spec-asserted). */
  def labelPropagationStream(edges: DataFrame, seeds: DataFrame): Dataset[LpUpdate] = {
    import edges.sparkSession.implicits._
    val keyed = edges.filter(col("src_host") =!= col("dst_host"))
    val sym = keyed
      .select(col("src_host").as("host"), col("dst_host").as("nbr"),
        col("n_links").cast("long").as("w"))
      .unionByName(keyed.select(col("dst_host").as("host"),
        col("src_host").as("nbr"), col("n_links").cast("long").as("w")))
    val s = seeds.select(col("host"), col("seed").cast("long").as("seed"))
    sym
      .join(broadcast(s.select(col("host").as("nbr"), col("seed").as("nseed"))),
        Seq("nbr"), "left")
      .join(broadcast(s.select(col("host"), col("seed").as("hseed"))),
        Seq("host"), "left")
      .select(col("host"), coalesce(col("nseed"), lit(-1L)).as("nseed"),
        col("w"), coalesce(col("hseed"), lit(-1L)).as("hseed"))
      .as[LpArrival]
      .groupByKey(_.host)
      .transformWithState(new LabelPropProcessor(),
        TimeMode.None(), OutputMode.Update())
  }

  case class QuotaDoc(doc_id: Long, source: String)
  case class QuotaDecision(doc_id: Long, source: String, rk: Long,
                           kept: Boolean)

  private class SourceQuotaProcessor(cap: Long)
    extends StatefulProcessor[String, QuotaDoc, QuotaDecision] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seenDocs",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[QuotaDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[QuotaDecision] = {
      var n = if (seen.exists()) seen.get() else 0L
      val out = rows.toSeq.sortBy(_.doc_id).map { d =>
        n += 1L
        QuotaDecision(d.doc_id, d.source, n, n <= cap)
      }
      if (out.nonEmpty) seen.update(n)
      out.iterator
    }
  }

  /** Streaming face of [[graft.operators.Sampling.sourceCap]] (x98):
    * per-source quota ADMISSION on an ingestion stream — each arriving
    * document takes the next rank in its source's count and is admitted
    * while the quota lasts. The batch face ranks by md5 priority (a
    * fair draw over a corpus it can see whole); a stream cannot rank
    * what hasn't arrived, so the live form admits in arrival order
    * (doc_id-sorted within a micro-batch for determinism) — the
    * standard first-come quota trade-off, stated rather than hidden.
    * State per source is ONE counter (same shape as
    * [[tokenBudgetStream]]); replay in arrival order is chunking-
    * invariant (spec-asserted). */
  def sourceQuotaStream(docs: DataFrame, cap: Long): Dataset[QuotaDecision] = {
    require(cap > 0, s"sourceQuotaStream: cap=$cap")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), col("source"))
      .as[QuotaDoc]
      .groupByKey(_.source)
      .transformWithState(new SourceQuotaProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }

  /** One exploded gram arrival: mark = 1 known, 0 unseen, -1 the
    * explode_outer sentinel of a doc with no grams at all. */
  case class GramArrival(doc_id: Long, mark: Long)
  case class NoveltyScore(doc_id: Long, n_grams: Long, n_unseen: Long,
                          novelty: Option[Double])

  /** STATELESS per-doc reducer: a document is a single input row, so
    * ALL its exploded grams land in its arrival micro-batch and the
    * scorecard is final there — nothing is stored, so streaming state
    * is ZERO regardless of how long the ingestion stream runs (the
    * groupBy-aggregate form this replaces kept one dead state row per
    * ever-seen doc_id forever). */
  private class NoveltyProcessor
    extends StatefulProcessor[Long, GramArrival, NoveltyScore] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[GramArrival],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[NoveltyScore] = {
      var n = 0L; var unseen = 0L
      rows.foreach { g =>
        if (g.mark >= 0L) { n += 1L; if (g.mark == 0L) unseen += 1L }
      }
      Iterator.single(NoveltyScore(key, n, unseen,
        if (n > 0L) Some(unseen.toDouble / n) else None))
    }
  }

  /** Streaming face of [[graft.operators.TextAnalysis.noveltyAgainst]]
    * (x91): each arriving document is scored against the FROZEN
    * persisted gram index the moment it lands — the live
    * diminishing-returns gate on an ingestion stream (admit /
    * deprioritize a doc by how much of it the corpus already holds).
    * Same gram projection (explode_outer, so a doc with no grams still
    * gets its (0, 0, null) verdict — a gate that loses documents is
    * not a gate), same mark-join, same per-doc scorecard as the batch
    * face, so replay equals batch row-for-row (spec-asserted). The
    * index relation re-executes per micro-batch (stream-static join)
    * as a gram-keyed equi-join — a corpus-scale gram index is NOT
    * broadcastable, unlike x16's eval-set grams. The reducer is the
    * stateless [[NoveltyProcessor]]. */
  def noveltyStream(docs: DataFrame, indexPath: String, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idx = graft.operators.TextAnalysis.loadGramIndex(spark, indexPath)
      .select(col("gram")).withColumn("_known", lit(1L))
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode_outer(graft.operators.Dedup.wordShingles(col("text"), n)).as("gram"))
      .join(idx, Seq("gram"), "left")
      .select(col("doc_id"),
        when(col("gram").isNull, -1L)
          .when(col("_known").isNotNull, 1L).otherwise(0L).as("mark"))
      .as[GramArrival]
      .groupByKey(_.doc_id)
      .transformWithState(new NoveltyProcessor(),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Streaming ANN probe against a FROZEN persisted IVF index
    * ([[graft.operators.Similarity.saveIvfIndex]]), as a
    * `writeStream.foreachBatch` body: each micro-batch of (query_id,
    * qvec) rows runs the SAME pruned probe as the batch path
    * ([[graft.operators.Similarity.ivfTopKPruned]]) — rank the
    * driver-resident KB-scale codebook (reloaded whenever the snapshot
    * SIGNATURE changes — see below), collect the batch's probed centroid ids (bounded
    * by batchSize×nProbe and by nCentroids), and read ONLY those list
    * partitions before the exact-cosine top-k. The result lands in
    * `emit(resultDf, batchId)`.
    *
    * Why foreachBatch and not a stream-static join: the previous
    * incarnation persisted the ENTIRE posting-lists relation and
    * stream-static-joined against it — at 100 TB the lists ARE the
    * corpus embeddings, so the static side's cache was a scale-killer
    * and every micro-batch re-scanned all lists regardless of which
    * centroids the arriving queries probed (r10 VERDICT). A static
    * partition filter can't be dynamic per micro-batch inside one
    * incremental plan, but foreachBatch re-plans per batch, so the
    * probed-centroid pruning the batch path already had applies to
    * every batch read (numFiles spec-gated, like the batch IVF gate).
    * Per-batch cost is O(probed lists), independent of corpus size.
    *
    * Semantics: each query's top-k is computed in the batch its row
    * arrives (queries are single rows by contract, so no cross-batch
    * state is needed — the old UPDATE-mode aggregate kept O(k) state
    * per query forever to support a row split that cannot happen).
    * Replay over any chunking equals batch
    * [[graft.operators.Similarity.ivfTopK]] over the same loaded index
    * cell-for-cell (spec-asserted): identical centroid-ranking kernel,
    * identical tie order (higher sim, then lower id).
    *
    * Snapshot handling: the artifact root is re-resolved through
    * [[graft.core.Artifacts.readablePath]] at EVERY batch (one
    * existence check), so a stream started inside the crash window
    * (root at `<path>.old`) heals the moment the next publish lands
    * instead of reading the by-then-deleted aside forever; the cached
    * codebook is keyed on [[graft.core.Artifacts.snapshotSig]] (which
    * changes on EVERY publish, even when the resolved root does not),
    * so a republish mid-stream switches codebook and lists TOGETHER at
    * a batch boundary (they can never drift within one batch). */
  def annProbeBatch(indexPath: String, k: Int, nProbe: Int)
                   (emit: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    require(k > 0 && nProbe > 0, s"annProbeBatch: k=$k nProbe=$nProbe")
    // The readable root is re-resolved EVERY batch (one FS existence
    // check): a stream started inside the crash window (root at
    // <path>.old) heals when the next publish restores <path>, instead
    // of reading the by-then-deleted aside forever. The KB-scale
    // codebook cache is keyed on the SNAPSHOT SIGNATURE (file listing
    // of the codebook dir), NOT the root path: a normal mid-stream
    // republish leaves the root unchanged (readablePath returns `path`
    // whenever it exists), so a path-keyed cache would rank with stale
    // centroids against freshly re-read new lists — codebook/lists
    // drift. Every publishAtomic writes new codebook files, so the
    // signature changes on every publish and the reload fires exactly
    // when it must; codebook and lists still switch together at a
    // batch boundary.
    var loaded: (String, Array[(Int, Array[Float])]) = null
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val root = graft.core.Artifacts.readablePath(spark, indexPath)
      val sig = graft.core.Artifacts.snapshotSig(spark, s"$root/codebook")
      if (loaded == null || loaded._1 != sig) {
        loaded = (sig,
          graft.operators.Similarity.loadCodebook(spark, s"$root/codebook"))
      }
      val cents = loaded._2
      val listsPath = s"$root/lists"
      emit(graft.operators.Similarity.ivfTopKPruned(
        spark, listsPath, cents, batch, k, nProbe), batchId)
    }
  }

  // ---------- streaming bipartite SemDeDup probe (x170's face) -------

  /** Streaming face of
    * [[graft.operators.Similarity.semProbeAgainst]] (x170): each
    * arriving candidate vector assigns against the FROZEN reference
    * codebook ([[graft.operators.Similarity.saveSemRefIndex]]'s KB
    * artifact, compiled into one stateless literal-centroid map — the
    * pcaProjectionStream discipline) and takes its semantic-duplicate
    * verdict from a stream-static LEFT join to the centroid-partitioned
    * reference lists plus one UPDATE-mode per-candidate aggregate (the
    * leakageProbeStream shape; state bounded by in-flight candidates,
    * never the reference). The live "is this delivery paraphrasing what
    * we already have" gate — replay equals batch x170 row-for-row over
    * the same index (spec-asserted). */
  def semProbeStream(emb: DataFrame, indexPath: String,
                     tau: Double = graft.operators.Similarity.SemDedupTau)
      : DataFrame =
    graft.operators.Similarity.semProbeAgainst(emb, indexPath, tau)

  // ------------- streaming upset monitor (x172's face) ---------------

  /** Streaming face of
    * [[graft.operators.Analytics.btUpsetsAgainst]] (x172): arriving
    * comparisons score against the FROZEN Bradley-Terry ladder
    * ([[graft.operators.Analytics.saveBtStrengths]]'s |items|-row
    * artifact) — expected win probability + upset flag, the live
    * rater-drift/variant-upset monitor an RLHF comparison pipeline
    * keeps on its published ladder. Stateless: two broadcast-sized
    * stream-static joins and a projection (the nbGateStream frozen-
    * model discipline). Same-data replay equals batch x172 row-for-row
    * (spec-asserted). */
  def btUpsetStream(comparisons: DataFrame, strengthsPath: String): DataFrame = {
    val spark = comparisons.sparkSession
    val root = graft.core.Artifacts.readablePath(spark, strengthsPath)
    graft.operators.Analytics.btUpsetsAgainst(comparisons,
      spark.read.parquet(s"$root/strengths"))
  }

  // ------------- streaming acceptance gate (x176's face) -------------

  /** Streaming face of
    * [[graft.operators.Dedup.acceptanceGateIndexed]] (x176): each
    * arriving document (doc_id, lang, text, embedding) is judged
    * against the FROZEN acceptance index
    * ([[graft.operators.Dedup.saveAcceptanceIndex]]'s one-publish
    * battery: exact texts + gram postings + semantic lists) and emits
    * the same (exact_ref, n_surface, n_sem, verdict) row batch x176
    * produces — the complete "do we already have this" gate at the
    * ingestion edge.
    *
    * Shape: foreachBatch (the annProbeBatch precedent), NOT one
    * incremental plan — the gate joins three INDEPENDENT aggregates
    * (surface counts, semantic counts, exact lookups), which
    * Structured Streaming cannot fuse into a single incremental
    * query; and because every verdict is a pure per-document function
    * of (doc, frozen index), per-batch evaluation IS batch semantics
    * — no cross-batch state exists to lose. Replay over any chunking
    * equals batch x176 row-for-row (spec-asserted). The index root is
    * re-resolved per batch (readablePath inside
    * acceptanceGateIndexed), so a stream started inside a publish
    * crash window heals at the next batch. */
  def acceptanceGateBatch(indexPath: String, maxDf: Int = 20,
                          tau: Double = graft.operators.Similarity.SemDedupTau)
                         (emit: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      emit(graft.operators.Dedup.acceptanceGateIndexed(batch, indexPath,
        maxDf = maxDf, tau = tau), batchId)

  // ------------- streaming drift monitor (x178's face) ---------------

  /** Streaming face of
    * [[graft.operators.Similarity.semIndexDriftCheck]] (x178): arriving
    * vectors assign against the index's FROZEN codebook (stateless
    * literal-centroid map) and fold into the per-cluster occupancy
    * aggregate — ONE incremental COMPLETE-mode count on k keys, the
    * live side of the rebuild-trigger PSI. The smoothing/PSI/verdict
    * summary is a second aggregation layer over this k-row table plus
    * the frozen reference occupancy, so it stays a batch-side read
    * (the calibrationStream discipline — x178's audit face). Replay
    * equals the batch recent-side histogram row-for-row
    * (spec-asserted). */
  def semDriftStream(emb: DataFrame, indexPath: String): DataFrame =
    graft.operators.Similarity.semRecentCounts(emb, indexPath)

  // ------------- streaming calibration monitor (x177's face) ---------

  /** Streaming face of
    * [[graft.operators.Analytics.calibrationBins]] (x177): arriving
    * (conf, correct) predictions fold into the per-bin reliability
    * aggregate — the live calibration monitor a reward-model serving
    * path keeps (a drifting confidence distribution shows up as bin
    * gaps long before an offline audit). One incremental aggregate on
    * |bins| keys (COMPLETE mode; the ECE summary row is a second
    * aggregation layer, so it stays a batch-side read of this table —
    * x177's audit face). Replay equals the batch per-bin table
    * row-for-row (spec-asserted). */
  def calibrationStream(preds: DataFrame,
                        bins: Int = graft.operators.Analytics.CalibBins)
      : DataFrame =
    graft.operators.Analytics.calibrationBins(preds, bins)

  // ----------- streaming per-source scorecard (x168's face) ----------

  /** Streaming face of
    * [[graft.operators.TextAnalysis.sourceScorecard]] (x168): the fused
    * x163 panel projection runs statelessly on each arriving document
    * and folds into the per-source COMPLETE-mode aggregate — the live
    * curation dashboard (counts and sums are running-aggregable; the
    * one ratio is computed FROM the sums at emit, so the streaming
    * state is exactly the batch aggregate's). State is |sources| rows.
    * Replay equals batch x168 row-for-row (spec-asserted). */
  def sourceScorecardStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.sourceScorecard(docs)
}
