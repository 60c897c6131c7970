package graft

import graft.core.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Each query is fully materialized via a noop-format write of its final
  * (ordered) result. A session-warmup query runs first so JVM/codegen
  * startup is not billed to the first benchmark entry.
  *
  * Self-attestation against machine contention: committed BENCH records
  * in earlier rounds misstated the engine by 30-45x because other
  * processes were saturating the machine while the bench ran. Each
  * query now carries its own evidence of measurement conditions:
  *
  *  - a fixed CPU-bound calibration job (32-partition range-sum sized to
  *    ~100ms on a quiet machine) runs immediately before every query
  *    attempt; its time is a direct probe of executor-thread
  *    availability at that moment;
  *  - /proc/loadavg is sampled at each query's start and end;
  *  - a query attempt whose calibration exceeds [[Bench.ContendedFactor]]x
  *    the session-start baseline is treated as poisoned and retried (up
  *    to [[Bench.MaxAttempts]] total attempts, with a short sleep so a
  *    transient spike can pass); the reported time is the min over all
  *    attempts, and queries whose BEST attempt was still contended are
  *    listed in a "contended" field so a reader knows exactly which
  *    entries not to trust.
  */
object Bench {
  /** Attempts whose calibration exceeds baseline by this factor are
    * considered contention-poisoned and retried.
    */
  val ContendedFactor = 3.0

  /** Max (cold+warm) attempt pairs per query before giving up and
    * reporting the best observed time flagged as contended.
    */
  val MaxAttempts = 3

  /** First field of /proc/loadavg (1-minute load average), or -1 when
    * unreadable (non-Linux). Parsing isolated for the spec.
    */
  def parseLoadAvg(content: String): Double =
    content.trim.split("\\s+").headOption.flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(-1.0)

  def readLoadAvg(): Double =
    try parseLoadAvg(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/loadavg"))))
    catch { case _: Throwable => -1.0 }

  /** Retry decision: attempt `n` (1-based) ran with calibration `calib`
    * against `baseline`; retry while poisoned and attempts remain.
    */
  def shouldRetry(calib: Double, baseline: Double, attempt: Int): Boolean =
    calib > baseline * ContendedFactor && attempt < MaxAttempts

  /** Fixed CPU-bound probe: one task per local core, arithmetic-only so
    * its runtime tracks available CPU, not I/O. Returns elapsed seconds.
    */
  def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // Bounded operands: ANSI mode is on and sum(id*id) over 64M ids
    // overflows long.
    spark.range(0, 64L * 1000 * 1000, 1, 32).selectExpr("sum((id % 97) * (id % 89))").collect()
    (System.nanoTime() - t0) / 1e9
  }

  private def jsonMap(entries: Seq[(String, String)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")

    // Warm up session, codegen, file listing, and parquet footers outside
    // the timed region (otherwise the alphabetically-first query absorbs
    // every one-time cost).
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.core.Tables.all.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    // Baseline calibration: min of 5 probes at session start. min (not
    // mean) because the baseline should capture the machine's capability,
    // and any single probe can only be slowed down by interference.
    val baseline = (1 to 5).map(_ => calibrate(spark)).min
    val loadStart = readLoadAvg()

    def run(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink: full materialization of every output column — count()
      // would let Catalyst prune expensive projections out of the plan.
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    final case class QueryResult(
        name: String,
        warm: Double,     // min over all attempts (cold and warm runs)
        cold: Double,     // first attempt's first run
        calib: Double,    // best (lowest) calibration across attempts
        attempts: Int,
        load: (Double, Double), // loadavg at query start / end
        contended: Boolean)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val l0 = readLoadAvg()
        var attempt = 0
        var bestTime = Double.MaxValue
        var bestCalib = Double.MaxValue
        var firstCold = -1.0
        var retry = true
        while (retry) {
          attempt += 1
          val calib = calibrate(spark)
          val cold = run(fn)
          val warm = run(fn)
          if (firstCold < 0) firstCold = cold
          bestTime = math.min(bestTime, math.min(cold, warm))
          bestCalib = math.min(bestCalib, calib)
          retry = shouldRetry(calib, baseline, attempt)
          if (retry) Thread.sleep(3000) // let a transient spike pass
        }
        QueryResult(name, bestTime, firstCold, bestCalib, attempt, (l0, readLoadAvg()),
          contended = bestCalib > baseline * ContendedFactor)
      } catch {
        // Failures are reported as -1 so the driver can tell them from a
        // fast success.
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          QueryResult(name, -1.0, -1.0, -1.0, 1, (-1.0, -1.0), contended = false)
      }
    }

    // Locale.ROOT: the f"" interpolator is locale-sensitive, and a
    // comma decimal separator (de_DE etc.) would corrupt the JSON line.
    def fmt(d: Double): String =
      if (d == d) String.format(java.util.Locale.ROOT, "%.4f", Double.box(d)) else "-1"
    val qs = jsonMap(results.map(r => r.name -> fmt(r.warm)))
    val colds = jsonMap(results.map(r => r.name -> fmt(r.cold)))
    val calibs = jsonMap(results.map(r => r.name -> fmt(r.calib)))
    val attempts = jsonMap(results.map(r => r.name -> r.attempts.toString))
    val loads = jsonMap(results.map(r => r.name -> s"[${fmt(r.load._1)},${fmt(r.load._2)}]"))
    val contended = results.filter(_.contended).map("\"" + _.name + "\"").mkString("[", ",", "]")
    val total = results.map(_.warm).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_cold":$colds,""" +
      s""""calib_baseline":${fmt(baseline)},"queries_calib":$calibs,"queries_attempts":$attempts,""" +
      s""""queries_load":$loads,"contended":$contended,"loadavg_start":${fmt(loadStart)},""" +
      s""""loadavg_end":${fmt(readLoadAvg())},"sf":"$sfDir"}""")
    spark.stop()
  }
}
