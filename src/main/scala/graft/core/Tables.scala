package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided parquet corpus (TESTDATA.md).
  *
  * Each table is one parquet file under an sf directory. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning; nothing is
  * cached here — callers decide lifetime.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has arrived in three vintages; normalize ALL of them to
    // session-zone TimestampType at this boundary so every downstream
    // operator (unix_micros, window ranges, tumbling windows) sees one
    // type. Branch on the READ type, never on an assumed vintage — a
    // hardcoded nanos path zeroed an entire correctness round when the
    // corpus changed under us.
    //  - TIMESTAMP(NANOS): rejected by the vectorized reader
    //    (PARQUET_TYPE_ILLEGAL) unless GraftSession's
    //    spark.sql.legacy.parquet.nanosAsLong surfaces it as LONG nanos;
    //    converted via a lossless `div 1000` (the corpus has zero
    //    sub-microsecond components, verified vs DuckDB).
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as TIMESTAMP_NTZ;
    //    cast to TIMESTAMP. The session zone is UTC (GraftSession), so the
    //    cast reinterprets the naive instant as UTC — exactly how DuckDB's
    //    naive TIMESTAMP treats it, keeping the oracle comparison exact.
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=true): already TimestampType,
    //    untouched.
    // The nanosAsLong conf is NOT (re)set here: a session-global write per
    // table load would race any concurrently-planning query, and every
    // supported entry point builds its session through GraftSession.
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema.fieldNames.contains("ts"))
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  /** Register every table as a temp view (for spark.sql surface).
    *
    * Failures are isolated per table: one unreadable/mis-schema'd file must
    * never prevent the other nine views from registering (a single eager
    * analysis failure here once zeroed a whole round's correctness signal).
    * Returns the names that failed, with the error, so callers can report
    * rather than swallow.
    */
  def registerAll(spark: SparkSession, sfDir: String): Seq[(String, Throwable)] =
    all.flatMap { n =>
      try { load(spark, sfDir, n).createOrReplaceTempView(n); None }
      catch { case e: Throwable =>
        System.err.println(s"[tables] register '$n' failed: ${e.getMessage}")
        Some(n -> e)
      }
    }
}
