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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects (PARQUET_TYPE_ILLEGAL). GraftSession's builder sets
    // spark.sql.legacy.parquet.nanosAsLong so the column surfaces as LONG
    // nanos, converted here; the corpus has zero sub-microsecond components
    // (verified vs DuckDB, which also surfaces the column at microsecond
    // precision), so `div 1000` is lossless and oracle-equivalent. The conf
    // is NOT (re)set here: a session-global write per table load would race
    // any concurrently-planning query, and every supported entry point
    // builds its session through GraftSession.
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for spark.sql surface). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
