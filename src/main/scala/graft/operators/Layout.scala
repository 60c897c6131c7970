package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-layout management: multi-dimensional (Z-order) clustering of a
  * table's files so that selective scans on ANY clustered dimension skip
  * most files via parquet min/max statistics.
  *
  * A single `sortBy(a)` layout prunes filters on `a` but leaves `b`
  * uniformly smeared across every file; interleaving the bit patterns of
  * both dimensions' bucket ordinals (the Morton curve) gives every file
  * a small rectangle of (a, b) space, so `a = x` prunes AND `b = y`
  * prunes. At 100 TB this is the difference between "read the whole
  * table for any filter not on the sort key" and "read a handful of
  * files for either predicate" — the same mechanism as a lakehouse
  * OPTIMIZE ZORDER, built from `width_bucket` ordinals + a native
  * interleave expression + `repartitionByRange`.
  *
  * The whole pipeline is shuffle-free until the final range partition:
  * one tiny min/max aggregate (4 scalars to the driver), then per-row
  * codegen'd bucket + interleave — no window function, no sort until
  * the clustered write itself.
  */
object Layout {

  /** Bits per dimension; 2 dims x 12 bits fit comfortably in the long. */
  val DefaultBits = 12

  /** Z-curve value for two numeric-castable columns: uniform
    * `width_bucket` ordinals in [0, 2^bits), bits interleaved. Adds a
    * `_z` column. Uniform bucketing keeps everything codegen'd; heavily
    * skewed dimensions can be pre-transformed (log, rank) by the caller. */
  def zValue(df: DataFrame, a: Column, b: Column,
             bits: Int = DefaultBits): DataFrame = {
    require(!df.columns.contains("_z"),
      "zValue reserves the column name _z; rename the input's _z column first")
    val n = 1 << bits
    // single KB-scale action: the four range endpoints
    val r = df.agg(min(a).cast("double"), max(a).cast("double"),
      min(b).cast("double"), max(b).cast("double")).head()
    // empty input or an all-null dimension: no range to bucket — degrade
    // to a constant curve value instead of NPE-ing on the null endpoint
    if (r.isNullAt(0) || r.isNullAt(2))
      return df.withColumn("_z", lit(0L))
    def bucket(c: Column, lo: Double, hi: Double): Column =
      if (lo == hi) lit(0)
      // width_bucket: 0 below lo, n+1 above hi, else 1..n — shift and
      // clamp to [0, n)
      else least(greatest(width_bucket(c.cast("double"), lit(lo), lit(hi),
        lit(n)) - 1, lit(0)), lit(n - 1)).cast("int")
    df.withColumn("_z", graft.functions.expressions.NativeExpressions
      .interleaveBits(
        bucket(a, r.getDouble(0), r.getDouble(1)),
        bucket(b, r.getDouble(2), r.getDouble(3)), bits))
  }

  /** Rewrite `df` as `numFiles` parquet files clustered on the Z-curve
    * of (a, b): range-partition on the curve value (each file gets one
    * contiguous curve segment = one small rectangle of the key space),
    * sort within partitions so row-group stats are tight, drop the
    * helper column at write. */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
                  numFiles: Int, bits: Int = DefaultBits): Unit =
    zValue(df, a, b, bits)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  // ------------------------------------------- bucketed layout (joins)

  /** Bucketed + bucket-sorted table layout for a RECURRING equi-join:
    * write both sides hash-bucketed on their join keys with the same
    * bucket count, and every later join (or aggregation) on that key
    * plans with ZERO Exchange — the shuffle is paid once at write time
    * and amortized over every subsequent query. At 100 TB this is the
    * difference between re-shuffling the fact table nightly and a
    * straight merge of pre-aligned files; it composes with
    * [[zorderWrite]] (bucket on the join key, Z-order within buckets on
    * the filter columns). The sortBy lets Spark's scan report
    * per-bucket order, eliminating the merge-join sort too when each
    * bucket holds one file. Plan shape is gated in PlanSpec: a
    * bucketed-bucketed join with broadcast disabled contains no
    * ShuffleExchange (and the groupBy on the same key reuses the
    * partitioning). */
  def bucketWrite(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  // -------------------------------------------------- zone map (x77)

  /** Grid resolution for the oracle-checked zone map: 2^ZmBits buckets
    * per dimension, so the curve value spans [0, 4^ZmBits). */
  val ZmBits = 8

  /** Right-shift turning a curve value into its zone id — 2*ZmBits − 6
    * keeps 64 zones (one "file" per zone in the layout story). */
  val ZmShift = 2 * ZmBits - 6

  /** Bucket ordinal with EXPLICIT arithmetic instead of `width_bucket`
    * — `floor((v − lo) · 2^bits / (hi − lo))` clamped to [0, 2^bits) —
    * so a DuckDB twin can reproduce it bit-for-bit: subtraction,
    * multiply by a power of two, one division and floor are all IEEE
    * correctly-rounded, whereas the two engines' `width_bucket`s are
    * free to associate the scale factor differently and disagree by an
    * ulp at a bucket edge. `v = hi` lands on exactly 2^bits (the
    * power-of-two multiply is exact, so x·2^bits / x rounds to 2^bits)
    * and is clamped — deterministically — into the top bucket. */
  private def exactBucket(c: Column, lo: Double, span: Double): Column = {
    val n = (1L << ZmBits).toDouble
    if (span == 0d) lit(0L)
    else least(lit((1L << ZmBits) - 1),
      greatest(lit(0L), floor(((c.cast("double") - lit(lo)) * lit(n)) / lit(span))))
  }

  /** x77: the ZONE MAP of the events table laid out on the Z-curve of
    * (user_id, value) — per zone: row count and the min/max of BOTH
    * dimensions. This is the data-skipping contract made inspectable:
    * after [[zorderWrite]] each file owns one contiguous curve segment
    * = one small rectangle of (a, b) space, and THIS query computes
    * exactly the per-file min/max statistics a parquet reader prunes
    * with. Tight rectangles on both dimensions (spec-asserted: a point
    * predicate on EITHER dimension touches a small fraction of zones)
    * are what turn "read 100 TB for any filter off the sort key" into
    * "read a handful of files for either predicate".
    *
    * Scale shape: one 4-scalar range aggregate to the driver, then a
    * single map-side bucket+interleave (codegen'd native expression)
    * and one 64-group aggregate — no sort, no window, one shuffle of
    * 64×5 scalars. Deterministic cross-engine by construction: integer
    * interleave over [[exactBucket]] ordinals; min/max emit stored
    * values untouched. */
  def zonemapQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull)
    val r = ev.agg(min(col("user_id")).cast("long"), max(col("user_id")).cast("long"),
      min(col("value")).cast("double"), max(col("value")).cast("double")).head()
    if (r.isNullAt(0)) // empty input: no zones
      return ev.groupBy(lit(0L).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
        .orderBy(col("zbucket"))
    val (loU, hiU) = (r.getLong(0), r.getLong(1))
    val (loV, hiV) = (r.getDouble(2), r.getDouble(3))
    val z = graft.functions.expressions.NativeExpressions.interleaveBits(
      exactBucket(col("user_id"), loU.toDouble, (hiU - loU).toDouble).cast("int"),
      exactBucket(col("value"), loV, hiV - loV).cast("int"), ZmBits)
    ev.withColumn("zbucket", shiftright(z, ZmShift))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy(col("zbucket"))
  }
}
