package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
