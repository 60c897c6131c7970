package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Mergeable sketch aggregates — the pattern that makes 100 TB
  * cardinality/frequency questions cheap: sketch once per
  * partition/day/group (one scan of the raw data, ever), then answer
  * rollups by MERGING kilobyte-sized sketches instead of re-scanning.
  * Spark's Datasketches-backed HLL functions do exactly this:
  * `hll_sketch_agg` builds, `hll_union_agg` merges, estimates are
  * deterministic for a fixed lgK (no RNG), so sketch tables are stable,
  * reusable artifacts.
  *
  * The estimates are engine-specific (DuckDB's approx sketch differs),
  * so the query is rows-only at the driver's gate; accuracy and
  * mergeability (partition-invariance, union == direct-sketch) are
  * asserted in ScalaTest.
  */
object Sketches {

  /** log2 of HLL register count; 12 → 4 Ki registers ≈ 1.6% rsd. */
  val LgK = 12

  /** Two-level distinct rollup on lineitem: per-returnflag sketches of
    * l_partkey plus a TOTAL row, all in ONE scan via `rollup` grouping
    * sets (Expand feeds each row to both grouping sets; the union-form
    * alternative — branch per level off one aggregate — re-scans the
    * raw table per level, because Catalyst does not dedupe a
    * twice-referenced aggregate subtree). Sketch-UNION mergeability
    * (`hll_union_agg`, the rollup-a-persisted-sketch-table face) is
    * spec-asserted separately, and the estimates' error vs exact counts
    * is asserted in ExtrasSpec against independently-computed truth —
    * the query itself carries NO exact distinct: pairing the sketch
    * with a count_distinct would shuffle a deduplicated key stream per
    * grouping set (measured 1.9x the whole query at sf0.1), which is
    * precisely the cost the sketch exists to avoid. */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), LgK).as("sk"),
        grouping(col("l_returnflag")).as("g"))
      .select(
        when(col("g") === 1, lit("TOTAL")).otherwise(col("l_returnflag")).as("grp"),
        hll_sketch_estimate(col("sk")).as("approx_distinct"))
      .orderBy(col("grp"))
  }

  def hllRollupQuery(spark: SparkSession, dir: String): DataFrame =
    hllRollup(spark, dir)

  /** Two-level QUANTILE rollup on lineitem via KLL sketches — the
    * percentile counterpart of [[hllRollup]]: per-returnflag sketches of
    * l_extendedprice plus a TOTAL row, all in ONE scan via `rollup`
    * grouping sets (see hllRollup for why the union-the-branches form
    * scans twice). Sketch-UNION mergeability (`kll_union_agg`, the
    * rollup-a-persisted-sketch-table face) is spec-asserted separately.
    * The exact absorbed count (getN, deterministic) rides along; the
    * p50/p95 estimates are rows-only at the driver's gate (KLL
    * compaction is randomized) with accuracy asserted in ExtrasSpec. */
  def kllRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.KllFunctions._
    val li = Tables.load(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"))
      .agg(kllSketchAgg(col("l_extendedprice").cast("double")).as("sk"),
        grouping(col("l_returnflag")).as("g"))
      .select(
        when(col("g") === 1, lit("TOTAL")).otherwise(col("l_returnflag")).as("grp"),
        kllCount(col("sk")).as("n"),
        kllQuantile(col("sk"), lit(0.5)).as("p50"),
        kllQuantile(col("sk"), lit(0.95)).as("p95"))
      .orderBy(col("grp"))
  }

  def kllRollupQuery(spark: SparkSession, dir: String): DataFrame =
    kllRollup(spark, dir)

  /** Count-min frequency sketch of a column, as the raw mergeable binary
    * (decode with org.apache.spark.util.sketch.CountMinSketch.readFrom).
    * Deterministic for a fixed seed. */
  def countMin(df: DataFrame, column: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): DataFrame =
    df.agg(count_min_sketch(col(column), lit(eps), lit(confidence),
      lit(seed)).as("cms"))
}
