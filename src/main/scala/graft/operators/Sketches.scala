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

  /** x54's heaviness denominator (upper_bound >= stream_weight/share). */
  val FreqShare = 400

  /** Frequent-bigram rollup via mergeable frequent-items sketches — the
    * FREQUENCY member of the sketch family ([[hllRollup]] = distinct,
    * [[kllRollup]] = quantiles): per-language sketches plus a TOTAL
    * row, ONE scan via grouping sets, then each group's heavy bigrams
    * with guaranteed error bounds (NO_FALSE_NEGATIVES: every truly
    * heavy item is present; lower <= true <= upper per item). The
    * mergeable face of x47's exact Misra-Gries recount, for when a
    * second pass over the raw stream is too expensive — e.g. rolling
    * per-day sketch tables up to any ad-hoc grain. Estimates are
    * merge-order-dependent (purge timing), so rows-only at the gate;
    * the bound guarantees are spec-asserted against exact truth. */
  def freqRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.FreqFunctions._
    val docs = Tables.load(spark, dir, "documents")
    val bigrams = docs.select(col("lang"),
      explode(graft.operators.Dedup.wordShinglesAll(col("text"), 2)).as("item"))
    bigrams.rollup(col("lang"))
      .agg(freqSketchAgg(col("item")).as("sk"),
        grouping(col("lang")).as("g"))
      .select(
        when(col("g") === 1, lit("TOTAL")).otherwise(col("lang")).as("grp"),
        freqStreamWeight(col("sk")).as("n"), col("sk"))
      .select(col("grp"), col("n"),
        explode(freqTopItems(col("sk"),
          (col("n") / lit(FreqShare)).cast("long"))).as("t"))
      .select(col("grp"), col("n"), col("t.item").as("item"),
        col("t.estimate").as("estimate"),
        col("t.lower_bound").as("lower_bound"),
        col("t.upper_bound").as("upper_bound"))
      .orderBy(col("grp"), col("estimate").desc, col("item"))
  }

  def freqRollupQuery(spark: SparkSession, dir: String): DataFrame =
    freqRollup(spark, dir)

  /** Count-min frequency sketch of a column, as the raw mergeable binary
    * (decode with org.apache.spark.util.sketch.CountMinSketch.readFrom).
    * Deterministic for a fixed seed. */
  def countMin(df: DataFrame, column: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): DataFrame =
    df.agg(count_min_sketch(col(column), lit(eps), lit(confidence),
      lit(seed)).as("cms"))
}
