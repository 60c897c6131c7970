package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Skew mitigation for shuffle joins.
  *
  * First line of defense is AQE's runtime skew-join splitting (enabled in
  * GraftSession). Salting is the explicit fallback for cases AQE cannot
  * fix — e.g. one logical key holding >spill-size rows in a shuffled hash
  * join, or skew on an aggregation key.
  *
  * `saltedJoin` implements the classic scheme: the large side gets a
  * deterministic salt derived from non-key columns; the small side is
  * exploded `saltFactor` times so every (key, salt) pair still matches.
  * Deterministic (hash-based, no rand()) so results are reproducible and
  * oracle-friendly.
  */
object SkewTools {

  /** Salt column for the large side: stable hash of `entropy` columns
    * (any columns that vary within a key) mod saltFactor. */
  def saltCol(saltFactor: Int, entropy: Column*): Column =
    pmod(xxhash64(entropy: _*), lit(saltFactor.toLong)).cast("int")

  /** Inner/left equi-join of a skewed large side against a smaller side,
    * fanning the hot keys across `saltFactor` shuffle partitions.
    * `entropy` must be large-side columns that vary within a join key. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, entropy: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would emit saltFactor copies of every unmatched
    // small-side row (it was exploded) — reject rather than corrupt.
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedLarge = large.withColumn("_salt",
      saltCol(saltFactor, entropy.map(large(_)): _*))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase (salted partial, then final) aggregation for skewed group
    * keys: groupBy(key, salt) partial-aggregates, then groupBy(key)
    * merges. Caller supplies both aggregation stages. */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int, entropy: Seq[String])(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame)(
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(saltFactor, entropy.map(df(_)): _*))
    val part = partial(salted.groupBy(col(key), col("_salt")))
    merge(part.groupBy(col(key)))
  }

  /** x38: the salted join's oracle-checked face — lineitem against part
    * on partkey at salt factor 8, result-identical to the plain join (the
    * oracle IS the plain join SQL; salting must never change the result
    * set, only how the hot keys spread across shuffle partitions). */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").as("partkey"))
    val dim = Tables.load(spark, dir, "part")
      .select(col("p_partkey").as("partkey"), col("p_brand"))
    saltedJoin(fact, dim, "partkey", saltFactor = 8,
        entropy = Seq("l_orderkey", "l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("partkey"), col("p_brand"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  // --------------------------------------------- skew profiler (x131)

  /** x131: JOIN-KEY SKEW PROFILE — the measurement that DECIDES when
    * [[saltedJoin]] (x38) or AQE skew splitting is worth its overhead:
    * per candidate key column, the distinct-key count, row count, the
    * heaviest key's frequency, exact frequency percentiles, and the
    * skew ratio max/mean. A ratio near 1 means salting only adds
    * shuffle width; a ratio of 10³ means one task owns the stage.
    *
    * Determinism: counts are exact; p50/p99 follow the x28 discipline
    * (exact interpolated percentile through DECIMAL(18,4), emitted
    * DOUBLE); skew is max_c·n_keys/n_rows as three exact-int→double
    * conversions in an identical tree, round 6.
    *
    * Shape per profiled key: one (key) hash agg (map-side partials),
    * then a 1-row rollup of the |keys|-grain counts — the profile
    * costs one shuffle of key cardinality, nothing more. */
  def keySkewProfile(df: DataFrame, keyCol: String,
                     label: String): DataFrame = {
    import graft.core.Determinism.{dec, decOut}
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_c"),
        decOut(dec(percentile(col("c"), lit(0.5)))).as("p50_c"),
        decOut(dec(percentile(col("c"), lit(0.99)))).as("p99_c"))
      .select(lit(label).as("key_name"), col("n_keys"), col("n_rows"),
        col("max_c"), col("p50_c"), col("p99_c"),
        round(col("max_c").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"), 6).as("skew"))
  }

  /** The x131 queries() face: the two join keys the relational suite
    * actually shuffles on — lineitem.l_orderkey (near-uniform) and
    * orders.o_custkey (mild natural skew). */
  def skewProfileQuery(spark: SparkSession, dir: String): DataFrame =
    keySkewProfile(Tables.load(spark, dir, "lineitem"), "l_orderkey",
        "lineitem.l_orderkey")
      .unionByName(keySkewProfile(Tables.load(spark, dir, "orders"),
        "o_custkey", "orders.o_custkey"))
      .orderBy(col("key_name"))
}
