package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Fuzzy record linkage: join two tables on a string key under a
  * Levenshtein edit-distance threshold — without the all-pairs cross
  * join that kills at scale.
  *
  * Blocking is the deletion neighborhood (the SymSpell guarantee): if
  * `ed(s, r) <= t` then deleting at most `t` characters from each side
  * reaches a COMMON string, so exploding each side's deletion variants
  * and equi-joining on the variant is a sound candidate generator — no
  * pair within the threshold is missed (the brute-force DuckDB oracle
  * checks exactly this), and candidates then verify with the banded
  * exact `levenshtein(l, r, threshold)`.
  *
  * Scale shape: explode (O(m^t) variants per row for key length m —
  * ~80 for t=2 on a 12-char key) → shuffle on the variant string →
  * equi-join → distinct pairs → exact verify on candidates only. Both
  * sides stay narrow (key + carried columns); variant hot spots are
  * bounded by key popularity, not corpus size. For a small clean side
  * (a reference vocabulary), broadcast it after its explode and the big
  * side never shuffles at all.
  */
object Linkage {

  /** All strings reachable from `s` by deleting at most `maxDeletes`
    * characters (including `s` itself), distinct. Pure higher-order
    * expressions — codegen-friendly, no UDF. `maxDeletes` 1 or 2 (the
    * useful thresholds; the variant count is O(m^t)). */
  def deletionVariants(s: Column, maxDeletes: Int): Column = {
    require(maxDeletes == 1 || maxDeletes == 2,
      s"deletionVariants: maxDeletes=$maxDeletes (supported: 1, 2)")
    val m = length(s)
    val none = array().cast("array<string>")
    // delete position i (0-based): prefix [1..i] ++ suffix [i+2..]
    val del1 = when(m >= 1,
      transform(sequence(lit(0), m - 1), i =>
        concat(s.substr(lit(1), i), s.substr(i + 2, m)))).otherwise(none)
    val del2 =
      if (maxDeletes < 2) none
      else when(m >= 2,
        flatten(transform(sequence(lit(0), m - 2), i =>
          transform(sequence(i + 1, m - 1), j =>
            concat(s.substr(lit(1), i),
              s.substr(i + 2, j - i - 1),
              s.substr(j + 2, m)))))).otherwise(none)
    array_distinct(concat(array(s), del1, del2))
  }

  /** Join `left` and `right` where `levenshtein(leftKey, rightKey) <=
    * maxDist`, keeping all columns of both sides plus the distance as
    * `dist`. Column names must be disjoint across the two frames.
    *
    * BAG semantics, like the cross join it replaces: duplicate input
    * rows each produce their own output row. Candidates are deduped per
    * distinct (left row, right row) VALUE pair (a pair sharing several
    * deletion variants must still match once), so each side is first
    * collapsed to distinct rows with a multiplicity count and the
    * product multiplicity is re-expanded after the verify — exact bag
    * equivalence, deterministic under retries (no row ids involved). */
  def fuzzyJoin(left: DataFrame, leftKey: String,
                right: DataFrame, rightKey: String, maxDist: Int): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"fuzzyJoin: overlapping columns $overlap")
    val lcols = left.columns.toSeq
    val rcols = right.columns.toSeq
    val lg = left.groupBy(lcols.map(col): _*).agg(count(lit(1)).as("_fz_lc"))
    val rg = right.groupBy(rcols.map(col): _*).agg(count(lit(1)).as("_fz_rc"))
    val lv = lg.withColumn("_fz_v", explode(deletionVariants(col(leftKey), maxDist)))
    val rv = rg.withColumn("_fz_v", explode(deletionVariants(col(rightKey), maxDist)))
    lv.join(rv, "_fz_v")
      .drop("_fz_v")
      // rows are distinct per side here, so this is exactly one
      // candidate per (left row, right row) pair
      .dropDuplicates(lcols ++ rcols)
      .withColumn("dist", levenshtein(col(leftKey), col(rightKey), maxDist))
      .filter(col("dist") >= 0) // banded levenshtein: -1 = over threshold
      .withColumn("_fz_i", explode(sequence(lit(1L), col("_fz_lc") * col("_fz_rc"))))
      .drop("_fz_lc", "_fz_rc", "_fz_i")
  }

  /** Deterministic typo'd probes for [[fuzzyQuery]] (x25), shared with
    * the oracle generator: transposes, deletions, an insertion, a
    * substitution — and one probe nothing in the catalog is within
    * distance 2 of. */
  private[graft] val fuzzyProbes: Seq[(Int, String)] = Seq(
    1 -> "cold widgte",
    2 -> "lage bolt",
    3 -> "blu gear",
    4 -> "hot rodd",
    5 -> "smal ring",
    6 -> "red plats",
    7 -> "nw anvil",
    8 -> "totally unrelated")

  /** x25: link the typo'd probes to the part-name vocabulary at edit
    * distance <= 2. The DuckDB oracle is the brute-force cross join —
    * ground truth that the deletion-neighborhood blocking misses
    * nothing. */
  def fuzzyQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probes = fuzzyProbes.toDF("probe_id", "probe")
    val names = Tables.load(spark, dir, "part").select(col("p_name")).distinct()
    fuzzyJoin(probes, "probe", names, "p_name", 2)
      .select(col("probe_id"), col("probe"), col("p_name"), col("dist"))
      .orderBy(col("probe_id"), col("dist"), col("p_name"))
  }
}
