package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Linkage

/** Semantic coverage for fuzzy record linkage (x25's operator): the
  * deletion-variant generator, the SymSpell blocking guarantee (no pair
  * within the threshold missed — checked against an in-engine brute
  * force), and the verify step's exactness. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants: exact set for a small string") {
    val out = Seq("abc").toDF("s")
      .select(Linkage.deletionVariants($"s", 2).as("v"))
      .as[Seq[String]].head().toSet
    // 0 deletions: abc; 1: bc, ac, ab; 2: c, b, a
    assert(out == Set("abc", "bc", "ac", "ab", "c", "b", "a"))
    val one = Seq("abc").toDF("s")
      .select(Linkage.deletionVariants($"s", 1).as("v"))
      .as[Seq[String]].head().toSet
    assert(one == Set("abc", "bc", "ac", "ab"))
  }

  test("deletionVariants: short strings never error, duplicates collapse") {
    val out = Seq("", "a", "aa").toDF("s")
      .select($"s", Linkage.deletionVariants($"s", 2).as("v"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("") == Seq(""))
    assert(out("a").toSet == Set("a", ""))
    // "aa": delete either char → "a" (collapses), both → ""
    assert(out("aa").toSet == Set("aa", "a", ""))
  }

  test("blocking misses nothing: fuzzyJoin equals brute force on the part vocabulary") {
    val probes = Linkage.fuzzyProbes.toDF("probe_id", "probe")
    val names = Tables.load(spark, sf("sf0.001"), "part")
      .select($"p_name").distinct()
    val blocked = Linkage.fuzzyJoin(probes, "probe", names, "p_name", 2)
      .select($"probe_id", $"p_name", $"dist")
      .as[(Int, String, Int)].collect().toSet
    val brute = probes.crossJoin(names)
      .withColumn("dist", levenshtein($"probe", $"p_name"))
      .filter($"dist" <= 2)
      .select($"probe_id", $"p_name", $"dist")
      .as[(Int, String, Int)].collect().toSet
    assert(blocked == brute, "deletion-neighborhood blocking lost or invented pairs")
    assert(brute.nonEmpty)
    // the deliberately-unmatchable probe really has no partner
    assert(!blocked.exists(_._1 == 8))
  }

  test("bag semantics: duplicate input rows each produce their own match row") {
    // two identical left rows (no id column) within distance 1 of one
    // right row -> TWO output rows, like the brute-force cross join
    val left = Seq("gear", "gear", "bolt").toDF("probe")
    val right = Seq("gears", "bolts", "bolts").toDF("p_name")
    val out = Linkage.fuzzyJoin(left, "probe", right, "p_name", 1)
      .select($"probe", $"p_name").as[(String, String)].collect().toSeq.sorted
    // gear x2 -> gears; bolt x1 -> bolts x2 (right dups preserved too)
    assert(out == Seq("bolt" -> "bolts", "bolt" -> "bolts",
      "gear" -> "gears", "gear" -> "gears"))
  }

  test("distance-1 threshold is stricter than distance-2, never broader") {
    val probes = Linkage.fuzzyProbes.toDF("probe_id", "probe")
    val names = Tables.load(spark, sf("sf0.001"), "part")
      .select($"p_name").distinct()
    val d1 = Linkage.fuzzyJoin(probes, "probe", names, "p_name", 1)
      .select($"probe_id", $"p_name").as[(Int, String)].collect().toSet
    val d2 = Linkage.fuzzyJoin(probes, "probe", names, "p_name", 2)
      .select($"probe_id", $"p_name").as[(Int, String)].collect().toSet
    assert(d1.subsetOf(d2))
    assert(d1.size < d2.size, "the vocabulary has distance-2 matches the d1 run must exclude")
  }

  test("overlapping column names are rejected; dist column is exact") {
    intercept[IllegalArgumentException] {
      Linkage.fuzzyJoin(Seq(("a", 1)).toDF("k", "x"), "k",
        Seq(("b", 2)).toDF("k", "y"), "k", 2)
    }
    val out = Linkage.fuzzyJoin(
        Seq((1, "kitten")).toDF("lid", "lk"), "lk",
        Seq((2, "sitten"), (3, "kitten"), (4, "mitten")).toDF("rid", "rk"), "rk", 2)
      .select($"rid", $"dist").as[(Int, Int)].collect().toMap
    assert(out == Map(2 -> 1, 3 -> 0, 4 -> 1))
  }
}
