package graft

import org.apache.spark.sql.functions._
import graft.core.DeltaIndex
import graft.operators.Dedup

/** Mechanics of the generation-manifest index layout: manifest
  * round-trip, commit-collision detection, and vacuum retention. */
class DeltaIndexSpec extends SparkSpec {
  import spark.implicits._

  private def blk(tag: String) = (1 to 12).map(i => s"$tag$i").mkString(" ")

  test("manifest renders and parses losslessly; malformed input fails loudly") {
    val m = DeltaIndex.Manifest(7L,
      Map("n" -> "3", "hashGrams" -> "false"),
      Map("grams" -> Vector("grams/g" + "0" * 19, "grams/g" + "0" * 18 + "7"),
        "df" -> Vector("df/g" + "0" * 18 + "7")))
    assert(DeltaIndex.parse(DeltaIndex.render(m)) == m)
    intercept[IllegalArgumentException] { DeltaIndex.parse("gibberish") }
    intercept[IllegalArgumentException] {
      DeltaIndex.parse("gen=1\nwat:x=y\n")
    }
    intercept[IllegalArgumentException] {
      DeltaIndex.parse("param:n=3\n") // no gen line
    }
    // values that would corrupt the line format are refused at render
    intercept[IllegalArgumentException] {
      DeltaIndex.render(DeltaIndex.Manifest(0L, Map("a" -> "b,c"), Map.empty))
    }
  }

  test("committing an already-committed generation fails instead of clobbering") {
    val dir = java.nio.file.Files.createTempDirectory("dix_commit").toString
    val m0 = DeltaIndex.Manifest(0L, Map.empty, Map("p" -> Vector("p/g" + "0" * 19)))
    DeltaIndex.commit(spark, dir, m0)
    intercept[java.io.IOException] { DeltaIndex.commit(spark, dir, m0) }
    assert(DeltaIndex.latest(spark, dir) == m0)
    // a missing pinned generation is a loud error too
    intercept[IllegalArgumentException] { DeltaIndex.at(spark, dir, 5L) }
  }

  test("vacuum drops superseded df generations, crashed-append orphans, and old manifests — probes unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("dix_vacuum").toString
    val idx = s"$dir/idx"
    val ref = Seq((100L, "en", blk("one")), (101L, "en", blk("two")))
      .toDF("doc_id", "lang", "text")
    Dedup.saveCrossProbeIndex(ref, idx)
    Dedup.appendToCrossProbeIndex(
      Seq((1L, "en", blk("three"))).toDF("doc_id", "lang", "text"), idx)
    Dedup.appendToCrossProbeIndex(
      Seq((2L, "en", blk("four"))).toDF("doc_id", "lang", "text"), idx)
    // plant a crashed append (data dir no manifest references) and an
    // orphan tmp manifest
    val orphan = java.nio.file.Paths.get(s"$idx/grams/g${"9" * 19}")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0.parquet"),
      "junk".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$idx/.manifest_x.tmp.dead"),
      "junk".getBytes("UTF-8"))
    val probe = Seq((9L, "en", blk("three"))).toDF("doc_id", "lang", "text")
    val before = Dedup.crossProbeIndexed(probe, idx, maxDf = 100)
      .collect().map(_.toSeq).toSet
    assert(before.nonEmpty)
    val stats = DeltaIndex.vacuum(spark, idx, keepGenerations = 2)
    // df/g0 (only manifest 0 referenced it) + the planted orphan; the
    // appendable grams/sizes dirs all survive in the kept manifests
    assert(stats.deletedDirs == 2, stats)
    assert(stats.deletedManifests == 1, stats)
    assert(stats.deletedTmp == 1, stats)
    assert(!java.nio.file.Files.exists(orphan))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/df/g${"0" * 19}")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/grams/g${"0" * 19}")))
    val after = Dedup.crossProbeIndexed(probe, idx, maxDf = 100)
      .collect().map(_.toSeq).toSet
    assert(after == before, "vacuum changed probe results")
    // idempotent: nothing left to collect on a second pass
    val again = DeltaIndex.vacuum(spark, idx, keepGenerations = 2)
    assert(again == DeltaIndex.VacuumStats(0, 0, 0, 0), again)
  }

  test("compaction folds many append generations into one — probe results identical, params preserved") {
    val dir = java.nio.file.Files.createTempDirectory("dix_compact").toString
    val idx = s"$dir/idx"
    Dedup.saveCrossProbeIndex(
      Seq((100L, "en", blk("one"))).toDF("doc_id", "lang", "text"), idx)
    for (i <- 1 to 3)
      Dedup.appendToCrossProbeIndex(
        Seq((i.toLong, "en", blk(s"tag$i"))).toDF("doc_id", "lang", "text"),
        idx)
    val probe = Seq((9L, "en", blk("tag2"))).toDF("doc_id", "lang", "text")
    val before = Dedup.crossProbeIndexed(probe, idx, maxDf = 100)
      .collect().map(_.toSeq).toSet
    assert(before.nonEmpty)
    assert(DeltaIndex.latest(spark, idx).dirs("grams").length == 4)
    Dedup.compactCrossProbeIndex(spark, idx)
    val m = DeltaIndex.latest(spark, idx)
    assert(m.gen == 0L && m.dirs("grams").length == 1 &&
      m.dirs("sizes").length == 1, m)
    assert(m.params("n") == "3" && m.params("hashGrams") == "false", m)
    assert(Dedup.crossProbeIndexed(probe, idx, maxDf = 100)
      .collect().map(_.toSeq).toSet == before,
      "compaction changed probe results")
    // and the compacted index accepts further appends + replay guard
    Dedup.appendToCrossProbeIndex(
      Seq((50L, "en", blk("more"))).toDF("doc_id", "lang", "text"), idx)
    intercept[IllegalArgumentException] {
      Dedup.appendToCrossProbeIndex(
        Seq((1L, "en", blk("tag1"))).toDF("doc_id", "lang", "text"), idx)
    }
  }

  test("compacting a battery root keeps every tier: texts, params, nested sem — the gate still routes") {
    val dir = java.nio.file.Files.createTempDirectory("dix_compact_bat").toString
    val idx = s"$dir/idx"
    Dedup.saveAcceptanceIndex(
      Seq((100L, "en", blk("alpha"))).toDF("doc_id", "lang", "text"),
      Seq(100L -> Array(1f, 0f), 101L -> Array(0f, 1f))
        .toDF("vec_id", "embedding"),
      idx, k = 2, iters = 1)
    Dedup.appendToAcceptanceIndex(
      Seq((10L, "en", blk("gamma"))).toDF("doc_id", "lang", "text"),
      Seq(10L -> Array(0.7f, 0.71f)).toDF("vec_id", "embedding"), idx)
    Dedup.compactCrossProbeIndex(spark, idx)
    val m = DeltaIndex.latest(spark, idx)
    assert(m.gen == 0L && m.parts.keySet ==
      Set("texts", "grams", "df", "sizes"), m)
    assert(m.parts.values.forall(_.length == 1), m)
    assert(m.params("semGen") == "1", m)
    // exact tier (texts survived), surface tier, and the PINNED sem
    // generation all still fire through the compacted battery
    val cand = Seq(
      (20L, "en", blk("gamma"), Seq(0.5f, -0.87f)),
      (21L, "en", "novel words here", Seq(0.69f, 0.72f)))
      .toDF("doc_id", "lang", "text", "embedding")
    val out = Dedup.acceptanceGateIndexed(cand, idx, tau = 0.9)
      .select($"cand_id", $"exact_ref", $"n_sem", $"verdict")
      .as[(Long, Option[Long], Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(20L) == ((20L, Some(10L), 0L, "reject")), out)
    assert(out(21L) == ((21L, None, 1L, "review")), out)
    // semantic roots refuse this path (their lists are partitioned)
    intercept[IllegalArgumentException] {
      Dedup.compactCrossProbeIndex(spark, s"$idx/sem")
    }
  }

  test("vacuum recurses into nested artifacts (the battery's sem sub-index)") {
    val dir = java.nio.file.Files.createTempDirectory("dix_vac_nested").toString
    val idx = s"$dir/idx"
    val ref = Seq((100L, "en", blk("alpha"))).toDF("doc_id", "lang", "text")
    val refVecs = Seq(100L -> Array(1f, 0f), 101L -> Array(0f, 1f))
      .toDF("vec_id", "embedding")
    Dedup.saveAcceptanceIndex(ref, refVecs, idx, k = 2, iters = 1)
    Dedup.appendToAcceptanceIndex(
      Seq((10L, "en", blk("gamma"))).toDF("doc_id", "lang", "text"),
      Seq(10L -> Array(0.7f, 0.71f)).toDF("vec_id", "embedding"),
      idx)
    val stats = DeltaIndex.vacuum(spark, idx, keepGenerations = 1)
    assert(stats.nested == 1, stats)
    // both levels retain only their newest manifest, and the gate still
    // sees the whole battery (every appendable dir survived)
    assert(stats.deletedManifests == 1, stats)
    val cand = Seq((20L, "en", blk("gamma"), Seq(0.99f, 0.01f)))
      .toDF("doc_id", "lang", "text", "embedding")
    val out = Dedup.acceptanceGateIndexed(cand, idx, tau = 0.9)
      .select($"cand_id", $"exact_ref", $"verdict")
      .as[(Long, Option[Long], String)].collect().toSeq
    assert(out == Seq((20L, Some(10L), "reject")), out)
  }
}
