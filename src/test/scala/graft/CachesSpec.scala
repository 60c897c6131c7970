package graft

import org.apache.spark.storage.StorageLevel

/** The bounded internal-cache registry (core.Caches): persists are
  * tracked, capped, and evicted oldest-first, so repeated pair-mining /
  * quantile calls in a long-lived driver cannot accumulate unbounded
  * storage-memory pressure. */
class CachesSpec extends SparkSpec {

  test("bounded() caps live internal caches and evicts the oldest") {
    import spark.implicits._
    val frames = (0 until graft.core.Caches.MaxTracked + 3).map { i =>
      graft.core.Caches.bounded(Seq(i).toDF("v"))
    }
    frames.foreach(_.count()) // materialize so storage levels are real
    assert(graft.core.Caches.trackedCount <= graft.core.Caches.MaxTracked,
      s"registry grew past the cap: ${graft.core.Caches.trackedCount}")
    // the three oldest were evicted (persist level reset to NONE)...
    frames.take(3).foreach { f =>
      assert(f.storageLevel == StorageLevel.NONE, "oldest frame still cached")
    }
    // ...and the newest are still cached
    assert(frames.last.storageLevel != StorageLevel.NONE, "newest frame evicted")
    // an evicted frame still computes correctly off lineage
    assert(frames.head.collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("evicting a duplicate-plan frame never uncaches the live copy") {
    // Spark's CacheManager dedupes cache entries BY PLAN: re-mining the
    // same pair set past the registry cap once evicted the entry the
    // newest call had JUST registered (the oldest tracked frame had an
    // equivalent plan). The fresh call must keep its cache.
    val docs = graft.core.Tables.load(spark, sf("sf0.001"), "documents").limit(30)
    (0 until graft.core.Caches.MaxTracked + 2).foreach { _ =>
      graft.operators.Dedup.verifiedNearDupPairs(docs).count()
    }
    val opt = graft.operators.Dedup.verifiedNearDupPairs(docs)
      .queryExecution.optimizedPlan
    val caches = opt.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(caches.nonEmpty, "fresh call lost its cache to duplicate-plan eviction")
  }
}
