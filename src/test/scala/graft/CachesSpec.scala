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
}
