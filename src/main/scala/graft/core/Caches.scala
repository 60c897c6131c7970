package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded registry for the library's internal plan caches.
  *
  * A handful of operators persist a small intermediate frame because it
  * is referenced twice in one returned plan (Catalyst does not dedupe a
  * multiply-referenced aggregate subtree — see
  * [[graft.operators.Dedup.verifiedNearDupPairs]]). Those frames cannot
  * be unpersisted eagerly: the RETURNED DataFrame is lazy, so the cache
  * must outlive the call and be alive at action time. Left untracked,
  * though, each invocation pins a new cached relation until the
  * ContextCleaner happens to GC the plan — a long-lived driver (bench
  * retry loops, notebook sessions) accumulates storage-memory pressure
  * without bound.
  *
  * This registry caps that: every internal persist routes through
  * [[bounded]], which tracks insertion order and unpersists the OLDEST
  * tracked frame once more than [[MaxTracked]] are alive. Unpersisting
  * early is always SAFE — a consumer still holding the old plan simply
  * recomputes it (correctness is lineage's, not the cache's); the cap
  * only bounds how much storage memory the library may silently occupy.
  * [[MaxTracked]] is sized to the worst legitimate burst (a bench run
  * touching every pair-mining query back-to-back) while staying far
  * below executor storage-fraction budgets at the frames' KB..MB grain.
  */
object Caches {

  private[graft] val MaxTracked = 32

  private val tracked = new java.util.ArrayDeque[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and track it; evict (unpersist,
    * non-blocking) the oldest tracked frames down to [[MaxTracked]].
    *
    * PLAN-DEDUPED, RECENCY-REFRESHING: re-registering a frame whose
    * logical plan an already-tracked frame shares returns the TRACKED
    * frame, moved to the registry tail. Spark's CacheManager dedupes
    * cache entries by plan anyway, so the duplicate registration never
    * bought a second cache — it only burned a registry slot per call
    * and let insertion-order eviction unpersist a frame that was still
    * the HOTTEST plan in the registry (measured in round 19: the x174
    * acceptance report, re-registered by x179/x181/x182, was evicted
    * between queries and each face recomputed the full battery —
    * 27 jobs instead of the shared-read ~9).
    *
    * Eviction runs BEFORE the new persist, and an evicted frame whose
    * logical plan another tracked frame still shares is dropped from
    * the registry without unpersisting: unpersisting one frame uncaches
    * every equivalent frame — evict-after-persist silently killed the
    * entry just added whenever the same query was re-mined past the cap
    * (caught by PlanSpec's shared-cache gate under the full suite).
    *
    * MaxTracked is sized to the worst legitimate burst: one acceptance-
    * family query invocation holds ~8 distinct live frames and the
    * bench runs those faces cold+warm back-to-back; 16 (the pre-x169
    * size) measurably thrashed, 32 holds the whole family while staying
    * far below executor storage-fraction budgets at the frames'
    * KB..MB grain. */
  def bounded(df: DataFrame): DataFrame = synchronized {
    // the registry is JVM-global and can outlive a SparkSession: a frame
    // tracked before a session restart would make eviction touch a
    // stopped SparkContext (IllegalStateException) and fail an unrelated
    // bounded() call in the NEW session — drop dead-session frames first,
    // and treat any residual unpersist failure as already-evicted
    tracked.removeIf(t => t.sparkSession.sparkContext.isStopped)
    val plan = df.queryExecution.analyzed
    val it = tracked.iterator()
    while (it.hasNext) {
      val t = it.next()
      if (t.sparkSession.eq(df.sparkSession) &&
          t.queryExecution.analyzed.sameResult(plan)) {
        it.remove()
        tracked.addLast(t)
        return t
      }
    }
    while (tracked.size >= MaxTracked) {
      val old = tracked.removeFirst()
      val oldPlan = old.queryExecution.analyzed
      val stillShared = {
        val it2 = tracked.iterator()
        var shared = false
        while (!shared && it2.hasNext)
          shared = it2.next().queryExecution.analyzed.sameResult(oldPlan)
        shared
      }
      if (!stillShared)
        try old.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
    }
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.addLast(p)
    p
  }

  /** Number of currently tracked cached frames (spec hook). */
  private[graft] def trackedCount: Int = synchronized(tracked.size)
}
