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

  private[graft] val MaxTracked = 16

  private val tracked = new java.util.ArrayDeque[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and track it; evict (unpersist,
    * non-blocking) the oldest tracked frames down to [[MaxTracked]].
    *
    * Eviction runs BEFORE the new persist, and an evicted frame whose
    * logical plan another tracked frame still shares is dropped from
    * the registry without unpersisting: Spark's CacheManager dedupes
    * cache entries BY PLAN, so unpersisting one frame uncaches every
    * equivalent frame — evict-after-persist silently killed the entry
    * just added whenever the same query was re-mined past the cap
    * (caught by PlanSpec's shared-cache gate under the full suite). */
  def bounded(df: DataFrame): DataFrame = synchronized {
    // the registry is JVM-global and can outlive a SparkSession: a frame
    // tracked before a session restart would make eviction touch a
    // stopped SparkContext (IllegalStateException) and fail an unrelated
    // bounded() call in the NEW session — drop dead-session frames first,
    // and treat any residual unpersist failure as already-evicted
    tracked.removeIf(t => t.sparkSession.sparkContext.isStopped)
    while (tracked.size >= MaxTracked) {
      val old = tracked.removeFirst()
      val oldPlan = old.queryExecution.analyzed
      val stillShared = {
        val it = tracked.iterator()
        var shared = false
        while (!shared && it.hasNext)
          shared = it.next().queryExecution.analyzed.sameResult(oldPlan)
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
