package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memoization of expensive cached intermediates (dedup
  * shingle/signature frames, the IVF coarse quantizer): repeated
  * invocations share ONE cache entry instead of stacking persisted
  * copies for the session lifetime. (At 100 TB these are intermediate
  * tables written once and read by each stage; in-session they are
  * Spark cache entries.)
  *
  * Keyed on the session OBJECT (weak keys), not an identity hash —
  * distinct live sessions can never collide, and a key for a stopped
  * session disappears with an explicit [[release]]. Note the cached
  * DataFrames hold a strong reference back to their session, so GC
  * alone does not reclaim a stopped session's entries — callers owning
  * a session's lifecycle should release() it (as Bench does between
  * timing passes via releaseAll). */
object Caches {
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  /** NOT computeIfAbsent: `mk` may itself call back into this registry
    * (connectedComponents track()s its per-round checkpoints while
    * ccLabels memoizes the result), and ConcurrentHashMap throws
    * "Recursive update" on re-entrant mutation of a colliding bin. The
    * get / putIfAbsent race is benign: a concurrent duplicate compute
    * builds an identical lazy frame whose .cache() is a NO-OP against
    * the winner's plan-keyed CacheManager entry — so the loser must
    * NOT unpersist its handle (that would evict the shared entry);
    * dropping the handle leaks nothing. */
  def memo(s: SparkSession, key: String)(mk: => DataFrame): DataFrame = {
    val m = bySession.synchronized {
      bySession.computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val fresh = mk.cache()
      val prior = m.putIfAbsent(key, fresh)
      if (prior != null) prior else fresh
    }
  }

  private val objBySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, AnyRef]]())

  /** Memoize a driver-side VALUE (e.g. a trained coarse quantizer —
    * k×dim index metadata) per (session, key); released with the same
    * release()/releaseAll() lifecycle as the cached frames. */
  def memoObj[T <: AnyRef](s: SparkSession, key: String)(mk: => T): T = {
    val m = objBySession.synchronized {
      objBySession.computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, AnyRef]())
    }
    // same re-entrancy-safe get/putIfAbsent shape as memo (the trainer
    // behind an IVF quantizer runs Spark jobs that may track() frames)
    val hit = m.get(key)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val fresh = mk
      val prior = m.putIfAbsent(key, fresh)
      (if (prior != null) prior else fresh).asInstanceOf[T]
    }
  }

  /** Register an EXTERNALLY persisted frame under (session, key) so the
    * normal release()/releaseAll() lifecycle owns its unpersist (used by
    * Planner.planWithFallback for the winning probe cache). Re-tracking
    * the same key unpersists the superseded entry, so a long-lived
    * server replanning the same query does not stack cache entries. */
  def track(s: SparkSession, key: String, df: DataFrame): DataFrame = {
    val m = bySession.synchronized {
      bySession.computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    val old = m.put(key, df)
    if (old != null && (old ne df)) old.unpersist()
    df
  }

  /** Drop (and unpersist) every cached frame and memoized object of
    * `s` whose key carries `needle` as one of its '|'-delimited
    * tokens. Cache keys embed their source dir/table as a token
    * (e.g. "dedup|/data/sf0.01|shingles"), so an ingestion pipeline
    * that lands new data under a dir invalidates exactly the
    * intermediates derived from it — the data-refresh hook behind
    * [[graft.semantic.Freshness.refresh]]. Token equality, not
    * substring containment: refreshing "/data/sf0.1" must not evict
    * a sibling "/data/sf0.10"'s intermediates. Returns the entry
    * count dropped. */
  def invalidateMatching(s: SparkSession, needle: String): Int = {
    def hit(key: String): Boolean = key.split('|').contains(needle)
    var n = 0
    val m = bySession.synchronized(bySession.get(s))
    if (m != null) {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (hit(e.getKey)) { e.getValue.unpersist(); it.remove(); n += 1 }
      }
    }
    val om = objBySession.synchronized(objBySession.get(s))
    if (om != null) {
      val it = om.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (hit(e.getKey)) { it.remove(); n += 1 }
      }
    }
    n
  }

  /** Unpersist every memoized frame of ONE session. Call only after the
    * consuming queries' results have been fully executed/written — the
    * returned frames are lazy, so releasing earlier would recompute the
    * expensive stages uncached. */
  def release(s: SparkSession): Unit = {
    val m = bySession.remove(s)
    if (m != null) m.values.forEach(df => { df.unpersist(); () })
    objBySession.remove(s)
    ()
  }

  /** Release every session's entries (single-session tools: Bench). */
  def releaseAll(): Unit = {
    bySession.synchronized {
      bySession.values.forEach(m => m.values.forEach(df => { df.unpersist(); () }))
      bySession.clear()
    }
    objBySession.synchronized(objBySession.clear())
  }
}
