package graft.util

/** LRU-bounded memoizing cache for expensive build-once/use-many values
  * (e.g. an on-disk IVF index built from a corpus).
  *
  * Two concurrency guarantees, both load-bearing for a long-lived JVM
  * serving many sessions:
  *
  *   1. '''Builds run OUTSIDE the shared lock.''' The map monitor is held
  *      only to look up / insert a memo slot (microseconds); forcing the
  *      slot's value runs the builder under the SLOT's own lazy-val lock.
  *      Concurrent callers of the SAME key build exactly once; callers of
  *      DIFFERENT keys — and cache hits — never wait behind another key's
  *      build. (The pre-r10 IVF cache built full Spark jobs inside the
  *      global monitor, serializing every unrelated session's cache hit.)
  *
  *   2. '''Eviction frees the HEAP entry only — it never destroys the
  *      value's backing resources.''' Values handed out by [[getOrBuild]]
  *      may outlive their cache residency arbitrarily (a lazy DataFrame
  *      over an evicted index's files is collected whenever the caller
  *      gets around to it), so eviction-time cleanup is a use-after-free
  *      by construction. Callers that own on-disk state must tie its
  *      lifetime to something that provably outlives every reader — e.g.
  *      the [[TempDirs]] JVM-exit hook. (The pre-r10 IVF cache deleted
  *      the evicted index's parquet inside `removeEldestEntry`, racing
  *      not-yet-collected queries into FileNotFoundException.)
  *
  * Eviction order is least-recently-USED (access-order LinkedHashMap), so
  * the hot working set survives a burst of one-off keys.
  */
final class KeyedLazyCache[K, V](maxEntries: Int) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  /** Per-key memo: `lazy val` gives once-only building with the slot —
    * not the cache — as the synchronization domain.
    */
  private final class Slot(build: () => V) { lazy val value: V = build() }

  private val map = new java.util.LinkedHashMap[K, Slot](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Slot]): Boolean =
      size() > maxEntries
  }

  /** Return the cached value for `key`, building it (at most once per
    * residency) if absent. The builder runs outside the cache-wide lock.
    *
    * If the builder throws, the failure propagates to every caller forced
    * on that slot while it remains cached (standard lazy-val semantics:
    * a later force retries the builder).
    */
  def getOrBuild(key: K)(build: => V): V = {
    val slot = map.synchronized {
      var s = map.get(key)
      if (s == null) { s = new Slot(() => build); map.put(key, s) }
      s
    }
    slot.value
  }

  /** Current number of resident entries (test seam). */
  def size: Int = map.synchronized(map.size())

  /** Whether `key` is currently resident (test seam). `containsKey` is not
    * an "access" on an access-order LinkedHashMap, so probing residency
    * does not promote the key and distort LRU assertions.
    */
  def contains(key: K): Boolean = map.synchronized(map.containsKey(key))
}
