package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Partial caching for lookup joins — the role of flink-table-runtime
  * .../functions/table/lookup/LookupCacheManager.java + the caching/
  * package's DefaultLookupCache: a bounded LRU of (key -> row) entries
  * with TTL expiry, shared across subtasks of the same lookup table by
  * cache identifier, with hit/miss counters for observability. Without
  * it every probe row pays a remote round-trip even when hot keys repeat
  * (the round-3 "lookup-join caching" gap).
  *
  * Spark mapping: one JVM-wide cache instance per identifier (Flink
  * keeps one per table on each TaskManager — `registerCacheIfAbsent`);
  * all partitions of an executor share it, exactly the TM-level sharing.
  * Wrap any `I => O` lookup with `cached(...)` and hand the result to
  * `AsyncLookup.ordered/unordered` or a plain mapPartitions — a hit
  * skips the remote call entirely, a miss loads and populates. Misses on
  * the same key may race and both load (last write wins) — the lookup is
  * NOT serialized through the cache lock, matching Flink's contract that
  * the cache never gates lookup concurrency.
  *
  * Expiry is expireAfterWrite (DefaultLookupCache's default): a hit past
  * the TTL re-fetches, so a changed dimension row becomes visible at
  * most `ttlMs` after it changed.
  */
final class LookupCache[I, O](maxEntries: Int, ttlMs: Long,
    clock: () => Long) extends Serializable {
  require(maxEntries > 0, "cache capacity must be positive")
  require(ttlMs > 0, "ttl must be positive")

  private final case class Entry(value: O, loadedAt: Long)

  // access-ordered LinkedHashMap = LRU; rebuilt empty after serialization
  // (caches never ship state between JVMs, like Flink's per-TM caches)
  @transient private lazy val map =
    new java.util.LinkedHashMap[I, Entry](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[I, Entry]): Boolean =
        size() > maxEntries
    }
  private val hitCount = new AtomicLong
  private val missCount = new AtomicLong

  /** Cached read-through: the lookup itself runs OUTSIDE the cache lock. */
  def getOrLookup(key: I)(lookup: I => O): O = {
    val now = clock()
    val cached = map.synchronized {
      val e = map.get(key)
      if (e == null || now - e.loadedAt > ttlMs) None else Some(e.value)
    }
    cached match {
      case Some(v) => hitCount.incrementAndGet(); v
      case None =>
        missCount.incrementAndGet()
        val v = lookup(key)
        map.synchronized { map.put(key, Entry(v, now)) }
        v
    }
  }

  def hits: Long = hitCount.get
  def misses: Long = missCount.get
  def size: Int = map.synchronized(map.size())
  def hitRate: Double =
    if (hits + misses == 0) 0.0 else hits.toDouble / (hits + misses)
}

object LookupCache {
  private val registry = new ConcurrentHashMap[String, LookupCache[_, _]]()

  /** One cache per identifier per JVM (LookupCacheManager
    * .registerCacheIfAbsent): every partition running in this executor
    * shares it, so a hot key fetched by one task serves all. */
  def shared[I, O](name: String, maxEntries: Int, ttlMs: Long,
      clock: () => Long = () => System.currentTimeMillis()): LookupCache[I, O] =
    registry.computeIfAbsent(name,
      _ => new LookupCache[I, O](maxEntries, ttlMs, clock))
      .asInstanceOf[LookupCache[I, O]]

  /** Wrap a lookup function with the shared cache `name`. The returned
    * function is serializable; the cache instance is resolved lazily on
    * the executor (per-JVM singleton, never shipped). */
  def cached[I, O](name: String, maxEntries: Int, ttlMs: Long)(
      lookup: I => O): I => O =
    key => shared[I, O](name, maxEntries, ttlMs).getOrLookup(key)(lookup)

  /** Test/ops hook: drop a cache (Flink's cache lifecycle on job stop). */
  def invalidate(name: String): Unit = registry.remove(name)
}
