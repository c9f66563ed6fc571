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
final class LookupCache[I, O](val maxEntries: Int, val ttlMs: Long,
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

/** FULL caching for lookup joins — the other reference caching mode
  * (flink-table-runtime/.../functions/table/lookup/fullcache/
  * LookupFullCache.java + CacheLoader.java: load the ENTIRE dimension
  * once, answer every probe from memory, reload on a schedule). Right
  * when the dimension is small enough to hold but too hot to re-query:
  * zero per-row lookups between reloads, staleness bounded by
  * `reloadIntervalMs` (Flink's PeriodicCacheReloadTrigger).
  *
  * Spark mapping: per-JVM singleton via the same registry pattern; the
  * loader runs at first use and again on the first probe after the
  * reload horizon passes (synchronized — one loader flight, probes wait;
  * reference behavior: lookups block until the first load completes).
  * Misses after a load are authoritative ABSENT answers (None), not
  * load-through — the whole table is present by contract. */
final class FullLookupCache[I, O](loader: () => Map[I, O],
    reloadIntervalMs: Long, clock: () => Long) extends Serializable {
  require(reloadIntervalMs > 0, "reload interval must be positive")

  // steady state is a VOLATILE read — probes between reloads take no
  // lock (Flink's LookupFullCache likewise only blocks during a reload);
  // the monitor is entered solely when a reload is due, with the
  // freshness re-check inside (double-checked reload)
  @transient @volatile private var table: Map[I, O] = _
  @transient @volatile private var loadedAt: Long = Long.MinValue
  private val loadCount = new AtomicLong

  private def current(): Map[I, O] = {
    val t = table
    if (t != null && clock() - loadedAt < reloadIntervalMs) t
    else synchronized {
      val now = clock()
      if (table == null || now - loadedAt >= reloadIntervalMs) {
        table = loader()
        loadedAt = now
        loadCount.incrementAndGet()
      }
      table
    }
  }

  def get(key: I): Option[O] = current().get(key)
  def loads: Long = loadCount.get
  def size: Int = current().size
}

object LookupCache {
  private val registry = new ConcurrentHashMap[String, LookupCache[_, _]]()
  private val fullRegistry = new ConcurrentHashMap[String, FullLookupCache[_, _]]()

  /** One cache per identifier per JVM (LookupCacheManager
    * .registerCacheIfAbsent): every partition running in this executor
    * shares it, so a hot key fetched by one task serves all. */
  def shared[I, O](name: String, maxEntries: Int, ttlMs: Long,
      clock: () => Long = () => System.currentTimeMillis()): LookupCache[I, O] = {
    val c = registry.computeIfAbsent(name,
      _ => new LookupCache[I, O](maxEntries, ttlMs, clock))
      .asInstanceOf[LookupCache[I, O]]
    // per-name singleton: a second call site with a DIFFERENT config
    // would silently get the first registrant's cache (e.g. a 60s TTL
    // when it asked for 500ms freshness) — refuse instead
    require(c.maxEntries == maxEntries && c.ttlMs == ttlMs,
      s"lookup cache '$name' already registered with maxEntries=" +
        s"${c.maxEntries}/ttlMs=${c.ttlMs}; requested $maxEntries/$ttlMs " +
        "(use a distinct name per config)")
    c
  }

  /** Wrap a lookup function with the shared cache `name`. The returned
    * function is serializable; the cache instance is resolved lazily on
    * the executor (per-JVM singleton, never shipped). */
  def cached[I, O](name: String, maxEntries: Int, ttlMs: Long)(
      lookup: I => O): I => O =
    key => shared[I, O](name, maxEntries, ttlMs).getOrLookup(key)(lookup)

  /** One FULL cache per identifier per JVM; `loader` materializes the
    * whole dimension (e.g. collect a small dim table once per executor).
    * Returned lookup answers misses as None without a remote call. */
  def fullCached[I, O](name: String, reloadIntervalMs: Long,
      clock: () => Long = () => System.currentTimeMillis())(
      loader: () => Map[I, O]): I => Option[O] = {
    key => fullRegistry.computeIfAbsent(name,
      _ => new FullLookupCache[I, O](loader, reloadIntervalMs, clock))
      .asInstanceOf[FullLookupCache[I, O]].get(key)
  }

  private[graft] def fullCacheOf(name: String): Option[FullLookupCache[_, _]] =
    Option(fullRegistry.get(name))

  /** Test/ops hook: drop a cache (Flink's cache lifecycle on job stop). */
  def invalidate(name: String): Unit = { registry.remove(name); fullRegistry.remove(name) }

  // ------------------------------------------------- DDL-declared caching

  /** Declarative cache spec parsed from table options — the
    * DefaultLookupCache / LookupFullCache factory options surface
    * (flink-table-common .../lookup/LookupOptions: 'lookup.cache' =
    * 'PARTIAL'/'FULL', 'lookup.partial-cache.max-rows',
    * 'lookup.partial-cache.expire-after-write',
    * 'lookup.full-cache.periodic-reload.interval'). */
  sealed trait CacheSpec
  final case class PartialSpec(maxRows: Int, ttlMs: Long) extends CacheSpec
  final case class FullSpec(reloadIntervalMs: Long) extends CacheSpec

  private val DurRe = """(?i)\s*(\d+)\s*(ms|s|sec|second|seconds|min|minute|minutes|h|hour|hours|d|day|days)?\s*""".r

  /** "10 s" / "5 min" / "300000" (bare millis) -> milliseconds. */
  private[graft] def parseDurationMs(s: String): Long = s match {
    case DurRe(n, unit) =>
      val mult = Option(unit).map(_.toLowerCase) match {
        case None | Some("ms") => 1L
        case Some("s") | Some("sec") | Some("second") | Some("seconds") => 1000L
        case Some("min") | Some("minute") | Some("minutes") => 60000L
        case Some("h") | Some("hour") | Some("hours") => 3600000L
        case Some("d") | Some("day") | Some("days") => 86400000L
        case Some(other) => throw new IllegalArgumentException(s"bad duration unit '$other'")
      }
      n.toLong * mult
    case other => throw new IllegalArgumentException(s"bad duration '$other'")
  }

  /** Parse the lookup-cache options out of a table's option map; None =
    * caching not declared (or declared 'NONE'). Also accepts the JDBC
    * connector's LEGACY vocabulary (reference flink-connector-jdbc
    * .../table/JdbcConnectorOptions.java:123-151:
    * 'lookup.cache.max-rows' + 'lookup.cache.ttl', default 10 s) — a
    * positive max-rows without a unified 'lookup.cache' declaration
    * means PARTIAL, exactly the factory's translation. */
  def specOf(options: Map[String, String]): Option[CacheSpec] =
    options.get("lookup.cache").map(_.trim.toUpperCase) match {
      case Some("PARTIAL") => Some(PartialSpec(
        maxRows = options.get("lookup.partial-cache.max-rows").map(_.trim.toInt)
          .getOrElse(10000),
        ttlMs = options.get("lookup.partial-cache.expire-after-write")
          .map(parseDurationMs).getOrElse(600000L)))
      case Some("FULL") => Some(FullSpec(
        reloadIntervalMs = options.get("lookup.full-cache.periodic-reload.interval")
          .map(parseDurationMs).getOrElse(300000L)))
      case Some("NONE") => None
      case None =>
        options.get("lookup.cache.max-rows").map(_.trim.toLong)
          .filter(_ > 0) // Flink's -1 default = caching off
          .map(max => PartialSpec(
            maxRows = max.toInt,
            ttlMs = options.get("lookup.cache.ttl")
              .map(parseDurationMs).getOrElse(10000L)))
      case Some(other) => throw new IllegalArgumentException(
        s"lookup.cache: expected PARTIAL, FULL or NONE, got '$other'")
    }

  /** Wire a lookup function according to the cache mode DECLARED ON THE
    * TABLE (WITH clause / TBLPROPERTIES) — the SQL-surface entry Flink
    * exposes through the connector factory options. `lookup` performs
    * the per-key fetch (PARTIAL mode and the uncached fallthrough);
    * `loader` materializes the whole dimension (FULL mode; misses after
    * a load are authoritative None). The cache identifier is
    * `ddl:<table>`, so every partition of the JVM shares one instance. */
  def forTable[I, O](spark: org.apache.spark.sql.SparkSession, table: String)(
      lookup: I => Option[O])(loader: () => Map[I, O]): I => Option[O] =
    // SHOW TBLPROPERTIES throws on temp views (and tables outside the
    // catalog): an undeclared dimension degrades to the uncached path
    // instead of failing the lookup wiring
    specOf(scala.util.Try(graft.WatermarkDdl.tableOptions(spark, table))
      .getOrElse(Map.empty)) match {
      case Some(PartialSpec(maxRows, ttlMs)) =>
        cached[I, Option[O]](s"ddl:$table", maxRows, ttlMs)(lookup)
      case Some(FullSpec(reloadMs)) =>
        fullCached[I, O](s"ddl:$table", reloadMs)(loader)
      case None => lookup
    }
}
