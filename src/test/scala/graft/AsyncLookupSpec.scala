package graft

import graft.operators.AsyncLookup
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger

object AsyncLookupSpec {
  // executor-side counters (local mode: same JVM)
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
  val remoteCalls = new AtomicInteger(0)
}

class AsyncLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ordered async lookup: results in input order, concurrency bounded") {
    import spark.implicits._
    AsyncLookupSpec.inFlight.set(0)
    AsyncLookupSpec.maxInFlight.set(0)
    val input = (1 to 200).toDS().repartition(2)
    val out = AsyncLookup.ordered(input, capacity = 8, timeoutMs = 30000) { k =>
      val cur = AsyncLookupSpec.inFlight.incrementAndGet()
      AsyncLookupSpec.maxInFlight.updateAndGet(m => math.max(m, cur))
      Thread.sleep(1) // simulated service latency
      AsyncLookupSpec.inFlight.decrementAndGet()
      s"v$k"
    }
    val rows = out.collect()
    assert(rows.length == 200)
    rows.foreach { case (k, v) => assert(v == s"v$k") }
    // ordered per partition: reconstruct partition order via mapPartitions
    val ordered = AsyncLookup.ordered(input, capacity = 8, timeoutMs = 30000)(k => k * 2)
      .mapPartitions(it => Iterator(it.map(_._1).toSeq)).collect()
    ordered.foreach { seq =>
      val asInput = input.mapPartitions(it => Iterator(it.toSeq)).collect()
        .find(_ == seq)
      // each output partition preserves its input partition's order
      assert(asInput.isDefined || seq.isEmpty)
    }
    assert(AsyncLookupSpec.maxInFlight.get() > 1, "no concurrency observed")
    assert(AsyncLookupSpec.maxInFlight.get() <= 16, // 2 partitions x capacity 8
      s"capacity exceeded: ${AsyncLookupSpec.maxInFlight.get()}")
  }

  test("unordered async lookup: fast results overtake a slow head-of-line") {
    import spark.implicits._
    // key 1 is SLOW (500 ms), the rest are fast: unordered emission must
    // deliver fast keys before the slow head; ordered mode must not.
    val input = (1 to 6).toDS().repartition(1)
    def slowLookup(k: Int): String = {
      if (k == 1) Thread.sleep(500) else Thread.sleep(10)
      s"v$k"
    }
    val unordered = AsyncLookup.unordered(input, capacity = 6, timeoutMs = 30000)(slowLookup)
      .collect().toSeq
    assert(unordered.toMap == (1 to 6).map(k => k -> s"v$k").toMap)
    assert(unordered.head._1 != 1,
      s"slow head-of-line should be overtaken, got order ${unordered.map(_._1)}")
    assert(unordered.last._1 == 1,
      s"slow lookup should complete last, got order ${unordered.map(_._1)}")

    val ordered = AsyncLookup.ordered(input, capacity = 6, timeoutMs = 30000)(slowLookup)
      .collect().toSeq
    assert(ordered.map(_._1) == (1 to 6), "ordered mode preserves input order")
  }

  test("unordered async lookup: lookup failure fails the task, not a hang") {
    import spark.implicits._
    val input = (1 to 4).toDS().repartition(1)
    val err = intercept[org.apache.spark.SparkException] {
      AsyncLookup.unordered(input, capacity = 2, timeoutMs = 5000) { k =>
        if (k == 3) throw new RuntimeException("service down")
        s"v$k"
      }.collect()
    }
    assert(err.getMessage.contains("service down") ||
      Option(err.getCause).exists(_.getMessage.contains("service down")))
  }

  test("lookup cache: hot-key workload does far fewer lookups than rows") {
    import spark.implicits._
    import graft.operators.LookupCache
    LookupCache.invalidate("spec_hot")
    AsyncLookupSpec.remoteCalls.set(0)
    // 1000 probe rows over only 10 distinct keys — the hot-key shape
    val input = (1 to 1000).map(i => i % 10).toDS().repartition(2)
    val lookup = LookupCache.cached[Int, String]("spec_hot",
      maxEntries = 100, ttlMs = 3600_000L) { k =>
      AsyncLookupSpec.remoteCalls.incrementAndGet()
      s"dim$k"
    }
    val rows = AsyncLookup.ordered(input, capacity = 4, timeoutMs = 30000)(lookup)
      .collect()
    assert(rows.length == 1000)
    rows.foreach { case (k, v) => assert(v == s"dim$k") }
    // without the cache this is 1000 remote calls; with it, one per
    // distinct key plus at most a few concurrent-miss races
    val calls = AsyncLookupSpec.remoteCalls.get()
    assert(calls <= 40, s"cache ineffective: $calls remote calls for 10 keys")
    val c = LookupCache.shared[Int, String]("spec_hot", 100, 3600_000L)
    assert(c.hits >= 960 && c.hitRate > 0.9,
      s"hit accounting off: hits=${c.hits} rate=${c.hitRate}")
  }

  test("lookup cache: TTL expiry re-fetches, LRU evicts beyond capacity") {
    import graft.operators.LookupCache
    var now = 0L
    val cache = new LookupCache[Int, String](maxEntries = 2, ttlMs = 100L,
      clock = () => now)
    var loads = 0
    def fetch(k: Int): String = { loads += 1; s"v$k@$now" }
    assert(cache.getOrLookup(1)(fetch) == "v1@0" && loads == 1)
    assert(cache.getOrLookup(1)(fetch) == "v1@0" && loads == 1) // hit
    now = 50
    assert(cache.getOrLookup(1)(fetch) == "v1@0" && loads == 1) // still fresh
    now = 101
    assert(cache.getOrLookup(1)(fetch) == "v1@101" && loads == 2,
      "expired entry must re-fetch")
    // LRU: capacity 2 — touching 1 keeps it, inserting 3 evicts 2
    now = 102
    cache.getOrLookup(2)(fetch) // loads=3, cache={1,2}
    cache.getOrLookup(1)(fetch) // hit, 1 most-recent
    cache.getOrLookup(3)(fetch) // loads=4, evicts 2
    val before = loads
    cache.getOrLookup(2)(fetch) // must re-load (evicted)
    assert(loads == before + 1, "LRU eviction did not drop the eldest entry")
    assert(cache.size <= 2)
  }

  test("full lookup cache: one load serves every probe, reload horizon re-materializes") {
    import graft.operators.FullLookupCache
    var now = 0L
    var loads = 0
    val cache = new FullLookupCache[Int, String](
      loader = () => { loads += 1; Map(1 -> s"a@$now", 2 -> s"b@$now") },
      reloadIntervalMs = 1000L, clock = () => now)
    assert(cache.get(1).contains("a@0") && loads == 1)
    assert(cache.get(2).contains("b@0") && loads == 1) // no per-probe load
    // miss is an AUTHORITATIVE absent, not a load-through
    assert(cache.get(99).isEmpty && loads == 1)
    now = 999
    assert(cache.get(1).contains("a@0") && loads == 1) // still fresh
    now = 1000
    assert(cache.get(1).contains("a@1000") && loads == 2,
      "reload horizon must re-materialize the dimension")
    assert(cache.loads == 2 && cache.size == 2)
  }

  test("full lookup cache: registry-shared wrapper works from a Spark job") {
    import graft.operators.LookupCache
    import spark.implicits._
    LookupCache.invalidate("spec_full")
    AsyncLookupSpec.remoteCalls.set(0)
    val input = (1 to 500).map(i => i % 7).toDS().repartition(2)
    val lookup = LookupCache.fullCached[Int, String]("spec_full", 3600_000L) { () =>
      AsyncLookupSpec.remoteCalls.incrementAndGet()
      (0 until 5).map(k => k -> s"dim$k").toMap // keys 5,6 absent from dim
    }
    val rows = input.mapPartitions(_.map(k => (k, lookup(k)))).collect()
    assert(rows.length == 500)
    rows.foreach { case (k, v) =>
      if (k < 5) assert(v.contains(s"dim$k")) else assert(v.isEmpty)
    }
    assert(AsyncLookupSpec.remoteCalls.get() == 1,
      s"full cache must load exactly once per JVM, saw ${AsyncLookupSpec.remoteCalls.get()}")
  }

  test("DDL-declared PARTIAL cache: a hot-key workload hits the cache") {
    import spark.implicits._
    import graft.operators.LookupCache
    val t = s"ddl_lkp_p_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    Engine.sql(spark, s"""
      CREATE TABLE $t (k BIGINT, v STRING)
      WITH ('lookup.cache' = 'PARTIAL',
            'lookup.partial-cache.max-rows' = '100',
            'lookup.partial-cache.expire-after-write' = '10 min')""")
    LookupCache.invalidate(s"ddl:$t")
    val calls = new AtomicInteger(0)
    val fn = LookupCache.forTable[Long, String](spark, t)(
      k => { calls.incrementAndGet(); Some(s"v$k") })(() => Map.empty)
    // 100 probes over 2 distinct keys through the async operator: the
    // DDL-declared cache must reduce remote calls to ~the key count
    val input = ((1 to 50).map(_ => 1L) ++ (1 to 50).map(_ => 2L)).toDS()
      .repartition(1)
    val out = AsyncLookup.ordered(input, capacity = 4, timeoutMs = 30000)(
      k => fn(k).get)
    assert(out.collect().length == 100)
    // concurrent misses on the same key may race (cache never gates
    // lookup concurrency) — far fewer than 100, not necessarily exactly 2
    assert(calls.get() <= 8, s"cache not effective: ${calls.get()} remote calls")
    assert(LookupCache.shared[Long, Option[String]](s"ddl:$t", 100, 600000L).hits
      >= 92, "expected hot-key hits on the DDL-declared cache")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("DDL-declared FULL cache: one load serves every probe, misses are None") {
    import graft.operators.LookupCache
    val t = s"ddl_lkp_f_${math.abs(getClass.getName.hashCode)}"
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
    Engine.sql(spark, s"""
      CREATE TABLE $t (k BIGINT, v STRING)
      WITH ('lookup.cache' = 'FULL',
            'lookup.full-cache.periodic-reload.interval' = '10 min')""")
    LookupCache.invalidate(s"ddl:$t")
    val loads = new AtomicInteger(0)
    val fn = LookupCache.forTable[Long, String](spark, t)(
      _ => fail("FULL mode must never call the per-key lookup"))(
      () => { loads.incrementAndGet(); Map(1L -> "a", 2L -> "b") })
    (1 to 100).foreach { _ =>
      assert(fn(1L).contains("a") && fn(2L).contains("b"))
      assert(fn(99L).isEmpty, "a miss after the load is an authoritative None")
    }
    assert(loads.get() == 1, s"expected one dimension load, got ${loads.get()}")
    Engine.sql(spark, s"DROP VIEW IF EXISTS $t")
    Engine.sql(spark, s"DROP TABLE IF EXISTS __${t}_base")
  }

  test("undeclared cache = plain lookup; bad mode fails loudly") {
    import graft.operators.LookupCache
    val calls = new AtomicInteger(0)
    // table doesn't exist -> empty options -> fallthrough, every probe hits
    val fn = LookupCache.forTable[Long, String](spark, "no_such_lkp_table")(
      k => { calls.incrementAndGet(); Some(s"v$k") })(() => Map.empty)
    (1 to 5).foreach(_ => fn(1L))
    assert(calls.get() == 5)
    // a TEMP-VIEW dimension exists in the catalog but SHOW TBLPROPERTIES
    // throws on it — forTable must degrade to the uncached path, not fail
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("tmp_lkp_dim")
    try {
      val tvCalls = new AtomicInteger(0)
      val tv = LookupCache.forTable[Long, String](spark, "tmp_lkp_dim")(
        k => { tvCalls.incrementAndGet(); Some(s"v$k") })(() => Map.empty)
      (1 to 3).foreach(_ => tv(1L))
      assert(tvCalls.get() == 3, "temp-view dim must fall through uncached")
    } finally spark.catalog.dropTempView("tmp_lkp_dim")
    val err = intercept[IllegalArgumentException](
      LookupCache.specOf(Map("lookup.cache" -> "SOMETIMES")))
    assert(err.getMessage.contains("PARTIAL, FULL or NONE"))
  }

  test("retry wrapper recovers from transient failures and rethrows on exhaustion") {
    val calls = new AtomicInteger(0)
    val flaky = AsyncLookup.withRetry[Int, String](attempts = 3, delayMs = 0) { k =>
      if (calls.incrementAndGet() % 3 != 0) throw new RuntimeException("transient")
      s"ok$k"
    }
    assert(flaky(7) == "ok7")
    val alwaysFails = AsyncLookup.withRetry[Int, String](attempts = 2, delayMs = 0) { _ =>
      throw new RuntimeException("down")
    }
    val err = intercept[RuntimeException](alwaysFails(1))
    assert(err.getMessage == "down")
  }
}
