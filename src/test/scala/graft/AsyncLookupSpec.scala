package graft

import graft.operators.AsyncLookup
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger

object AsyncLookupSpec {
  // executor-side counters (local mode: same JVM)
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
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
