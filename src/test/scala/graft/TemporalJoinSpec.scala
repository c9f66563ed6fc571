package graft

import graft.operators.AsOfJoin
import graft.streaming.TemporalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming temporal join harness tests: replay out-of-order versions and
  * facts across micro-batches and check the emitted rows equal the batch
  * as-of join (`AsOfJoin.backward`) over the same (non-late) inputs —
  * the round-2 verdict's acceptance criterion for this operator. */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000)

  test("temporal join: out-of-order versions+facts match batch as-of join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(String, Timestamp, String)]
    val versions = MemoryStream[(String, Timestamp, String)]

    val joined = TemporalJoin.temporalJoin(facts.toDS(), versions.toDS(), "30 seconds")
    val q = joined.toDF("k", "t", "fact", "version").writeStream
      .outputMode("append").format("memory").queryName("tj_out").start()

    // Round 1: versions v1@10 v2@25, facts f0@5 f1@12 f2@30 (all within the
    // 30 s delay of the round max, so batch-split races can't make any late).
    versions.addData(("a", ts(10), "v1"), ("a", ts(25), "v2"))
    facts.addData(("a", ts(5), "f0"), ("a", ts(12), "f1"), ("a", ts(30), "f2"))
    q.processAllAvailable()

    // Round 2: OUT-OF-ORDER version v1b@22 (between v1 and v2, above the
    // watermark so accepted), fact f3@24 that must match it, and fz@100
    // to advance the watermark past rounds 1-2.
    versions.addData(("a", ts(22), "v1b"))
    facts.addData(("a", ts(24), "f3"), ("a", ts(100), "fz"))
    q.processAllAvailable()

    // Round 3: advance the watermark past fz so every fact emits. fz@100
    // must still match v2@25 — proving the latest version at-or-below the
    // watermark was RETAINED while older versions were pruned.
    facts.addData(("a", ts(200), "fy"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tj_out")
      .select($"k", $"t", $"fact", $"version")
      .as[(String, Long, String, Option[String])].collect().toSet
    val expected = Set(
      ("a", 5000L, "f0", None),
      ("a", 12000L, "f1", Some("v1")),
      ("a", 24000L, "f3", Some("v1b")),
      ("a", 30000L, "f2", Some("v2")),
      ("a", 100000L, "fz", Some("v2")))
    assert(got == expected)

    // Equivalence with the batch as-of join over the same emitted facts.
    val factDf = Seq(("a", 5L, "f0"), ("a", 12L, "f1"), ("a", 24L, "f3"),
      ("a", 30L, "f2"), ("a", 100L, "fz")).toDF("k", "t", "fact")
    val verDf = Seq(("a", 10L, "v1"), ("a", 22L, "v1b"), ("a", 25L, "v2"))
      .toDF("k", "vt", "version")
    val batch = AsOfJoin.backward(factDf, verDf, "k", "t", "vt",
      Seq("version"), "vt")
      .select($"k", ($"t" * 1000).as("t"), $"fact", $"version")
      .as[(String, Long, String, Option[String])].collect().toSet
    assert(got == batch)
  }

  test("temporal join: late fact and late version are dropped explicitly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(String, Timestamp, String)]
    val versions = MemoryStream[(String, Timestamp, String)]

    val joined = TemporalJoin.temporalJoin(facts.toDS(), versions.toDS(), "10 seconds")
    val q = joined.toDF("k", "t", "fact", "version").writeStream
      .outputMode("append").format("memory").queryName("tj_late").start()

    versions.addData(("a", ts(10), "v1"))
    facts.addData(("a", ts(15), "f1"))
    q.processAllAvailable()
    // advance watermark to 90: f1 emits with v1
    facts.addData(("a", ts(100), "fz"))
    q.processAllAvailable()
    // both below watermark(90) => dropped; f_late must NOT appear, and the
    // late version v_late must not change future matches.
    versions.addData(("a", ts(50), "v_late"))
    facts.addData(("a", ts(60), "f_late"))
    q.processAllAvailable()
    facts.addData(("a", ts(200), "fy")) // release fz
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tj_late")
      .select($"k", $"t", $"fact", $"version")
      .as[(String, Long, String, Option[String])].collect().toSet
    assert(got == Set(
      ("a", 15000L, "f1", Some("v1")),
      ("a", 100000L, "fz", Some("v1"))))
  }

  test("temporal join: multiple keys stay independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(String, Timestamp, String)]
    val versions = MemoryStream[(String, Timestamp, String)]

    val joined = TemporalJoin.temporalJoin(facts.toDS(), versions.toDS(), "10 seconds")
    val q = joined.toDF("k", "t", "fact", "version").writeStream
      .outputMode("append").format("memory").queryName("tj_keys").start()

    versions.addData(("a", ts(10), "va"), ("b", ts(9), "vb"))
    facts.addData(("a", ts(11), "fa"), ("b", ts(11), "fb"), ("c", ts(11), "fc"))
    q.processAllAvailable()
    facts.addData(("a", ts(100), "advance"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tj_keys")
      .select($"k", $"fact", $"version")
      .as[(String, String, Option[String])].collect().toSet
    assert(got == Set(
      ("a", "fa", Some("va")),
      ("b", "fb", Some("vb")),
      ("c", "fc", None)))
  }

  test("idle-state TTL: a fact-silent key's retained version expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // WITH maxIdle = 20 s: the version keyed 'a' arrives, then only other
    // keys see traffic; once the watermark passes the idle horizon the
    // cleanup timer drops a's state, so a LATER fact on 'a' pads NULL.
    val facts = MemoryStream[(String, Timestamp, String)]
    val versions = MemoryStream[(String, Timestamp, String)]
    val joined = TemporalJoin.temporalJoin(
      facts.toDS(), versions.toDS(), "0 seconds", maxIdleMs = 20000L)
    val q = joined.toDF("k", "t", "fact", "version").writeStream
      .outputMode("append").format("memory").queryName("tj_ttl").start()
    versions.addData(("a", ts(10), "v1"))
    q.processAllAvailable()
    facts.addData(("z", ts(50), "advance1")) // wm -> 50: horizon passed
    q.processAllAvailable()
    facts.addData(("z", ts(55), "advance2")) // fires a's cleanup timer
    q.processAllAvailable()
    facts.addData(("a", ts(60), "f_after_ttl"), ("z", ts(90), "advance3"))
    q.processAllAvailable()
    facts.addData(("z", ts(120), "advance4")) // release f_after_ttl
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tj_ttl")
      .select($"k", $"fact", $"version")
      .as[(String, String, Option[String])].collect().toSet
    assert(got.contains(("a", "f_after_ttl", None)),
      s"expired version must not match: $got")

    // WITHOUT the TTL the same replay matches v1 (retention is forever).
    val facts2 = MemoryStream[(String, Timestamp, String)]
    val versions2 = MemoryStream[(String, Timestamp, String)]
    val joined2 = TemporalJoin.temporalJoin(
      facts2.toDS(), versions2.toDS(), "0 seconds")
    val q2 = joined2.toDF("k", "t", "fact", "version").writeStream
      .outputMode("append").format("memory").queryName("tj_nottl").start()
    versions2.addData(("a", ts(10), "v1"))
    q2.processAllAvailable()
    facts2.addData(("z", ts(50), "advance1"))
    q2.processAllAvailable()
    facts2.addData(("a", ts(60), "f_later"), ("z", ts(90), "advance2"))
    q2.processAllAvailable()
    facts2.addData(("z", ts(120), "advance3"))
    q2.processAllAvailable()
    q2.stop()
    val got2 = spark.table("tj_nottl")
      .select($"k", $"fact", $"version")
      .as[(String, String, Option[String])].collect().toSet
    assert(got2.contains(("a", "f_later", Some("v1"))),
      s"without TTL the version must remain matchable: $got2")
  }

  test("proc-time temporal join: facts join the latest version, batch tick") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(String, String)]
    val versions = MemoryStream[(String, String)]

    val joined = TemporalJoin.temporalJoinProcTime(facts.toDS(), versions.toDS())
    val q = joined.toDF("k", "fact", "version").writeStream
      .outputMode("append").format("memory").queryName("tj_proc").start()

    // batch 1: fact before any version -> null pad
    facts.addData(("a", "f0"))
    q.processAllAvailable()
    // batch 2: version v1 and fact f1 in the SAME batch: the batch
    // boundary is the proc-time tick, so f1 sees v1
    versions.addData(("a", "v1"))
    facts.addData(("a", "f1"))
    q.processAllAvailable()
    // batch 3: v2 replaces v1 in state (exactly one version per key);
    // later fact joins v2
    versions.addData(("a", "v2"))
    q.processAllAvailable()
    facts.addData(("a", "f2"), ("b", "fb"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tj_proc")
      .as[(String, String, Option[String])].collect().toSet
    assert(got == Set(
      ("a", "f0", None),
      ("a", "f1", Some("v1")),
      ("a", "f2", Some("v2")),
      ("b", "fb", None)))
  }
}
