package graft

import graft.streaming.Cdc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val payload = new StructType()
    .add("id", LongType).add("name", StringType)

  private val envelopes = Seq(
    """{"op":"c","ts_ms":1,"before":null,"after":{"id":1,"name":"a"}}""",
    """{"op":"u","ts_ms":2,"before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"}}""",
    """{"op":"c","ts_ms":3,"before":null,"after":{"id":2,"name":"x"}}""",
    """{"op":"d","ts_ms":4,"before":{"id":2,"name":"x"},"after":null}""")

  test("debezium decode emits +I/-U/+U/-D with payload") {
    import spark.implicits._
    val raw = envelopes.toDF("value")
    val log = Cdc.decodeDebezium(raw, payload)
    val kinds = log.groupBy(col(Cdc.RowKind)).count().as[(String, Long)]
      .collect().toMap
    assert(kinds == Map("+I" -> 2L, "-U" -> 1L, "+U" -> 1L, "-D" -> 1L))
    val ub = log.filter(col(Cdc.RowKind) === Cdc.UpdateBefore).select("name").as[String].head()
    assert(ub == "a")
  }

  test("dropUpdateBefore removes only -U") {
    import spark.implicits._
    val log = Cdc.decodeDebezium(envelopes.toDF("value"), payload)
    val kinds = Cdc.dropUpdateBefore(log).select(Cdc.RowKind).as[String].collect().toSet
    assert(!kinds.contains(Cdc.UpdateBefore) && kinds.contains(Cdc.UpdateAfter))
  }

  test("upsertMaterialize collapses to final per-key state, drops deleted keys") {
    import spark.implicits._
    val log = Cdc.decodeDebezium(envelopes.toDF("value"), payload)
    val fin = Cdc.upsertMaterialize(log, Seq("id"), "cdc_ts", "cdc_ts")
      .select("id", "name").as[(Long, String)].collect().toSet
    // id=1 ends at name=b; id=2 was deleted last -> gone
    assert(fin == Set((1L, "b")))
  }
}
