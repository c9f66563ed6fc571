package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs: bucketed co-located joins (no exchange on the
  * bucketed sides) and salting equivalence. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without shuffle exchanges") {
    import spark.implicits._
    val orders = Tables.orders(spark, TestSpark.sf)
    val li = Tables.lineitem(spark, TestSpark.sf)
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the join itself must not introduce shuffles; the only
      // exchange allowed is the one for the final groupBy.
      val joinPart = plan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sf)
    val plain = li.groupBy($"l_returnflag")
      .agg(sum(graft.Bits.dec($"l_quantity")).as("sum_l_quantity"),
        count(lit(1)).as("count_l_orderkey"))
      .as[(String, java.math.BigDecimal, Long)].collect()
      .map(r => r._1 -> ((r._2.doubleValue, r._3))).toMap
    val salted = Skew.saltedAgg(
        li.withColumn("l_quantity", graft.Bits.dec($"l_quantity")),
        Seq("l_returnflag"), saltFactor = 7,
        Seq(("l_quantity", "sum"), ("l_orderkey", "count")))
      .as[(String, java.math.BigDecimal, Long)].collect()
      .map(r => r._1 -> ((r._2.doubleValue, r._3))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sf).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, TestSpark.sf)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val plain = li.join(ord, "l_orderkey")
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", saltFactor = 5)
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("both top-k forms shuffle k-bounded data, never the table") {
    // Two routes to scale-safe per-group top-k, both verified by actual
    // shuffle record counts:
    //  1. the TopKAgg combine-enabled aggregate (partial trim map-side);
    //  2. window-rank + rank filter — which Spark 4's InferWindowGroupLimit
    //     rewrites to a map-side WindowGroupLimit, so the classic q08
    //     pattern is ALREADY k-bounded pre-shuffle (measured here, not
    //     assumed: without the rewrite the exchange would carry every row).
    import graft.operators.TopKAgg
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._

    def shuffledRecords(df: DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike =>
          s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      }.sum
    }

    val base = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey")
    val totalRows = base.count()
    val groups = 3L // l_returnflag cardinality
    val k = 3
    // AQE off so the physical plan (and its exchange metrics) is walkable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val viaAgg = shuffledRecords(TopKAgg.topKPerGroup(
        base, "l_returnflag", "l_extendedprice", "l_orderkey", k = k))
      val w = Window.partitionBy($"l_returnflag")
        .orderBy($"l_extendedprice".desc, $"l_orderkey")
      val windowDf = base.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      val viaWindow = shuffledRecords(windowDf)
      val windowPlan = windowDf.queryExecution.executedPlan.toString
      assert(windowPlan.contains("WindowGroupLimit"),
        s"expected InferWindowGroupLimit to fire:\n$windowPlan")
      // both shuffles are bounded by mappers * groups * k, nowhere near
      // the table size
      val mappers = base.rdd.getNumPartitions.toLong
      val bound = mappers * groups * k
      assert(viaAgg > 0 && viaAgg <= bound, s"agg shuffled $viaAgg (> $bound)")
      assert(viaWindow > 0 && viaWindow <= bound, s"window shuffled $viaWindow (> $bound)")
      assert(viaAgg < totalRows / 10 && viaWindow < totalRows / 10,
        s"top-k shuffled table-scale data: $viaAgg / $viaWindow of $totalRows rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
