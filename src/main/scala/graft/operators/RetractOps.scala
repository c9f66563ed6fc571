package graft.operators

import graft.{Bits, GQuery, QueryModule, Tables}
import graft.streaming.Cdc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch consumers of the `row_kind` changelog convention — the signed
  * (Abelian-group) form of Flink's retraction operators, plus the query
  * surface proving the streaming operators' semantics against an oracle.
  *
  * Reference: flink-table-runtime .../aggregate/GroupAggFunction.java:43
  * (accumulate/retract), .../rank/RetractableTopNFunction.java:56. The
  * streaming stateful analogs live in graft.streaming.Retract; these batch
  * forms express the same algebra declaratively: a retraction is a signed
  * contribution, so one hash aggregate — partial map-side combine, a
  * single shuffle, no per-key state — computes the net result at any
  * scale. That identity (streaming replay == signed batch aggregate ==
  * end-state aggregate) is exactly what the oracle checks.
  */
object RetractOps extends QueryModule {

  /** Net effect of a changelog on (count, sum) per group: +I/+U add,
    * -U/-D subtract; groups whose net count is zero have been fully
    * retracted and disappear (GroupAggFunction's delete-on-empty). */
  def retractAggregate(
      changelog: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val sign = when(col(Cdc.RowKind).isin(Cdc.Insert, Cdc.UpdateAfter), 1)
      .otherwise(-1)
    changelog
      .groupBy(keys.map(col): _*)
      .agg(
        sum(sign).as("net_cnt"),
        sum(sign * col(valueCol)).as("net_sum"))
      .filter(col("net_cnt") > 0)
  }

  /** A deterministic Debezium-shaped changelog derived from `orders`:
    * every order is inserted; orders with key % 3 == 0 get an update
    * (-U old price, +U price+100); orders with key % 7 == 0 are deleted
    * (-D of their CURRENT image). The end state is therefore directly
    * SQL-computable, which is what makes the operators oracle-checkable.
    *
    * Built as ONE scan + per-row explode of the conditional change rows
    * (not a 4-way self-union, which would read orders four times) — the
    * shape a real single-pass CDC source hands downstream. */
  def ordersChangelog(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val adj = ($"price" + lit(100).cast(Bits.Dec)).cast(Bits.Dec)
    val cur = when($"o_orderkey" % 3 === 0, adj).otherwise($"price")
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderpriority", Bits.dec($"o_totalprice").as("price"))
      .select($"o_orderkey", $"o_orderpriority",
        explode(array_compact(array(
          struct(lit(Cdc.Insert).as("kind"), $"price".as("p")),
          when($"o_orderkey" % 3 === 0,
            struct(lit(Cdc.UpdateBefore).as("kind"), $"price".as("p"))),
          when($"o_orderkey" % 3 === 0,
            struct(lit(Cdc.UpdateAfter).as("kind"), adj.as("p"))),
          when($"o_orderkey" % 7 === 0,
            struct(lit(Cdc.Delete).as("kind"), cur.as("p")))))).as("e"))
      .select($"e.kind".as(Cdc.RowKind), $"o_orderkey", $"o_orderpriority",
        $"e.p".as("price"))
  }

  def queries: Seq[GQuery] = Seq(
    GQuery(
      // Retraction-consuming group aggregate: replaying the full
      // insert/update/delete changelog through the operator must equal the
      // aggregate over the materialized end state (computed directly by
      // DuckDB) — GroupAggFunction.java:43 semantics.
      "q71_retract_group_agg",
      (s, d) => {
        import s.implicits._
        retractAggregate(ordersChangelog(s, d), Seq("o_orderpriority"), "price")
          .select($"o_orderpriority",
            $"net_cnt".cast("long").as("cnt"),
            $"net_sum".cast("double").as("total"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        |SELECT o_orderpriority,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
        |                + CASE WHEN o_orderkey % 3 = 0
        |                       THEN CAST(100 AS DECIMAL(12,2))
        |                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderkey % 7 <> 0
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority
        |""".stripMargin)),

    GQuery(
      // Retractable top-N: deletions and updates flow through the signed
      // aggregate (net count > 0 keeps exactly the live image of each
      // order), then rank the survivors — RetractableTopNFunction.java:56
      // including the backfill behavior: deleted top rows are replaced by
      // rows from below the old cut, which the oracle reproduces from the
      // end state.
      "q72_retractable_topn",
      (s, d) => {
        import s.implicits._
        val live = retractAggregate(
          ordersChangelog(s, d), Seq("o_orderkey", "o_orderpriority"), "price")
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"net_sum".desc, $"o_orderkey".asc)
        live.withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"o_orderpriority", $"rk".cast("long").as("rk"),
            $"o_orderkey", $"net_sum".cast("double").as("price"))
          .orderBy($"o_orderpriority", $"rk")
      },
      Some("""
        |WITH live AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         CAST(o_totalprice AS DECIMAL(12,2))
        |         + CASE WHEN o_orderkey % 3 = 0
        |                THEN CAST(100 AS DECIMAL(12,2))
        |                ELSE CAST(0 AS DECIMAL(12,2)) END AS price
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |ranked AS (
        |  SELECT o_orderpriority, o_orderkey, price,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY price DESC, o_orderkey) AS rk
        |  FROM live)
        |SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey,
        |       CAST(price AS DOUBLE) AS price
        |FROM ranked WHERE rk <= 3
        |ORDER BY o_orderpriority, rk
        |""".stripMargin))
  )
}
