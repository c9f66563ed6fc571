package graft.operators

import graft.{Bits, GQuery, QueryModule, Tables}
import graft.Bits.{dec, dround, droundSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational surface: the Flink 1.16 batch ExecNode inventory
  * (SURVEY.md §2.1-§2.9) re-expressed with Spark built-ins so Catalyst /
  * Tungsten / AQE provide codegen, spill, partial aggregation and join
  * selection. Every query is declarative (no RDDs, no driver-side loops),
  * filters/projections stay adjacent to the scan for parquet pushdown, and
  * small dimension tables are broadcast explicitly.
  *
  * Reference semantics covered here (file:line cites into /root/reference):
  *  - fused project+filter Calc: CommonExecCalc.java (Catalyst native)
  *  - hash/sort-merge/nested-loop joins incl. semi/anti:
  *    flink-table-runtime .../operators/join/HashJoinOperator.java:67,
  *    SortMergeJoinFunction.java:56
  *  - group aggregations + rollup Expand: BatchExecHashAggregate.java,
  *    StreamExecExpand.java
  *  - OVER frames: .../operators/over/frame/ (RowSlidingOverFrame etc.)
  *  - rank functions: .../aggfunctions/RankAggFunction.java etc.
  *  - set ops rewrites: ReplaceIntersectWithSemiJoinRule etc.
  *  - scalar function surface: BuiltInFunctionDefinitions.java:501-1971
  */
object Relational extends QueryModule {

  private val revenueExprSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"

  def queries: Seq[GQuery] = Seq(
    GQuery(
      "q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(dec($"l_quantity")).cast("double").as("sum_qty"),
            sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
              .cast("double").as("sum_disc_price"),
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")) *
              (lit(1) + dec($"l_tax"))).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", dround($"sum_qty" / $"count_order", 6))
          .withColumn("avg_price", dround($"sum_base_price" / $"count_order", 6))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM($revenueExprSql) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM($revenueExprSql * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  ${droundSql("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)", 6)} AS avg_qty,
        |  ${droundSql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)", 6)} AS avg_price,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus
        |""".stripMargin)),

    GQuery(
      "q02_topn_revenue_join",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        val ord = Tables.orders(s, d).filter($"o_orderdate" < to_timestamp(lit("1998-01-01")))
        val li = Tables.lineitem(s, d).filter($"l_shipdate" > to_timestamp(lit("1996-01-01")))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("revenue"))
          .select($"l_orderkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
            $"o_orderpriority", $"revenue")
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some(s"""
        |SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       o_orderpriority,
        |       CAST(SUM($revenueExprSql) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10
        |""".stripMargin)),

    GQuery(
      "q03_region_revenue_bcast",
      (s, d) => {
        import s.implicits._
        // supplier/nation/region are tiny at any SF -> broadcast all three;
        // the only shuffle left is the final aggregation on (r_name, n_name).
        Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      Some(s"""
        |SELECT r_name, n_name,
        |       CAST(SUM($revenueExprSql) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name
        |""".stripMargin)),

    GQuery(
      "q04_semi_join_exists",
      (s, d) => {
        import s.implicits._
        val big = Tables.lineitem(s, d).filter($"l_quantity" > 45).select($"l_orderkey")
        Tables.orders(s, d)
          .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum(dec($"o_totalprice")).cast("double").as("total"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority
        |""".stripMargin)),

    GQuery(
      "q05_anti_join_no_orders",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .join(Tables.orders(s, d).select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            sum(dec($"c_acctbal")).cast("double").as("total_bal"))
          .orderBy($"c_mktsegment")
      },
      Some("""
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment
        |""".stripMargin)),

    GQuery(
      "q06_left_outer_enrich",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d).filter($"c_custkey" < 100)
          .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey", $"c_name")
          .agg(count($"o_orderkey").as("n_orders"),
            coalesce(sum(dec($"o_totalprice")), lit(0)).cast("double").as("spent"))
          .orderBy($"c_custkey")
      },
      Some("""
        |SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
        |       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey < 100
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey
        |""".stripMargin)),

    GQuery(
      "q07_full_outer_nation",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
          .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
        val su = Tables.supplier(s, d)
          .groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
        c.join(su, $"c_nationkey" === $"s_nationkey", "full_outer")
          .select(
            coalesce($"c_nationkey", $"s_nationkey").cast("long").as("nationkey"),
            coalesce($"n_cust", lit(0L)).as("n_cust"),
            coalesce($"n_supp", lit(0L)).as("n_supp"))
          .orderBy($"nationkey")
      },
      Some("""
        |SELECT CAST(COALESCE(c.nk, s.nk) AS BIGINT) AS nationkey,
        |       CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
        |       CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.nk = s.nk
        |ORDER BY nationkey
        |""".stripMargin)),

    GQuery(
      "q08_topn_per_group",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        Tables.orders(s, d).filter($"o_custkey" < 50)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"rn".cast("long").as("rn"),
            $"o_totalprice".as("totalprice"))
          .orderBy($"o_custkey", $"rn")
      },
      Some("""
        |SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn, totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice AS totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders WHERE o_custkey < 50) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn
        |""".stripMargin)),

    GQuery(
      "q09_over_running_sum",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        Tables.lineitem(s, d).filter($"l_suppkey" < 10)
          .withColumn("running_qty",
            sum(dec($"l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double"))
          .withColumn("prev_qty", coalesce(lag($"l_quantity", 1).over(w), lit(-1.0)))
          .withColumn("next_qty", coalesce(lead($"l_quantity", 1).over(w), lit(-1.0)))
          .select($"l_suppkey", $"l_orderkey",
            $"l_linenumber".cast("long").as("linenumber"),
            $"l_quantity".as("qty"), $"running_qty", $"prev_qty", $"next_qty")
          .orderBy($"l_suppkey", $"l_orderkey", $"linenumber")
      },
      Some("""
        |SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
        |       l_quantity AS qty,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_qty,
        |       COALESCE(lag(l_quantity, 1) OVER w, -1.0) AS prev_qty,
        |       COALESCE(lead(l_quantity, 1) OVER w, -1.0) AS next_qty
        |FROM lineitem WHERE l_suppkey < 10
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, linenumber
        |""".stripMargin)),

    GQuery(
      "q10_rank_functions",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
        Tables.orders(s, d).filter($"o_custkey" < 30)
          .select($"o_orderpriority", $"o_orderkey",
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pctrank"),
            cume_dist().over(w).as("cdist"))
          .orderBy($"o_orderpriority", $"rn")
      },
      Some("""
        |SELECT o_orderpriority, o_orderkey,
        |       CAST(row_number() OVER w AS BIGINT) AS rn,
        |       CAST(rank() OVER w AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pctrank,
        |       cume_dist() OVER w AS cdist
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, rn
        |""".stripMargin)),

    GQuery(
      "q11_rollup_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(sum(dec($"l_quantity")).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
            coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
            $"sum_qty", $"n")
          .orderBy($"returnflag", $"linestatus")
      },
      Some("""
        |SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus
        |""".stripMargin)),

    GQuery(
      "q12_setops_counts",
      (s, d) => {
        import s.implicits._
        val withOrders = Tables.orders(s, d).select($"o_custkey".as("k")).distinct()
        val positive = Tables.customer(s, d).filter($"c_acctbal" > 0)
          .select($"c_custkey".as("k")).distinct()
        val a = withOrders.intersect(positive).agg(count(lit(1)).as("n_intersect"))
        val b = positive.except(withOrders).agg(count(lit(1)).as("n_except"))
        val c = withOrders.union(positive).distinct().agg(count(lit(1)).as("n_union"))
        val e = withOrders.unionAll(positive).agg(count(lit(1)).as("n_union_all"))
        a.crossJoin(b).crossJoin(c).crossJoin(e)
      },
      Some("""
        |SELECT
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |        INTERSECT SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 0) t1) AS BIGINT) AS n_intersect,
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 0
        |        EXCEPT SELECT DISTINCT o_custkey FROM orders) t2) AS BIGINT) AS n_except,
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |        UNION SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 0) t3) AS BIGINT) AS n_union,
        |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |        UNION ALL SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 0) t4) AS BIGINT) AS n_union_all
        |""".stripMargin)),

    GQuery(
      "q13_distinct_agg",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            countDistinct($"o_custkey").as("n_customers"),
            countDistinct($"o_orderstatus").as("n_statuses"),
            sum(dec($"o_totalprice")).cast("double").as("total"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        |SELECT o_orderpriority,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority
        |""".stripMargin)),

    GQuery(
      "q14_conditional_agg",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_returnflag")
          .agg(
            sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("high_priority"),
            sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
              .as("low_priority"),
            sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_finished"))
          .orderBy($"l_returnflag")
      },
      Some("""
        |SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag
        |""".stripMargin)),

    GQuery(
      "q15_string_funcs",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d).filter($"p_partkey" < 200)
          .select($"p_partkey",
            upper($"p_name").as("up"),
            substring($"p_name", 1, 4).as("sub"),
            length($"p_name").cast("long").as("len"),
            regexp_replace($"p_name", lit("e"), lit("_")).as("rep"),
            concat_ws("|", $"p_brand", $"p_type").as("cat"),
            coalesce(element_at(split($"p_name", " "), 2), lit("")).as("word2"),
            reverse($"p_name").as("rev"),
            instr($"p_name", "r").cast("long").as("pos_r"),
            lpad($"p_brand", 10, "*").as("lp"),
            regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
            substring($"p_type", 1, 3).as("left3"),
            ascii($"p_name").cast("long").as("ascv"),
            repeat($"p_brand", 2).as("rpt"))
          .orderBy($"p_partkey")
      },
      Some("""
        |SELECT p_partkey,
        |       upper(p_name) AS up,
        |       substring(p_name, 1, 4) AS sub,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       replace(p_name, 'e', '_') AS rep,
        |       concat_ws('|', p_brand, p_type) AS cat,
        |       COALESCE(string_split(p_name, ' ')[2], '') AS word2,
        |       reverse(p_name) AS rev,
        |       CAST(strpos(p_name, 'r') AS BIGINT) AS pos_r,
        |       lpad(p_brand, 10, '*') AS lp,
        |       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |       substring(p_type, 1, 3) AS left3,
        |       CAST(ascii(p_name) AS BIGINT) AS ascv,
        |       repeat(p_brand, 2) AS rpt
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey
        |""".stripMargin)),

    GQuery(
      "q16_math_funcs",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d).filter($"l_orderkey" < 100)
          .select($"l_orderkey", $"l_linenumber".cast("long").as("linenumber"),
            $"l_quantity".as("qty"),
            sqrt($"l_quantity").as("sq"),
            dround(log($"l_extendedprice"), 6).as("lg"),
            dround(exp($"l_discount"), 6).as("ex"),
            pow($"l_quantity", 2.0).as("pw"),
            ($"l_quantity".cast("long") % 7).cast("long").as("md"),
            signum($"l_discount" - 0.05).cast("long").as("sgn"),
            abs($"l_discount" - 0.05).as("ab"),
            ceil($"l_extendedprice").cast("long").as("ce"),
            floor($"l_extendedprice").cast("long").as("fl"),
            dround($"l_extendedprice" * 0.1, 3).as("rd"))
          .orderBy($"l_orderkey", $"linenumber")
      },
      Some(s"""
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
        |       l_quantity AS qty,
        |       sqrt(l_quantity) AS sq,
        |       ${droundSql("ln(l_extendedprice)", 6)} AS lg,
        |       ${droundSql("exp(l_discount)", 6)} AS ex,
        |       pow(l_quantity, 2.0) AS pw,
        |       CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS md,
        |       CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn,
        |       abs(l_discount - 0.05) AS ab,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |       ${droundSql("l_extendedprice * 0.1", 3)} AS rd
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, linenumber
        |""".stripMargin)),

    GQuery(
      "q17_date_funcs",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d).filter($"l_orderkey" < 200)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey", $"l_linenumber".cast("long").as("linenumber"),
            year($"o_orderdate").cast("long").as("y"),
            month($"o_orderdate").cast("long").as("m"),
            dayofmonth($"o_orderdate").cast("long").as("dy"),
            quarter($"o_orderdate").cast("long").as("q"),
            datediff($"l_shipdate", $"o_orderdate").cast("long").as("lag_days"),
            date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("plus30"),
            date_format(last_day($"o_orderdate".cast("date")), "yyyy-MM-dd").as("eom"),
            date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"))
          .orderBy($"l_orderkey", $"linenumber")
      },
      Some("""
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
        |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        |       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        |       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dy,
        |       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
        |       CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag_days,
        |       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
        |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_orderkey < 200
        |ORDER BY l_orderkey, linenumber
        |""".stripMargin)),

    GQuery(
      "q18_json_extract",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast("long"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"), max($"k").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""
        |SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type
        |""".stripMargin)),

    GQuery(
      "q19_unnest_tokens",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(explode(split($"text", " ")).as("token"))
          .filter($"token" =!= "")
          .groupBy($"token")
          .agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"token")
          .limit(20)
      },
      Some("""
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY cnt DESC, token
        |LIMIT 20
        |""".stripMargin)),

    GQuery(
      "q20_scalar_misc",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d).filter($"c_custkey" < 100)
          .select($"c_custkey",
            greatest($"c_acctbal", lit(0.0)).as("bal_pos"),
            least($"c_acctbal", lit(1000.0)).as("bal_cap"),
            coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(b)")).as("seg"),
            when($"c_acctbal" > 5000, "gold").when($"c_acctbal" > 0, "member")
              .otherwise("basic").as("tier"),
            ($"c_nationkey".cast("long").between(5, 15)).cast("long").as("mid_nation"))
          .orderBy($"c_custkey")
      },
      Some("""
        |SELECT c_custkey,
        |       greatest(c_acctbal, 0.0) AS bal_pos,
        |       least(c_acctbal, 1000.0) AS bal_cap,
        |       COALESCE(nullif(c_mktsegment, 'BUILDING'), '(b)') AS seg,
        |       CASE WHEN c_acctbal > 5000 THEN 'gold'
        |            WHEN c_acctbal > 0 THEN 'member'
        |            ELSE 'basic' END AS tier,
        |       CAST(CAST(c_nationkey AS BIGINT) BETWEEN 5 AND 15 AS BIGINT) AS mid_nation
        |FROM customer WHERE c_custkey < 100
        |ORDER BY c_custkey
        |""".stripMargin)),

    GQuery(
      // Remaining Flink built-in scalar surface (flink-docs systemFunctions:
      // INITCAP, OVERLAY..PLACING, POSITION..IN, STR_TO_MAP, PARSE_URL,
      // TIMESTAMPADD/TIMESTAMPDIFF, FROM_UNIXTIME) through the Spark
      // equivalents. DuckDB lacks initcap/overlay/str_to_map/parse_url, so
      // the oracle recomputes each from string primitives — an independent
      // derivation, not an echo of the same builtin.
      "q115_scalar_flink_parity",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d).filter($"o_orderkey" < 200)
          .withColumn("url",
            concat(lit("https://h"), ($"o_custkey" % 5).cast("string"),
              lit(".example.org/p/"), $"o_orderstatus",
              lit("?k="), $"o_orderkey".cast("string"), lit("&x=1")))
          .withColumn("kv",
            concat(lit("st:"), $"o_orderstatus", lit(",pr:"), $"o_orderpriority"))
          .select($"o_orderkey",
            initcap(concat(lower($"o_orderpriority"), lit(" "), lit("ord"))).as("cap"),
            expr("overlay(o_orderpriority PLACING '**' FROM 2 FOR 2)").as("ovl"),
            expr("position('-' IN o_orderpriority)").cast("long").as("dash_at"),
            expr("str_to_map(kv, ',', ':')['pr']").as("pr_val"),
            parse_url($"url", lit("HOST")).as("host"),
            parse_url($"url", lit("PATH")).as("path"),
            parse_url($"url", lit("QUERY"), lit("k")).as("qk"),
            date_format(expr("timestampadd(DAY, 30, o_orderdate)"),
              "yyyy-MM-dd HH:mm:ss").as("plus30d"),
            expr("timestampdiff(HOUR, o_orderdate, timestamp'1998-01-01 00:00:00')")
              .cast("long").as("hrs_to_98"),
            from_unixtime($"o_orderkey" * 3600L).as("epoch_fmt"))
          .orderBy($"o_orderkey")
      },
      Some("""
        |SELECT o_orderkey,
        |       array_to_string(list_transform(
        |         string_split(lower(o_orderpriority) || ' ord', ' '),
        |         w -> upper(substring(w, 1, 1)) || lower(substring(w, 2))), ' ') AS cap,
        |       substring(o_orderpriority, 1, 1) || '**' || substring(o_orderpriority, 4) AS ovl,
        |       CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_at,
        |       o_orderpriority AS pr_val,
        |       'h' || CAST(o_custkey % 5 AS VARCHAR) || '.example.org' AS host,
        |       '/p/' || o_orderstatus AS path,
        |       CAST(o_orderkey AS VARCHAR) AS qk,
        |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS plus30d,
        |       CAST(date_diff('hour', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS hrs_to_98,
        |       strftime(TIMESTAMP '1970-01-01 00:00:00' + to_seconds(o_orderkey * 3600),
        |                '%Y-%m-%d %H:%M:%S') AS epoch_fmt
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY o_orderkey
        |""".stripMargin)),

    GQuery(
      // JSON constructors (Flink JSON_OBJECT / JSON_ARRAY with their
      // NULL ON NULL / ABSENT ON NULL modes; Flink defaults are NULL ON
      // NULL for objects, ABSENT ON NULL for arrays). Values keep SQL
      // types — BIGINT unquoted, STRING quoted, nested structs nest as
      // JSON. The oracle derives every expected string from DuckDB
      // concatenation primitives, not a JSON builtin, so the comparison
      // is an independent reconstruction of the compact JSON text.
      "q123_json_constructors",
      (s, d) => {
        import s.implicits._
        import graft.functions.sqlfns._
        Tables.orders(s, d).filter($"o_orderkey" < 200)
          .select($"o_orderkey",
            jsonObject(
              "key" -> $"o_orderkey",
              "status" -> $"o_orderstatus",
              "pri7" -> when($"o_orderkey" % 7 === 0, $"o_orderpriority")).as("obj_null"),
            jsonObject(nullOnNull = false,
              "key" -> $"o_orderkey",
              "pri7" -> when($"o_orderkey" % 7 === 0, $"o_orderpriority")).as("obj_absent"),
            jsonObject(
              "k" -> $"o_orderkey",
              "nest" -> struct($"o_orderstatus".as("s"), $"o_custkey".as("c")))
              .as("obj_nested"),
            jsonArray(array($"o_orderkey", $"o_custkey",
              when($"o_orderkey" % 3 === 0, $"o_custkey" % 10)),
              nullOnNull = true).as("arr_null"),
            jsonArray(array($"o_orderkey", $"o_custkey",
              when($"o_orderkey" % 3 === 0, $"o_custkey" % 10)))
              .as("arr_absent"))
          .orderBy($"o_orderkey")
      },
      Some("""
        |SELECT o_orderkey,
        |       '{"key":' || o_orderkey || ',"status":"' || o_orderstatus || '","pri7":' ||
        |         CASE WHEN o_orderkey % 7 = 0 THEN '"' || o_orderpriority || '"' ELSE 'null' END || '}'
        |         AS obj_null,
        |       '{"key":' || o_orderkey ||
        |         CASE WHEN o_orderkey % 7 = 0 THEN ',"pri7":"' || o_orderpriority || '"' ELSE '' END || '}'
        |         AS obj_absent,
        |       '{"k":' || o_orderkey || ',"nest":{"s":"' || o_orderstatus || '","c":' ||
        |         o_custkey || '}}' AS obj_nested,
        |       '[' || o_orderkey || ',' || o_custkey || ',' ||
        |         CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_custkey % 10 AS VARCHAR)
        |              ELSE 'null' END || ']' AS arr_null,
        |       '[' || o_orderkey || ',' || o_custkey ||
        |         CASE WHEN o_orderkey % 3 = 0 THEN ',' || CAST(o_custkey % 10 AS VARCHAR)
        |              ELSE '' END || ']' AS arr_absent
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY o_orderkey
        |""".stripMargin)),

    GQuery(
      // FUNCTIONS.md stragglers: the last expressible
      // BuiltInFunctionDefinitions entries with no earlier parity query —
      // TEMPORAL_OVERLAPS (:1493), BIN, HEX, TRUNCATE, ENCODE/DECODE,
      // and the deterministic RAND_INTEGER variant. The oracle recomputes
      // each from DuckDB primitives (inclusive-endpoint overlap algebra,
      // floor/ceil-by-sign truncation, HUGEINT Mersenne-61 mul-add-mod).
      "q128_scalar_parity_tail",
      (s, d) => {
        import s.implicits._
        import graft.functions.sqlfns._
        Tables.orders(s, d).filter($"o_orderkey" < 200)
          .select($"o_orderkey",
            temporalOverlaps(
              $"o_orderdate", $"o_orderdate" + expr("INTERVAL 5 DAYS"),
              lit("1997-06-01").cast("timestamp"),
              lit("1997-06-30").cast("timestamp")).cast("long").as("overlaps97"),
            bin($"o_orderkey").as("bin_key"),
            hex($"o_orderkey").as("hex_key"),
            hex($"o_orderpriority").as("hex_pri"),
            truncateNum($"o_totalprice" / 7.0, 2).as("trunc2"),
            truncateNum(-$"o_totalprice" / 7.0, 2).as("trunc2_neg"),
            truncateNum($"o_totalprice", -2).as("trunc_hundreds"),
            decode(encode($"o_orderpriority", "UTF-8"), "UTF-8").as("enc_dec"),
            randInteger($"o_orderkey", 100).cast("long").as("rnd"))
          .orderBy($"o_orderkey")
      },
      Some(s"""
        |SELECT o_orderkey,
        |       CAST(GREATEST(LEAST(o_orderdate, o_orderdate + INTERVAL 5 DAY),
        |                     TIMESTAMP '1997-06-01') <=
        |            LEAST(GREATEST(o_orderdate, o_orderdate + INTERVAL 5 DAY),
        |                  TIMESTAMP '1997-06-30') AS BIGINT) AS overlaps97,
        |       bin(o_orderkey) AS bin_key,
        |       hex(o_orderkey) AS hex_key,
        |       hex(o_orderpriority) AS hex_pri,
        |       CASE WHEN o_totalprice >= 0 THEN floor(o_totalprice / 7.0 * 100.0) / 100.0
        |            ELSE ceil(o_totalprice / 7.0 * 100.0) / 100.0 END AS trunc2,
        |       CASE WHEN o_totalprice <= 0 THEN floor(-o_totalprice / 7.0 * 100.0) / 100.0
        |            ELSE ceil(-o_totalprice / 7.0 * 100.0) / 100.0 END AS trunc2_neg,
        |       CASE WHEN o_totalprice >= 0 THEN floor(o_totalprice * 0.01) / 0.01
        |            ELSE ceil(o_totalprice * 0.01) / 0.01 END AS trunc_hundreds,
        |       decode(encode(o_orderpriority)) AS enc_dec,
        |       CAST((CAST(${graft.functions.MinHashParams.aFor(777)} AS HUGEINT) *
        |             (o_orderkey & ${graft.functions.MinHashParams.Mask60}) +
        |             ${graft.functions.MinHashParams.bFor(777)})
        |            % ${graft.functions.MinHashParams.M61} % 100 AS BIGINT) AS rnd
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY o_orderkey
        |""".stripMargin)),

    GQuery(
      // SIMILAR TO (BuiltInFunctionDefinitions SIMILAR; runtime
      // SqlLikeUtils.similar) — the SQL:2016 dialect translated to an
      // anchored Java regex at plan time (Similar.scala), closing the last
      // translated-dialect gap in FUNCTIONS.md. The oracle recomputes each
      // pattern as a HAND-derived RE2 regex under DuckDB
      // regexp_full_match (DuckDB's own SIMILAR TO is raw regex, NOT the
      // SQL dialect — probing it: 'abc' SIMILAR TO 'a%' is false there).
      // r8: dialect realigned to the reference translator rule-for-rule —
      // '.' passes through as a regex any-char (Calcite semantics, NOT
      // PostgreSQL's literal dot: SqlLikeUtils.java:287 appends it
      // untouched), so sim_dot now matches every 'Customer#...' row; the
      // discriminating dialect cases are sim_wild/sim_rep ('%'/'_'
      // rewritten, where a raw-regex engine would treat them literally).
      "q129_similar_to",
      (s, d) => {
        import s.implicits._
        import graft.functions.Similar.similarTo
        Tables.customer(s, d).filter($"c_custkey" < 2000)
          .select($"c_custkey",
            similarTo($"c_mktsegment", "%(MACH|AUTO)%").cast("long").as("sim_contains"),
            similarTo($"c_mktsegment", "_U%").cast("long").as("sim_wild"),
            similarTo($"c_name", "Customer#[[:DIGIT:]]+").cast("long").as("sim_class"),
            similarTo($"c_mktsegment", "(BUILDING|HOUSEHOLD)").cast("long").as("sim_alt"),
            similarTo($"c_name", "Customer#0{4,9}1%").cast("long").as("sim_rep"),
            similarTo($"c_mktsegment", "M%Y").cast("long").as("sim_span"),
            similarTo($"c_name", "Customer.%").cast("long").as("sim_dot"),
            similarTo($"c_name", "%\\_%").cast("long").as("sim_esc"),
            similarTo($"c_mktsegment", "[^AB]%E").cast("long").as("sim_negcls"))
          .orderBy($"c_custkey")
      },
      Some("""
        |SELECT c_custkey,
        |       CAST(regexp_full_match(c_mktsegment, '.*(MACH|AUTO).*') AS BIGINT) AS sim_contains,
        |       CAST(regexp_full_match(c_mktsegment, '.U.*') AS BIGINT) AS sim_wild,
        |       CAST(regexp_full_match(c_name, 'Customer#[0-9]+') AS BIGINT) AS sim_class,
        |       CAST(regexp_full_match(c_mktsegment, '(BUILDING|HOUSEHOLD)') AS BIGINT) AS sim_alt,
        |       CAST(regexp_full_match(c_name, 'Customer#0{4,9}1.*') AS BIGINT) AS sim_rep,
        |       CAST(regexp_full_match(c_mktsegment, 'M.*Y') AS BIGINT) AS sim_span,
        |       CAST(regexp_full_match(c_name, 'Customer..*') AS BIGINT) AS sim_dot,
        |       CAST(regexp_full_match(c_name, '.*_.*') AS BIGINT) AS sim_esc,
        |       CAST(regexp_full_match(c_mktsegment, '[^AB].*E') AS BIGINT) AS sim_negcls
        |FROM customer WHERE c_custkey < 2000
        |ORDER BY c_custkey
        |""".stripMargin)),

    GQuery(
      // TIME type parity (LogicalTypeRoot TIME_WITHOUT_TIME_ZONE;
      // CURRENT_TIME/LOCAL_TIME BuiltInFunctionDefinitions.java:1452,1473)
      // — Spark 4.1 ships TimeType behind spark.sql.timeType.enabled
      // (set in every engine session builder), closing the last two
      // declared scalar gaps in FUNCTIONS.md. Deterministic derivations
      // (the wall-clock niladics themselves are un-oracle-able) exercise
      // make_time, VARCHAR→TIME cast, TIME comparison, min/max over TIME
      // ordering, field extraction, and TIME→VARCHAR cast, all checked
      // bit-exact against DuckDB's native TIME.
      "q134_time_type",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d).filter($"o_orderkey" < 2000)
          .withColumn("t", expr(
            """make_time(cast(o_orderkey % 24 as int),
              |          cast((o_orderkey * 7) % 60 as int),
              |          cast((o_orderkey * 13) % 60 as int))""".stripMargin))
          .withColumn("t2", expr(
            "cast(concat(lpad(cast(o_orderkey % 12 as string), 2, '0'), ':30:00') as time)"))
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("cnt"),
            sum(when(expr("t < to_time('12:00:00')"), 1L).otherwise(0L)).as("morning"),
            sum(when(expr("t >= t2"), 1L).otherwise(0L)).as("ge_t2"),
            expr("cast(min(t) as string)").as("min_t"),
            expr("cast(max(t) as string)").as("max_t"),
            expr("cast(sum(hour(t)) as bigint)").as("sum_hr"),
            expr("cast(max(minute(t)) * 60 + max(second(t)) as bigint)").as("max_ms"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        |SELECT o_orderpriority,
        |       count(*) AS cnt,
        |       CAST(sum(CASE WHEN t < TIME '12:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS morning,
        |       CAST(sum(CASE WHEN t >= t2 THEN 1 ELSE 0 END) AS BIGINT) AS ge_t2,
        |       CAST(min(t) AS VARCHAR) AS min_t,
        |       CAST(max(t) AS VARCHAR) AS max_t,
        |       CAST(sum(extract(hour FROM t)) AS BIGINT) AS sum_hr,
        |       CAST(max(extract(minute FROM t)) * 60 + max(extract(second FROM t)) AS BIGINT) AS max_ms
        |FROM (SELECT o_orderpriority,
        |             make_time(CAST(o_orderkey % 24 AS BIGINT),
        |                       CAST((o_orderkey * 7) % 60 AS BIGINT),
        |                       CAST((o_orderkey * 13) % 60 AS DOUBLE)) AS t,
        |             CAST(lpad(CAST(o_orderkey % 12 AS VARCHAR), 2, '0') || ':30:00' AS TIME) AS t2
        |      FROM orders WHERE o_orderkey < 2000) src
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority
        |""".stripMargin))
  )
}
