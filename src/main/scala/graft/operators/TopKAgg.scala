package graft.operators

import graft.{GQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per group as a COMBINE-ENABLED aggregate.
  *
  * The aggregator keeps a k-bounded buffer with reduce/merge, so Spark
  * runs it as partial aggregation: each map task pre-trims its local rows
  * to k per group BEFORE the exchange, and the shuffle carries at most
  * k * mappers * groups buffers instead of the whole table.
  *
  * Honest scale note (measured in ScaleSpec, not assumed): Spark 4's
  * InferWindowGroupLimit already rewrites `row_number() <= k` window
  * filters (q08's pattern) into a map-side WindowGroupLimit, so the
  * classic window form is ALSO k-bounded pre-shuffle. This aggregate
  * remains the portable form — it composes with other aggregates in the
  * same groupBy, works where the rank-filter pattern isn't syntactically
  * recognizable, and carries k-bounded BUFFERS (one per group) rather
  * than k rows per group per mapper.
  *
  * Reference: flink-table-runtime .../rank/ (batch rank); the buffer
  * contract mirrors AppendOnlyTopNFunction's bounded state.
  */
object TopKAgg extends QueryModule {

  /** Keeps the k largest (score, id) pairs; ties break on the smaller id
    * so the result is deterministic under any partial/merge order. */
  final class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (score, id) => (-score, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
      // the buffer is kept trimmed+sorted (every producer runs trim), so
      // a full buffer whose cutoff beats the new row can reject it in
      // O(1) — re-sorting k elements per input row dominated the
      // map-side combine on large fact tables
      if (b.size >= k) {
        val (cutScore, cutId) = b.last
        if (a._1 < cutScore || (a._1 == cutScore && a._2 > cutId)) return b
      }
      trim(b :+ a)
    }
    override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(b1 ++ b2)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Top-k rows per group with map-side combining: one exchange carrying
    * k-bounded partials. Output: (groupCols..., rk, score, id). */
  def topKPerGroup(
      df: DataFrame, groupCol: String, scoreCol: String, idCol: String,
      k: Int): DataFrame = {
    val topk = udaf(new TopK(k))
    df.groupBy(col(groupCol))
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("i", "e")))
      .select(col(groupCol), (col("i") + 1).cast("long").as("rk"),
        col("e._1").as("score"), col("e._2").as("id"))
  }

  def queries: Seq[GQuery] = Seq(
    GQuery(
      // Same answer as a window-rank top-3, radically different plan: the
      // aggregate combines map-side, so the exchange carries only
      // k-bounded buffers (PlanSpec pins the partial_topk shape).
      "q78_topk_partial_agg",
      (s, d) => {
        import s.implicits._
        topKPerGroup(
          Tables.orders(s, d)
            .select($"o_orderpriority", graft.Bits.dec($"o_totalprice").cast("double").as("p"),
              $"o_orderkey"),
          "o_orderpriority", "p", "o_orderkey", k = 3)
          .select($"o_orderpriority", $"rk", $"id".as("o_orderkey"),
            $"score".as("price"))
          .orderBy($"o_orderpriority", $"rk")
      },
      Some("""
        |WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) DESC,
        |                    o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, price
        |FROM r WHERE rk <= 3
        |ORDER BY o_orderpriority, rk
        |""".stripMargin))
  )
}
