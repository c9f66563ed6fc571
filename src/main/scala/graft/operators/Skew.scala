package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. AQE's skew-join splitting covers sort-merge
  * joins automatically; explicit salting remains the tool for aggregations
  * over pathological keys and for engines/paths AQE doesn't reach.
  *
  * Reference analog: Flink handles skew via rebalance()/rescale()
  * (DataStream.java:360-503) and local-global aggregation
  * (TwoStageOptimizedAggregateRule); salting is the same local-global idea
  * with an explicit random prefix.
  */
object Skew {

  /** Two-stage (salted) aggregation: aggregate on (key, salt) first —
    * spreading a hot key over `saltFactor` reducers — then merge the salted
    * partials. `partialAggs` must be decomposable (sum/count/min/max style:
    * merge = same function over partials). */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], saltFactor: Int,
      partialAggs: Seq[(String, String)] /* (col, fn) */): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        expr(s"${partialAggs.head._2}(${partialAggs.head._1}) AS __p0"),
        partialAggs.tail.zipWithIndex.map { case ((c, f), i) =>
          expr(s"$f($c) AS __p${i + 1}")
        }: _*)
    val merge = partialAggs.zipWithIndex.map { case ((c, f), i) =>
      val mergeFn = if (f.toLowerCase == "count") "sum" else f
      expr(s"$mergeFn(__p$i) AS ${f}_$c")
    }
    stage1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed LEFT side against a
    * small right side: right rows are replicated saltFactor times so the
    * hot key's left rows spread over saltFactor tasks. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
