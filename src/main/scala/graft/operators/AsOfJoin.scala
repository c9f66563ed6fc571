package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (FOR SYSTEM_TIME AS OF / temporal join).
  *
  * Reference semantics: flink-table-runtime
  * .../operators/join/temporal/TemporalRowTimeJoinOperator.java:78 — for
  * each left row, pick the single right row with the greatest time <= the
  * left row's time for the same key.
  *
  * Spark has no built-in as-of join, and the naive range join
  * (l JOIN r ON key AND r.t <= l.t, then row_number) explodes to
  * O(|l| * |matches|) intermediate rows. This implementation instead
  * union-tags both sides and takes ONE sort-shuffle on (key, t):
  * `last(right_payload, ignoreNulls)` over rows-unbounded-preceding
  * propagates the latest right row to each left row. Cost is a single
  * exchange + sort of |l|+|r| rows — the plan that still works when both
  * sides are 100 TB (state never exceeds one key-group's sort run, skew is
  * handled by AQE the same as any sort-merge join).
  *
  * Tie rule: right rows at the same key/time sort BEFORE left rows
  * (side 0 < 1), so `<=` is inclusive; among equal right times the highest
  * `tieBreak` wins.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame =
    backward(left, right, Seq(key), leftTime, rightTime, rightPayload, tieBreak)

  /** Composite-key backward as-of join: both sides must carry the key
    * columns under the same names (rename the dim side first). Same
    * single sort-shuffle plan — the window just partitions on all keys. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")

    val leftCols = left.columns.toSeq
    val kCols = keys.map(k => s"__k_$k")
    // SQL equi-join semantics: a NULL key matches NOTHING. The window
    // partitioning below groups NULLs together, so null-keyed right rows
    // must not enter the union (a null-keyed left row then sees an empty
    // partition and comes back with a null payload, exactly like a
    // FOR SYSTEM_TIME AS OF join would return it).
    val rightNonNull = keys.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
      .withColumn("__rp", lit(null).cast(structTypeOf(right, rightPayload)))
      .select((keys.zip(kCols).map { case (k, a) => col(k).as(a) } ++
        Seq(col("__t"), col("__side"), col("__tie"), col("__rp")) ++
        leftCols.map(col)): _*)

    val r = rightNonNull
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(tieBreak).cast("long"))
      .withColumn("__rp", struct(rightPayload.map(col): _*))
      .select((keys.zip(kCols).map { case (k, a) => col(k).as(a) } ++
        Seq(col("__t"), col("__side"), col("__tie"), col("__rp")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(kCols.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(r)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * time >= left time (same key). Same single sort-shuffle algorithm as
    * `backward`, scanning descending; ties on right time resolve to the
    * smallest tieBreak. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MinValue))
      .withColumn("__rp", lit(null).cast(structTypeOf(right, rightPayload)))
      .select((Seq(col(key).as("__k"), col("__t"), col("__side"), col("__tie"), col("__rp")) ++
        leftCols.map(col)): _*)

    val r = right
      .filter(col(key).isNotNull) // NULL keys match nothing (same as backward)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(tieBreak).cast("long"))
      .withColumn("__rp", struct(rightPayload.map(col): _*))
      .select((Seq(col(key).as("__k"), col("__t"), col("__side"), col("__tie"), col("__rp")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // descending time: right rows before left rows at equal t (inclusive >=),
    // ties among rights ordered by tie desc so `last` picks the SMALLEST.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side"), col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(r)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))

  /** Interval join: l rows matched to r rows of the same key with
    * r.time in (l.time + lower, l.time + upper]. Expressed as an equi-join
    * with a range predicate so Catalyst plans a shuffled hash / sort-merge
    * join on the key with the range as a post-filter.
    * Reference: .../operators/join/interval/TimeIntervalJoin.java. */
  def interval(
      left: DataFrame, right: DataFrame,
      key: Column, cond: Column): DataFrame =
    left.join(right, key && cond)
}
