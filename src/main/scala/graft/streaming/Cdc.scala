package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Explicit-changelog layer: Spark has no engine-level RowKind
  * (flink-core .../types/RowKind.java:31 — +I/-U/+U/-D flows through every
  * Flink streaming operator), so we adopt the SURVEY.md §7.6 convention: a
  * `row_kind` string column carried explicitly, produced by CDC decoders
  * and consumed by the changelog operators below.
  */
object Cdc {

  val RowKind = "row_kind"
  val Insert = "+I"
  val UpdateBefore = "-U"
  val UpdateAfter = "+U"
  val Delete = "-D"

  /** Decode a Debezium JSON envelope stream (columns: `value` string) into
    * flat rows + row_kind. Emits -U/+U pairs for updates like Flink's
    * debezium-json format (flink-formats/flink-json/.../debezium/
    * DebeziumJsonDeserializationSchema.java).
    * `payloadSchema` is the row schema of before/after. */
  def decodeDebezium(raw: DataFrame, payloadSchema: StructType): DataFrame = {
    val envelope = new StructType()
      .add("op", "string").add("ts_ms", "long")
      .add("before", payloadSchema).add("after", payloadSchema)
    val parsed = raw.select(from_json(col("value"), envelope).as("e"))
    val inserts = parsed.filter(col("e.op").isin("c", "r"))
      .select(lit(Insert).as(RowKind), col("e.ts_ms").as("cdc_ts"), col("e.after.*"))
    val deletes = parsed.filter(col("e.op") === "d")
      .select(lit(Delete).as(RowKind), col("e.ts_ms").as("cdc_ts"), col("e.before.*"))
    val updBefore = parsed.filter(col("e.op") === "u")
      .select(lit(UpdateBefore).as(RowKind), col("e.ts_ms").as("cdc_ts"), col("e.before.*"))
    val updAfter = parsed.filter(col("e.op") === "u")
      .select(lit(UpdateAfter).as(RowKind), col("e.ts_ms").as("cdc_ts"), col("e.after.*"))
    inserts.unionByName(deletes).unionByName(updBefore).unionByName(updAfter)
  }

  /** Drop -U rows (flink-table-runtime .../misc/DropUpdateBeforeFunction
    * .java) — legal whenever the downstream operator is upsert-keyed. */
  def dropUpdateBefore(changelog: DataFrame): DataFrame =
    changelog.filter(col(RowKind) =!= UpdateBefore)

  /** SinkUpsertMaterializer (flink-table-runtime .../sink/
    * SinkUpsertMaterializer.java): collapse a changelog batch to the final
    * per-key row before writing to an upsert sink. Keeps the row with the
    * greatest (orderCol, tieBreak); keys whose last change is a delete are
    * dropped. Run inside foreachBatch. */
  def upsertMaterialize(
      changelog: DataFrame, keys: Seq[String],
      orderCol: String, tieBreak: String): DataFrame = {
    // At equal (orderCol, tieBreak) — e.g. the -U/+U pair one update emits —
    // the after-image (+I/+U) is logically later than the before-image.
    val kindRank = when(col(RowKind).isin(Insert, UpdateAfter), 1).otherwise(0)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieBreak).desc, kindRank.desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(RowKind).isin(Insert, UpdateAfter))
      .drop("__rn")
  }

  /** Append-only view of a changelog (retract-free consumers). */
  def appendOnly(changelog: DataFrame): DataFrame =
    changelog.filter(col(RowKind).isin(Insert, UpdateAfter))
}
