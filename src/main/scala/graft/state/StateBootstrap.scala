package graft.state

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.streaming.state._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

import java.nio.charset.StandardCharsets

/** Savepoint BOOTSTRAP — the write half of the State Processor API
  * (reference: flink-libraries/flink-state-processing-api
  * .../SavepointWriter.java: build state with bootstrap transformations,
  * then write it through the runtime's own state backends so a new job
  * can start from the produced savepoint).
  *
  * Spark analog: per-key aggregation state rows are written through
  * Spark's own `HDFSBackedStateStoreProvider` (so the delta file format,
  * compression and layout are the engine's, not ours) into a fresh
  * checkpoint directory, alongside hand-written `offsets/0`, `commits/0`
  * and `metadata` entries declaring "batch 0 committed with this state".
  * A streaming query started on that checkpoint loads state version 1 —
  * the bootstrapped rows — before its first real micro-batch, exactly
  * Flink's start-from-savepoint semantics.
  *
  * The state rows are partitioned with the SAME hash partitioning
  * (`repartition(n, keyCols)` = Catalyst `HashPartitioning`) Spark's
  * streaming aggregation uses for its state exchange, so every row lands
  * in the store partition the restarted query will probe.
  */
object StateBootstrap {

  /** Write `state` (key columns ++ aggregation-buffer columns) as the
    * committed batch-0 aggregation state of a NEW checkpoint at
    * `checkpointDir`.
    *
    * @param keyCols          the grouping columns (state-store key)
    * @param sourceOffsetsJson one serialized offset PER SOURCE of the
    *                         query that will restart from this
    *                         checkpoint ("-1" = a MemoryStream that has
    *                         consumed nothing)
    * @param batchWatermarkMs the event-time watermark to resume with
    */
  def writeAggregationState(
      spark: SparkSession,
      checkpointDir: String,
      state: DataFrame,
      keyCols: Seq[String],
      sourceOffsetsJson: Seq[String] = Seq("-1"),
      batchWatermarkMs: Long = 0L,
      operatorId: Long = 0L): Unit = {
    val numPartitions = spark.sessionState.conf.numShufflePartitions
    val allCols = state.schema.fieldNames.toSeq
    require(keyCols.forall(allCols.contains),
      s"key columns ${keyCols.mkString(",")} must exist in ${allCols.mkString(",")}")
    val valueCols = allCols.filterNot(keyCols.contains)
    // schemas in keyCols/valueCols ORDER (not state-DF schema order): the
    // rows below are projected keyCols ++ valueCols, and the projections
    // bind by position — a caller passing keyCols out of schema order
    // must not get swapped/mistyped key fields
    val keySchema = StructType(keyCols.map(n => state.schema(n)))
    val valueSchema = StructType(valueCols.map(n => state.schema(n)))

    // key-first projection, partitioned like the streaming aggregate's
    // state exchange
    val ordered = state.select((keyCols ++ valueCols).map(col): _*)
      .repartition(numPartitions, keyCols.map(col): _*)
    val stateRoot = new Path(checkpointDir, "state").toString
    val nKey = keySchema.length
    val providerClass = spark.sessionState.conf.stateStoreProviderClass
    // ship the SESSION's state-store conf + hadoop conf to the executors:
    // offsets/0 pins these same values (codec, provider), so the delta
    // files must be written under them, and object stores need the
    // session's fs credentials
    val storeConf = new StateStoreConf(spark.sessionState.conf)
    val hadoopKvs = {
      import scala.jdk.CollectionConverters._
      spark.sessionState.newHadoopConf().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }

    val writtenPids = ordered.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val provider = newProvider(providerClass,
        StateStoreId(stateRoot, operatorId, pid), keySchema, valueSchema,
        storeConf, hadoopKvs)
      val store = provider.getStore(0L)
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      val keyProj = UnsafeProjection.create(keySchema.fields.zipWithIndex.map {
        case (f, i) => BoundReference(i, f.dataType, f.nullable)
      }.toSeq)
      val valProj = UnsafeProjection.create(valueSchema.fields.zipWithIndex.map {
        case (f, i) => BoundReference(nKey + i, f.dataType, f.nullable)
      }.toSeq)
      rows.foreach { r =>
        store.put(keyProj(r).copy(), valProj(r).copy())
      }
      store.commit() // publishes state version 1 for this partition
      provider.close()
      Iterator.single(pid)
    }.collect().toSet

    // EVERY partition must hold a committed version-1 store, including
    // ones no key hashed into — the restarted query loads version 1 in
    // all of them. The complement comes from the pids the write job
    // actually ran (provider-agnostic: probing for 1.delta only works
    // for the HDFS-backed layout, and re-committing over a partition the
    // executors DID write would erase its rows in providers that keep
    // state outside per-version files).
    (0 until numPartitions).filterNot(writtenPids).foreach { pid =>
      val provider = newProvider(providerClass,
        StateStoreId(stateRoot, operatorId, pid), keySchema, valueSchema,
        storeConf, hadoopKvs)
      provider.getStore(0L).commit() // empty version 1
      provider.close()
    }

    writeStateSchema(spark, stateRoot, operatorId, keySchema, valueSchema)
    writeOperatorMetadata(spark, stateRoot, operatorId, numPartitions)
    writeBatchZeroLogs(spark, checkpointDir, sourceOffsetsJson, batchWatermarkMs)
  }

  /** Instantiate + init the session's configured StateStoreProvider by
    * class name (the provider classes are sql-package-private; the trait
    * is public — same loading route the engine's own StateStore object
    * takes). */
  private def newProvider(className: String, id: StateStoreId,
      keySchema: StructType, valueSchema: StructType,
      storeConf: StateStoreConf, hadoopKvs: Array[(String, String)]): StateStoreProvider = {
    val p = Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[StateStoreProvider]
    val hadoopConf = new Configuration()
    hadoopKvs.foreach { case (k, v) => hadoopConf.set(k, v) }
    // the provider asserts a streaming run id (StreamExecution.RUN_ID_KEY);
    // the bootstrap is its own "run"
    hadoopConf.set("sql.streaming.runId", java.util.UUID.randomUUID().toString)
    p.init(id, keySchema, valueSchema, NoPrefixKeyStateEncoderSpec(keySchema),
      useColumnFamilies = false, storeConf,
      hadoopConf, useMultipleValuesPerKey = false,
      stateSchemaProvider = None)
    p
  }

  /** The state schema file the engine's compatibility checker (and the
    * `statestore` batch reader) consult: schema format v2 — writeUTF
    * version tag, then key and value schema JSON in 64k writeUTF chunks —
    * at `state/<op>/0/_metadata/schema` (partition 0's directory, where
    * the checker looks). */
  private def writeStateSchema(spark: SparkSession, stateRoot: String,
      operatorId: Long, keySchema: StructType, valueSchema: StructType): Unit = {
    val path = new Path(s"$stateRoot/$operatorId/0/_metadata/schema")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val out = new java.io.DataOutputStream(fs.create(path, true))
    try {
      out.writeUTF("v2")
      Seq(keySchema, valueSchema).foreach { s =>
        val chunks = s.json.grouped(65535).toSeq
        out.writeInt(chunks.length)
        chunks.foreach(out.writeUTF)
      }
    } finally out.close()
  }

  /** Operator metadata (`state/<op>/_metadata/metadata`) — store names +
    * partition count, consumed by state tooling. */
  private def writeOperatorMetadata(spark: SparkSession, stateRoot: String,
      operatorId: Long, numPartitions: Int): Unit =
    write(spark, new Path(s"$stateRoot/$operatorId/_metadata/metadata"),
      s"""v1\n{"operatorInfo":{"operatorId":$operatorId,""" +
        s""""operatorName":"stateStoreSave"},""" +
        s""""stateStoreInfo":[{"storeName":"default","numColsPrefixKey":0,""" +
        s""""numPartitions":$numPartitions}]}""")

  /** The checkpoint's tiny text logs: metadata (query id), offsets/0
    * (batch 0's offsets + the conf entries the engine pins per
    * checkpoint) and commits/0 (batch 0 committed). Formats are the
    * HDFSMetadataLog text layouts. */
  private def writeBatchZeroLogs(
      spark: SparkSession, checkpointDir: String,
      sourceOffsetsJson: Seq[String], batchWatermarkMs: Long): Unit = {
    val conf = spark.sessionState.conf
    val pinned = Map(
      SQLConf.SHUFFLE_PARTITIONS.key -> conf.numShufflePartitions.toString,
      SQLConf.STATE_STORE_PROVIDER_CLASS.key -> conf.stateStoreProviderClass,
      SQLConf.STREAMING_MULTIPLE_WATERMARK_POLICY.key -> "min",
      SQLConf.STREAMING_AGGREGATION_STATE_FORMAT_VERSION.key -> "2",
      SQLConf.FLATMAPGROUPSWITHSTATE_STATE_FORMAT_VERSION.key -> "2",
      SQLConf.STREAMING_JOIN_STATE_FORMAT_VERSION.key -> "2",
      SQLConf.STATE_STORE_COMPRESSION_CODEC.key -> conf.stateStoreCompressionCodec,
      SQLConf.STATEFUL_OPERATOR_USE_STRICT_DISTRIBUTION.key -> "true")
    val confJson = pinned.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val meta = s"""{"batchWatermarkMs":$batchWatermarkMs,""" +
      s""""batchTimestampMs":${System.currentTimeMillis()},"conf":{$confJson}}"""
    write(spark, new Path(checkpointDir, "metadata"),
      s"""{"id":"${java.util.UUID.randomUUID()}"}""")
    write(spark, new Path(checkpointDir, "offsets/0"),
      (Seq("v1", meta) ++ sourceOffsetsJson).mkString("\n"))
    write(spark, new Path(checkpointDir, "commits/0"),
      s"""v1\n{"nextBatchWatermarkMs":$batchWatermarkMs}""")
  }

  private def write(spark: SparkSession, path: Path, content: String): Unit = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    val out = fs.create(path, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
