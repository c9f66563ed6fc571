package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Broadcast state pattern (flink-streaming-java
  * BroadcastConnectedStream.java + BroadcastState): a low-throughput
  * control/dimension side is made available to every task processing the
  * main stream.
  *
  * Spark mapping: in micro-batch execution the natural equivalent is a
  * PER-BATCH refreshed broadcast join inside foreachBatch — every batch
  * observes the latest dimension snapshot (Flink's broadcast state updates
  * between elements; micro-batching quantizes that to batch boundaries,
  * the same trade Structured Streaming makes everywhere else).
  */
object BroadcastDim {

  /** Attach a per-batch-refreshed broadcast enrichment to a stream.
    * `loadDim` runs on the driver each micro-batch (rate-limited by the
    * trigger interval); `sink` writes the enriched batch. */
  def enrichPerBatch(
      stream: DataFrame,
      loadDim: () => DataFrame,
      joinCond: (DataFrame, DataFrame) => Column,
      joinType: String = "left")(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val dim = loadDim()
      sink(batch.join(broadcast(dim), joinCond(batch, dim), joinType), batchId)
    }
}
