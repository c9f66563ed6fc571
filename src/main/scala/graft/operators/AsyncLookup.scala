package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

import java.util.concurrent.{ArrayBlockingQueue, Executors, TimeUnit}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Async lookup join: per-row point lookups against an external service
  * with bounded in-flight concurrency — ORDERED emission (input order) or
  * UNORDERED emission (completion order, the higher-throughput default in
  * practice: one slow lookup no longer gates everything behind it).
  *
  * Reference: flink-streaming-java .../operators/async/AsyncWaitOperator
  * .java:92 (ordered + unordered modes via AsyncDataStream.orderedWait/
  * unorderedWait, capacity, timeout) + table lookup joins via
  * AsyncLookupFunction (flink-table-runtime .../join/lookup/
  * AsyncLookupJoinRunner.java:44).
  *
  * Spark has no built-in async operator; the idiomatic port is
  * mapPartitions with a sliding window of Futures: up to `capacity`
  * requests in flight per partition, results emitted in input order (the
  * operator's pipeline parallelism = #partitions x capacity). The lookup
  * function must be serializable; connection pools should live in a
  * per-executor lazy singleton.
  */
object AsyncLookup {

  /** Fixed-delay retry wrapper for flaky lookup services (Flink's
    * retryable lookup, AsyncRetryStrategies). */
  def withRetry[I, O](attempts: Int, delayMs: Long)(lookup: I => O): I => O = {
    require(attempts >= 1, s"withRetry needs at least one attempt, got $attempts")
    in =>
    var left = attempts
    var result: Option[O] = None
    var lastErr: Throwable = null
    while (result.isEmpty && left > 0) {
      try result = Some(lookup(in))
      catch {
        case e: Throwable =>
          lastErr = e; left -= 1
          if (left > 0 && delayMs > 0) Thread.sleep(delayMs)
      }
    }
    result.getOrElse(throw lastErr)
  }

  def ordered[I, O](
      ds: Dataset[I], capacity: Int, timeoutMs: Long)(
      lookup: I => O)(implicit e: Encoder[(I, O)]): Dataset[(I, O)] =
    ds.mapPartitions(rows => orderedIter(rows, capacity, timeoutMs)(lookup))

  /** Partition-level ORDERED window — shared by [[ordered]] and the
    * LOOKUP-hinted SQL join ([[graft.TemporalSql.sqlLookup]]), which
    * probes Row iterators the Dataset encoder surface can't type. */
  def orderedIter[I, O](rows: Iterator[I], capacity: Int, timeoutMs: Long)(
      lookup: I => O): Iterator[(I, O)] = {
    require(capacity > 0)
    // Per-partition bounded async window. Daemon threads + shutdown on
    // both success and failure paths: a timed-out lookup must not pin the
    // executor JVM.
    val pool = Executors.newFixedThreadPool(capacity, r => {
      val t = new Thread(r, "graft-async-lookup")
      t.setDaemon(true)
      t
    })
    // limit()/take(n) stop pulling the iterator before it drains — the
    // completion listener is the only reliable shutdown then (threads
    // are daemons, but in-flight lookups would keep hitting the service)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val inFlight = new ArrayBlockingQueue[(I, Future[O])](capacity)

    def drainOne(): (I, O) = {
      val (in, fut) = inFlight.take()
      try in -> Await.result(fut, Duration(timeoutMs, TimeUnit.MILLISECONDS))
      catch { case e: Throwable => pool.shutdownNow(); throw e }
    }

    new Iterator[(I, O)] {
      override def hasNext: Boolean = {
        val more = rows.hasNext || !inFlight.isEmpty
        if (!more) pool.shutdown()
        more
      }
      override def next(): (I, O) = {
        while (rows.hasNext && inFlight.remainingCapacity() > 0) {
          val in = rows.next()
          inFlight.put((in, Future(lookup(in))))
        }
        drainOne()
      }
    }
  }

  /** UNORDERED async lookup (AsyncDataStream.unorderedWait): results emit
    * in COMPLETION order, so fast lookups overtake a slow head-of-line
    * request — the throughput-oriented mode. Same bounded in-flight window
    * per partition; `timeoutMs` bounds each wait for the next completion
    * (a window full of stuck lookups fails the task rather than hanging
    * the executor). */
  def unordered[I, O](
      ds: Dataset[I], capacity: Int, timeoutMs: Long)(
      lookup: I => O)(implicit e: Encoder[(I, O)]): Dataset[(I, O)] =
    ds.mapPartitions(rows => unorderedIter(rows, capacity, timeoutMs)(lookup))

  /** Partition-level UNORDERED window (see [[orderedIter]]). */
  def unorderedIter[I, O](rows: Iterator[I], capacity: Int, timeoutMs: Long)(
      lookup: I => O): Iterator[(I, O)] = {
    require(capacity > 0)
    val pool = Executors.newFixedThreadPool(capacity, r => {
      val t = new Thread(r, "graft-async-lookup-unordered")
      t.setDaemon(true)
      t
    })
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val completed =
      new java.util.concurrent.LinkedBlockingQueue[(I, scala.util.Try[O])]()
    var inFlight = 0

    new Iterator[(I, O)] {
      override def hasNext: Boolean = {
        val more = rows.hasNext || inFlight > 0
        if (!more) pool.shutdown()
        more
      }
      override def next(): (I, O) = {
        while (rows.hasNext && inFlight < capacity) {
          val in = rows.next()
          inFlight += 1
          Future(lookup(in)).onComplete(t => completed.put((in, t)))
        }
        val polled = completed.poll(timeoutMs, TimeUnit.MILLISECONDS)
        if (polled == null) {
          pool.shutdownNow()
          throw new java.util.concurrent.TimeoutException(
            s"async lookup: no completion within ${timeoutMs}ms")
        }
        inFlight -= 1
        polled._2 match {
          case scala.util.Success(v) => (polled._1, v)
          case scala.util.Failure(err) => pool.shutdownNow(); throw err
        }
      }
    }
  }
}
