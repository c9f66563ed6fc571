package graft.cep

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP / MATCH_RECOGNIZE-style sequence detection.
  *
  * Reference: the Flink CEP library — NFA over keyed streams
  * (flink-libraries/flink-cep .../nfa/NFA.java:86, CepOperator.java:82) and
  * the SQL MATCH_RECOGNIZE bridge (flink-table-runtime .../match/).
  *
  * Scope implemented here (the common funnel-detection core):
  *  - a linear pattern A -> B -> ... -> Z of named steps, each a predicate;
  *  - SKIP-TO-NEXT-ROW=false semantics: AFTER MATCH SKIP PAST LAST ROW
  *    (matches never overlap; Flink's default `afterMatch(skipPastLastEvent)`);
  *  - relaxed contiguity (FOLLOWED BY): non-matching events between steps
  *    are skipped;
  *  - optional `within` horizon: a partial match older than the horizon is
  *    pruned (NFA.java's window timeout).
  *
  * Two executors share the single-pass matcher:
  *  - batch: sort each key's rows by (time, tie) inside
  *    `groupByKey.flatMapGroups` — one shuffle, per-key linear scan. Keys are
  *    the distribution unit exactly like Flink's keyed CEP, so 100 TB scales
  *    horizontally with key cardinality;
  *  - streaming: `flatMapGroupsWithState` holding (partialStepIdx,
  *    stepTimes) per key; micro-batches feed the same matcher
  *    incrementally. Requires per-key event-time order within a batch
  *    (guaranteed by sorting the batch iterator) and monotone batches for
  *    exactness — the append-only funnel case.
  */
object Cep {

  /** One event as seen by the matcher. */
  final case class Ev(t: Long, step: Int, tie: Long)

  /** A completed match: the event time of each step. */
  final case class Match(times: Seq[Long])

  /** Single-pass matcher over time-ordered events of one key.
    * `state`: times of the currently-bound steps (partial match).
    * Returns (matches, finalState). */
  private[graft] def scan(
      events: Iterator[Ev], nSteps: Int, within: Long,
      init: List[Long]): (List[Match], List[Long]) = {
    var bound = init // reversed: most recent bound step first
    val out = List.newBuilder[Match]
    events.foreach { e =>
      // prune expired partial match
      if (bound.nonEmpty && within > 0 && e.t - bound.last > within) bound = Nil
      val nextStep = bound.length
      if (e.step == nextStep) {
        bound = e.t :: bound
        if (bound.length == nSteps) {
          out += Match(bound.reverse)
          bound = Nil // AFTER MATCH SKIP PAST LAST ROW
        }
      } else if (e.step == 0 && bound.isEmpty) {
        bound = List(e.t)
      }
      // else: relaxed contiguity — ignore the event
    }
    (out.result(), bound)
  }

  /** Batch CEP: detect the pattern per key over a sorted event history.
    * Input columns: key: Long, t: Long (event time), step: Int (the pattern
    * step this event satisfies, -1 if none), tie: Long (deterministic order
    * for equal times). Output: (key, step times array). */
  def detectBatch(
      spark: SparkSession, events: DataFrame,
      nSteps: Int, within: Long): DataFrame = {
    import spark.implicits._
    val ds = events.select(
        col("key").cast("long"), col("t").cast("long"),
        col("step").cast("int"), col("tie").cast("long"))
      .as[(Long, Long, Int, Long)]
    ds.groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._2, r._4))
          .iterator.map(r => Ev(r._2, r._3, r._4))
        scan(sorted, nSteps, within, Nil)._1.iterator
          .map(m => (key, m.times))
      }
      .toDF("key", "step_times")
  }

  /** Streaming CEP over an append stream (same input contract; state is the
    * partial match per key). */
  def detectStream(
      ds: Dataset[(Long, Long, Int, Long)], nSteps: Int, within: Long)(
      implicit ek: Encoder[Long],
      e1: Encoder[List[Long]],
      e2: Encoder[(Long, Seq[Long])]): Dataset[(Long, Seq[Long])] = {
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Int, Long)], state: GroupState[List[Long]]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._4))
            .iterator.map(r => Ev(r._2, r._3, r._4))
          val (matches, next) =
            scan(sorted, nSteps, within, state.getOption.getOrElse(Nil))
          state.update(next)
          matches.iterator.map(m => (key, m.times))
      }
  }
}
