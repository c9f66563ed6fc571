package graft.cep

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** GROUP patterns — quantifiers over a SUB-PATTERN (flink-cep
  * pattern/GroupPattern.java: `Pattern.begin(subPattern).times(n)`,
  * `.oneOrMore()`, `.optional()`), the round-3 Pattern-API parity gap.
  *
  * Compilation, not a second engine: a group pattern compiles onto the
  * existing linear NFA —
  *  - `times(m,n)`: the sub-pattern is INLINE-EXPANDED into n copies; the
  *    copies beyond the first m are optional-group SPANS wired through
  *    `Pattern.skipTo` (a run placed at an optional copy's head may ε-skip
  *    past ALL remaining copies — all-or-nothing per copy, and repetition
  *    counts are canonical prefixes so no duplicate matches);
  *  - `oneOrMore`: ONE copy plus a `Pattern.loopTo` cycle from the copy's
  *    last step back to its head — every traversal branches continue vs
  *    advance, emitting a match per repetition count (Flink's un-greedy
  *    group default);
  *  - `optional`: times(0,1).
  *
  * Events carry masks over LOGICAL steps (bit i = satisfies the i-th
  * inner step across all segments); `expandMask` replicates bits to the
  * expanded copies and `foldStepTimes` merges copy bindings back, so
  * callers never see the expansion. Inner steps may themselves carry
  * quantifiers (`begin(A.times(2) B).oneOrMore` works). Nested groups and
  * SkipToFirst/SkipToLast with groups are out of scope (documented).
  */
object GroupCep {
  import Cep._

  /** One pattern segment: `steps` is the sub-pattern, repeated between
    * `min` and `max` times as a whole; max = -1 means unbounded
    * (oneOrMore). A plain step is a 1-step segment with min=max=1. */
  final case class Seg(steps: IndexedSeq[StepDef], min: Int = 1, max: Int = 1) {
    require(steps.nonEmpty, "a segment needs at least one step")
    require(min >= 0, "min repetitions must be >= 0")
    require(max == -1 || max >= math.max(min, 1),
      "max repetitions must be -1 (unbounded) or >= max(min, 1)")
    require(max != -1 || min == 1, "unbounded groups are oneOrMore: min must be 1")
  }
  object Seg {
    def step(s: StepDef = StepDef()): Seg = Seg(IndexedSeq(s))
    def times(n: Int, steps: StepDef*): Seg = Seg(steps.toIndexedSeq, n, n)
    def timesRange(m: Int, n: Int, steps: StepDef*): Seg = Seg(steps.toIndexedSeq, m, n)
    def optional(steps: StepDef*): Seg = Seg(steps.toIndexedSeq, 0, 1)
    def oneOrMore(steps: StepDef*): Seg = Seg(steps.toIndexedSeq, 1, -1)
  }

  /** Compiled group pattern: the expanded linear NFA pattern, plus the
    * expanded-step -> logical-step fold map. */
  final case class Compiled(pattern: Pattern, fold: IndexedSeq[Int], nLogical: Int) {

    /** Replicate a logical-step bitmask onto the expanded steps. */
    def expandMask(logical: Long): Long = {
      var m = 0L
      var j = 0
      while (j < fold.length) {
        if ((logical >>> fold(j) & 1L) == 1L) m |= 1L << j
        j += 1
      }
      m
    }

    /** Column form of `expandMask` — stays in codegen. */
    def expandMaskCol(mask: Column): Column =
      fold.zipWithIndex.map { case (li, j) =>
        when(shiftright(mask, li).bitwiseAND(lit(1L)) === lit(1L), lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)

    /** Merge expanded per-step time arrays back to logical steps. */
    def foldStepTimes(st: Seq[Seq[Long]]): Seq[Seq[Long]] =
      (0 until nLogical).map { i =>
        fold.zipWithIndex.collect { case (li, j) if li == i => st(j) }
          .flatten.sorted
      }

    /** Column form of `foldStepTimes`. */
    def foldStepTimesCol(st: Column): Column =
      array((0 until nLogical).map { i =>
        val parts = fold.zipWithIndex.collect {
          case (li, j) if li == i => st.getItem(j)
        }
        sort_array(flatten(array(parts: _*)))
      }: _*)
  }

  def compile(segs: Seq[Seg], within: Long = 0L,
      after: AfterMatch = AfterMatch.SkipPastLast,
      maxRuns: Int = 64): Compiled = {
    require(segs.nonEmpty, "pattern needs at least one segment")
    after match {
      case AfterMatch.SkipToFirst(_) | AfterMatch.SkipToLast(_) =>
        throw new IllegalArgumentException(
          "SkipToFirst/SkipToLast are not supported with group patterns " +
            "(step identity is ambiguous across copies)")
      case _ => ()
    }
    val steps = IndexedSeq.newBuilder[StepDef]
    val fold = IndexedSeq.newBuilder[Int]
    var skipTo = Map.empty[Int, Int]
    var loopTo = Map.empty[Int, Int]
    var expanded = 0
    var logical = 0
    segs.foreach { seg =>
      val k = seg.steps.length
      val base = expanded
      if (seg.max == -1) {
        // oneOrMore group: one copy + NFA cycle last-step -> head
        require(seg.steps.last.quant == Quant.One && !seg.steps.last.negated,
          "a oneOrMore group's last inner step must be a plain single step " +
            "(the loop-back anchors on its completion)")
        seg.steps.zipWithIndex.foreach { case (s, j) =>
          steps += s; fold += (logical + j)
        }
        loopTo += (base + k - 1) -> base
        expanded += k
      } else {
        val afterAll = base + seg.max * k
        (0 until seg.max).foreach { c =>
          if (c >= seg.min) skipTo += (base + c * k) -> afterAll
          seg.steps.zipWithIndex.foreach { case (s, j) =>
            steps += s; fold += (logical + j)
          }
        }
        expanded = afterAll
      }
      logical += k
    }
    require(expanded <= 64,
      s"expanded pattern has $expanded steps — the 64-bit mask is the limit " +
        "(lower the repetition bound)")
    Compiled(
      Pattern(steps.result(), within, after, maxRuns, skipTo, loopTo),
      fold.result(), logical)
  }

  /** Drive the compiled matcher over one key's time-ordered
    * (t, logicalMask) events — the spec surface, mirroring Cep.run. */
  private[graft] def run(c: Compiled, events: Seq[(Long, Long)]): List[Seq[Seq[Long]]] = {
    var runs: List[Run] = Nil
    val out = List.newBuilder[Seq[Seq[Long]]]
    events.foreach { case (t, mask) =>
      val (nr, done) = Cep.offer(c.pattern, runs, t, c.expandMask(mask))
      runs = nr
      done.foreach(b => out += c.foldStepTimes(Cep.toStepTimes(c.pattern, b)))
    }
    out.result()
  }

  /** Batch executor: same (key, t, mask, tie) contract as Cep.matchBatch
    * with LOGICAL masks; mask expansion and step-time folding happen in
    * column expressions around the shared secondary-sort pass. */
  def matchBatch(spark: SparkSession, events: DataFrame, c: Compiled): DataFrame =
    Cep.matchBatch(spark,
        events.withColumn("mask", c.expandMaskCol(col("mask").cast("long"))),
        c.pattern)
      .select(col("key"), c.foldStepTimesCol(col("step_times")).as("step_times"))

  /** Streaming executor: Cep.matchStream on the expanded pattern, logical
    * masks expanded on the way in, step times folded on the way out. */
  def matchStream(ds: Dataset[(Long, Long, Long, Long)], c: Compiled,
      delay: String = "0 seconds")(
      implicit ek: Encoder[Long],
      em: Encoder[(Long, Long, Long, Long)],
      ets: Encoder[(Long, java.sql.Timestamp, Long, Long, Long)],
      es: Encoder[(Seq[(Long, Long, Long)], List[Run])],
      eo: Encoder[(Long, Seq[Seq[Long]])]): Dataset[(Long, Seq[Seq[Long]])] =
    Cep.matchStream(ds.map(r => (r._1, r._2, c.expandMask(r._3), r._4)),
        c.pattern, delay)
      .map { case (k, st) => (k, c.foldStepTimes(st)) }
}
