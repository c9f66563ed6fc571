package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Documents a Spark limitation the iterative-graph operators must design
  * around: localCheckpoint drops outputPartitioning, so pre-partitioning a
  * frame by its future join key and checkpointing it does NOT avoid the
  * join's exchange — the checkpointed side re-shuffles anyway. (This is
  * why GraphOps does not repartition its edge lists; the cluster-scale
  * equivalent is bucketed tables, exercised in ScaleSpec.) If a Spark
  * upgrade makes this test fail, the repartition-before-checkpoint
  * optimization becomes worthwhile — revisit GraphOps. */
class PartReuseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("localCheckpoint drops hash partitioning (join re-exchanges)") {
    import spark.implicits._
    val e = (1L to 50000L).map(i => (i % 1000, i % 371)).toDF("src", "dst")
      .repartition($"dst").localCheckpoint()
    val labels = (0L to 999L).map(i => (i, i)).toDF("v", "comp")
      .repartition(col("v"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = e.join(labels.withColumnRenamed("v", "dst2"), $"dst" === $"dst2")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      val reshuffled = plan.linesIterator
        .exists(l => l.contains("Exchange hashpartitioning(dst#"))
      assert(reshuffled,
        s"localCheckpoint now PRESERVES partitioning — revisit GraphOps:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
