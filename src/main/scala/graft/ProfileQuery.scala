package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Temporary optimization-round instrument (guide §1/§7.1 without a UI):
  * runs named SparkEntry queries and reports, per pass, wall time plus
  * scheduler-level counters (jobs, stages, tasks, summed task time) so
  * fixed per-job overhead is separable from real compute. Delete when
  * the round closes.
  *
  * usage: SPARK_GRAFT_ONLY=q79_dedup_clusters,q93_cluster_survivor \
  *        SPARK_GRAFT_PASSES=3 runMain graft.ProfileQuery
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
      .getOrElse(Set.empty)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val stageDetail = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(): Unit
        if (stageDetail) {
          val si = s.stageInfo
          val wall = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(-1L)
          if (wall >= 100) println(
            f"[stage] id=${si.stageId}%4d wall=${wall}%6d ms " +
              f"tasks=${si.numTasks}%3d name=${si.name.take(80)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration): Unit
      }
    })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        (1 to passes).foreach { p =>
          jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            val wall = (System.nanoTime() - t0) / 1e9
            // listener events drain asynchronously; give them a beat
            Thread.sleep(300)
            println(f"[pq] $name pass=$p wall=$wall%7.3f s jobs=${jobs.get}%4d " +
              f"stages=${stages.get}%4d tasks=${tasks.get}%6d " +
              f"taskTime=${taskMs.get / 1000.0}%8.2f s")
          } catch { case e: Throwable =>
            println(s"[pq] $name pass=$p FAILED ${e.getClass.getSimpleName}")
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
      }
    spark.stop()
  }
}
