package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** JDK-17 module opens Spark needs when launched outside spark-submit —
    * must match build.sbt's list so the forked isolation JVMs (below) get
    * the same runtime as the sbt-forked parent. */
  private val Jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Re-run one query in a FRESH JVM (own SparkSession, own JIT, own code
    * cache) and return its best-of-3 seconds. Same-JVM isolation after a
    * 100+-query suite is not isolation: accumulated generated classes and
    * JIT/code-cache state inflate the first re-runs 3-9x even after
    * clearCache + GC (round-4 finding: q112 19.6 s in-JVM vs 2.2 s fresh).
    * The child is this same main with a single-query filter and its own
    * warm-up, so pass-1 compilation stays outside the reported min. */
  private def isolatedFreshJvm(
      name: String, sfDir: String, cpus: String): Option[Double] = {
    try {
      val cp = System.getProperty("java.class.path")
      if (cp == null || !cp.contains("spark")) return None // not a full fork classpath
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val xmx = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val cmd: Seq[String] = Seq(javaBin) ++ Jdk17AddOpens ++ Seq(
        s"-Xmx$xmx", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_ONLY", name)
      pb.environment().put("SPARK_GRAFT_PASSES", "3")
      pb.environment().put("SPARK_GRAFT_ISOLATE_N", "0")
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      // Watchdog: a wedged child must not stall the whole benchmark.
      val killer = new Thread(() => {
        if (!proc.waitFor(20, java.util.concurrent.TimeUnit.MINUTES))
          proc.destroyForcibly()
      })
      killer.setDaemon(true)
      killer.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
      val code = proc.waitFor()
      if (code != 0) None
      else out.reverseIterator.collectFirst {
        case l if l.contains("\"metric\"") =>
          val re = ("\"" + java.util.regex.Pattern.quote(name) +
            "\":(-?[0-9.]+(?:[eE]-?[0-9]+)?)").r
          re.findFirstMatchIn(l).map(_.group(1).toDouble)
      }.flatten.filter(_ >= 0)
    } catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up outside the timed region.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Optional comma-separated name filter for targeted perf iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    // Best-of-N per query: the host is a shared microVM with 2-3x run-to-run
    // noise, and pass 1 additionally pays JIT/codegen compilation; the min is
    // the steady-state number that reflects the plan, not the environment.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // A query that throws is an ERROR, never a timing sample — a broken
      // query must not pollute the benchmark with its time-to-failure.
      var err: Option[String] = None
      val times = (1 to math.max(1, passes)).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => err = Some(e.getClass.getSimpleName); None }
      }
      // Release blocks the query leaked into the BlockManager (cache /
      // localCheckpoint survive the action): accumulated block memory was
      // the main in-suite tail inflation — heavy shuffles later in the
      // suite spilled under pressure created by EARLIER queries. Each
      // query still pays its own persistence cost inside its timed region.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (name, times.minOption, err)
    }
    // Self-defending tail: the full suite self-contends on a shared
    // microVM (GC pressure + page cache churn inflate the tail 2-4x), so
    // the slowest queries are RE-RUN in isolation and both numbers ship in
    // the artifact. Isolation = a FRESH JVM per query (fork of this same
    // main, single-query filter): round 4 proved same-JVM re-runs are
    // themselves contaminated by accumulated codegen/JIT state after the
    // full suite (first re-runs 3-9x slow even after clearCache + GC).
    // In-JVM re-run remains only as a fallback when forking isn't possible.
    val isolateN = sys.env.getOrElse("SPARK_GRAFT_ISOLATE_N", "10").toInt
    val slowest = results.collect { case (n, Some(t), _) => (n, t) }
      .sortBy(-_._2).take(math.max(0, isolateN)).map(_._1)
    val isolated = slowest.map { name =>
      name -> isolatedFreshJvm(name, sfDir, cpus).getOrElse {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
        val fn = SparkEntry.queries(name)
        val times = (1 to 3).flatMap { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case _: Throwable => None }
        }
        times.minOption.getOrElse(-1.0)
      }
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"isolated":$iso,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
