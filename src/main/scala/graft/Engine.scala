package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TableEnvironment analog (SURVEY.md §3.1): session construction with the
  * engine's extensions, catalog registration of the fixture tables as temp
  * views, and a SQL entry point. Flink's parse/validate/optimize/execute
  * chain is Catalyst's — we only add the catalog and function surface.
  */
object Engine {

  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  /** Register every fixture table as a temp view (events with the derived
    * µs timestamp columns), making `spark.sql` queries self-contained.
    *
    * DDL surface: `sql` also accepts the catalog-backed DDL subset —
    * CREATE TABLE (+ CTAS) / INSERT INTO / INSERT OVERWRITE / CREATE
    * [OR REPLACE] [TEMP] VIEW / ALTER TABLE ADD COLUMNS / SHOW TABLES /
    * DROP — persisted in the session catalog (Derby metastore +
    * spark-warehouse), the analog of Flink SqlClient's catalog DDL
    * (flink-sql-parser parserImpls.ftl); DdlSpec drives the round-trip. */
  def openCatalog(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
  }

  private val ExplainRe =
    """(?is)\s*EXPLAIN(\s+(?:FORMATTED|EXTENDED|CODEGEN|COST))?\s+(SELECT\b.*)""".r
  private val StmtSetRe =
    """(?is)\s*EXECUTE\s+STATEMENT\s+SET\s+BEGIN\b(.*?)\bEND\s*;?\s*""".r

  private def extendedMatches(q: String): Boolean =
    WindowTvfSql.matches(q) || TemporalSql.matches(q) ||
      graft.cep.MatchRecognize.matchesSql(q)

  /** SQL entry point with the engine's extended dispatch (SqlClient
    * analog): window-TVF / legacy grouped-window syntax -> WindowTvfSql,
    * temporal-join syntax -> TemporalSql bridge, MATCH_RECOGNIZE
    * statements -> the CEP SQL bridge, extended DDL (computed columns /
    * WATERMARK) -> WatermarkDdl, everything else -> spark.sql. EXPLAIN
    * works over the EXTENDED surface too (the lowered plan is explained —
    * SqlClient's EXPLAIN-through-the-planner behavior), and EXECUTE
    * STATEMENT SET BEGIN ... END runs a multi-statement batch
    * (SqlClient's statement sets; Spark executes the members
    * sequentially — there is no cross-INSERT DAG merge, the one joint
    * optimization Flink's implementation adds). The whole implemented
    * surface is reachable from one SQL-text front door. */
  def sql(spark: SparkSession, query: String): DataFrame = query match {
    case StmtSetRe(body) =>
      import spark.implicits._
      val stmts = graft.util.SqlSplit.splitStatements(body)
      require(stmts.nonEmpty, "EXECUTE STATEMENT SET: empty body")
      // INSERTs execute eagerly inside sql(); their empty result frame
      // carries no row count, so the summary reports status, not rows
      // (counting would also re-execute any SELECT member)
      stmts.map { s =>
        sql(spark, s)
        (s.linesIterator.mkString(" ").trim.take(80), "OK")
      }.toDF("statement", "status")
    case ExplainRe(mode, body) if extendedMatches(body) =>
      import spark.implicits._
      val m = Option(mode).map(_.trim.toLowerCase).filter(_.nonEmpty).getOrElse("simple")
      val plan = sql(spark, body).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString(m))
      Seq(plan).toDF("plan")
    case _ =>
      if (WindowTvfSql.matches(query)) WindowTvfSql.sql(spark, query)
      else if (TemporalSql.matches(query)) TemporalSql.sql(spark, query)
      else if (graft.cep.MatchRecognize.matchesSql(query))
        graft.cep.MatchRecognize.sql(spark, query)
      else WatermarkDdl.sql(spark, query)
  }
}
