package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Flink-style CREATE TABLE extensions the stock Spark parser lacks:
  * computed (generated) columns and the WATERMARK clause
  * (flink-sql-parser .../parserImpls.ftl `WATERMARK FOR <col> AS <expr>`,
  * computed columns `name AS expr` in the column list).
  *
  * Lowering (Spark-first, no custom parser in the hot path):
  *  - physical columns  -> a managed parquet table `__<name>_base`;
  *  - computed columns  -> a VIEW `<name>` = base + computed expressions,
  *    so queries against `<name>` see the Flink-visible schema;
  *  - WATERMARK clause  -> recorded in the base table's TBLPROPERTIES
  *    (graft.watermark.col / .delay), applied by `readStream` as
  *    `withWatermark` — the clause IS Spark's watermark API, persisted in
  *    the catalog so a fresh session reconstructs it;
  *  - INSERT INTO <name> is rewritten to the base table (computed columns
  *    are virtual, exactly Flink's insert semantics).
  *
  * The watermark expression is restricted to the Flink-canonical
  * `<col> - INTERVAL '<n>' <unit>` shape; computed expressions are any
  * Spark SQL scalar expression over the physical columns.
  */
object WatermarkDdl {

  final case class TableSpec(
      name: String,
      physical: Seq[(String, String)], // (colName, sqlType)
      computed: Seq[(String, String)], // (colName, sqlExpr)
      watermark: Option[(String, String)], // (timeCol, delay e.g. "5 seconds")
      options: Seq[(String, String)] = Nil) // WITH ('k'='v', ...) connector options

  private val CreateRe = """(?is)\s*CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*;?\s*""".r
  // Flink-style trailing options clause: CREATE TABLE t (...) WITH ('k'='v')
  private val WithRe = """(?is)(.*\))\s*WITH\s*\((.*)\)\s*;?\s*""".r
  private val PropRe = """(?s)\s*'([^']+)'\s*=\s*'([^']*)'\s*""".r
  private val WatermarkRe =
    """(?is)WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*INTERVAL\s+'(\d+)'\s+(\w+)""".r
  private val ComputedRe = """(?is)(\w+)\s+AS\s+(.+)""".r
  private val PhysicalRe = """(?is)(\w+)\s+([\w()<>,\s]+)""".r
  private val InsertRe = """(?is)\s*INSERT\s+INTO\s+(\w+)\s+(.*)""".r

  private def baseName(table: String): String = s"__${table}_base"

  // nested types (array<struct<...>>) don't split; spaced comparisons in
  // computed columns (is_small AS k < 10) don't nest — see SqlSplit.
  private def splitTopLevel(s: String): Seq[String] =
    graft.util.SqlSplit.splitTopLevel(s, angleTypes = true)

  /** Parse a CREATE TABLE with computed columns / WATERMARK / a Flink
    * `WITH ('k'='v', ...)` options clause; None if the statement doesn't
    * need the extended lowering (plain DDL). */
  def parse(ddl: String): Option[TableSpec] = {
    // split a trailing WITH ('k'='v', ...) off first — the column body's
    // greedy match must not swallow it
    val (core, options) = ddl match {
      case WithRe(head, props) =>
        val opts = graft.util.SqlSplit.splitTopLevel(props).map {
          case PropRe(k, v) => (k, v)
          case other => throw new IllegalArgumentException(
            s"WITH clause: expected 'key'='value', got '$other'")
        }
        (head, opts)
      case _ => (ddl, Seq.empty[(String, String)])
    }
    core match {
      case CreateRe(name, body) =>
        var physical = Vector.empty[(String, String)]
        var computed = Vector.empty[(String, String)]
        var watermark = Option.empty[(String, String)]
        splitTopLevel(body).foreach {
          case WatermarkRe(col, n, unit) =>
            watermark = Some((col, s"$n ${unit.toLowerCase}"))
          case ComputedRe(col, e) if !e.trim.isEmpty && !col.equalsIgnoreCase("watermark") =>
            computed :+= (col, e.trim)
          case PhysicalRe(col, tpe) => physical :+= (col, tpe.trim)
          case other =>
            throw new IllegalArgumentException(s"CREATE TABLE: bad column entry: $other")
        }
        if (computed.isEmpty && watermark.isEmpty && options.isEmpty) None
        else {
          require(physical.nonEmpty, "CREATE TABLE needs at least one physical column")
          watermark.foreach { case (col, _) =>
            require(physical.exists(_._1 == col) || computed.exists(_._1 == col),
              s"WATERMARK FOR $col: no such column")
          }
          Some(TableSpec(name, physical, computed, watermark, options))
        }
      case _ => None
    }
  }

  /** Execute one statement through the extended DDL surface; falls through
    * to plain spark.sql for everything it doesn't handle. */
  def sql(spark: SparkSession, statement: String): DataFrame =
    parse(statement) match {
      case Some(spec) => create(spark, spec); spark.emptyDataFrame
      case None => statement match {
        case InsertRe(table, rest) if spark.catalog.tableExists(baseName(table)) =>
          spark.sql(s"INSERT INTO ${baseName(table)} $rest")
        case _ => spark.sql(statement)
      }
    }

  private def create(spark: SparkSession, spec: TableSpec): Unit = {
    val cols = spec.physical.map { case (c, t) => s"$c $t" }.mkString(", ")
    // persist the full extended definition as table properties, so a
    // FRESH session reconstructs computed columns + watermark from the
    // catalog alone (the role of Flink's catalog-stored schema)
    val propEntries =
      spec.watermark.toSeq.flatMap { case (c, d) =>
        Seq(s"'graft.watermark.col'='$c'", s"'graft.watermark.delay'='$d'")
      } ++ (if (spec.computed.nonEmpty)
        Seq(s"'graft.computed'='${spec.computed.map { case (c, e) => s"$c:=$e" }
          .mkString(";;").replace("'", "''")}'")
      else Nil) ++
      // WITH options pass through verbatim (lookup.cache et al.) so any
      // consumer can read them back via tableOptions
      spec.options.map { case (k, v) =>
        s"'${k.replace("'", "''")}'='${v.replace("'", "''")}'"
      }
    val props =
      if (propEntries.isEmpty) "" else propEntries.mkString(" TBLPROPERTIES (", ", ", ")")
    spark.sql(s"CREATE TABLE ${baseName(spec.name)} ($cols) USING parquet$props")
    val sel = (spec.physical.map(_._1) ++
      spec.computed.map { case (c, e) => s"$e AS $c" }).mkString(", ")
    spark.sql(s"CREATE OR REPLACE VIEW ${spec.name} AS SELECT $sel FROM ${baseName(spec.name)}")
  }

  /** Streaming read of an extended table: base files -> computed columns
    * -> withWatermark from the persisted clause. The returned frame is
    * exactly what Flink's planner derives from the DDL: event-time
    * column + bounded-out-of-orderness watermark, ready for windowed
    * aggregation in append mode. Works in a fresh session: everything is
    * reconstructed from the catalog. */
  /** The table's declared event-time attribute (WATERMARK clause), read
    * from the catalog — the shared lookup for every consumer of the
    * versioned-table contract (readStream, TemporalSql). None when the
    * table wasn't created through this DDL or declares no watermark. */
  def watermarkCol(spark: SparkSession, table: String): Option[String] = {
    val base = baseName(table)
    if (!spark.catalog.tableExists(base)) None
    else spark.sql(s"SHOW TBLPROPERTIES $base").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .get("graft.watermark.col")
  }

  /** All persisted table options (WITH clause / TBLPROPERTIES) of an
    * extended table — or of a plain catalog table created with native
    * TBLPROPERTIES. Empty map when the table has neither. */
  def tableOptions(spark: SparkSession, table: String): Map[String, String] = {
    val target =
      if (spark.catalog.tableExists(baseName(table))) Some(baseName(table))
      else if (spark.catalog.tableExists(table)) Some(table)
      else None
    target.map { t =>
      spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    }.getOrElse(Map.empty)
  }

  def readStream(spark: SparkSession, table: String): DataFrame = {
    val base = baseName(table)
    require(spark.catalog.tableExists(base), s"no extended table $table")
    val props = spark.sql(s"SHOW TBLPROPERTIES $base").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val df = spark.readStream.table(base)
    val withComputed = props.get("graft.computed") match {
      case Some(spec) =>
        val exprs = spec.split(";;").toSeq.map { entry =>
          val Array(c, e) = entry.split(":=", 2)
          s"$e AS $c"
        }
        df.selectExpr("*" +: exprs: _*)
      case None => df
    }
    (props.get("graft.watermark.col"), props.get("graft.watermark.delay")) match {
      case (Some(c), Some(d)) => withComputed.withWatermark(c, d)
      case _ => withComputed
    }
  }
}
