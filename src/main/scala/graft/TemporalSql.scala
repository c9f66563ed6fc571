package graft

import graft.operators.AsOfJoin
import graft.util.SqlSplit
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text surface for the temporal/as-of join — Flink's
  * `FOR SYSTEM_TIME AS OF` join syntax (flink-sql-parser parserImpls.ftl
  * SqlSnapshot; planner StreamExecTemporalJoin.java) lowered onto
  * `AsOfJoin.backward`'s single sort-shuffle algorithm.
  *
  * Supported grammar (constrained, loudly enforced):
  * {{{
  *   SELECT <alias>.<col> [AS <name>] [, ...]
  *   FROM <factTable> [AS] <f>
  *   JOIN <dimTable> FOR SYSTEM_TIME AS OF <f>.<timeCol> [AS] <d>
  *   ON <f>.<key> = <d>.<key>
  *   [WHERE <predicate>] [ORDER BY <cols>]
  * }}}
  *
  * The dim's VERSION TIME column comes from the catalog when the dim was
  * created with a `WATERMARK FOR <col> ...` clause (`WatermarkDdl`
  * persists it as `graft.watermark.col` — exactly Flink's rule that a
  * versioned table declares its event-time attribute), or from the
  * `versionTime` parameter for plain tables/views. Fact and dim column
  * names must be disjoint apart from the join key (no output ambiguity).
  */
object TemporalSql {

  private val Re =
    ("""(?is)\s*SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\s+AS)?\s+(\w+)\s+""" +
      """JOIN\s+(\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(\w+)\.(\w+)(?:\s+AS)?\s+(\w+)\s+""" +
      """ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*""" +
      """(?:WHERE\s+(.+?)\s*)?(?:ORDER\s+BY\s+(.+?)\s*)?""").r

  private val ProjRe = """(?is)(\w+)\.(\w+)(?:\s+AS\s+(\w+))?""".r

  /** True when `query` is a FOR SYSTEM_TIME AS OF join this bridge can
    * lower (the dispatch predicate for a shell front-end). String
    * literals are blanked first so `SELECT 'FOR SYSTEM_TIME AS OF'`
    * stays a plain Spark query. */
  def matches(query: String): Boolean =
    """(?is).*\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b.*""".r
      .matches(query.replaceAll("'[^']*'", "''"))

  def sql(spark: SparkSession, query: String,
      versionTime: Option[String] = None): DataFrame = query match {
    case Re(proj, factTbl, f, dimTbl, ofAlias, timeCol, d,
        lAlias, lKey, rAlias, rKey, whereOpt, orderOpt) =>
      require(ofAlias == f,
        s"FOR SYSTEM_TIME AS OF must reference the fact alias '$f', got '$ofAlias'")
      val (fKey, dKey) =
        if (lAlias == f && rAlias == d) (lKey, rKey)
        else if (lAlias == d && rAlias == f) (rKey, lKey)
        else throw new IllegalArgumentException(
          s"ON clause must join aliases '$f' and '$d', got '$lAlias'/'$rAlias'")

      val fact = spark.table(factTbl)
      val dim = spark.table(dimTbl)
      val vt = versionTime.getOrElse(WatermarkDdl.watermarkCol(spark, dimTbl)
        .getOrElse(throw new IllegalArgumentException(
          s"dim '$dimTbl' declares no event-time attribute (WATERMARK clause) " +
            "and no versionTime was given")))

      // projection entries, each qualified alias.col [AS name]
      val items = SqlSplit.splitTopLevel(proj).map {
        case ProjRe(a, c, alias) =>
          require(a == f || a == d, s"unknown alias '$a' in projection")
          (a, c, Option(alias).getOrElse(c))
        case other => throw new IllegalArgumentException(
          s"projection entries must be <alias>.<col> [AS name], got '$other'")
      }
      val dimPayload = items.collect { case (`d`, c, _) => c }.distinct
      require(dimPayload.nonEmpty,
        s"projection references no '$d' column — the temporal join is a no-op")
      // project f.<key> instead: for unmatched LEFT rows d.<key> is NULL,
      // which the single-struct payload can't distinguish post-rename
      require(!dimPayload.contains(dKey),
        s"project the fact's join key ($f.$fKey), not the dim's ($d.$dKey)")
      val overlap = dimPayload.toSet.intersect(fact.columns.toSet)
      require(overlap.isEmpty,
        s"fact and dim column names must be disjoint, both have: ${overlap.mkString(",")}")

      // AsOfJoin.backward keys both sides by ONE column name; renaming
      // must not collide with an unrelated dim column of the fact key's
      // name (withColumnRenamed would silently duplicate it)
      require(dKey == fKey || !dim.columns.contains(fKey),
        s"dim '$dimTbl' already has a column '$fKey' distinct from its join " +
          s"key '$dKey' — rename one side")
      val dimKeyed = if (dKey == fKey) dim else dim.withColumnRenamed(dKey, fKey)
      val joined = AsOfJoin.backward(fact, dimKeyed, fKey, timeCol, vt,
        dimPayload, vt)

      val projected = joined.selectExpr(items.map {
        case (_, c, out) => s"$c AS $out"
      }: _*)
      val filtered = Option(whereOpt).map(w =>
        projected.where(stripAliases(w, f, d))).getOrElse(projected)
      Option(orderOpt).map(o =>
        filtered.orderBy(SqlSplit.splitTopLevel(stripAliases(o, f, d))
          .map(org.apache.spark.sql.functions.expr): _*)).getOrElse(filtered)
    case _ => throw new IllegalArgumentException(
      "unsupported FOR SYSTEM_TIME AS OF shape — see TemporalSql scaladoc")
  }

  /** WHERE/ORDER BY fragments reference output columns; qualifiers are
    * resolved away by the projection, so strip them — but only OUTSIDE
    * single-quoted string literals (a predicate like tag = 'f.retail'
    * must keep its literal intact). */
  private def stripAliases(s: String, f: String, d: String): String =
    s.split("'", -1).zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 1) seg // inside quotes: untouched
      else seg.replaceAll(s"(?i)\\b$f\\.", "").replaceAll(s"(?i)\\b$d\\.", "")
    }.mkString("'")
}
