package graft

import scala.io.StdIn

/** Minimal SQL shell (SqlClient/SQL gateway analog, SURVEY.md §3.3): reads
  * semicolon-terminated SQL from stdin against the fixture catalog and
  * prints results. Usage:
  *   sbt "runMain graft.SqlShell /root/testdata/sf0.001"
  */
object SqlShell {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session("local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("ERROR")
    Engine.openCatalog(spark, dir)
    println(s"graft sql> catalog: ${Tables.names.mkString(", ")} (from $dir)")
    val buf = new StringBuilder
    var line: String = null
    while ({ line = StdIn.readLine("graft sql> "); line != null }) {
      buf.append(line).append('\n')
      if (line.trim.endsWith(";")) {
        val sql = buf.toString.trim.stripSuffix(";")
        buf.clear()
        if (sql.nonEmpty) {
          // Engine.sql dispatches the full extended surface: temporal
          // joins, MATCH_RECOGNIZE, extended DDL, plain Spark SQL.
          try Engine.sql(spark, sql).show(50, truncate = false)
          catch { case e: Exception => println(s"ERROR: ${e.getMessage}") }
        }
      }
    }
    spark.stop()
  }
}
