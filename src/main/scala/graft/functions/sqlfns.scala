package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gap-fill scalar functions: the few Flink built-ins with no direct Spark
  * equivalent (SURVEY.md §2.9), as Column-level compositions of codegen'd
  * built-ins (no UDFs).
  *
  * Reference: SPLIT_INDEX (BuiltInFunctionDefinitions.java:923),
  * IS_DECIMAL / IS_DIGIT / IS_ALPHA (FlinkSqlOperatorTable.java:276-295).
  */
object sqlfns {

  /** SPLIT_INDEX(str, delim, i) — i is 0-based like Flink; delim is a
    * literal string (quoted before hitting the regex-based split). Returns
    * null when out of range, matching Flink. */
  def splitIndex(s: Column, delim: String, i: Int): Column =
    try_element_at(split(s, java.util.regex.Pattern.quote(delim)), lit(i + 1))

  /** IS_DECIMAL(str): can the string be parsed as a decimal number. */
  def isDecimal(c: Column): Column =
    c.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")

  /** IS_DIGIT(str): all characters are digits. */
  def isDigit(c: Column): Column = c.rlike("^[0-9]+$")

  /** IS_ALPHA(str): all characters are letters. */
  def isAlpha(c: Column): Column = c.rlike("^[A-Za-z]+$")

  /** LISTAGG with deterministic ordering (Flink's LISTAGG over a sorted
    * group; Spark's collect_list order is partition-dependent, so sort). */
  def listAgg(c: Column, sep: String): Column =
    array_join(array_sort(collect_list(c)), sep)
}
