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
    * null when out of range OR negative, matching Flink — without the
    * guard, i = -1 built element_at(0) (unconditional runtime error) and
    * i <= -2 silently counted from the END of the array. */
  def splitIndex(s: Column, delim: String, i: Int): Column =
    if (i < 0) lit(null).cast("string")
    else try_element_at(split(s, java.util.regex.Pattern.quote(delim)), lit(i + 1))

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

  // --- SQL/JSON-path functions (BuiltInFunctionDefinitions.java:1825-1951,
  // runtime semantics in flink-table-runtime .../SqlJsonUtils.java). Built
  // on Spark's codegen'd get_json_object, which implements the same lax
  // JSONPath dialect ($.a.b[0]); the SQL-standard scalar/structure
  // distinction is layered on top. Caveat shared with Flink's lax mode:
  // a STRING scalar whose text itself starts with '{' or '[' is
  // indistinguishable from a structure after extraction. ---

  /** JSON_VALUE(j, path [DEFAULT d ON EMPTY]): the scalar at `path` as a
    * string; a missing path or a non-scalar (object/array) yields
    * `onEmpty` (SQL standard: JSON_VALUE returns scalars only). */
  def jsonValue(j: Column, path: String, onEmpty: Column = lit(null)): Column = {
    val v = get_json_object(j, path)
    when(v.isNotNull && !v.startsWith("{") && !v.startsWith("["), v)
      .otherwise(onEmpty)
  }

  /** JSON_QUERY(j, path): the object/array at `path` as compact JSON
    * text; scalars and missing paths yield NULL (SQL standard WITHOUT
    * ARRAY WRAPPER behavior, Flink's default). */
  def jsonQuery(j: Column, path: String): Column = {
    val v = get_json_object(j, path)
    when(v.startsWith("{") || v.startsWith("["), v)
  }

  /** JSON_EXISTS(j, path): does the path resolve to any value. (A JSON
    * null at the path reads as missing — get_json_object's conflation,
    * documented as this dialect's lax behavior.) */
  def jsonExists(j: Column, path: String): Column =
    get_json_object(j, path).isNotNull

  // --- JSON constructors (BuiltInFunctionDefinitions JSON_OBJECT /
  // JSON_ARRAY; runtime in SqlJsonUtils). Built on codegen'd to_json over
  // a struct/array, so values keep their SQL types (BIGINT unquoted,
  // STRING quoted, nested struct/array columns nest as JSON structures
  // rather than double-encoded text). ---

  /** JSON_OBJECT('k1' VALUE v1, ...): compact JSON object with keys in
    * declaration order. `nullOnNull = true` (Flink's default NULL ON
    * NULL) serializes SQL NULL values as JSON null; false (ABSENT ON
    * NULL) omits the key. */
  def jsonObject(nullOnNull: Boolean, pairs: (String, Column)*): Column = {
    require(pairs.nonEmpty, "JSON_OBJECT needs at least one key")
    to_json(struct(pairs.map { case (k, v) => v.as(k) }: _*),
      Map("ignoreNullFields" -> (!nullOnNull).toString))
  }

  def jsonObject(pairs: (String, Column)*): Column =
    jsonObject(nullOnNull = true, pairs: _*)

  /** JSON_ARRAY over an array column. `nullOnNull = false` (Flink's
    * default ABSENT ON NULL) drops SQL NULL elements; true keeps them as
    * JSON null. */
  def jsonArray(arr: Column, nullOnNull: Boolean = false): Column = {
    val src = if (nullOnNull) arr else filter(arr, _.isNotNull)
    to_json(src, Map("ignoreNullFields" -> "false"))
  }
}
