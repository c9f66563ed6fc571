package graft.functions

import graft.util.SortKey
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving sort-key FIELD encoding as a native (codegen'd)
  * expression: `graft_sort_key(col, 'name', asc)` yields a String whose
  * code-unit order equals the column type's SQL order in the requested
  * direction (graft.util.SortKey field encodings — direction is baked
  * into the field, so a COMPOSITE key is the plain concatenation of
  * per-item fields and one natural-order comparator ranks any ORDER BY
  * list). This stands in for the reference's generated record
  * comparators (rank/ComparableRecordComparator.java:35, generated per
  * row type over multiple sort fields by the planner): the per-type
  * dispatch happens once at plan time and each row pays one static call
  * inside WholeStageCodegen.
  *
  * NULL order values are rejected LOUDLY with a message naming the
  * column: a continuous top-N has no well-defined rank for NULL (the
  * reference planner's rank operators require a sort key too), and a
  * silent NULLS-LAST guess inside a changelog would corrupt retraction
  * matching — the -D for a row must encode to the identical key its +I
  * did.
  */
case class SortKeyExpr(child: Expression, colName: String, asc: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sort_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | BooleanType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sort_key($colName): no order-preserving encoding for type " +
        s"${other.simpleString}")
  }

  private def nullError: String =
    s"streaming top-N ORDER BY $colName: NULL order value — a NULL has " +
      "no rank in a continuous top-N; filter NULLs out upstream " +
      s"(e.g. WHERE $colName IS NOT NULL)"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) throw new IllegalArgumentException(nullError)
    child.dataType match {
      case ByteType => UTF8String.fromString(
        SortKey.fieldLong(v.asInstanceOf[Byte].toLong, asc))
      case ShortType => UTF8String.fromString(
        SortKey.fieldLong(v.asInstanceOf[Short].toLong, asc))
      case IntegerType => UTF8String.fromString(
        SortKey.fieldLong(v.asInstanceOf[Int].toLong, asc))
      case LongType => UTF8String.fromString(
        SortKey.fieldLong(v.asInstanceOf[Long], asc))
      case FloatType => UTF8String.fromString(
        SortKey.fieldDouble(v.asInstanceOf[Float].toDouble, asc))
      case DoubleType => UTF8String.fromString(
        SortKey.fieldDouble(v.asInstanceOf[Double], asc))
      case BooleanType => UTF8String.fromString(
        SortKey.fieldBoolean(v.asInstanceOf[Boolean], asc))
      case BinaryType => UTF8String.fromString(
        SortKey.fieldBinary(v.asInstanceOf[Array[Byte]], asc))
      case d: DecimalType => UTF8String.fromString(
        SortKey.fieldDecimal(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal, d.scale, asc))
      case _: StringType => UTF8String.fromString(
        SortKey.fieldString(v.asInstanceOf[UTF8String].toString, asc))
      case other => throw new IllegalStateException(
        s"graft_sort_key: unreachable type $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val err = ctx.addReferenceObj("sortKeyNullError", nullError, "java.lang.String")
    val conv = child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        s"UTF8String.fromString(graft.util.SortKey.fieldLong((long) ${c.value}, $asc))"
      case FloatType =>
        s"UTF8String.fromString(graft.util.SortKey.fieldDouble((double) ${c.value}, $asc))"
      case DoubleType =>
        s"UTF8String.fromString(graft.util.SortKey.fieldDouble(${c.value}, $asc))"
      case BooleanType =>
        s"UTF8String.fromString(graft.util.SortKey.fieldBoolean(${c.value}, $asc))"
      case BinaryType =>
        s"UTF8String.fromString(graft.util.SortKey.fieldBinary((byte[]) ${c.value}, $asc))"
      case d: DecimalType =>
        s"UTF8String.fromString(graft.util.SortKey.fieldDecimal(" +
          s"${c.value}.toJavaBigDecimal(), ${d.scale}, $asc))"
      case _: StringType =>
        s"UTF8String.fromString(graft.util.SortKey.fieldString(" +
          s"${c.value}.toString(), $asc))"
      case other => throw new IllegalStateException(
        s"graft_sort_key: unreachable type $other")
    }
    ev.copy(
      code = code"""
        ${c.code}
        if (${c.isNull}) {
          throw new IllegalArgumentException($err);
        }
        UTF8String ${ev.value} = $conv;
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
