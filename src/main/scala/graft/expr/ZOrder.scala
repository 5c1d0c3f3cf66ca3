package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two non-negative long keys, 21 bits
  * each → one 42-bit curve position. Sorting by the curve position gives
  * files that are small rectangles in (a, b) space, so min/max statistics
  * prune on EITHER column's predicate — the multi-dimensional counterpart
  * of [[graft.io.Layout.writeRangeSorted]]'s single-key layout. Values are
  * masked to their low 21 bits (callers bucket/shift larger domains
  * first). Bit-spreading is the standard magic-mask sequence; one eval per
  * row at write time only — the read path never evaluates it. */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  private def spread(v: Long): Long = {
    var x = v & 0x1fffffL
    x = (x | (x << 32)) & 0x1f00000000ffffL
    x = (x | (x << 16)) & 0x1f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Column wrapper for [[ZInterleave]]; casts both keys to long. */
  def zValue(a: Column, b: Column): Column =
    ExpressionUtils.column(ZInterleave(
      ExpressionUtils.expression(a.cast("long")),
      ExpressionUtils.expression(b.cast("long"))))
}
