package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave of two 16-bit dimension ranks —
  * the clustering key behind multi-dimensional file skipping.
  *
  * A table sorted on ONE column gives parquet min/max stats that are
  * tight on that column and useless on every other: a filter on the
  * second dimension reads every file. Interleaving the bits of two
  * dimension ranks makes a RANGE of z-values a rectangle in (x, y)
  * space, so range-partitioning files by z yields min/max stats that
  * are tight on BOTH dimensions — a predicate on either column skips
  * most files/row-groups. This is exactly Delta/Iceberg OPTIMIZE
  * ZORDER BY; here it's the write-path face of the lake seam.
  */
object ZOrderKernels {
  /** spread the low 16 bits of v to even bit positions (0,2,..,30) */
  def spread16(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** interleave two 16-bit ranks into a 32-bit morton code */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}

/** `interleave_bits(xRank, yRank)` — both children are LONG ranks
  * already scaled into [0, 65535] (see `ZOrderLake.zColumn`); values
  * outside are masked to their low 16 bits.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernels.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderKernels.interleave16($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
