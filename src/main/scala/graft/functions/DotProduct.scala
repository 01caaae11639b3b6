package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

object DotKernel {
  /** Left-fold sum of elementwise products in double — the same
    * accumulation order as the Column twin
    * aggregate(zip_with(a, b, (x,y) => x*y), 0.0, +), so results are
    * bit-identical. Vectors must have equal length (pipeline
    * invariant: one embedding model, one dimension).
    */
  def dotF32(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"dim mismatch: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Native dot product over two array<float> columns: the per-pair
  * kernel of every similarity operator (brute-force/LSH/IVF ANN,
  * embedding near-dup). The HOF twin materializes a boxed product
  * array per pair; this is a primitive loop in codegen.
  *
  * Null propagates like the HOF twin (null vector -> null score, so a
  * `score >= t` filter drops the row instead of the task dying); a
  * DIMENSION MISMATCH still fails fast — mixed-dimension embeddings
  * are corrupt input, and the twin's silent null would mask that.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"
  // float32 contract enforced at analysis time (see LshBucket)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<float>, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotKernel.dotF32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotKernel.dotF32($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
