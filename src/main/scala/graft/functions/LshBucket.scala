package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

object LshBucketKernel {
  // The cross-engine hyperplane family (Similarity.planeWeight / the
  // DuckDB lshBucketSql twin): weight(p, d) =
  //   (((p*131071 + d) * 2654435761) % 1000001 - 500000) / 500000.0
  // — pure sub-2^63 integer arithmetic, then one double division.
  private val MixA = 131071L
  private val MixB = 2654435761L
  private val Mod = 1000001L

  /** `planes`-bit sign-of-projection bucket. The projection is the
    * same SEQUENTIAL left fold in double as the Column twin
    * (aggregate over zip_with), so the value is bit-identical — the
    * banding downstream is only correct if native and twin agree
    * exactly.
    */
  def bucket(emb: ArrayData, planes: Int): Long = {
    val n = emb.numElements()
    var out = 0L
    var p = 0
    while (p < planes) {
      val base = p * MixA
      var proj = 0.0
      var d = 0
      while (d < n) {
        val w = (((base + d) * MixB) % Mod - 500000L).toDouble / 500000.0
        proj += emb.getFloat(d).toDouble * w
        d += 1
      }
      // Double.compare, not >: Catalyst's `proj > 0` orders NaN above
      // every value (bit SET), Java's > does not — the twin contract
      // must hold on the full input domain, not just finite embeddings
      if (java.lang.Double.compare(proj, 0.0) > 0) out |= (1L << p)
      p += 1
    }
    out
  }
}

/** Native LSH bucket over an array<float> embedding: the per-row
  * kernel of the hyperplane blocking paths (embedCosineLshPairs,
  * annLshTopK). The HOF twin allocates a weights-product array per
  * plane per row in interpreted HOFs; this is a primitive loop in
  * codegen. Property-tested bit-identical to the twin in SketchSpec.
  */
case class LshBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"
  // float32 contract, enforced at ANALYSIS time: a double array would
  // otherwise surface as a runtime ClassCastException deep in a task
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $other")
  }

  override protected def nullSafeEval(emb: Any): Any =
    LshBucketKernel.bucket(emb.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.LshBucketKernel.bucket($e, $planes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
