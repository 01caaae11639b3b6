package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side kernels for the search operators. */
object SearchKernels {
  /** Token-EXACT per-term frequencies over a word array, one pass:
    * out(t) = |{ i : words(i) == terms(t) }|. Unlike the A9 substring
    * counter (TermCounting), a query term only matches a whole token —
    * tf("a") must not count every letter 'a'. Terms are few (a query),
    * so the inner comparison loop beats building a map per row.
    */
  def tokenTermFreqs(words: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val out = new Array[Int](terms.length)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      var t = 0
      while (t < terms.length) {
        if (terms(t).equals(w)) out(t) += 1
        t += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Per-query-term token-exact frequency vector of a word array (the tf
  * input of BM25). Null word array propagates null.
  */
case class TokenTermFreqs(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty, "need at least one query term")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_term_freqs"

  @transient private lazy val termArr: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(v: Any): Any =
    SearchKernels.tokenTermFreqs(v.asInstanceOf[ArrayData], termArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termArr, "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SearchKernels.tokenTermFreqs($t, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
