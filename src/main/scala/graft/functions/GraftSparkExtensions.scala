package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of the native normalization
  * expressions — the spark-submit integration point:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftSparkExtensions ...
  *
  * makes `normalize_arabic_basic` / `normalize_arabic_enhanced`
  * available to plain SQL in every session of the application, without
  * driver code calling GraftFunctions.register.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("normalize_arabic_basic"),
      new ExpressionInfo(classOf[NormalizeArabicBasic].getName, "normalize_arabic_basic"),
      (children: Seq[Expression]) => NormalizeArabicBasic(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("normalize_arabic_enhanced"),
      new ExpressionInfo(classOf[NormalizeArabicEnhanced].getName, "normalize_arabic_enhanced"),
      (children: Seq[Expression]) => NormalizeArabicEnhanced(children.head)))
  }
}
