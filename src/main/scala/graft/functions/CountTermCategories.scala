package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side single-pass term counting shared by eval and codegen. */
object TermCounting {
  /** Per-category sums of non-overlapping occurrence counts (Python
    * str.count semantics, smart-structured.py:295-300) of each term.
    */
  def countCategories(s: UTF8String, cats: Array[Array[String]]): ArrayData = {
    val str = if (s == null) "" else s.toString
    val out = new Array[Int](cats.length)
    var ci = 0
    while (ci < cats.length) {
      var sum = 0
      val terms = cats(ci)
      var ti = 0
      while (ti < terms.length) {
        val t = terms(ti)
        var i = str.indexOf(t)
        while (i >= 0) { sum += 1; i = str.indexOf(t, i + t.length) }
        ti += 1
      }
      out(ci) = sum
      ci += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native expression for A9 document-type keyword counting: ~21
  * allocating `replace`-diff scans per row (the built-in-function twin)
  * become allocation-free indexOf loops in one generated call —
  * semantics identical (non-overlapping substring counts, summed per
  * ordered category).
  */
case class CountTermCategories(child: Expression, categories: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_term_categories"

  @transient private lazy val cats: Array[Array[String]] = categories.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    TermCounting.countCategories(v.asInstanceOf[UTF8String], cats)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val catsRef = ctx.addReferenceObj("cats", cats, "java.lang.String[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.TermCounting.countCategories(
            ${childGen.isNull} ? null : ${childGen.value}, $catsRef);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
