package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate against a pre-built count-min sketch, as
  * a native codegen'd expression — the LOOKUP sibling of the
  * Misra-Gries summary ([[MisraGries]]).
  *
  * MG answers "which keys dominate" in O(m) memory but can only speak
  * about keys it retained; a count-min sketch answers "how often did
  * THIS key occur" for ANY key in O(depth x width) counters, with the
  * opposite error sign: estimates NEVER undercount (every cell a key
  * hashes to holds its true count plus nonnegative collision mass,
  * and the estimate is the min over depth rows), and overcount at
  * most eps*n per row in expectation/2, so
  * `P(est > true + 2*eps*n) <= 4^-depth` (Markov per row,
  * independent rows). Both sketches are MERGEABLE — elementwise
  * counter addition — which is what makes the build a distributed
  * treeAggregate rather than a groupBy(key) that shuffles one row per
  * distinct key; unlike MG, the merged CMS is bit-identical for any
  * merge order, so estimates are deterministic for fixed data+seed.
  *
  * Uses Spark's public `org.apache.spark.util.sketch.CountMinSketch`
  * (the sketch `DataFrameStatFunctions.countMinSketch` builds). The
  * serialized sketch travels with the plan; each executor
  * deserializes once (transient lazy). The probe key is passed as a
  * JVM String — the same external type the stat builder added, so
  * build and probe hashing agree (pinned in OperatorsSpec by the
  * no-undercount gate, which a hash mismatch would zero instantly).
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  override protected def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cms = ctx.addReferenceObj("graftCms", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cms.estimateCount($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsEstimate {
  def serialize(cms: CountMinSketch): Array[Byte] = cms.toByteArray
}
