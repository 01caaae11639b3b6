package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a native
  * codegen'd expression — the map-side prune for digest anti-joins.
  *
  * The exact "drop rows whose digest is in the reject set" is an
  * anti-join that shuffles (or at best broadcast-hashes) EVERY corpus
  * row. With a Bloom filter over the reject set broadcast into the
  * scan, rows the filter rejects are DEFINITELY not members (a Bloom
  * filter has no false negatives) and skip the join entirely; only the
  * `fpp` fraction of maybe-members continues to the exact verify. At
  * 100 TB that turns the anti-join's probe side from |corpus| into
  * ~|matches| + fpp x |corpus| rows. The filter itself is a few bits
  * per reject-set key (~9.6 bits/key at 1% fpp); for reject sets past
  * ~10^10 keys, shard the filter by digest prefix and probe the shard
  * — same expression, one filter per shard.
  *
  * Uses Spark's public `org.apache.spark.util.sketch.BloomFilter`
  * (the same sketch `DataFrameStatFunctions.bloomFilter` builds), so
  * the build side is a distributed aggregate, not a collect of keys.
  * The serialized filter travels with the plan; each executor
  * deserializes it once (transient lazy). Probing is on the UTF8
  * bytes of the child string — identical hashing to
  * `putString`/`mightContainString`.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bf.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
