package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side sketch kernels shared by eval and codegen.
  *
  * Both replicate their Column-twin semantics bit-for-bit
  * (property-tested in SketchSpec):
  *   - minhash: sig(p) = min over tokens of xxhash64(token, p), where
  *     Spark's xxhash64(t, lit(p)) folds as hashLong(p, seed =
  *     hashBytes(t, 42)). The token is therefore hashed ONCE and each
  *     permutation is a single long-mix — the Column twin re-traverses
  *     the token array (and re-hashes every token) once per
  *     permutation.
  *   - simhash: per bit b, sum +-1 of bit b of xxhash64(token) over
  *     tokens; bit set iff sum > 0. The Column twin allocates a
  *     64-element array per token inside an interpreted aggregate.
  */
object SketchKernels {
  private val DefaultSeed = 42L

  @inline private def tokenHash(t: UTF8String): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, DefaultSeed)

  def minhash(tokens: ArrayData, perms: Int): ArrayData = {
    val sig = new Array[Long](perms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = tokens.numElements()
    var ti = 0
    while (ti < n) {
      val base = tokenHash(tokens.getUTF8String(ti))
      var p = 0
      while (p < perms) {
        // the Column twin folds xxhash64(token, lit(p)) with an INT
        // literal, so the per-permutation mix is hashInt, not hashLong
        val h = XXH64.hashInt(p, base)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      ti += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  def simhash(tokens: ArrayData): Long = {
    val sums = new Array[Int](64)
    val n = tokens.numElements()
    var ti = 0
    while (ti < n) {
      val h = tokenHash(tokens.getUTF8String(ti))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      ti += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** MinHash signature over an array<string> of tokens: `perms`
  * permutations approximated by seeded xxhash64 minima.
  */
case class MinHashSignature(child: Expression, perms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // null tokens -> null signature (like the HOF twin): a non-null
  // sentinel would send every null-text doc into the SAME bucket of
  // every band, manufacturing a hot bucket of spurious candidates
  override protected def nullSafeEval(tokens: Any): Any =
    SketchKernels.minhash(tokens.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchKernels.minhash($t, $perms)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<string> of tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // null -> null (HOF-twin parity): the 0L sentinel would pair every
  // null-text doc at hamming distance 0
  override protected def nullSafeEval(tokens: Any): Any =
    SketchKernels.simhash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchKernels.simhash($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
