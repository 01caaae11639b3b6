package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of the native expression surface —
  * the spark-submit integration point:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftSparkExtensions ...
  *
  * makes every graft native function available to plain SQL in every
  * session of the application, without driver code calling
  * GraftFunctions.register: the normalizers, the sketch family
  * (minhash / simhash / shingles / jaccard), and the embedding
  * kernels. Integer parameters are taken as foldable literals
  * (`minhash_signature(toks, 32)`), the same contract as Spark's own
  * parameterized builtins.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  /** The parameter must be a literal the plan can fold at resolution
    * time (it shapes the expression, like `round`'s scale).
    */
  private def intLit(e: Expression, fn: String, pos: Int): Int = e.eval() match {
    case i: Int => i
    case l: Long if l.isValidInt => l.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an Int-range integer literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, name),
      builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "normalize_arabic_basic")(c => NormalizeArabicBasic(c.head))
    register(ext, "normalize_arabic_enhanced")(c => NormalizeArabicEnhanced(c.head))
    // sketch family (array<string> tokens -> sketches / hashed sets)
    register(ext, "minhash_signature")(c =>
      MinHashSignature(c(0), intLit(c(1), "minhash_signature", 1)))
    register(ext, "minhash_poly_buckets")(c =>
      MinHashPolyBuckets(c(0), intLit(c(1), "minhash_poly_buckets", 1),
        intLit(c(2), "minhash_poly_buckets", 2)))
    register(ext, "simhash64")(c => SimHash64(c.head))
    register(ext, "simhash_poly")(c => SimHashPoly(c.head))
    register(ext, "shingle_hashes")(c =>
      ShingleHashes(c(0), intLit(c(1), "shingle_hashes", 1)))
    register(ext, "chunk_tokens")(c =>
      ChunkTokens(c(0), intLit(c(1), "chunk_tokens", 1), intLit(c(2), "chunk_tokens", 2)))
    register(ext, "sorted_long_jaccard")(c => SortedLongJaccard(c(0), c(1)))
    // embedding kernels (array<float>)
    register(ext, "dot_product_f32")(c => DotProductF32(c(0), c(1)))
    register(ext, "lsh_bucket")(c => LshBucket(c(0), intLit(c(1), "lsh_bucket", 1)))
  }
}
