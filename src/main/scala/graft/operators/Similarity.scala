package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exactness baseline: broadcast the
  * (small) query set, one narrow pass over the corpus, per-query top-k
  * via window — no corpus self-shuffle. The scale path is LSH
  * bucketing (random-hyperplane signs): candidates share a bucket, so
  * the join is keyed on the bucket value instead of a cross product.
  * All arithmetic is Catalyst HOFs over doubles with a fixed fold
  * order, so scores are reproducible bit-for-bit.
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors in double. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Exact brute-force cosine top-k neighbors for each query vector.
    * `queries` must be small (it is broadcast).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms precomputed once per side — the per-pair work is a single
    // dot product, not three
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      normCol(col("embedding")).as("q_nrm"))
    val c = corpus.select(col("vec_id"), col("embedding"), normCol(col("embedding")).as("c_nrm"))
    val scored = c
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dotCol(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight
    * derived from a hash — equivalent to a fixed seeded projection
    * matrix, expressible in pure Catalyst.
    */
  private def planeWeight(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000001L)).cast("double") - 500000.0) / 500000.0

  /** Sign-of-projection LSH bucket: `planes`-bit signature. */
  def lshBucketCol(emb: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, d) => x.cast("double") * planeWeight(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH buckets: candidates = same bucket (multi-probe over
    * the exact bucket only, in this baseline), re-scored exactly,
    * per-query top-k. Recall vs brute force is validated in tests.
    */
  def annLshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int): DataFrame = {
    val bucketed = corpus.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("c_nrm"),
      lshBucketCol(col("embedding"), planes).as("bucket"))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        normCol(col("embedding")).as("q_nrm"),
        lshBucketCol(col("embedding"), planes).as("bucket"))
    val scored = bucketed
      .join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dotCol(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
