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

  /** Sequential-fold dot product of two float vectors in double —
    * Catalyst-HOF reference form (twin of the native expression;
    * SketchSpec pins bit-identical results).
    */
  def dotColRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Native dot product (primitive loop in codegen, same fold order). */
  def dotCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.DotProductF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

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

  /** Embedding-cosine near-duplicate pairs (exact, windowed): candidate
    * pairs restricted to an id window, implemented as the same BLOCK
    * EQUI-JOIN as Dedup.jaccardPairs (a naive range predicate plans as
    * a nested-loop cross product). This is the oracle-checkable
    * baseline; `embedCosineLshPairs` is the scale path.
    */
  def embedCosinePairs(embeddings: DataFrame, idWindow: Int, threshold: Double): DataFrame = {
    val t = embeddings.select(col("vec_id"), col("embedding"),
        normCol(col("embedding")).as("nrm"))
      .withColumn("blk", floor(col("vec_id") / idWindow))
    val probe = t.withColumn("probe_blk", explode(array(col("blk"), col("blk") + 1)))
    val a = probe.as("a"); val b = t.as("b")
    a.join(b,
        col("a.probe_blk") === col("b.blk") &&
          col("a.vec_id") < col("b.vec_id") &&
          col("b.vec_id") <= col("a.vec_id") + idWindow)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(dotCol(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Embedding-cosine near-dup at scale: candidates share an LSH
    * bucket (one shuffle keyed on the bucket), verified with the exact
    * cosine. Same hot-bucket cap rationale as Dedup.MaxBucketSize.
    */
  def embedCosineLshPairs(embeddings: DataFrame, planes: Int, threshold: Double,
                          maxBucketSize: Int = Dedup.MaxBucketSize): DataFrame = {
    val t = embeddings.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"),
      lshBucketCol(col("embedding"), planes).as("bucket"))
    val cold = t.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .where(col("bucket_n") <= maxBucketSize)
    val a = cold.as("a"); val b = cold.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(dotCol(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  // ---- IVF (inverted-file) ANN: the second scale path ------------------

  /** Centroids as ONE 2-D array literal. Expanding each centroid into
    * its own expression subtree (k aggregates over dim literals each)
    * makes the plan O(k*dim) — planning/codegen then dwarfs execution
    * (40s for k=16, dim=64). A single typedlit keeps the plan O(1).
    * Cell id == centroid position (ids are dense 0..k-1 by
    * construction in kmeansCentroids).
    */
  private def centArrayCol(centroids: Array[(Int, Array[Double])]): Column =
    typedlit(centroids.sortBy(_._1).map(_._2.toSeq).toSeq)

  /** (squared-L2-distance, cell) structs for every centroid, smallest
    * first under struct ordering — distance first, cell id as the
    * deterministic tie-break.
    */
  private def cellStructsCol(emb: Column, centroids: Array[(Int, Array[Double])]): Column =
    zip_with(
      transform(centArrayCol(centroids), c =>
        aggregate(
          zip_with(emb, c, (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
          lit(0.0), (acc, d) => acc + d)),
      sequence(lit(0), lit(centroids.length - 1)),
      (d, i) => call_function("named_struct", lit("d"), d, lit("cell"), i))

  /** Nearest-centroid cell id (argmin via struct array_min). */
  def ivfCellCol(emb: Column, centroids: Array[(Int, Array[Double])]): Column =
    array_min(cellStructsCol(emb, centroids)).getField("cell")

  /** The `nProbe` nearest cells for a query vector. */
  def ivfProbeCellsCol(emb: Column, centroids: Array[(Int, Array[Double])], nProbe: Int): Column =
    transform(slice(array_sort(cellStructsCol(emb, centroids)), 1, nProbe),
      s => s.getField("cell"))

  /** Max sample collected to the driver for centroid training. */
  val KMeansSampleCap = 16384

  /** Deterministic IVF centroids: Lloyd iterations on a driver-side
    * sample (the k lowest vec_ids seed; the `KMeansSampleCap` lowest
    * vec_ids train). Sample-based training is the production design —
    * at 10^12 vectors nobody Lloyd-iterates the full corpus, and a
    * distributed iteration over a tiny sample is all scheduler
    * overhead (measured ~1s/iteration of pure job latency). The
    * ASSIGNMENT pass — the part that actually scales with corpus
    * size — stays a narrow distributed projection against the
    * broadcast centroid literals.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): Array[(Int, Array[Double])] = {
    val sample: Array[Array[Double]] = corpus.orderBy(col("vec_id")).limit(KMeansSampleCap)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    var cents: Array[Array[Double]] = sample.take(k).map(_.clone())
    val dim = cents(0).length
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0; var j = 0
          val cv = cents(c)
          while (j < dim) { val t = v(j) - cv(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else { val m = sums(c); var j = 0; while (j < dim) { m(j) /= counts(c); j += 1 }; m }
      }
    }
    cents.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** ANN via IVF: corpus vectors live in exactly one cell (narrow
    * assignment against broadcast centroid literals — no shuffle);
    * each query probes its `nProbe` nearest cells; candidates re-score
    * exactly; per-query top-k. Recall vs brute force validated in
    * tests. Unlike LSH this gives a recall knob (nProbe) independent
    * of the corpus partitioning.
    */
  def annIvfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nCells: Int, nProbe: Int, kmeansIters: Int = 2): DataFrame = {
    val cents = kmeansCentroids(corpus, nCells, kmeansIters)
    val c = corpus.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("c_nrm"),
      ivfCellCol(col("embedding"), cents).as("cell"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        normCol(col("embedding")).as("q_nrm"),
        explode(ivfProbeCellsCol(col("embedding"), cents, nProbe)).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dotCol(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
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
