package graft.operators

import graft.lake.LakeFormat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF index — the production shape of ANN over a corpus
  * that is queried many times: build once (driver k-means on a capped
  * sample + one narrow distributed assignment pass), save through the
  * lake seam with the corpus PARTITIONED BY CELL, then answer every
  * later query by reading only the probed cells (real partition
  * pruning at the parquet scan — at 10^12 vectors the index IS the
  * data layout, and nProbe/nCells of the corpus is all a query ever
  * touches on disk). `Similarity.annIvfTopK` stays the build-and-query
  * one-shot; this is its reusable twin, pinned equal in tests.
  */
object IvfIndex {

  final case class Index(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  /** One assignment pass against broadcast centroid literals. */
  def build(corpus: DataFrame, nCells: Int, kmeansIters: Int = 2): Index = {
    val cents = Similarity.kmeansCentroids(corpus, nCells, kmeansIters)
    val assigned = corpus.select(col("vec_id"), col("embedding"),
      Similarity.normCol(col("embedding")).as("c_nrm"),
      Similarity.ivfCellCol(col("embedding"), cents).as("cell"))
    Index(cents, assigned)
  }

  /** Persist: vectors partitioned by cell (`<name>_vectors/cell=N/`),
    * centroids as a tiny side table.
    */
  def save(idx: Index, lake: LakeFormat, name: String): Unit = {
    lake.write(idx.assigned, s"${name}_vectors", partitionBy = Seq("cell"))
    val spark = idx.assigned.sparkSession
    import spark.implicits._
    lake.write(idx.centroids.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "centroid"), s"${name}_centroids")
  }

  /** Incremental maintenance (round-5 verdict #4): index a batch of
    * NEW vectors in O(batch) — one narrow assignment pass against the
    * SAVED centroids, appended to the cell-partitioned vectors table.
    * Centroids are FROZEN at build (standard IVF accretion: every
    * future query and append sees the same cell geometry; re-training
    * under drift is an offline rebuild decision), so
    * append(batch) ≡ one-pass assignment of (corpus ∪ batch) under the
    * build's centroids — pinned in OperatorsSpec. Appended vec_ids
    * must be new, as with any index insert.
    */
  def append(spark: SparkSession, lake: LakeFormat, name: String,
             newVectors: DataFrame): Unit = {
    val cents = load(spark, lake, name).centroids
    val assigned = newVectors.select(col("vec_id"), col("embedding"),
      Similarity.normCol(col("embedding")).as("c_nrm"),
      Similarity.ivfCellCol(col("embedding"), cents).as("cell"))
    lake.write(assigned, s"${name}_vectors", partitionBy = Seq("cell"),
      mode = org.apache.spark.sql.SaveMode.Append)
  }

  def load(spark: SparkSession, lake: LakeFormat, name: String): Index = {
    val cents = lake.read(spark, s"${name}_centroids")
      .select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    Index(cents, lake.read(spark, s"${name}_vectors"))
  }

  /** Top-k against the index. The `queries` plan is evaluated exactly
    * ONCE: the rows are broadcast-small by contract, so they are
    * collected NON-exploded (each embedding once, with its probe-cell
    * array — not the round-3 form that duplicated every embedding
    * nProbe times on the driver), and BOTH the static `cell IN (...)`
    * scan filter and the broadcast join side derive from that single
    * collection. Deriving them from two separate evaluations (the
    * interim round-4 form) could disagree on a nondeterministic query
    * source (sample/limit) and silently truncate a query's neighbors —
    * the filter pruned cells the join side then probed. The exploded
    * (query, cell) duplication happens inside Spark tasks, never on
    * the driver; the IN filter lets a partition-by-cell layout prune
    * unprobed cells at the parquet source instead of after the read.
    */
  def queryTopK(idx: Index, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qRows = queries.select(col("vec_id").cast("long"),
        col("embedding").cast("array<float>"),
        Similarity.normCol(col("embedding")),
        Similarity.ivfProbeCellsCol(col("embedding"), idx.centroids, nProbe))
      .as[(Long, Array[Float], Double, Array[Int])].collect()
    val probed = qRows.iterator.flatMap(_._4).toArray.distinct.sorted
    val q = qRows.toSeq.toDF("query_id", "q_emb", "q_nrm", "cells")
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        explode(col("cells")).as("cell"))
    val c = idx.assigned.where(col("cell").isin(probed.map(Int.box): _*))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.dotCol(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("score"))
    // bounded per-query top-k (see Similarity.topKPerQuery): a probed
    // cell can be corpus-sized, so no row_number window here either
    Similarity.topKPerQuery(scored, k)
  }
}
