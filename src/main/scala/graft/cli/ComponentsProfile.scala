package graft.cli

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time near-dup connected components at bench scale and
  * print the phase split (candidate-pair edges vs star contraction).
  */
object ComponentsProfile {

  /** Synthetic stress graph: a path of `chainLen` edges (worst-case
    * diameter) + `clusters` 100-node random clusters (~50 edges each).
    * Diameter-independence is the whole point of star contraction:
    * min-label propagation would need `chainLen` rounds here.
    */
  def stress(spark: SparkSession, chainLen: Long, clusters: Long): Unit = {
    import spark.implicits._
    val chain = spark.range(chainLen).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val base = chainLen + 1000000L
    val clusterEdges = spark.range(clusters * 50).select(
      (lit(base) + floor(col("id") / 50) * 100 + pmod(xxhash64(col("id"), lit(1)), lit(100))).as("id_a"),
      (lit(base) + floor(col("id") / 50) * 100 + pmod(xxhash64(col("id"), lit(2)), lit(100))).as("id_b"))
      .where(col("id_a") =!= col("id_b"))
    val edges = chain.union(clusterEdges).localCheckpoint(true)
    val n = edges.count()
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val t0 = System.nanoTime()
    // result arrives pre-materialized (eager labels checkpoint)
    val labels = Dedup.nearDupComponents(edges, maxIters = 60)
    val sec = (System.nanoTime() - t0) / 1e9
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- rddsBefore
    val nodes = labels.count()
    val comps = labels.where(col("id") === col("label")).count()
    val chainOk = labels.where(col("id") <= chainLen && col("label") === 0).count() == chainLen + 1
    println(f"[stress] edges=$n nodes=$nodes components=$comps chain_resolved=$chainOk sec=$sec%.1f new_persistent_rdds=${leaked.size}")
    assert(leaked.size <= 1,
      s"components leaked ${leaked.size} persistent RDDs (expected only the labels checkpoint)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("--stress")) stress(spark, chainLen = 100000L, clusters = 20000L)
    else run(spark, sfDir, passes = 2)
    spark.stop()
  }

  /** Profile body, session-agnostic so `sbt test` can smoke it. */
  def run(spark: SparkSession, sfDir: String, passes: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[components] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Dedup.jaccardPairs(docs, 25, 0.8).count()
    for (_ <- 0 until passes) {
      val pairs = t("pairs")(
        Dedup.jaccardPairs(docs, 25, 0.8).localCheckpoint(true))
      println(s"[components] n_pairs=${pairs.count()}")
      val labels = t("contraction")(Dedup.nearDupComponents(pairs))
      println(s"[components] n_nodes=${labels.count()} " +
        s"n_clusters=${labels.where(col("id") === col("label")).count()}")
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(labels)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(pairs)
    }
  }
}
