package graft.cli

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time near-dup connected components at bench scale and
  * print the phase split (candidate-pair edges vs star contraction).
  */
object ComponentsProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[components] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Dedup.jaccardPairs(docs, 25, 0.8).count()
    for (_ <- 0 until 2) {
      val pairs = t("pairs")(
        Dedup.jaccardPairs(docs, 25, 0.8).localCheckpoint(true))
      println(s"[components] n_pairs=${pairs.count()}")
      val labels = t("contraction")(Dedup.nearDupComponents(pairs))
      println(s"[components] n_nodes=${labels.count()} " +
        s"n_clusters=${labels.where(col("id") === col("label")).count()}")
    }
    spark.stop()
  }
}
