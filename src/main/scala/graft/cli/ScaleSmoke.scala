package graft.cli

import org.apache.spark.sql.SparkSession

/** Dev-only: large-corpus smoke — does the one-shuffle pipeline hold
  * at ~10x the bench corpus without memory pressure?
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 200000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.fixtures.DocGen.synthetic(spark, nDocs, seed = 99L,
      maxSpans = 6, imageRatio = 0.5, skewed = true, sentencesPerImage = 10)
    val t0 = System.nanoTime()
    val (ds, obs) = graft.pipeline.ExtractionJob.extractObserved(spark, docs)
    ds.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val m = obs.get
    val rt = Runtime.getRuntime
    println(f"[smoke] docs=${m("docs")} ocr_spans=${m("ocr_spans")} failed=${m("failed_spans")} " +
      f"glyphs=${m("glyphs_classified")} sec=$sec%.1f docs_per_sec=${nDocs / sec}%.0f " +
      f"heap_used_mb=${(rt.totalMemory - rt.freeMemory) / 1024 / 1024}")
    spark.stop()
  }
}
