package graft.cli

import graft.model.{Doc, Span}
import graft.pipeline.ExtractionJob
import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the flagship extraction job (north
  * star: "the job runs via spark-submit on multi-executor clusters").
  *
  *   spark-submit --class graft.cli.ExtractCli <jar> \
  *     --input  <parquet dir/table of (doc_id, spans)> \
  *     --output <output dir (resumable data + checkpoint)> \
  *     [--run-id r1] [--partitions 256] [--salt 42]
  *
  * Cluster sizing guidance for the 10^12-doc design point: partitions
  * should be ~4-8x total executor cores; each logical partition is the
  * unit of resume, so smaller partitions bound lost work on failure.
  */
object ExtractCli {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = opts.getOrElse("--input", sys.error("--input required"))
    val output = opts.getOrElse("--output", sys.error("--output required"))
    val runId = opts.getOrElse("--run-id", "run-0")
    val partitions = opts.getOrElse("--partitions", "256").toInt
    val salt = opts.getOrElse("--salt", "42").toLong

    // master/memory come from spark-submit (which sets the spark.master
    // system property); fall back to local[*] ONLY for bare dev runs so
    // the builder never overrides a cluster submit
    val builder = SparkSession.builder()
      .appName(s"graft-extract-$runId")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(input)
      .select("doc_id", "spans").as[(String, Seq[Span])]
      .map { case (id, spans) => Doc(id, spans) }
    val summary = ExtractionJob.runResumable(spark, docs, output,
      ExtractionJob.Config(numPartitions = partitions, salt = salt, runId = runId))
    println(s"[extract] run=${summary.runId} processedPartitions=${summary.processedPartitions} " +
      s"skipped=${summary.skippedPartitions} docs=${summary.docs} ocrSpans=${summary.ocrSpans} " +
      s"directSpans=${summary.directSpans} failedSpans=${summary.failedSpans}")
    spark.stop()
  }
}
