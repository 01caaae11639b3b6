package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is batch-only
  * (SURVEY.md §2.8 — resumability there is the checkpoint table), but
  * a production extraction lake also ingests event/metrics streams;
  * this module covers that capability: a watermarked windowed
  * aggregation over the `events` table schema, runnable incrementally
  * (`readStream`) or as the equivalent batch query for oracle checks.
  */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** 5-minute tumbling-window counts per event type, 10-minute
    * watermark for late data.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Run the streaming query over a parquet directory until all
    * available input is processed; results land in an in-memory table
    * (deterministic: one batch of static input).
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val stream = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = windowedAgg(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Batch twin of windowedAgg (the oracle). */
  def batchEquivalent(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(spark.read.schema(eventsSchema).parquet(dir))

  // ---- streaming exact-dedup (first arrival per key) ----------------------

  /** Streaming exact-dedup: keep the FIRST-ARRIVED event per
    * (user_id, event_type) — the streaming face of the training-
    * pipeline exact-dedup gate (drop re-ingested duplicates at the
    * door instead of re-scanning the lake).
    *
    * `dropDuplicates` on non-time keys holds one state row per
    * distinct key forever — exact global dedup, state O(distinct
    * keys). When keys are unbounded, production bounds the state with
    * `dropDuplicatesWithinWatermark` instead, trading global dedup for
    * dedup-within-lateness; the query shape is identical, so the
    * switch is one call. When ingestion is time-ordered (lake file
    * order), first arrival == earliest (ts, event_id), which is what
    * the batch twin below states deterministically.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))

  /** Batch twin: earliest (ts, event_id) per key — the deterministic
    * statement of first arrival under time-ordered ingestion. One
    * window exchange keyed on the dedup key.
    */
  def dedupBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
  }

  /** Run the streaming dedup over a parquet dir (one file per
    * micro-batch, arrival order = file modification order).
    */
  def runDedupOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val stream = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = dedupStream(stream).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
