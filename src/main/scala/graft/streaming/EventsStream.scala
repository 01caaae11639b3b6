package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  final case class FirstEvent(user_id: Long, event_type: String, event_id: Long,
                              ts: java.sql.Timestamp, value: Double)

  /** Streaming exact-dedup: keep the FIRST-ARRIVED event per
    * (user_id, event_type) — the streaming face of the training-
    * pipeline exact-dedup gate (drop re-ingested duplicates at the
    * door instead of re-scanning the lake).
    *
    * Implemented with per-key state rather than raw `dropDuplicates`,
    * for two determinism properties a review of the naive form found
    * missing: (a) WITHIN a micro-batch the kept row is the
    * (ts, event_id)-minimum, not whichever row the file happened to
    * order first; (b) no watermark is attached, so a key whose first
    * arrival is arbitrarily event-time-late is still admitted (state
    * is one marker per key either way — a watermark bought no eviction
    * on non-time keys, only silent drops). Twin equality
    * (`dedupBatch`) then holds exactly whenever each key's globally
    * earliest event is in the key's first-seen micro-batch — lake-file
    * time ordering at file granularity, the documented ingestion
    * contract. State per key is one boolean; when keys are unbounded,
    * production adds an event-time timeout to age markers out,
    * trading global dedup for dedup-within-lateness.
    */
  def dedupStream(events: Dataset[Sessionize.Event]): Dataset[FirstEvent] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Boolean, FirstEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), it: Iterator[Sessionize.Event],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            val e = it.minBy(x => (Sessionize.micros(x.ts), x.event_id))
            state.update(true)
            Iterator.single(FirstEvent(e.user_id, e.event_type, e.event_id, e.ts, e.value))
          }
      }
  }

  /** BOUNDED-STATE streaming dedup: the documented production switch
    * for unbounded key cardinality (dedupStream's NoTimeout marker set
    * grows forever — round-3 advice asked for the variant to exist and
    * be tested, not just described). A key's marker expires once the
    * watermark passes (first admitted event-time + ttlMs): duplicates
    * inside that horizon are dropped, the key re-admits after — global
    * dedup traded for dedup-within-lateness, state bounded by the key
    * count active inside one TTL window. Timeouts ride Spark's
    * event-time timeout off the `watermarkDelay` watermark, so expiry
    * is driven by EVENT time, deterministic under replay.
    */
  def dedupStreamTtl(events: Dataset[Sessionize.Event], watermarkDelay: String,
                     ttlMs: Long): Dataset[FirstEvent] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      // state = the key's expiry target (first admitted event-time +
      // ttl, in ms). It must be STORED, not only armed: Spark clears a
      // key's event-time timer on every function invocation, so a
      // suppressed duplicate would silently disarm the timeout unless
      // the handler re-arms it from the stored target each time.
      .flatMapGroupsWithState[Long, FirstEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, String), it: Iterator[Sessionize.Event],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          // max with watermark+1: setTimeoutTimestamp rejects targets
          // the watermark already passed (a key whose expiry lapsed
          // mid-batch gets one-batch-lifetime state, not a crash)
          def arm(target: Long): Unit =
            state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs() + 1L))
          // a stored marker whose target the watermark has passed is
          // logically EXPIRED even if the timeout callback never fired:
          // Spark only delivers hasTimedOut invocations for keys with
          // NO data in the batch, so a key receiving a steady trickle
          // would otherwise keep a lapsed marker alive forever and
          // suppress every post-horizon event. Compare against the
          // stored target, not just marker existence.
          val live = state.exists && !state.hasTimedOut &&
            state.get > state.getCurrentWatermarkMs()
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (live) { // duplicate within the TTL horizon
            arm(state.get)
            Iterator.empty
          } else if (!it.hasNext) Iterator.empty
          else { // fresh key OR lapsed marker: (re-)admit
            val e = it.minBy(x => (Sessionize.micros(x.ts), x.event_id))
            val target = Sessionize.micros(e.ts) / 1000L + ttlMs
            state.update(target)
            arm(target)
            Iterator.single(FirstEvent(e.user_id, e.event_type, e.event_id, e.ts, e.value))
          }
      }
  }

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
  def runDedupOnce(spark: SparkSession, dir: String, queryName: String): DataFrame =
    runDedupWith(spark, dir, queryName, dedupStream)

  /** Same harness for the TTL variant. */
  def runDedupTtlOnce(spark: SparkSession, dir: String, queryName: String,
                      watermarkDelay: String, ttlMs: Long): DataFrame =
    runDedupWith(spark, dir, queryName, dedupStreamTtl(_, watermarkDelay, ttlMs))

  private def runDedupWith(spark: SparkSession, dir: String, queryName: String,
                           dedup: Dataset[Sessionize.Event] => Dataset[FirstEvent]): DataFrame = {
    import spark.implicits._
    val stream = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Sessionize.Event]
    val q = dedup(stream).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
