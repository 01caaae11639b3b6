package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** PERSISTED-SKETCH face of the accreting streaming ingest gate.
  *
  * `IngestStream` is semantically complete but re-reads and re-sketches
  * the FULL reference corpus (corpus ∪ earlier admissions) every
  * micro-batch — an O(corpus) text scan + hash per batch, the one cost
  * in the dedup surface that did not survive the 100 TB design review
  * (round-4 verdict, "what's wrong" #2). This object removes it:
  *
  *  - `initState` sketches the corpus ONCE into two narrow parquet
  *    tables under `stateDir` — `meta` (doc_id, exact digest, verify
  *    token-hash set) and `banded` (LSH bucket postings) — each
  *    partitioned by `batch_id` (the corpus slice is batch_id=-1);
  *  - every micro-batch sketches ONLY itself, probes the persisted
  *    postings with its (small, broadcast) bucket set, verifies against
  *    the persisted toks of candidate partners, and APPENDS its
  *    admitted docs' slices as partition `batch_id=k`;
  *  - corpus text is never read after init — `ingestStreamIndexed`
  *    does not even take the corpus path (StreamingSpec deletes the
  *    corpus directory after init and the stream still gates
  *    correctly: the no-full-corpus-scan property holds by
  *    construction, not by plan luck).
  *
  * Replay safety is the same contract as IngestStream: batch k reads
  * only state partitions with batch_id < k and OVERWRITES its own
  * `batch_id=k` partitions (sink and state), so a replayed batch
  * reconstructs the identical decision and the identical appended
  * state. The admission semantics are exactly `IngestStream.gate` —
  * `st_ingest_indexed` is checked against the SAME chained DuckDB
  * oracle as `st_ingest`.
  */
object IngestIndex {

  /** Sketch `corpus` once and write the two state slices under
    * `stateDir/<slice>/batch_id=-1`.
    */
  def initState(corpus: DataFrame, stateDir: String,
                bands: Int, rowsPerBand: Int, shingleN: Int = 1): Unit = {
    val (m, b) = Dedup.sketchSlices(
      corpus.select(col("doc_id"), col("text")), bands, rowsPerBand, shingleN)
    writeSlices(m, b, stateDir, -1L)
  }

  private def writeSlices(meta: DataFrame, banded: DataFrame,
                          stateDir: String, batchId: Long): Unit = {
    meta.write.mode("overwrite").parquet(s"$stateDir/meta/batch_id=$batchId")
    banded.write.mode("overwrite").parquet(s"$stateDir/banded/batch_id=$batchId")
  }

  /** State slices visible to batch `batchId`: every partition with a
    * strictly smaller batch_id (on replay the batch's own stale
    * partition is excluded, keeping the decision deterministic).
    */
  def readState(spark: SparkSession, stateDir: String,
                batchId: Long): (DataFrame, DataFrame) = {
    def slice(name: String) =
      spark.read.option("basePath", s"$stateDir/$name").parquet(s"$stateDir/$name")
        .where(col("batch_id") < batchId).drop("batch_id")
    (slice("meta"), slice("banded"))
  }

  /** Start the indexed streaming gate over doc files in `inDir`.
    * `stateDir` must have been initialized with `initState`; the
    * corpus itself is NOT an input. Admitted (doc_id, text) land under
    * `outDir/batch_id=k`, and their sketch slices accrete into
    * `stateDir`.
    */
  def ingestStreamIndexed(spark: SparkSession, stateDir: String, inDir: String,
                          outDir: String, checkpointDir: String,
                          bands: Int = 8, rowsPerBand: Int = 4, threshold: Double = 0.8,
                          shingleN: Int = 1,
                          maxBucketSize: Int = Dedup.MaxBucketSize): StreamingQuery = {
    val schema = spark.read.parquet(inDir).select("doc_id", "text").schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    in.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val (sm, sb) = readState(s, stateDir, batchId)
        val b = batch.select(col("doc_id"), col("text"))
        // batch slices materialize ONCE: they feed the gate AND the
        // admitted-state writes — without the checkpoint each consumer
        // would re-tokenize the batch (the "sketched exactly once"
        // contract, review round-5); `kept` likewise (plan-
        // reevaluation trap: see ingestBatchTwin)
        val (bm0, bb0) = Dedup.sketchSlices(b, bands, rowsPerBand, shingleN)
        val bm = bm0.localCheckpoint(true)
        val bb = bb0.localCheckpoint(true)
        val kept = Dedup.indexedIngestFilter(bm, bb, sm, sb,
          threshold, maxBucketSize).localCheckpoint(true)
        def admitted(df: DataFrame) = df.join(kept, Seq("doc_id"), "left_semi")
        admitted(b).write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        writeSlices(admitted(bm), admitted(bb), stateDir, batchId)
      }
      .start()
  }

  /** Drain all currently-available input, then stop (test/dev). */
  def runOnceIndexed(spark: SparkSession, stateDir: String, inDir: String,
                     outDir: String, checkpointDir: String,
                     bands: Int = 8, rowsPerBand: Int = 4, threshold: Double = 0.8,
                     shingleN: Int = 1): Unit = {
    val q = ingestStreamIndexed(spark, stateDir, inDir, outDir, checkpointDir,
      bands, rowsPerBand, threshold, shingleN)
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Batch twin of the indexed stream (the oracle-checked face, like
    * IngestStream.ingestBatchTwin): state lives as accreting
    * MATERIALIZED DataFrames instead of parquet partitions — each
    * round appends only the admitted docs' checkpointed slices, so
    * every doc is sketched exactly once across the whole run, same as
    * the persisted path. Returns (doc_id, batch_id).
    */
  def ingestBatchTwinIndexed(corpus: DataFrame, newDocs: DataFrame, batchOf: Column,
                             nBatches: Int, bands: Int, rowsPerBand: Int,
                             threshold: Double, shingleN: Int = 1,
                             maxBucketSize: Int = Dedup.MaxBucketSize): DataFrame = {
    val (cm, cb) = Dedup.sketchSlices(
      corpus.select(col("doc_id"), col("text")), bands, rowsPerBand, shingleN)
    var sm = cm.localCheckpoint(true)
    var sb = cb.localCheckpoint(true)
    val tagged = newDocs.select(col("doc_id"), col("text"), batchOf.as("bno"))
    var out: DataFrame = null
    for (bi <- 0 until nBatches) {
      val b = tagged.where(col("bno") === bi).select(col("doc_id"), col("text"))
      // one materialization per batch's slices (see ingestStreamIndexed)
      val (bm0, bb0) = Dedup.sketchSlices(b, bands, rowsPerBand, shingleN)
      val bm = bm0.localCheckpoint(true)
      val bb = bb0.localCheckpoint(true)
      val kept = Dedup.indexedIngestFilter(bm, bb, sm, sb,
        threshold, maxBucketSize).localCheckpoint(true)
      def admitted(df: DataFrame) = df.join(kept, Seq("doc_id"), "left_semi")
      val labeled = kept.select(col("doc_id"), lit(bi.toLong).as("batch_id"))
      out = if (out == null) labeled else out.unionByName(labeled)
      // append ONLY the new slices, each materialized — the state
      // union is a union of already-checkpointed pieces, so round k+1
      // never re-evaluates round k's gate
      sm = sm.unionByName(admitted(bm).localCheckpoint(true))
      sb = sb.unionByName(admitted(bb).localCheckpoint(true))
    }
    out
  }
}
