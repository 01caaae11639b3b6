package graft.cli

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: large-corpus smoke for the dedup/ANN family — do the
  * bucket-blocked paths stay candidate-bounded (linear-ish wall time,
  * bounded heap) at 100x the driver-corpus scale, including planted
  * duplicates and a hot (degenerate) key cluster?
  *
  * Synthesizes n docs of ~40 tokens from a 5,000-word vocabulary, with
  * 1% planted near-dups and 0.2% IDENTICAL docs (the hot-bucket case
  * the cap must absorb), plus n 64-dim embeddings in 256 clusters.
  */
object SketchSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, n)
    spark.stop()
  }

  /** Smoke body, session-agnostic so `sbt test` can run it small. */
  def run(spark: SparkSession, n: Int): Unit = {
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit("en").as("lang"),
      // deterministic ~40-token docs; every 100th is a near-dup of its
      // predecessor (shares 39 of 40 tokens); every 500th IDENTICAL to
      // doc 0 (hot digest + hot minhash buckets). Residues chosen
      // DISJOINT: hot ids are 450 (mod 500) = 50 (mod 100), so a
      // near-dup's predecessor (42 mod 100) is never rewritten to the
      // hot text — every planted near-dup really has its partner
      when(col("id") % 500 === 450, docText(0, 0))
        .when(col("id") % 100 === 43, docTextShifted())
        .otherwise(docText(0, 1)).as("text"))

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val rt = Runtime.getRuntime
      println(f"[sketch-smoke] $name%-22s n=$n rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.1f " +
        f"heap_used_mb=${(rt.totalMemory - rt.freeMemory) / 1024 / 1024}")
    }

    timed("exact_groups") { Dedup.exactGroups(docs).where(col("n_docs") > 1).count() }
    timed("minhash_lsh_poly") {
      Dedup.minhashLshPairsPoly(docs, bands = 8, rowsPerBand = 4, threshold = 0.8).count()
    }
    timed("simhash_poly") { Dedup.simhashPairsPoly(docs, maxHamming = 4).count() }
    // round-4 ops: the inverted span index (hot identical-doc spans
    // absorbed by the postings cap), the asymmetric containment
    // window, and the order-sensitive ingest gate
    timed("span_overlap_n8") { Dedup.spanOverlapPairs(docs, n = 8).count() }
    timed("containment_w25") {
      Dedup.containmentPairs(docs, n = 3, idWindow = 25, threshold = 0.6).count()
    }
    timed("ingest_gate_ngram3") {
      Dedup.incrementalIngestFilter(docs, col("doc_id") % 2 === 0,
        bands = 8, rowsPerBand = 4, threshold = 0.5, shingleN = 3).count()
    }

    // persisted-sketch ingest index vs the re-sketching gate in the
    // regime the index exists for (corpus >> batch): 3 sequential
    // accreting batches against a ~n-doc corpus. The re-sketching face
    // pays a full corpus tokenize+hash PER BATCH; the indexed face
    // pays it once at init and then only probes the persisted,
    // partition-pruned state tables (round-5 verdict #1). Compare
    // `ingest_resketch_3b` against `ingest_index_init` (the one-time
    // cost) + the per-batch `ingest_indexed_b<k>` probes (the
    // steady-state cost). Batch size is FIXED — independent of n — so
    // runs at different n isolate STATE scaling: the probe numbers
    // across n are the state-linearity evidence.
    val batchSize = math.min(math.max(n / 100, 10), 500)
    val corpusD = docs.where(col("doc_id") >= 3L * batchSize)
      .select(col("doc_id"), col("text"))
    def batchOf(k: Int) = docs
      .where(col("doc_id") >= k.toLong * batchSize &&
        col("doc_id") < (k + 1).toLong * batchSize)
      .select(col("doc_id"), col("text"))
    val newDocs = docs.where(col("doc_id") < 3L * batchSize).select(col("doc_id"), col("text"))
    val batchCol = floor(col("doc_id") / batchSize).cast("long")
    // the shipped accreting protocol itself, not a re-implementation —
    // the smoke must benchmark exactly what st_ingest runs
    timed("ingest_resketch_3b") {
      graft.streaming.IngestStream.ingestBatchTwin(corpusD, newDocs, batchCol,
        nBatches = 3, bands = 8, rowsPerBand = 4, threshold = 0.8).count()
    }
    // indexed face: the SHIPPED persisted path (IngestIndex.gateBatch —
    // exactly what ingestStreamIndexed runs per micro-batch), timed
    // apart: init is the one-time cost; each per-batch probe is the
    // steady state every future batch pays. Probe reads go through
    // PrunedSketchState: the fat per-doc toks column is read only for
    // candidate partners' partitions (O(candidates), ~flat in state);
    // the two narrow postings scans prune by probe-key partitions and
    // otherwise stay small-constant columnar reads.
    val stateDir = java.nio.file.Files.createTempDirectory("graft-smoke-state").toString
    val gateOut = java.nio.file.Files.createTempDirectory("graft-smoke-gateout").toString
    timed("ingest_index_init") {
      graft.streaming.IngestIndex.initState(corpusD, stateDir, bands = 8, rowsPerBand = 4)
      spark.read.parquet(s"$stateDir/banded").count()
    }
    for (k <- 0 until 3) {
      timed(s"ingest_indexed_b$k") {
        graft.streaming.IngestIndex.gateBatch(batchOf(k), k.toLong, stateDir, gateOut,
          bands = 8, rowsPerBand = 4, threshold = 0.8)
        spark.read.parquet(s"$gateOut/batch_id=$k").count()
      }
    }
    // state consolidation: squash the accreted batch dirs back to the
    // one-snapshot layout and re-gate a batch — decisions must be
    // identical and the probe must not regress (at 10^3-10^4 batch
    // dirs the listing/footer saving dominates; here the point is the
    // measured NON-regression plus the structural file-count drop)
    timed("ingest_state_compact") {
      graft.streaming.IngestIndex.compactState(spark, stateDir, upToBatch = 2L)
      new java.io.File(s"$stateDir/banded").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("batch_id=")).toLong
    }
    timed("ingest_indexed_postcmp") {
      graft.streaming.IngestIndex.gateBatch(batchOf(2), 3L, stateDir, gateOut,
        bands = 8, rowsPerBand = 4, threshold = 0.8)
      // batch 2's docs were all admitted at batch 2 and are now state:
      // every one must reject against the compacted snapshot
      spark.read.parquet(s"$gateOut/batch_id=3").count()
    }

    // round-6 ops at scale: the bounded-memory heavy-hitter sketch
    // (shuffle independent of the ~n/2-key vocabulary — the exact
    // groupBy twin shuffles one row per distinct key), the
    // bucket-expansion range join (hash join, candidate volume
    // ~points x intervals-per-point, never |P| x |I|), and the
    // bloom-prefiltered digest anti-join (probe-negative rows skip
    // the join; note the fixture's hot identical digests land in ONE
    // bloom cell set — degenerate keys cost nothing extra)
    timed("heavy_hitters_mg64") {
      import org.apache.spark.sql.graft.ColumnBridge
      val keys = spark.range(n).select(
        when(col("id") % 10 < 5, concat(lit("hot_"), col("id") % 10))
          .otherwise(concat(lit("cold_"), col("id"))).as("key"))
      val mg = ColumnBridge.column(graft.functions.MisraGries(
        ColumnBridge.expression(col("key")), 64).toAggregateExpression())
      keys.agg(mg.as("hh")).select(explode(col("hh"))).count()
    }
    timed("range_join_bucketed") {
      val pts = spark.range(n).select(col("id").as("p_id"),
        (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100).as("v"))
      val ivals = spark.range(math.max(n / 100, 100).toLong)
        .select(col("id").as("band"), col("id").cast("double").as("lo"),
          (col("id") + 12).cast("double").as("hi"))
      graft.operators.RangeJoin.rangeJoin(pts, "v", ivals, "lo", "hi",
        bucketWidth = 10.0).count()
    }
    timed("fuzzy_join_qgram") {
      // n canonical 36-char strings vs n single-edit dirty variants,
      // q=5: expected gram-join volume is n^2 x ~32 aligned offsets x
      // 26^-5 ~ 1e-5 x n^2 (1.8M candidate rows at n=400k, pruned
      // further by the count filter at threshold 36-5+1-10=22) — wall
      // tracks that candidate volume, never the n^2 Levenshtein grid.
      // Gram width picks the tradeoff: q=3 on 12-char strings (the
      // oracle fixture) is fine at query scale but its 26^-3 aligned
      // selectivity would go quadratic here; record-linkage-length
      // strings want the wider gram.
      val F = graft.operators.FuzzyJoin
      val ids = spark.range(n)
      def wide(c: org.apache.spark.sql.Column) = concat(
        F.canonicalCol(c), F.canonicalCol(c + 500000L), F.canonicalCol(c + 9000000L))
      def wideDirty(c: org.apache.spark.sql.Column) = concat(
        F.dirtyCol(c), F.canonicalCol(c + 500000L), F.canonicalCol(c + 9000000L))
      F.fuzzyJoin(
        ids.select(col("id").as("l_id"), wide(col("id")).as("l_s")),
        "l_id", "l_s",
        ids.select(col("id").as("r_id"), wideDirty(col("id")).as("r_s")),
        "r_id", "r_s", d = 2, q = 5).count()
    }
    timed("cms_probe") {
      // mergeable count-min build over the hot/cold stream + a
      // 9-key probe: the build is one treeAggregate, the probe a
      // broadcast expression — nothing scales with the vocabulary
      val keys = spark.range(n).select(
        when(col("id") % 10 < 5, concat(lit("hot_"), col("id") % 10))
          .otherwise(concat(lit("cold_"), col("id"))).as("key"))
      val cms = keys.stat.countMinSketch("key", 0.002, 0.99, 42)
      val est = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.CmsEstimate(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("key")),
          graft.functions.CmsEstimate.serialize(cms)))
      spark.range(9).select(concat(lit("hot_"), col("id")).as("key"))
        .select(est.as("e")).where(col("e") >= 0).count()
    }
    timed("bloom_prefilter") {
      val d = docs.select(col("doc_id"), md5(col("text")).as("digest"))
      val reject = d.where(col("doc_id") % 3 === 0).select(col("digest"))
      val bloom = reject.stat.bloomFilter("digest", math.max(n / 3, 1000).toLong, 0.03)
      val probe = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.BloomMightContain(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("digest")),
          graft.functions.BloomMightContain.serialize(bloom)))
      d.where(!probe).unionByName(
        d.where(probe).join(reject, Seq("digest"), "left_anti")).count()
    }

    // cast to array<float>: Spark's / promotes to double, but the
    // embedding contract (like the driver table) is float32
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id") % 256, d), lit(1000)).cast("float") - 500f) / 500f +
          (pmod(xxhash64(col("id"), d, lit(7)), lit(100)).cast("float") - 50f) / 2000f)
        .cast("array<float>").as("embedding"))
    timed("embed_cosine_lsh") {
      Similarity.embedCosineLshPairs(emb, planes = 12, threshold = 0.95).count()
    }
    timed("ann_lsh_multiprobe") {
      Similarity.annLshTopK(emb, emb.where(col("vec_id") < 32), k = 10,
        planes = 12, probeBits = 1).count()
    }
    timed("ann_ivf") {
      Similarity.annIvfTopK(emb, emb.where(col("vec_id") < 32), k = 10,
        nCells = 64, nProbe = 8).count()
    }
  }

  /** ~40 deterministic tokens from a 5k vocab, parameterized so docs
    * differ (mix=1) or repeat exactly (mix=0 pins every token draw).
    */
  private def docText(base: Long, mix: Int) = {
    val toks = (0 until 40).map { j =>
      concat(lit("w"), pmod(xxhash64(lit(base) + col("id") * mix, lit(j)), lit(5000)))
    }
    concat_ws(" ", toks: _*)
  }

  /** Near-dup of the PREVIOUS doc: same 40 draws keyed off id-1, one
    * token replaced.
    */
  private def docTextShifted() = {
    val toks = (0 until 39).map { j =>
      concat(lit("w"), pmod(xxhash64(col("id") - 1, lit(j)), lit(5000)))
    } :+ lit("changed")
    concat_ws(" ", toks: _*)
  }
}
