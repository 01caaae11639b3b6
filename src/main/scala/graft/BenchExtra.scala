package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extra benchmark main for the optimization rounds (guide §1.4):
  * times a chosen subset of SparkEntry queries in ISOLATION with the
  * noop sink (same session config and per-query-min-of-N protocol as
  * graft.Bench, which stays frozen) and optionally dumps each query's
  * `.explain("formatted")` to a directory for plan-diff evidence.
  *
  * Usage:
  *   sbt 'runMain graft.BenchExtra q1 q2 ...'        # time queries
  *   SPARK_GRAFT_PLAN_DIR=plans/r07 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt 'runMain graft.BenchExtra --plans q1 ...' # dump plans only
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default
  * 32), SPARK_GRAFT_PASSES (default 2). Never used by the driver; the
  * contract bench is graft.Bench.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
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

  /** Write each query's formatted plan to `dir/<name>_<suffix>.txt`
    * (session-agnostic body, CliSmokeSpec-coverable).
    */
  def dumpPlans(spark: SparkSession, sfDir: String, names: Seq[String],
                dir: String, suffix: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench-extra] wrote $dir/${n}_$suffix.txt")
    }
  }

  /** Time the named queries (noop-forced, min over `passes`
    * interleaved passes; session-agnostic body) and return
    * name -> per-pass seconds in pass order.
    */
  def run(spark: SparkSession, sfDir: String, names: Seq[String],
          passes: Int): Map[String, List[Double]] = {
    val results = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    for (_ <- 0 until passes; n <- names) {
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val sec = time(force(SparkEntry.queries(n)(spark, sfDir)))
      results(n) = results.getOrElse(n, Nil) :+ sec
      org.apache.spark.sql.graft.ColumnBridge.reclaimNewRdds(spark, persistedBefore)
    }
    results.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val plansOnly = args.contains("--plans")
    val names = args.filterNot(_.startsWith("--")).toSeq
    require(names.nonEmpty, "usage: BenchExtra [--plans] <query> [query...]")
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val spark = session(cpus)

    if (plansOnly) {
      dumpPlans(spark, sfDir, names,
        sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r07"),
        sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before"))
      spark.stop()
      return
    }

    // warmup outside the timed region: JVM/codegen + page cache
    force(SparkEntry.queries("ocr_extract")(spark, "/root/testdata/sf0.001"))
    Seq("documents", "events", "lineitem", "embeddings", "customer", "nation", "orders")
      .map(t => s"$sfDir/$t.parquet")
      .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      .foreach(p => force(spark.read.parquet(p)))

    val results = run(spark, sfDir, names, passes)
    spark.stop()
    val ordered = names.map(n => n -> results(n))
    val qs = ordered.map { case (k, ts) =>
      f""""$k":${ts.min}%.3f""" }.mkString("{", ",", "}")
    val raw = ordered.map { case (k, ts) =>
      s""""$k":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"bench_extra","unit":"sec","queries":$qs,"passes":$raw,"sf":"$sfDir"}""")
  }
}
