package graft.cli

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** `--compare`-style CLI facade over the existing rankings / stats /
  * pivot / envelope queries — the cosmetic mirror of the reference's
  * multi-backend comparison report (/root/reference/src/main.py:21-166
  * argument surface, ocr_evaluation.py:389-415 printed sections), with
  * "backends" stood in by corpus sources as everywhere else in the
  * driver contract. ZERO new semantics: every section is a
  * SparkEntry.queries entry, so everything printed here is already
  * oracle-checked.
  *
  * Usage: runMain graft.cli.CompareCli [sfDir] [--rankings|--stats|--pivot|--envelope]
  * (default: all sections, sfDir=/root/testdata/sf0.01)
  */
object CompareCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.01")
    val sections = args.filter(_.startsWith("--")).map(_.drop(2)).toSet

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, sections)
    spark.stop()
  }

  /** Report body, session-agnostic so `sbt test` can smoke it on the
    * shared test session (empty `sections` = all).
    */
  def run(spark: SparkSession, sfDir: String, sections: Set[String]): Unit = {
    def want(s: String) = sections.isEmpty || sections.contains(s)

    println("=" * 60)
    println("BACKEND COMPARISON RESULTS (sources as backends)")
    println("=" * 60)

    if (want("rankings")) {
      println("\nOVERALL PERFORMANCE RANKING:")
      SparkEntry.queries("r2r4_rankings")(spark, sfDir)
        .orderBy("rank").collect().foreach { r =>
          println(f"${r.getAs[Long]("rank")}. ${r.getAs[String]("source")}%-12s score: ${r.getAs[Double]("score")}%.6f")
        }
    }
    if (want("stats")) {
      println("\nSTATISTICS:")
      val s = SparkEntry.queries("a8_backend_stats")(spark, sfDir).collect().head
      println(f"Best Overall   : ${s.getAs[String]("best_source")}")
      println(f"Fastest        : ${s.getAs[String]("fastest_source")}")
      println(f"Avg Confidence : ${s.getAs[Double]("avg_conf")}%.6f")
      println(f"Avg Speed      : ${s.getAs[Double]("avg_speed")}%.6f")
    }
    if (want("pivot")) {
      println("\nBACKEND-KEYED MERGE (per-user event pivot, first 10):")
      SparkEntry.queries("j1_backend_pivot")(spark, sfDir)
        .orderBy("user_id").show(10, truncate = false)
    }
    if (want("envelope")) {
      println("\nEVALUATION ENVELOPE (first 5):")
      SparkEntry.queries("eval_envelope")(spark, sfDir)
        .orderBy("doc_id").show(5, truncate = false)
    }
  }
}
