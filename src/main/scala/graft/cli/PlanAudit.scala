package graft.cli
import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: print each named SparkEntry query's
  * Exchange count and its Exchange/Scan lines (the two plan features
  * every scale review here starts from — shuffle structure and what
  * reaches the parquet scan). Usage:
  *   sbt 'runMain graft.cli.PlanAudit j5_asof_bucketed st_anomaly'
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange ".r.findAllIn(plan).size
      println(s"=== $q: $nEx exchanges")
      println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan ")).mkString("\n").take(2500))
    }
    spark.stop()
  }
}
