package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // START CLEAN: a reused out dir would leave STALE result dirs for
    // queries that throw before their overwrite (analysis-time errors
    // never reach the write), and the oracle gate would then compare —
    // and possibly MATCH — last run's parquet, hiding exactly the
    // regression class the gate exists to catch.
    val outRoot = Paths.get(outDir)
    if (Files.exists(outRoot)) {
      import scala.jdk.CollectionConverters._
      // sanity guard before the recursive delete (round-5 advice): only
      // wipe a dir that is empty or visibly a previous verify output
      // (it wrote oracle_sql.json) — a mistyped outDir must error, not
      // vanish.
      val entries = { val s = Files.list(outRoot)
        try s.iterator().asScala.toSeq finally s.close() }
      require(entries.isEmpty || Files.exists(outRoot.resolve("oracle_sql.json")),
        s"refusing to clean $outDir: exists but has no oracle_sql.json " +
          "(not a previous verify output dir)")
      val walk = Files.walk(outRoot)
      try walk.iterator().asScala.toSeq.reverse
        .filterNot(_ == outRoot).foreach(Files.delete)
      finally walk.close()
    }
    new java.io.File(outDir).mkdirs()
    // dev-loop filter (the driver never sets it): restrict BOTH the
    // queries run and the oracles emitted — emitting all oracles with
    // a filtered output dir would trip the gate's missing-output check
    val only = SparkEntry.onlyFilter()
    def selected(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally
        // reclaim query-created checkpoint blocks (the components
        // queries return an eager labels checkpoint): once the result
        // is written, nothing may squat in the BlockManager
        org.apache.spark.sql.graft.ColumnBridge.reclaimNewRdds(spark, persistedBefore)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(o => selected(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
