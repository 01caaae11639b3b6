package graft.lake

import java.nio.file.Files

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LakeFormat seam: Iceberg-style partitioned parquet layout must give
  * Catalyst real partition pruning — a partition-filtered read may not
  * scan (or even list) the other partitions' files.
  */
class LakeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("partitioned write + filtered read prunes partitions in the physical plan") {
    val base = Files.createTempDirectory("graft-lake").toString
    val lake = new ParquetLake(base)
    val df = (0 until 1000).map(i => (i.toLong, s"doc $i", i % 4)).toDF("doc_id", "text", "shard")
    lake.write(df, "docs", partitionBy = Seq("shard"))

    val read = lake.read(spark, "docs").where(col("shard") === 2)
    assert(read.count() == 250)

    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(shard"), scan.take(800))
    // the shard filter must be partition-pruned, NOT a post-scan data filter
    assert(!scan.contains("PushedFilters: [IsNotNull(shard"), scan.take(800))
  }

  test("round-trip preserves schema and rows") {
    val base = Files.createTempDirectory("graft-lake2").toString
    val lake = new ParquetLake(base)
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    lake.write(df, "t")
    val back = lake.read(spark, "t").orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "a"), (2L, "b")))
  }
}
