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

  test("bucketed tables join with no Exchange and no Sort (co-located join)") {
    val left = (0 until 2000).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val right = (0 until 2000 by 2).map(i => (i.toLong, i * 10)).toDF("doc_id", "score")
    BucketedLake.write(left, "b_docs", "doc_id", nBuckets = 8)
    BucketedLake.write(right, "b_scores", "doc_id", nBuckets = 8)

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // one file per bucket (BucketedLake pre-repartitions), so the scan's
    // per-bucket sort order is real; reporting it is opt-in since 3.0
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = BucketedLake.read(spark, "b_docs")
        .join(BucketedLake.read(spark, "b_scores"), "doc_id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // bucket-pruned: the write-time shuffle+sort is reused, the join
      // itself is narrow
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(900)}")
      assert(!plan.contains("+- Sort "), s"bucketed+sorted join must not re-sort:\n${plan.take(900)}")
      assert(plan.contains("SelectedBucketsCount"), plan.take(900))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
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
