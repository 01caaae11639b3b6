package graft.cli

import org.apache.spark.sql.SparkSession

/** Dev-only: materialize a span-table parquet for ExtractCli smoke runs. */
object PrepInput {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.fixtures.DocGen.fromDriverDocs(spark, args(0)).toDF
      .write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
