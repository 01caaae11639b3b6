package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-format seam (SURVEY.md §7.1). The production target is
  * Iceberg (`BASELINE.json`: "Iceberg table of interleaved text+media
  * documents"), but no Iceberg runtime jar exists in this offline
  * sandbox, so all table access goes through this trait:
  *
  *   - `ParquetLake`: partitioned parquet with an Iceberg-style layout
  *     (one directory per table, explicit partition columns) — used by
  *     tests and the bench here;
  *   - `IcebergLake` (config-only, no code changes): the same calls
  *     against a configured catalog — `spark.sql.catalog.lake =
  *     org.apache.iceberg.spark.SparkCatalog` + `df.writeTo(
  *     "lake.<table>").append()` / `spark.read.table("lake.<table>")`.
  *     Swapping it in is a session-config change because nothing else
  *     in the pipeline touches storage directly.
  */
trait LakeFormat extends Serializable {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil,
            mode: SaveMode = SaveMode.Overwrite): Unit
}

final class ParquetLake(baseDir: String) extends LakeFormat {
  private def path(table: String) = s"$baseDir/$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  override def write(df: DataFrame, table: String, partitionBy: Seq[String],
                     mode: SaveMode): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(table))
  }
}

/** Bucketed catalog tables: the co-located-join path. Two tables
  * bucketed (and sorted) on the same key with the same bucket count
  * join with NO Exchange and NO Sort — the shuffle is paid once at
  * write time and amortized over every subsequent join/aggregation on
  * that key (at 10^12 docs the repeated-join shuffle IS the cost
  * center). Iceberg equivalent: `bucket(N, doc_id)` partition
  * transform + storage-partitioned joins — same config-only swap as
  * the rest of the seam.
  */
object BucketedLake {
  def write(df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    // repartition on the bucket expression first: ONE file per bucket,
    // which is what lets the scan expose its sort order and the join
    // drop the Sort as well as the Exchange (multiple files per bucket
    // void the sortedness guarantee)
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}

/** Z-order clustered writes: the multi-dimensional file-skipping face
  * of the lake (Delta/Iceberg `OPTIMIZE ZORDER BY` equivalent; see
  * [[graft.functions.InterleaveBits]] for why). Files are
  * range-partitioned by the morton code of the two dimension ranks,
  * so every file's parquet min/max footer is tight on BOTH columns —
  * a selective predicate on either one skips most files at 100 TB,
  * where a single-column sort leaves the second dimension's stats
  * spanning the whole domain in every file. Rank scaling uses the
  * dims' min/max (one tiny agg job at write time); production tables
  * refresh the range from table stats instead.
  */
object ZOrderLake {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graft.ColumnBridge

  /** morton key over two numeric columns, each range-scaled to a
    * 16-bit rank; a zero-span dim degenerates to rank 0 (harmless —
    * the other dim still orders the data)
    */
  def zColumn(df: DataFrame, dimX: String, dimY: String): Column = {
    val r = df.agg(
      min(col(dimX)).cast("double"), max(col(dimX)).cast("double"),
      min(col(dimY)).cast("double"), max(col(dimY)).cast("double")).head()
    def rank(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
        floor((col(c).cast("double") - lit(lo)) / lit(span) * 65535.0),
        lit(0.0)), lit(65535.0)).cast("long")
    }
    ColumnBridge.column(graft.functions.InterleaveBits(
      ColumnBridge.expression(rank(dimX, r.getDouble(0), r.getDouble(1))),
      ColumnBridge.expression(rank(dimY, r.getDouble(2), r.getDouble(3)))))
  }

  def write(df: DataFrame, path: String, dimX: String, dimY: String,
            nFiles: Int): Unit =
    df.withColumn("__z", zColumn(df, dimX, dimY))
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
